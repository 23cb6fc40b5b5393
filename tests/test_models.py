"""Round-trip tests for the model persistence layer (models.py).

The contract under test: ``save_models`` → fresh-session-equivalent
cache wipe → ``load_models`` must leave every trainer CACHE-HITTING
(zero Spark jobs on the trainer call — asserted via job-group
tracking, not inference) and every dependent registered query
producing byte-identical output to its in-session-trained run.
Covers all storage kinds: npy (lr_quality), json (bpe_merges),
bytes (cms_sketch), broadcast_json (tfidf_dfreq), frames
(minhash_index), and frames+scalars (bigram_lm, pagerank_graph).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pytest

from s3_manifest_spark import registry
from s3_manifest_spark.models import _MANIFEST, _slug, load_models, save_models
from s3_manifest_spark.registry import clear_model_cache

SF = "/root/testdata/sf0.001"

#: kind -> (cache-key prefix, trainer, dependent registered query)
TRAINED = {
    "npy": ("lr_quality", "quality_classifier_trained"),
    "json": ("bpe_merges", "bpe_tokenize"),
    "broadcast_json": ("tfidf_dfreq", "tfidf_topterms"),
    "frames": ("minhash_index", "dedup_incremental"),
    "frames+scalars": ("bigram_lm", "lm_perplexity"),
    # second frames+scalars kind (r10): the maintained near-dup edge
    # relation behind graph_pagerank
    "graph": ("pagerank_graph", "graph_pagerank"),
    # bytes kind (r11): the serialized corpus Count-Min Sketch
    "bytes": ("cms_sketch", "heavy_hitters_cms"),
    # second frames kind (r13): the converged component labels behind
    # dedup_clusters / dedup_canonical
    "components": ("dedup_components", "dedup_clusters"),
    # third frames kind (r14): the exact kNN-graph baseline behind the
    # knn_graph_ann certificate (a localCheckpoint frame — the store
    # round-trip must serve it back without retraining the O(N²) sweep)
    "knn_exact": ("knn_exact", "knn_graph_ann"),
}


def _trainers(spark):
    from s3_manifest_spark.operators.bpe import train_bpe
    from s3_manifest_spark.operators.curation import _cms_sketch, _tfidf_dfreq
    from s3_manifest_spark.operators.dedup import _components_labels, _minhash_index
    from s3_manifest_spark.operators.graph import _pagerank_graph_cached
    from s3_manifest_spark.operators.ml import train_bigram_lm, train_quality_lr

    def components():
        # the trainer returns the labels FRAME; the cached entry is the
        # 1-frame tuple the store persists — return the cache entry so
        # the identity assertion targets what load_models reconstructs
        _components_labels(spark, SF)
        return spark._smsp_model_cache[("dedup_components", SF)]

    def knn_exact():
        from s3_manifest_spark.operators.similarity import _knn_exact_cached

        _knn_exact_cached(spark, SF)
        return spark._smsp_model_cache[("knn_exact", SF)]

    return {
        "lr_quality": lambda: train_quality_lr(spark, SF),
        "cms_sketch": lambda: _cms_sketch(spark, SF),
        "bpe_merges": lambda: train_bpe(spark, SF),
        "tfidf_dfreq": lambda: _tfidf_dfreq(spark, SF),
        "minhash_index": lambda: _minhash_index(spark, SF),
        "bigram_lm": lambda: train_bigram_lm(spark, SF),
        "dedup_components": components,
        "pagerank_graph": lambda: _pagerank_graph_cached(spark, SF),
        "knn_exact": knn_exact,
    }


def _sorted_pdf(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def _jobs_during(spark, fn):
    """Run ``fn`` under a dedicated job group; return the Spark job ids
    it scheduled (empty list == the call touched no cluster at all)."""
    sc = spark.sparkContext
    group = "models-cache-hit-probe"
    sc.setJobGroup(group, "trainer cache-hit probe")
    try:
        result = fn()
    finally:
        sc.setJobGroup("models-probe-done", "")
    return result, list(sc.statusTracker().getJobIdsForGroup(group))


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """Train all five kinds in-session, capture the dependent query
    outputs, persist to a scratch store."""
    registry.load_all()
    qs = registry.QUERIES
    trainers = _trainers(spark)
    clear_model_cache(spark)

    before = {}
    for kind, (prefix, query) in TRAINED.items():
        trainers[prefix]()
        before[query] = _sorted_pdf(qs[query](spark, SF))
        assert (prefix, SF) in spark._smsp_model_cache, prefix

    store_dir = str(tmp_path_factory.mktemp("models-store"))
    result = save_models(spark, store_dir)
    for kind, (prefix, _) in TRAINED.items():
        assert _slug((prefix, SF)) in result["saved"], (kind, result)
    yield {"dir": store_dir, "before": before, "saved": result}
    clear_model_cache(spark)


def test_roundtrip_cache_hit_zero_jobs_and_identical_output(spark, store):
    # simulate a fresh session: drop the model cache AND the plan memo
    clear_model_cache(spark)
    getattr(spark, "_smsp_plan_cache", {}).clear()
    assert not spark._smsp_model_cache

    loaded = load_models(spark, store["dir"])
    assert len(loaded) >= len(TRAINED)

    trainers = _trainers(spark)
    for kind, (prefix, query) in TRAINED.items():
        # (a) the trainer must cache-hit: ZERO jobs scheduled
        value, jobs = _jobs_during(spark, trainers[prefix])
        assert jobs == [], f"{prefix} retrained after load ({jobs})"
        assert value is spark._smsp_model_cache[(prefix, SF)]
        # (b) the dependent registered query is output-identical
        getattr(spark, "_smsp_plan_cache", {}).clear()
        after = _sorted_pdf(registry.QUERIES[query](spark, SF))
        pd_before = store["before"][query]
        assert list(after.columns) == list(pd_before.columns), query
        assert after.equals(pd_before), f"{query} diverged after reload"


def test_loaded_frames_release_cleanly(spark, store):
    clear_model_cache(spark)
    load_models(spark, store["dir"])
    frames = [
        p
        for v in spark._smsp_model_cache.values()
        for p in (v if isinstance(v, tuple) else (v,))
        if hasattr(p, "storageLevel")
    ]
    assert frames, "frame-backed kinds should have loaded DataFrames"
    assert all(f.storageLevel.useMemory or f.storageLevel.useDisk for f in frames)
    clear_model_cache(spark)
    assert not spark._smsp_model_cache
    assert all(
        not (f.storageLevel.useMemory or f.storageLevel.useDisk) for f in frames
    )


def test_save_merges_existing_manifest(spark, store, tmp_path):
    """A second save with a ``keys`` subset must not orphan models the
    first save wrote (ADVICE r9)."""
    clear_model_cache(spark)
    load_models(spark, store["dir"])
    d = str(tmp_path / "merge-store")
    save_models(spark, d, keys=[("lr_quality", SF)])
    save_models(spark, d, keys=[("bpe_merges", SF)])
    with open(os.path.join(d, _MANIFEST)) as f:
        manifest = json.load(f)
    assert _slug(("lr_quality", SF)) in manifest
    assert _slug(("bpe_merges", SF)) in manifest
    clear_model_cache(spark)
    loaded = load_models(spark, d)
    assert len(loaded) == 2


def test_slug_distinguishes_same_basename_dirs():
    a = _slug(("lr_quality", "/data/runA/sf0.001"))
    b = _slug(("lr_quality", "/data/runB/sf0.001"))
    assert a != b


def test_missing_frame_fails_loudly(spark, store, tmp_path):
    """A frame directory the manifest promises but the store lacks is
    corruption (e.g. a non-local store_dir) — never 'fewer frames'."""
    d = str(tmp_path / "corrupt-store")
    shutil.copytree(store["dir"], d)
    slug = _slug(("minhash_index", SF))
    shutil.rmtree(os.path.join(d, f"{slug}__f1.parquet"))
    clear_model_cache(spark)
    with pytest.raises(Exception) as exc:
        load_models(spark, d)
    assert "f1" in str(exc.value) or "PATH_NOT_FOUND" in str(exc.value).upper()


def test_frames_first_ordering_is_enforced(spark, tmp_path):
    """frames+scalars tuples must be (DataFrame..., scalar...); a
    permuted tuple must fail the save, not silently permute the load."""
    df = spark.range(3)
    mc = getattr(spark, "_smsp_model_cache", None)
    if mc is None:
        mc = {}
        spark._smsp_model_cache = mc
    key = ("bigram_lm", "/tmp/models-order-probe")
    mc[key] = (df, 7, df)  # scalar interleaved between frames
    try:
        with pytest.raises(ValueError, match="frames-first"):
            save_models(spark, str(tmp_path / "order-store"), keys=[key])
    finally:
        del mc[key]


def test_derived_caches_are_skipped_not_saved(spark, tmp_path):
    mc = getattr(spark, "_smsp_model_cache", None)
    if mc is None:
        mc = {}
        spark._smsp_model_cache = mc
    key = ("some_future_cache", SF)
    mc[key] = {"opaque": True}
    try:
        result = save_models(spark, str(tmp_path / "skip-store"), keys=[key])
        assert result["saved"] == []
        assert result["skipped"] == [repr(key)]
    finally:
        del mc[key]


def test_load_scoped_to_sf_dir(spark, store, tmp_path):
    """A store accumulates entries across fixture dirs; a session
    serving one dataset must be able to load ONLY that dataset's
    models (ADVICE r12 — the bench's stable store was materializing
    every frame-backed model ever saved for any sf_dir)."""
    clear_model_cache(spark)
    load_models(spark, store["dir"])
    d = str(tmp_path / "multi-sf-store")
    save_models(spark, d, keys=[("lr_quality", SF)])
    # fake a second dataset's entry in the same store: same payload,
    # different sf_dir key
    other_sf = "/root/testdata/sf0.0042-probe"
    mc = spark._smsp_model_cache
    mc[("lr_quality", other_sf)] = mc[("lr_quality", SF)]
    save_models(spark, d, keys=[("lr_quality", other_sf)])
    del mc[("lr_quality", other_sf)]

    clear_model_cache(spark)
    loaded = load_models(spark, d, sf_dir=SF)
    assert loaded == [_slug(("lr_quality", SF))]
    assert ("lr_quality", SF) in spark._smsp_model_cache
    assert ("lr_quality", other_sf) not in spark._smsp_model_cache
    # None keeps the load-everything behavior
    clear_model_cache(spark)
    assert len(load_models(spark, d)) == 2
