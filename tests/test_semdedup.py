"""SemDeDup operator: label soundness vs a pure-numpy recompute,
non-degeneracy, model caching, falsification (oracle parity itself
rides test_oracle_parity.py's parameterized sweep)."""

from __future__ import annotations

import numpy as np

from s3_manifest_spark.operators import semdedup as sd
from s3_manifest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    pdf = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids = pdf["vec_id"].to_numpy("int64")
    e = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    en = e / np.sqrt((e * e).sum(axis=1, keepdims=True))
    return ids, en


def test_labels_match_pure_numpy_recompute(spark):
    """The distributed assign+prune must equal a single-process
    recompute from the trained centroids — catches partition-order or
    kernel-blocking bugs independently of the SQL oracle."""
    res = (
        sd.semdedup(spark, SF)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids, en = _corpus(spark)
    cent = sd.train_semdedup_centroids(spark, SF)
    cells = sd._assign_cells(ids, en, cent)
    assert np.array_equal(res["cluster"].to_numpy("int64"), cells)
    for c in range(sd.SEM_K):
        m = np.nonzero(cells == c)[0]
        g = np.round(en[m] @ en[m].T, 6)
        expect = np.array(
            [bool((g[i, :i] >= sd.SEM_TAU).any()) for i in range(len(m))]
        )
        got = res["is_dup"].to_numpy()[m]
        assert np.array_equal(got, expect), c


def test_nondegenerate_and_all_clusters_used(spark):
    res = sd.semdedup(spark, SF).toPandas()
    assert len(res) == 500
    assert set(res["cluster"].unique()) == set(range(sd.SEM_K))
    assert 0 < res["is_dup"].sum() < len(res)


def test_centroids_session_cached(spark):
    a = sd.train_semdedup_centroids(spark, SF)
    b = sd.train_semdedup_centroids(spark, SF)
    assert a is b
    assert a.shape == (sd.SEM_K, sd.SEM_DIM)


def test_perturbed_centroids_falsify_assignment(spark):
    """A 1e-3 centroid perturbation must move at least one vector to a
    different cell — the oracle's hash match is sensitive to the
    trained trajectory, not just the prune threshold."""
    ids, en = _corpus(spark)
    cent = sd.train_semdedup_centroids(spark, SF)
    good = sd._assign_cells(ids, en, cent)
    rng = np.random.default_rng(7)
    bad = sd._assign_cells(
        ids, en, cent + rng.normal(0, 1e-3, cent.shape)
    )
    assert (good != bad).any()
