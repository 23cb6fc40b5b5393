"""Durable store for session-trained model artifacts.

Every trained operator (quality classifier, bigram LM, BPE merges,
IVF/PQ/semdedup quantizers, the MinHash band index, the TF-IDF
document-frequency table) session-caches its model in
``spark._smsp_model_cache`` — built once, served warm, priced in
``BENCH_FULL.json``'s ``cold_sec``.  In production those artifacts
outlive the session: the daily job LOADS yesterday's tokenizer /
classifier / index instead of retraining.  This module is that
persistence layer:

    from s3_manifest_spark.models import save_models, load_models
    save_models(spark, "/models/2026-08-15")        # after training
    ...                                              # new session:
    load_models(spark, "/models/2026-08-15")         # warm-start
    QUERIES["bpe_tokenize"](spark, sf)               # no retrain jobs

Formats are engine-neutral and deterministic: numpy arrays as ``.npy``,
plain-python payloads (merge lists, df-req dicts, scalars) as sorted
JSON, DataFrame-backed models (bigram count tables, the band index) as
parquet subdirectories.  ``load_models`` reconstructs each value in
the exact shape its trainer caches — persisted DataFrames persisted
again, broadcast payloads re-broadcast — so trainers find a cache hit
and never re-run.

Scope: the TRAINED artifacts above.  Derived session caches (the
multimodal encoded corpus, CDC state, the plan memo) are rebuilt from
data by design and are deliberately not stored.  Unknown cache entries
are skipped and reported, never silently dropped on a future trainer's
behalf.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: model-cache key prefix -> storage kind
_KINDS = {
    "lr_quality": "npy",
    "ivf": "npy",
    "pq": "npy",
    "semdedup": "npy",
    "bpe_merges": "json",
    "tfidf_dfreq": "broadcast_json",
    "bigram_lm": "frames+scalars",
    "minhash_index": "frames",
}


def _slug(key: tuple) -> str:
    name, sf_dir = key
    return f"{name}__{os.path.basename(str(sf_dir).rstrip('/'))}"


def save_models(
    spark: SparkSession, store_dir: str, keys: list | None = None
) -> dict[str, list]:
    """Persist cached models to ``store_dir``; returns
    ``{"saved": [...], "skipped": [...]}`` (skipped = cache entries of
    kinds this store does not cover — derived caches)."""
    import numpy as np

    mc = getattr(spark, "_smsp_model_cache", {}) or {}
    os.makedirs(store_dir, exist_ok=True)
    saved, skipped = [], []
    manifest: dict[str, Any] = {}
    for key, value in mc.items():
        if keys is not None and key not in keys:
            continue
        if not (isinstance(key, tuple) and len(key) == 2):
            skipped.append(repr(key))
            continue
        kind = _KINDS.get(key[0])
        if kind is None:
            skipped.append(repr(key))
            continue
        slug = _slug(key)
        base = os.path.join(store_dir, slug)
        if kind == "npy":
            np.save(base + ".npy", np.asarray(value))
        elif kind == "json":
            with open(base + ".json", "w") as f:
                json.dump(value, f)
        elif kind == "broadcast_json":
            with open(base + ".json", "w") as f:
                json.dump(dict(value.value), f, sort_keys=True)
        elif kind == "frames":
            for i, df in enumerate(value):
                df.write.mode("overwrite").parquet(f"{base}__f{i}.parquet")
        elif kind == "frames+scalars":
            frames = [v for v in value if isinstance(v, DataFrame)]
            scalars = [v for v in value if not isinstance(v, DataFrame)]
            for i, df in enumerate(frames):
                df.write.mode("overwrite").parquet(f"{base}__f{i}.parquet")
            with open(base + ".json", "w") as f:
                json.dump(scalars, f)
        manifest[slug] = {"key": list(key), "kind": kind}
        saved.append(slug)
    with open(os.path.join(store_dir, "MODELS.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return {"saved": sorted(saved), "skipped": sorted(skipped)}


def load_models(spark: SparkSession, store_dir: str) -> list[str]:
    """Load every model in ``store_dir`` into the session cache so the
    trainers cache-hit; returns the loaded slugs.  DataFrame-backed
    models are persisted again (the shape their trainers cache), so
    ``registry.clear_model_cache`` releases them exactly as if they
    had been trained in-session."""
    import numpy as np

    with open(os.path.join(store_dir, "MODELS.json")) as f:
        manifest = json.load(f)
    mc = getattr(spark, "_smsp_model_cache", None)
    if mc is None:
        mc = {}
        spark._smsp_model_cache = mc
    loaded = []
    for slug, meta in sorted(manifest.items()):
        key = tuple(meta["key"])
        kind = meta["kind"]
        base = os.path.join(store_dir, slug)
        if kind == "npy":
            value: Any = np.load(base + ".npy")
        elif kind == "json":
            with open(base + ".json") as f:
                raw = json.load(f)
            # JSON round-trips tuples as lists; trainers cache tuples
            value = [tuple(item) for item in raw]
        elif kind == "broadcast_json":
            with open(base + ".json") as f:
                value = spark.sparkContext.broadcast(json.load(f))
        elif kind == "frames":
            i, frames = 0, []
            while os.path.exists(f"{base}__f{i}.parquet"):
                frames.append(
                    spark.read.parquet(f"{base}__f{i}.parquet").persist()
                )
                i += 1
            value = tuple(frames)
        elif kind == "frames+scalars":
            i, frames = 0, []
            while os.path.exists(f"{base}__f{i}.parquet"):
                frames.append(
                    spark.read.parquet(f"{base}__f{i}.parquet").persist()
                )
                i += 1
            with open(base + ".json") as f:
                scalars = json.load(f)
            value = tuple(frames) + tuple(scalars)
        else:  # pragma: no cover - manifest written by save_models
            raise ValueError(f"unknown model kind {kind!r} for {slug}")
        mc[key] = value
        loaded.append(slug)
    return loaded
