"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship manifest pipeline (the reference's
one hardcoded query — /root/reference/src/main.rs:120-292 — expressed
Spark-first) end-to-end at sf0.001.  ``queries()`` / ``oracle_sql()``
expose every operator in SURVEY.md §2 via the registry in
``s3_manifest_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark import registry

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    # Idempotent per session: each conf.set/get is a py4j round trip,
    # and the bench harness calls every query 5x — pay them once.
    if getattr(spark, "_smsp_configured", False):
        return spark
    spark._smsp_configured = True
    # Semantics the whole engine assumes (see s3_manifest_spark.session):
    # tz-naive-UTC ms timestamps to match the reference (main.rs:140-144)
    # and the DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    # ANSI off: the reference defaults every unparseable/out-of-range
    # value instead of erroring (main.rs:373-387) — under Spark 4's
    # ANSI-on default, garbage timestamps/casts would throw instead of
    # coalescing to the documented defaults.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # Runtime-settable scale confs, in case the hosting session was
    # built without them (a plain session defaults to 200 shuffle
    # partitions — pure task overhead at fixture scale).
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # Size-driven post-shuffle coalescing (see session.py: -20-30%
    # across the small-exchange classes; CPU-dense queries opt back
    # out per query via registry.prefer_parallel_exchanges).
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
    )
    if int(spark.conf.get("spark.sql.shuffle.partitions", "200")) > 64:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic listing → manifest projection+filter → stats.

    Touches source, all five derivations (P1-P5), the prefix filter
    (F1), and a map-side-combinable aggregate — the reference's whole
    §2A surface in one plan, no Python in the row path.
    """
    from s3_manifest_spark.manifest.core import derive_manifest
    from s3_manifest_spark.sources.tables import synth_listing

    _configure(spark)
    listing = synth_listing(spark, SF_SMOKE_DIR)
    manifest = derive_manifest(listing, bucket="test-bucket", prefix="data/")
    return (
        manifest.groupBy(
            F.substring_index(F.col("Key"), "/", 2).alias("prefix2")
        )
        .agg(
            F.count(F.lit(1)).alias("object_count"),
            F.sum("Size").alias("total_bytes"),
            F.max("LastModified").alias("newest_mtime"),
        )
        .orderBy("prefix2")
    )


def _rotation_order(names) -> list[str]:
    """Least-recently-driver-sampled first.  The driver's correctness
    gate samples a prefix of this dict's order; with 100+ registered
    queries a static order would leave the tail permanently outside
    driver-grade verification.  Reading the repo's own
    CORRECTNESS_r*.json artifacts makes the rotation self-maintaining:
    queries never sampled (or sampled longest ago) sort first, so
    every operator cycles through the driver's window across rounds."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                sampled = list(json.load(f))
        except Exception:
            continue
        for n in sampled:
            last_seen[n] = max(last_seen.get(n, 0), rnd)
    return sorted(names, key=lambda n: (last_seen.get(n, -1), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {
        name: wrap(registry.QUERIES[name])
        for name in _rotation_order(registry.QUERIES)
    }


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
