"""SparkSession factory with the engine's canonical configuration.

The settings here are correctness-relevant (UTC session time zone and
millisecond parquet timestamps reproduce the reference's tz-naive-UTC,
ms-precision output — /root/reference/src/main.rs:140-144,385) or
scale-relevant (AQE, skew-join handling, Arrow for the pandas-UDF
boundary).  Tests and bench.py both go through :func:`get_spark` so
every run sees identical semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Pin BLAS pools to one thread per process BEFORE the JVM (and thus the
# Python workers, which inherit its environment) is launched.  Spark
# already runs one Python worker per core; letting each worker's
# OpenBLAS/MKL spawn a full pool oversubscribes cores×cores threads and
# turned a ~10 ms numpy matmul into seconds of contention.  Parallelism
# belongs to Spark's partitioning, not to nested BLAS pools.
for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

# Correctness configs: identical results on local[*] and a real cluster.
_SEMANTIC_CONFS = {
    # Reference emits tz-naive UTC timestamps at ms precision
    # (main.rs:140-144); DuckDB oracle comparisons need the same zone.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MILLIS",
    # ANSI off: out-of-range casts become NULL (the reference defaults
    # every unparseable value rather than erroring, main.rs:373-387).
    "spark.sql.ansi.enabled": "false",
    # Parquet TIMESTAMP(NANOS) columns (which Spark otherwise refuses to
    # read) load as raw nanosecond longs.  Harmless for us/ms-precision
    # files — they still load as timestamps — so this is safe session-wide.
    # Readers that may see a NANOS file (events) branch on the loaded
    # dtype and convert bigint→timestamp explicitly (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

# Scale configs: sized for local testing, but every one of these is the
# setting we would ship to a 1000-executor cluster (AQE re-plans at
# runtime, so shuffle.partitions is only an upper-bound hint there).
_SCALE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce post-shuffle partitions by SIZE (advisory 64 MB / min
    # 1 MB), not down to the cluster's parallelism (r17, measured
    # -20-30% across the floor/mid classes interleaved —
    # FLOOR_CONF_AB.json): with the default parallelism-first policy
    # a kilobyte-sized exchange still schedules #parallelism tasks of
    # pure overhead.  At scale partition counts are size-driven
    # either way, so the setting only stops the optimizer from
    # keeping tiny partitions alive for parallelism's sake.  Queries
    # whose exchanges are CPU-dense per byte (fingerprint aggregates:
    # dedup_ngram_jaccard, doc_containment, lsh_tuning_curve —
    # measured 2x worse size-coalesced) opt back into
    # parallelism-first per query via
    # registry.prefer_parallel_exchanges.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 10 MB default broadcast threshold is fine; dims here are tiny and
    # we add explicit broadcast() hints where the dimension is known small.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Arrow for the pandas-UDF boundary (similarity / multimodal ops).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Keep scan partitions full-sized so small files coalesce.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def get_spark(
    app_name: str = "s3-manifest-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster the submitter sets master/deploy-mode and this factory
    only contributes conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in {**_SEMANTIC_CONFS, **_SCALE_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate can return a pre-existing session whose builder confs
    # were ignored; re-assert the runtime-settable semantic confs.
    for k, v in _SEMANTIC_CONFS.items():
        spark.conf.set(k, v)
    return spark
