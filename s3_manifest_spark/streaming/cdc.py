"""Streaming manifest maintenance — the reference's batch manifest job
(/root/reference/src/main.rs:120-292 lists a bucket and writes a full
snapshot per run) recast as an INCREMENTAL maintainer: listing rows
arrive as a stream, a stateful aggregation keeps the per-key CDC state,
and the drained table IS the current manifest snapshot.

Design (scale notes):

- The stateful operator is a BUILT-IN streaming aggregation — the same
  ``cdc_per_key`` expression the batch ``manifest_apply_changes`` runs
  (operators/manifest_queries.py), evaluated by Spark's state store.
  State per key is exactly two longs (old/feed maxima): the state IS
  the materialized snapshot, which is the irreducible cost of
  maintaining one incrementally.  An ``applyInPandasWithState``
  formulation was deliberately rejected: it pays a Python call per
  KEY per micro-batch (~450k at sf0.1 — minutes), whereas the built-in
  aggregation keeps per-key state JVM-side in the (RocksDB-backed, at
  production) state store with one shuffle per micro-batch.
- No watermark: snapshot state must never age out — a key is live
  until a delete arrives.  That is inherent to CDC materialization,
  not a leak; state size tracks the live key population, the same
  bytes the snapshot parquet itself costs.
- The MERGE projection (changed key takes feed value, NULL feed =
  delete, unchanged keeps old) is stateless, so it runs over the
  drained state table — at production it would sit in a
  ``foreachBatch`` writing the snapshot parquet per trigger.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import listing_projection

STREAM_SHUFFLE_PARTITIONS = "8"


def read_listing_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of listing rows (the production layout: a
    directory that listing-chunk files land in), derived from the
    staged lineitem fixture with the SAME projection the batch
    ``synth_listing`` uses."""
    src = f"{sf_dir}/lineitem.parquet"
    st = os.stat(src)
    # Spool identity covers the full source path AND its (mtime, size):
    # a regenerated fixture or a same-basename directory from another
    # root gets a fresh spool instead of silently streaming stale data.
    # os.getuid() keeps /tmp spools from colliding across users.
    tag = hashlib.sha256(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:16]
    spool = os.path.join(
        tempfile.gettempdir(), f"smsp-listing-{os.getuid()}-{tag}"
    )
    os.makedirs(spool, exist_ok=True)
    dst = os.path.join(spool, "lineitem.parquet")
    if not os.path.exists(dst):
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy(src, dst)
    schema = spark.read.parquet(dst).schema
    raw = spark.readStream.schema(schema).format("parquet").load(spool)
    return listing_projection(raw)


def run_cdc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the CDC aggregation through Structured Streaming (update
    mode, availableNow drain) and return the merged snapshot as a
    batch DataFrame — value-equal to the batch
    ``manifest_apply_changes`` (pinned in tests/test_streaming_state.py)."""
    from s3_manifest_spark.operators.manifest_queries import (
        cdc_merge,
        cdc_per_key,
    )

    per_key = cdc_per_key(read_listing_stream(spark, sf_dir))
    name = f"cdc_apply_{abs(hash(sf_dir)) % 10_000_000}"
    key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(key)
    spark.conf.set(key, STREAM_SHUFFLE_PARTITIONS)
    try:
        with tempfile.TemporaryDirectory(prefix="smsp-ckpt-") as ckpt:
            # COMPLETE mode: the memory sink REPLACES its contents with
            # the full aggregation state each micro-batch, so the final
            # table is exactly one (latest) row per key no matter how
            # many micro-batches the drain took (update mode would
            # append one row per key per batch that touched it — a
            # duplicate-key snapshot as soon as the spool holds more
            # than one file).  A production maintainer instead writes
            # the merged snapshot per trigger in foreachBatch.
            q = (
                per_key.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set(key, old_parts)
    # Stateless MERGE over the drained (complete) state table.
    return cdc_merge(spark.table(name))


@register("stream_cdc_apply_live")  # rows-only: streaming execution
def stream_cdc_apply_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental manifest maintenance as a real Structured Streaming
    job (module docstring has the design); the drained snapshot equals
    the batch CDC apply."""
    return run_cdc_stream(spark, sf_dir)
