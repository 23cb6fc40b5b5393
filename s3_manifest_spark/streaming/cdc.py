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

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from s3_manifest_spark.operators.manifest_queries import APPLY_ORACLE_SQL
from s3_manifest_spark.registry import defer_cleanup, register
from s3_manifest_spark.streaming.metrics import record_progress
from s3_manifest_spark.streaming.scratch import build_spool, scratch_base
from s3_manifest_spark.sources.tables import listing_projection, parquet_row_count


def state_store_partitions(spark: SparkSession, n_keys_hint: int) -> str:
    """Scale-aware state-store partition count for a stateful stream:
    the shuffle-partition count at FIRST checkpoint fixes the number
    of state stores for the life of the query, so size it from the
    expected live-key population, not a constant.

    Target ~64k live keys per store (two-long CDC state → ~1 MB/store;
    far below executor memory even with RocksDB block cache on top),
    floored at 8 (below that, bounded drains pay pure commit overhead
    — measured 2-3× with 32 stores on a fixture drain) and capped at
    4×cores (more stores than concurrent tasks adds commit files, not
    parallelism).  Production additionally sets
    ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` so per-store state spills off-heap
    to local SSD and store count can stay ≈ cluster cores even at
    billions of keys."""
    cores = spark.sparkContext.defaultParallelism
    return str(max(8, min(4 * cores, -(-n_keys_hint // 65_536))))


#: listing-spool writer-format version — rides the spool fingerprint so
#: a change to the chunking (or a return to the old single-hardlink
#: layout) can never silently reuse a stale spool.
_LISTING_SPOOL_V = 2  # v2: multi-file chunks (was: one hardlinked file)

#: listing-chunk files per spool.  A real listing feed lands as many
#: chunk files per window; staging several also gives the micro-batch
#: SCAN that many parallel tasks — the v1 single-file spool ran the
#: whole 600k-row projection + filter + partial aggregation in ONE
#: task before the state shuffle (measured ~0.9 s of serial addBatch
#: at sf0.1).
_LISTING_CHUNKS = 8


def read_listing_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of listing rows (the production layout: a
    directory that listing-chunk files land in), derived from the
    staged lineitem fixture with the SAME projection the batch
    ``synth_listing`` uses."""
    src = f"{sf_dir}/lineitem.parquet"
    # Shared spool protocol (scratch.build_spool, r13): content-
    # fingerprint identity (path|mtime_ns|size|format-version, per-uid
    # dir), staging + atomic rename so readers never see half-written
    # chunks, marker-rechecked self-heal for crashed-build debris.
    spool = build_spool(
        "listing",
        [src],
        f"v{_LISTING_SPOOL_V}x{_LISTING_CHUNKS}",
        lambda staging: (
            spark.read.parquet(src)
            .repartition(_LISTING_CHUNKS)
            .write.mode("overwrite")
            .parquet(staging)
        ),
    )
    schema = spark.read.parquet(spool).schema
    raw = spark.readStream.schema(schema).format("parquet").load(spool)
    return listing_projection(raw)


def drain_cdc_updates(spark: SparkSession, per_key_stream: DataFrame) -> DataFrame:
    """availableNow drain of a stateful CDC aggregation through the
    DISTRIBUTED sink shape: ``foreachBatch`` in UPDATE mode appends
    each micro-batch's changed keys (stamped with the batch id) to a
    parquet spool; the snapshot is then the latest row per key — a
    distributed window, executed at read time.

    This replaces the earlier complete-mode memory sink, which
    materialized the ENTIRE state table INTO THE DRIVER once per
    micro-batch — the measured 5.6×-per-10×-data scaling cliff, and a
    driver-memory wall at any real key population.  Here batch output
    goes executor→parquet with no driver hop, which is exactly the
    production maintainer (foreachBatch writing the snapshot delta per
    trigger); update mode also ships only keys the batch touched
    instead of the full state every time."""
    from pyspark.sql import functions as F

    out_dir = tempfile.mkdtemp(prefix="smsp-cdc-snap-", dir=scratch_base())
    defer_cleanup(lambda: shutil.rmtree(out_dir, ignore_errors=True))
    n_batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Re-delivery-safe without overwrite-by-batch (contrast the
        # index maintainer's sink, index_update.py): a re-delivered
        # batch appends rows with the SAME batch_id and the SAME
        # final-state values, so the latest-per-key compaction below
        # picks an identical row either way (and the re-delivery bumps
        # n_batches past 1, routing around the single-batch shortcut).
        n_batches["n"] += 1
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    with tempfile.TemporaryDirectory(prefix="smsp-ckpt-", dir=scratch_base()) as ckpt:
        q = (
            per_key_stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_progress(q, family="cdc_apply")
    snap = spark.read.parquet(out_dir)
    value_cols = [c for c in snap.columns if c not in ("key", "batch_id")]
    if n_batches["n"] == 1:
        # Update mode emits each touched key at most once PER
        # micro-batch, so a single-batch drain's spool already holds
        # exactly one (final-state) row per key — the latest-per-key
        # compaction would be a full extra shuffle that merges nothing.
        return snap.select("key", *value_cols)
    # latest row per key as a HASH aggregation (max_by on batch_id)
    # instead of a window: the window form sorts every partition on
    # (key, batch_id) just to keep row 1, while max_by is one
    # map-side-combinable pass — same one-exchange plan, no sort.
    latest = snap.groupBy("key").agg(
        F.max_by(F.struct(*value_cols), F.col("batch_id")).alias("v")
    )
    return latest.select("key", *[F.col(f"v.{c}").alias(c) for c in value_cols])


def run_cdc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the CDC aggregation through Structured Streaming (update
    mode, availableNow drain via :func:`drain_cdc_updates`) and return
    the merged snapshot as a batch DataFrame — value-equal to the batch
    ``manifest_apply_changes`` (pinned in tests/test_streaming_state.py)."""
    from s3_manifest_spark.operators.manifest_queries import (
        cdc_merge,
        cdc_per_key,
    )

    per_key = cdc_per_key(read_listing_stream(spark, sf_dir))
    key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(key)
    # ~75% of listing rows are distinct keys in this feed — row count
    # from the parquet footer is a fine live-key hint.
    n_rows = parquet_row_count(f"{sf_dir}/lineitem.parquet")
    spark.conf.set(key, state_store_partitions(spark, n_rows))
    try:
        latest = drain_cdc_updates(spark, per_key)
    finally:
        spark.conf.set(key, old_parts)
    # Stateless MERGE over the drained snapshot.
    return cdc_merge(latest)


@register("stream_cdc_apply_live", oracle=APPLY_ORACLE_SQL)
def stream_cdc_apply_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental manifest maintenance as a real Structured Streaming
    job (module docstring has the design).  Oracle-graded (r8) with
    the SAME directly-computed-new-snapshot SQL as the batch apply:
    the CDC state is two integer maxima per key — order-independent
    exact arithmetic — so the drained snapshot is deterministic
    bit-for-bit and the hash match proves the full streaming path
    (state store, update-mode foreachBatch spool, latest-per-key
    compaction, merge) reconstructs the new snapshot exactly."""
    return run_cdc_stream(spark, sf_dir)
