"""Streaming maintenance of the boilerplate chunk index (SURVEY.md
§2B; VERDICT r13 item 7 — the batch ``chunk_dedup_boilerplate``'s
streaming twin, built on the index_update.py foreachBatch pattern).

``chunk_dedup_boilerplate`` (operators/corpus.py) answers "how much of
each document is duplicated passage" from a chunk-digest expansion
computed in one batch pass.  In production that chunk index is not
rebuilt per report — it is MAINTAINED: each ingested document batch
appends its (doc_id, digest) rows to durable index state, exactly like
the MinHash maintainer appends band rows.  This module is that
maintainer as a Structured Streaming drain:

- the full document corpus replays as a multi-file parquet spool; the
  registered drain takes it in ONE availableNow micro-batch, and the
  multi-batch arrival path (one file per trigger) is pinned equal to
  the batch report by tests/test_streaming_state.py — per-document
  closure (a doc's chunk digests derive only from its own text) makes
  batch boundaries invisible to index content;
- ``foreachBatch`` computes each batch's chunk digests with THE SAME
  expansion the batch query uses (corpus.chunk_digest_rows) and
  appends them to the index store (executor→parquet, no driver hop;
  overwrite-by-batch keeps the sink idempotent under foreachBatch
  re-delivery — an append would double-count digests and silently
  inflate every frequency);
- after the drain, the registered query runs the SAME read-time
  rollup as the batch query (corpus.boilerplate_report) over the
  STREAMED index, graded by the SAME oracle — so the hash match
  certifies that streaming maintenance converges to exactly the
  batch-built chunk state.

State sizing at 100 TB: index rows are O(docs × chunks) 16-byte
digests + doc ids (never chunk text), appended partition-parallel;
per-trigger work is one codegen expansion pass over the batch — no
join, no shuffle, no state-store lookup (the index is append-only by
per-doc closure).  The read-time frequency window is the batch
query's digest-keyed exchange, priced once per report, not per
trigger.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from s3_manifest_spark.operators.corpus import (
    BOILERPLATE_ORACLE_SQL,
    boilerplate_report,
    chunk_digest_rows,
)
from s3_manifest_spark.registry import defer_cleanup, register
from s3_manifest_spark.sources.tables import load_table
from s3_manifest_spark.streaming.metrics import record_progress
from s3_manifest_spark.streaming.scratch import build_spool, scratch_base


def _spool_docs(spark: SparkSession, sf_dir: str, files: int = 8) -> str:
    """Stage the FULL document corpus as a multi-file parquet spool
    (contrast index_update's old-docs split: the boilerplate report
    covers every document).  Shared spool protocol (build_spool):
    content fingerprint, staging + atomic rename, self-heal."""

    def build(staging: str) -> None:
        load_table(spark, sf_dir, "documents").repartition(
            files
        ).write.mode("overwrite").parquet(staging)

    return build_spool(
        "boilerfeed", [f"{sf_dir}/documents.parquet"], f"v1x{files}", build
    )


def drain_chunk_feed(
    spark: SparkSession,
    spool: str,
    max_files_per_trigger: int | None = None,
) -> str:
    """Drain a document spool through the chunk-index maintainer;
    returns the index-store directory of (doc_id, h) rows.  With
    ``max_files_per_trigger`` unset, availableNow takes every ready
    file in one micro-batch; set it to force a multi-batch drain
    (the batch-boundary invariance test)."""
    idx_dir = tempfile.mkdtemp(prefix="smsp-chidx-", dir=scratch_base())
    defer_cleanup(lambda: shutil.rmtree(idx_dir, ignore_errors=True))
    store = os.path.join(idx_dir, "chunks")

    schema = spark.read.parquet(spool).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    feed = reader.format("parquet").load(spool)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # One OVERWRITTEN subdirectory per micro-batch (the
        # index_update.py sink contract): idempotent under
        # at-least-once foreachBatch delivery, full stage width.
        chunk_digest_rows(batch_df).write.mode("overwrite").parquet(
            os.path.join(store, f"batch{batch_id}")
        )

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
        record_progress(q, family="boilerplate")
    return store


@register("stream_boilerplate_live", oracle=BOILERPLATE_ORACLE_SQL)
def stream_boilerplate_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the document feed through the streaming chunk-index
    maintainer, then answer the boilerplate report from the STREAMED
    index via the batch query's own read-time rollup.  Same output and
    same oracle as ``chunk_dedup_boilerplate`` — the hash match
    certifies streaming maintenance reaches exactly the batch-built
    chunk state."""
    spool = _spool_docs(spark, sf_dir)
    store = drain_chunk_feed(spark, spool)
    chunks = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(store)
        .select("doc_id", "h")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return boilerplate_report(docs, chunks)
