"""Multi-format ingest round-trip (SURVEY.md §2B extension, r10):
the engine's second and third SOURCE formats, certified byte-exact.

The reference ingests exactly one source (the S3 listing —
/root/reference/src/main.rs:187-206) and writes exactly one format
(parquet).  A training-data pipeline also ingests the interchange
formats crawlers and labeling vendors actually deliver — JSONL and
CSV — and the failure mode that matters is SILENT text corruption
(quoting, escaping, delimiter collisions, encoding).  This operator
certifies the whole write→read loop:

1. the documents corpus is spooled to scratch ONCE per content
   fingerprint as both JSONL (``df.write.json``) and CSV
   (``df.write.csv``, quoted);
2. both spools are read back with an EXPLICIT schema (no inference —
   inference is nondeterministic under sampling and wrong at 100 TB);
3. per (format, lang) the query emits document counts, total text
   mass, and a text CHECKSUM — the sum over documents of the first
   8 md5 hex digits of ``text`` as an integer — while the DuckDB
   oracle computes the same aggregates from the PARQUET originals.

A hash match therefore proves every byte of every document survived
each format's quoting/escaping round trip (the md5 sum moves if any
single character anywhere changes).  At 100 TB the same plan is the
ingest job itself: schema-pinned ``spark.read.json/csv`` scans are
splittable and scale with files; the certificate aggregates are
map-side combinable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table, parquet_row_count
from s3_manifest_spark.streaming.scratch import scratch_base

_FORMATS = ("jsonl", "csv", "orc")

#: bump when the spool writer options change (see _spool_formats)
_SPOOL_FORMAT_V = 3  # v3: + ORC leg

#: the certificate aggregates, per engine — same math, each engine's
#: own hex-to-int idiom (Spark conv(); DuckDB 0x-literal cast)
_SPARK_CKSUM = (
    "CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)"
)
_DUCK_CKSUM = "CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)"

_INGEST_ORACLE = f"""
SELECT f.fmt AS format,
       d.lang,
       CAST(count(*) AS BIGINT)                 AS n_docs,
       CAST(sum(length(text)) AS BIGINT)        AS text_mass,
       CAST(sum({_DUCK_CKSUM}) AS BIGINT)       AS text_cksum
FROM documents d
CROSS JOIN (VALUES ('csv'), ('jsonl'), ('orc')) f(fmt)
GROUP BY 1, 2
"""


def _spool_formats(spark: SparkSession, sf_dir: str) -> str:
    """Write the documents corpus to scratch as JSONL, CSV, and ORC,
    once per source content fingerprint (the index_update keying
    rule: a stale spool from another corpus must never be reused)."""
    import hashlib

    src = f"{sf_dir}/documents.parquet"
    # _SPOOL_FORMAT_V rides the fingerprint: changing the writer
    # options (quoting/null sentinel) must invalidate old spools, or
    # a re-read with the NEW reader options would parse a stale spool
    # written under the old contract.
    fp = hashlib.sha256(
        f"{os.path.abspath(sf_dir)}|{parquet_row_count(src)}|"
        f"{int(os.stat(src).st_mtime)}|v{_SPOOL_FORMAT_V}".encode()
    ).hexdigest()[:12]
    base = os.path.join(scratch_base(), f"smsp-ingest-{fp}")
    done = os.path.join(base, "_SPOOL_READY")
    if not os.path.exists(done):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        docs.write.mode("overwrite").json(os.path.join(base, "jsonl"))
        (
            docs.write.mode("overwrite")
            .options(header=True, quoteAll=True, escape='"', nullValue="\\N")
            .csv(os.path.join(base, "csv"))
        )
        # third columnar format: ORC is Spark-native (no package) and
        # the other container a data vendor actually ships
        docs.write.mode("overwrite").orc(os.path.join(base, "orc"))
        open(done, "w").close()
    return base


@register("ingest_roundtrip", oracle=_INGEST_ORACLE)
def ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (format, lang): document count, total text length, and the
    md5-prefix checksum of every document's text, computed from the
    JSONL, CSV, and ORC RE-READS — graded against the same aggregates
    over the parquet originals (see module docstring: a hash match
    proves byte-exact round trips for all three formats — text
    quoting/escaping for the row formats, encoder/decoder fidelity
    for the columnar one)."""
    base = _spool_formats(spark, sf_dir)
    schema = "doc_id long, text string, lang string"
    jsonl = spark.read.schema(schema).json(os.path.join(base, "jsonl"))
    # multiLine: the write path quotes embedded newlines (quoteAll),
    # so the read path must parse quoted multi-line records or a
    # corpus with newlines in text breaks the certificate via a
    # self-inflicted reader artifact, not detected corruption
    # (multiLine disables Spark's splittable CSV scan — acceptable
    # because the spool is many files, so parallelism comes from the
    # file count).  nullValue '\\N' (both sides): with the default
    # sentinel, NULL and '' both serialize to '' and BOTH read back
    # as null — a distinct sentinel keeps empty text a real empty
    # string through the round trip (tests/test_llm_ops.py pins it).
    csv = (
        spark.read.schema(schema)
        .options(header=True, escape='"', multiLine=True, nullValue="\\N")
        .csv(os.path.join(base, "csv"))
    )
    orc = spark.read.schema(schema).orc(os.path.join(base, "orc"))
    out = None
    for fmt, df in (("jsonl", jsonl), ("csv", csv), ("orc", orc)):
        agg = df.groupBy(F.lit(fmt).alias("format"), "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("text_mass"),
            F.sum(F.expr(_SPARK_CKSUM)).alias("text_cksum"),
        )
        out = agg if out is None else out.unionAll(agg)
    return out
