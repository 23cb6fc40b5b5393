"""Fixture-table access + the deterministic synthetic ``listing`` table.

The driver fixtures (TESTDATA.md) are plain parquet; ``load_table`` is a
thin reader so every operator takes the scale-factor directory as a
parameter.  The manifest core additionally needs an S3-listing-shaped
input (FIXTURES.md §B).  No such parquet exists, so we derive one
deterministically from ``lineitem`` — and, crucially, the SAME
derivation is expressed once in Spark and once in ANSI SQL
(:data:`SYNTH_LISTING_SQL`) so the DuckDB oracle sees byte-identical
input rows without any files changing hands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects outright.  nanosAsLong is a session-wide
        # invariant declared in session.py; re-asserted here only for
        # externally-created sessions that bypassed get_spark.  Read
        # nanos as long, then truncate to micros with exact integer
        # division (float division would wobble the last digit at int64
        # magnitude).  DuckDB does the same ns→us truncation when
        # casting to TIMESTAMP, so the oracle sees identical instants.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def synth_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3-listing-shaped rows derived from ``lineitem``.

    key          = data/<returnflag>/<orderkey>/part-<linenumber>.parquet
    size         = extendedprice in whole cents (bigint)
    last_modified= RFC3339 string of l_shipdate

    Purely column-level expressions over one scan — Catalyst prunes the
    read down to the four source columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(
            F.lit("data/"),
            F.col("l_returnflag"),
            F.lit("/"),
            F.col("l_orderkey").cast("string"),
            F.lit("/part-"),
            F.col("l_linenumber").cast("string"),
            F.lit(".parquet"),
        ).alias("key"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("size"),
        F.date_format(F.col("l_shipdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "last_modified"
        ),
    )


#: DuckDB twin of :func:`synth_listing` (referenced as a CTE by the
#: manifest oracles).  Must stay value-identical to the Spark version.
SYNTH_LISTING_SQL = """
SELECT
  'data/' || l_returnflag || '/' || CAST(l_orderkey AS VARCHAR)
          || '/part-' || CAST(l_linenumber AS VARCHAR) || '.parquet' AS key,
  CAST(round(l_extendedprice * 100) AS BIGINT)                       AS size,
  strftime(l_shipdate, '%Y-%m-%dT%H:%M:%SZ')                         AS last_modified
FROM lineitem
"""
