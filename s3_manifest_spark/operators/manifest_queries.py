"""queries() entries exercising the manifest core (reference §2A:
P1-P5 projection, F1 filter, A1/A2 stats — /root/reference/src/main.rs:
210-219, 361-390) over the deterministic synthetic listing.

Scale notes: the whole manifest pipeline is narrow (no shuffle) until
the stats aggregation, which is a map-side-combinable groupBy on a
low-cardinality derived key — at 100 TB of listing rows that is one
light shuffle of partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.manifest.core import derive_manifest
from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import SYNTH_LISTING_SQL, synth_listing

BUCKET = "test-bucket"

# DuckDB twin of derive_manifest's projection (manifest core fidelity
# contract, SURVEY.md §2C).  string_split is literal, [-1] matches
# substring_index(key, d, -1) incl. no-delimiter and trailing-delimiter
# cases (verified in tests/test_manifest_core.py).
_PROJECT_SQL = f"""
WITH listing AS ({SYNTH_LISTING_SQL})
SELECT
  '{BUCKET}'                                          AS Bucket,
  coalesce(key, '')                                   AS Key,
  string_split(coalesce(key, ''), '/')[-1]            AS FileName,
  CAST(coalesce(size, 0) AS BIGINT)                   AS Size,
  coalesce(try_cast(last_modified AS TIMESTAMP),
           TIMESTAMP '1970-01-01 00:00:00')           AS LastModified
FROM listing
"""


@register("manifest_project", oracle=_PROJECT_SQL)
def manifest_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derive_manifest(synth_listing(spark, sf_dir), bucket=BUCKET)


@register(
    "manifest_prefix_filter",
    oracle=f"SELECT * FROM ({_PROJECT_SQL}) WHERE Key LIKE 'data/A%'",
)
def manifest_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F1: raw startswith re-check of the server-side pushed prefix
    # (main.rs:210-219).
    return derive_manifest(synth_listing(spark, sf_dir), bucket=BUCKET, prefix="data/A")


@register(
    "manifest_stats",
    oracle=f"""
    SELECT array_to_string(string_split(Key, '/')[1:2], '/') AS prefix2,
           count(*)                      AS object_count,
           -- DuckDB sum(BIGINT) is HUGEINT → float64 in pandas; cast back
           CAST(sum(Size) AS BIGINT)     AS total_bytes,
           max(LastModified)             AS newest_mtime
    FROM ({_PROJECT_SQL})
    GROUP BY prefix2
    """,
)
def manifest_stats_by_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 stats widened to a per-prefix rollup (depth 2)."""
    m = derive_manifest(synth_listing(spark, sf_dir), bucket=BUCKET)
    return m.groupBy(
        F.substring_index(F.col("Key"), "/", 2).alias("prefix2")
    ).agg(
        F.count(F.lit(1)).alias("object_count"),
        F.sum("Size").alias("total_bytes"),
        F.max("LastModified").alias("newest_mtime"),
    )
