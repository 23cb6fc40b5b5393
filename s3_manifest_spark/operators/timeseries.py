"""Time-series operators over the ``events`` stream table: gap-filled
rollups (the hypertable "continuous aggregate with fill" shape) and
explicitly-merged distinct sketches.  The reference has no time
abstraction at all (SURVEY.md §2A — its one timestamp column is just
parsed and stored, /root/reference/src/main.rs:381-387).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table


@register(
    "gap_fill_hourly",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT et.event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
      FROM bounds, (SELECT DISTINCT event_type FROM events) et
    ),
    agg AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.hour_start,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           coalesce(a.v, 0.0)               AS total_value
    FROM grid g
    LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.hour_start
    """,
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup: every (event_type, hour) cell over the
    observed time span, zero-filled where no events landed — the shape
    a downstream dashboard or model-feature join needs (missing rows
    poison window/as-of logic).

    Scale shape: the only pass over raw events is one map-side-combined
    hourly aggregation; the dense grid is generated FROM the aggregate's
    own bounds (types × hours — thousands of rows at any input size)
    and the fill join runs on aggregated data, broadcast-small.  This
    is the 100 TB-safe form of gap-fill: never densify raw data, only
    the rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("v"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_start"),
        )
    )
    return (
        grid.join(
            hourly,
            (grid.event_type == hourly.event_type)
            & (grid.hour_start == hourly.h),
            "left",
        )
        .select(
            grid.event_type,
            grid.hour_start,
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("v"), F.lit(0.0)).alias("total_value"),
        )
    )


@register("sketch_hll_merge")  # rows-only: sketch estimates are engine-specific
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user count via explicitly two-phase Datasketches HLL:
    build one sketch per (event_type, partition), then union the
    binary sketches and estimate.

    This makes the 100 TB property visible in the plan: the shuffle
    carries one ~KB sketch per group per partition instead of the
    distinct value set, and union is associative — the same sketches
    could be persisted per day and re-merged for any date range
    without touching raw data (the lambda-architecture rollup trick).
    Result is independent of partitioning because HLL is insensitive
    to insertion order and duplication.
    """
    ev = load_table(spark, sf_dir, "events")
    per_part = ev.groupBy(
        "event_type", F.spark_partition_id().alias("pid")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        per_part.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
                "approx_users"
            )
        )
    )
