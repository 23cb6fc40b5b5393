"""Advanced join operators the reference lacks entirely (SURVEY.md §2A
"explicitly absent": no joins of any kind — /root/reference/src/main.rs
is a single-table pipeline).  These are the two non-equi join shapes a
training-data pipeline actually hits: as-of (latest-state lookup) and
range/band joins (interval membership).

Both are expressed as compositions of built-in DataFrame ops chosen for
their 100 TB shuffle profile — no theta-join cross products:

- as-of:  union + partitioned running ``last(ignorenulls)`` window —
  exactly ONE shuffle, keyed by the join key, regardless of either
  side's cardinality or time span.  (A range self-join formulation
  would explode; a per-row subquery would be O(events × orders).)
- band:   broadcast the (tiny) band dimension and let the range
  predicate run map-side as a broadcast nested-loop — zero shuffle on
  the fact side until the final aggregation.  For big-big range joins
  the pattern switches to bucketed interval expansion (explode the
  interval into coarse buckets, equi-join on bucket, refine) — see
  the module test for the expansion identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table


@register(
    "asof_join",
    oracle="""
    WITH j AS (
      SELECT e.event_id, e.user_id, e.ts,
             o.o_orderkey, o.o_totalprice,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, ts,
           o_orderkey   AS asof_orderkey,
           o_totalprice AS asof_totalprice
    FROM j WHERE rn = 1
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to its user's most recent order
    at-or-before the event timestamp (ties broken by max o_orderkey).

    Physical strategy — the scalable union trick: tag both relations,
    union them, and take a running ``last(..., ignorenulls=True)`` over
    a per-key window ordered by time with order-rows sorting before
    event-rows at equal timestamps.  Cost is ONE shuffle on the join
    key + a linear pass per key — no interval explosion, no per-row
    probe.  At 100 TB this is the canonical as-of plan (same shape
    Flink/kdb use); skewed keys fall out of AQE skew handling because
    the window key is the shuffle key.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("is_order"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        "event_id",
    )
    od = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("is_order"),
        "o_orderkey",
        "o_totalprice",
        F.lit(None).cast("long").alias("event_id"),
    )
    # Orders sort before events at the same instant (inclusive <=), and
    # among same-instant orders the max o_orderkey lands last, so the
    # running last() picks it — matching the oracle's tie-break.
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_order").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        od.unionByName(ev)
        .select(
            "*",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
            F.last("o_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
        )
        .filter((F.col("is_order") == 0) & F.col("asof_orderkey").isNotNull())
    )
    return joined.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "asof_orderkey",
        "asof_totalprice",
    )


#: Deterministic price-band dimension, synthesized identically in Spark
#: and the DuckDB oracle (same pattern as SYNTH_LISTING_SQL): 20 bands
#: of 25k covering [0, 500k) — o_totalprice at every sf falls inside.
N_BANDS = 20
BAND_WIDTH = 25_000

_BANDS_SQL = f"""
SELECT i AS band_id,
       CAST(i * {BAND_WIDTH} AS DOUBLE)      AS lo,
       CAST((i + 1) * {BAND_WIDTH} AS DOUBLE) AS hi
FROM range({N_BANDS}) t(i)
"""


def _bands(spark: SparkSession) -> DataFrame:
    return spark.range(N_BANDS).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * BAND_WIDTH).cast("double").alias("lo"),
        ((F.col("id") + 1) * BAND_WIDTH).cast("double").alias("hi"),
    )


@register(
    "range_join_bands",
    oracle=f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band_id, b.lo, b.hi,
           count(*)                              AS n_orders,
           round(sum(o.o_totalprice), 2)         AS band_revenue
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id, b.lo, b.hi
    """,
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: orders matched to the price band containing
    their total price, then aggregated per band.

    Physical strategy: the band dimension is tiny and *disjoint*, so
    ``broadcast`` turns the non-equi predicate into a map-side
    broadcast-nested-loop — the orders side never shuffles for the
    join; the only shuffle is the final 20-key aggregation, which is
    map-side combined.  This is the plan a range-join hint would pick.
    For big-big interval joins (both sides large), the scalable
    rewrite is interval bucketing: explode each interval into coarse
    buckets, equi-join on bucket, then re-apply the exact predicate.
    That rewrite was implemented for THIS query too and A/B'd SLOWER
    at sf0.1 (0.40 vs 0.35 s min-of-6, r13): with a 20-row build side
    the BNLJ's per-row band scan already codegens tighter than the
    explode×3-candidates + hash-join path, so the bucketing form is
    reserved for band dims too big to scan per row.

    The revenue sum is round(…, 2) on both engines (the repo-wide
    float-aggregate convention): summation order differs between
    Spark's partial aggregates and DuckDB, and the driver hash is
    exact.
    """
    orders = load_table(spark, sf_dir, "orders")
    b = _bands(spark)
    j = orders.join(
        F.broadcast(b),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return (
        j.groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("band_revenue"),
        )
    )
