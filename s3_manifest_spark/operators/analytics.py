"""Analytical operator surface beyond the §2B core: pivot/unpivot,
statistical aggregates, grouping sets, scalar-subquery rewrites, and a
composite training-data curation pipeline.  The reference has none of
these (SURVEY.md §2A "explicitly absent": its only aggregate is a
scalar counter, /root/reference/src/main.rs:231).

Same determinism rules as relational.py: float aggregates rounded
identically on both sides, integer sums cast to BIGINT in DuckDB,
unique tie-breaks on every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table

ORDER_STATUSES = ["F", "O", "P"]


@register(
    "pivot_wide",
    oracle="""
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS status_F,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS status_O,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: revenue by priority, spread across order-status columns.

    The pivot value list is declared explicitly, which keeps the plan a
    single pass — Spark otherwise runs an extra distinct-collect job to
    discover values, a driver round-trip you never want at 100 TB.
    With declared values this is one map-side-combinable hash aggregate
    on a low-cardinality key; the pivot itself adds zero shuffles.
    """
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_orderpriority",
        *[F.col(s).alias(f"status_{s}") for s in ORDER_STATUSES],
    )


@register(
    "unpivot_long",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey'    AS metric, CAST(o_custkey AS DOUBLE) AS val FROM orders
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): fold measure columns into (metric, val)
    rows.  ``unpivot`` is a generator expression — narrow, no shuffle,
    output is exactly rows × measures.  The long layout is what makes
    per-metric windowing/aggregation uniform downstream."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
        .unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "val")
    )


@register(
    "stats_funcs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4)              AS price_stddev,
           round(var_samp(l_discount), 6)                      AS disc_var,
           round(corr(l_quantity, l_extendedprice), 6)         AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4)   AS qty_price_covar,
           round(quantile_cont(l_extendedprice, 0.5), 4)       AS price_median,
           round(quantile_cont(l_extendedprice, 0.95), 4)      AS price_p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance/corr/covar +
    exact interpolated percentiles.

    The exact interpolated percentiles do NOT use Spark's
    ``percentile`` aggregate: it is a TypedImperativeAggregate that
    buffers every value in a per-group OpenHashMap and serializes the
    whole buffer between partial and merge — measured ~0.7 s of the
    query's 1.0 s wall at sf0.1.  Instead one ``applyInPandas`` over
    the group key ships each group's columns once through Arrow and
    takes ``np.percentile`` (C quickselect, same (n-1)·q linear
    interpolation as Spark's percentile and DuckDB's quantile_cont —
    parity is driver-hash-checked).  The kernel ships ONLY the
    percentile column: the moments are JVM map-side-combinable
    aggregates at full stage width, broadcast-joined to the 3-row
    percentile result (see the inline note — the r15 fold of the
    moments into the kernel was measured a net loss).  At 100 TB the
    per-group buffering itself is the limit: the sketch path
    (``approx_percentile``) or the sort-based
    :func:`~s3_manifest_spark.operators.quantiles.percentile_dist_exact`
    replaces exactness-per-group buffering entirely.
    """
    # The 3-group Arrow percentile kernel needs its exchange kept at
    # parallelism ≥ group count: size-driven coalescing folds the
    # 3 group tasks onto 1-2 partitions and serializes them
    # (interleaved A/B min-of-5, two windows: 0.82→0.69 / 0.74→0.63 s).
    from s3_manifest_spark.registry import prefer_parallel_exchanges

    prefer_parallel_exchanges(spark)
    li = load_table(spark, sf_dir, "lineitem")

    def pctl(pdf):
        import numpy as np
        import pandas as pd

        price = pdf["l_extendedprice"].to_numpy(dtype="float64")
        med, p95 = np.percentile(price, [50.0, 95.0])
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "price_median": [float(med)],
                "price_p95": [float(p95)],
            }
        )

    pctls = (
        li.select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(
            pctl,
            schema="l_returnflag string, price_median double, "
            "price_p95 double",
        )
    )
    # Moments stay JVM-side (r16 — reverting half of the r15 fold):
    # stddev/var/corr/covar are map-side-combinable whole-stage-codegen
    # aggregates that run 32-wide, while the percentile kernel is ONE
    # task per group (3 groups) — folding the moments into it shipped
    # four columns of the whole fact table through a parallelism-3
    # Arrow exchange to save a scan that costs ~0.05 s.  Splitting
    # ships one column through Arrow and computes the moments at full
    # stage width; the two 3-row results broadcast-join.  JVM sample
    # aggregates also give the NULL-on-degenerate-group semantics
    # (n<2, zero-variance corr) the oracle has natively (ADVICE r15).
    moments = (
        li.select(
            "l_returnflag", "l_extendedprice", "l_quantity", "l_discount"
        )
        .groupBy("l_returnflag")
        .agg(
            F.stddev_samp("l_extendedprice").alias("price_stddev"),
            F.var_samp("l_discount").alias("disc_var"),
            F.corr("l_quantity", "l_extendedprice").alias("qty_price_corr"),
            F.covar_samp("l_quantity", "l_extendedprice").alias(
                "qty_price_covar"
            ),
        )
    )
    return (
        # null-SAFE key equality (r16 review): GROUP BY keeps a NULL
        # key as its own group on both engines, and a plain inner join
        # on l_returnflag would silently drop that group from the
        # split plan — latent on TPC-H (column non-null), a row-count
        # divergence on any real corpus.
        moments.join(
            F.broadcast(pctls.withColumnRenamed("l_returnflag", "_rf")),
            moments["l_returnflag"].eqNullSafe(F.col("_rf")),
        )
        .drop("_rf")
        # round JVM-side: F.round is HALF_UP like the oracle's round()
        # (Python's round would be banker's)
        .select(
            "l_returnflag",
            F.round("price_stddev", 4).alias("price_stddev"),
            F.round("disc_var", 6).alias("disc_var"),
            F.round("qty_price_corr", 6).alias("qty_price_corr"),
            F.round("qty_price_covar", 4).alias("qty_price_covar"),
            F.round("price_median", 4).alias("price_median"),
            F.round("price_p95", 4).alias("price_p95"),
        )
    )


@register(
    "grouping_sets",
    oracle="""
    SELECT coalesce(n_name, '<all>')       AS nation,
           coalesce(c_mktsegment, '<all>') AS segment,
           count(*)                        AS customer_count,
           round(sum(c_acctbal), 2)        AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (independent of rollup/cube): per-nation,
    per-segment, and grand totals in one aggregation pass.  Spark
    expands the sets via a single Expand node feeding one shuffle —
    strictly cheaper than unioning three separate aggregates, which
    would triple the scan.  The nation dim is broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    j.createOrReplaceTempView("cust_nation")
    return spark.sql(
        """
        SELECT coalesce(n_name, '<all>')       AS nation,
               coalesce(c_mktsegment, '<all>') AS segment,
               count(*)                        AS customer_count,
               round(sum(c_acctbal), 2)        AS total_acctbal
        FROM cust_nation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    )


@register(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           floor(cust_avg * 10000) / 10000 AS cust_avg
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  OVER (PARTITION BY o_custkey) AS DOUBLE)
               / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    WHERE o_totalprice > 2 * cust_avg
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery pattern ("orders more than twice the
    customer's average") rewritten as a windowed aggregate — the
    de-correlated form every optimizer targets.  One shuffle on the
    correlation key instead of a per-row subquery probe; at 100 TB the
    window state per key is a single running sum/count.

    The average is computed as exact-decimal sum ÷ count rather than
    float ``avg``: float summation order differs per engine, and a
    1-ulp difference both flips the rounded display value on .00005
    boundaries and makes the `> 2×avg` predicate itself
    engine-dependent.  Decimal sums are order-independent, so both
    engines divide identical numbers.  Display truncation uses
    ``floor`` rather than ``round``: the quotient of a 2-dp-exact sum
    by a count of 10 lands exactly on .xxxx5, where Spark's HALF_UP
    decimal rounding and DuckDB's binary rounding legitimately
    disagree — floor is identical on identical doubles.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            cust_avg.alias("cust_avg"),
        )
        .filter(F.col("o_totalprice") > 2 * F.col("cust_avg"))
        .withColumn("cust_avg", F.floor(F.col("cust_avg") * 10000) / 10000)
    )


#: Shared curation thresholds (Spark and oracle must agree).
CURATION_LANGS = ("en", "de", "fr")
CURATION_MIN_CHARS = 120
CURATION_MAX_WORD_LEN = 60


@register(
    "pipeline_curation",
    oracle=f"""
    WITH filtered AS (
      SELECT doc_id, text, lang, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE lang IN ('en', 'de', 'fr')
        AND length(text) >= {CURATION_MIN_CHARS}
        AND len(list_filter(string_split(text, ' '), w -> length(w) > {CURATION_MAX_WORD_LEN})) = 0
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    )
    SELECT lang, source,
           count(*)               AS docs_kept,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT)   AS first_doc
    FROM deduped
    GROUP BY lang, source
    """,
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation composite: language filter →
    quality gates (min length, no pathological tokens) → exact dedup
    keeping the lowest doc_id → per-(lang, source) token accounting.

    The whole pipeline is two shuffles at any scale: one on the
    content hash (uniform by construction) for dedup, one on the
    low-cardinality (lang, source) rollup with map-side combine.
    Filters run at the scan (pushdown) so rejected documents never
    leave their input partition.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ", -1)
    filtered = (
        docs.filter(F.col("lang").isin(*CURATION_LANGS))
        .filter(F.length("text") >= CURATION_MIN_CHARS)
        .filter(
            F.size(F.filter(toks, lambda w: F.length(w) > CURATION_MAX_WORD_LEN)) == 0
        )
        .select("doc_id", "text", "lang", "source", F.size(toks).cast("long").alias("n_tokens"))
    )
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        filtered.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
    )
    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 7 PRECEDING AND CURRENT ROW
           ), 2) AS trailing_7d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue per customer via a RANGE window frame —
    value-based (all orders within 7 days), not row-count-based, so
    same-day peers are always in the frame together regardless of
    intra-day order.

    The order key is epoch-days (an exact integer), making the frame
    boundary arithmetic identical across engines; a timestamp-interval
    frame would hinge on each engine's interval semantics.  One shuffle
    keyed by customer, sort amortized across all frames in the
    partition."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-7, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_7d"),
    )


@register(
    "exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
          )
    """,
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries, written as SQL and
    left to Catalyst — which decorrelates them into a left-semi and a
    left-anti hash join over the same orders scan (no per-row
    re-execution, unlike a naive correlated evaluation).  The physical
    plan is asserted join-based in tests/test_plans.py."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
              )
          AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
              )
        """
    )


@register(
    "map_funcs",
    oracle="""
    WITH per AS (
      SELECT o_custkey, o_orderstatus AS s, count(*) AS c
      FROM orders GROUP BY o_custkey, o_orderstatus
    )
    SELECT o_custkey,
           string_agg(s, ',' ORDER BY s)                               AS statuses,
           CAST(sum(c) AS BIGINT)                                      AS total_orders,
           CAST(coalesce(max(CASE WHEN s = 'F' THEN c END), 0) AS BIGINT) AS f_orders,
           CAST(count(*) AS BIGINT)                                    AS n_statuses,
           string_agg(s || '=' || CAST(c * 2 AS VARCHAR), ','
                      ORDER BY s)                                      AS doubled
    FROM per
    GROUP BY o_custkey
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-customer order-status histogram as
    a real MapType column, then map_keys / map_values / element_at /
    transform_values / map_entries over it.

    Maps don't hash portably, so the outputs are folded to scalars and
    sorted strings; the DuckDB oracle computes the same values straight
    from the grouped relation (it checks VALUES, not storage).  Build
    is two map-side-combinable aggregations on the same key — the map
    itself never shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderstatus", "c")))
        ).alias("m")
    )
    doubled = F.transform_values(F.col("m"), lambda _, v: v * 2)
    return m.select(
        "o_custkey",
        F.array_join(F.map_keys("m"), ",").alias("statuses"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_orders"),
        F.coalesce(F.element_at("m", F.lit("F")), F.lit(0)).alias("f_orders"),
        F.size(F.map_keys("m")).cast("long").alias("n_statuses"),
        F.array_join(
            F.transform(
                F.map_entries(doubled),
                lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
            ),
            ",",
        ).alias("doubled"),
    )


@register(
    "data_quality_gate",
    oracle="""
    SELECT 'orders_null_custkey'  AS check_name,
           CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(count(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           CAST(count(*) FILTER (l_quantity <= 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders_future_dates',
           CAST(count(*) FILTER (o_orderdate > TIMESTAMP '2030-01-01') AS BIGINT)
    FROM orders
    """,
)
def data_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: the validation suite a pipeline runs before
    promoting a batch — null keys, referential orphans (anti-join),
    range violations, future timestamps — one row per check with its
    violation count.

    Each rule is a conditional aggregate over its table's single scan;
    the referential check is a left-anti join against the (broadcast)
    key side.  At 100 TB this runs as one pass per fact table
    regardless of how many rules share the scan — rules are columns,
    not jobs.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def explode_checks(agg_df, names):
        # one-row agg → one row per check: keeps each table at ONE scan
        # (a unionByName per rule would re-scan the table per rule)
        return agg_df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("check_name"),
                            F.col(col).alias("violations"),
                        )
                        for name, col in names
                    ]
                )
            ).alias("c")
        ).select("c.check_name", "c.violations")

    orders_checks = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1))
        .cast("long")
        .alias("null_custkey"),
        F.count(
            F.when(F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp"), 1)
        )
        .cast("long")
        .alias("future_dates"),
    )
    li_checks = li.agg(
        F.count(F.when(F.col("l_quantity") <= 0, 1)).cast("long").alias("bad_qty"),
        F.count(F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1))
        .cast("long")
        .alias("bad_disc"),
    )
    orphans = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_anti"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))

    return (
        explode_checks(
            orders_checks,
            [
                ("orders_null_custkey", "null_custkey"),
                ("orders_future_dates", "future_dates"),
            ],
        )
        .unionByName(
            orphans.select(
                F.lit("orders_orphan_custkey").alias("check_name"),
                F.col("n").alias("violations"),
            )
        )
        .unionByName(
            explode_checks(
                li_checks,
                [
                    ("lineitem_nonpositive_qty", "bad_qty"),
                    ("lineitem_discount_range", "bad_disc"),
                ],
            )
        )
    )


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           count(*) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix (the Markov-chain view
    of user behavior): counts of consecutive (prev → next) pairs across
    every user's ordered history.

    One shuffle keys events by user for the lag() window; the
    transition rollup is a map-side-combinable aggregation over the
    25-cell (prev, next) space — the shuffle after the window carries
    partial counts, not events.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
