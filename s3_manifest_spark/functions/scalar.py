"""Scalar / window function surface beyond relational.py's basics:
navigation windows (lag/lead/first/last), filtered-conditional
aggregates, regex functions, array functions, and arg-max selection.
The reference's entire scalar-function surface is two functions
(substring_index-style last-token split and an RFC3339 parse,
/root/reference/src/main.rs:376,381-387) — everything here is declared
extension surface (SURVEY.md §2B).

Array-valued results are folded to strings (`array_join`) before
leaving the query: the driver's value hash stringifies cells, and
engine-native array reprs (numpy vs list) would differ even when the
contents match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table


@register(
    "window_lead_lag",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           CAST(row_number() OVER w AS BIGINT) AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions over each customer's order history.

    One shuffle on the partition key; lag/lead/first are O(1) state in
    a single per-key pass.  The ordering carries o_orderkey as a
    unique tie-break so every engine sees the same sequence (multiple
    orders share an order date at every sf).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@register(
    "window_ntile_dist",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS BIGINT)      AS acctbal_quartile,
           round(percent_rank() OVER w, 6)      AS pct_rank,
           round(cume_dist() OVER w, 6)         AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucketing, percent rank,
    cumulative distribution per market segment.  Same execution shape
    as every window: one shuffle on the partition key, one ordered
    pass; the (value, unique-id) ordering makes ranks engine-stable."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("acctbal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "conditional_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT)  AS big_qty_items,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
                                                                    AS discounted_revenue,
           round(avg(l_tax) FILTER (WHERE l_linestatus = 'F'), 6)   AS avg_tax_finished,
           CAST(count(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 40) AS BIGINT)
                                                                    AS bulk_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (SQL FILTER clause semantics) — expressed as
    conditional expressions inside ONE aggregation pass, not four
    separate scans unioned back together.  Map-side partials carry all
    four accumulators at once."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("big_qty_items"),
        F.round(
            F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2
        ).alias("discounted_revenue"),
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_tax"))), 6
        ).alias("avg_tax_finished"),
        F.count_distinct(
            F.when(F.col("l_quantity") > 40, F.col("l_suppkey"))
        ).alias("bulk_suppliers"),
    )


@register(
    "regex_funcs",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '[0-9]+')                   AS first_number,
           regexp_replace(text, '[0-9]+', '#', 'g')         AS numbers_masked,
           regexp_matches(text, '(?i)\bdata\b')             AS mentions_data,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
                                                            AS capitalized_words
    FROM documents
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / global replace / match test /
    match count.  Patterns stay in the RE2 ∩ Java-regex common subset
    so both engines agree; all JVM-side, one codegen stage, no
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "[0-9]+", 0).alias("first_number"),
        F.regexp_replace("text", "[0-9]+", "#").alias("numbers_masked"),
        F.col("text").rlike(r"(?i)\bdata\b").alias("mentions_data"),
        F.size(F.regexp_extract_all("text", F.lit("[A-Z][a-z]+"), F.lit(0)))
        .cast("long")
        .alias("capitalized_words"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                          AS n_tokens,
           array_to_string(toks[1:5], ' ')                    AS head5,
           list_contains(toks, 'the')                         AS has_the,
           CAST(len(list_distinct(toks)) AS BIGINT)           AS distinct_tokens,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',')
                                                              AS first3_sorted
    FROM t
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar surface: size / slice / contains / distinct / sort,
    folded to strings for engine-neutral comparison.  All built-in
    array expressions over one tokenize — narrow, shuffle-free.

    widen=True (r14): array_distinct/array_sort are per-row work over
    the token arrays, and the single-row-group fixture otherwise runs
    the whole corpus on ONE task — measured 0.21 → 0.11 s at sf0.1
    (the gate self-disables at production layouts)."""
    docs = load_table(spark, sf_dir, "documents", widen=True)
    toks = F.split("text", " ", -1)
    t = docs.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_join(F.slice("toks", 1, 5), " ").alias("head5"),
        F.array_contains("toks", "the").alias("has_the"),
        F.size(F.array_distinct("toks")).cast("long").alias("distinct_tokens"),
        F.array_join(
            F.slice(F.array_sort(F.array_distinct("toks")), 1, 3), ","
        ).alias("first3_sorted"),
    )


@register(
    "argmax_per_group",
    oracle="""
    SELECT n_name,
           arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
                                                   AS richest_customer,
           round(max(c_acctbal), 2)                AS top_acctbal,
           arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
                                                   AS poorest_customer
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min selection per group in a single aggregation —
    the shuffle carries one candidate row per group per partition
    (map-side combined), vs. a window row_number approach that
    shuffles every row.  DuckDB's arg_max takes only scalar ordering
    keys, so the (acctbal, custkey) tie-break is encoded as one
    monotone BIGINT — cents × 10⁷ + custkey (custkey < 10⁷ at every
    sf) — used identically by both engines."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    key = (
        F.round(F.col("c_acctbal") * 100).cast("long") * 10_000_000
        + F.col("c_custkey")
    )
    return j.groupBy("n_name").agg(
        F.max_by("c_name", key).alias("richest_customer"),
        F.round(F.max("c_acctbal"), 2).alias("top_acctbal"),
        F.min_by("c_name", key).alias("poorest_customer"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 6)               AS price_sqrt,
           round(ln(l_extendedprice), 6)                 AS price_ln,
           round(pow(l_discount + 1.0, 3), 6)            AS disc_cube,
           round(exp(l_discount), 6)                     AS disc_exp,
           CAST(abs(l_quantity - 25) AS BIGINT)          AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_kceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kfloor,
           CAST(l_orderkey % 97 AS BIGINT)               AS key_mod,
           CAST(sign(l_discount - 0.05) AS BIGINT)       AS disc_sign
    FROM lineitem
    WHERE l_orderkey % 40 = 0
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar surface: sqrt/ln/pow/exp/abs/ceil/floor/mod/sign in
    one codegen'd projection.  Transcendentals round to 6dp — both
    engines call the same libm double kernels, and the rounding absorbs
    any last-ulp disagreement."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 40 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1.0, 3), 6).alias("disc_cube"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.abs(F.col("l_quantity") - 25).cast("long").alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_kceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_kfloor"),
        (F.col("l_orderkey") % 97).cast("long").alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("disc_sign"),
    )


@register(
    "bitwise_funcs",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_orderkey) AS BIGINT)              AS key_and,
           CAST(bit_or(l_linenumber) AS BIGINT)             AS line_or,
           CAST(bit_xor(l_orderkey) AS BIGINT)              AS key_xor,
           CAST(sum(l_orderkey & 255) AS BIGINT)            AS low_byte_sum,
           CAST(sum(l_orderkey >> 8) AS BIGINT)             AS high_sum,
           CAST(sum(xor(l_orderkey, l_linenumber)) AS BIGINT) AS mix_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: AND/OR/XOR aggregates and
    shift/mask scalars — the toolkit behind bitmap indexes, bloom
    probes, and the packed-lane tricks used elsewhere in this repo.
    All codegen'd; the aggregates are associative, hence map-side
    combinable like any algebraic agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("key_and"),
        F.bit_or("l_linenumber").alias("line_or"),
        F.bit_xor("l_orderkey").alias("key_xor"),
        F.sum(F.col("l_orderkey").bitwiseAND(F.lit(255))).alias("low_byte_sum"),
        F.sum(F.shiftright("l_orderkey", 8)).alias("high_sum"),
        F.sum(F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber"))).alias(
            "mix_sum"
        ),
    )


@register(
    "null_semantics",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING')   AS seg,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
    )
    SELECT c_custkey,
           coalesce(seg, '<none>')                          AS seg_filled,
           (seg IS NOT DISTINCT FROM NULL)                  AS seg_is_null,
           round(coalesce(bal, 0.0), 2)                     AS bal_or_zero,
           round(ifnull(bal, -1.0), 2)                      AS bal_or_neg
    FROM c
    ORDER BY (bal IS NULL) DESC, bal DESC NULLS LAST, c_custkey
    LIMIT 200
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: nullif/coalesce/ifnull, null-safe
    equality (<=>), and explicit NULLS FIRST/LAST ordering — the
    semantics corner every engine must agree on exactly (the reference
    itself is a wall-to-wall null-defaulting pipeline, main.rs:373-387).
    The LIMIT rides a deterministic total order (null flag, balance,
    key)."""
    cust = load_table(spark, sf_dir, "customer")
    c = cust.select(
        "c_custkey",
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return (
        c.select(
            "c_custkey",
            F.coalesce("seg", F.lit("<none>")).alias("seg_filled"),
            F.col("seg").eqNullSafe(F.lit(None)).alias("seg_is_null"),
            F.round(F.coalesce("bal", F.lit(0.0)), 2).alias("bal_or_zero"),
            F.round(F.ifnull("bal", F.lit(-1.0)), 2).alias("bal_or_neg"),
            F.col("bal").isNull().alias("_nullflag"),
            "bal",
        )
        .orderBy(
            F.col("_nullflag").desc(),
            F.col("bal").desc_nulls_last(),
            "c_custkey",
        )
        .limit(200)
        .drop("_nullflag", "bal")
    )
