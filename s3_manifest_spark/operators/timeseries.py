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


@register(
    "sketch_hll_merge",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           -- literal true by design: DuckDB cannot rerun the engine's
           -- mergeable HLL sketches, so the 3-sigma-RSE certificate
           -- arithmetic behind this flag is pinned locally by
           -- tests/test_timeseries.py::
           -- test_hll_estimate_close_to_exact_and_merge_invariant;
           -- exact_users above IS recomputed independently and
           -- hash-compared.
           true AS approx_in_bound
    FROM events
    GROUP BY event_type
    """,
)
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

    The estimate itself is engine-specific, so the registered form
    emits an oracle-checkable CERTIFICATE instead: the exact distinct
    count (one countDistinct aggregation — fine at fixture scale; at
    100 TB the sketch replaces it, which is the point) next to a flag
    asserting |estimate − exact| ≤ 3·RSE·exact + 16, the 3-sigma
    Datasketches HLL_4 bound at the default lgK=12 (RSE ≈
    1.04/√4096 ≈ 1.6%) with additive slack for the sparse-mode
    regime.  An estimator drifting out of its published error bound
    flips the flag and fails the driver hash check.  The raw-estimate
    relation stays available via :func:`sketch_hll_estimates`;
    merge-invariance is pinned in tests/test_timeseries.py.
    """
    ev = load_table(spark, sf_dir, "events")
    est = sketch_hll_estimates(spark, sf_dir)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    tol = F.lit(3 * 1.04 / 4096**0.5) * F.col("exact_users") + F.lit(16)
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users")) <= tol
        ).alias("approx_in_bound"),
    )


def sketch_hll_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw two-phase HLL relation ``(event_type, approx_users)``
    (what a consumer reads; see :func:`sketch_hll_merge` for the plan
    and the oracle-checkable certificate wrapper)."""
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


@register(
    "ohlc_hourly",
    oracle="""
    -- arg_min/arg_max need ONE monotone scalar ordering key (DuckDB
    -- restriction): microsecond epoch * 4096 + id-mod-4096 tie-break
    WITH keyed AS (
      SELECT event_type, ts, value,
             epoch_us(ts) * 4096 + event_id % 4096 AS ordkey
      FROM events
    )
    SELECT event_type,
           date_trunc('hour', ts)          AS hour_start,
           round(arg_min(value, ordkey), 2) AS open,
           round(max(value), 2)            AS high,
           round(min(value), 2)            AS low,
           round(arg_max(value, ordkey), 2) AS close,
           count(*)                        AS n_events
    FROM keyed
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open-high-low-close) hourly candles per event type — the
    canonical financial/telemetry downsampling operator.

    open/close are ``min_by``/``max_by`` with an encoded monotone
    (ts, event_id) key — one map-side-combinable aggregation carrying
    four scalars per (type, hour); no window, no sort of the raw
    stream.  (A first/last-over-window formulation would shuffle every
    event into a per-key sort; min_by keeps it a partial agg.)
    """
    events = load_table(spark, sf_dir, "events")
    # epoch-µs * 4096 + (event_id mod 4096): monotone in ts at full
    # microsecond resolution with a 4096-way id tie-break, and fits
    # int64 until year ~2041 (2^63/4096 µs ≈ 2.25e9 s past epoch).
    # (A seconds*10000+id encoding would stop
    # being monotone once ids exceed 10000 — ids here reach 10^5.)
    # Ambiguity requires two events in the SAME microsecond whose ids
    # are congruent mod 4096; the fixture has fully distinct µs
    # timestamps, and both engines share the formula regardless.
    ordkey = (
        F.unix_micros("ts") * 4096 + F.col("event_id") % 4096
    ).alias("ordkey")
    return (
        events.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_start"),
            "value",
            ordkey,
        )
        .groupBy("event_type", "hour_start")
        .agg(
            F.round(F.min_by("value", "ordkey"), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", "ordkey"), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      FROM events
    ),
    spans AS (
      SELECT user_id, value,
             epoch_us(next_ts) - epoch_us(ts) AS dur_us
      FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT user_id,
           round(sum(value * dur_us) / sum(dur_us), 4) AS twavg,
           CAST(sum(dur_us) AS BIGINT)                 AS span_us
    FROM spans
    GROUP BY user_id
    HAVING sum(dur_us) > 0
    """,
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user — each reading is
    weighted by how long it was current (until the next event), the
    hypertable/observability semantics where irregular sampling must
    not bias the mean.

    One shuffle keys events by user for the lead() window; the
    weighted-sum rollup reuses the same partitioning, so Spark chains
    both into a single exchange (window and groupBy share the key).
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = (
        events.select(
            "user_id",
            "value",
            (
                F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
            ).alias("dur_us"),
        )
        .filter(F.col("dur_us").isNotNull())
    )
    return (
        spans.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 4
            ).alias("twavg"),
            F.sum("dur_us").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS BIGINT)
             AS day_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day,
    counted distinct on each subsequent activity day offset.

    The firsts relation is one aggregation keyed by user; joining it
    back is co-partitioned with the events-by-user shuffle (AQE may
    broadcast it — it is |users| rows).  The distinct count shuffles
    (cohort, offset, user) triples — already heavily pre-aggregated.
    """
    events = load_table(spark, sf_dir, "events")
    # firsts is |users| rows — broadcast by AQE — so the join back is
    # map-side; a window-min formulation was measured 2x slower (the
    # per-user sort of raw events costs more than the tiny join).
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        events.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "funnel_steps",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view'     THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (t_view IS NOT NULL)    AS step_view,
           count(*) FILTER (t_view IS NOT NULL AND t_click > t_view)
                                                   AS step_click,
           count(*) FILTER (t_view IS NOT NULL AND t_click > t_view
                            AND t_purchase > t_click)
                                                   AS step_purchase
    FROM per_user
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who viewed, then clicked AFTER
    viewing, then purchased AFTER clicking (first occurrence of each
    step, strict ordering).

    Classic sessionized-product query expressed as ONE conditional
    aggregation per user (no joins, no window): the per-step first
    timestamps are FILTER-style min aggregates, and the ordering
    predicate is evaluated on the single per-user row.  Scales as a
    plain two-phase agg keyed by user.
    """
    events = load_table(spark, sf_dir, "events")

    def first_ts(tp: str):
        return F.min(F.when(F.col("event_type") == tp, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("step_view"),
        F.count(F.when(clicked, 1)).alias("step_click"),
        F.count(F.when(purchased, 1)).alias("step_purchase"),
    )


# ---------------------------------------------------------------------------
# Hourly volume anomalies (r10): exact-integer z-scores
# ---------------------------------------------------------------------------

ANOMALY_Z = 2.0  # flag hours whose rounded |z| meets this


@register(
    "hourly_anomalies",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)   AS n,
             CAST(sum(c) AS BIGINT)     AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM hourly GROUP BY 1
    ),
    z AS (
      SELECT h.event_type, h.hour, h.c,
             round((h.c * t.n - t.s) / sqrt(CAST(t.n * t.ss - t.s * t.s
                                                 AS DOUBLE)), 6) AS zscore
      FROM hourly h JOIN stats t USING (event_type)
      WHERE t.n * t.ss - t.s * t.s > 0
    )
    SELECT event_type, hour, c AS n_events, zscore
    FROM z WHERE abs(zscore) >= {ANOMALY_Z}
    """,
)
def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume is a ≥:data:`ANOMALY_Z`σ outlier for
    their event type — the monitoring primitive over the hourly
    rollup.  ``(event_type, hour, n_events, zscore)``.

    Numerics contract (why this hashes exactly, unlike a naive
    stddev): the z-score is computed as ``(c·n − s) / √(n·ss − s²)``
    where c (hourly count), n (hours), s (Σc), ss (Σc²) are all EXACT
    integers — the whole statistic is one correctly-rounded division
    of one correctly-rounded sqrt of an exact integer, so it is
    bit-identical in every engine with no summation-order exposure;
    the 6-dp rounding and the ≥ threshold then act on identical
    doubles.  Spark shape: one map-side-combinable hourly rollup, a
    per-type stats aggregate (rows = event types) broadcast back, one
    filter — the raw events are scanned once."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    z = (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") * F.col("ss") - F.col("s") * F.col("s") > 0)
        .select(
            "event_type",
            "hour",
            F.col("c").alias("n_events"),
            F.round(
                (F.col("c") * F.col("n") - F.col("s"))
                / F.sqrt(
                    (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                    .cast("double")
                ),
                6,
            ).alias("zscore"),
        )
    )
    return z.filter(F.abs(F.col("zscore")) >= ANOMALY_Z)


# ---------------------------------------------------------------------------
# Batch sessionization (r10): gaps-and-islands per user
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1_800 * 1_000_000  # 30-min inactivity gap, microseconds


@register(
    "user_sessions",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, event_id FROM events),
    lagd AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS ns
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id,
             sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagd
    ),
    per AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS c
      FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(c) AS BIGINT)   AS n_events,
           CAST(max(c) AS BIGINT)   AS longest_session
    FROM per GROUP BY 1
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gaps-and-islands twin of
    ``stream_session``'s streaming session windows: events split into
    sessions at >30-minute inactivity gaps per user, rolled up to
    ``(user_id, n_sessions, n_events, longest_session)``.

    Gap arithmetic runs on exact MICROSECOND integers
    (``unix_micros`` / ``epoch_us`` — the fixture has sub-second
    timestamps, so second-truncated comparisons would disagree across
    engines at boundaries).  Plan: ONE user-keyed exchange total — the
    lag + running-sum windows hash-partition by user, and both
    downstream aggregations' clustering requirements ((user, sid) and
    (user)) are satisfied by that same partitioning, so Catalyst
    reuses it; within a partition the sort is the session order the
    semantics need anyway.  Skewed users span a partition but never a
    window buffer (running frames stream)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    ns = F.when(
        F.lag("ts").over(w).isNull()
        | (us - F.unix_micros(F.lag("ts").over(w)) > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id",
        F.sum(ns).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    per = sess.groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("c").alias("n_events"),
        F.max("c").alias("longest_session"),
    )


@register(
    "attribution_touch",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, ts, event_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER w AS first_touch_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_id END IGNORE NULLS)
               OVER w AS first_touch_id,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER w AS last_touch_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_id END IGNORE NULLS)
               OVER w AS last_touch_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
           first_touch_type, CAST(first_touch_id AS BIGINT) AS first_touch_id,
           last_touch_type,  CAST(last_touch_id AS BIGINT)  AS last_touch_id
    FROM e WHERE event_type = 'purchase'
    """,
)
def attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: for every ``purchase``
    event, the user's earliest and latest strictly-preceding
    non-purchase events under the (ts, event_id) total order — the
    marketing-analytics primitive behind conversion credit, and the
    anchor view funnel audits join against.  Purchases with no prior
    touch keep NULL attribution columns (a real report must count
    them, not drop them).

    ONE user-keyed exchange total: all four attribution columns are
    ``first``/``last(ignorenulls)`` over the same
    unboundedPreceding→-1 frame of the same user window, so they
    share one sort + one Window operator; the purchase filter is a
    post-window codegen projection.  At 100 TB the only skew surface
    is a pathological single user — the user_sessions salting note
    applies unchanged.  The conditional-struct trick is NOT needed:
    the type/id column pairs pick from the same source row because
    both use the identical (frame, predicate, ordering).
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.col("event_type") != "purchase"
    out = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.first(F.when(touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("first_touch_type"),
        F.first(F.when(touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("first_touch_id"),
        F.last(F.when(touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("last_touch_type"),
        F.last(F.when(touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("last_touch_id"),
    )
    return out.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "first_touch_type",
        "first_touch_id",
        "last_touch_type",
        "last_touch_id",
    )
