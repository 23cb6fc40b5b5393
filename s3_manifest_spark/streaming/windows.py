"""Streaming slice (SURVEY.md §2B / §7.1 M3) over the ``events`` table.

``F.window`` and ``F.session_window`` evaluate identically in batch and
streaming, so each operator exists once as a column expression shared
by (a) a batch query with a DuckDB oracle — the driver-checkable
surface — and (b) a Structured Streaming path (file source →
watermark → windowed agg → availableNow drain) proven in tests and the
rows-only ``stream_tumbling_live`` entry.

Scale notes: watermark + tumbling window is the canonical bounded-state
aggregation — state size is (windows in flight × groups), independent
of input volume.  Session windows keep one open session per key; the
30-min gap bounds their lifetime.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table

#: raw schema of events.parquet — ts is TIMESTAMP(NANOS), which Spark
#: only reads as long (see sources.tables.load_table).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def _tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling count/sum per event_type (shared batch/stream)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts)                         AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR       AS window_end,
           event_type,
           count(*)                                       AS n_events,
           round(sum(value), 2)                           AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the tumbling-window aggregation (F.window in batch
    mode) — DuckDB checks it as an hour-truncated GROUP BY."""
    return _tumbling_agg(load_table(spark, sf_dir, "events"))


@register(
    "stream_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    islands AS (
      -- (ts, event_id) ordering matches the lag window above: with a
      -- ROWS frame, tied-ts rows would otherwise get engine-chosen peer
      -- order and a boundary row's cumulative sum could split the tie
      -- pair into different sessions.
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM marked
    )
    SELECT user_id,
           min(ts)                        AS session_start,
           max(ts) + INTERVAL 30 MINUTE   AS session_end,
           count(*)                       AS n_events
    FROM islands
    GROUP BY user_id, sess
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session windows per user.

    Spark: native ``session_window`` (merging state windows).  The
    oracle reproduces the gap semantics with a gaps-and-islands SQL
    (lag → new-session marker → cumulative island id), since DuckDB has
    no session_window; session_end = last event + gap matches Spark's
    definition.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ns→µs conversion as
    in the batch loader).

    The file-stream source only accepts directories, so the fixture
    file is staged (hard-linked when possible) into a per-sf spool dir
    — which is also the production layout: a stream source watches a
    directory that files land in, it doesn't tail a single file.
    """
    import os
    import shutil

    spool = os.path.join(
        tempfile.gettempdir(), f"smsp-events-{os.path.basename(sf_dir)}"
    )
    os.makedirs(spool, exist_ok=True)
    dst = os.path.join(spool, "events.parquet")
    if not os.path.exists(dst):
        try:
            os.link(f"{sf_dir}/events.parquet", dst)
        except OSError:
            shutil.copy(f"{sf_dir}/events.parquet", dst)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .load(spool)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_tumbling_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Drive the tumbling aggregation through Structured Streaming with
    an availableNow trigger (deterministic fixture replay, SURVEY.md
    §7.4.7) and return the drained result as a batch DataFrame."""
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", watermark)
    agg = _tumbling_agg(stream)
    name = f"tumbling_{abs(hash(sf_dir)) % 10_000_000}"
    with tempfile.TemporaryDirectory(prefix="smsp-ckpt-") as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register("stream_tumbling_live")  # rows-only: actual streaming execution
def stream_tumbling_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real Structured Streaming path (readStream → watermark →
    window agg → availableNow drain), surfaced as a batch DataFrame so
    the driver can smoke it.  Values equal stream_tumbling's."""
    return run_tumbling_stream(spark, sf_dir)


#: Output/state schemas for the custom stateful operator.  State stays
#: scalar (4 fixed-width fields per user) so per-key state is O(1)
#: bytes — the property that lets arbitrary-cardinality keyed state
#: survive at 100 TB input.
USER_STATE_OUTPUT = (
    "user_id long, n_events long, total_value double, max_value double, last_ts timestamp"
)
_USER_STATE_SCHEMA = "n long, total double, mx double, last_us long"


def run_user_state_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-user running profile (event count, value sum/max, last seen
    timestamp) that no built-in windowed aggregate expresses — the
    state is an arbitrary Python tuple, updated per Arrow batch.

    Execution shape: one shuffle keys events by user; each micro-batch
    updates O(1)-sized state per user and emits the refreshed profile
    (Update mode).  With the availableNow trigger over the fixture the
    drain is deterministic: exactly one row per user, equal to the
    batch groupBy twin (asserted in tests/test_streaming_state.py).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_user_state(key, pdfs, state: GroupState):
        if state.exists:
            n, total, mx, last_us = state.get
        else:
            n, total, mx, last_us = 0, 0.0, float("-inf"), 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
            # normalize to µs regardless of pandas' ns/us datetime unit
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            last_us = max(last_us, int(ts_us.max()))
        state.update((n, total, mx, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [mx],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    stream = read_events_stream(spark, sf_dir)
    profiles = stream.groupBy("user_id").applyInPandasWithState(
        update_user_state,
        outputStructType=USER_STATE_OUTPUT,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"user_state_{abs(hash(sf_dir)) % 10_000_000}"
    with tempfile.TemporaryDirectory(prefix="smsp-ckpt-") as ckpt:
        q = (
            profiles.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register("stream_user_state_live")  # rows-only: custom stateful streaming op
def stream_user_state_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user profile, drained deterministically
    (one row per user; values equal the batch groupBy twin)."""
    return run_user_state_stream(spark, sf_dir)
