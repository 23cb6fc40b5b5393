"""The custom stateful streaming operator must agree with its batch
twin: one row per user, identical counts/sums/max/last-seen."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_manifest_spark.sources.tables import load_table
from s3_manifest_spark.streaming.windows import run_user_state_stream

SF = "/root/testdata/sf0.001"


def test_user_state_stream_equals_batch(spark):
    got = {r.user_id: r for r in run_user_state_stream(spark, SF).collect()}
    want = {
        r.user_id: r
        for r in (
            load_table(spark, SF, "events")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
                F.max("value").alias("max_value"),
                F.max("ts").alias("last_ts"),
            )
            .collect()
        )
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g.n_events == w.n_events, uid
        assert abs(g.total_value - w.total_value) < 1e-6, uid
        assert g.max_value == w.max_value, uid
        assert g.last_ts == w.last_ts, uid
