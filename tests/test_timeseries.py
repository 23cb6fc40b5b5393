"""Invariants for the time-series operators: gap-fill density and HLL
sketch accuracy/merge-invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_manifest_spark.operators.timeseries import gap_fill_hourly, sketch_hll_merge
from s3_manifest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_gap_fill_grid_is_dense(spark):
    out = gap_fill_hourly(spark, SF)
    rows = out.collect()
    types = {r.event_type for r in rows}
    hours = {r.hour_start for r in rows}
    assert len(rows) == len(types) * len(hours), "grid must be complete"
    # zero-filled cells exist and carry exact zeros
    zeros = [r for r in rows if r.n_events == 0]
    assert all(r.total_value == 0.0 for r in zeros)
    # filled cells sum back to the raw event count
    assert sum(r.n_events for r in rows) == load_table(spark, SF, "events").count()


def test_hll_estimate_close_to_exact_and_merge_invariant(spark):
    est = {r.event_type: r.approx_users for r in sketch_hll_merge(spark, SF).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(2, 0.05 * n), (t, est[t], n)
    # repartitioning the input must not change the merged estimate
    ev = load_table(spark, SF, "events").repartition(7, "user_id")
    ev.createOrReplaceTempView("_hll_repart")
    per_part = ev.groupBy("event_type", F.spark_partition_id().alias("pid")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est2 = {
        r.event_type: r.n
        for r in per_part.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("n"))
        .collect()
    }
    assert est2 == est
