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
    from s3_manifest_spark.operators.timeseries import sketch_hll_estimates

    # registered certificate form: every estimate in its 3-sigma bound
    cert = sketch_hll_merge(spark, SF).toPandas()
    assert cert["approx_in_bound"].all()

    est = {
        r.event_type: r.approx_users
        for r in sketch_hll_estimates(spark, SF).collect()
    }
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


def test_ohlc_consistency(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = q["ohlc_hourly"](spark, "/root/testdata/sf0.001").toPandas()
    assert (o["low"] <= o["high"]).all()
    assert ((o["open"] >= o["low"]) & (o["open"] <= o["high"])).all()
    assert ((o["close"] >= o["low"]) & (o["close"] <= o["high"])).all()
    # single-event candles have open == close
    one = o[o.n_events == 1]
    if len(one):
        assert (one["open"] == one["close"]).all()


def test_funnel_is_monotone(spark):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    f = q["funnel_steps"](spark, "/root/testdata/sf0.001").toPandas().iloc[0]
    assert f.step_view >= f.step_click >= f.step_purchase >= 0


def test_dedup_clusters_are_consistent_with_pairs(spark):
    """Every pair's endpoints share a component; component ids are the
    min member; sizes match membership counts."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    pairs = q["dedup_ngram_jaccard"](spark, sf).toPandas()
    comps = q["dedup_clusters"](spark, sf).toPandas()
    lab = dict(zip(comps.doc_id, comps.component_id))
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert lab[a] == lab[b], (a, b)
    grp = comps.groupby("component_id")
    for cid, g in grp:
        assert cid == g.doc_id.min()
        assert (g.component_size == len(g)).all()


def test_approx_distinct_flag_falsifies_on_drift(spark):
    """The 3-sigma certificate flag in approx_distinct must be TRUE on
    the real HLL estimate and must flip to FALSE when the estimate is
    deliberately drifted past the bound — proving the bound check is
    load-bearing, not vacuously true (its oracle emits a literal
    TRUE)."""
    from s3_manifest_spark.operators.relational import approx_distinct

    ok = approx_distinct(spark, SF).toPandas()
    assert ok["estimate_in_bound"].all()
    drifted = approx_distinct(spark, SF, _drift=0.25).toPandas()
    assert not drifted["estimate_in_bound"].any()


def test_hourly_anomalies_matches_pandas_zscore(spark):
    """Flagged hours must equal a pandas recompute of the exact-integer
    z-score, and every flagged |z| must meet the threshold."""
    from s3_manifest_spark.operators.timeseries import (
        ANOMALY_Z,
        hourly_anomalies,
    )
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = hourly_anomalies(spark, sf).toPandas()
    ev = load_table(spark, sf, "events").select("event_type", "ts").toPandas()
    ev["hour"] = ev["ts"].dt.floor("h")
    hourly = ev.groupby(["event_type", "hour"]).size().rename("c").reset_index()
    flagged = set()
    import math

    for et, grp in hourly.groupby("event_type"):
        n, s, ss = len(grp), int(grp["c"].sum()), int((grp["c"] ** 2).sum())
        if n * ss - s * s <= 0:
            continue
        for _, r in grp.iterrows():
            z = round((int(r["c"]) * n - s) / math.sqrt(n * ss - s * s), 6)
            if abs(z) >= ANOMALY_Z:
                flagged.add((et, r["hour"], int(r["c"]), z))
    assert {
        (r["event_type"], r["hour"], r["n_events"], r["zscore"])
        for _, r in got.iterrows()
    } == flagged
    assert (got["zscore"].abs() >= ANOMALY_Z).all()
    assert len(got) > 0


def test_user_sessions_matches_pandas_islands(spark):
    from s3_manifest_spark.operators.timeseries import (
        SESSION_GAP_US,
        user_sessions,
    )
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = user_sessions(spark, sf).toPandas().set_index("user_id")
    ev = (
        load_table(spark, sf, "events")
        .select("user_id", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in ev.groupby("user_id"):
        us = grp["ts"].astype("int64")  # ns since epoch
        gaps = us.diff() > SESSION_GAP_US * 1000
        sid = gaps.cumsum()
        per = sid.groupby(sid).size()
        assert got.loc[uid, "n_sessions"] == len(per)
        assert got.loc[uid, "n_events"] == len(grp)
        assert got.loc[uid, "longest_session"] == per.max()
