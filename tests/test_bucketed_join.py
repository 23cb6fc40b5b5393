"""Bucketing demonstration: pre-bucketing both join sides on the join
key lets the sort-merge join run with ZERO Exchange — the co-located
join that, at 100 TB, turns a repeated fact⋈fact shuffle into a scan.
This is a test rather than a queries() entry because it needs to write
bucketed tables (saveAsTable), which the sf_dir contract doesn't cover.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from s3_manifest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    (
        load_table(spark, SF, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/li_bucketed")
        .saveAsTable("li_bucketed")
    )
    (
        load_table(spark, SF, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/ord_bucketed")
        .saveAsTable("ord_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # tiny sf would broadcast; force the shuffle-join path bucketing
    # is designed to replace, then verify no Exchange is needed.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        od = spark.table("ord_bucketed")
        j = (
            li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(j)
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in join_section, (
            "bucketed join should not shuffle either side:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and of course it computes the same thing as the unbucketed join
    base = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, base.collect()))


@pytest.fixture(scope="module")
def bucketed_merge(spark, tmp_path_factory):
    """old snapshot + change feed as independent bucketed-by-key tables
    — the physical layout merge_change_feed is designed for."""
    from s3_manifest_spark.operators.manifest_queries import (
        _DIFF_BUMP,
        _DIFF_NEW_PRED,
        _DIFF_OLD_PRED,
    )
    from s3_manifest_spark.sources.tables import synth_listing

    wh = str(tmp_path_factory.mktemp("merge_wh"))
    listing = synth_listing(spark, SF)
    old = (
        listing.filter(F.expr(_DIFF_OLD_PRED))
        .groupBy("key")
        .agg(F.max("size").cast("long").alias("old_sz"))
    )
    feed = (
        listing.filter(F.expr(f"({_DIFF_OLD_PRED}) OR ({_DIFF_NEW_PRED})"))
        .groupBy("key")
        .agg(
            F.max(F.when(F.expr(_DIFF_OLD_PRED), F.col("size")))
            .cast("long").alias("feed_old"),
            F.max(F.when(F.expr(_DIFF_NEW_PRED), F.expr(_DIFF_BUMP)))
            .cast("long").alias("feed_new"),
        )
        .filter(~F.col("feed_old").eqNullSafe(F.col("feed_new")))
        .select("key", F.lit(True).alias("chg"), "feed_new")
    )
    for name, df in (("old_snap_b", old), ("chg_feed_b", feed)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "key").sortBy("key")
            .option("path", f"{wh}/{name}").saveAsTable(name)
        )
    yield spark
    spark.sql("DROP TABLE IF EXISTS old_snap_b")
    spark.sql("DROP TABLE IF EXISTS chg_feed_b")


def test_bucketed_merge_apply(bucketed_merge):
    """merge_change_feed over bucketed old/feed: ZERO Exchange on the
    full-outer MERGE join, and the result equals the directly-computed
    new snapshot (the manifest_apply_changes contract)."""
    from s3_manifest_spark.operators.manifest_queries import (
        _DIFF_BUMP,
        _DIFF_NEW_PRED,
        merge_change_feed,
    )
    from s3_manifest_spark.sources.tables import synth_listing

    spark = bucketed_merge
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        merged = merge_change_feed(
            spark.table("old_snap_b"), spark.table("chg_feed_b")
        )
        plan = _plan(merged)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            "bucketed MERGE should not shuffle either side:\n" + plan
        )
        expected = (
            synth_listing(spark, SF)
            .filter(F.expr(_DIFF_NEW_PRED))
            .groupBy("key")
            .agg(F.max(F.expr(_DIFF_BUMP)).cast("long").alias("size"))
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, expected.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
