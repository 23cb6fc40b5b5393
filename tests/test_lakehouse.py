"""Invariant tests for the lakehouse maintenance suite (lakehouse.py).

Oracle hashes certify engine parity (the driver); these tests pin the
SEMANTIC invariants a maintenance executor relies on: vacuum never
deletes a key the new snapshot still references, the Morton key
actually interleaves (deinterleaving recovers the quantized
coordinates), advised boundaries are ordered and balanced, and the
profile matches a pandas recompute."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def listing_pdf(spark):
    from s3_manifest_spark.sources.tables import synth_listing

    return synth_listing(spark, SF, widen=False).toPandas()


def test_vacuum_never_deletes_live_keys(spark, listing_pdf):
    from s3_manifest_spark.operators.lakehouse import (
        VACUUM_WATERMARK,
        vacuum_plan,
    )

    plan = vacuum_plan(spark, SF).toPandas()
    li = listing_pdf
    old = li[li["size"] % 3 != 0]
    new_keys = set(li.loc[li["size"] % 5 != 0, "key"])
    per_key = old.groupby("key").agg(
        old_sz=("size", "max"), mtime=("last_modified", "max")
    )
    cand = per_key[
        (~per_key.index.isin(new_keys))
        & (per_key["mtime"] < VACUUM_WATERMARK)
    ]
    # recompute the rollup and compare exactly
    cand = cand.reset_index()
    cand["prefix"] = cand["key"].str.split("/").str[:2].str.join("/")
    want = (
        cand.groupby("prefix")
        .agg(
            n_files=("key", "size"),
            reclaim_bytes=("old_sz", "sum"),
            oldest=("mtime", "min"),
            newest=("mtime", "max"),
        )
        .reset_index()
    )
    got = plan.sort_values("prefix").reset_index(drop=True)
    want = want.sort_values("prefix").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["prefix", "n_files", "reclaim_bytes", "oldest", "newest"]],
        want,
        check_dtype=False,
    )
    # the protection property, stated directly: no candidate key has a
    # row in the new snapshot
    assert not (set(cand["key"]) & new_keys)
    # and every candidate predates the watermark
    assert (cand["mtime"] < VACUUM_WATERMARK).all()


def test_zorder_key_deinterleaves(spark, listing_pdf):
    from s3_manifest_spark.operators.lakehouse import (
        Z_CELL_SHIFT,
        zorder_layout,
    )
    from s3_manifest_spark.operators.lakehouse import _z_expr
    from pyspark.sql import functions as F
    from s3_manifest_spark.sources.tables import synth_listing

    li = synth_listing(spark, SF, widen=False)
    rows = (
        li.select(
            "size",
            "last_modified",
            F.expr(_z_expr(True)).cast("long").alias("zkey"),
        )
        .limit(2000)
        .toPandas()
    )
    for _, r in rows.iterrows():
        qs_bits = qd_bits = 0
        for k in range(16):
            qs_bits |= ((int(r["zkey"]) >> (2 * k + 1)) & 1) << k
            qd_bits |= ((int(r["zkey"]) >> (2 * k)) & 1) << k
        assert qs_bits == min(int(r["size"]) >> 8, 65535)
        day = (
            pd.Timestamp(r["last_modified"][:10])
            - pd.Timestamp("1992-01-01")
        ).days & 65535
        assert qd_bits == day
    # rollup covers every file exactly once
    layout = zorder_layout(spark, SF).toPandas()
    assert layout["n_files"].sum() == len(listing_pdf)
    assert (
        layout["min_zkey"].astype("int64") // (1 << Z_CELL_SHIFT)
        == layout["zcell"]
    ).all()
    assert (
        layout["max_zkey"].astype("int64") // (1 << Z_CELL_SHIFT)
        == layout["zcell"]
    ).all()


def test_partition_advisor_boundaries_balanced(spark, listing_pdf):
    from s3_manifest_spark.operators.lakehouse import (
        ADVISOR_PARTITIONS,
        partition_advisor,
    )

    adv = (
        partition_advisor(spark, SF)
        .toPandas()
        .sort_values("boundary_idx")
        .reset_index(drop=True)
    )
    n = len(listing_pdf)
    assert list(adv["boundary_idx"]) == list(range(1, ADVISOR_PARTITIONS))
    assert list(adv["position"]) == [
        (i * (n - 1)) // ADVISOR_PARTITIONS
        for i in range(1, ADVISOR_PARTITIONS)
    ]
    # boundaries are the keys at those ordinals under (key, size) order
    ordered = listing_pdf.sort_values(["key", "size"]).reset_index(drop=True)
    want = [ordered.loc[p, "key"] for p in adv["position"]]
    assert list(adv["split_key"]) == want
    # and they are nondecreasing (a valid range-partition spec)
    assert list(adv["split_key"]) == sorted(adv["split_key"])


def test_profile_table_matches_pandas(spark):
    from s3_manifest_spark.operators.lakehouse import (
        PROFILE_COLS,
        profile_table,
    )
    from s3_manifest_spark.sources.tables import load_table

    prof = (
        profile_table(spark, SF).toPandas().set_index("col_name")
    )
    li = load_table(spark, SF, "lineitem").select(*PROFILE_COLS).toPandas()
    assert set(prof.index) == set(PROFILE_COLS)
    for c in PROFILE_COLS:
        s = li[c]
        assert prof.loc[c, "n_nulls"] == int(s.isna().sum())
        assert prof.loc[c, "n_distinct"] == int(s.dropna().nunique())
        assert prof.loc[c, "min_val"] == str(s.dropna().min())
        assert prof.loc[c, "max_val"] == str(s.dropna().max())


def test_zorder_prune_certifies_real_pruning(spark, listing_pdf):
    """The audit's numbers must reconcile: matching ⊆ files-in-cells ⊆
    total, and the false-read rate is exactly the non-matching share
    of the cells a pruned scan reads."""
    from s3_manifest_spark.operators.lakehouse import zorder_prune

    row = zorder_prune(spark, SF).toPandas().iloc[0]
    assert row["n_files_total"] == len(listing_pdf)
    assert 0 < row["n_matching"] <= row["n_files_in_cells"]
    assert row["n_files_in_cells"] <= row["n_files_total"]
    assert 0 < row["n_cells_touched"] <= 256
    want = 1.0 - row["n_matching"] / row["n_files_in_cells"]
    assert abs(row["false_read_rate"] - round(want, 6)) < 1e-12
    # pruning must actually prune: the needed cells hold fewer files
    # than the table (a layout with no pruning value would fail this)
    assert row["n_files_in_cells"] < row["n_files_total"]


def test_manifest_prune_two_level_reconciles(spark, listing_pdf):
    """Group overlap decisions must match a pandas recompute, and the
    two-level claim must hold: every matching file lives in an opened
    group (no false negatives, ever)."""
    from s3_manifest_spark.operators.lakehouse import (
        MPRUNE_KEY_HI,
        MPRUNE_KEY_LO,
        manifest_prune,
    )

    row = manifest_prune(spark, SF).toPandas().iloc[0]
    li = listing_pdf.copy()
    li["prefix"] = li["key"].str.split("/").str[:2].str.join("/")
    li["hit"] = ((li["key"] >= MPRUNE_KEY_LO) & (li["key"] < MPRUNE_KEY_HI)).astype(int)
    g = li.groupby("prefix").agg(
        min_key=("key", "min"), max_key=("key", "max"),
        files=("key", "size"), hits=("hit", "sum"),
    )
    opened = (g["min_key"] < MPRUNE_KEY_HI) & (g["max_key"] >= MPRUNE_KEY_LO)
    assert row["n_groups_total"] == len(g)
    assert row["n_groups_opened"] == int(opened.sum())
    assert row["n_files_total"] == len(li)
    assert row["n_files_in_opened"] == int(g.loc[opened, "files"].sum())
    assert row["n_matching"] == int(li["hit"].sum())
    # completeness: matching files only exist inside opened groups
    assert int(g.loc[~opened, "hits"].sum()) == 0
    assert row["n_matching"] > 0


def test_profile_approx_bound_falsifiable(spark):
    """The approx_in_bound certificate flag must be REAL: true for an
    estimate inside the 3-sigma HLL_4 bound, false for one drifted
    outside it — a vacuously-true flag cannot survive this."""
    from s3_manifest_spark.operators.lakehouse import (
        _HLL_3SIGMA_RSE,
        _hll_in_bound,
    )
    from pyspark.sql import functions as F

    exact = 10_000
    inside = int(exact * (1 + _HLL_3SIGMA_RSE) + 15)  # just within +16 slack
    outside = int(exact * (1 + 2 * _HLL_3SIGMA_RSE) + 200)
    df = spark.createDataFrame(
        [(exact, exact), (exact, inside), (exact, outside)],
        "exact long, approx long",
    )
    flags = [
        r["ok"]
        for r in df.select(
            _hll_in_bound(F.col("exact"), F.col("approx")).alias("ok")
        ).collect()
    ]
    assert flags == [True, True, False]


def test_profile_approx_matches_exact_profile(spark):
    """profile_table_approx shares n_nulls/min/max/exact_distinct with
    profile_table and every in-bound flag holds on the fixture."""
    from s3_manifest_spark.operators.lakehouse import (
        profile_table,
        profile_table_approx,
    )

    exact = profile_table(spark, SF).toPandas().set_index("col_name")
    approx = profile_table_approx(spark, SF).toPandas().set_index("col_name")
    assert sorted(exact.index) == sorted(approx.index)
    for c in exact.index:
        assert approx.loc[c, "exact_distinct"] == exact.loc[c, "n_distinct"]
        assert approx.loc[c, "n_nulls"] == exact.loc[c, "n_nulls"]
        assert approx.loc[c, "min_val"] == exact.loc[c, "min_val"]
        assert approx.loc[c, "max_val"] == exact.loc[c, "max_val"]
        assert bool(approx.loc[c, "approx_in_bound"]), c


def test_maintenance_suite_shares_listing_model(spark):
    """The model-sharing contract (r11): once one maintenance query
    builds the session listing model, the OTHERS scan no parquet of
    their own — their plans read the cached relation (or the shared
    CDC state), so a maintenance sweep touches the raw table once."""
    import re

    import __spark_entry__ as e
    from s3_manifest_spark.registry import clear_model_cache

    qs = e.queries()
    clear_model_cache(spark)
    qs["zorder_layout"](spark, SF).count()  # builds the listing model
    for name in ("zorder_prune", "manifest_prune"):
        getattr(spark, "_smsp_plan_cache", {}).clear()
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        # formatted mode prints the cached relation's BUILD lineage
        # too (one parquet scan inside the InMemoryRelation); the pin
        # is that the query itself reads the cache and adds no second
        # scan of its own
        assert "InMemoryTableScan" in plan, name
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 1, (
            name,
            plan,
        )
