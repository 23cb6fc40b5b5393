"""Fidelity tests for the manifest core — each case encodes the
reference's exact semantics (/root/reference/src/main.rs:210-219,
361-390); see SURVEY.md §2C."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import types as T

from s3_manifest_spark.manifest.core import (
    MANIFEST_SCHEMA,
    derive_manifest,
    manifest_stats,
    write_manifest,
)

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("last_modified", T.StringType(), True),
    ]
)


def _listing(spark, rows):
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def _one(spark, key, size=1, lm="2024-10-22T12:34:56Z", **kw):
    df = derive_manifest(_listing(spark, [(key, size, lm)]), "b", **kw)
    return df.collect()[0]


def test_happy_path(spark):
    r = _one(spark, "a/b/c.txt", 42, "2024-10-22T12:34:56Z")
    assert r.Bucket == "b"
    assert r.Key == "a/b/c.txt"
    assert r.FileName == "c.txt"
    assert r.Size == 42
    assert r.LastModified == dt.datetime(2024, 10, 22, 12, 34, 56)


def test_no_delimiter_yields_whole_key(spark):
    # main.rs:376 — rsplit().next() on a miss returns the whole string
    assert _one(spark, "README").FileName == "README"


def test_key_ending_in_delimiter_yields_empty(spark):
    assert _one(spark, "a/b/").FileName == ""


def test_regex_metachar_delimiter_is_literal(spark):
    # '.' and '|' must split literally, not as regex (SURVEY §7.4.2)
    assert _one(spark, "a.b.c", delimiter=".").FileName == "c"
    assert _one(spark, "a|b|c", delimiter="|").FileName == "c"
    assert _one(spark, "a.b.c", delimiter="|").FileName == "a.b.c"


def test_multichar_delimiter(spark):
    assert _one(spark, "a--b--c", delimiter="--").FileName == "c"


def test_null_defaults(spark):
    # main.rs:373-387 — null key → "", null size → 0, null mtime → epoch 0
    r = _one(spark, None, None, None)
    assert (r.Key, r.FileName, r.Size) == ("", "", 0)
    assert r.LastModified == dt.datetime(1970, 1, 1)


def test_garbage_mtime_is_epoch0(spark):
    assert _one(spark, "k", 1, "not-a-date").LastModified == dt.datetime(1970, 1, 1)


def test_millisecond_truncation(spark):
    r = _one(spark, "k", 1, "2024-10-22T12:34:56.123456Z")
    assert r.LastModified == dt.datetime(2024, 10, 22, 12, 34, 56, 123000)


def test_prefix_filter_is_raw_startswith(spark):
    rows = [("logs/a", 1, None), ("logs2/b", 2, None), ("other/c", 3, None)]
    got = derive_manifest(_listing(spark, rows), "b", prefix="logs")
    # NOT path-aware: "logs2/b" matches prefix "logs" (main.rs:215)
    assert sorted(r.Key for r in got.collect()) == ["logs/a", "logs2/b"]


def test_output_schema_exact(spark):
    df = derive_manifest(_listing(spark, [("a/b", 1, None)]), "b")
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in MANIFEST_SCHEMA.fields
    ]


def test_no_nulls_in_output(spark):
    df = derive_manifest(_listing(spark, [(None, None, None), ("x", 1, "bad")]), "b")
    pdf = df.toPandas()
    assert not pdf.isnull().any().any()


def test_write_roundtrip_ms_precision(spark, tmp_path):
    df = derive_manifest(
        _listing(spark, [("a/b.txt", 5, "2024-10-22T12:34:56.789Z")]), "b"
    )
    out = str(tmp_path / "manifest")
    write_manifest(df, out)
    back = spark.read.parquet(out).collect()[0]
    assert back.LastModified == dt.datetime(2024, 10, 22, 12, 34, 56, 789000)
    assert back.Size == 5


def test_batch_boundary_scale(spark):
    # >1000 rows to cover the reference's flush boundary (main.rs:236);
    # in Spark batching is internal, we just assert counts survive.
    rows = [(f"p/{i}", i, "2024-01-01T00:00:00Z") for i in range(2500)]
    df = derive_manifest(_listing(spark, rows), "b", prefix="p/")
    assert df.count() == 2500


def test_manifest_stats(spark):
    rows = [("a/1", 10, None), ("a/2", 20, None), ("b/1", 5, None), ("root", 1, None)]
    stats = {
        r.top_prefix: (r.object_count, r.total_bytes)
        for r in manifest_stats(derive_manifest(_listing(spark, rows), "b")).collect()
    }
    assert stats == {"a": (2, 30), "b": (1, 5), "": (1, 1)}


def test_empty_listing_yields_empty_manifest_with_schema(spark):
    """Zero-object prefixes are a normal case for the reference (it
    writes an empty parquet); the pipeline must preserve the exact
    output schema on empty input."""
    from pyspark.sql import types as T

    from s3_manifest_spark.manifest.core import MANIFEST_SCHEMA, derive_manifest

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("size", T.LongType()),
                T.StructField("last_modified", T.StringType()),
            ]
        ),
    )
    m = derive_manifest(empty, bucket="b", prefix="none/")
    assert m.count() == 0
    assert [f.name for f in m.schema.fields] == [
        f.name for f in MANIFEST_SCHEMA.fields
    ]
    assert [f.dataType for f in m.schema.fields] == [
        f.dataType for f in MANIFEST_SCHEMA.fields
    ]


def test_stats_fusion_equals_unfused(spark):
    """The hand-fused stats rollup (aggregating source columns
    directly) must be value-identical to the full
    listing -> derive_manifest -> groupBy composition it replaces."""
    from s3_manifest_spark.operators.manifest_queries import (
        manifest_stats_unfused,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        fused = (
            manifest_stats_unfused(spark, sf, fused=True)
            .toPandas()
            .sort_values("prefix2")
            .reset_index(drop=True)
        )
        unfused = (
            manifest_stats_unfused(spark, sf, fused=False)
            .toPandas()
            .sort_values("prefix2")
            .reset_index(drop=True)
        )
        assert fused.equals(unfused[fused.columns]), sf


def test_prefix_filter_fusion_equals_unfused(spark):
    """The source-column prefix pushdown (l_returnflag startswith 'A')
    must be value-identical to the generic key-startswith composition
    it replaces."""
    from s3_manifest_spark.operators.manifest_queries import (
        manifest_prefix_filter,
        manifest_prefix_filter_unfused,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        fused = manifest_prefix_filter(spark, sf).toPandas()
        unfused = manifest_prefix_filter_unfused(spark, sf).toPandas()
        # the listing can repeat a Key with different sizes — sort on
        # every column for a deterministic compare
        cols = sorted(fused.columns)
        fused = fused.sort_values(cols).reset_index(drop=True)
        unfused = unfused[fused.columns].sort_values(cols).reset_index(
            drop=True
        )
        assert fused.equals(unfused), sf


def test_size_cents_equals_round(spark):
    """size_cents (primitive floor(x+0.5)) must equal the oracle's
    CAST(round(p*100) AS BIGINT) on every fixture price — the
    precondition (non-negative input) the fusion's docstring states."""
    from pyspark.sql import functions as F

    from s3_manifest_spark.sources.tables import size_cents

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        ne = li.filter(
            ~size_cents().eqNullSafe(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            )
        ).count()
        assert ne == 0, sf


def test_packed_key_injective(spark):
    """Grouping by the packed long must produce the SAME groups as
    grouping by the concat'd key string: distinct-count equality over
    the joint relation proves the packing is injective on the fixture's
    component domain (and that no two distinct keys collide)."""
    from pyspark.sql import functions as F

    from s3_manifest_spark.operators.manifest_queries import _packed_key

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    key_str = F.concat(
        F.lit("data/"),
        F.col("l_returnflag"),
        F.lit("/"),
        F.col("l_orderkey").cast("string"),
        F.lit("/part-"),
        F.col("l_linenumber").cast("string"),
        F.lit(".parquet"),
    )
    joint = li.select(_packed_key().alias("k"), key_str.alias("s"))
    counts = joint.agg(
        F.countDistinct("k").alias("nk"),
        F.countDistinct("s").alias("ns"),
        F.countDistinct("k", "s").alias("nks"),
    ).first()
    assert counts.nk == counts.ns == counts.nks


def test_packed_key_null_components_and_unpack(spark):
    """A NULL in any component must null the packed key (one NULL
    group, mirroring the NULL concat'd string), and the post-agg
    unpack must rebuild the exact key string for non-null rows."""
    from pyspark.sql import functions as F

    from s3_manifest_spark.operators.manifest_queries import (
        _packed_key,
        _unpacked_key_string,
    )
    from s3_manifest_spark.sources.tables import listing_projection

    rows = [
        ("A", 7, 3, 1.0),
        (None, 7, 3, 1.0),
        ("A", None, 3, 1.0),
        ("A", 7, None, 1.0),
        ("R", 149999, 7, 2.5),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_orderkey long, l_linenumber int, l_extendedprice double"
    )
    got = df.select(
        _unpacked_key_string(_packed_key()).alias("rebuilt"),
        F.concat(
            F.lit("data/"),
            F.col("l_returnflag"),
            F.lit("/"),
            F.col("l_orderkey").cast("string"),
            F.lit("/part-"),
            F.col("l_linenumber").cast("string"),
            F.lit(".parquet"),
        ).alias("direct"),
    ).collect()
    for r in got:
        assert r.rebuilt == r.direct


def test_project_fusion_equals_unfused(spark):
    """The fused manifest projection (source columns -> manifest
    columns directly) must be value-identical to the full
    synth_listing -> derive_manifest composition it replaces."""
    from s3_manifest_spark.operators.manifest_queries import (
        manifest_project,
        manifest_project_unfused,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        cols = ["Bucket", "Key", "FileName", "Size", "LastModified"]
        fused = (
            manifest_project(spark, sf)
            .toPandas()
            .sort_values(cols)
            .reset_index(drop=True)
        )
        unfused = (
            manifest_project_unfused(spark, sf)
            .toPandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        assert list(fused.columns) == cols
        assert fused.equals(unfused), sf


def test_project_fusion_null_semantics(spark):
    """NULL component -> Key '' and FileName ''; NULL price -> Size 0;
    NULL shipdate -> epoch 0 — the fused projection must reproduce
    derive_manifest's defaults exactly (lineitem has no NULLs, so the
    fixture equality test cannot cover this branch)."""
    import datetime as dt

    from s3_manifest_spark.manifest.core import derive_manifest
    from s3_manifest_spark.operators.manifest_queries import (
        _fused_manifest_projection,
    )
    from s3_manifest_spark.sources.tables import listing_projection

    rows = [
        ("A", 7, 3, 1.0, dt.datetime(2020, 5, 6, 7, 8, 9)),
        (None, 7, 3, 1.0, dt.datetime(2020, 5, 6, 7, 8, 9)),
        ("A", None, 3, 1.0, dt.datetime(2020, 5, 6, 7, 8, 9)),
        ("A", 7, None, 1.0, dt.datetime(2020, 5, 6, 7, 8, 9)),
        ("A", 7, 3, None, dt.datetime(2020, 5, 6, 7, 8, 9)),
        ("A", 7, 3, 1.0, None),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_extendedprice double, l_shipdate timestamp",
    )
    cols = ["Bucket", "Key", "FileName", "Size", "LastModified"]
    fused = (
        _fused_manifest_projection(li)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    unfused = (
        derive_manifest(listing_projection(li), bucket="test-bucket")
        .toPandas()[cols]
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert fused.equals(unfused)


def test_parquet_footer_helpers_handle_directories(spark, tmp_path):
    """parquet_row_count / parquet_row_groups accept both fixture
    single-file parquet and Spark-written directory parquet."""
    from s3_manifest_spark.sources.tables import (
        parquet_row_count,
        parquet_row_groups,
    )

    d = str(tmp_path / "dir.parquet")
    spark.range(100).repartition(3).write.parquet(d)
    assert parquet_row_count(d) == 100
    assert parquet_row_groups(d) >= 3
    f = "/root/testdata/sf0.001/lineitem.parquet"
    assert parquet_row_count(f) > 0
    assert parquet_row_groups(f) >= 1


def test_size_cents_half_up_ulp_boundaries(spark):
    """size_cents must reproduce true HALF_UP on adversarial doubles —
    in particular values one ulp below a .5 boundary, where the
    classic floor(x+0.5) rounds UP (0.49999999999999994 + 0.5 == 1.0)
    but round() must not."""
    from pyspark.sql import functions as F

    from s3_manifest_spark.sources.tables import size_cents

    # values are PRICES; size = half-up(price * 100)
    prices = [
        0.0049999999999999994,  # *100 lands just below 0.5
        0.005,
        0.015,
        0.0049,
        1.005,
        12.345,
        0.0,
    ]
    df = spark.createDataFrame(
        [(p,) for p in prices], "l_extendedprice double"
    )
    rows = df.select(
        size_cents().alias("fast"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ref"),
    ).collect()
    for r in rows:
        assert r.fast == r.ref, (r.fast, r.ref)


def test_fused_projection_falls_back_under_non_utc_session(spark):
    """The timestamp fusion is a UTC-only identity; under another
    session timezone the registered queries must take the unfused
    composition so fused == unfused keeps holding by construction."""
    import __spark_entry__ as e

    qs = e.queries()
    sf = "/root/testdata/sf0.001"
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    spark.conf.set(key, "Europe/Berlin")
    try:
        getattr(spark, "_smsp_plan_cache", {}).clear()
        from s3_manifest_spark.operators.manifest_queries import (
            manifest_project_unfused,
        )

        cols = ["Bucket", "Key", "FileName", "Size", "LastModified"]
        fused_path = (
            qs["manifest_project"](spark, sf)
            .toPandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        unfused = (
            manifest_project_unfused(spark, sf)
            .toPandas()[cols]
            .sort_values(cols)
            .reset_index(drop=True)
        )
        assert fused_path.equals(unfused)
    finally:
        spark.conf.set(key, old)
        getattr(spark, "_smsp_plan_cache", {}).clear()


def test_packed_domain_guard(spark, tmp_path):
    """_packed_domain_ok: proves the fixture's domain from footer
    stats, rejects out-of-domain inputs, and the string-key fallback
    plan produces the identical diff/apply results."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_manifest_spark.operators import manifest_queries as mq

    sf = "/root/testdata/sf0.001"
    assert mq._packed_domain_ok(sf) is True

    # out-of-domain crafted inputs are rejected (linenumber 8, a
    # two-char returnflag, an orderkey past 2^42)
    cases = [
        {"l_orderkey": [1], "l_linenumber": [8], "l_returnflag": ["A"]},
        {"l_orderkey": [1], "l_linenumber": [1], "l_returnflag": ["AB"]},
        {"l_orderkey": [2**42], "l_linenumber": [1], "l_returnflag": ["A"]},
    ]
    for i, data in enumerate(cases):
        d = tmp_path / f"bad{i}"
        d.mkdir()
        pq.write_table(pa.table(data), d / "lineitem.parquet")
        assert mq._packed_domain_ok(str(d)) is False, data

    # fallback equivalence: force the string-key plan on the fixture
    # (raw functions — never through the registry's plan memo)
    key = f"{sf}/lineitem.parquet"
    packed_diff = mq.manifest_diff(spark, sf).toPandas()
    packed_apply = mq.manifest_apply_changes(spark, sf).toPandas()
    mq._PACKED_DOMAIN_OK[key] = False
    try:
        str_diff = mq.manifest_diff(spark, sf).toPandas()
        str_apply = mq.manifest_apply_changes(spark, sf).toPandas()
    finally:
        mq._PACKED_DOMAIN_OK[key] = True

    def norm(pdf, cols):
        return pdf.sort_values(cols).reset_index(drop=True)

    assert norm(packed_diff, ["change_type"]).equals(
        norm(str_diff, ["change_type"])
    )
    assert norm(packed_apply, ["key"]).equals(norm(str_apply, ["key"]))


def test_text_repetition_null_text_yields_null_share(spark, tmp_path):
    """NULL/token-less documents must emit NULL top_token_share (not
    NaN — Spark treats NaN as a non-null double, diverging from the
    oracle's NULL; ADVICE r7)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from s3_manifest_spark.operators.text import text_repetition

    d = tmp_path / "sfnull"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array(["spark spark row", None], type=pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    pdf = text_repetition(spark, str(d)).toPandas().set_index("doc_id")
    assert pdf.loc[1, "top_token_share"] == 0.6667
    assert pdf["top_token_share"].isna().loc[2]
    import math

    row = text_repetition(spark, str(d)).filter("doc_id = 2").collect()[0]
    assert row["top_token_share"] is None  # NULL, not NaN
    assert not (
        isinstance(row["top_token_share"], float)
        and math.isnan(row["top_token_share"])
    )


def test_packed_key_raises_out_of_domain(spark):
    """The packed plan's in-row guard: out-of-domain components (the
    case footer stats cannot always rule out, e.g. a multi-char
    returnflag between single-char extremes) raise instead of
    silently merging distinct keys; NULL components still collapse to
    the NULL key."""
    import pytest

    from s3_manifest_spark.operators.manifest_queries import _packed_key

    schema = "l_returnflag string, l_orderkey long, l_linenumber int"
    bad = spark.createDataFrame([("AB", 1, 1)], schema)
    with pytest.raises(Exception, match="domain violated"):
        bad.select(_packed_key().alias("k")).collect()
    for row in ((("R", 2**42, 1),), (("R", 1, 8),)):
        with pytest.raises(Exception, match="domain violated"):
            spark.createDataFrame(list(row), schema).select(
                _packed_key().alias("k")
            ).collect()
    ok = (
        spark.createDataFrame([("A", 5, 3), (None, 1, 1)], schema)
        .select(_packed_key().alias("k"))
        .collect()
    )
    assert ok[0]["k"] == 5 * 2048 + 3 * 256 + ord("A")
    assert ok[1]["k"] is None


def test_compaction_plan_invariants(spark):
    """Python recompute equality + packing bounds: bins are contiguous
    per prefix, cover every file exactly once, and only ever exceed
    the target by less than their last file."""
    import collections

    from s3_manifest_spark.operators.manifest_queries import (
        COMPACTION_TARGET_BYTES,
        compaction_plan,
    )
    from s3_manifest_spark.sources.tables import synth_listing

    sf = "/root/testdata/sf0.001"
    res = compaction_plan(spark, sf).toPandas()
    listing = synth_listing(spark, sf, widen=False).toPandas()
    assert res["n_files"].sum() == len(listing)

    # reference recompute
    listing["prefix"] = listing["key"].str.split("/").str[:2].str.join("/")
    want = collections.defaultdict(lambda: [0, 0])  # (prefix,bin) -> [files, bytes]
    for prefix, grp in listing.groupby("prefix"):
        cum = 0
        for _, row in grp.sort_values(["key", "size"]).iterrows():
            b = cum // COMPACTION_TARGET_BYTES
            want[(prefix, b)][0] += 1
            want[(prefix, b)][1] += row["size"]
            cum += row["size"]
    got = {
        (r["prefix"], r["bin_id"]): [r["n_files"], r["total_bytes"]]
        for _, r in res.iterrows()
    }
    assert got == dict(want)

    # bin ids are sorted/unique per prefix and match the recompute
    # exactly (via `got == want` above).  NOT asserted contiguous:
    # a file larger than COMPACTION_TARGET_BYTES legitimately skips
    # bin ids (the oversized file owns its exclusive-cumsum bin), so
    # contiguity is a fixture artifact, not an operator property.
    for prefix, grp in res.groupby("prefix"):
        bins = sorted(grp["bin_id"])
        assert len(set(bins)) == len(bins)
        assert bins == sorted({b for (p, b) in want if p == prefix})


def test_compaction_binner_partials_adversarial(spark):
    """The r11 partial-emitting compaction kernel must reproduce a
    single-pass pandas reference on an adversarial layout: bins
    spanning partitions AND batches, an oversized file (own bin),
    duplicate (key, size) rows, and a prefix whose rows land in
    multiple partitions."""
    import pandas as pd

    from pyspark.sql import functions as F

    from s3_manifest_spark.operators.manifest_queries import (
        _binned_partials,
    )
    from s3_manifest_spark.operators.sort_offsets import (
        exclusive_offsets,
        partition_weights,
    )

    rows = []
    # prefix A: 40 files of 30 bytes (bins of target 100 span rows),
    # with duplicate keys
    for i in range(40):
        rows.append(("data/A", f"data/A/{i // 2:04d}", 30))
    # prefix B: an oversized file then small ones
    rows.append(("data/B", "data/B/0000", 1000))
    for i in range(1, 7):
        rows.append(("data/B", f"data/B/{i:04d}", 40))
    # prefix C: single row exactly at target
    rows.append(("data/C", "data/C/0000", 100))
    df = spark.createDataFrame(rows, "prefix string, key string, size long")
    target = 100

    data = (
        df.repartitionByRange(5, "prefix", "key", "size")
        .sortWithinPartitions("prefix", "key", "size")
        .localCheckpoint(eager=True)
    )
    meta = partition_weights(data, ["prefix"], F.sum("size"))
    offsets, _ = exclusive_offsets(meta, "prefix")
    b_off = spark.sparkContext.broadcast(offsets)
    got = (
        _binned_partials(data, b_off, target)
        .groupBy("prefix", "bin_id")
        .agg(
            F.sum("n_files").alias("n_files"),
            F.sum("total_bytes").alias("total_bytes"),
            F.min("first_key").alias("first_key"),
            F.max("last_key").alias("last_key"),
        )
        .toPandas()
        .sort_values(["prefix", "bin_id"])
        .reset_index(drop=True)
    )

    # single-pass pandas reference
    ref = pd.DataFrame(rows, columns=["prefix", "key", "size"]).sort_values(
        ["prefix", "key", "size"]
    )
    ref["excl"] = ref.groupby("prefix")["size"].cumsum() - ref["size"]
    ref["bin_id"] = ref["excl"] // target
    want = (
        ref.groupby(["prefix", "bin_id"])
        .agg(
            n_files=("key", "size"),
            total_bytes=("size", "sum"),
            first_key=("key", "min"),
            last_key=("key", "max"),
        )
        .reset_index()
        .sort_values(["prefix", "bin_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("prefix", "bin_id", "n_files", "total_bytes",
              "first_key", "last_key"):
        assert list(got[c]) == list(want[c]), c
    # the adversarial intent held: some bin really spans partitions
    # (partial merge exercised) and the oversized file got its own bin
    b = got[got["prefix"] == "data/B"]
    assert (b[b["bin_id"] == 0]["n_files"] == 1).all()
