"""Property-based fidelity check: derive_manifest must agree with a
direct Python model of the reference's per-object logic
(/root/reference/src/main.rs:361-390) on arbitrary listings —
arbitrary unicode keys, missing fields, hostile delimiters.

One Spark job per Hypothesis example would be minutes of overhead, so
each example IS a whole listing (list of rows) and the comparison runs
row-aligned in one pass.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from s3_manifest_spark.manifest.core import derive_manifest

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("last_modified", T.StringType(), True),
    ]
)

# keys: printable unicode incl. delimiter-heavy and empty strings
keys = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
        max_size=40,
    ),
)
sizes = st.one_of(st.none(), st.integers(min_value=0, max_value=2**50))
mtimes = st.one_of(
    st.none(),
    st.just("not-a-date"),
    st.datetimes(
        min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2100, 1, 1)
    ).map(lambda d: d.strftime("%Y-%m-%dT%H:%M:%SZ")),
)
rows = st.lists(st.tuples(keys, sizes, mtimes), min_size=1, max_size=30)
delimiters = st.sampled_from(["/", ".", "|", "::", "$", "日"])


def model_row(key, size, mtime, bucket, delim):
    """The reference's per-object semantics, straight from main.rs."""
    k = key or ""
    parts = k.split(delim)  # literal split; rsplit(...)[-1] == split(...)[-1]
    fname = parts[-1] if delim in k else k
    try:
        ts = dt.datetime.strptime(mtime or "", "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        ts = dt.datetime(1970, 1, 1)
    return (bucket, k, fname, int(size or 0), ts)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(listing=rows, delim=delimiters)
def test_manifest_matches_reference_model(spark, listing, delim):
    df = spark.createDataFrame(
        [Row(key=k, size=s, last_modified=m) for k, s, m in listing],
        schema=LISTING_SCHEMA,
    )
    got = [
        (r.Bucket, r.Key, r.FileName, r.Size, r.LastModified)
        for r in derive_manifest(df, bucket="b", delimiter=delim).collect()
    ]
    want = [model_row(k, s, m, "b", delim) for k, s, m in listing]
    assert sorted(got) == sorted(want)


def test_packed_key_injective_property(spark):
    """Injectivity of the REAL _packed_key Spark expression over the
    key template's whole component domain (single-char returnflag,
    linenumber 1-7, orderkey up to TPC-H sf100 magnitudes): the packed
    long must form exactly as many distinct groups as the concat'd key
    string, over a seeded 5000-row random sample plus the domain
    boundaries — all in ONE Spark job (a Hypothesis example-per-job
    would be minutes, and a Python reimplementation of the formula
    would not catch drift in the code under test)."""
    import random

    from pyspark.sql import functions as F

    from s3_manifest_spark.operators.manifest_queries import _packed_key

    rng = random.Random(0xC0FFEE)
    rows = [
        (rng.choice("ANRXYZ"), rng.randint(1, 6_000_000_000), rng.randint(1, 7), 1.0)
        for _ in range(5000)
    ]
    rows += [
        ("A", 1, 1, 1.0),
        ("A", 1, 7, 1.0),
        ("Z", 1, 7, 1.0),
        ("A", 6_000_000_000, 7, 1.0),
        ("R", 5_999_999_999, 1, 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_orderkey long, l_linenumber int, "
        "l_extendedprice double",
    )
    key_str = F.concat(
        F.lit("data/"),
        F.col("l_returnflag"),
        F.lit("/"),
        F.col("l_orderkey").cast("string"),
        F.lit("/part-"),
        F.col("l_linenumber").cast("string"),
        F.lit(".parquet"),
    )
    got = df.agg(
        F.countDistinct(_packed_key()).alias("nk"),
        F.countDistinct(key_str).alias("ns"),
        F.countDistinct(_packed_key(), key_str).alias("nks"),
    ).first()
    assert got.nk == got.ns == got.nks
