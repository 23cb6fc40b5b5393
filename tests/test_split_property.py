"""Property tests for dataset_split's hash-cut assignment: the Spark
expression must agree with a pure-Python md5 reference on arbitrary
doc_ids (engine-equivalence is the whole point of a hash-based split —
any engine that can md5 reproduces the split bit-for-bit)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from s3_manifest_spark.operators.curation import (
    SPLIT_CUT_TRAIN,
    SPLIT_CUT_VAL,
    SPLIT_SALT,
    _SPLIT_HASH_SPARK,
    _split_case,
)


def _py_split(doc_id: int) -> str:
    h = int(
        hashlib.md5(f"{doc_id}:{SPLIT_SALT}".encode()).hexdigest()[:8], 16
    )
    if h < SPLIT_CUT_TRAIN:
        return "train"
    if h < SPLIT_CUT_VAL:
        return "val"
    return "test"


def test_cuts_partition_the_hash_space():
    assert 0 < SPLIT_CUT_TRAIN < SPLIT_CUT_VAL < (1 << 32)


@settings(deadline=None, max_examples=20)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62),
        min_size=1,
        max_size=50,
        unique=True,
    )
)
def test_spark_split_matches_python_md5(spark, doc_ids):
    df = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in df.selectExpr(
            "doc_id", f"{_split_case(_SPLIT_HASH_SPARK)} AS split"
        ).collect()
    }
    for i in doc_ids:
        assert got[i] == _py_split(i), i
