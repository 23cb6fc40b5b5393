"""Regression tests for the schema-adaptive events ``ts`` loader.

The driver fixture has shipped ``events.parquet`` with ts as both
parquet TIMESTAMP(NANOS) and timestamp[us]; an unconditional ns→us
conversion against the wrong vintage broke every events consumer
(round-3 regression).  These tests synthesize BOTH vintages with
pyarrow and assert the loader lands on identical instants.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from s3_manifest_spark.sources.tables import load_table

_BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
_TS = [_BASE + dt.timedelta(minutes=3 * i, microseconds=i) for i in range(8)]


def _write_events(tmp_path, unit: str) -> str:
    sf_dir = os.path.join(tmp_path, f"fixture-{unit}")
    os.makedirs(sf_dir)
    n = len(_TS)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([i % 3 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([float(i) for i in range(n)]),
            "props": pa.array(['{"k": 1}'] * n),
        }
    )
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_loader_normalizes_all_fixture_vintages(spark, tmp_path, unit):
    """ns-precision files arrive as raw longs (nanosAsLong) and must be
    truncated to µs; us/ms-precision files arrive as TIMESTAMP_NTZ and
    must cast through — all to the same instants (ms files carry
    ms-truncated values by construction)."""
    sf_dir = _write_events(str(tmp_path), unit)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r["ts"] for r in df.orderBy("event_id").collect()]
    expect = (
        [t.replace(microsecond=t.microsecond // 1000 * 1000) for t in _TS]
        if unit == "ms"
        else _TS
    )
    assert got == expect


def test_both_vintages_agree_through_an_aggregate(spark, tmp_path):
    """The exact shape that died in round 3: an hourly aggregate over
    ts must produce identical rows from either on-disk schema."""
    import pyspark.sql.functions as F

    results = []
    for unit in ("ns", "us"):
        df = load_table(spark, _write_events(str(tmp_path), unit), "events")
        results.append(
            sorted(
                df.groupBy(F.date_trunc("hour", "ts").alias("h"))
                .count()
                .collect()
            )
        )
    assert results[0] == results[1]
