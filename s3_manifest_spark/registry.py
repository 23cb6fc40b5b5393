"""Central query registry backing ``__spark_entry__.py``.

Every operator module registers its ``queries()`` entries (and, where
SQL-expressible, the DuckDB oracle twin) via :func:`register`.  The
driver contract requires identical column names between the Spark
DataFrame and the oracle result — alias both sides, always.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module for its registration side effects."""
    from s3_manifest_spark.operators import (  # noqa: F401
        manifest_queries,
        relational,
        dedup,
        similarity,
        text,
        multimodal,
    )
    from s3_manifest_spark.streaming import windows  # noqa: F401
