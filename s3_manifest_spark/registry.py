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

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Cache hygiene between registry calls: a prior query may have
            # persisted intermediates (e.g. dedup shingles) that it cannot
            # unpersist itself — its DataFrame is evaluated lazily by the
            # caller AFTER the function returns.  By the time the NEXT
            # query is requested, the previous result is materialized, so
            # dropping all cached blocks here releases executor memory
            # without ever evicting something still needed.
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
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
        joins_advanced,
        analytics,
        timeseries,
    )
    from s3_manifest_spark.functions import scalar  # noqa: F401
    from s3_manifest_spark.streaming import windows  # noqa: F401
