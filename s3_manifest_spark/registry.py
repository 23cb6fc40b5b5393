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

#: DataFrames persisted by registry queries via :func:`track_persist`,
#: awaiting cleanup at the NEXT registry invocation (their owner's
#: result is evaluated lazily by the caller after the function
#: returns, so the owner cannot unpersist them itself).
_TRACKED_PERSISTS: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for deferred cleanup.

    Registry queries must use this instead of bare ``.persist()`` so
    that the next registry call unpersists exactly these blocks — not
    the whole session cache (``clearCache`` would also evict caches the
    driver or embedding application created outside the registry).
    """
    df.persist()
    _TRACKED_PERSISTS.append(df)
    return df


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Cache hygiene between registry calls: unpersist only the
            # intermediates a PRIOR registry query persisted (tracked
            # above).  By the time the next query is requested, the
            # previous result is materialized, so this releases executor
            # memory without evicting anything still needed — and without
            # touching caches created outside the registry.
            while _TRACKED_PERSISTS:
                _TRACKED_PERSISTS.pop().unpersist(blocking=False)
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
        curation,
    )
    from s3_manifest_spark.functions import scalar  # noqa: F401
    from s3_manifest_spark.streaming import windows  # noqa: F401
