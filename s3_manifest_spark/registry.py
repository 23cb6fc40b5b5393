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

#: Arbitrary cleanup callbacks registered by queries whose returned
#: (lazy) result still depends on query-scoped state — e.g. a session
#: conf override that must stay live until the caller evaluates the
#: frame.  Run at the NEXT registry invocation, after the persists.
_DEFERRED_CLEANUPS: list[Callable[[], None]] = []

#: Nesting depth of registered-query calls (certificates compose other
#: registered queries); only depth-0 entry runs the cleanup sweep.
_CALL_DEPTH = 0


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


def track_cleanup(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for deferred unpersist —
    for frames persisted with a bare ``.persist()`` inside a loop
    (where superseded generations are unpersisted eagerly) whose final
    generation must outlive the query function."""
    _TRACKED_PERSISTS.append(df)
    return df


def pin_partitions(df: DataFrame, eager_cleanup: bool) -> DataFrame:
    """Freeze a frame's partition layout for plans whose later passes
    key off ``spark_partition_id()`` (the sort-based percentile and
    global-ordinal operators): a recomputation could re-sample
    ``repartitionByRange`` boundaries and silently misalign the
    metadata the driver already collected.

    Registry queries (``eager_cleanup=False``) persist via
    :func:`track_persist` — released at the next registry call.
    Library callers (``eager_cleanup=True``) get ``localCheckpoint``:
    partitions materialize in executor storage with lineage truncated,
    so the layout can never be recomputed differently, nothing routes
    through the driver, and the blocks free when the frame is
    garbage-collected — no registry cleanup needed.  (localCheckpoint
    is not executor-loss-tolerant; at production scale prefer the
    registry/persist path or a reliable checkpoint dir.)
    """
    if eager_cleanup:
        return df.localCheckpoint(eager=True)
    return track_persist(df)


def defer_cleanup(fn: Callable[[], None]) -> None:
    """Run ``fn`` at the next registry invocation (after persists are
    released).  For query-scoped session state — conf overrides,
    temp views — that the caller's lazy evaluation still needs after
    the query function returns."""
    _DEFERRED_CLEANUPS.append(fn)


def prefer_parallel_exchanges(spark) -> None:
    """Query-scoped opt-out of size-driven AQE partition coalescing
    (the session default since r17): restore Spark's
    parallelism-first policy for THIS query's execution, reverting at
    the next registry invocation (the lazy-plan-safe conf-swap
    pattern, star_join_revenue's precedent).

    For plans whose exchanges are CPU-DENSE PER BYTE — fingerprint /
    shingle-hash aggregations where a kilobyte of shuffle rows carries
    seconds of aggregate evaluation — byte-sized coalescing collapses
    the post-shuffle stage onto one or two tasks and serializes the
    CPU (measured 2x on dedup_ngram_jaccard / doc_containment /
    lsh_tuning_curve, FLOOR_CONF_AB.json); parallelism-first keeps
    those stages wide.  Idempotent and re-entrant: a nested second
    call sees the policy already parallelism-first and does nothing.
    """
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    old = spark.conf.get(key, None)
    if old == "true":
        return
    spark.conf.set(key, "true")

    def _restore(k=key, o=old):
        if o is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, o)

    defer_cleanup(_restore)


class Releasable:
    """Wrap a non-DataFrame resource held by a model-cache entry so
    :func:`clear_model_cache` can free it — e.g. the py4j RDD handle
    backing a ``localCheckpoint`` (whose blocks a ``DataFrame
    .unpersist()`` would NOT release: checkpointed RDDs never register
    in the CacheManager, so without this they linger until the
    ContextCleaner GCs the RDD)."""

    def __init__(self, release_fn: Callable[[], None]):
        self._release_fn = release_fn

    def release(self) -> None:
        try:
            self._release_fn()
        except Exception:
            pass  # session already stopped / blocks already freed


def session_model_cache(spark: SparkSession) -> dict:
    """The session model cache (``spark._smsp_model_cache``), created
    on first use.  Trainers key it by ``(prefix, sf_dir)`` tuples;
    release entries with :func:`clear_model_cache`, never a bare
    ``.clear()`` (see that function's docstring)."""
    mc = getattr(spark, "_smsp_model_cache", None)
    if mc is None:
        mc = {}
        spark._smsp_model_cache = mc
    return mc


def clear_model_cache(spark: SparkSession) -> None:
    """Release the session model cache (trained quantizers, LSH
    indexes, CDC state, broadcast filters) WITHOUT leaking its
    payloads: cached DataFrames are unpersisted, broadcasts destroyed
    (payloads may be bare objects, DataFrames, Broadcasts, or tuples
    of them).  This — not ``spark._smsp_model_cache.clear()`` — is
    the supported way to drop models (a bare ``clear()`` orphans the
    persisted blocks in the BlockManager with no reachable handle).
    The plan memo is dropped WITH the models: memoized plans may
    reference the destroyed broadcasts/persisted frames, and serving
    one after this call would fail at evaluation time."""
    getattr(spark, "_smsp_plan_cache", {}).clear()
    mc = getattr(spark, "_smsp_model_cache", None)
    if not mc:
        return
    for value in mc.values():
        parts = value if isinstance(value, tuple) else (value,)
        for p in parts:
            if isinstance(p, DataFrame):
                p.unpersist(blocking=False)
                _release_checkpoint_blocks(p)
            elif isinstance(p, Releasable):  # non-frame resources
                p.release()
            elif hasattr(p, "destroy") and hasattr(p, "value"):  # Broadcast
                p.destroy()
    mc.clear()


def _release_checkpoint_blocks(df: DataFrame) -> None:
    """Free the executor blocks behind a ``localCheckpoint``'d model
    frame.  ``DataFrame.unpersist()`` above covers only CacheManager
    entries; checkpointed frames never register there — their blocks
    hang off the LogicalRDD's backing RDD and would otherwise linger
    until the ContextCleaner GCs it (ADVICE r11)."""
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        if analyzed.getClass().getSimpleName() == "LogicalRDD":
            analyzed.rdd().unpersist(False)
    except Exception:
        pass  # session stopped / non-checkpoint plan — nothing to free


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
            # REENTRANCY: only the OUTERMOST registered call sweeps —
            # a registered fn that composes another registered query
            # (the certificate pattern) must not have its own tracked
            # persists or conf-restoring cleanups torn down
            # mid-construction by the nested call.
            global _CALL_DEPTH
            if _CALL_DEPTH == 0:
                while _TRACKED_PERSISTS:
                    _TRACKED_PERSISTS.pop().unpersist(blocking=False)
                while _DEFERRED_CLEANUPS:
                    _DEFERRED_CLEANUPS.pop()()
            # Plan memoization (prepared-statement reuse): DataFrames
            # are immutable LAZY plans, so re-serving one is
            # semantically identical to rebuilding it, while skipping
            # the per-call py4j expression construction + analysis
            # (50-700 ms — up to half a floor-class query's wall).
            # Stored on the session object like the reader cache, so
            # entries die with the session.  A query that registered
            # persists or cleanups DURING construction (detected by
            # list growth across fn, which nesting cannot mask since
            # nested calls never drain) is NOT cached: its returned
            # plan depends on query-scoped state (scratch spools, conf
            # overrides, persisted intermediates) that the next
            # outermost registry call tears down.
            cache = getattr(spark, "_smsp_plan_cache", None)
            if cache is None:
                cache = {}
                spark._smsp_plan_cache = cache
            # The cache key carries every piece of session state a
            # plan CONSTRUCTION reads: the session TIMEZONE (manifest
            # timestamp fusions branch on it via _utc_session),
            # shuffle.partitions (widen_scan / _keyed_parts bake it
            # into repartition widths), and defaultParallelism
            # (row-aware widening caps at it).  A session that changes
            # any of these gets a fresh plan, not a stale one.
            # IMMUTABLE-FIXTURE ASSUMPTION (documented limit): plans
            # may also capture driver-collected fixture data (e.g.
            # similarity_topk's broadcast query matrix) and parquet
            # footer metadata; rewriting files under sf_dir mid-
            # session serves a stale plan — the harness fixtures are
            # read-only by contract (TESTDATA.md), so this is safe
            # here; an embedding application mutating its inputs must
            # clear spark._smsp_plan_cache itself.
            key = (
                name,
                sf_dir,
                spark.conf.get("spark.sql.session.timeZone", "UTC"),
                spark.conf.get("spark.sql.shuffle.partitions", "200"),
                spark.sparkContext.defaultParallelism,
            )
            cached = cache.get(key)
            if cached is not None:
                return cached
            before = (len(_TRACKED_PERSISTS), len(_DEFERRED_CLEANUPS))
            _CALL_DEPTH += 1
            try:
                df = fn(spark, sf_dir)
            finally:
                _CALL_DEPTH -= 1
            registered_state = (
                len(_TRACKED_PERSISTS),
                len(_DEFERRED_CLEANUPS),
            ) != before
            if not registered_state:
                cache[key] = df
            return df

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
        lakehouse,
        ingest,
        corpus,
        relational,
        bpe,
        dedup,
        graph,
        retrieval,
        semdedup,
        similarity,
        text,
        multimodal,
        joins_advanced,
        ml,
        analytics,
        timeseries,
        curation,
        quantiles,
    )
    from s3_manifest_spark.functions import scalar  # noqa: F401
    from s3_manifest_spark.streaming import (  # noqa: F401
        boilerplate,
        cdc,
        heavy_hitters,
        index_update,
        knn_index,
        windows,
    )
