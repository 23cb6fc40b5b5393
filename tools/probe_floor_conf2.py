#!/usr/bin/env python
"""Floor-class conf experiment, round 18 (VERDICT r17 item 5).

FLOOR_DECOMPOSE.json split the warm floor wall into construct
(26-102 ms, py4j plan building — conf-immune) and execute
(0.37-0.82 s: Catalyst analysis/optimization + AQE job cascade +
Arrow collect).  This probe A/Bs the execute-side levers that are
semantics-preserving AND scale-honest (no local[32]-only twiddles):

- ``base``      — the bench confs as shipped (r17 session defaults).
- ``nocp``      — ``spark.sql.constraintPropagation.enabled=false``:
                  skip the optimizer's constraint-derivation fixpoint,
                  a known planning-time cost on multi-join/filter
                  plans.  Value-semantics preserving by construction
                  (constraints only ADD redundant inferred filters);
                  flagged risk: at real scale inferred IsNotNull/
                  transitive predicates can prune scans, so this can
                  only ship query-scoped, not as a session default.
- ``arrow100k`` — ``spark.sql.execution.arrow.maxRecordsPerBatch=
                  100000``: fewer Arrow batches across the Python
                  boundary for the kernel queries (default 10k splits
                  a 15k-row fixture pass into 2 batches).
- ``both``      — the two combined.

Interleaved at the query level (every variant sample of a query sits
in the same noise window as its base sample).  Writes
FLOOR_CONF2_AB.json.  A negative result is a committed result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("FLOOR_CONF_RUNS", "5"))

QUERIES = [
    "approx_distinct",
    "map_funcs",
    "set_ops",
    "cohort_retention",
    "user_sessions",
    "time_weighted_avg",
    "attribution_touch",
    "pii_redact",
    "star_join_revenue",
    "null_semantics",
    "math_funcs",
    "window_rank",
    "text_entropy",
    "lang_id",
    "gopher_quality_rules",
    "token_count",
]
if os.environ.get("FLOOR_CONF_QUERIES"):
    QUERIES = os.environ["FLOOR_CONF_QUERIES"].split(",")

CP_KEY = "spark.sql.constraintPropagation.enabled"
AR_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="probe-floor-conf2",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.driver.memory": "24g",
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    spark.read.parquet(f"{sf}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().toPandas()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def set_variant(v: str) -> None:
        spark.conf.set(CP_KEY, "false" if v in ("nocp", "both") else "true")
        spark.conf.set(
            AR_KEY, "100000" if v in ("arrow100k", "both") else "10000"
        )

    variants = ["base", "nocp", "arrow100k", "both"]
    if os.environ.get("FLOOR_CONF_VARIANTS"):
        variants = os.environ["FLOOR_CONF_VARIANTS"].split(",")

    for name in QUERIES:
        qs[name](spark, sf).toPandas()

    samples: dict[str, dict[str, list[float]]] = {
        v: {n: [] for n in QUERIES} for v in variants
    }
    for _ in range(RUNS):
        for name in QUERIES:
            for v in variants:
                set_variant(v)
                getattr(spark, "_smsp_plan_cache", {}).clear()
                t0 = time.perf_counter()
                qs[name](spark, sf).toPandas()
                samples[v][name].append(round(time.perf_counter() - t0, 4))
    set_variant("base")

    mins = {v: {n: min(s) for n, s in samples[v].items()} for v in variants}
    sums = {v: round(sum(mins[v].values()), 3) for v in variants}
    out = {
        "cpus": int(cpus),
        "sf_dir": sf,
        "runs": RUNS,
        "queries": QUERIES,
        "min": mins,
        "sum_min_sec": sums,
        "samples": samples,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_CONF2_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(sums, indent=1))
    for n in QUERIES:
        print(
            f"{n:28s} "
            + " ".join(f"{v}={mins[v][n]:6.3f}" for v in variants)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
