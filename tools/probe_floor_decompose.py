#!/usr/bin/env python
"""Floor-class residual decomposition (VERDICT r17 item 5): split each
floor query's warm wall into

    construct - Python-side DataFrame/plan construction (the py4j
                expression-building chatter bench.py re-pays every rep
                because it clears the plan memo for measurement
                integrity)
    execute   - .toPandas() on the constructed frame: Catalyst
                analysis/optimization, AQE job cascade, Arrow collect

plus session micro-floors that bound what any query can cost:

    range1_topandas   - spark.range(1).toPandas(): one job, no shuffle
    scan_topandas     - 5-row parquet scan -> toPandas
    agg1x_topandas    - one-exchange groupBy -> toPandas

The split tells us which lever is real: conf/JVM work (execute) vs
driver-side construction (construct — conf-immune, only fewer py4j
calls or plan reuse can move it).

Usage: python tools/probe_floor_decompose.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("FLOOR_DECOMP_RUNS", "5"))

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
]
if os.environ.get("FLOOR_DECOMP_QUERIES"):
    QUERIES = os.environ["FLOOR_DECOMP_QUERIES"].split(",")


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="probe-floor-decompose",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.driver.memory": "24g",
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
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

    # untimed warm pass (models, codegen)
    for name in QUERIES:
        qs[name](spark, sf).toPandas()

    construct: dict[str, list[float]] = {n: [] for n in QUERIES}
    execute: dict[str, list[float]] = {n: [] for n in QUERIES}
    micro: dict[str, list[float]] = {
        "range1_topandas": [],
        "scan_topandas": [],
        "agg1x_topandas": [],
    }
    for _ in range(RUNS):
        for name in QUERIES:
            getattr(spark, "_smsp_plan_cache", {}).clear()
            t0 = time.perf_counter()
            df = qs[name](spark, sf)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            construct[name].append(round(t1 - t0, 4))
            execute[name].append(round(t2 - t1, 4))
        t0 = time.perf_counter()
        spark.range(1).toPandas()
        micro["range1_topandas"].append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf}/region.parquet").toPandas()
        micro["scan_topandas"].append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{sf}/nation.parquet")
            .groupBy("n_regionkey")
            .count()
            .toPandas()
        )
        micro["agg1x_topandas"].append(round(time.perf_counter() - t0, 4))

    out = {
        "cpus": int(cpus),
        "sf_dir": sf,
        "runs": RUNS,
        "construct_min": {n: min(s) for n, s in construct.items()},
        "execute_min": {n: min(s) for n, s in execute.items()},
        "micro_min": {n: min(s) for n, s in micro.items()},
        "construct_samples": construct,
        "execute_samples": execute,
        "micro_samples": micro,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_DECOMPOSE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"micro": out["micro_min"]}, indent=1))
    for n in QUERIES:
        c, e = out["construct_min"][n], out["execute_min"][n]
        print(f"{n:28s} construct={c:6.3f} execute={e:6.3f} total={c + e:6.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
