#!/usr/bin/env python
"""Floor-class cost decomposition: for each floor query (DuckDB oracle
< 50 ms), split the Spark wall into

    build   - DataFrame construction (py4j expression building + analysis)
    exec    - full execution, plan memo cleared (what bench.py times,
              minus build)
    warm    - re-execution of the SAME DataFrame object (plan + shuffle
              map outputs reused -> approximates the irreducible final
              stage + collect)
    oracle  - DuckDB end-to-end

The gap between exec and warm is Spark's per-query scheduling + stage
machinery; the gap between warm and oracle is the JVM job floor vs an
in-process engine.  Usage: python tools/floor_profile.py [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 15

    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="floor-profile",
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

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={int(cpus)}")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    # warm the session
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().toPandas()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def best(fn, n=3):
        b = 9e9
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    # identify floor queries by oracle time
    floor = []
    for name in sorted(oracles):
        o = best(lambda n=name: con.execute(oracles[n]).fetch_df())
        if o < 0.05:
            floor.append((name, o))
    floor.sort(key=lambda x: x[1])

    out = {}
    clear = lambda: getattr(spark, "_smsp_plan_cache", {}).clear()  # noqa: E731
    for name, o in floor[:top_n]:
        clear()
        b_build = best(lambda n=name: (clear(), qs[n](spark, sf_dir))[1])
        clear()
        b_exec = best(
            lambda n=name: (clear(), qs[n](spark, sf_dir).toPandas())[1]
        )
        df = qs[name](spark, sf_dir)
        df.toPandas()
        b_warm = best(lambda d=df: d.toPandas())
        out[name] = {
            "build": round(b_build, 4),
            "exec_full": round(b_exec, 4),
            "warm_final_stage": round(b_warm, 4),
            "oracle": round(o, 4),
        }
    agg = {
        k: round(sum(v[k] for v in out.values()), 3)
        for k in ("build", "exec_full", "warm_final_stage", "oracle")
    }
    print(json.dumps({"sf_dir": sf_dir, "n": len(out), "totals": agg, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
