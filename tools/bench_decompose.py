#!/usr/bin/env python
"""Compute-vs-collect decomposition for the manifest family
(BASELINE.md's 2x discussion): for each query, separate the cost of
COMPUTING the result from the cost of MATERIALIZING it into the
client process, on both engines.

    spark_compute  - noop-sink write wall: the plan executes with every
                     column materialized, nothing ships to Python.
                     (count() would let Catalyst prune all columns and
                     understate compute.)
    spark_collect  - df.toPandas() wall (what bench.py measures)
    duck_compute   - CREATE TEMP TABLE AS (sql): full materialization,
                     no client transfer (fetchone would stream-stop)
    duck_collect   - con.execute(sql).fetch_df() wall (oracle measure)

Min-of-N each.  Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["manifest_project", "manifest_prefix_filter", "manifest_stats", "manifest_diff"]
RUNS = 3


def best(fn, pre=None):
    b = None
    for _ in range(RUNS):
        if pre is not None:
            pre()  # e.g. clear the registry plan memo — full path per rep
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        b = el if b is None else min(b, el)
    return round(b, 4)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="bench-decompose",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.driver.memory": "24g",
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/nation.parquet").groupBy("n_regionkey").count().toPandas()

    import duckdb

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={int(cpus)}")
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    out = {}
    clear = lambda: getattr(spark, "_smsp_plan_cache", {}).clear()  # noqa: E731
    for name in QUERIES:
        out[name] = {
            "spark_compute": best(
                lambda: qs[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save(),
                pre=clear,
            ),
            "spark_collect": best(
                lambda: qs[name](spark, sf_dir).toPandas(), pre=clear
            ),
            "duck_compute": best(
                lambda: con.execute(
                    f"CREATE OR REPLACE TEMP TABLE _decomp AS ({oracles[name]})"
                )
            ),
            "duck_collect": best(lambda: con.execute(oracles[name]).fetch_df()),
        }
        r = out[name]
        r["compute_ratio"] = round(r["spark_compute"] / max(r["duck_compute"], 1e-9), 2)
        r["collect_ratio"] = round(r["spark_collect"] / max(r["duck_collect"], 1e-9), 2)

    print(json.dumps({"sf_dir": sf_dir, "runs": RUNS, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
