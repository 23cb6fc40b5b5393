#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Results are fully materialized (Arrow toPandas) so timings include the
whole pipeline, matching how the DuckDB oracle is measured.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="s3-manifest-spark-bench",
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

    # Warm the paths every query pays for once per JVM: parquet footer
    # reads, whole-stage codegen compile, a shuffle, and the Arrow
    # collect used by toPandas — so q1's timing is q1, not startup.
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .groupBy("n_regionkey")
        .count()
        .toPandas()
    )
    # Spawn the Python worker pool too (pandas-UDF queries otherwise pay
    # worker startup + numpy import once, billed to whichever runs first).
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # Two passes, report the per-query minimum: the host VM has bursty
    # noisy-neighbor contention (observed 5-10x inflation on identical
    # queries minutes apart), and min-of-2 both drops those spikes and
    # measures the warm path a resident engine would actually serve.
    RUNS = 2
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for _ in range(RUNS):
        for name in sorted(qs):
            t0 = time.perf_counter()
            pdf = qs[name](spark, sf_dir).toPandas()
            elapsed = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            rows[name] = len(pdf)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "rows": rows,
                "cpus": int(cpus),
                "runs_per_query": RUNS,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
