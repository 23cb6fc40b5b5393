#!/usr/bin/env python
"""CPU-scaling canary evidence (VERDICT r17 item 3 'Done' criterion):
run bench.py's fixed-work CPU canary (64 tasks x one deterministic
numpy matmul chain, BLAS pinned to 1 thread) at two core counts in
alternating fresh subprocesses, so the 8-vs-32 ratio is same-window.
The canary wall MUST scale ~1/cores while the floor-class query walls
cannot (they are below the parallelism floor) — this is the evidence
that separates 'bench ignores $SPARK_GRAFT_CPUS' from 'queries are
floor-bound' for the driver's suspect_cpus_ignored heuristic.

Also times one floor query per leg as the contrast row.

Writes CANARY_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = sys.argv[1]
from s3_manifest_spark.session import get_spark
spark = get_spark(
    app_name="probe-canary",
    master=f"local[{cpus}]",
    extra_confs={
        "spark.driver.memory": "16g",
        "spark.sql.shuffle.partitions": cpus,
        "spark.ui.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
import __spark_entry__ as entrymod
qs = entrymod.queries()
spark.read.parquet(f"{sf}/nation.parquet").groupBy("n_regionkey").count().toPandas()
spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

CANARY_TASKS = 64
def _canary_burn(batches):
    import numpy as np
    for pdf in batches:
        a = np.full((384, 384), 0.5)
        for _ in range(24):
            a = np.tanh(a @ a / 384.0)
        pdf["id"] = pdf["id"] + int(a[0, 0] * 0)
        yield pdf

canary_df = (
    spark.range(CANARY_TASKS)
    .repartition(CANARY_TASKS)
    .mapInPandas(_canary_burn, schema="id long")
)
canary = []
for _ in range(3):
    t0 = time.perf_counter()
    canary_df.count()
    canary.append(round(time.perf_counter() - t0, 4))

floor = []
qs["set_ops"](spark, sf).toPandas()   # warm
for _ in range(3):
    getattr(spark, "_smsp_plan_cache", {}).clear()
    t0 = time.perf_counter()
    qs["set_ops"](spark, sf).toPandas()
    floor.append(round(time.perf_counter() - t0, 4))

print("CANARY_RESULT " + json.dumps({
    "cpus": int(cpus),
    "defaultParallelism": spark.sparkContext.defaultParallelism,
    "canary_samples": canary, "canary_min": min(canary),
    "floor_set_ops_samples": floor, "floor_set_ops_min": min(floor),
}))
"""


def leg(cpus: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, cpus],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("CANARY_RESULT "):
            return json.loads(line[len("CANARY_RESULT "):])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main() -> int:
    pairs = int(os.environ.get("CANARY_PAIRS", "2"))
    legs = []
    for i in range(pairs):
        for cpus in ("8", "32"):
            r = leg(cpus)
            r["pair"] = i
            legs.append(r)
            print(f"pair {i} cpus {cpus}: canary {r['canary_min']}s "
                  f"floor(set_ops) {r['floor_set_ops_min']}s", flush=True)
    ratios = []
    fratios = []
    for i in range(pairs):
        a = next(r for r in legs if r["pair"] == i and r["cpus"] == 8)
        b = next(r for r in legs if r["pair"] == i and r["cpus"] == 32)
        ratios.append(round(a["canary_min"] / b["canary_min"], 3))
        fratios.append(
            round(a["floor_set_ops_min"] / b["floor_set_ops_min"], 3)
        )
    out = {
        "pairs": pairs,
        "legs": legs,
        "canary_8_over_32_ratio": ratios,
        "floor_8_over_32_ratio": fratios,
        "expected_if_cpus_honored": "canary ratio ~4 (64 fixed tasks, "
        "4x cores), floor ratio ~1 (below the parallelism floor)",
    }
    with open("/root/repo/CANARY_SCALING.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps({"canary_8_over_32": ratios, "floor_8_over_32": fratios}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
