#!/usr/bin/env python
"""Paired TREE-vs-TREE A/B (VERDICT r17 item 2): run the same queries
from two source trees (e.g. a git worktree at the r16 artifact commit
vs the current tree) in ALTERNATING subprocess legs, so every (A, B)
leg pair shares one host-noise window — the discipline the in-process
interleaved A/B gives a single tree, applied across trees.

    git worktree add /tmp/r16tree 34f1d5f
    python tools/probe_tree_ab.py \
        --tree-a /tmp/r16tree --tree-b /root/repo \
        --queries knn_graph_ann,dedup_simhash --pairs 3 --runs 4 \
        --out R16_AB.json

Each leg is a fresh subprocess (its own JVM) that imports the tree's
own `__spark_entry__`, warms exactly like bench.py, and reports the
per-query min-of-``runs`` warm wall.  The artifact records every leg's
minima in arrival order plus the paired per-window B/A ratios; the
verdict statistic is the MEDIAN paired ratio (window-robust), not a
cross-window delta.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_RUNNER = r"""
import json, os, sys, time
tree = sys.argv[1]
names = sys.argv[2].split(",")
runs = int(sys.argv[3])
sys.path.insert(0, tree)
os.chdir(tree)
from s3_manifest_spark.session import get_spark
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="probe-tree-ab",
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
# bench.py's warmup: footer/codegen/shuffle/Arrow + the Python worker pool
spark.read.parquet(f"{sf}/nation.parquet").groupBy("n_regionkey").count().toPandas()
spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()
samples = {n: [] for n in names}
for _ in range(runs):
    for n in names:
        getattr(spark, "_smsp_plan_cache", {}).clear()
        t0 = time.perf_counter()
        qs[n](spark, sf).toPandas()
        samples[n].append(round(time.perf_counter() - t0, 4))
print("AB_RESULT " + json.dumps({"min": {n: min(s) for n, s in samples.items()},
                                 "samples": samples}))
"""


def run_leg(tree: str, queries: list[str], runs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, tree, ",".join(queries), str(runs)],
        capture_output=True,
        text=True,
        cwd=tree,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"leg in {tree} produced no result; tail:\n{out.stdout[-2000:]}"
        f"\nstderr tail:\n{out.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True, help="baseline tree (e.g. r16 worktree)")
    ap.add_argument("--tree-b", required=True, help="candidate tree (current repo)")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--pairs", type=int, default=3, help="number of (A,B) leg pairs")
    ap.add_argument("--runs", type=int, default=4, help="reps per query per leg")
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    args = ap.parse_args()
    queries = args.queries.split(",")

    legs: list[dict] = []
    for i in range(args.pairs):
        for tag, tree in (("a", args.tree_a), ("b", args.tree_b)):
            res = run_leg(tree, queries, args.runs)
            legs.append({"pair": i, "tree": tag, **res})
            print(f"pair {i} tree {tag}: {res['min']}", flush=True)

    ratios: dict[str, list] = {q: [] for q in queries}
    for i in range(args.pairs):
        a = next(l for l in legs if l["pair"] == i and l["tree"] == "a")
        b = next(l for l in legs if l["pair"] == i and l["tree"] == "b")
        for q in queries:
            # >1 means the candidate tree (b) is FASTER in this window
            ratios[q].append(round(a["min"][q] / b["min"][q], 4))
    med = {
        q: sorted(r)[len(r) // 2] if len(r) % 2 else round(
            (sorted(r)[len(r) // 2 - 1] + sorted(r)[len(r) // 2]) / 2, 4
        )
        for q, r in ratios.items()
    }
    out = {
        "tree_a": args.tree_a,
        "tree_b": args.tree_b,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "pairs": args.pairs,
        "runs_per_leg": args.runs,
        "legs": legs,
        "paired_speedup_b_over_a": ratios,
        "median_paired_speedup": med,
    }
    print(json.dumps({"median_paired_speedup": med}, indent=1))
    if args.out:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, args.out), "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
