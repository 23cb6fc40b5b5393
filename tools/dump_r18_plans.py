#!/usr/bin/env python
"""Dump `.explain("formatted")` for the queries touched in r18 into
plans/r18/<query>_<tag>.txt.

    python tools/dump_r18_plans.py after            # current tree
    python tools/dump_r18_plans.py before           # run from a worktree at the r17 tree
    python tools/dump_r18_plans.py after q1,q2      # subset

Runs each query's plan twice: cold (first call builds session caches)
then captures the WARM plan — the shape the bench actually times — so
before/after diffs compare serving plans, not one-off builds.  The
output directory is always the MAIN repo's plans/r18 (worktree runs
write their `before` files next to the `after` files).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = os.path.join("/root/repo", "plans", "r18")
QUERIES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "doc_containment",
    "shingle_df_profile",
    "lsh_tuning_curve",
    "knn_graph_ann",
    "stream_knn_index_live",
    "stream_index_update_live",
]

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="r18-plan-dump",
        master="local[8]",
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in QUERIES:
        fn = qs[name]
        fn(spark, SF).count()  # warm session caches / models
        df = fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {TAG} (warm serving plan, {SF})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
