#!/usr/bin/env python
"""Host-window loudness probe: time a fixed subset of the heaviest
DuckDB oracle queries (min-of-3) and compare to the same queries'
oracle minima in the CURRENT BENCH_FULL.json.  The oracle's work never
changes, so the ratio is a pure window-loudness gauge — use it to pick
a quiet window for a full re-bench (VERDICT r17 item 1: quiet means
the full-oracle total lands near 41-45 s; the r18-final window was
49.1 s, i.e. probe ratios ≲ 0.87 of that window indicate r16-grade
quiet).

Usage: python tools/probe_window_loudness.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "dedup_ngram_jaccard",
    "doc_containment",
    "knn_graph",
    "bm25_topk",
    "dedup_minhash_lsh",
    "graph_pagerank",
    "stream_join",
    "lm_perplexity",
]


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import duckdb

    import __spark_entry__ as entrymod

    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    for t in (
        "region nation customer supplier part orders "
        "lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    names = [n for n in SUBSET if n in oracles]
    mins = {}
    for n in names:
        con.execute(oracles[n]).fetch_df()  # warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracles[n]).fetch_df()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        mins[n] = round(best, 4)
    subset_sum = round(sum(mins.values()), 3)
    ref = {}
    try:
        full = json.load(
            open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_FULL.json"))
        )
        ref = {n: full["oracle_sec"].get(n) for n in names}
    except Exception:
        pass
    ref_sum = round(sum(v for v in ref.values() if v), 3) if ref else None
    out = {"subset_sum_sec": subset_sum, "mins": mins,
           "bench_full_ref_sum_sec": ref_sum,
           "ratio_vs_bench_full": (round(subset_sum / ref_sum, 3)
                                   if ref_sum else None)}
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
