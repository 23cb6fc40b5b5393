"""Per-drain machinery decomposition for the six stream_*_live drains
(SCALE.md): itemize where each drain's wall clock goes using the
micro-batch progress rows the drains now record
(streaming/metrics.py) — so the drain-vs-batch bench ratio is
explained by measured components, not asserted.

    addBatch     - executing the micro-batch's data work (the part a
                   batch query also pays)
    commit log   - walCommit + commitOffsets: fsyncing the offset/
                   commit WAL per micro-batch
    state commit - stateOperators[].commitTimeMs summed (store
                   checkpoint + maintenance)
    trigger misc - triggerExecution minus the above (planning, source
                   listing, sink bookkeeping)
    start/stop   - wall minus sum(triggerExecution): query lifecycle —
                   stream resolution, thread start, final offset seal,
                   stop + checkpoint teardown

Usage: python tools/probe_drain_decompose.py   (sf via
$SPARK_GRAFT_SF_DIR, default sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

from s3_manifest_spark.session import get_spark

spark = get_spark(
    app_name="drain-decompose",
    master=f"local[{CPUS}]",
    extra_confs={
        "spark.driver.memory": "24g",
        "spark.sql.shuffle.partitions": CPUS,
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from s3_manifest_spark import registry  # noqa: E402
from s3_manifest_spark.streaming.metrics import LAST_PROGRESS  # noqa: E402

registry.load_all()

DRAINS = [
    "stream_tumbling_live",
    "stream_sliding_live",
    "stream_user_state_live",
    "stream_dedup_live",
    "stream_join_live",
    "stream_cdc_apply_live",
    "stream_index_update_live",
]


def main() -> int:
    # JVM warmup so start/stop numbers are steady-state machinery,
    # not first-job class loading
    registry.QUERIES["stream_tumbling"](spark, SF).count()

    rows = []
    for name in DRAINS:
        # min-of-2 (bench.py discipline) — keep the faster rep's
        # progress rows so the decomposition matches the wall reported
        wall, prog = None, []
        for _ in range(2):
            # bench.py's rep discipline: drop the plan memo so each
            # rep pays the full drain (a memo hit returns the already-
            # drained sink table and would measure nothing)
            getattr(spark, "_smsp_plan_cache", {}).clear()
            LAST_PROGRESS.clear()
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, SF).count()
            w = time.perf_counter() - t0
            if wall is None or w < wall:
                wall = w
                prog = next(iter(LAST_PROGRESS.values()), [])
        dur = {}
        state_commit = 0.0
        for p in prog:
            for k, v in (p.get("durationMs") or {}).items():
                dur[k] = dur.get(k, 0) + v
            for op in p.get("stateOperators") or []:
                state_commit += op.get("commitTimeMs", 0)
        trig = dur.get("triggerExecution", 0) / 1e3
        add = dur.get("addBatch", 0) / 1e3
        wal = (dur.get("walCommit", 0) + dur.get("commitOffsets", 0)) / 1e3
        state_commit /= 1e3
        misc = max(0.0, trig - add - wal)
        startstop = max(0.0, wall - trig)
        rows.append(
            (name, wall, len(prog), add, wal, state_commit, misc, startstop)
        )
        print(
            f"{name}: wall {wall:.2f}s batches={len(prog)} "
            f"addBatch {add:.2f}s wal {wal:.2f}s state-commit "
            f"{state_commit:.2f}s trig-misc {misc:.2f}s "
            f"start/stop {startstop:.2f}s",
            flush=True,
        )

    print("\n| drain | wall | batches | addBatch | commit log | "
          "state commit* | trigger misc | start/stop |")
    print("|---|---|---|---|---|---|---|---|")
    tot = [0.0] * 5
    for name, wall, nb, add, wal, sc, misc, ss in rows:
        print(
            f"| {name} | {wall:.2f} s | {nb} | {add:.2f} s | {wal:.2f} s "
            f"| {sc:.2f} s | {misc:.2f} s | {ss:.2f} s |"
        )
        for i, v in enumerate((wall, add, wal, misc, ss)):
            tot[i] += v
    print(
        f"| **Σ** | **{tot[0]:.2f} s** | | **{tot[1]:.2f} s** | "
        f"**{tot[2]:.2f} s** | | **{tot[3]:.2f} s** | **{tot[4]:.2f} s** |"
    )
    print("\n*state commit overlaps addBatch (tasks commit stores "
          "inside the batch), so it is a component of addBatch, not "
          "additive.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
