#!/usr/bin/env python
"""Shared-population mid-class comparison (VERDICT r15 item 2's
fallback protocol): the driver's mid_oracle_50_300ms ratio compares
DIFFERENT query populations across rounds — queries with ~50 ms
oracles migrate across the class boundary run-to-run, swinging the
class ratio ±0.4 with zero plan change (the r15 memory note).  This
probe fixes the population: queries classed mid by BOTH rounds'
oracle samples, ratio computed on that shared set for both rounds.

Usage: python tools/probe_midclass_shared.py <old-git-ref> <label>
(e.g. `python tools/probe_midclass_shared.py HEAD~3 r15`); reads the
working tree's BENCH_FULL.json as the new side and writes
MIDCLASS_SHARED_<label>.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LO, HI = 0.05, 0.3


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    label = sys.argv[2] if len(sys.argv) > 2 else "shared"
    with open(os.path.join(HERE, "BENCH_FULL.json")) as f:
        new = json.load(f)
    old = json.loads(
        subprocess.run(
            ["git", "-C", HERE, "show", f"{ref}:BENCH_FULL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )
    qn, on_ = new["queries"], new["oracle_sec"]
    qo, oo = old["queries"], old["oracle_sec"]
    shared = sorted(
        q
        for q in qn
        if q in qo and q in oo and q in on_
        and LO <= oo[q] < HI and LO <= on_[q] < HI
    )
    out = {
        "old_ref": ref,
        "class": f"mid_oracle_{int(LO*1000)}_{int(HI*1000)}ms",
        "protocol": (
            "population fixed to queries classed mid by BOTH rounds' "
            "oracle samples; ratio = sum(spark)/sum(oracle) on that set"
        ),
        "n_shared": len(shared),
        "shared": shared,
        "old": {
            "spark_sec": round(sum(qo[q] for q in shared), 2),
            "oracle_sec": round(sum(oo[q] for q in shared), 2),
        },
        "new": {
            "spark_sec": round(sum(qn[q] for q in shared), 2),
            "oracle_sec": round(sum(on_[q] for q in shared), 2),
        },
        "migrated_out": sorted(
            q for q in qn
            if q in qo and q in oo and q in on_
            and LO <= oo[q] < HI and not LO <= on_[q] < HI
        ),
        "migrated_in": sorted(
            q for q in qn
            if q in qo and q in oo and q in on_
            and LO <= on_[q] < HI and not LO <= oo[q] < HI
        ),
    }
    for side in ("old", "new"):
        d = out[side]
        d["ratio"] = round(d["spark_sec"] / max(d["oracle_sec"], 1e-9), 2)
    path = os.path.join(HERE, f"MIDCLASS_SHARED_{label}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
