#!/usr/bin/env python
"""Floor-class constant experiment (VERDICT r16 item 5): can session
confs move the ~0.3 s/query fixed cost of the 74 floor-class rows
(oracle < 50 ms — the class where Spark's job floor, not plan shape,
is the wall)?

Variants, toggled PER REP in one session (interleaved at the query
level so every (variant, query) sample pair shares one noise
environment — the SCALE.md A/B protocol):

- ``base``  — the bench confs (shuffle.partitions=32, AQE coalesce
              with parallelismFirst=true, i.e. coalesce stops at the
              cluster's parallelism).
- ``pf``    — ``spark.sql.adaptive.coalescePartitions.parallelismFirst
              =false``: AQE coalesces post-shuffle partitions by SIZE
              (advisory 64 MB / min 1 MB) instead of stopping at 32 —
              at fixture scale most shuffles collapse to 1-2 tasks;
              at 100 TB partition counts are size-driven anyway, so
              the setting is scale-neutral (it only stops the
              optimizer from keeping tiny partitions alive for
              parallelism's sake).
- ``pf8``   — pf + ``spark.sql.shuffle.partitions=8``: fewer initial
              map-side buckets as well (the pre-AQE task count).

Writes FLOOR_CONF_AB.json: min-of-N per (query, variant) plus the
per-variant sums over the probe population.  A negative result is a
committed result: if neither variant moves the sum, the constant is
scheduling, not conf-addressable (the verdict's stated alternative).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("FLOOR_CONF_RUNS", "5"))

#: batch floor-class rows spanning the class's plan shapes: pure agg,
#: window, join, sketch, Arrow-kernel, multi-table star, sampling.
QUERIES = [
    "approx_distinct",
    "map_funcs",
    "set_ops",
    "cohort_retention",
    "user_sessions",
    "time_weighted_avg",
    "hourly_anomalies",
    "attribution_touch",
    "pii_redact",
    "percentile_dist_exact",
    "star_join_revenue",
    "shuffle_epoch",
]
if os.environ.get("FLOOR_CONF_QUERIES"):
    QUERIES = os.environ["FLOOR_CONF_QUERIES"].split(",")

PF_KEY = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
SP_KEY = "spark.sql.shuffle.partitions"


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="probe-floor-conf",
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

    def set_variant(v: str) -> None:
        if v == "base":
            spark.conf.set(PF_KEY, "true")
            spark.conf.set(SP_KEY, str(cpus))
        elif v == "pf":
            spark.conf.set(PF_KEY, "false")
            spark.conf.set(SP_KEY, str(cpus))
        elif v == "pf8":
            spark.conf.set(PF_KEY, "false")
            spark.conf.set(SP_KEY, "8")

    variants = ["base", "pf", "pf8"]
    if os.environ.get("FLOOR_CONF_VARIANTS"):
        variants = os.environ["FLOOR_CONF_VARIANTS"].split(",")
    # one untimed warm pass (model caches, codegen)
    for name in QUERIES:
        qs[name](spark, sf).toPandas()

    samples: dict[str, dict[str, list[float]]] = {
        v: {n: [] for n in QUERIES} for v in variants
    }
    for _ in range(RUNS):
        for name in QUERIES:
            for v in variants:
                set_variant(v)
                getattr(spark, "_smsp_plan_cache", {}).clear()
                t0 = time.perf_counter()
                qs[name](spark, sf).toPandas()
                samples[v][name].append(round(time.perf_counter() - t0, 4))
    set_variant("base")

    mins = {
        v: {n: min(s) for n, s in samples[v].items()} for v in variants
    }
    sums = {v: round(sum(mins[v].values()), 3) for v in variants}
    out = {
        "cpus": int(cpus),
        "sf_dir": sf,
        "runs": RUNS,
        "queries": QUERIES,
        "min": mins,
        "sum_min_sec": sums,
        "samples": samples,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR_CONF_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(sums, indent=1))
    for n in QUERIES:
        print(
            f"{n:36s} "
            + " ".join(f"{v}={mins[v][n]:6.3f}" for v in variants)
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
