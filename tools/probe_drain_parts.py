#!/usr/bin/env python
"""Drain state-partition sizing A/B (VERDICT r17 item 4): the r17
STREAM_SHUFFLE_PARTITIONS=4 tune was measured on COMMIT-FIXED-COST
drains (tiny state: tumbling/sliding windows), but the decomposition
(probe_drain_decompose) shows the heavy drains are SIZE-dominated:
stream_join_live buffers both event sides (state commit 2.5 s summed
over 4 stores), stream_dedup_live holds every distinct event_id, and
stream_cdc_apply_live commits ~450k keys over 10 stores.  For those,
more stores = parallel state serialization, the exact trade
cdc.state_store_partitions already encodes — this probe measures
whether the dedup/join drains want the same size-aware policy and
whether CDC's 64k keys/store target is right.

Interleaved per rep (one session, adjacent samples share the noise
window):

  dedup/join: partitions 4 (current) vs 16 vs 32
  cdc:        keys/store 64k (current, ->10 stores) vs 16k (->37->
              capped) vs 8k

Writes DRAIN_PARTS_AB.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("DRAIN_PARTS_RUNS", "5"))


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="probe-drain-parts",
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

    qs = entrymod.queries()
    from s3_manifest_spark.streaming import cdc, windows

    spark.read.parquet(f"{sf}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().toPandas()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # one untimed warm pass (spools, python pool)
    for name in ("stream_dedup_live", "stream_join_live", "stream_cdc_apply_live"):
        getattr(spark, "_smsp_plan_cache", {}).clear()
        qs[name](spark, sf).toPandas()

    orig_parts = windows.STREAM_SHUFFLE_PARTITIONS
    orig_ssp = cdc.state_store_partitions

    def make_ssp(target_keys: int):
        def ssp(spark_, n_keys_hint: int) -> str:
            cores = spark_.sparkContext.defaultParallelism
            return str(
                max(8, min(4 * cores, -(-n_keys_hint // target_keys)))
            )
        return ssp

    wj_variants = ["4", "16", "32"]
    cdc_variants = [65_536, 16_384, 8_192]

    samples: dict[str, dict[str, list[float]]] = {
        "stream_dedup_live": {v: [] for v in wj_variants},
        "stream_join_live": {v: [] for v in wj_variants},
        "stream_cdc_apply_live": {str(v): [] for v in cdc_variants},
    }
    try:
        for _ in range(RUNS):
            for v in wj_variants:
                windows.STREAM_SHUFFLE_PARTITIONS = v
                for name in ("stream_dedup_live", "stream_join_live"):
                    getattr(spark, "_smsp_plan_cache", {}).clear()
                    t0 = time.perf_counter()
                    qs[name](spark, sf).toPandas()
                    samples[name][v].append(
                        round(time.perf_counter() - t0, 4)
                    )
            windows.STREAM_SHUFFLE_PARTITIONS = orig_parts
            for kv in cdc_variants:
                cdc.state_store_partitions = make_ssp(kv)
                getattr(spark, "_smsp_plan_cache", {}).clear()
                t0 = time.perf_counter()
                qs["stream_cdc_apply_live"](spark, sf).toPandas()
                samples["stream_cdc_apply_live"][str(kv)].append(
                    round(time.perf_counter() - t0, 4)
                )
            cdc.state_store_partitions = orig_ssp
    finally:
        windows.STREAM_SHUFFLE_PARTITIONS = orig_parts
        cdc.state_store_partitions = orig_ssp

    mins = {
        q: {v: min(s) for v, s in vs.items() if s}
        for q, vs in samples.items()
    }
    out = {
        "cpus": int(cpus),
        "sf_dir": sf,
        "runs": RUNS,
        "min": mins,
        "samples": samples,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DRAIN_PARTS_AB.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(mins, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
