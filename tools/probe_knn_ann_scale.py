#!/usr/bin/env python
"""Scaling probe for the production kNN-graph path (VERDICT r13
item 1): knn_graph (exact O(N^2 d) baseline BY CONTRACT) vs
knn_graph_ann_neighbors (LSH candidate block pairs feeding the same
per-pair BLAS scorer) at 1x and 10x the sf0.1 embeddings corpus.

Method: same synthesized 10x dir as tools/probe_r13b_scale.py
(embedding copies shift vec_id only), REGISTERED/LIBRARY entry points
run end-to-end including the scan, min-of-3 with the plan memo
cleared per rep (the stage-skipping trap).  The corpus-adaptive plane
count (_knn_ann_planes: planes ~ log2(N/occ)) is what makes the
candidate sweep ~O(N*occ*planes*d): at 10x data the bucket COUNT
grows 10x while occupancy stays ~flat, so wall growth should sit far
below the exact sweep's ~quadratic (r13 measured 9.9x at 10x).

Usage: python tools/probe_knn_ann_scale.py [copies]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_manifest_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
RUNS = 3

spark = get_spark(
    app_name="knn-ann-scale-probe",
    master=f"local[{CPUS}]",
    extra_confs={
        "spark.driver.memory": "24g",
        "spark.sql.shuffle.partitions": CPUS,
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from s3_manifest_spark.operators.similarity import (  # noqa: E402
    _knn_ann_planes,
    knn_graph,
    knn_graph_ann_neighbors,
)
from s3_manifest_spark.registry import clear_model_cache  # noqa: E402
from s3_manifest_spark.sources.tables import parquet_row_count  # noqa: E402

# JVM + Python-worker warmup
spark.read.parquet(f"{SF}/embeddings.parquet").count()
spark.range(32).repartition(32).mapInPandas(
    lambda it: it, schema="id long"
).count()

base = tempfile.mkdtemp(prefix="knn-ann-scale-")
big = os.path.join(base, "big")
os.makedirs(big, exist_ok=True)

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
out = None
for i in range(COPIES):
    c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10**9))
    out = c if out is None else out.unionAll(c)
out.coalesce(8).write.mode("overwrite").parquet(f"{big}/embeddings.parquet")


def timed(fn, sf_dir):
    best, rows = None, 0
    for _ in range(RUNS):
        getattr(spark, "_smsp_plan_cache", {}).clear()
        t0 = time.perf_counter()
        rows = len(fn(spark, sf_dir).toPandas())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


result = {"sf_dir": SF, "copies": COPIES, "cpus": int(CPUS), "runs": RUNS}
try:
    # KNN_SCALE_SKIP_EXACT=1 skips the exact sweep at the scaled leg:
    # at 100x (N=200k) the exact baseline is ~2.6 Tflop BY CONTRACT —
    # its cost is the point, not news worth minutes of probe wall.
    skip_exact_big = os.environ.get("KNN_SCALE_SKIP_EXACT") == "1"
    for label, sf_dir in (("1x", SF), (f"{COPIES}x", big)):
        n = parquet_row_count(f"{sf_dir}/embeddings.parquet")
        p = _knn_ann_planes(n)
        t_ann, r_ann = timed(knn_graph_ann_neighbors, sf_dir)
        result[label] = {
            "n_vectors": n,
            "ann_planes": p,
            "ann_buckets": 2**p,
            "ann_sec": round(t_ann, 3),
            "ann_rows": r_ann,
        }
        if not (skip_exact_big and sf_dir == big):
            t_exact, r_exact = timed(knn_graph, sf_dir)
            result[label]["exact_sec"] = round(t_exact, 3)
            result[label]["exact_rows"] = r_exact
        print(f"{label}: N={n} planes={p} " + ", ".join(
            f"{k}={v}" for k, v in result[label].items()
        ))
    g_ann = result[f"{COPIES}x"]["ann_sec"] / result["1x"]["ann_sec"]
    result["ann_growth"] = round(g_ann, 2)
    if "exact_sec" in result[f"{COPIES}x"]:
        g_exact = (
            result[f"{COPIES}x"]["exact_sec"] / result["1x"]["exact_sec"]
        )
        result["exact_growth"] = round(g_exact, 2)
        print(
            f"growth at {COPIES}x data: ann={g_ann:.1f}x exact={g_exact:.1f}x"
        )
    else:
        print(f"growth at {COPIES}x data: ann={g_ann:.1f}x (exact skipped)")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = "" if COPIES == 10 else f"_{COPIES}x"
    with open(
        os.path.join(here, f"KNN_ANN_SCALE{suffix}.json"), "w"
    ) as f:
        json.dump(result, f, indent=1, sort_keys=True)
finally:
    clear_model_cache(spark)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
