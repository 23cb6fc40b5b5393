"""10x scaling probe for the round-13 extension batches:
gopher_quality_rules, ngram_corpus_topk, chunk_dedup_boilerplate,
embedding_centroid_stats, knn_graph, graph_triangles,
bigram_lift_topk, doc_containment, embedding_covariance.
(attribution_touch reads events — its shape is user_sessions' single
user-keyed window, already probed linear in the r10 leg.)

Method: write a 10x synthesized sf-dir (documents + embeddings only —
these six read nothing else) and run the REGISTERED queries against
it, so the measurement covers the real end-to-end plan including the
scan.  Per the r12 probe's density argument, each document copy's
tokens are prefixed with a copy tag (one regexp at BUILD time,
excluded from timing) so shingle/chunk/ngram spaces are disjoint
across copies: duplicate DENSITY stays constant and pair/triangle
volume must scale ~linearly, not quadratically.  Embedding copies
shift vec_id only (labels repeat — the centroid relation stays
10 rows, as at production where label cardinality does not grow with
corpus size).

Expected shapes (documented in SCALE.md):
- gopher / ngram / chunk / centroid_stats / triangles: ~linear.
- knn_graph: the exact baseline is O(N^2 d) flops BY CONTRACT —
  expect ~100x flops at 10x data, amortized by BLAS; the probe
  records it so the certified-baseline cost is a measured number,
  not a guess (the production path is LSH/IVF candidate pairs).

Usage: python tools/probe_r13b_scale.py [copies]
"""

from __future__ import annotations

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

spark = get_spark(
    app_name="r13b-scale-probe",
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

import __spark_entry__ as entrymod  # noqa: E402
from s3_manifest_spark.registry import clear_model_cache  # noqa: E402

QS = entrymod.queries()

# JVM warmup
spark.read.parquet(f"{SF}/documents.parquet").count()
spark.range(32).repartition(32).mapInPandas(
    lambda it: it, schema="id long"
).count()

base = tempfile.mkdtemp(prefix="r13b-scale-")
big = os.path.join(base, "big")
os.makedirs(big, exist_ok=True)

docs = spark.read.parquet(f"{SF}/documents.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
n_docs, n_emb = docs.count(), emb.count()

out = None
for i in range(COPIES):
    c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10**9))
    c = c.withColumn(
        "text", F.regexp_replace("text", "(^| )", f"$1c{i}x")
    )
    out = c if out is None else out.unionAll(c)
out.coalesce(8).write.mode("overwrite").parquet(f"{big}/documents.parquet")

out = None
for i in range(COPIES):
    c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10**9))
    out = c if out is None else out.unionAll(c)
out.coalesce(8).write.mode("overwrite").parquet(f"{big}/embeddings.parquet")


def timed(name, sf_dir):
    best = None
    rows = 0
    for _ in range(3):
        # fresh plan per rep (the bench's discipline): re-serving the
        # memoized DataFrame lets Spark SKIP already-computed shuffle
        # stages, which would measure only the final stage
        getattr(spark, "_smsp_plan_cache", {}).clear()
        t0 = time.perf_counter()
        rows = len(QS[name](spark, sf_dir).toPandas())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


OPS = [
    "gopher_quality_rules",
    "ngram_corpus_topk",
    "chunk_dedup_boilerplate",
    "embedding_centroid_stats",
    "knn_graph",
    "graph_triangles",
    "bigram_lift_topk",
    "doc_containment",
    "embedding_covariance",
]

try:
    for name in OPS:
        t1, r1 = timed(name, SF)
        # triangles fits its session graph model per sf_dir: price the
        # 10x fit separately from warm serving
        tc0 = time.perf_counter()
        QS[name](spark, big).toPandas()
        cold = time.perf_counter() - tc0
        t10, r10 = timed(name, big)
        print(
            f"{name}: 1x={t1:.2f}s ({r1} rows)  10x={t10:.2f}s ({r10} rows)"
            f"  growth={t10 / t1:.1f}x  10x-first-call={cold:.2f}s"
        )
finally:
    clear_model_cache(spark)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
