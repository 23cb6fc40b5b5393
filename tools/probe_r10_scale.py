"""10x scaling probe for the r10 additions missing SCALE.md rows
(VERDICT r10 item 8): user_sessions, hourly_anomalies, knn_classify,
ingest_roundtrip.  Same method as the other probes: run each
operator's core over the sf0.1 input and a 10x synthesized union
(disjoint-shifted copies), min-of-3, and print the growth factor.

Usage: python tools/probe_r10_scale.py
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
COPIES = 10

spark = get_spark(
    app_name="r10-scale-probe",
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

from s3_manifest_spark.sources.tables import load_table  # noqa: E402

spark.read.parquet(f"{SF}/nation.parquet").groupBy("n_regionkey").count().collect()
spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()


def timed(fn):
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        n = fn()
        best = min(best or 9e9, time.perf_counter() - t0)
    return best, n


def copies(df, shifts: dict):
    """Union of COPIES copies of df, each with the given per-copy
    column shifts applied (callables i -> Column)."""
    out = None
    for i in range(COPIES):
        c = df
        for col, mk in shifts.items():
            c = c.withColumn(col, mk(i))
        out = c if out is None else out.unionAll(c)
    return out


# ---- user_sessions core (window + two rollups) ---------------------------
from s3_manifest_spark.operators.timeseries import SESSION_GAP_US  # noqa: E402


def sessions_core(ev):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    ns = F.when(
        F.lag("ts").over(w).isNull()
        | (us - F.unix_micros(F.lag("ts").over(w)) > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.select(
        "user_id",
        F.sum(ns).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    per = sess.groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("c").alias("n_events"),
        F.max("c").alias("longest_session"),
    ).count()


ev1 = load_table(spark, SF, "events").select("user_id", "ts", "event_id")
ev10 = copies(
    ev1, {"user_id": lambda i: F.col("user_id") + F.lit(i * 10**9)}
).localCheckpoint(eager=True)
t1, n1 = timed(lambda: sessions_core(ev1))
t10, n10 = timed(lambda: sessions_core(ev10))
print(f"user_sessions: 1x={t1:.2f}s ({n1} users) 10x={t10:.2f}s ({n10}) "
      f"growth={t10 / t1:.1f}x")

# ---- hourly_anomalies core ----------------------------------------------
from s3_manifest_spark.operators.timeseries import ANOMALY_Z  # noqa: E402


def anomalies_core(ev):
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    z = (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.col("n") * F.col("ss") - F.col("s") * F.col("s") > 0)
        .select(
            "event_type",
            "hour",
            F.round(
                (F.col("c") * F.col("n") - F.col("s"))
                / F.sqrt(
                    (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
                    .cast("double")
                ),
                6,
            ).alias("zscore"),
        )
    )
    return z.filter(F.abs(F.col("zscore")) >= ANOMALY_Z).count()


av1 = load_table(spark, SF, "events").select("event_type", "ts")
av10 = copies(
    av1,
    {"event_type": lambda i: F.concat("event_type", F.lit(f"_{i}"))},
).localCheckpoint(eager=True)
t1, n1 = timed(lambda: anomalies_core(av1))
t10, n10 = timed(lambda: anomalies_core(av10))
print(f"hourly_anomalies: 1x={t1:.2f}s ({n1} rows) 10x={t10:.2f}s ({n10}) "
      f"growth={t10 / t1:.1f}x")

# ---- knn_classify marginal core (votes + prediction over labels) ---------
# The exact-topk relation's own 10x behavior is probed per-ANN-family
# in probe_ann_scale.py; here we scale knn's MARGINAL work — the label
# join + vote rollup — with a 10x corpus (labels) and 10x query set.
from s3_manifest_spark.operators.similarity import (  # noqa: E402
    _exact_topk_cached,
)


def knn_core(exact, labels):
    from pyspark.sql import Window

    votes = (
        labels.withColumnRenamed("vec_id", "neighbor_id")
        .join(
            F.broadcast(exact.select("query_id", "neighbor_id")),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label")
    )
    pred = (
        votes.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )
    truth = labels.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
    )
    return pred.join(F.broadcast(truth), "query_id").count()


exact1 = _exact_topk_cached(spark, SF).select("query_id", "neighbor_id")
labels1 = load_table(spark, SF, "embeddings").select(
    "vec_id", F.col("label").cast("long").alias("label")
)
shift = 10**9
exact10 = copies(
    exact1,
    {
        "query_id": lambda i: F.col("query_id") + F.lit(i * shift),
        "neighbor_id": lambda i: F.col("neighbor_id") + F.lit(i * shift),
    },
).localCheckpoint(eager=True)
labels10 = copies(
    labels1, {"vec_id": lambda i: F.col("vec_id") + F.lit(i * shift)}
).localCheckpoint(eager=True)
t1, n1 = timed(lambda: knn_core(exact1, labels1))
t10, n10 = timed(lambda: knn_core(exact10, labels10))
print(f"knn_classify (marginal): 1x={t1:.2f}s ({n1} preds) 10x={t10:.2f}s "
      f"({n10}) growth={t10 / t1:.1f}x")

# ---- ingest_roundtrip read+certify core ----------------------------------
# The recurring job is the schema-pinned re-read + certificate
# aggregate (the spool is built once); probe it over 1x and 10x spools.
docs1 = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
docs10 = copies(
    docs1, {"doc_id": lambda i: F.col("doc_id") + F.lit(i * 10**9)}
)
base = tempfile.mkdtemp(prefix="smsp-probe-ingest-")
for tag, d in (("x1", docs1), ("x10", docs10)):
    d.write.mode("overwrite").json(os.path.join(base, tag, "jsonl"))
    (
        d.write.mode("overwrite")
        .options(header=True, quoteAll=True, escape='"', nullValue="\\N")
        .csv(os.path.join(base, tag, "csv"))
    )

_CKSUM = "CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT)"


def ingest_core(tag):
    schema = "doc_id long, text string, lang string"
    jsonl = spark.read.schema(schema).json(os.path.join(base, tag, "jsonl"))
    csv = (
        spark.read.schema(schema)
        .options(header=True, escape='"', multiLine=True, nullValue="\\N")
        .csv(os.path.join(base, tag, "csv"))
    )
    out = None
    for fmt, df in (("jsonl", jsonl), ("csv", csv)):
        agg = df.groupBy(F.lit(fmt).alias("format"), "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("text_mass"),
            F.sum(F.expr(_CKSUM)).alias("text_cksum"),
        )
        out = agg if out is None else out.unionAll(agg)
    return out.count()


t1, n1 = timed(lambda: ingest_core("x1"))
t10, n10 = timed(lambda: ingest_core("x10"))
print(f"ingest_roundtrip (read+certify): 1x={t1:.2f}s ({n1} rows) "
      f"10x={t10:.2f}s ({n10}) growth={t10 / t1:.1f}x")
shutil.rmtree(base, ignore_errors=True)
