"""sf1-equivalent probe for the STREAMING CDC maintainer (SCALE.md):
drain the stateful per-key aggregation over a synthesized 6M-row
listing (ten disjoint-orderkey-shifted copies of the sf0.1 lineitem
scan — the same construction as the batch manifest probe) and record
the state-store metrics Structured Streaming reports per micro-batch.

Evidences the module's scale claims with numbers:
- state rows == live keys (numRowsTotal equals the keyed snapshot);
- state bytes/key stays flat at 10x keys (two longs + key + store
  overhead — state tracks the live-key population, nothing else);
- drain wall scales sublinearly (fixed commit machinery amortizes).

Usage: python tools/probe_cdc_scale.py [copies] [--provider rocksdb]
(r12: pass 100 for the 60M-row / ~45M-live-key probe; micro-batch
count stays ~4 at any scale so trigger machinery doesn't swamp the
data term)
"""
import functools
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_manifest_spark.session import get_spark
from s3_manifest_spark.streaming.scratch import scratch_base

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
COPIES = int(_pos[0]) if _pos else 10

extra = {
    "spark.driver.memory": "48g",
    "spark.sql.shuffle.partitions": CPUS,
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}
if "--provider" in sys.argv and "rocksdb" in sys.argv:
    extra["spark.sql.streaming.stateStore.providerClass"] = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
spark = get_spark(app_name="cdc-scale-probe", master=f"local[{CPUS}]", extra_confs=extra)
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from s3_manifest_spark.operators.manifest_queries import cdc_per_key  # noqa: E402
from s3_manifest_spark.sources.tables import listing_projection  # noqa: E402
from s3_manifest_spark.streaming.cdc import state_store_partitions  # noqa: E402


def drain(spool: str, n_rows_hint: int, label: str) -> None:
    schema = spark.read.parquet(spool).schema
    n_files = len(
        [f for f in os.listdir(spool) if f.endswith(".parquet")]
    )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        # ~4 micro-batches at any scale: the probe measures the state
        # path's data term, not 40 triggers' worth of commit machinery
        .option("maxFilesPerTrigger", str(max(1, n_files // 4)))
        .load(spool)
    )
    per_key = cdc_per_key(listing_projection(raw))
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        state_store_partitions(spark, n_rows_hint),
    )
    out_dir = tempfile.mkdtemp(prefix="smsp-probe-out-", dir=scratch_base())
    try:
        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

        with tempfile.TemporaryDirectory(
            prefix="smsp-probe-ckpt-", dir=scratch_base()
        ) as ckpt:
            t0 = time.perf_counter()
            q = (
                per_key.writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            progress = [p for p in q.recentProgress if p.get("stateOperators")]
        last = progress[-1]["stateOperators"][0]
        rows = last["numRowsTotal"]
        mem = last.get("memoryUsedBytes", 0)
        stores = spark.conf.get("spark.sql.shuffle.partitions")
        print(
            f"PROBE {label}: drain={wall:.2f}s micro_batches={len(progress)} "
            f"state_rows={rows} state_bytes={mem} "
            f"bytes_per_key={mem / max(rows, 1):.1f} stores={stores}"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(out_dir, ignore_errors=True)


li = spark.read.parquet(f"{SF}/lineitem.parquet")
base_rows = li.count()
mx = li.agg(F.max("l_orderkey")).first()[0] + 1

# 1x spool: the fixture as-is, staged as a handful of chunk files
spool1 = tempfile.mkdtemp(prefix="smsp-probe-1x-", dir=scratch_base())
li.repartition(4).write.mode("overwrite").parquet(spool1)

# 10x spool: disjoint-orderkey-shifted copies (distinct key universes)
spool10 = tempfile.mkdtemp(prefix="smsp-probe-10x-", dir=scratch_base())
shifted = [
    li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * mx))
    for i in range(COPIES)
]
functools.reduce(lambda a, b: a.unionByName(b), shifted).repartition(
    max(20, COPIES * 2)
).write.mode("overwrite").parquet(spool10)

try:
    # warmup: a throwaway mini-drain so the 1x row isn't inflated by
    # session constants (python workers, codegen, state-store init) —
    # an inflated 1x denominator would FLATTER the growth factor.
    warm = tempfile.mkdtemp(prefix="smsp-probe-warm-", dir=scratch_base())
    li.limit(1000).coalesce(1).write.mode("overwrite").parquet(warm)
    drain(warm, 1000, "warmup(discard)")
    shutil.rmtree(warm, ignore_errors=True)
    drain(spool1, base_rows, f"1x({base_rows} rows)")
    drain(
        spool10,
        base_rows * COPIES,
        f"{COPIES}x({base_rows * COPIES} rows)",
    )
finally:
    shutil.rmtree(spool1, ignore_errors=True)
    shutil.rmtree(spool10, ignore_errors=True)
