"""Pin the IRREDUCIBLE Structured Streaming drain floor: a null-work
drain (1-row spool, availableNow, memory sink, the drains' own
4-partition state sizing) measures pure machinery — query start/stop,
trigger scheduling, commit/offset log writes, state-store lifecycle —
with no query work at all.  Three variants isolate the layers:

  stateless      source -> projection -> memory sink
  stateful_agg   + groupBy count (state store lifecycle + commit)
  two_batch      stateful over a 2-file spool, maxFilesPerTrigger=1
                 (the marginal cost of ONE extra trigger)

The numbers bound what NO drain on this host can beat; the per-drain
decomposition (tools/probe_drain_decompose.py, SCALE.md) itemizes the
rest.  Usage: python tools/probe_drain_floor.py [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3_manifest_spark.session import get_spark
from s3_manifest_spark.streaming.scratch import scratch_base

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark(
    app_name="drain-floor-probe",
    master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    extra_confs={
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

base = tempfile.mkdtemp(prefix="smsp-floor-", dir=scratch_base())
one = os.path.join(base, "one")
two = os.path.join(base, "two")
spark.range(1).selectExpr("id", "id AS k").coalesce(1).write.parquet(one)
for i in range(2):
    spark.range(1).selectExpr(f"id + {i} AS id", "id AS k").coalesce(
        1
    ).write.mode("append").parquet(two)


def drain(name: str, spool: str, stateful: bool, mfpt: int | None) -> float:
    reader = spark.readStream.schema("id long, k long").format("parquet")
    if mfpt is not None:
        reader = reader.option("maxFilesPerTrigger", mfpt)
    src = reader.load(spool)
    q = src.groupBy("k").count() if stateful else src.selectExpr("id + 1")
    with tempfile.TemporaryDirectory(
        prefix="smsp-floor-ckpt-", dir=scratch_base()
    ) as ckpt:
        t0 = time.perf_counter()
        sq = (
            q.writeStream.format("memory")
            .queryName(f"floor_{name}_{int(t0 * 1e6) % 10**9}")
            .outputMode("complete" if stateful else "append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        return time.perf_counter() - t0


# JVM/codegen warmup before measuring
drain("warm", one, True, None)

for name, spool, stateful, mfpt in (
    ("stateless", one, False, None),
    ("stateful_agg", one, True, None),
    ("two_batch", two, True, 1),
):
    samples = sorted(drain(name, spool, stateful, mfpt) for _ in range(REPS))
    print(
        f"{name}: min={samples[0]:.3f}s median={samples[REPS // 2]:.3f}s "
        f"all={[round(s, 3) for s in samples]}"
    )
