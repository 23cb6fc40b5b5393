#!/usr/bin/env python
"""Scale probe for the executor-side boto3 parquet sink (K2, r13):
upload an N-row frame partition-parallel to a local moto endpoint and
report wall, bytes, per-object sizes, and effective MB/s — evidence
that the sink's wall scales with executor width, not driver memory.

    python tools/probe_upload_scale.py [rows] [partitions]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import boto3
    from moto.server import ThreadedMotoServer

    from s3_manifest_spark.session import get_spark
    from s3_manifest_spark.sources.s3_listing import make_boto3_client_factory
    from s3_manifest_spark.sources.s3_upload import upload_parquet_boto3

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    client = boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1",
        aws_access_key_id="k", aws_secret_access_key="s",
    )
    client.create_bucket(Bucket="probe")
    factory = make_boto3_client_factory(
        endpoint_url=endpoint, access_key="k", secret_key="s",
        region="us-east-1",
    )

    spark = get_spark(
        app_name="probe-upload-scale",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_confs={"spark.driver.memory": "24g", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(rows)
        .repartition(parts)
        .selectExpr("id", "uuid() AS a", "repeat(uuid(), 3) AS b")
    )
    df.count()  # materialize inputs out of the measurement

    t0 = time.perf_counter()
    summaries = upload_parquet_boto3(
        df, "probe", "scale/out", client_factory=factory
    )
    wall = time.perf_counter() - t0
    total = sum(s["bytes"] for s in summaries)
    print(json.dumps({
        "rows": rows,
        "partitions": parts,
        "objects": len(summaries),
        "total_mb": round(total / 1e6, 1),
        "wall_sec": round(wall, 2),
        "mb_per_sec": round(total / 1e6 / wall, 1),
        "max_object_mb": round(max(s["bytes"] for s in summaries) / 1e6, 1),
        "rows_uploaded": sum(s["rows"] for s in summaries),
    }, indent=1))
    server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
