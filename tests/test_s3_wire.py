"""Wire-protocol S3 integration tests (VERDICT r11 item 5).

tests/test_s3_listing.py proves the connector's ORCHESTRATION
(pagination, sharding, retry, start_after) against the in-repo fake
client.  These tests prove the boto3 BINDING: a real HTTP S3 endpoint
(moto's ThreadedMotoServer) serves ListObjectsV2 over the wire, so a
wrong shape in make_boto3_client_factory's config dict (endpoint_url /
static-creds / retry kwargs — reference main.rs:294-319, C1/C2) fails
here even though the fake-client suite can't see it.

Scope note (K2): the S3A parquet WRITE path needs the hadoop-aws +
aws-sdk jars, which this pyspark distribution does not ship and the
environment cannot download — so manifest output is exercised through
the local-filesystem leg of write_manifest (same code path minus the
FileSystem impl) and the s3a:// leg stays covered by contract tests in
tests/test_sinks.py.  Everything else — shard discovery, paginated
listing, prefix pushdown, StartAfter, manifest derivation, stats
observation — runs against the wire endpoint end-to-end.

Skips cleanly when moto (or a usable ephemeral port) is unavailable.
"""

from __future__ import annotations

import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from s3_manifest_spark.sources.s3_listing import (  # noqa: E402
    list_objects_df,
    make_boto3_client_factory,
    manifest_from_s3,
)

BUCKET = "wire-bucket"
#: 3 shard prefixes x 120 keys (page_size=50 below -> 3 pages/shard,
#: exercising ContinuationToken over the wire) + direct root objects.
SHARDS = ("data/a/", "data/b/", "data/c/")
KEYS_PER_SHARD = 120
DIRECT = ("data/top1.bin", "data/top2.bin")


def _expected_keys() -> dict[str, int]:
    keys = {}
    for si, p in enumerate(SHARDS):
        for i in range(KEYS_PER_SHARD):
            keys[f"{p}obj{i:04d}.parquet"] = 1 + 7 * i + si
    for j, k in enumerate(DIRECT):
        keys[k] = 100_000 + j
    return keys


@pytest.fixture(scope="module")
def moto_endpoint():
    try:
        from moto.server import ThreadedMotoServer
    except Exception as e:  # pragma: no cover - moto[server] extras absent
        pytest.skip(f"moto server unavailable: {e}")
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    client = boto3.client(
        "s3",
        endpoint_url=endpoint,
        region_name="us-east-1",
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
    )
    client.create_bucket(Bucket=BUCKET)
    for key, size in _expected_keys().items():
        client.put_object(Bucket=BUCKET, Key=key, Body=b"x" * size)
    yield endpoint
    server.stop()


@pytest.fixture(scope="module")
def factory(moto_endpoint):
    # The exact production factory: endpoint override + static creds +
    # adaptive-retry config — the dict shape under test.
    return make_boto3_client_factory(
        endpoint_url=moto_endpoint,
        access_key="testing",
        secret_key="testing",
        region="us-east-1",
    )


def test_wire_listing_paginates_and_covers_every_key(spark, factory):
    df = list_objects_df(
        spark,
        BUCKET,
        prefix="data/",
        client_factory=factory,
        target_shards=8,
        page_size=50,  # 120 keys/shard -> 3 wire pages per shard
    )
    rows = {r["key"]: r for r in df.collect()}
    want = _expected_keys()
    assert set(rows) == set(want)
    assert {k: r["size"] for k, r in rows.items()} == want
    # real-wire metadata came through the row conversion
    some = rows[next(iter(want))]
    assert some["etag"] and some["last_modified"]


def test_wire_prefix_pushdown_lists_only_that_shard(spark, factory):
    df = list_objects_df(
        spark, BUCKET, prefix="data/b/", client_factory=factory, page_size=50
    )
    keys = [r["key"] for r in df.collect()]
    assert len(keys) == KEYS_PER_SHARD
    assert all(k.startswith("data/b/") for k in keys)


def test_wire_start_after_skips_prior_keyspace(spark, factory):
    marker = "data/b/obj0059.parquet"
    df = list_objects_df(
        spark,
        BUCKET,
        prefix="data/",
        client_factory=factory,
        page_size=50,
        start_after=marker,
    )
    keys = sorted(r["key"] for r in df.collect())
    want = sorted(k for k in _expected_keys() if k > marker)
    assert keys == want


def test_wire_manifest_end_to_end(spark, factory, tmp_path):
    from pyspark.sql import Observation

    obs = Observation()
    out = str(tmp_path / "manifest.parquet")
    manifest_from_s3(
        spark,
        f"s3://{BUCKET}/data/",
        output=out,
        client_factory=factory,
        observation=obs,
        single_object=True,
    )
    assert os.path.isfile(out)  # single-object mode: one parquet FILE
    got = {r["Key"]: r for r in spark.read.parquet(out).collect()}
    want = _expected_keys()
    assert set(got) == set(want)
    assert {k: r["Size"] for k, r in got.items()} == want
    assert all(r["Bucket"] == BUCKET for r in got.values())
    assert got["data/a/obj0000.parquet"]["FileName"] == "obj0000.parquet"
    # run stats observed from the SAME job (main.rs:231, 284-289)
    assert obs.get["objects"] == len(want)
    assert obs.get["total_bytes"] == sum(want.values())
