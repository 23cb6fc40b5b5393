"""Round-trip hardening for the executor-side boto3 parquet sink
(sources/s3_upload.py, K2 r13): frames with the awkward shapes real
tables have — nulls in every column, unicode, binary blobs, arrays,
pre-epoch timestamps, empty partitions, an empty frame — must upload
and read back value-identical in BOTH directory and single-object
modes.  The wire suite (test_s3_wire.py) proves the manifest path;
this proves the sink is safe for arbitrary engine tables.
"""

from __future__ import annotations

import datetime as dt

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from s3_manifest_spark.sources.s3_listing import (  # noqa: E402
    make_boto3_client_factory,
)
from s3_manifest_spark.sources.s3_upload import upload_parquet_boto3  # noqa: E402

BUCKET = "roundtrip-bucket"


@pytest.fixture(scope="module")
def endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    ep = f"http://{host}:{port}"
    boto3.client(
        "s3", endpoint_url=ep, region_name="us-east-1",
        aws_access_key_id="k", aws_secret_access_key="s",
    ).create_bucket(Bucket=BUCKET)
    yield {"endpoint": ep}
    server.stop()


@pytest.fixture(scope="module")
def factory(endpoint):
    return make_boto3_client_factory(
        endpoint_url=endpoint["endpoint"], access_key="k", secret_key="s",
        region="us-east-1",
    )


def _sorted_pdf(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(cols, key=lambda s: s.map(repr))
        .reset_index(drop=True)
    )


def _roundtrip(spark, factory, df, key, single_object, tmp_path):
    summaries = upload_parquet_boto3(
        df, BUCKET, key, client_factory=factory, single_object=single_object
    )
    client = factory()
    d = tmp_path / key.replace("/", "_")
    d.mkdir(parents=True, exist_ok=True)
    keys = [s["key"] for s in summaries]
    assert keys, "sink uploaded nothing"
    for i, k in enumerate(keys):
        body = client.get_object(Bucket=BUCKET, Key=k)["Body"].read()
        (d / f"f{i}.parquet").write_bytes(body)
    return spark.read.parquet(str(d))


AWKWARD = {
    "nulls_everywhere": (
        [(1, None, None, None), (None, "x", 2.5, True), (3, "", 0.0, None)],
        "a long, s string, d double, b boolean",
    ),
    "unicode_and_binary": (
        [("名前🙂", bytearray(b"\x00\xffbin")), ("a\nb\tc", bytearray(b""))],
        "s string, raw binary",
    ),
    "arrays_and_pre_epoch": (
        [
            ([1.5, -2.0], dt.datetime(1912, 6, 23, 1, 2, 3)),
            ([], dt.datetime(2030, 1, 1)),
            (None, None),
        ],
        "v array<double>, ts timestamp",
    ),
}


@pytest.mark.parametrize("name", sorted(AWKWARD))
@pytest.mark.parametrize("single_object", [False, True])
def test_awkward_frames_roundtrip(
    spark, factory, tmp_path, name, single_object
):
    rows, schema = AWKWARD[name]
    df = spark.createDataFrame(rows, schema)
    got = _roundtrip(
        spark, factory, df,
        f"rt/{name}/{int(single_object)}", single_object, tmp_path,
    )
    assert [f.name for f in got.schema.fields] == [
        f.name for f in df.schema.fields
    ]
    assert _sorted_pdf(got).equals(_sorted_pdf(df)), name


def test_empty_partitions_skip_objects(spark, factory, tmp_path):
    """3 rows over 8 partitions: empty partitions produce NO objects
    (s3a parity) and the data still round-trips."""
    df = spark.range(3).repartition(8)
    summaries = upload_parquet_boto3(
        df, BUCKET, "rt/sparse", client_factory=factory
    )
    assert 1 <= len(summaries) <= 3
    assert sum(s["rows"] for s in summaries) == 3
    got = _roundtrip(spark, factory, df, "rt/sparse2", False, tmp_path)
    assert sorted(r["id"] for r in got.collect()) == [0, 1, 2]
