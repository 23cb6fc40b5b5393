"""Sink-format coverage: the manifest must survive partitioned parquet,
CSV, and JSON roundtrips with identical values — the formats a consumer
of the reference's parquet output would reasonably ask this engine for.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3_manifest_spark.manifest.core import MANIFEST_SCHEMA, derive_manifest, write_manifest
from s3_manifest_spark.sources.tables import synth_listing

SF = "/root/testdata/sf0.001"


def _manifest(spark):
    return derive_manifest(synth_listing(spark, SF), bucket="b")


def _values(df):
    return sorted(
        (r.Bucket, r.Key, r.FileName, r.Size, r.LastModified) for r in df.collect()
    )


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    m = _manifest(spark).withColumn(
        "top", F.substring_index("Key", "/", 1)
    )
    out = str(tmp_path / "part")
    m.write.mode("overwrite").partitionBy("top").parquet(out)
    back = spark.read.parquet(out).drop("top")
    assert _values(back) == _values(_manifest(spark))
    # partition pruning: reading one partition touches only that dir
    one = spark.read.parquet(out).filter(F.col("top") == "data")
    assert one.count() == m.filter(F.col("top") == "data").count()


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "csv")
    m = _manifest(spark)
    (
        m.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(out)
    )
    back = (
        spark.read.schema(MANIFEST_SCHEMA)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        .csv(out)
    )
    assert _values(back) == _values(m)


def test_json_roundtrip(spark, tmp_path):
    out = str(tmp_path / "json")
    m = _manifest(spark)
    m.write.mode("overwrite").json(out)
    back = spark.read.schema(MANIFEST_SCHEMA).json(out)
    assert _values(back) == _values(m)


def test_write_manifest_max_records_splits_files(spark, tmp_path):
    import glob

    out = str(tmp_path / "split")
    write_manifest(_manifest(spark), out, max_records_per_file=1000)
    files = glob.glob(f"{out}/*.parquet")
    n = _manifest(spark).count()
    assert len(files) >= n // 1000, (len(files), n)
    assert _values(spark.read.parquet(out)) == _values(_manifest(spark))


def test_write_manifest_single_object(spark, tmp_path):
    """Reference-compat mode: exactly ONE parquet object at exactly the
    output path (main.rs:271-282 PUTs a single object at the key)."""
    out = str(tmp_path / "manifest.parquet")
    write_manifest(_manifest(spark), out, single_object=True)
    import os

    assert os.path.isfile(out), "output must be a single file, not a dir"
    assert not os.path.exists(out + ".__smsp_tmp__"), "scratch dir cleaned"
    assert _values(spark.read.parquet(out)) == _values(_manifest(spark))


def test_write_manifest_single_object_overwrites(spark, tmp_path):
    out = str(tmp_path / "manifest.parquet")
    write_manifest(_manifest(spark), out, single_object=True)
    write_manifest(_manifest(spark).limit(10), out, single_object=True)
    assert spark.read.parquet(out).count() == 10
