from __future__ import annotations

import pytest

from s3_manifest_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="s3-manifest-spark-tests",
        master="local[4]",
        extra_confs={"spark.sql.shuffle.partitions": "8", "spark.ui.enabled": "false"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
