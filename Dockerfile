# Container packaging mirroring the reference's consumption model
# (/root/reference/Dockerfile: install the CLI, WORKDIR /data,
# ENTRYPOINT the binary) — a user who runs the reference image as
#   docker run -v $PWD:/data IMG s3://bucket/prefix -o manifest.parquet
# runs this one identically, with the Spark CLI behind the entrypoint.
#
# Base: a JRE image + pip-installed PySpark keeps the image a single
# stage.  Spark runs local[*] inside the container; against a real
# cluster, point spark.master at it via SPARK_OPTS or a spark-defaults
# mount.
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/*

# hadoop-aws/s3a come bundled with the pyspark distribution's hadoop;
# boto3 is the listing client (import-gated in code, real here).
RUN pip3 install --no-cache-dir pyspark==4.0.0 pyarrow pandas numpy boto3

ADD . /app
RUN pip3 install --no-cache-dir /app

# Reference parity: relative -o paths land in the mounted /data volume.
WORKDIR /data
ENTRYPOINT ["python3", "-m", "s3_manifest_spark.manifest.cli"]
