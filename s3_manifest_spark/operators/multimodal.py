"""Multimodal column handling (SURVEY.md §2B): opaque binary payloads
with typed metadata, decode/feature-extract as Arrow-batched Python.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
seam a real decoder would fill (`decode_fn` parameter) — the Spark
side (binary schema, mapInPandas batch shape, partition sizing) is
real and is what matters at 100 TB: payload bytes stay in Arrow
record batches end-to-end, never row-at-a-time Python objects.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table


def binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-shaped as a multimodal table: an opaque ``binary``
    payload plus typed metadata — the layout a 100 TB image/audio corpus
    would use (payload and metadata in one row, partition-pruned by
    metadata, payload untouched until the decode stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT source                                   AS origin,
           count(*)                                 AS n_assets,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over a binary-payload table: per-origin asset
    counts and byte volumes.  The payload column is never read past its
    length — at scale the parquet reader prunes it entirely when only
    metadata is selected."""
    corpus = binary_corpus(spark, sf_dir)
    return corpus.groupBy(F.col("meta.origin").alias("origin")).agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.max(F.length("payload")).cast("long").alias("max_bytes"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image/video decoder.

    A real implementation would be, e.g.::

        import PIL.Image, io
        img = PIL.Image.open(io.BytesIO(payload))   # not in this container

    and should raise ``NotImplementedError`` if the codec library is
    missing.  The fake derives plausible dimensions from the payload
    bytes so the pipeline stays testable and hashable.
    """
    n = len(payload)
    width = (n % 64) + 1
    height = (n % 48) + 1
    n_frames = (n % 7) + 1
    mean_byte = round(sum(payload) / n, 4) if n else 0.0
    return width, height, n_frames, mean_byte


def decode_features(
    corpus: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int, float]] = _fake_decode,
) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched mapInPandas.

    Batches arrive as pandas DataFrames (Arrow transfer — no per-row
    pickling); each worker decodes its partition's payloads and emits a
    narrow feature frame.  At 100 TB the input should be repartitioned
    so (rows × payload size) per task fits executor memory — callers
    control that; this function is partitioning-agnostic.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_fn(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["width", "height", "n_frames", "mean_byte"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return corpus.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=FEATURE_SCHEMA
    )


@register("multimodal_decode")  # rows-only: exercises the Python decode seam
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = binary_corpus(spark, sf_dir)
    return decode_features(corpus)
