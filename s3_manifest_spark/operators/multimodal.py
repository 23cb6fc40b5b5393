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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)

FRAME_STRIDE = 2  # keep every 2nd frame


def sample_frames(corpus: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame-sampling seam for video-like payloads: each asset expands
    to every ``stride``-th frame as its own row (idx, size, content
    hash).  A real implementation would seek keyframes via a codec;
    the fake splits the payload into the n_frames equal chunks the
    fake decoder reports.

    The expansion happens INSIDE the Arrow batch (one input frame →
    one output frame of rows), so memory per task is one batch of
    payloads plus its sampled frames — the knob at 100 TB is
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` against payload
    size, same as decode.
    """
    import hashlib

    def explode_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                _, _, n_frames, _ = _fake_decode(payload)
                step = max(n // n_frames, 1)
                for idx in range(0, n_frames, stride):
                    chunk = payload[idx * step : (idx + 1) * step]
                    rows.append(
                        (
                            doc_id,
                            idx,
                            len(chunk),
                            hashlib.sha256(chunk).hexdigest()[:16],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return corpus.select("doc_id", "payload").mapInPandas(
        explode_frames, schema=FRAME_SCHEMA
    )


# DuckDB twin of sample_frames' stride arithmetic: same n_frames/step
# derivation, same stride-2 index set (unnest(range(...)) — DuckDB's
# generate_series can't take lateral column args), same sha256 prefix.
# VARCHAR substring is character-based vs the kernel's byte slicing;
# the documents fixture is pure ASCII (asserted in tests), where the
# two coincide.
_FRAME_SAMPLE_SQL = f"""
WITH f AS (
  SELECT doc_id, text,
         (octet_length(encode(text)) % 7) + 1 AS n_frames,
         greatest(octet_length(encode(text))
                  // ((octet_length(encode(text)) % 7) + 1), 1) AS step
  FROM documents
), e AS (
  SELECT doc_id, text, step,
         unnest(range(0, n_frames, {FRAME_STRIDE})) AS idx
  FROM f
)
SELECT doc_id,
       CAST(idx AS INTEGER) AS frame_idx,
       CAST(octet_length(encode(substring(
           text, CAST(idx*step + 1 AS BIGINT), CAST(step AS BIGINT)
       ))) AS BIGINT)        AS frame_bytes,
       substr(sha256(substring(
           text, CAST(idx*step + 1 AS BIGINT), CAST(step AS BIGINT)
       )), 1, 16)            AS frame_hash
FROM e
"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_SQL)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every {stride}-th frame of every asset as a row — the sampling
    pass a video-training pipeline runs before feature extraction.
    Hash-checked: the fake decoder's stride arithmetic and sha256
    content hash are reproduced exactly in ANSI SQL."""
    return sample_frames(binary_corpus(spark, sf_dir))
