"""Manifest core — the reference's one hardcoded query, Spark-first.

The reference (``/root/reference/src/main.rs``) scans an S3 listing and
derives a fixed 5-column manifest row per object::

    Bucket       = :bucket                                   (main.rs:371)
    Key          = coalesce(key, '')                         (main.rs:373-374)
    FileName     = last token of Key on a LITERAL delimiter  (main.rs:376)
    Size         = coalesce(size, 0)                         (main.rs:379)
    LastModified = rfc3339(last_modified) else epoch 0       (main.rs:381-387)
    ... WHERE startswith(Key, :prefix)                       (main.rs:210-219)

Here that pipeline is one pure projection over any listing DataFrame —
whether it came from the parallel S3 connector
(:mod:`s3_manifest_spark.sources.s3_listing`), a fixture parquet, or a
synthesized table.  Keeping it a pure ``DataFrame -> DataFrame``
function means Catalyst can push the prefix filter into whatever source
produced the listing, and the whole projection stays inside one
WholeStageCodegen span (no Python in the row path).

Fidelity contract (SURVEY.md §2C): literal (not regex) last-occurrence
split, no nulls in the output, ms-precision tz-naive-UTC timestamps,
exact column names/types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Exact output schema of the reference (main.rs:135-145).  Spark has no
#: unsigned 64-bit type; LongType is lossless for S3 sizes (≤ 5 TiB).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("Bucket", T.StringType(), False),
        T.StructField("Key", T.StringType(), False),
        T.StructField("FileName", T.StringType(), False),
        T.StructField("Size", T.LongType(), False),
        T.StructField("LastModified", T.TimestampType(), False),
    ]
)

def file_name_expr(key: Column, delimiter: str = "/") -> Column:
    """Last token of ``key`` split on a LITERAL delimiter.

    ``substring_index(key, d, -1)`` matches Rust's
    ``key.rsplit(d).next()`` (main.rs:376) exactly, including:
    delimiter absent → whole key; key ends with delimiter → ``''``;
    multi-char and regex-metachar delimiters split literally.
    ``F.split`` would be wrong here — it is regex-based, so ``'.'`` or
    ``'|'`` delimiters would explode.
    """
    return F.substring_index(key, delimiter, -1)


def derive_manifest(
    listing: DataFrame,
    bucket: str,
    prefix: str = "",
    delimiter: str = "/",
    key_col: str = "key",
    size_col: str = "size",
    last_modified_col: str = "last_modified",
) -> DataFrame:
    """Apply the reference's projection+filter to a listing DataFrame.

    ``listing`` needs columns ``key`` (string, nullable), ``size``
    (numeric, nullable) and ``last_modified`` (RFC3339 string or
    timestamp, nullable) — the shape of an S3 ``ListObjectsV2`` page
    (main.rs:209).  Everything is built-in expressions, so at 100 TB the
    filter is pushed to the parquet/source scan and the projection is
    codegen'd; there is no shuffle in this pipeline at all.
    """
    key = F.coalesce(F.col(key_col).cast("string"), F.lit(""))
    lm = F.col(last_modified_col)
    lm_ts = lm if dict(listing.dtypes)[last_modified_col].startswith("timestamp") else F.to_timestamp(lm)

    out = listing.select(
        F.lit(bucket).alias("Bucket"),
        key.alias("Key"),
        file_name_expr(key, delimiter).alias("FileName"),
        F.coalesce(F.col(size_col), F.lit(0)).cast("long").alias("Size"),
        # Truncate to ms so parquet TIMESTAMP_MILLIS round-trips exactly
        # (main.rs:140-144 stores millisecond precision).
        F.timestamp_millis(
            F.coalesce(F.unix_millis(lm_ts), F.lit(0))
        ).alias("LastModified"),
    )
    if prefix:
        # Client-side re-check of the server-pushed prefix (main.rs:210-219);
        # startswith on the raw key, not path-aware.
        out = out.filter(F.col("Key").startswith(prefix))
    return out


def write_manifest(
    df: DataFrame,
    output: str,
    max_records_per_file: int = 5_000_000,
    single_object: bool = False,
) -> None:
    """Persist a manifest as Parquet (local path, s3a://, hdfs://, ...).

    Replaces the reference's ArrowWriter + whole-file-in-RAM PutObject
    (main.rs:147-165, 321-359): S3A streams multipart uploads per task,
    so memory stays bounded regardless of manifest size, and each task
    writes its own file in parallel.  ``maxRecordsPerFile`` keeps
    individual files splittable-scan friendly at the 100 TB end.

    Output-location semantics intentionally diverge from the reference
    by default: the reference PUTs ONE parquet object at exactly
    ``output`` (main.rs:271-282), while the parallel write produces a
    DIRECTORY of part-files at that path.  Consumers that GET the
    single object at the manifest key should pass
    ``single_object=True``: the frame is coalesced to one task, written
    to a UNIQUE scratch directory (uuid suffix — concurrent writers to
    the same output never share scratch), and the lone part-file is
    moved to exactly ``output`` with an atomic overwrite rename
    (FileContext + Rename.OVERWRITE) where the filesystem supports it
    (``file://``, ``hdfs://``); object stores without atomic rename
    (``s3a://``) fall back to delete-then-rename, whose visibility gap
    is inherent to the store — same as the reference's PutObject
    overwrite.  Single-object mode funnels the write through one task —
    correct compatibility mode, not the 100 TB path.
    """
    if not single_object:
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", max_records_per_file)
            .parquet(output)
        )
        return

    import uuid

    spark = df.sparkSession
    tmp = output.rstrip("/") + f".__smsp_tmp_{uuid.uuid4().hex}__"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)

    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = tmp_path.getFileSystem(conf)
    out_path = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(output))
    try:
        statuses = fs.listStatus(tmp_path)
        part = next(
            st.getPath()
            for st in statuses
            if st.getPath().getName().startswith("part-")
        )
        parent = out_path.getParent()
        if parent is not None and not fs.exists(parent):
            fs.mkdirs(parent)
        try:
            # Atomic overwrite: FileContext.rename(..., OVERWRITE) is a
            # single metadata op on file:// and hdfs:// — no reader can
            # observe a missing object mid-replace.
            gw = spark.sparkContext._gateway
            ctx = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                out_path.toUri(), conf
            )
            opts = gw.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
            opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
            ctx.rename(part, out_path, opts)
        except Exception:
            # Stores without atomic rename (s3a: copy+delete) — the
            # delete/rename gap is inherent there, matching the
            # reference's PutObject overwrite semantics.
            if fs.exists(out_path):
                fs.delete(out_path, True)
            if not fs.rename(part, out_path):
                raise IOError(f"rename {part} -> {output} failed")
    finally:
        fs.delete(tmp_path, True)


def manifest_stats(df: DataFrame) -> DataFrame:
    """The reference's run-stats (count, main.rs:231/284-289) widened to
    a per-top-level-prefix summary: object count, total bytes, newest
    mtime.  One map-side-combinable aggregation — a single shuffle on a
    low-cardinality key."""
    top = F.when(
        F.col("Key").contains("/"), F.substring_index(F.col("Key"), "/", 1)
    ).otherwise(F.lit("")).alias("top_prefix")
    return (
        df.groupBy(top)
        .agg(
            F.count(F.lit(1)).alias("object_count"),
            F.sum("Size").alias("total_bytes"),
            F.max("LastModified").alias("newest_mtime"),
        )
    )
