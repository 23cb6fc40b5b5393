"""Deduplication operators for an LLM training-data pipeline
(SURVEY.md §2B): exact hashing, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design: exact dedup and Jaccard verification shuffle on hashes
(uniform keys — no skew by construction); MinHash/LSH is the 100 TB
path, because the shuffle volume drops from all-pairs-sharing-a-shingle
to (docs × bands).  Everything is built-in expressions — the "hash
functions" are Spark's codegen'd xxhash64/murmur3, not Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table

#: 3-word shingles (documents are space-tokenized, min 10 tokens).
_SHINGLES = (
    "array_distinct(transform(sequence(1, size(split(text,' ',-1)) - 2), "
    "i -> concat_ws(' ', slice(split(text,' ',-1), i, 3))))"
)

JACCARD_THRESHOLD = 0.5
MINHASH_K = 16  # signature length
LSH_BANDS = 4   # 4 bands × 4 rows: P(candidate) ≈ 1-(1-j^4)^4


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) pairs, distinct per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.explode(F.expr(_SHINGLES)).alias("sh"))


@register(
    "dedup_exact",
    oracle="""
    SELECT sha256(text)        AS text_hash,
           min(doc_id)         AS keeper_doc_id,
           count(*)            AS copies
    FROM documents
    GROUP BY sha256(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep the lowest doc_id.

    The shuffle key is a uniform 256-bit hash, so there is no skew at
    any scale; map-side partial aggregation means each partition ships
    one row per distinct document.  (``dropDuplicates`` would pick an
    arbitrary survivor — min(doc_id) keeps it deterministic.)
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.sha2("text", 256).alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("copies"),
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS sh
      FROM toks
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (ca.n + cb.n - inter), 4) AS jaccard
    FROM pairs
    JOIN counts ca ON doc_a = ca.doc_id
    JOIN counts cb ON doc_b = cb.doc_id
    WHERE inter * 1.0 / (ca.n + cb.n - inter) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.5.

    Self-join on shingle, count intersections, derive the union from
    per-doc shingle counts (|A|+|B|-∩) so the union is never
    materialized.  Correct but O(Σ pairs-per-shingle) — this is the
    small/verification path; at 100 TB use dedup_minhash_lsh to prune
    candidates first, then this exact check on survivors only.
    """
    sh = _shingled(spark, sf_dir)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.alias("ca")
    cb = counts.alias("cb")
    jac = F.col("inter") / (F.col("ca.n") + F.col("cb.n") - F.col("inter"))
    return (
        pairs.join(ca, F.col("doc_a") == F.col("ca.doc_id"))
        .join(cb, F.col("doc_b") == F.col("cb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register("dedup_minhash_lsh")  # rows-only: seeded-hash values are engine-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures + banded LSH candidates + exact verification.

    The 100 TB dedup path: per-doc signature is MINHASH_K min-hashes
    (one aggregation over exploded shingles — map-side combinable,
    uniform keys), LSH buckets are LSH_BANDS murmur3 band-hashes, and
    only same-bucket pairs are exact-verified.  Shuffle volume is
    O(docs × bands) + O(candidate pairs), instead of the all-pairs
    blowup of dedup_ngram_jaccard.  Hash fns are Spark built-ins
    (xxhash64 seeded by column), so the whole thing is codegen'd.
    """
    sh = _shingled(spark, sf_dir)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
            for i in range(MINHASH_K)
        ]
    )
    rows_per_band = MINHASH_K // LSH_BANDS
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("bh"),
        )
        for b in range(LSH_BANDS)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # Exact verification on the (small) candidate set only.
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register("dedup_simhash")  # rows-only: xxhash64 is engine-specific
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document + near-dup pairs at Hamming ≤ 3.

    The per-bit vote is expressed as 64 codegen'd conditional sums in
    ONE aggregation (no row explosion: a posexplode over bits would
    multiply the corpus 64×).  Pair search uses the pigeonhole trick —
    split the fingerprint into 4 16-bit chunks; Hamming ≤ 3 pairs must
    agree on ≥1 chunk — so the join key is a chunk value, not a cross
    product.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ', -1)")).alias("w")
    ).withColumn("h", F.xxhash64("w"))

    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    simhash = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b) if b < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(0),
        range(64),
        F.lit(0).cast("long"),
    )
    fp = votes.select("doc_id", simhash.alias("simhash"))

    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))

    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
    return pairs
