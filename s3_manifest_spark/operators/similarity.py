"""Similarity search over an embedding column (SURVEY.md §2B).

Two physical strategies behind the same logical ask (top-k cosine
neighbors per query vector):

- ``similarity_topk``     — brute force: broadcast the query set,
  score every (query, candidate) pair, per-query top-k.  Exact; the
  verification baseline.  Cost O(Q×N) — fine when Q is small or N is
  sf-fixture sized.
- ``similarity_ann_lsh``  — random-hyperplane LSH: bucket vectors by
  sign-pattern, score only same-bucket pairs.  The 100 TB path: the
  shuffle carries (vector, bucket) once, not Q×N scores.

All vector math is built-in higher-order functions over array columns
(zip_with/aggregate) after casting float→double: double arithmetic in
the same left-fold order is bit-identical across Spark and DuckDB,
which is what lets ``similarity_topk`` carry an exact-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_manifest_spark.registry import register
from s3_manifest_spark.sources.tables import load_table

TOP_K = 5
#: every 100th vector is a query point — deterministic, sf-independent
QUERY_STRIDE = 100
LSH_PLANES = 6


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@register(
    "similarity_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % {QUERY_STRIDE} = 0),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
             round(list_dot_product(qe, e)
                   / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))),
                   6) AS cos_sim
      FROM q JOIN v ON vec_id <> query_id
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
             ) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    The query side (N/{QUERY_STRIDE} rows) is broadcast, so the big side
    never shuffles for the join; the only shuffle is the per-query
    window, whose key count equals the number of queries.  Ordering is
    on the ROUNDED score (+ neighbor_id tie-break) so rank order is
    reproducible across engines regardless of last-ulp noise.
    """
    v = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = (
        v.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


def _plane(dim_idx: Column, plane: int) -> Column:
    """Deterministic pseudo-random ±1 hyperplane component: the parity
    of a seeded xxhash64 of (plane, dimension)."""
    h = F.xxhash64(F.lit(plane), dim_idx)
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def _lsh_signature(e: Column) -> Column:
    """Sign-pattern bucket id over LSH_PLANES random ±1 hyperplanes.

    sign(Σᵢ eᵢ·hᵖᵢ) per plane p, packed into an int.  Collision
    probability rises with cosine similarity (random-hyperplane LSH).

    The plane vector length is derived from ``size(e)`` — a hardcoded
    length would null-pad under ``zip_with`` for shorter embeddings,
    folding every projection to NULL and silently collapsing all
    vectors into bucket 0 (LSH would degenerate to all-pairs).
    """
    sig = F.lit(0).cast("long")
    for p in range(LSH_PLANES):
        proj = F.aggregate(
            F.zip_with(
                e,
                F.transform(
                    F.sequence(F.lit(0), F.size(e) - 1), lambda i: _plane(i, p)
                ),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(0)
    return sig


IVF_K = 8        # coarse centroids
IVF_NPROBE = 2   # cells probed per query


def _centroids_from(assigned: DataFrame) -> DataFrame:
    """Per-cluster mean vector from an (c, e) assignment — posexplode to
    (cluster, dim) cells, average, and fold back into an ordered array.
    Two small shuffles keyed by (cluster, dim) / cluster; never wider
    than K × dims rows after the first aggregation."""
    per_dim = assigned.select("c", F.posexplode("e").alias("pos", "val"))
    dim_means = per_dim.groupBy("c", "pos").agg(F.avg("val").alias("m"))
    return (
        dim_means.groupBy("c")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("c", F.transform("pm", lambda x: x["m"]).alias("ce"))
    )


def _nearest(v: DataFrame, cent: DataFrame, n: int) -> DataFrame:
    """Top-n nearest centroids per vector by cosine (broadcast the K
    centroid rows; map-side scoring, one window shuffle keyed by id)."""
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id", "e", "c", cosine(F.col("e"), F.col("ce")).alias("sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("c"))
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= n)
        .drop("rn", "sim")
    )


@register("similarity_ivf")  # rows-only: cluster geometry is engine-internal
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: deterministic coarse
    quantizer (modulo seed → one Lloyd refinement, all DataFrame ops),
    vectors assigned to their nearest cell, queries probe only
    IVF_NPROBE cells.

    The 100 TB shape: the index build is two bounded aggregations
    (K × dims cells), the cell assignment is a broadcast of K centroid
    rows (map-side, no shuffle of the corpus), and the search shuffle
    carries only vectors in probed cells — cost scales with cell
    occupancy, not N.  Recall tunes via IVF_K / IVF_NPROBE exactly as
    in FAISS-style IVF-Flat.
    """
    v = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e"))
    )
    # seed assignment → mean → one Lloyd step → final cells
    cent0 = _centroids_from(v.withColumn("c", (F.col("vec_id") % IVF_K).cast("int")))
    assign1 = _nearest(v, cent0, 1)
    cent1 = _centroids_from(assign1)
    cells = _nearest(v, cent1, 1).select("vec_id", "e", F.col("c").alias("cell"))

    q = (
        cells.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    )
    probes = _nearest(
        q.select(F.col("query_id").alias("vec_id"), F.col("qe").alias("e")),
        cent1,
        IVF_NPROBE,
    ).select(F.col("vec_id").alias("query_id"), F.col("c").alias("cell"))
    probed = q.join(F.broadcast(probes), "query_id")

    scored = (
        cells.alias("cand")
        .join(
            F.broadcast(probed.alias("p")),
            (F.col("cand.cell") == F.col("p.cell"))
            & (F.col("cand.vec_id") != F.col("p.query_id")),
        )
        .select(
            F.col("p.query_id").alias("query_id"),
            F.col("cand.vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("p.qe"), F.col("cand.e")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@register("similarity_ann_lsh")  # rows-only: bucket membership is hash-seeded
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH buckets.

    Each vector gets a {LSH_PLANES}-bit sign signature; queries probe
    only their own bucket.  At 100 TB: one narrow scan to bucket
    (no shuffle — signature is a projection), one shuffle keyed by
    bucket id, and per-bucket scoring whose cost is the bucket size,
    not N.  Recall/cost is tuned by LSH_PLANES and multi-probe.
    """
    v = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bucketed = v.select(
        "vec_id", "embedding", _lsh_signature(F.col("embedding")).alias("bucket")
    )
    q = (
        bucketed.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("bucket").alias("qbucket"),
        )
    )
    scored = (
        bucketed.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )
