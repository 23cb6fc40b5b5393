"""Empirical companion to the registered ``knn_ann_tuning_curve``
(VERDICT r14 item 5): for every (planes, probe_radius) config on the
curve's grid, the MEASURED per-edge capture under the engine's actual
seeded hyperplanes — the fraction of exact kNN edges whose endpoint
signatures differ by <= radius bits — next to the analytic expectation
the registered query reports.  Committed as KNN_ANN_TUNING.json.

One signature pass at the grid's MAX plane count serves every config:
``standard_normal((r, dim))`` fills row-major, so the first p rows of
the 24-plane matrix ARE the p-plane matrix for the same seed — a
p-plane signature is the low-p-bit mask of the 24-plane one.  The
empirical rate is then one aggregate over the k·N exact relation
joined to the two signature columns; no re-hash per config.

Also records the production pick: the corpus-adaptive plane count
(_knn_ann_planes) at KNN_ANN_MULTIPROBE — the row knn_graph_ann
actually runs — so the artifact shows where on the curve the engine
sits and what expected capture it bought.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import math

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from s3_manifest_spark.operators import similarity as S
    from s3_manifest_spark.sources.tables import load_table, parquet_row_count

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("probe-knn-ann-tuning")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pmax = max(S.KNN_ANN_TUNING_PLANES)
    v = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    sigs = S._ann_signatures(
        v, seed_offset=S.KNN_ANN_SEED_OFFSET, with_embedding=False,
        planes=pmax,
    )
    exact = S._knn_exact_cached(spark, sf)
    sa = sigs.select("vec_id", F.col("sig").alias("sig_a"))
    sb = sigs.select(
        F.col("vec_id").alias("neighbor_id"), F.col("sig").alias("sig_b")
    )
    edges = (
        exact.select("vec_id", "neighbor_id", "cos_sim")
        .join(sa, "vec_id")
        .join(sb, "neighbor_id")
        .selectExpr("sig_a", "sig_b", f"{S._HYPERPLANE_Q_SQL} AS q")
    )

    aggs = [F.count(F.lit(1)).alias("n_edges")]
    for p in S.KNN_ANN_TUNING_PLANES:
        mask = (1 << p) - 1
        ham = F.bit_count(
            F.col("sig_a").bitwiseXOR(F.col("sig_b")).bitwiseAND(F.lit(mask))
        )
        for r in S.KNN_ANN_TUNING_RADII:
            aggs.append(
                F.avg((ham <= r).cast("double")).alias(f"emp_{p}_{r}")
            )
            aggs.append(
                F.avg(F.expr(S._hyperplane_capture_expr(p, r))).alias(
                    f"exp_{p}_{r}"
                )
            )
    row = edges.agg(*aggs).collect()[0].asDict()

    n = parquet_row_count(f"{sf}/embeddings.parquet")
    prod_p = S._knn_ann_planes(n)
    configs = {}
    for p in S.KNN_ANN_TUNING_PLANES:
        for r in S.KNN_ANN_TUNING_RADII:
            emp, exp = row[f"emp_{p}_{r}"], row[f"exp_{p}_{r}"]
            # binomial-proportion scale for the gap (edges share planes,
            # so this is a yardstick, not an exact CI)
            sigma = math.sqrt(max(exp * (1 - exp), 1e-12) / row["n_edges"])
            configs[f"planes={p},radius={r}"] = {
                "empirical_capture": round(emp, 6),
                "expected_capture": round(exp, 6),
                "gap": round(emp - exp, 6),
                "gap_sigma_units": round((emp - exp) / sigma, 2),
            }
    out = {
        "sf_dir": sf,
        "n_vectors": n,
        "n_edges": row["n_edges"],
        "production_config": {
            "planes": prod_p,
            "probe_radius": S.KNN_ANN_MULTIPROBE,
            "rule": "planes = clamp(round(log2(N/32)), 4, 24), radius 1",
        },
        "configs": configs,
        "note": (
            "empirical = measured Hamming<=radius rate under the seeded "
            "planes; expected = the registered knn_ann_tuning_curve's "
            "analytic value on the same exact kNN edges; gaps beyond a "
            "few sigma reflect plane-sharing correlation, not error"
        ),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "KNN_ANN_TUNING.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "configs"}))
    for k in sorted(configs):
        print(k, configs[k])
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
