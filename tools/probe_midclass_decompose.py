#!/usr/bin/env python
"""Decompose the residual wall of the two mid-class corpus rows
VERDICT r13 item 4 flagged (ngram_corpus_topk: 0.48 s quiet vs
0.18 s expansion floor; bigram_lift_topk: 0.59 s vs 0.32 s): time the
query, its committed floor leg, and STRUCTURAL VARIANTS that each add
one plan component, min-of-N interleaved in one session so every
sample shares a noise environment.  Variants:

ngram_corpus_topk
- floor:     expansion + 1-row count        (trigram_expand_count)
- +agg1:     expansion + groupBy(ngram) count + TakeOrdered
             (n_occ only — no doc_id through the exchange, no Expand)
- +agg2lvl:  two-level distinct (groupBy(ngram, doc_id) then
             groupBy(ngram)) — the no-Expand alternative with TWO
             exchanges
- query:     the registered plan (countDistinct Expand, ONE exchange)

bigram_lift_topk
- floor:     both expansions + 1-row counts (bigram_unigram_expand_count)
- +aggs:     both keyed aggregates (vocab-keyed exchanges) + 1-row
             counts — no joins, no total, no TakeOrdered
- query:     the registered plan (joins + total + TakeOrdered)

Writes MIDCLASS_DECOMPOSE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("MID_RUNS", "6"))


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from s3_manifest_spark.session import get_spark

    spark = get_spark(
        app_name="probe-midclass",
        master=f"local[{cpus}]",
        extra_confs={
            "spark.driver.memory": "24g",
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from s3_manifest_spark.operators.corpus import (
        LIFT_MIN_SUPPORT,
        NGRAM_N,
        NGRAM_TOP_K,
    )
    from s3_manifest_spark.sources.tables import load_table

    qs = entrymod.queries()
    spark.read.parquet(f"{sf}/nation.parquet").groupBy(
        "n_regionkey"
    ).count().toPandas()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    def grams():
        docs = load_table(spark, sf, "documents", widen=True)
        toks = docs.select(
            "doc_id", F.split(F.col("text"), " ", -1).alias("t")
        )
        tri = " , ' ', ".join(
            f"element_at(t, i + {k})" for k in range(NGRAM_N)
        )
        return toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN size(t) >= {NGRAM_N} THEN "
                    f"transform(sequence(1, size(t) - {NGRAM_N - 1}), "
                    f"i -> concat({tri})) "
                    "ELSE array() END"
                )
            ).alias("ngram"),
        )

    def ngram_floor():
        grams().agg(F.count(F.lit(1))).toPandas()

    def ngram_agg1():
        (
            grams()
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .orderBy(F.col("n_occ").desc(), "ngram")
            .limit(NGRAM_TOP_K)
            .toPandas()
        )

    def ngram_agg2lvl():
        per = (
            grams()
            .groupBy("ngram", "doc_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        (
            per.groupBy("ngram")
            .agg(
                F.sum("c").alias("n_occ"),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .orderBy(F.col("n_occ").desc(), "ngram")
            .limit(NGRAM_TOP_K)
            .toPandas()
        )

    def bigram_parts():
        docs = load_table(spark, sf, "documents", widen=True)
        from s3_manifest_spark.operators.corpus import _TOKENS

        toks = docs.select(F.explode(F.expr(_TOKENS)).alias("u"))
        bi = docs.select(
            F.split(F.col("text"), " ", -1).alias("t")
        ).select(
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 2 THEN "
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) "
                    "ELSE array() END"
                )
            ).alias("b")
        )
        return toks, bi

    def bigram_aggs():
        toks, bi = bigram_parts()
        toks.groupBy("u").agg(F.count(F.lit(1)).alias("n")).agg(
            F.count(F.lit(1))
        ).toPandas()
        bi.groupBy("b").agg(F.count(F.lit(1)).alias("n_ab")).filter(
            F.col("n_ab") >= LIFT_MIN_SUPPORT
        ).agg(F.count(F.lit(1))).toPandas()

    def bigram_floor():
        toks, bi = bigram_parts()
        toks.agg(F.count(F.lit(1))).toPandas()
        bi.agg(F.count(F.lit(1))).toPandas()

    def run_query(name):
        def f():
            getattr(spark, "_smsp_plan_cache", {}).clear()
            qs[name](spark, sf).toPandas()

        return f

    legs = {
        "ngram_floor": ngram_floor,
        "ngram_agg1_count_only": ngram_agg1,
        "ngram_agg2lvl_no_expand": ngram_agg2lvl,
        "q:ngram_corpus_topk": run_query("ngram_corpus_topk"),
        "bigram_floor": bigram_floor,
        "bigram_aggs_no_joins": bigram_aggs,
        "q:bigram_lift_topk": run_query("bigram_lift_topk"),
    }
    samples: dict[str, list] = {n: [] for n in legs}
    for _ in range(RUNS):
        for name, fn in legs.items():
            t0 = time.perf_counter()
            fn()
            samples[name].append(round(time.perf_counter() - t0, 4))

    out = {
        "sf_dir": sf,
        "cpus": int(cpus),
        "runs": RUNS,
        "samples": samples,
        "min": {n: min(s) for n, s in samples.items()},
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "MIDCLASS_DECOMPOSE.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["min"], indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
