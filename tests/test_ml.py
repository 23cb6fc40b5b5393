"""Trained quality classifier: path equivalence, falsification,
non-degeneracy (oracle parity itself rides test_oracle_parity.py's
parameterized sweep)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from s3_manifest_spark.operators import ml

SF = "/root/testdata/sf0.001"


def _oracle_pdf(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).df()


def test_driver_and_distributed_paths_train_identical_weights(spark):
    """The per-step LR_WROUND rounding makes the weight trajectory
    independent of the physical strategy (driver numpy vs per-round
    mapInPandas partials) — the module's determinism contract."""
    w_driver = ml.train_quality_lr(spark, SF)
    w_dist = ml.train_quality_lr(spark, SF, force_distributed=True)
    assert np.array_equal(w_driver, w_dist), (w_driver, w_dist)


def test_classifier_is_nondegenerate(spark):
    """Learned model must actually separate the label (≥90% accuracy
    on the labeled split) and produce both classes — guards against a
    silently-diverged or all-one-class model after fixture or
    hyperparameter changes."""
    res = ml.quality_classifier_trained(spark, SF).toPandas()
    train = res[res["doc_id"] % ml.TRAIN_MOD == 0]
    acc = (train["pred_quality"] == train["label_quality"]).mean()
    assert acc >= 0.90, acc
    assert 0.05 < res["pred_quality"].mean() < 0.95  # both classes present
    assert res["quality_score"].between(0.0, 1.0).all()


def test_perturbed_weights_falsify_oracle(spark):
    """Scoring with weights 1e-3 off the trained trajectory must
    disagree with the oracle's predictions — the hash match is not
    vacuously insensitive to the model."""
    w = ml.train_quality_lr(spark, SF)
    good = ml.score_with_weights(spark, SF, w).toPandas()
    bad = ml.score_with_weights(
        spark, SF, np.round(w + 1e-3, ml.LR_WROUND)
    ).toPandas()
    oracle = _oracle_pdf(ml._oracle_sql())
    merged_good = good.merge(oracle, on="doc_id", suffixes=("", "_o"))
    assert (merged_good["quality_score"] == merged_good["quality_score_o"]).all()
    merged_bad = bad.merge(oracle, on="doc_id", suffixes=("", "_o"))
    assert not (merged_bad["quality_score"] == merged_bad["quality_score_o"]).all()


def test_scoring_plan_is_shuffle_free(spark):
    """The scoring pass must stay one narrow codegen'd projection —
    no Exchange anywhere in the plan."""
    w = ml.train_quality_lr(spark, SF)
    df = ml.score_with_weights(spark, SF, w)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


# --- bigram LM perplexity ---


def test_lm_nondegenerate_and_train_split_scores_lower(spark):
    """The LM must actually model its training split: docs the model
    saw score lower mean perplexity than unseen docs, every ppl is a
    finite value > 1, and n_bigrams matches tokens-1."""
    res = ml.lm_perplexity(spark, SF).toPandas()
    assert len(res) == 500
    assert (res["ppl"] > 1.0).all() and np.isfinite(res["ppl"]).all()
    seen = res[res["doc_id"] % ml.LM_TRAIN_MOD == 0]["ppl"].mean()
    unseen = res[res["doc_id"] % ml.LM_TRAIN_MOD != 0]["ppl"].mean()
    assert seen < unseen, (seen, unseen)


def test_lm_n_bigrams_matches_tokenization(spark):
    from s3_manifest_spark.sources.tables import load_table

    docs = (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .limit(20)
        .toPandas()
    )
    res = ml.lm_perplexity(spark, SF).toPandas().set_index("doc_id")
    for _, row in docs.iterrows():
        ntok = len([t for t in row["text"].split(" ") if t])
        assert res.loc[row["doc_id"], "n_bigrams"] == ntok - 1


def test_lm_model_session_cached(spark):
    a = ml.train_bigram_lm(spark, SF)
    b = ml.train_bigram_lm(spark, SF)
    assert a is b
    bi, uni, vocab, bigram_rows = a
    assert vocab > 0 and bigram_rows > 0


def test_quality_histogram_matches_scored_recompute(spark):
    """The histogram must be exactly the decile rollup of the scored
    relation (same weights, same rounding), and cover every doc."""
    import numpy as np

    from s3_manifest_spark.operators.ml import (
        quality_histogram,
        quality_classifier_trained,
    )

    sf = "/root/testdata/sf0.001"
    scored = quality_classifier_trained(spark, sf).toPandas()
    got = quality_histogram(spark, sf).toPandas().set_index("decile")
    q = scored["quality_score"]
    dec = np.minimum(np.floor(q * 10), 9).astype("int64")
    assert got["n_docs"].sum() == len(scored)
    for d, grp in q.groupby(dec):
        assert got.loc[d, "n_docs"] == len(grp)
        assert got.loc[d, "min_score"] == round(grp.min(), 6)
        assert got.loc[d, "max_score"] == round(grp.max(), 6)
        assert abs(got.loc[d, "avg_score"] - round(grp.mean(), 6)) < 1e-9
