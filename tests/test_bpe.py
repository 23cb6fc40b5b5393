"""BPE trainer/tokenizer: equivalence with a dict-based pure-Python
reference implementation, greedy-trajectory invariants, tokenize
accounting identities, and merge-perturbation falsification.  (Oracle
parity rides test_oracle_parity.py's sweep.)"""

from __future__ import annotations

import collections

import pytest

from s3_manifest_spark.operators import bpe
from s3_manifest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _python_bpe(texts, n_merges):
    """Reference BPE on word histograms: tuple-of-symbols segments,
    greedy max-count pair with (count desc, a asc, b asc) tie-break."""
    words = collections.Counter(
        tok for text in texts for tok in text.split(" ") if tok
    )
    segs = {w: tuple(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for w, cnt in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += cnt
        if not counts:
            raise ValueError("corpus exhausted")
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, c))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, segs


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .toPandas()
    )


def test_merges_match_python_reference(spark, corpus):
    got = bpe.train_bpe(spark, SF)
    want, _ = _python_bpe(corpus["text"], bpe.N_MERGES)
    assert got == want


def test_pair_counts_monotone_nonincreasing(spark):
    # greedy BPE invariant: new pairs born of a merge can never exceed
    # the merged pair's count, so the trajectory is non-increasing
    counts = [c for _, _, c in bpe.train_bpe(spark, SF)]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] >= 1


def test_tokenize_accounting(spark, corpus):
    res = bpe.bpe_tokenize(spark, SF).toPandas().set_index("doc_id")
    merges, segs = _python_bpe(corpus["text"], bpe.N_MERGES)
    for _, row in corpus.iterrows():
        toks = [t for t in row["text"].split(" ") if t]
        want = sum(len(segs[t]) for t in toks)
        got = res.loc[row["doc_id"]]
        assert got["n_bpe_tokens"] == want, row["doc_id"]
        assert got["n_words"] == len(toks)
        # merges only ever shrink the symbol count, never below words
        assert len(toks) <= got["n_bpe_tokens"] <= got["n_chars"]


def test_perturbed_merges_change_tokenization(spark):
    """Falsification: dropping the first (highest-count) merge rule
    must change some document's token count — i.e. the tokenize query
    really consumes the trained model.  (A swap of two independent
    rules could commute; a dropped rule cannot — its pair occurs by
    construction, and rules referencing its merged symbol starve.)"""
    real = bpe.train_bpe(spark, SF)
    cache = spark._smsp_model_cache
    key = ("bpe_merges", SF)
    try:
        cache[key] = real[1:]
        perturbed = bpe.bpe_tokenize(spark, SF).toPandas()
    finally:
        cache[key] = real
    baseline = bpe.bpe_tokenize(spark, SF).toPandas()
    merged = baseline.merge(perturbed, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["n_bpe_tokens_a"] != merged["n_bpe_tokens_b"]).any()


def test_driver_and_distributed_paths_agree(spark):
    """Both trainer strategies must learn the identical merge list
    (the ml.py dual-path contract)."""
    driver = bpe.train_bpe(spark, SF)
    dist = bpe.train_bpe(spark, SF, force_distributed=True)
    assert driver == dist
