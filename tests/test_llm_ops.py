"""Semantic tests for the LLM-pipeline operators: not just
oracle-parity (test_oracle_parity covers that) but "does the operator
find what it is supposed to find" on the fixture's known structure."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return entrymod.queries()


def test_dedup_exact_no_false_positives(spark, q):
    # sf fixture has no exact duplicates — every group has 1 copy
    pdf = q["dedup_exact"](spark, SF).toPandas()
    assert (pdf["copies"] == 1).all()
    assert len(pdf) == 500


def test_jaccard_finds_near_dups(spark, q):
    pdf = q["dedup_ngram_jaccard"](spark, SF).toPandas()
    assert len(pdf) > 0, "fixture has near-duplicates by construction"
    assert (pdf["jaccard"] >= 0.5).all()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()


def test_minhash_lsh_recalls_strong_pairs(spark, q):
    """LSH must recover the high-jaccard pairs the exact method finds
    (4 bands × 4 rows: P(miss) = (1-j^4)^4 ≤ 1.7% at j≥0.8)."""
    exact = q["dedup_ngram_jaccard"](spark, SF).toPandas()
    strong = {
        (a, b)
        for a, b, j in zip(exact.doc_a, exact.doc_b, exact.jaccard)
        if j >= 0.8
    }
    lsh = q["dedup_minhash_lsh"](spark, SF).toPandas()
    got = set(zip(lsh.doc_a, lsh.doc_b))
    assert strong, "expected strong near-dup pairs in fixture"
    recall = len(strong & got) / len(strong)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(strong)} strong pairs"
    # and LSH never reports a pair below the exact threshold
    assert (lsh["jaccard"] >= 0.5).all()


def test_simhash_pairs_are_near_dups(spark, q):
    pdf = q["dedup_simhash"](spark, SF).toPandas()
    assert (pdf["hamming"] <= 3).all()
    # simhash near-pairs should heavily overlap the jaccard near-dups
    exact = q["dedup_ngram_jaccard"](spark, SF).toPandas()
    jacc_pairs = set(zip(exact.doc_a, exact.doc_b))
    sim_pairs = set(zip(pdf.doc_a, pdf.doc_b))
    if sim_pairs:
        assert len(sim_pairs & jacc_pairs) / len(sim_pairs) >= 0.5


def test_minhash_oracle_falsifies_broken_banding(spark, q):
    """The registered minhash oracle is the FULL exact-Jaccard
    relation, so it is a recall certificate — verify it would catch a
    degraded LSH: with banding collapsed to 1 band × 16 rows
    (P(candidate) = j^16 ≈ 0.19 even at j=0.9), the seeded signatures
    deterministically miss pairs the oracle contains."""
    import s3_manifest_spark.operators.dedup as dedup

    full = q["dedup_minhash_lsh"](spark, SF).toPandas()
    old_bands = dedup.LSH_BANDS
    dedup.LSH_BANDS = 1
    try:
        # raw function, NOT the registry wrapper: the degraded plan
        # must never enter the plan-memo cache.
        broken = dedup.dedup_minhash_lsh(spark, SF).toPandas()
    finally:
        dedup.LSH_BANDS = old_bands
    assert len(broken) < len(full), (
        "collapsing banding should lose ≥1 oracle pair — otherwise the "
        "oracle can't certify recall"
    )


def test_simhash_oracle_recomputes_fingerprints(spark):
    """The simhash oracle must genuinely recompute fingerprints from
    the inlined token→hash dictionary: corrupting ONE token's hash
    changes the DuckDB pair relation, and dropping a vocabulary token
    fails loud (documents using it vanish) rather than silently
    matching."""
    import duckdb

    from s3_manifest_spark.operators.dedup import (
        _SIMHASH_VOCAB,
        _simhash_oracle_sql,
    )

    def run(sql):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        return {tuple(r) for r in con.execute(sql).fetchall()}

    good = run(_simhash_oracle_sql())
    assert good, "fixture has simhash near-dup pairs by construction"

    import numpy as np
    import pandas as pd

    tok = "the"  # high-frequency token — touches most documents
    h = int(pd.util.hash_array(np.array([tok], dtype=object))[0])
    corrupted = _simhash_oracle_sql().replace(
        f"('the', {h}::UBIGINT)", f"('the', {h ^ 0xFFFF}::UBIGINT)"
    )
    assert corrupted != _simhash_oracle_sql()
    assert run(corrupted) != good

    dropped = _simhash_oracle_sql().replace(
        f"('the', {h}::UBIGINT),", ""
    )
    assert dropped != _simhash_oracle_sql()
    assert run(dropped) != good
    assert tok in _SIMHASH_VOCAB


def test_embedding_lsh_oracle_recomputes_buckets(spark, q):
    """The dense-LSH oracle inlines the seeded hyperplanes and
    re-derives the bucket structure — planes from a WRONG seed yield a
    different candidate set, so a Spark bucketing that disagreed with
    the seeded construction could not hash-match."""
    import duckdb

    import s3_manifest_spark.operators.dedup as dedup

    spark_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in q["dedup_embedding_lsh"](spark, SF).collect()
    }

    def run(sql):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS "
            f"SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
        )
        return {(r[0], r[1]) for r in con.execute(sql).fetchall()}

    good = run(dedup._embedding_lsh_oracle_sql())
    assert good == spark_pairs

    old_seed = dedup.EMBED_LSH_SEED
    dedup.EMBED_LSH_SEED = old_seed ^ 1
    try:
        wrong = run(dedup._embedding_lsh_oracle_sql())
    finally:
        dedup.EMBED_LSH_SEED = old_seed
    assert wrong != spark_pairs


def test_corpus09_oracle_is_not_vacuous(spark):
    """dedup_embedding_lsh_hi_corpus matches an EMPTY relation on the
    fixture — prove the oracle actually brute-forces cosine (a planted
    near-dup pair makes it non-empty) instead of asserting emptiness."""
    import duckdb

    import __spark_entry__ as em

    sql = em.oracle_sql()["dedup_embedding_lsh_hi_corpus"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS "
        f"SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    assert con.execute(sql).fetchall() == []
    # plant an exact duplicate of vec 0 under a fresh id
    con.execute(
        "INSERT INTO embeddings "
        "SELECT 999999999 AS vec_id, embedding, label "
        "FROM embeddings LIMIT 1"
    )
    planted = con.execute(sql).fetchall()
    assert len(planted) >= 1 and any(r[2] >= 0.9 for r in planted)


def test_similarity_topk_matches_numpy(spark, q):
    """Brute-force top-k must equal an independent numpy ground truth
    (exact cosine, same rounding + tie-break)."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    pdf = q["similarity_topk"](spark, SF).toPandas()
    assert set(pdf.groupby("query_id").size()) == {5}
    for qid in ids[ids % 100 == 0]:
        qv = emb[ids == qid][0]
        cos = emb @ qv / (norms * np.linalg.norm(qv))
        order = sorted(
            [(round(c, 6), i) for c, i in zip(cos, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        expect = [(i, c) for c, i in order[:5]]
        got = pdf[pdf.query_id == qid].sort_values(
            ["cos_sim", "neighbor_id"], ascending=[False, True]
        )
        assert list(got.neighbor_id) == [i for i, _ in expect], f"query {qid}"
        assert np.allclose(list(got.cos_sim), [c for _, c in expect], atol=1e-6)


def test_ann_lsh_candidates_are_correct(spark, q):
    """ANN reports a subset of the true pair space with correct cosine
    values (the fixture's vectors are near-orthogonal, so recall vs
    brute force isn't meaningful — correctness of scored candidates is)."""
    from s3_manifest_spark.operators.similarity import (
        similarity_ann_lsh_neighbors,
    )

    bf = q["similarity_topk"](spark, SF).toPandas()
    ann = similarity_ann_lsh_neighbors(spark, SF).toPandas()
    assert len(ann) > 0, "6-plane LSH over 500 vectors must yield collisions"
    assert set(ann.columns) == set(bf.columns)
    assert (ann.groupby("query_id").size() <= 5).all()
    # any (query, neighbor) also in brute-force output must agree on cos
    merged = ann.merge(bf, on=["query_id", "neighbor_id"], suffixes=("_a", "_b"))
    if len(merged):
        assert (merged.cos_sim_a - merged.cos_sim_b).abs().max() < 1e-9


def test_multimodal_decode_plumbing(spark, q):
    pdf = q["multimodal_decode"](spark, SF).toPandas()
    assert len(pdf) == 500
    assert set(pdf.columns) == {"doc_id", "width", "height", "n_frames", "mean_byte"}
    assert pdf["width"].between(1, 32).all()
    assert pdf["height"].between(1, 24).all()
    assert pdf["n_frames"].between(1, 5).all()
    assert pdf["mean_byte"].between(0, 255).all()


def test_ppm_decoder_is_real():
    """decode_ppm_stack must PARSE, not pattern-match: round-trips the
    generator, decodes any standards-compliant P6 (comments included),
    and refuses corrupted payloads."""
    import numpy as np
    import pytest

    from s3_manifest_spark.operators.multimodal import (
        decode_ppm_stack,
        encode_ppm_stack,
    )

    payload = b"hello multimodal world"  # 22 bytes
    asset = encode_ppm_stack(payload)
    w, h, f, mean = decode_ppm_stack(asset)
    assert (w, h, f) == (23, 23, 3)
    pix = np.resize(np.frombuffer(payload, np.uint8), w * h * 3 * f)
    assert mean == pix.mean()

    # hand-written P6 with a header comment — netpbm grammar, not
    # just our generator's byte layout
    ppm = b"P6\n# a comment\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    assert decode_ppm_stack(ppm) == (2, 1, 1, 35.0)

    for bad in (b"P5" + asset[2:], asset[:-1], asset + b"junk", b""):
        with pytest.raises(ValueError):
            decode_ppm_stack(bad)


def test_stream_live_equals_batch_twin(spark, q):
    batch = q["stream_tumbling"](spark, SF).toPandas()
    live = q["stream_tumbling_live"](spark, SF).toPandas()
    key = ["window_start", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)
    l = live.sort_values(key).reset_index(drop=True)  # noqa: E741
    assert b[["n_events"]].equals(l[["n_events"]])
    assert (b["total_value"] - l["total_value"]).abs().max() < 1e-9


def test_session_windows_respect_gap(spark, q):
    pdf = q["stream_session"](spark, SF).toPandas()
    # session_end = last event + 30 min ⇒ end - start ≥ 30 min always
    assert ((pdf["session_end"] - pdf["session_start"]).dt.total_seconds() >= 1800).all()
    # sessions of one user never overlap
    for _, g in pdf.groupby("user_id"):
        g = g.sort_values("session_start")
        assert (
            g["session_start"].iloc[1:].to_numpy()
            >= g["session_end"].iloc[:-1].to_numpy()
        ).all()


def test_frame_sample_deterministic_and_strided(spark):
    from s3_manifest_spark.operators.multimodal import (
        FRAME_STRIDE,
        binary_corpus,
        sample_frames,
    )

    corpus = binary_corpus(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, sample_frames(corpus).collect()))
    b = sorted(map(tuple, sample_frames(corpus).collect()))
    assert a == b, "frame sampling must be deterministic"
    by_doc = {}
    for doc_id, idx, nb, fh in a:
        by_doc.setdefault(doc_id, []).append(idx)
        assert nb > 0 and len(fh) == 16
    assert all(
        idxs == list(range(0, max(idxs) + 1, FRAME_STRIDE)) for idxs in by_doc.values()
    )


def test_document_frequency_cap(spark):
    from s3_manifest_spark.operators.dedup import _shingled, cap_document_frequency

    sh = _shingled(spark, "/root/testdata/sf0.001")
    import pyspark.sql.functions as F

    max_df_all = sh.groupBy("sh").count().agg(F.max("count")).collect()[0][0]
    # generous cap keeps everything
    assert cap_document_frequency(sh, max_df_all).count() == sh.count()
    # cap of 1 keeps exactly the shingles unique to one document
    uniq = cap_document_frequency(sh, 1)
    assert uniq.count() == uniq.select("sh").distinct().count()
    assert 0 < uniq.count() < sh.count()


def test_embedding_lsh_subset_with_recall(spark, q):
    """Banded embedding LSH: precision 1 by construction (every pair is
    exact-verified) and recall near the analytic 1-(1-p^r)^L ≈ 0.75 at
    this threshold — pinned at a 0.6 floor (deterministic: seeded
    planes over a fixed fixture)."""
    exact = {
        (r.vec_a, r.vec_b) for r in q["dedup_embedding"](spark, SF).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in q["dedup_embedding_lsh"](spark, SF).collect()
    }
    assert lsh <= exact, "LSH emitted a pair the exact sweep did not"
    assert len(lsh & exact) / len(exact) >= 0.6


def test_embedding_lsh_hi_full_recall_at_production_threshold(spark, q):
    """The fixture embeddings are uniform-random (max pair cosine
    ~0.51), so the production-threshold query must be empty there; the
    recall claim is pinned on a planted set: 100 base vectors each
    duplicated with a small perturbation (cosine 0.93-0.999), mixed
    into 300 random decoys.  The banded construction's per-pair miss
    probability at sim >= 0.93 is <= 6e-4, and the plane seed is
    fixed, so full recall is a deterministic outcome here — and every
    emitted pair passed the exact threshold, so precision is 1 by
    construction."""
    import numpy as np

    from s3_manifest_spark.operators.dedup import (
        PLANT_ID_BASE,
        _embedding_lsh_pairs,
        planted_near_dup_probes,
    )

    # The registered query mixes the seeded probe canary set into the
    # fixture, so it is non-empty and every pair involves probe ids
    # (the random fixture background and fixture-probe cross pairs stay
    # far below 0.9); the pair set must equal brute force over the
    # probe set.
    got_reg = {
        (r.vec_a, r.vec_b)
        for r in q["dedup_embedding_lsh_hi"](spark, SF).collect()
    }
    assert len(got_reg) >= 80
    assert all(a >= PLANT_ID_BASE and b >= PLANT_ID_BASE for a, b in got_reg)
    probes = planted_near_dup_probes(64)
    pm = np.array([v for _, v in probes])
    pid = np.array([i for i, _ in probes])
    sims = np.round(pm @ pm.T, 6)
    probe_exact = {
        (int(min(pid[a], pid[b])), int(max(pid[a], pid[b])))
        for a in range(len(pid))
        for b in range(a + 1, len(pid))
        if sims[a, b] >= 0.9
    }
    assert got_reg == probe_exact

    rng = np.random.RandomState(7)
    dim = 16
    base = rng.standard_normal((100, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # perturb toward a random direction: scale chosen so cosine lands
    # in ~[0.93, 0.999]
    eps = rng.uniform(0.05, 0.35, size=(100, 1))
    dup = base + eps * rng.standard_normal((100, dim)) / np.sqrt(dim)
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    decoys = rng.standard_normal((300, dim))
    decoys /= np.linalg.norm(decoys, axis=1, keepdims=True)
    vecs = np.vstack([base, dup, decoys])

    exact = {
        (a, b)
        for a in range(len(vecs))
        for b in range(a + 1, len(vecs))
        if float(np.round(vecs[a] @ vecs[b], 6)) >= 0.9
    }
    assert len(exact) >= 80, "planting failed to produce >=0.9 pairs"

    v = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        schema="vec_id long, embedding array<float>",
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in _embedding_lsh_pairs(v, 0.9).collect()
    }
    assert got == exact


def test_substring_spans_flag_near_dup_docs(spark, q):
    """Duplicated 8-token spans must exist (the fixture plants
    near-duplicates) and every flagged span's doc set must be >= 2 with
    occurrences >= docs."""
    pdf = q["dedup_substring_spans"](spark, SF).toPandas()
    assert len(pdf) > 0
    assert (pdf["n_docs"] >= 2).all()
    assert (pdf["n_occ"] >= pdf["n_docs"]).all()
    # the span-sharing docs should substantially overlap the Jaccard
    # near-dup pair universe: take the known near-dup doc ids
    jac = q["dedup_ngram_jaccard"](spark, SF).toPandas()
    near_dup_docs = set(jac["doc_a"]) | set(jac["doc_b"])
    assert near_dup_docs & set(pdf["example_doc"]), (
        "span dedup found none of the planted near-dup documents"
    )


def test_substring_rolling_matches_md5_histogram(spark, q):
    """The O(tokens) Rabin-Karp variant must find EXACTLY the same
    duplicated spans as the md5 variant: same number of flagged spans,
    identical (n_docs, n_occ, example_doc) histogram.  With 64-bit
    fingerprints over the fixture's ~10^5 windows, a collision that
    merges two distinct spans has probability ~2^-45 — so histogram
    equality is an exact-match certificate for the rolling arithmetic
    (prefix sums, inverse-power normalization, wraparound)."""
    from s3_manifest_spark.operators.dedup import rolling_span_groups

    md5 = q["dedup_substring_spans"](spark, SF).toPandas()
    roll = rolling_span_groups(spark, SF).toPandas()
    assert len(md5) == len(roll)
    key = ["n_docs", "n_occ", "example_doc"]
    h_md5 = sorted(map(tuple, md5[key].to_numpy().tolist()))
    h_roll = sorted(map(tuple, roll[key].to_numpy().tolist()))
    assert h_md5 == h_roll

    # the registered (hash-checked) form is that histogram aggregated
    summary = q["dedup_substring_rolling"](spark, SF).toPandas()
    agg = (
        md5.groupby(key, as_index=False)
        .size()
        .rename(columns={"size": "n_spans"})
    )
    a = sorted(map(tuple, summary[key + ["n_spans"]].to_numpy().tolist()))
    b = sorted(map(tuple, agg[key + ["n_spans"]].to_numpy().tolist()))
    assert a == b


def test_min_label_components_log_rounds_on_chain(spark):
    """Path-halving bound: on a planted 64-node chain (diameter 63 —
    the adversarial topology for plain min-label propagation, which
    needs ~63 rounds there), the pointer-jumping loop must converge in
    O(log n) rounds and still label every node with the chain min."""
    from s3_manifest_spark.operators.dedup import min_label_components

    n = 64
    chain = [(i, i + 1) for i in range(n - 1)]
    sym = chain + [(b, a) for a, b in chain]
    edges = spark.createDataFrame(sym, schema="doc_a long, doc_b long")
    labels, rounds = min_label_components(spark, edges)
    got = {r.node: r.lab for r in labels.collect()}
    labels.unpersist()
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 10, f"path-halving should need ~log2(64) rounds, took {rounds}"


def test_similarity_query_set_is_hard_capped(spark):
    """The driver-collected query set must respect MAX_QUERIES with
    deterministic lowest-id selection — the documented driver/broadcast
    memory bound for corpora where N/QUERY_STRIDE alone would grow
    without limit."""
    import s3_manifest_spark.operators.similarity as sim
    from s3_manifest_spark.sources.tables import load_table

    v = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    old = sim.MAX_QUERIES
    try:
        sim.MAX_QUERIES = 3
        pdf = sim._query_pdf(v)
        assert list(pdf["vec_id"]) == [0, 100, 200]
    finally:
        sim.MAX_QUERIES = old
    full = sim._query_pdf(v)
    assert len(full) <= sim.MAX_QUERIES
    assert (full["vec_id"] % sim.QUERY_STRIDE == 0).all()


def test_embedding_lsh_sparse_equals_dense_on_planted_set(spark):
    """The id-only sparse plan and the packed dense plan must emit the
    SAME pair set (both verify exactly; only candidate generation
    differs) on a planted near-dup set, at signature parameters whose
    analytic recall at sim >= 0.93 is ~1."""
    import numpy as np

    from s3_manifest_spark.operators.dedup import (
        EMBED_LSH_HI_BANDS,
        EMBED_LSH_HI_PLANES,
        _embedding_lsh_pairs,
        _embedding_lsh_pairs_sparse,
    )

    rng = np.random.RandomState(11)
    dim = 32
    base = rng.standard_normal((60, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    eps = rng.uniform(0.05, 0.3, size=(60, 1))
    dup = base + eps * rng.standard_normal((60, dim)) / np.sqrt(dim)
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    decoys = rng.standard_normal((200, dim))
    decoys /= np.linalg.norm(decoys, axis=1, keepdims=True)
    vecs = np.vstack([base, dup, decoys])
    v = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vecs)],
        schema="vec_id long, embedding array<float>",
    )
    L, r = EMBED_LSH_HI_BANDS, EMBED_LSH_HI_PLANES
    sparse = {
        (x.vec_a, x.vec_b)
        for x in _embedding_lsh_pairs_sparse(v, 0.9, L=L, r=r).collect()
    }
    dense = {
        (x.vec_a, x.vec_b)
        for x in _embedding_lsh_pairs(v, 0.9, L=L, r=r).collect()
    }
    assert len(sparse) >= 40
    assert sparse == dense


def test_plant_id_guard_rejects_colliding_corpus(spark, tmp_path):
    """_assert_plant_ids_disjoint must refuse a corpus whose vec_ids
    reach PLANT_ID_BASE (footer-stats read, no Spark job)."""
    import pytest

    from s3_manifest_spark.operators.dedup import (
        PLANT_ID_BASE,
        _assert_plant_ids_disjoint,
    )

    bad = spark.createDataFrame(
        [(PLANT_ID_BASE + 5, [0.1, 0.2])],
        schema="vec_id long, embedding array<float>",
    )
    d = str(tmp_path / "fixture")
    bad.coalesce(1).write.parquet(d + "/embeddings.parquet")
    with pytest.raises(ValueError, match="planted-id bound"):
        _assert_plant_ids_disjoint(spark, d)


def test_ann_certificates_detect_broken_ann(spark, q):
    """The registered similarity_ann_lsh / similarity_ivf entries are
    COMPLETENESS certificates: exact_kth_sim per query plus a
    deterministic flag (every exact-top-k member the query's canonical
    buckets/cells probe must appear in the ANN output).  The flag must
    be TRUE for the working ANNs and must FALSIFY when the ANN is
    deliberately broken (queries hashed with mismatched planes; IVF
    probing the farthest cells) — proving the certificate arithmetic
    is load-bearing, not vacuously true."""
    from s3_manifest_spark.operators.similarity import (
        _ann_certificate,
        _lsh_membership,
        similarity_ann_lsh_neighbors,
        similarity_ivf_neighbors,
    )

    for name in ("similarity_ann_lsh", "similarity_ivf"):
        cert = q[name](spark, SF).toPandas()
        assert set(cert.columns) == {
            "query_id",
            "exact_kth_sim",
            "ann_complete_ok",
        }
        assert len(cert) > 0
        assert cert["ann_complete_ok"].all(), name

    broken_lsh = _ann_certificate(
        spark,
        SF,
        similarity_ann_lsh_neighbors(spark, SF, query_seed_offset=17),
        _lsh_membership(spark, SF),
    ).toPandas()
    assert not broken_lsh["ann_complete_ok"].all()
    _, membership = similarity_ivf_neighbors(
        spark, SF, probe_farthest=True, with_membership=True
    )
    broken_ivf = _ann_certificate(
        spark,
        SF,
        similarity_ivf_neighbors(spark, SF, probe_farthest=True),
        membership,
    ).toPandas()
    assert not broken_ivf["ann_complete_ok"].all()


def test_wav_decoder_is_real():
    """decode_wav_pcm must WALK the RIFF chunk list, not pattern-match
    our generator: round-trips the encoder, decodes a hand-written WAV
    with an extra (odd-sized, padded) chunk before data, and refuses
    corrupted/compressed payloads."""
    import math
    import struct

    import numpy as np
    import pytest

    from s3_manifest_spark.operators.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    payload = b"hello audio"  # 11 bytes -> c=2, rate=24000, frames=23
    asset = encode_wav_pcm(payload)
    c, rate, frames, rms = decode_wav_pcm(asset)
    assert (c, rate, frames) == (2, 24000, 23)
    src = (np.frombuffer(payload, np.uint8).astype(np.int64) - 128) * 256
    samples = np.resize(src, frames * c)
    assert rms == math.sqrt(int((samples**2).sum()) / (frames * c))

    # hand-written WAV with an extra odd-sized LIST chunk (padded per
    # RIFF) between fmt and data — a standards feature our generator
    # never emits
    data = struct.pack("<4h", 100, -100, 200, -200)
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad
    body = b"WAVE" + b"fmt " + fmt + extra + b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    c2, r2, f2, rms2 = decode_wav_pcm(wav)
    assert (c2, r2, f2) == (1, 8000, 4)
    assert rms2 == math.sqrt((100**2 + 100**2 + 200**2 + 200**2) / 4)

    bad_fmt = asset.replace(b"fmt " + struct.pack("<IHH", 16, 1, 2),
                            b"fmt " + struct.pack("<IHH", 16, 85, 2), 1)
    for bad in (b"RIFX" + asset[4:], asset[:-1], bad_fmt):
        with pytest.raises(ValueError):
            decode_wav_pcm(bad)


def test_pq_certificate_and_falsification(spark, q):
    """similarity_pq is the same completeness-certificate shape as the
    LSH/IVF ANNs: flag must be TRUE for the working PQ scan and must
    FALSIFY with negated ADC tables (worst candidates ranked first, so
    canonically-findable exact members drop out of the refine set)."""
    import numpy as np

    from s3_manifest_spark.operators.similarity import (
        PQ_M,
        _ann_certificate,
        _pq_codebooks,
        similarity_pq_neighbors,
        similarity_topk,
    )

    cert = q["similarity_pq"](spark, SF).toPandas()
    assert set(cert.columns) == {"query_id", "exact_kth_sim", "ann_complete_ok"}
    assert len(cert) > 0
    assert cert["ann_complete_ok"].all()

    ann, membership = similarity_pq_neighbors(
        spark, SF, with_membership=True, corrupt_lut=True
    )
    broken = _ann_certificate(spark, SF, ann, membership).toPandas()
    assert not broken["ann_complete_ok"].all()

    # the trained codebooks must be a real quantizer: M subspace
    # tables, all-finite, and not collapsed to a single centroid
    books = _pq_codebooks(spark, SF)
    assert books.shape[0] == PQ_M and np.isfinite(books).all()
    assert np.unique(books.round(6), axis=1).shape[1] > 1


def test_minhash_recall_certificate_precondition():
    """The minhash-family oracles (dedup_minhash_lsh, dedup_incremental)
    register the FULL exact-Jaccard relation, so their hash match is a
    recall certificate — valid only while every qualifying pair sits
    well above the banding's miss zone (4×4 banding misses a pair at
    exactly j=0.5 with p≈0.77).  Guard the precondition instead of
    assuming it: every ≥-threshold pair in the fixture must have
    j ≥ 0.75 (miss ≤ 0.12 per pair, and the seeded signatures make the
    observed recall-1 deterministic).  A fixture regen that plants a
    near-threshold pair fails HERE with a readable message, not as an
    opaque driver hash mismatch."""
    import duckdb

    from s3_manifest_spark.operators.dedup import (
        _JACCARD_PAIRS_VALUED_SQL,
        JACCARD_THRESHOLD,
    )

    for sf in ("sf0.001", "sf0.01"):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        )
        pairs = con.execute(_JACCARD_PAIRS_VALUED_SQL).df()
        assert len(pairs) > 0, f"{sf}: no qualifying pairs — oracle vacuous"
        floor = pairs["jaccard"].min()
        assert floor >= 0.75, (
            f"{sf}: qualifying pair at j={floor} is inside the LSH miss zone "
            f"(threshold {JACCARD_THRESHOLD}, recall-safe floor 0.75) — the "
            "recall-certificate oracles are no longer sound for this fixture"
        )


def test_dedup_incremental_uses_index_and_falsifies(spark, q):
    """dedup_incremental must (a) answer from the session-persisted
    band index (second call reuses it — the model cache holds the two
    persisted frames), (b) emit only new×old pairs, and (c) lose
    oracle pairs when the banding degrades — the recall certificate is
    load-bearing for the incremental path too."""
    import s3_manifest_spark.operators.dedup as dedup
    from s3_manifest_spark.registry import clear_model_cache

    clear_model_cache(spark)
    full = q["dedup_incremental"](spark, SF).toPandas()
    assert ("minhash_index", SF) in spark._smsp_model_cache
    assert len(full) > 0
    assert (full["doc_new"] % dedup.SNAPSHOT_MOD == 0).all()
    assert (full["doc_old"] % dedup.SNAPSHOT_MOD != 0).all()

    clear_model_cache(spark)
    old_bands = dedup.LSH_BANDS
    dedup.LSH_BANDS = 1
    try:
        broken = dedup.dedup_incremental(spark, SF).toPandas()
    finally:
        dedup.LSH_BANDS = old_bands
        clear_model_cache(spark)  # drop the degraded index
    assert len(broken) < len(full)


def test_dedup_canonical_invariants(spark):
    """Exactly one keeper per component; the keeper is the longest doc
    (smallest doc_id on ties) of its component; singletons keep
    themselves; coverage is the whole corpus."""
    from s3_manifest_spark.operators.dedup import dedup_canonical, dedup_clusters
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    res = dedup_canonical(spark, sf).toPandas()
    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars").toPandas()
    assert len(res) == len(docs)
    assert res["doc_id"].is_unique
    # one keeper per component, and it is a member of the component
    per_comp = res.groupby("component_id")
    assert (per_comp["keep"].sum() == 1).all()
    for comp, grp in per_comp:
        cid = grp["canonical_id"].iloc[0]
        assert (grp["canonical_id"] == cid).all()
        assert cid in set(grp["doc_id"])
        # the elected doc maximizes (n_chars, -doc_id)
        sizes = docs.set_index("doc_id").loc[grp["doc_id"], "n_chars"]
        best = sorted(zip(-sizes.to_numpy(), sizes.index))[0][1]
        assert cid == best, comp
        assert (grp["component_size"] == len(grp)).all()
    # every clustered doc keeps its cluster label; singletons label themselves
    labels = dedup_clusters(spark, sf).toPandas().set_index("doc_id")
    merged = res.set_index("doc_id")
    for d, row in labels.iterrows():
        assert merged.loc[d, "component_id"] == row["component_id"]
    singles = merged[~merged.index.isin(labels.index)]
    assert (singles["component_id"] == singles.index).all()
    assert singles["keep"].all()


def test_embedding_quantize_int8_invariants(spark):
    """numpy recompute equality + analytic bounds: the max-abs element
    always saturates (x_max/scale == 127 exactly), codes stay in
    [-127, 127], and per-dim squared error is bounded by (scale/2)^2."""
    import numpy as np

    from s3_manifest_spark.operators.similarity import embedding_quantize_int8
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    res = embedding_quantize_int8(spark, sf).toPandas().set_index("vec_id")
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding").toPandas()
    assert len(res) == len(emb)  # no zero vectors in the fixture
    for _, row in emb.iterrows():
        e = np.asarray(row["embedding"], dtype=np.float64)
        scale = np.abs(e).max() / 127.0
        codes = np.floor(e / scale + 0.5).astype(int)
        got = res.loc[row["vec_id"]]
        assert abs(got["scale"] - scale) < 1e-12
        assert np.abs(codes).max() <= 127
        assert got["n_saturated"] == int((np.abs(codes) == 127).sum())
        assert got["n_saturated"] >= 1
        mse = float(((e - codes * scale) ** 2).mean())
        assert abs(got["mse"] - mse) < 1e-11
        assert got["mse"] <= (scale / 2) ** 2 + 1e-15


def test_lsh_tuning_curve_matches_recompute_and_is_monotone(spark):
    """The S-curve numbers must equal a pandas recompute over the exact
    pair relation, and recall must fall as rows-per-band grows (the
    banding tradeoff the operator exists to expose)."""
    from s3_manifest_spark.operators.dedup import (
        LSH_TUNING_CONFIGS,
        dedup_ngram_jaccard,
        lsh_tuning_curve,
    )

    sf = "/root/testdata/sf0.001"
    jac = dedup_ngram_jaccard(spark, sf).toPandas()["jaccard"]
    got = (
        lsh_tuning_curve(spark, sf)
        .toPandas()
        .set_index(["bands", "rows_per_band"])
    )
    assert (got["n_pairs"] == len(jac)).all()
    prev = 2.0
    for b, r in LSH_TUNING_CONFIGS:
        p = 1.0 - (1.0 - jac**r) ** b
        row = got.loc[(b, r)]
        assert abs(row["expected_recall"] - round(p.mean(), 6)) < 1e-9
        assert abs(row["min_capture"] - round(p.min(), 6)) < 1e-9
        assert 0.0 <= row["expected_recall"] <= 1.0
        # more bands (shorter rows) can only raise capture probability
        assert row["expected_recall"] <= prev + 1e-12
        prev = row["expected_recall"]
    # the production config (4,4) must sit on the curve with high
    # recall on this corpus's actual duplicate profile
    assert got.loc[(4, 4), "expected_recall"] > 0.9


def test_shingle_df_profile_reconciles_with_pair_relation(spark):
    """Bucket totals must cover the whole shingle relation exactly and
    respect the log2 ladder; the cap evidence must be actionable:
    capping at MINHASH_MAX_DF would keep every bucket on this corpus
    (the documented no-op guard)."""
    from s3_manifest_spark.operators.dedup import (
        MINHASH_MAX_DF,
        SHINGLE_DF_BUCKETS,
        shingle_df_profile,
        shingle_fingerprints,
    )
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = shingle_df_profile(spark, sf).toPandas().set_index("df_bucket")
    sh = shingle_fingerprints(
        load_table(spark, sf, "documents")
    ).toPandas()
    df = sh.groupby("fp").size()
    assert got["n_shingles"].sum() == df.nunique() or got[
        "n_shingles"
    ].sum() == len(df)
    assert got["n_postings"].sum() == len(sh)
    for b, row in got.iterrows():
        if b < SHINGLE_DF_BUCKETS - 1:
            assert row["max_df"] <= (1 << b)
    assert got["max_df"].max() == df.max()
    assert got["max_df"].max() < MINHASH_MAX_DF  # cap is inert here


def test_ingest_roundtrip_detects_corruption(spark, tmp_path):
    """The checksum must equal the parquet-side recompute, and must
    actually falsify: corrupting one character of one spooled document
    flips the affected (format, lang) row."""
    import glob
    import hashlib

    from s3_manifest_spark.operators.ingest import (
        _spool_formats,
        ingest_roundtrip,
    )
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = ingest_roundtrip(spark, sf).toPandas()
    docs = load_table(spark, sf, "documents").select("text", "lang").toPandas()
    want = docs.groupby("lang").agg(
        n_docs=("text", "size"),
        text_mass=("text", lambda s: int(s.str.len().sum())),
        text_cksum=(
            "text",
            lambda s: sum(
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in s
            ),
        ),
    )
    for _, row in got.iterrows():
        w = want.loc[row["lang"]]
        assert row["n_docs"] == w["n_docs"], row["format"]
        assert row["text_mass"] == w["text_mass"], row["format"]
        assert row["text_cksum"] == w["text_cksum"], row["format"]

    # falsification: flip one byte in one JSONL part file (drop the
    # Hadoop .crc sidecar first — otherwise the ChecksumFileSystem
    # rejects the read before the checksum column ever sees the byte)
    import os

    base = _spool_formats(spark, sf)
    part = sorted(glob.glob(f"{base}/jsonl/part-*"))[0]
    crc = os.path.join(
        os.path.dirname(part), "." + os.path.basename(part) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    raw = open(part, "rb").read()
    idx = raw.index(b'"text":"') + len(b'"text":"')
    corrupted = raw[:idx] + b"X" + raw[idx + 1 :]
    try:
        open(part, "wb").write(corrupted)
        getattr(spark, "_smsp_plan_cache", {}).clear()
        spark.catalog.clearCache()
        bad = ingest_roundtrip(spark, sf).toPandas()
        merged = bad.merge(
            got, on=["format", "lang"], suffixes=("_bad", "_ok")
        )
        jl = merged[merged["format"] == "jsonl"]
        assert (jl["text_cksum_bad"] != jl["text_cksum_ok"]).any()
    finally:
        open(part, "wb").write(raw)
        getattr(spark, "_smsp_plan_cache", {}).clear()
        spark.catalog.clearCache()


def test_skew_report_matches_pandas_recompute(spark):
    from s3_manifest_spark.operators.relational import (
        SKEW_TOP_K,
        skew_report,
    )
    from s3_manifest_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = skew_report(spark, sf).toPandas().sort_values("rnk")
    li = load_table(spark, sf, "lineitem").select("l_orderkey").toPandas()
    counts = li.groupby("l_orderkey").size()
    want = counts.reset_index(name="n_rows").sort_values(
        ["n_rows", "l_orderkey"], ascending=[False, True]
    ).head(SKEW_TOP_K).reset_index(drop=True)
    assert list(got["l_orderkey"]) == list(want["l_orderkey"])
    assert list(got["n_rows"]) == list(want["n_rows"])
    n_keys, total = len(counts), int(counts.sum())
    assert list(got["skew_x1000"]) == [
        r * n_keys * 1000 // total for r in want["n_rows"]
    ]
    assert list(got["rnk"]) == list(range(1, SKEW_TOP_K + 1))


def test_knn_classify_matches_numpy_vote(spark):
    """Predictions must equal an independent numpy kNN (same rounding,
    same tie-breaks), and the vote must be meaningfully accurate on
    the fixture's clustered labels."""
    import numpy as np
    import pyarrow.parquet as pq
    from collections import Counter

    from s3_manifest_spark.operators.similarity import (
        QUERY_STRIDE,
        TOP_K,
        knn_classify,
    )

    sf = "/root/testdata/sf0.001"
    got = knn_classify(spark, sf).toPandas().set_index("query_id")
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    labels = t["label"].to_numpy()
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    lab = dict(zip(ids, labels))
    for qid in ids[ids % QUERY_STRIDE == 0]:
        qv = en[ids == qid][0]
        cos = np.round(en @ qv, 6)
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )[:TOP_K]
        votes = Counter(lab[i] for _, i in order)
        top = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got.loc[qid, "predicted_label"] == top[0], qid
        assert got.loc[qid, "votes"] == top[1], qid
        assert got.loc[qid, "true_label"] == lab[qid]
    # the fixture's embeddings are uniform-random, so labels carry no
    # geometric structure and accuracy sits at chance — the operator's
    # contract is the exact vote mechanics (asserted above) and the
    # correct-flag consistency, not fixture accuracy
    assert (
        got["correct"] == (got["predicted_label"] == got["true_label"])
    ).all()


def test_matryoshka_recall_matches_numpy(spark):
    """Every (query, n_overlap) must equal an independent numpy
    recompute of full-dim vs prefix-dim exact top-k overlap (same
    rounding, same tie-breaks), and recall_at_k = n_overlap / K."""
    import numpy as np
    import pyarrow.parquet as pq

    from s3_manifest_spark.operators.similarity import (
        MRL_DIM,
        QUERY_STRIDE,
        TOP_K,
        embedding_matryoshka,
    )

    sf = "/root/testdata/sf0.001"
    got = embedding_matryoshka(spark, sf).toPandas().set_index("query_id")
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)

    def topk(mat, qid):
        qv = mat[ids == qid][0]
        cos = np.round(mat @ qv, 6)
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != qid],
            key=lambda p: (-p[0], p[1]),
        )[:TOP_K]
        return {i for _, i in order}

    full = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    tr = emb[:, :MRL_DIM]
    tr = tr / np.linalg.norm(tr, axis=1, keepdims=True)
    qids = ids[ids % QUERY_STRIDE == 0]
    assert sorted(got.index) == sorted(qids)
    for qid in qids:
        overlap = len(topk(full, qid) & topk(tr, qid))
        assert got.loc[qid, "n_overlap"] == overlap, qid
        assert got.loc[qid, "recall_at_k"] == round(overlap / TOP_K, 6)
    # truncation must lose SOMETHING on random vectors (a vacuous
    # audit that always reports recall 1.0 would hide a wiring bug
    # where both sides score the same vectors)
    assert got["n_overlap"].sum() < TOP_K * len(qids)


def test_ingest_csv_roundtrips_newlines_and_empty(spark, tmp_path):
    """ADVICE r10: the CSV leg must round-trip texts with embedded
    newlines (multiLine) and empty strings (emptyValue) byte-exactly —
    the write options and read options here are the operator's own."""
    rows = [
        (1, "plain text", "en"),
        (2, "line one\nline two\r\nline three", "en"),
        (3, "", "de"),
        (4, 'quotes " and, commas', "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "csv")
    (
        df.write.mode("overwrite")
        .options(header=True, quoteAll=True, escape='"', nullValue="\\N")
        .csv(path)
    )
    back = (
        spark.read.schema("doc_id long, text string, lang string")
        .options(header=True, escape='"', multiLine=True, nullValue="\\N")
        .csv(path)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(back["text"]) == [r[1] for r in rows]
    assert back["text"].notna().all()


def test_corpus_pos_certifies_positive_path(spark):
    """dedup_embedding_lsh_hi_corpus_pos (VERDICT r12 item 7): the
    corpus-form production plan must find exactly the planted twins —
    CORPUS_POS_SEEDS pairs at cos 1.0, ids offset-disjoint."""
    import __spark_entry__ as e

    from s3_manifest_spark.operators.dedup import (
        CORPUS_POS_OFFSET,
        CORPUS_POS_SEEDS,
    )

    out = (
        e.queries()["dedup_embedding_lsh_hi_corpus_pos"](
            spark, "/root/testdata/sf0.001"
        )
        .toPandas()
        .sort_values("vec_a")
        .reset_index(drop=True)
    )
    assert len(out) == CORPUS_POS_SEEDS
    assert list(out["vec_a"]) == list(range(CORPUS_POS_SEEDS))
    assert list(out["vec_b"]) == [
        i + CORPUS_POS_OFFSET for i in range(CORPUS_POS_SEEDS)
    ]
    assert (out["cos_sim"] == 1.0).all()


def test_ivf_pq_certificate_falsification_and_routing(spark, q):
    """similarity_ivf_pq composes the two trained indexes: the
    certificate must hold for the working scan, must FALSIFY with
    negated ADC tables, and the raw neighbor relation must respect
    cell routing — every returned neighbor lives in one of its
    query's canonical probed cells (the composition's defining
    property; a PQ-only scan would violate it)."""
    import numpy as np

    from s3_manifest_spark.operators.similarity import (
        IVF_NPROBE,
        _ann_certificate,
        _ivf_centroids,
        _query_pdf,
        similarity_ivf_pq_neighbors,
    )
    from s3_manifest_spark.sources.tables import load_table

    cert = q["similarity_ivf_pq"](spark, SF).toPandas()
    assert set(cert.columns) == {"query_id", "exact_kth_sim", "ann_complete_ok"}
    assert len(cert) > 0
    assert cert["ann_complete_ok"].all()

    ann, membership = similarity_ivf_pq_neighbors(
        spark, SF, with_membership=True, corrupt_lut=True
    )
    broken = _ann_certificate(spark, SF, ann, membership).toPandas()
    assert not broken["ann_complete_ok"].all()

    # routing check, recomputed independently in numpy
    v = load_table(spark, SF, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in v], dtype="int64")
    m = np.stack([np.asarray(r["embedding"], dtype="float64") for r in v])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    cent = _ivf_centroids(spark, SF)
    centn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    cells = {int(i): int(c) for i, c in zip(ids, np.argmax(m @ centn.T, axis=1))}
    qpdf = _query_pdf(
        load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    )
    qm = np.stack(qpdf["embedding"].to_numpy()).astype("float64")
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    probes = np.argsort(-(qm @ centn.T), kind="stable", axis=1)[:, :IVF_NPROBE]
    probe_of = {
        int(qid): set(int(c) for c in probes[i])
        for i, qid in enumerate(qpdf["vec_id"])
    }
    out = similarity_ivf_pq_neighbors(spark, SF).toPandas()
    assert len(out) > 0
    for _, row in out.iterrows():
        assert cells[int(row["neighbor_id"])] in probe_of[int(row["query_id"])], row
