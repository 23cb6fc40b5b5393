"""Unit tests for the second round-13 extension batch:
bigram_lift_topk, doc_containment, embedding_covariance,
attribution_touch.  Oracle parity rides test_oracle_parity.py; these
pin semantics against independent pure-Python recomputations plus the
discriminating cases the fixtures can't isolate (containment vs
Jaccard asymmetry, purchases with no prior touch)."""

from __future__ import annotations

import collections

import numpy as np

from s3_manifest_spark.operators import corpus as C
from s3_manifest_spark.operators import dedup as D
from s3_manifest_spark.operators.similarity import embedding_covariance
from s3_manifest_spark.operators.timeseries import attribution_touch
from s3_manifest_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bigram_lift_matches_python(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    uni: collections.Counter = collections.Counter()
    bi: collections.Counter = collections.Counter()
    for text in docs.values():
        t = text.split(" ")
        uni.update(t)
        bi.update(" ".join(t[i : i + 2]) for i in range(len(t) - 1))
    N = sum(uni.values())
    scored = [
        (b, n, (n * 1.0 * N) / (uni[b.split(" ")[0]] * uni[b.split(" ")[1]]))
        for b, n in bi.items()
        if n >= C.LIFT_MIN_SUPPORT
    ]
    want = sorted(scored, key=lambda r: (-round(r[2], 6), r[0]))[: C.LIFT_TOP_K]
    res = C.bigram_lift_topk(spark, SF).toPandas()
    assert len(res) == min(C.LIFT_TOP_K, len(scored))
    got = sorted(
        zip(res["bigram"], res["n_ab"], res["lift"]),
        key=lambda r: (-r[2], r[0]),
    )
    assert [(b, int(n)) for b, n, _ in got] == [(b, n) for b, n, _ in want]
    for (_, _, gl), (_, _, wl) in zip(got, want):
        assert abs(gl - round(wl, 6)) < 2e-6


def test_lift_is_exact_integer_arithmetic(spark):
    """Every lift is a single IEEE division of exact int64 products —
    re-deriving it from the emitted n_ab and the corpus counts must
    reproduce the emitted double bit-for-bit (no libm, no log)."""
    docs = load_table(spark, SF, "documents").collect()
    uni: collections.Counter = collections.Counter()
    N = 0
    for r in docs:
        t = r["text"].split(" ")
        uni.update(t)
        N += len(t)
    res = C.bigram_lift_topk(spark, SF).toPandas()
    for _, row in res.iterrows():
        a, b = row["bigram"].split(" ")
        exact = round((int(row["n_ab"]) * 1.0 * N) / (uni[a] * uni[b]), 6)
        # HALF_UP-vs-banker divergence possible exactly at .xxxxxx5
        assert abs(row["lift"] - exact) < 1.01e-6, row["bigram"]


def _shingles(text: str) -> set[str]:
    t = text.split(" ")
    return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}


def test_doc_containment_matches_python(spark):
    docs = {
        r["doc_id"]: _shingles(r["text"])
        for r in load_table(spark, SF, "documents").collect()
    }
    want = {}
    ids = sorted(docs)
    for a in ids:
        for b in ids:
            if a == b or not docs[a]:
                continue
            c = len(docs[a] & docs[b]) / len(docs[a])
            if c >= D.CONTAIN_THRESHOLD:
                want[(a, b)] = round(c, 4)
    res = D.doc_containment(spark, SF).toPandas()
    got = {
        (int(r["contained"]), int(r["container"])): r["containment"]
        for _, r in res.iterrows()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1.01e-4, k


def test_containment_catches_what_jaccard_misses(spark, monkeypatch):
    """A short document quoted whole inside a much longer one: Jaccard
    dilutes under the union and misses the pair; containment is 1.0.
    (The asymmetric signal is the reason this operator exists.)"""
    short = " ".join(f"q{i}" for i in range(12))
    long = short + " " + " ".join(f"f{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    monkeypatch.setattr(D, "load_table", lambda s, d, n, widen=False: docs)
    cont = D.doc_containment(spark, SF).toPandas()
    jac = D.dedup_ngram_jaccard(spark, SF).toPandas()
    assert len(jac) == 0, "Jaccard should miss the quoted-short pair"
    rows = {
        (int(r["contained"]), int(r["container"])): r["containment"]
        for _, r in cont.iterrows()
    }
    assert rows == {(1, 2): 1.0}


def test_embedding_covariance_matches_numpy(spark):
    emb = load_table(spark, SF, "embeddings").collect()
    m = np.stack([np.asarray(r["embedding"], dtype="float64") for r in emb])
    n, d = m.shape
    cov = (m.T @ m) / n - np.outer(m.mean(axis=0), m.mean(axis=0))
    res = embedding_covariance(spark, SF).toPandas()
    assert len(res) == d * (d + 1) // 2
    for _, row in res.iterrows():
        i, j = int(row["i"]) - 1, int(row["j"]) - 1
        assert i <= j
        assert abs(row["cov"] - cov[i, j]) < 2e-6, (i, j)


def test_covariance_diagonal_is_variance(spark):
    res = embedding_covariance(spark, SF).toPandas()
    diag = res[res["i"] == res["j"]]
    assert (diag["cov"] >= 0).all()
    assert len(diag) == 64


def test_attribution_matches_python(spark):
    ev = sorted(
        load_table(spark, SF, "events").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    want = {}
    hist: dict[int, list] = collections.defaultdict(list)
    for r in ev:
        if r["event_type"] == "purchase":
            touches = hist[r["user_id"]]
            first = touches[0] if touches else (None, None)
            last = touches[-1] if touches else (None, None)
            want[r["event_id"]] = (
                r["user_id"], first[0], first[1], last[0], last[1],
            )
        else:
            hist[r["user_id"]].append((r["event_type"], r["event_id"]))
    res = attribution_touch(spark, SF).toPandas()
    assert len(res) == len(want)
    for _, row in res.iterrows():
        uid, ft, fi, lt, li = want[int(row["purchase_id"])]
        assert int(row["user_id"]) == uid
        assert (row["first_touch_type"] if row["first_touch_type"] is not None else None) == ft
        got_fi = None if row["first_touch_id"] is None or row["first_touch_id"] != row["first_touch_id"] else int(row["first_touch_id"])
        got_li = None if row["last_touch_id"] is None or row["last_touch_id"] != row["last_touch_id"] else int(row["last_touch_id"])
        assert got_fi == fi and got_li == li, row["purchase_id"]


def test_attribution_keeps_touchless_purchase(spark, monkeypatch):
    """A purchase with no preceding event must appear with NULL
    attribution, and same-timestamp ordering must fall back to
    event_id (synthetic frame; the fixture may not isolate either)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    from s3_manifest_spark.operators import timeseries as T

    ev = spark.createDataFrame(
        [
            (1, t0, 7, "purchase", 1.0, "{}"),       # no prior touch
            (2, t0, 8, "click", 1.0, "{}"),           # same ts as 3:
            (3, t0, 8, "purchase", 1.0, "{}"),        # id order decides
            (4, t0 + dt.timedelta(hours=1), 8, "view", 1.0, "{}"),
            (5, t0 + dt.timedelta(hours=2), 8, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    monkeypatch.setattr(T, "load_table", lambda s, d, n, widen=False: ev)
    res = {
        int(r["purchase_id"]): r
        for r in T.attribution_touch(spark, SF).collect()
    }
    assert res[1]["first_touch_type"] is None
    assert res[1]["last_touch_id"] is None
    assert res[3]["last_touch_id"] == 2  # event_id 2 sorts before 3 at t0
    assert res[5]["first_touch_id"] == 2 and res[5]["last_touch_id"] == 4
