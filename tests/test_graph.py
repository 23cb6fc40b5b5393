"""graph_pagerank: equivalence with a pure-Python power iteration,
mass conservation, and degree/structure sanity.  (Oracle parity rides
test_oracle_parity.py's sweep.)"""

from __future__ import annotations

import collections

from s3_manifest_spark.operators import graph as g
from s3_manifest_spark.operators.dedup import dedup_ngram_jaccard

SF = "/root/testdata/sf0.001"


def _python_pagerank(pairs):
    edges = collections.defaultdict(set)
    for a, b in pairs:
        edges[a].add(b)
        edges[b].add(a)
    n = len(edges)
    pr = {v: round(1.0 / n, g.PR_ROUND) for v in edges}
    for _ in range(g.PR_ITERS):
        nxt = {}
        for v in edges:
            s = sum(pr[u] / len(edges[u]) for u in edges[v])
            nxt[v] = round(0.15 / n + 0.85 * s, g.PR_ROUND)
        pr = nxt
    return {v: round(p, 6) for v, p in pr.items()}, {
        v: len(e) for v, e in edges.items()
    }


def test_matches_python_power_iteration(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    ]
    want_pr, want_deg = _python_pagerank(pairs)
    res = g.graph_pagerank(spark, SF).toPandas()
    assert len(res) == len(want_pr)
    for _, row in res.iterrows():
        d = int(row["doc_id"])
        assert int(row["degree"]) == want_deg[d]
        assert abs(row["pagerank"] - want_pr[d]) < 2e-6, d


def test_mass_conserved_and_positive(spark):
    res = g.graph_pagerank(spark, SF).toPandas()
    assert (res["pagerank"] > 0).all()
    # no dangling nodes in a symmetric graph -> total mass stays 1
    assert abs(res["pagerank"].sum() - 1.0) < 1e-5 * max(len(res), 1)
