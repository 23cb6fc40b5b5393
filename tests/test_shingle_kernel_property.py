"""Property tests for the shared shingle-fingerprint kernel
(`s3_manifest_spark.operators.dedup._batch_doc_fps`) — the numpy core
under shingle_fingerprints, the contamination screen, and the bloom
screen.  Pure-Python/numpy: no SparkSession needed.

Contract pinned against a naive reference:
- one output row per DISTINCT 3-gram per document, doc-contiguous;
- the same shingle text maps to the same fingerprint in every
  document (cross-doc consistency is what makes fingerprint equality
  a valid stand-in for shingle equality);
- distinct shingles in the sample map to distinct fingerprints
  (64-bit space vs a handful of shingles — a collision here would be
  a kernel bug, not bad luck);
- NULL text and docs shorter than the window produce no rows.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from s3_manifest_spark.operators.dedup import SHINGLE_W, _batch_doc_fps

token = st.sampled_from(["a", "bb", "ccc", "", "dd", "e", "longertoken"])
doc_text = st.one_of(
    st.none(),
    st.lists(token, min_size=0, max_size=25).map(lambda t: " ".join(t)),
)


def naive_shingles(text):
    if text is None:
        return set()
    t = text.split(" ")
    return {
        tuple(t[i : i + SHINGLE_W]) for i in range(len(t) - SHINGLE_W + 1)
    }


@settings(max_examples=200, deadline=None)
@given(st.lists(doc_text, min_size=0, max_size=12))
def test_batch_doc_fps_matches_naive_reference(texts):
    pdf = pd.DataFrame(
        {"doc_id": list(range(1000, 1000 + len(texts))), "text": texts}
    )
    wdoc, fps = _batch_doc_fps(pdf)

    # doc-contiguous row indices
    assert list(wdoc) == sorted(wdoc)

    # group rows per doc row-index
    per_doc: dict[int, list[int]] = {}
    for d, f in zip(wdoc, fps):
        per_doc.setdefault(int(d), []).append(int(f))

    shingle_to_fp: dict[tuple, int] = {}
    for row_idx, text in enumerate(texts):
        ref = naive_shingles(text)
        got = per_doc.get(row_idx, [])
        # one row per distinct shingle
        assert len(got) == len(ref), (row_idx, text)
        assert len(set(got)) == len(got), "duplicate fp within one doc"
        # cross-doc consistency: same shingle text -> same fp.  Map
        # each doc's shingles to its fps by recomputing the kernel on
        # the single doc (fingerprints are position-independent, so
        # the single-doc run must reproduce the batch run's fps).
        solo_doc, solo_fps = _batch_doc_fps(
            pd.DataFrame({"doc_id": [0], "text": [text]})
        )
        assert sorted(int(f) for f in solo_fps) == sorted(got), (
            "batch vs solo fingerprint mismatch",
            text,
        )
    # distinct shingles across the whole batch -> distinct fps
    all_shingles = set()
    all_fps = set()
    for text in texts:
        all_shingles |= naive_shingles(text)
    for fp_list in per_doc.values():
        all_fps |= set(fp_list)
    assert len(all_fps) == len(all_shingles)
