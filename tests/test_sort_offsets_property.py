"""Property tests for the shared sort_offsets driver-side arithmetic
(pure Python — the distributed halves are pinned by the operators'
oracle parity and their own tests)."""

from __future__ import annotations

from hypothesis import given, strategies as st

from s3_manifest_spark.operators.sort_offsets import exclusive_offsets


class _Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=31),  # pid
        st.sampled_from(["a", "b", "c"]),  # group
        st.integers(min_value=0, max_value=10_000),  # weight
    ),
    max_size=64,
)


@given(rows)
def test_grouped_offsets_reconstruct_totals(raw):
    # one row per (pid, group), pid-sorted — the partition_weights shape
    seen = {}
    for pid, g, w in raw:
        seen[(pid, g)] = w
    meta = [
        _Row(pid=pid, g=g, w=w)
        for (pid, g), w in sorted(seen.items())
    ]
    offsets, totals = exclusive_offsets(meta, "g")
    # every offset is the sum of the SAME group's weights in strictly
    # earlier partitions, and totals are the grand sums
    for (pid, g), off in offsets.items():
        want = sum(
            w for (p2, g2), w in seen.items() if g2 == g and p2 < pid
        )
        assert off == want, (pid, g)
    for g in {g for (_, g) in seen}:
        assert totals[g] == sum(
            w for (_, g2), w in seen.items() if g2 == g
        )


@given(rows)
def test_global_offsets_are_prefix_sums(raw):
    seen = {}
    for pid, _, w in raw:
        seen[pid] = w  # last write wins; one row per pid
    meta = [_Row(pid=pid, w=w) for pid, w in sorted(seen.items())]
    offsets, totals = exclusive_offsets(meta)
    acc = 0
    for pid in sorted(seen):
        assert offsets[pid] == acc
        acc += seen[pid]
    assert totals.get(None, 0) == acc
