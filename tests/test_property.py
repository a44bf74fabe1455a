"""Property-based invariants (hypothesis) for the core data structures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hksketch.sketch.base import U64_MAX, collapse_batch
from hksketch.sketch.pq import TopKQueue
from hksketch.hashing import hash_array
from hksketch.sketch import BloomFilter, HyperLogLog


@st.composite
def upsert_ops(draw):
    n = draw(st.integers(1, 60))
    return [
        (draw(st.integers(0, 9)), draw(st.integers(1, 100)))
        for _ in range(n)
    ]


@given(k=st.integers(1, 6), ops=upsert_ops())
@settings(max_examples=200, deadline=None)
def test_pq_model(k, ops):
    """TopKQueue vs a naive model of the reference semantics
    (src/priority_queue.rs:138-189)."""
    q = TopKQueue(k)
    model: dict[int, int] = {}
    for fp, count in ops:
        if fp in model:
            model[fp] = count
            q.upsert(fp, f"i{fp}", count)
            continue
        if len(model) < k:
            model[fp] = count
            q.upsert(fp, f"i{fp}", count)
            continue
        mn = min(model.values())
        if count > mn:
            # evict SOME min-count entry; which one is the earliest-inserted
            # min (the heap root) — mirror by asking the queue itself
            evicted = q.upsert(fp, f"i{fp}", count)
            assert evicted is not None
            ev_fp = int(evicted[1:])
            assert model.pop(ev_fp) == mn  # an entry with min count left
            model[fp] = count
        else:
            assert q.upsert(fp, f"i{fp}", count) is None
    assert {f: e[0] for f, e in q._map.items()} == model
    counts = [c for _, c in q.iter_sorted()]
    assert counts == sorted(counts, reverse=True)


@given(
    keys=st.lists(st.integers(0, 20), min_size=1, max_size=50),
    weights=st.lists(st.integers(0, 2**63), min_size=1, max_size=50),
)
@settings(max_examples=100, deadline=None)
def test_collapse_batch_exact_sums(keys, weights):
    n = min(len(keys), len(weights))
    keys, weights = keys[:n], weights[:n]
    h = hash_array(np.array(keys, dtype=np.int64), 1)
    uniq, first_idx, wsum = collapse_batch(h, np.array(weights, dtype=np.uint64))
    from collections import defaultdict

    truth = defaultdict(int)
    for hh, w in zip(h, weights):
        truth[int(hh)] += int(w)
    expect = {k: min(v, U64_MAX) for k, v in truth.items() if v > 0}
    got = {int(u): int(w) for u, w in zip(uniq, wsum)}
    assert got == expect
    # first_idx points at the first occurrence of each unique hash
    for u, fi in zip(uniq, first_idx):
        assert int(h[fi]) == int(u)
        assert not (h[:fi] == u).any()


@given(
    a=st.lists(st.integers(0, 10_000), max_size=200),
    b=st.lists(st.integers(0, 10_000), max_size=200),
)
@settings(max_examples=50, deadline=None)
def test_hll_merge_is_union(a, b):
    ha, hb, hu = (HyperLogLog(p=8, seed=3) for _ in range(3))
    if a:
        ha.add_batch(np.array(a, dtype=np.int64))
        hu.add_batch(np.array(a, dtype=np.int64))
    if b:
        hb.add_batch(np.array(b, dtype=np.int64))
        hu.add_batch(np.array(b, dtype=np.int64))
    ha.merge(hb)
    assert ha.state_equal(hu)


@given(
    items=st.lists(st.text(min_size=1, max_size=8), min_size=1, max_size=100),
    split=st.integers(0, 100),
)
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives_after_merge(items, split):
    split = min(split, len(items))
    x, y = BloomFilter(512, 3, seed=1), BloomFilter(512, 3, seed=1)
    if items[:split]:
        x.add_batch(items[:split])
    if items[split:]:
        y.add_batch(items[split:])
    x.merge(y)
    assert x.contains_batch(items).all()
