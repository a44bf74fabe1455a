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


@given(
    keys=st.lists(st.integers(0, 50), min_size=1, max_size=300),
    weights=st.lists(st.integers(1, 20), min_size=1, max_size=300),
    cut=st.integers(0, 300),
)
@settings(max_examples=100, deadline=None)
def test_ams_linearity(keys, weights, cut):
    """AMS is a LINEAR sketch: sketch(A ⊎ B) is state-identical to
    sketch(A) + sketch(B) for every split point and weighting."""
    import pyarrow as pa

    from hksketch.sketch.ams import AMSSketch

    n = min(len(keys), len(weights))
    keys, weights = keys[:n], weights[:n]
    cut = min(cut, n)
    whole = AMSSketch(width=64, depth=3, seed=7)
    whole.add_batch(pa.array(keys, type=pa.int64()), weights)
    a = AMSSketch(width=64, depth=3, seed=7)
    b = AMSSketch(width=64, depth=3, seed=7)
    a.add_batch(pa.array(keys[:cut], type=pa.int64()), weights[:cut])
    b.add_batch(pa.array(keys[cut:], type=pa.int64()), weights[cut:])
    assert a.merge(b).state_equal(whole)
    # and the estimate in a collision-free-wide sketch of a tiny domain is
    # nonnegative regardless
    assert whole.estimate() >= 0.0


@given(
    xs=st.lists(st.integers(0, 10_000), min_size=1, max_size=400),
    split=st.integers(1, 5),
)
@settings(max_examples=100, deadline=None)
def test_kmv_estimate_merge_consistency(xs, split):
    """KMV bottom-k: the merged sketch's tag set — and therefore its
    distinct estimate AND its overlap estimates — equals the single-pass
    sketch for every partitioning."""
    import pyarrow as pa

    from hksketch.sketch.reservoir import DistinctValueSample

    one = DistinctValueSample(k=32, seed=11)
    one.add_batch(pa.array(xs, type=pa.int64()))
    parts = []
    step = max(1, len(xs) // split)
    for lo in range(0, len(xs), step):
        p = DistinctValueSample(k=32, seed=11)
        p.add_batch(pa.array(xs[lo:lo + step], type=pa.int64()))
        parts.append(p)
    m = parts[0]
    for p in parts[1:]:
        m = m.merge(p)
    assert np.array_equal(m.tags, one.tags)
    assert m.estimate() == one.estimate()
    # exact regime sanity: below k the estimate IS the distinct count
    if len(set(xs)) < 32:
        assert m.estimate() == float(len(set(xs)))


@given(
    a_lo=st.integers(0, 200), a_n=st.integers(0, 400),
    b_lo=st.integers(0, 200), b_n=st.integers(0, 400),
    split=st.integers(1, 5),
)
@settings(max_examples=150, deadline=None)
def test_kmv_set_algebra_identities(a_lo, a_n, b_lo, b_n, split):
    """In the exact regime (k > |A ∪ B|) the three KMV set operations
    must satisfy the set identities exactly: |A∖B| + |A∩B| = |A|,
    |A∖B| + |B∖A| + |A∩B| = |A∪B| — and stay invariant under sharding
    A's build across merged partials."""
    from hksketch.sketch.reservoir import (
        ReservoirSample,
        estimate_anotb,
        estimate_overlap,
    )

    A = np.arange(a_lo, a_lo + a_n, dtype=np.int64)
    B = np.arange(b_lo, b_lo + b_n, dtype=np.int64)
    k = 1024  # > max possible union (600)
    a = ReservoirSample(k=k, seed=9)
    for chunk in np.array_split(A, split):
        part = ReservoirSample(k=k, seed=9)
        part.add_batch(chunk)
        a.merge(part)
    b = ReservoirSample(k=k, seed=9)
    b.add_batch(B)
    ov = estimate_overlap(a, b)
    ab = estimate_anotb(a, b)
    ba = estimate_anotb(b, a)
    assert ab["exact"] and ba["exact"]
    assert ab["est_anotb"] == float(len(np.setdiff1d(A, B)))
    assert ba["est_anotb"] == float(len(np.setdiff1d(B, A)))
    assert ab["est_anotb"] + ov["est_inter"] == float(len(np.unique(A)))
    assert (
        ab["est_anotb"] + ba["est_anotb"] + ov["est_inter"]
        == ov["est_union"]
    )
