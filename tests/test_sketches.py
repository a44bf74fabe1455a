"""Literature sketches: published error bounds vs exact oracles, merge
associativity, serde (SURVEY.md §7.2.7)."""

import numpy as np
import pytest

from hksketch.sketch import (
    KLL,
    BloomFilter,
    BuilderError,
    CountMinSketch,
    HyperLogLog,
    IncompatibleSketchError,
    TDigest,
    sketch_from_bytes,
)


# ---------------------------------------------------------------- HLL
def test_hll_error_bound():
    # rel. err within 5σ of 1.04/sqrt(m) (Flajolet et al. 2007)
    h = HyperLogLog(p=12, seed=1)
    n = 100_000
    keys = np.arange(n, dtype=np.uint64)
    for chunk in np.array_split(keys, 7):
        h.add_batch(chunk)
    est = h.estimate()
    sigma = 1.04 / np.sqrt(1 << 12)
    assert abs(est - n) / n < 5 * sigma


def test_hll_small_range_linear_counting():
    h = HyperLogLog(p=10, seed=1)
    h.add_batch(list(range(50)))
    assert abs(h.estimate() - 50) <= 3


def test_hll_merge_equals_union():
    a, b = HyperLogLog(p=12, seed=3), HyperLogLog(p=12, seed=3)
    a.add_batch(np.arange(0, 60_000, dtype=np.uint64))
    b.add_batch(np.arange(40_000, 100_000, dtype=np.uint64))
    u = HyperLogLog(p=12, seed=3)
    u.add_batch(np.arange(0, 100_000, dtype=np.uint64))
    a.merge(b)
    assert a.state_equal(u)  # register-wise max == union, exactly


def test_hll_merge_associative_exact():
    parts = [np.arange(i * 30_000, (i + 1) * 30_000, dtype=np.uint64) for i in range(3)]
    hs = []
    for p in parts:
        h = HyperLogLog(p=10, seed=5)
        h.add_batch(p)
        hs.append(h.to_bytes())
    f = HyperLogLog.from_bytes
    left = f(hs[0]).merge(f(hs[1]).merge(f(hs[2])))
    right = f(hs[0]).merge(f(hs[1]))
    right.merge(f(hs[2]))
    assert left.state_equal(right)


def test_hll_validation_and_incompat():
    with pytest.raises(BuilderError):
        HyperLogLog(p=3)
    with pytest.raises(BuilderError):
        HyperLogLog(p=19)
    with pytest.raises(IncompatibleSketchError):
        HyperLogLog(p=10, seed=1).merge(HyperLogLog(p=11, seed=1))
    with pytest.raises(IncompatibleSketchError):
        HyperLogLog(p=10, seed=1).merge(HyperLogLog(p=10, seed=2))


# ---------------------------------------------------------------- CountMin
def test_cms_never_underestimates_and_bound():
    rng = np.random.default_rng(0)
    keys = rng.zipf(1.3, size=200_000)
    import collections

    truth = collections.Counter(keys.tolist())
    cms = CountMinSketch(width=2048, depth=5, seed=2)
    for chunk in np.array_split(keys, 10):
        cms.add_batch(chunk)
    items = np.array(list(truth.keys()))
    est = cms.count_batch(items)
    true = np.array([truth[int(i)] for i in items])
    assert (est >= true).all()  # one-sided error
    eps = np.e / 2048
    n = len(keys)
    frac_over = float((est > true + eps * n).sum()) / len(items)
    assert frac_over < 0.05  # δ = e^-5 ≈ 0.007, allow slack


def test_cms_conservative_update_tighter_never_under():
    # Estan & Varga 2002: conservative update keeps the one-sided guarantee
    # while shrinking overestimates
    rng = np.random.default_rng(0)
    keys = rng.zipf(1.3, size=100_000)
    import collections

    truth = collections.Counter(keys.tolist())
    plain = CountMinSketch(512, 4, seed=2)
    cons = CountMinSketch(512, 4, seed=2, conservative=True)
    for chunk in np.array_split(keys, 10):
        plain.add_batch(chunk)
        cons.add_batch(chunk)
    items = np.array(list(truth))
    true = np.array([truth[int(i)] for i in items])
    e_plain = plain.count_batch(items).astype(np.int64) - true
    e_cons = cons.count_batch(items).astype(np.int64) - true
    assert (e_cons >= 0).all()  # still one-sided
    assert e_cons.mean() < e_plain.mean()  # strictly tighter
    # mode mismatch rejected at merge; serde keeps the flag
    with pytest.raises(IncompatibleSketchError):
        plain.merge(cons)
    c2 = sketch_from_bytes(cons.to_bytes())
    assert c2.conservative and c2.state_equal(cons)


def test_cms_merge_equals_single_stream():
    a, b = CountMinSketch(512, 4, seed=1), CountMinSketch(512, 4, seed=1)
    a.add_batch([1, 2, 3, 1])
    b.add_batch([1, 4])
    u = CountMinSketch(512, 4, seed=1)
    u.add_batch([1, 2, 3, 1, 1, 4])
    a.merge(b)
    assert a.state_equal(u) or (a.cnt == u.cnt).all()
    assert a.count(1) == 3


def test_cms_serde_and_incompat():
    c = CountMinSketch(64, 3, seed=9)
    c.add_batch(["a", "b", "a"])
    c2 = sketch_from_bytes(c.to_bytes())
    assert c2.state_equal(c) and c2.count("a") == 2
    with pytest.raises(IncompatibleSketchError):
        c.merge(CountMinSketch(128, 3, seed=9))


# ---------------------------------------------------------------- Bloom
def test_bloom_no_false_negatives_and_fpr():
    bf = BloomFilter.for_capacity(10_000, fpr=0.01, seed=4)
    present = [f"key{i}" for i in range(10_000)]
    bf.add_batch(present)
    assert bf.contains_batch(present).all()  # zero false negatives
    absent = [f"other{i}" for i in range(10_000)]
    fpr = float(bf.contains_batch(absent).sum()) / 10_000
    assert fpr < 0.03  # target 0.01 with slack


def test_bloom_merge_or_semantics():
    a = BloomFilter(1024, 3, seed=1)
    b = BloomFilter(1024, 3, seed=1)
    a.add("x")
    b.add("y")
    a.merge(b)
    assert a.contains("x") and a.contains("y")
    with pytest.raises(IncompatibleSketchError):
        a.merge(BloomFilter(2048, 3, seed=1))
    c2 = sketch_from_bytes(a.to_bytes())
    assert c2.state_equal(a)


# ---------------------------------------------------------------- TDigest
def test_tdigest_quantile_accuracy_uniform():
    rng = np.random.default_rng(1)
    data = rng.random(200_000)
    td = TDigest(compression=100)
    for chunk in np.array_split(data, 20):
        td.add_batch(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert abs(td.quantile(q) - q) < 0.02, q
    # extreme quantiles are the t-digest's strength
    assert abs(td.quantile(0.999) - 0.999) < 0.005


def test_tdigest_merge_close_to_single():
    rng = np.random.default_rng(2)
    data = rng.normal(0, 1, 100_000)
    parts = np.array_split(data, 4)
    tds = []
    for p in parts:
        t = TDigest(100)
        t.add_batch(p)
        tds.append(t)
    merged = tds[0]
    for t in tds[1:]:
        merged.merge(t)
    single = TDigest(100)
    single.add_batch(data)
    for q in (0.1, 0.5, 0.9):
        assert abs(merged.quantile(q) - single.quantile(q)) < 0.05
    assert abs(merged.total_weight - 100_000) < 1e-6


def test_tdigest_serde_and_incompat():
    t = TDigest(50)
    t.add_batch([1.0, 2.0, 3.0])
    t2 = sketch_from_bytes(t.to_bytes())
    assert t2.state_equal(t)
    with pytest.raises(IncompatibleSketchError):
        t.merge(TDigest(100))
    with pytest.raises(BuilderError):
        TDigest(1)


# ---------------------------------------------------------------- KLL
def test_kll_rank_error_bound():
    rng = np.random.default_rng(3)
    data = rng.random(100_000)
    k = KLL(k=200, seed=7)
    for chunk in np.array_split(data, 10):
        k.add_batch(chunk)
    sorted_data = np.sort(data)
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        est = k.quantile(q)
        true_rank = float(np.searchsorted(sorted_data, est) / len(data))
        assert abs(true_rank - q) < 0.03, q  # ε ~ O(1/k), loose bound


def test_kll_merge_preserves_n_and_accuracy():
    rng = np.random.default_rng(4)
    data = rng.random(60_000)
    parts = np.array_split(data, 3)
    ks = []
    for p in parts:
        s = KLL(k=200, seed=5)
        s.add_batch(p)
        ks.append(s)
    m = ks[0].merge(ks[1]).merge(ks[2])
    assert m.n == 60_000
    est = m.quantile(0.5)
    assert abs(est - np.median(data)) < 0.03


def test_kll_serde_deterministic_continue():
    s = KLL(k=64, seed=9)
    s.add_batch(np.arange(1000, dtype=np.float64))
    blob = s.to_bytes()
    s2 = sketch_from_bytes(blob)
    assert s2.state_equal(s)
    more = np.arange(1000, 2000, dtype=np.float64)
    s.add_batch(more)
    s2.add_batch(more)
    assert s.state_equal(s2)  # RNG state restored → identical compactions
    with pytest.raises(IncompatibleSketchError):
        s.merge(KLL(k=128))


def test_weight_validation_rejects_bad_weights():
    """Negative weights would wrap to huge uint64 counts and fractional
    ones silently truncate — both must raise instead (all count sketches)."""
    import pytest

    from hksketch.sketch.countmin import CountMinSketch
    from hksketch.sketch.bucketed import BucketedTopK

    for sk in (CountMinSketch(width=64, depth=2, seed=1),
               BucketedTopK(k=4, width=64, depth=2, decay=0.9, seed=1)):
        with pytest.raises(ValueError):
            sk.add_batch(["a", "b"], np.array([1, -2], dtype=np.int64))
        with pytest.raises(ValueError):
            sk.add_batch(["a", "b"], np.array([1.0, 2.5]))
        with pytest.raises(ValueError):
            sk.add_batch(["a", "b"], np.array([1.0, np.nan]))
        sk.add_batch(["a", "b"], np.array([2.0, 3.0]))  # whole floats OK
        assert sk.count("b") == 3
