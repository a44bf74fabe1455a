"""Mergeable keyed-hash bottom-k (KMV) uniform sample."""

import numpy as np
import pytest

from hksketch.sketch.base import BuilderError, IncompatibleSketchError
from hksketch.sketch.reservoir import ReservoirSample
from hksketch.sketch import sketch_from_bytes


def test_basic_sampling_and_bounds():
    r = ReservoirSample(k=10, seed=1)
    r.add_batch(list(range(1000)))
    s = r.sample()
    assert len(s) == 10
    assert r.n_seen == 1000
    assert all(0 <= x < 1000 for x in s)


def test_small_stream_keeps_everything():
    r = ReservoirSample(k=100, seed=1)
    r.add_batch([1, 2, 3])
    assert sorted(r.sample()) == [1, 2, 3]


def test_merge_associative_exact():
    # min-k-tag design: merge is exactly associative (union → min-k);
    # shards share ONE seed so tags live in the same hash space
    parts = [list(range(i * 100, (i + 1) * 100)) for i in range(3)]
    blobs = []
    for p in parts:
        r = ReservoirSample(k=20, seed=7)
        r.add_batch(p)
        blobs.append(r.to_bytes())
    f = sketch_from_bytes
    left = f(blobs[0])
    left.merge(f(blobs[1]).merge(f(blobs[2])))
    right = f(blobs[0]).merge(f(blobs[1]))
    right.merge(f(blobs[2]))
    assert left.state_equal(right)
    assert left.n_seen == 300 and len(left.sample()) == 20


def test_partition_invariance():
    """Keyed-hash tags make the merged sample independent of HOW the stream
    was split into blocks/shards — the property positional RNG draws break
    (identical per-block tag sequences pick fixed within-block offsets)."""
    data = list(range(10_000))
    whole = ReservoirSample(k=50, seed=3)
    whole.add_batch(data)

    merged = ReservoirSample(k=50, seed=3)
    for chunk in np.array_split(np.asarray(data), 7):
        shard = ReservoirSample(k=50, seed=3)
        shard.add_batch(chunk.tolist())
        merged.merge(shard)

    assert sorted(whole.sample()) == sorted(merged.sample())


def test_uniformity_rough():
    # each of 10 deciles should land ~k/10 samples; loose 3x bound
    r = ReservoirSample(k=1000, seed=7)
    for chunk in np.array_split(np.arange(100_000), 10):
        r.add_batch(chunk.tolist())
    s = np.array(r.sample())
    hist = np.histogram(s, bins=10, range=(0, 100_000))[0]
    assert hist.min() > 100 / 3 and hist.max() < 300


def test_duplicates_collapse_to_distinct_keys():
    r = ReservoirSample(k=5, seed=1)
    r.add_batch(["x"] * 1000 + ["y"] * 1000)
    assert sorted(r.sample()) == ["x", "y"]


def test_serde_and_validation():
    r = ReservoirSample(k=5, seed=1)
    r.add_batch(["a", "b", "c"])
    r2 = sketch_from_bytes(r.to_bytes())
    assert r2.state_equal(r)
    with pytest.raises(BuilderError):
        ReservoirSample(0)
    with pytest.raises(IncompatibleSketchError):
        r.merge(ReservoirSample(k=6, seed=1))
    with pytest.raises(IncompatibleSketchError):
        r.merge(ReservoirSample(k=5, seed=2))


# ---------------------------------------------------------------------------
# θ-sketch A-NOT-B (estimate_anotb)
# ---------------------------------------------------------------------------


def test_anotb_exact_regime():
    """Neither side truncated → plain set difference, flagged exact."""
    from hksketch.sketch.reservoir import estimate_anotb

    a = ReservoirSample(k=1024, seed=5)
    b = ReservoirSample(k=1024, seed=5)
    a.add_batch(np.arange(0, 500, dtype=np.int64))
    b.add_batch(np.arange(300, 800, dtype=np.int64))
    r = estimate_anotb(a, b)
    assert r["exact"] and r["theta"] == 1.0
    assert r["est_anotb"] == 300.0
    # symmetric direction has its own answer
    assert estimate_anotb(b, a)["est_anotb"] == 300.0
    # disjoint and subset edges
    empty = ReservoirSample(k=1024, seed=5)
    assert estimate_anotb(a, empty)["est_anotb"] == 500.0
    assert estimate_anotb(empty, a)["est_anotb"] == 0.0
    sub = ReservoirSample(k=1024, seed=5)
    sub.add_batch(np.arange(0, 100, dtype=np.int64))
    assert estimate_anotb(sub, a)["est_anotb"] == 0.0


def test_anotb_truncated_regime_error_bound():
    """|A|=200k, |B|=150k, |A∖B|=100k with k=4096: the θ-scaled estimate
    must land within the standard bottom-k sampling error (≈1/√retained;
    4 standard deviations as the gate)."""
    from hksketch.sketch.reservoir import estimate_anotb

    k = 4096
    a = ReservoirSample(k=k, seed=5)
    b = ReservoirSample(k=k, seed=5)
    A = np.arange(0, 200_000, dtype=np.int64)
    B = np.arange(100_000, 250_000, dtype=np.int64)
    for chunk in np.array_split(A, 7):
        a.add_batch(chunk)
    for chunk in np.array_split(B, 5):
        b.add_batch(chunk)
    r = estimate_anotb(a, b)
    assert not r["exact"] and 0.0 < r["theta"] < 1.0
    rel = abs(r["est_anotb"] - 100_000) / 100_000
    assert rel < 4.0 / np.sqrt(r["retained"]), (r, rel)
    # reverse direction: |B∖A| = 50k, same gate
    r2 = estimate_anotb(b, a)
    rel2 = abs(r2["est_anotb"] - 50_000) / 50_000
    assert rel2 < 4.0 / np.sqrt(r2["retained"]), (r2, rel2)


def test_anotb_merge_consistent_and_param_checked():
    """Sharded build → merge gives bit-identical estimates to a single
    pass (the distributed-partials contract), and incompatible params
    refuse."""
    from hksketch.sketch.base import IncompatibleSketchError
    from hksketch.sketch.reservoir import estimate_anotb

    k = 2048
    A = np.arange(0, 100_000, dtype=np.int64)
    B = np.arange(60_000, 150_000, dtype=np.int64)
    one = ReservoirSample(k=k, seed=5)
    one.add_batch(A)
    b = ReservoirSample(k=k, seed=5)
    b.add_batch(B)
    sharded = ReservoirSample(k=k, seed=5)
    for chunk in np.array_split(A, 9):
        part = ReservoirSample(k=k, seed=5)
        part.add_batch(chunk)
        sharded.merge(part)
    assert estimate_anotb(one, b) == estimate_anotb(sharded, b)
    with pytest.raises(IncompatibleSketchError):
        estimate_anotb(one, ReservoirSample(k=k, seed=99))
