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
