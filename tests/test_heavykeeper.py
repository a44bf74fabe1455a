"""HeavyKeeper variant unit families, ported from the reference's in-module
tests (SURVEY.md §5.1: /root/reference/src/heavykeeper.rs:580-1563,
src/bucketed.rs:600-1177, src/cuckoo.rs:883-1449) — reimplemented, not
translated, against this engine's batch API."""

import collections

import numpy as np
import pytest

from hksketch.sketch.base import (
    BuilderError,
    IncompatibleSketchError,
    decay_threshold,
    precompute_decay_thresholds,
    U64_MAX,
)
from hksketch.sketch.bucketed import BucketedTopK
from hksketch.sketch.cuckoo import CuckooTopK
from hksketch.sketch.topk import TopK

VARIANTS = [TopK, BucketedTopK, CuckooTopK]


@pytest.mark.parametrize("cls", VARIANTS)
def test_builder_validation(cls):
    with pytest.raises(BuilderError):
        cls(0, 8, 2, 0.9)
    with pytest.raises(BuilderError):
        cls(5, 0, 2, 0.9)
    with pytest.raises(BuilderError):
        cls(5, 8, 0, 0.9)
    with pytest.raises(BuilderError):
        cls(5, 8, 2, float("nan"))
    with pytest.raises(BuilderError):
        cls(5, 8, 2, 1.5)
    with pytest.raises(BuilderError):
        cls(5, 8, 2, -0.1)


def test_cuckoo_max_kicks_validation():
    with pytest.raises(BuilderError):
        CuckooTopK(5, 8, 2, 0.9, max_kicks=0)
    assert CuckooTopK(5, 8, 2, 0.9, max_kicks=3).max_kicks == 3


@pytest.mark.parametrize("cls", VARIANTS)
def test_contains_and_count(cls):
    tk = cls(10, 256, 4, 0.9)
    tk.add("lashin", 1)
    tk.add("lashin", 2)
    assert tk.contains("lashin")
    assert tk.contains_top_k("lashin")
    assert tk.count("lashin") == 3
    assert not tk.contains("absent")
    assert tk.count("absent") == 0


@pytest.mark.parametrize("cls", VARIANTS)
def test_zero_increment_is_noop(cls):
    tk = cls(5, 64, 2, 0.9)
    tk.add("a", 0)
    assert tk.list() == []
    assert not tk.contains("a")


@pytest.mark.parametrize("cls", VARIANTS)
def test_varied_frequencies_top10(cls):
    # reference tolerance: at least 8 of the true top 10 present
    # (src/heavykeeper.rs:901-964)
    rng = np.random.default_rng(0xACC)
    keys = rng.zipf(1.5, size=100_000)
    keys = keys[keys < 50_000]
    truth = collections.Counter(keys.tolist())
    tk = cls(10, 1024, 4, 0.9, seed=7)
    for chunk in np.array_split(keys, 10):
        tk.add_batch(chunk)
    reported = {k for k, _ in tk.list()}
    true10 = {k for k, _ in truth.most_common(10)}
    assert len(reported & true10) >= 8


@pytest.mark.parametrize("cls", VARIANTS)
def test_identical_frequencies_keep_exactly_k(cls):
    # (src/heavykeeper.rs:1050-1082)
    tk = cls(5, 4096, 4, 0.9)
    items = [f"item{i}" for i in range(50)]
    tk.add_batch(items * 7)
    out = tk.list()
    assert len(out) == 5
    assert all(c == 7 for _, c in out)


@pytest.mark.parametrize("cls", [TopK, BucketedTopK])
def test_forced_decay_overwrite(cls):
    # decay=1.0 → every roll fires (threshold saturates at u64::MAX), the
    # analogue of the reference's forced-decay test that sets all
    # thresholds to u64::MAX (src/heavykeeper.rs:766-794).
    tk = cls(2, 1, 1, 1.0, seed=3)
    tk.add("old", 5)
    tk.add("new", 100)
    counts = dict(tk.list())
    assert counts["new"] == 96  # 5 decays then takeover with remaining
    assert tk.bucket_count("old") == 0 if hasattr(tk, "bucket_count") else True


@pytest.mark.parametrize("cls", [TopK, BucketedTopK])
def test_decay_zero_no_pollution(cls):
    # decay=0.0 → occupants never decay (src/bucketed.rs:1117-1136)
    tk = cls(2, 1, 1, 0.0, seed=3)
    tk.add("x", 5)
    tk.add("y", 100)
    assert tk.count("x") == 5
    assert tk.count("y") == 0


def test_saturating_counts_bucketed():
    # (src/bucketed.rs:1076-1083)
    tk = BucketedTopK(2, 8, 2, 0.9)
    tk.add("a", U64_MAX - 1)
    tk.add("a", 10)
    assert tk.count("a") == U64_MAX


def test_decay_threshold_table_and_extrapolation():
    # (src/heavykeeper.rs:1458-1522)
    tbl = precompute_decay_thresholds(0.9)
    assert len(tbl) == 1024
    assert tbl[0] == U64_MAX  # decay^0 = 1 → saturated
    # monotone nonincreasing
    assert all(int(tbl[i]) >= int(tbl[i + 1]) for i in range(1023))
    # extrapolation beyond the table continues decreasing
    t_1023 = decay_threshold(tbl, 1023)
    t_2000 = decay_threshold(tbl, 2000)
    t_huge = decay_threshold(tbl, 10**12)
    assert t_1023 >= t_2000 >= t_huge >= 0
    # decay=1.0 → threshold saturates everywhere, even extrapolated
    ones = precompute_decay_thresholds(1.0)
    assert decay_threshold(ones, 5_000_000) == U64_MAX
    # decay=0 → zero beyond count 0
    zeros = precompute_decay_thresholds(0.0)
    assert zeros[0] == U64_MAX and zeros[1] == 0
    assert decay_threshold(zeros, 999999) == 0


@pytest.mark.parametrize("cls", VARIANTS)
def test_seed_determinism(cls):
    # same seed ⇒ identical results across instances (src/cuckoo.rs:1040-1057)
    rng = np.random.default_rng(11)
    keys = rng.zipf(1.3, size=50_000)
    a = cls(20, 256, 4, 0.9, seed=99)
    b = cls(20, 256, 4, 0.9, seed=99)
    for chunk in np.array_split(keys, 5):
        a.add_batch(chunk)
        b.add_batch(chunk)
    assert a.list() == b.list()
    assert a.state_equal(b)


@pytest.mark.parametrize("cls", VARIANTS)
def test_merge_basic_disjoint(cls):
    a = cls(10, 1024, 4, 0.9, seed=1)
    b = cls(10, 1024, 4, 0.9, seed=1)
    a.add_batch(["x"] * 5 + ["y"] * 3)
    b.add_batch(["z"] * 7)
    a.merge(b)
    assert dict(a.list()) == {"x": 5, "y": 3, "z": 7}


@pytest.mark.parametrize("cls", VARIANTS)
def test_merge_overlapping_sums(cls):
    a = cls(10, 1024, 4, 0.9, seed=1)
    b = cls(10, 1024, 4, 0.9, seed=1)
    a.add_batch(["x"] * 5)
    b.add_batch(["x"] * 2 + ["z"] * 7)
    a.merge(b)
    assert dict(a.list()) == {"x": 7, "z": 7}


@pytest.mark.parametrize("cls", VARIANTS)
def test_merge_incompatible_params(cls):
    base = cls(10, 64, 2, 0.9, seed=1)
    for other in [
        cls(10, 32, 2, 0.9, seed=1),
        cls(10, 64, 3, 0.9, seed=1),
        cls(10, 64, 2, 0.8, seed=1),
        cls(9, 64, 2, 0.9, seed=1),
        cls(10, 64, 2, 0.9, seed=2),  # hasher probe (src/bucketed.rs:1003-1042)
    ]:
        with pytest.raises(IncompatibleSketchError):
            base.merge(other)


@pytest.mark.parametrize("cls", VARIANTS)
def test_merge_three_way_associativity(cls):
    # north rule: merge(A, merge(B, C)) == merge(merge(A, B), C) on
    # identical-seed sketches over disjoint streams (SURVEY.md §5 adopted)
    rng = np.random.default_rng(3)
    parts = [
        (rng.zipf(1.3, 60_000) % 20_000 + off * 20_000).astype(np.int64)
        for off in range(3)
    ]
    blobs = []
    for p in parts:
        t = cls(100, 2048, 4, 0.9, seed=5)
        t.add_batch(p)
        blobs.append(t.to_bytes())
    f = cls.from_bytes
    left = f(blobs[0])
    left.merge(f(blobs[1]).merge(f(blobs[2])))
    right = f(blobs[0]).merge(f(blobs[1]))
    right.merge(f(blobs[2]))
    assert left.list() == right.list()


def test_bucketed_merge_pq_reflects_summed_counts():
    # pre-merge-snapshot rule (src/bucketed.rs:973-1000): an item tracked in
    # only one PQ picks up the OTHER side's pre-merge bucket count.
    a = BucketedTopK(1, 1024, 4, 0.9, seed=1)
    b = BucketedTopK(1, 1024, 4, 0.9, seed=1)
    a.add_batch(["hot"] * 10 + ["warm"] * 4)  # k=1 → PQ tracks "hot" only
    b.add_batch(["warm"] * 9)  # PQ tracks "warm"
    a.merge(b)
    # "warm" merged count must include a's pre-merge bucket reading (4)
    assert a.count("warm") == 13
    assert a.count("hot") == 10


@pytest.mark.parametrize("cls", VARIANTS)
def test_serde_roundtrip_and_continue(cls):
    rng = np.random.default_rng(5)
    keys = rng.zipf(1.4, size=20_000)
    a = cls(10, 512, 4, 0.9, seed=2)
    a.add_batch(keys)
    blob = a.to_bytes()
    b = cls.from_bytes(blob)
    assert b.state_equal(a)
    assert b.list() == a.list()
    # continuing after deserialization matches continuing the original
    more = rng.zipf(1.4, size=5_000)
    a.add_batch(more)
    b.add_batch(more)
    assert a.list() == b.list()


@pytest.mark.parametrize("cls", VARIANTS)
def test_mem_bytes_positive_and_grows(cls):
    small = cls(5, 64, 2, 0.9)
    big = cls(5, 4096, 4, 0.9)
    assert 0 < small.mem_bytes() < big.mem_bytes()


@pytest.mark.parametrize("cls", VARIANTS)
def test_eviction_reporting_contract(cls):
    # (evicted, newly_tracked) semantics (src/heavykeeper.rs:1524-1562):
    # into free space → (None, True); update of tracked → (None, False);
    # displacing the min → (evicted_item, True); too low → (None, False).
    tk = cls(2, 1024, 4, 0.9, seed=5)
    assert tk.add_with_evicted("a", 1) == (None, True)
    assert tk.add_with_evicted("a", 2) == (None, False)  # tracked update
    assert tk.add_with_evicted("b", 5) == (None, True)
    assert tk.add_with_evicted("c", 9) == ("a", True)  # evicts min ("a":3)
    assert tk.add_with_evicted("d", 1) == (None, False)  # too low to track
    assert tk.add_with_evicted("z", 0) == (None, False)  # zero increment


@pytest.mark.parametrize("cls", VARIANTS)
def test_builder_fluent_and_missing_fields(cls):
    t = cls.builder().k(3).width(64).depth(2).decay(0.9).seed(7).build()
    assert (t.k, t.width, t.depth, t.decay, t.seed) == (3, 64, 2, 0.9, 7)
    with pytest.raises(BuilderError, match="missing"):
        cls.builder().k(3).width(64).build()
    with pytest.raises(AttributeError):
        cls.builder().bogus_field(1)


def test_binary_keys_end_to_end():
    # non-UTF8 binary keys (FIXTURES.md F4 concern)
    tk = BucketedTopK(5, 256, 4, 0.9)
    flows = [bytes([i, 255, 0, 128] * 3 + [6]) for i in range(20)]
    tk.add_batch(flows * 3 + flows[:2] * 10)
    top = tk.list()
    assert top[0][0] in (flows[0], flows[1])
    assert isinstance(top[0][0], bytes)
    assert tk.count(flows[0]) == 13
