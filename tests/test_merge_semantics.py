"""Deep merge-semantics tests ported from the reference's in-module families
(SURVEY.md §5.1): slot-order-independent merge, merge-overflow min-eviction,
PQ-sum reflection, cuckoo promotion / two-candidate capacity / lobby-heavy
fold rules.  Reimplemented against this engine's API, not translated."""

import numpy as np
import pytest

from hksketch.sketch import BucketedTopK, CuckooTopK


def _fill_bucket(sk: BucketedTopK, items, counts):
    """Place items (which all map to distinct cells of possibly different
    buckets) by direct weighted adds."""
    for it, c in zip(items, counts):
        sk.add(it, c)


def test_bucketed_merge_slot_order_independent():
    # src/bucketed.rs:898-937 — the merged counts must not depend on the
    # order cells were claimed in each source sketch.
    items = [f"k{i}" for i in range(6)]
    a1 = BucketedTopK(8, 64, 4, 0.9, seed=1)
    a2 = BucketedTopK(8, 64, 4, 0.9, seed=1)
    for it in items:
        a1.add(it, 5)
    for it in reversed(items):
        a2.add(it, 5)
    b = BucketedTopK(8, 64, 4, 0.9, seed=1)
    for it in items[:3]:
        b.add(it, 7)
    m1 = BucketedTopK.from_bytes(a1.to_bytes()).merge(b)
    m2 = BucketedTopK.from_bytes(a2.to_bytes()).merge(b)
    for it in items:
        assert m1.count(it) == m2.count(it)


def test_bucketed_merge_overflow_min_eviction():
    # src/bucketed.rs:939-971 — incoming cell into a FULL bucket replaces
    # the min cell iff its count is higher.
    # width=1, depth=2 → one bucket with two cells.
    a = BucketedTopK(4, 1, 2, 0.0, seed=1)  # decay 0 → no decay interference
    a.add("x", 10)
    a.add("y", 2)  # bucket now full: x:10, y:2
    b = BucketedTopK(4, 1, 2, 0.0, seed=1)
    b.add("z", 5)  # incoming z:5 > min(y:2) → evicts y
    a.merge(b)
    assert a.bucket_count("x") == 10
    assert a.bucket_count("z") == 5
    assert a.bucket_count("y") == 0  # evicted from cells
    # and a lower incoming count would NOT evict
    c = BucketedTopK(4, 1, 2, 0.0, seed=1)
    c.add("w", 1)
    a.merge(c)
    assert a.bucket_count("w") == 0
    assert a.bucket_count("x") == 10 and a.bucket_count("z") == 5


def test_cuckoo_promotion_after_lobby_win():
    # src/cuckoo.rs:933-943 — an item is only listed once promoted to heavy
    sk = CuckooTopK(4, 16, 1, 0.9, seed=1)
    sk.add("hot", 3)
    assert sk.contains_top_k("hot")  # promoted into an empty heavy slot
    assert sk.count("hot") == 3


def test_cuckoo_two_candidate_capacity():
    # src/cuckoo.rs:945-969 — items colliding in the primary bucket can
    # re-home in the alternate, so a single bucket's depth is not the cap.
    sk = CuckooTopK(64, 8, 2, 0.9, seed=2)
    items = [f"f{i}" for i in range(30)]
    for it in items:
        sk.add(it, 10)
    kept = sum(1 for it in items if sk.count(it) == 10)
    # two-candidate placement fills far more than one bucket's depth (2);
    # equal counts never evict, so occupancy < all 16 slots is expected
    assert kept >= 12
    assert int((sk.heavy_cnt > 0).sum()) > sk.depth


def test_cuckoo_merge_folds_lobby_into_heavy():
    # src/cuckoo.rs:466-518 — heavy XOR lobby: when other's heavy cell
    # arrives and self holds the same fp in its lobby, the counts fold and
    # the lobby clears.
    from hksketch.hashing import hash_scalar

    a = CuckooTopK(4, 4, 1, 0.9, seed=3)
    b = CuckooTopK(4, 4, 1, 0.9, seed=3)
    # b: promote "k" to heavy (lobby → promote on first add)
    b.add("k", 5)
    assert b.contains_top_k("k")
    # a: place "k" directly in its primary LOBBY (the state an add leaves
    # when its candidate heavy slots are busy with heavier occupants)
    fp = hash_scalar("k", a.seed, a.hash_fn)
    primary, _ = a._bucket_pair(fp)
    a.lobby_fp[primary] = fp
    a.lobby_cnt[primary] = 3
    assert a.bucket_count("k") == 3
    a.merge(b)
    # heavy XOR lobby: counts folded into ONE heavy entry, lobby cleared
    assert a.count("k") == 8
    assert a.bucket_count("k") == 8
    assert int(a.lobby_cnt[primary]) == 0


def test_cuckoo_merge_lobby_vs_lobby_higher_wins():
    # src/cuckoo.rs:520-549 — lobby conflict: higher count wins, ties self.
    a = CuckooTopK(2, 1, 1, 0.0, seed=5)
    b = CuckooTopK(2, 1, 1, 0.0, seed=5)
    # width=1: every key shares the single bucket; depth=1 heavy slot
    a.add("h", 50)  # takes heavy
    a.add("l1", 3)  # lobby occupant of a
    b.add("h2", 60)  # heavy of b... same bucket: promote evicts? width=1 →
    # alternate == primary; h2 count 60 > h's 50 min → takeover chains
    # regardless, the lobby rule below is what we assert:
    b.add("l2", 7)
    a.merge(b)
    # l2 (7) beats l1 (3) for the single lobby cell unless folded to heavy
    assert a.bucket_count("l2") in (0, 7)
    if a.bucket_count("l2") == 7:
        assert a.bucket_count("l1") == 0


def test_bucketed_pq_not_dragged_down_by_decay():
    # paper Alg. 1 heap rule: PQ keeps max-ever count even after the cell
    # decays away (src/bucketed.rs:237-246 comment)
    sk = BucketedTopK(4, 1, 1, 1.0, seed=1)  # decay=1 → always decays
    sk.add("a", 10)
    assert sk.count("a") == 10
    sk.add("b", 100)  # decays a's cell to zero, takes over
    assert sk.count("a") == 10  # PQ retains max-ever for a
    assert sk.bucket_count("a") == 0
