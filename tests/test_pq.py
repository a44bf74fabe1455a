"""TopKQueue semantics (mirrors /root/reference/src/priority_queue.rs:278-429)."""

from hksketch.sketch.pq import TopKQueue


def test_insert_and_get():
    q = TopKQueue(3)
    q.upsert(1, "a", 10)
    assert q.get(1) == 10
    assert q.get_item(1) == "a"
    assert 1 in q and 2 not in q
    assert len(q) == 1 and not q.is_full()


def test_sorted_iteration_count_desc():
    q = TopKQueue(5)
    for fp, item, c in [(1, "a", 5), (2, "b", 9), (3, "c", 7)]:
        q.upsert(fp, item, c)
    assert list(q.iter_sorted()) == [("b", 9), ("c", 7), ("a", 5)]


def test_tie_break_by_insertion_order():
    # equal counts → earlier-inserted first (src/priority_queue.rs:327-337)
    q = TopKQueue(5)
    for fp, item in [(10, "x"), (11, "y"), (12, "z")]:
        q.upsert(fp, item, 4)
    assert list(q.iter_sorted()) == [("x", 4), ("y", 4), ("z", 4)]


def test_capacity_overflow_replaces_min():
    q = TopKQueue(2)
    q.upsert(1, "a", 1)
    q.upsert(2, "b", 2)
    evicted = q.upsert(3, "c", 3)  # replaces min ("a")
    assert evicted == "a"
    assert sorted(q.iter_sorted()) == [("b", 2), ("c", 3)]


def test_overflow_tie_keeps_incumbent():
    q = TopKQueue(2)
    q.upsert(1, "a", 5)
    q.upsert(2, "b", 7)
    assert q.upsert(3, "c", 5) is None  # equal to min → rejected
    assert q.get(3) is None


def test_update_in_place_and_raise_only():
    q = TopKQueue(2)
    q.upsert(1, "a", 5)
    q.update_if_present(1, 9)
    assert q.get(1) == 9
    q.update_if_present(1, 3)  # raise-only: no decrease
    assert q.get(1) == 9
    q.update_if_present(99, 100)  # absent → no-op
    assert q.get(99) is None


def test_min_count_tracks_heap():
    q = TopKQueue(3)
    assert q.min_count() == 0
    q.upsert(1, "a", 4)
    q.upsert(2, "b", 2)
    q.upsert(3, "c", 6)
    assert q.min_count() == 2
    q.upsert(4, "d", 5)  # evicts b
    assert q.min_count() == 4
