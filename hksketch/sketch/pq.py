"""Bounded top-k register (min-heap of capacity k) with deterministic ties.

Mirrors the semantics of the reference's ``TopKQueue``
(`/root/reference/src/priority_queue.rs:8-276`):

- capacity-k min-heap + map for O(1) membership/count lookups;
- ``upsert(item, count)``: update-in-place if tracked; insert if room;
  else replace the current minimum iff ``count > min_count`` (returning the
  evicted item);
- ``update_if_present``: monotonic raise-only update (paper Alg. 1 heap rule);
- iteration order: count descending, then *insertion sequence ascending* —
  the deterministic tie-break is part of the observable output order
  (`/root/reference/src/priority_queue.rs:191-211`).

Implementation detail (documented deviation): entries are keyed by the key's
64-bit fingerprint rather than by the key value itself; the original item is
carried alongside for output.  Two distinct keys sharing a fingerprint
(p ≈ 2^-64) would alias — exactly the aliasing the sketch's bucket arrays
already exhibit, so the observable contract is unchanged.
"""

from __future__ import annotations

import heapq
from typing import Any, Iterator


class TopKQueue:
    __slots__ = ("k", "_map", "_heap", "_seq")

    def __init__(self, k: int, seq: int = 0):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        # fp -> [count, seq, item]
        self._map: dict[int, list] = {}
        # lazy min-heap of (count, seq, fp); stale entries skipped on pop
        self._heap: list[tuple[int, int, int]] = []
        self._seq = int(seq)

    def __len__(self) -> int:
        return len(self._map)

    def is_full(self) -> bool:
        return len(self._map) >= self.k

    def get(self, fp: int) -> int | None:
        e = self._map.get(fp)
        return None if e is None else e[0]

    def get_item(self, fp: int) -> Any:
        e = self._map.get(fp)
        return None if e is None else e[2]

    def __contains__(self, fp: int) -> bool:
        return fp in self._map

    def _compact(self) -> None:
        h = self._heap
        while h:
            count, seq, fp = h[0]
            e = self._map.get(fp)
            if e is not None and e[0] == count and e[1] == seq:
                return
            heapq.heappop(h)

    def min_count(self) -> int:
        if not self._map:
            return 0
        self._compact()
        return self._heap[0][0]

    def min_entry(self) -> tuple[int, int, int]:
        self._compact()
        return self._heap[0]

    def update_if_present(self, fp: int, count: int) -> None:
        """Raise-only update for an already-tracked fingerprint."""
        e = self._map.get(fp)
        if e is None or count <= e[0]:
            return
        e[0] = count
        heapq.heappush(self._heap, (count, e[1], fp))

    def upsert(self, fp: int, item: Any, count: int) -> Any | None:
        """Insert/update; returns the evicted item when a replacement occurs.

        Semantics of /root/reference/src/priority_queue.rs:138-189: tracked →
        update in place; room → insert; full → replace current min iff
        ``count > min_count`` (ties keep the incumbent), else no-op.
        """
        e = self._map.get(fp)
        if e is not None:
            if count != e[0]:
                e[0] = count
                heapq.heappush(self._heap, (count, e[1], fp))
            return None
        if len(self._map) < self.k:
            seq = self._seq
            self._seq += 1
            self._map[fp] = [count, seq, item]
            heapq.heappush(self._heap, (count, seq, fp))
            return None
        self._compact()
        min_count, _, min_fp = self._heap[0]
        if count <= min_count:
            return None
        heapq.heappop(self._heap)
        evicted = self._map.pop(min_fp)[2]
        seq = self._seq
        self._seq += 1
        self._map[fp] = [count, seq, item]
        heapq.heappush(self._heap, (count, seq, fp))
        return evicted

    def iter_sorted(self) -> Iterator[tuple[Any, int]]:
        """(item, count) sorted count desc, insertion sequence asc."""
        for fp, (count, seq, item) in sorted(
            self._map.items(), key=lambda kv: (-kv[1][0], kv[1][1])
        ):
            yield item, count

    def entries(self) -> list[tuple[int, int, int, Any]]:
        """(fp, count, seq, item) in sorted output order (for serialization)."""
        return [
            (fp, e[0], e[1], e[2])
            for fp, e in sorted(self._map.items(), key=lambda kv: (-kv[1][0], kv[1][1]))
        ]

    @property
    def seq_counter(self) -> int:
        return self._seq

    def mem_bytes(self) -> int:
        import sys

        n = len(self._map)
        item_bytes = sum(sys.getsizeof(e[2]) for e in self._map.values())
        return n * (8 * 3 + 48) + len(self._heap) * 24 + item_bytes
