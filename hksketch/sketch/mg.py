"""Misra-Gries frequent-items summary — deterministic, mergeable, bounded.

A counter-based heavy-hitter summary complementing the probabilistic
HeavyKeeper family (this engine's flagship): no RNG at all, a one-sided
UNDERestimate guarantee, and a published merge — the natural cross-check
sketch for the same top-k queries.

Published basis (no counterpart in the reference, which is HeavyKeeper
only — SURVEY §7.6 contract: non-reference sketches adopt the reference's
seeded-construction / param-checked-merge / serialization / error-bound-
test conventions):

- Misra & Gries, "Finding repeated elements", Sci. Comput. Program. 1982
  (the m-counter summary; error ≤ N/(m+1));
- Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
  PODS 2012, §3.1: two MG summaries merge by summing counters and
  subtracting the (m+1)-th largest of the combined counts — the result is
  again a valid MG summary and the N/(m+1) bound holds for the merged
  stream.  This is the UDAF combine step here.

Engine mapping: ``add_batch`` folds a batch's exact (fingerprint, weight)
counts into the summary with ONE vectorized groupby-sum + threshold
truncation — the batch's exact counts form a zero-error summary, so
batch-add IS the published merge, no per-event loop.  Guarantees tracked
explicitly: ``est(k) <= true(k) <= est(k) + subtracted`` and
``subtracted <= (N - sum(counts)) / (m + 1)``; when total distinct keys
<= m nothing is ever truncated and counts are EXACT (the regime the SQL
oracle checks).

Determinism: truncation drops exactly the keys whose combined count <=
the (m+1)-th largest — a threshold rule with no tie-break needed — so
results are reproducible on any partitioning for fixed (seed, data),
though (like HeavyKeeper merges) the surviving SET can depend on merge
grouping once truncation fires; the error bound is order-invariant.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..hashing import _as_arrow_array, hash_array, hash_scalar
from .base import (
    DEFAULT_SEED,
    MERGE_PROBE,
    U64_MAX,
    BuilderError,
    IncompatibleSketchError,
    collapse_batch,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)

U64 = np.uint64


@register_sketch("misra_gries")
class MisraGries:
    """m-counter Misra-Gries summary over a key column."""

    def __init__(self, m: int, seed: int = DEFAULT_SEED, hash_fn: str = "auto"):
        if not isinstance(m, (int, np.integer)) or m < 1:
            raise BuilderError(f"m must be >= 1, got {m!r}")
        from ..hashing import resolve_hash_fn

        self.m = int(m)
        self.seed = int(seed)
        self.hash_fn = resolve_hash_fn(hash_fn)
        self.fps = np.empty(0, dtype=np.uint64)
        self.counts = np.empty(0, dtype=np.uint64)
        self.items: dict[int, Any] = {}  # fp -> representative item
        self.n_total = 0  # total stream weight
        self.subtracted = 0  # cumulative truncation offset = error bound

    # -- hashing ---------------------------------------------------------

    def _hash(self, values: Any) -> np.ndarray:
        return hash_array(values, self.seed, self.hash_fn)

    # -- core ------------------------------------------------------------

    def add(self, item: Any, increment: int = 1) -> None:
        if increment == 0:
            return
        self.add_batch([item], np.array([increment], dtype=np.uint64))

    def add_batch(
        self, keys: Any, weights: Any | None = None, hashes: Any | None = None
    ) -> None:
        arr = _as_arrow_array(keys)
        if len(arr) == 0:
            return
        h = hashes if hashes is not None else self._hash(arr)
        uniq, first_idx, wsum = collapse_batch(h, weights)
        if len(uniq) == 0:
            return
        self.n_total += int(wsum.sum())
        survivors = self._fold(uniq, wsum)
        # record representative items only for batch fps that survived
        if len(survivors):
            need = survivors[~np.isin(survivors, np.fromiter(
                self.items.keys(), dtype=np.uint64, count=len(self.items)
            ))] if self.items else survivors
            if len(need):
                pos = np.searchsorted(uniq, need)
                hit = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == need)
                for fp, p in zip(need[hit], pos[hit]):
                    self.items[int(fp)] = arr[int(first_idx[p])].as_py()

    def _fold(self, fps2: np.ndarray, counts2: np.ndarray) -> np.ndarray:
        """Merge (fps2, counts2) — themselves a valid summary — into self
        (PODS'12 §3.1): groupby-sum, then subtract the (m+1)-th largest
        combined count and drop non-positives.  Returns the fps from fps2
        that survived (callers attach item values for those)."""
        allf = np.concatenate([self.fps, fps2])
        allc = np.concatenate([self.counts, counts2])
        uniq, inv = np.unique(allf, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.uint64)
        np.add.at(sums, inv, allc)
        # saturate on (absurd) u64 overflow: a group's sum below its own
        # largest single contribution means the add wrapped
        maxc = np.zeros(len(uniq), dtype=np.uint64)
        np.maximum.at(maxc, inv, allc)
        sums[sums < maxc] = U64(U64_MAX)
        if len(uniq) > self.m:
            t = np.partition(sums, len(sums) - self.m - 1)[len(sums) - self.m - 1]
            keep = sums > t
            uniq, sums = uniq[keep], sums[keep] - t
            self.subtracted += int(t)
        self.fps, self.counts = uniq, sums
        kept = set(uniq.tolist())
        self.items = {fp: v for fp, v in self.items.items() if fp in kept}
        keep2 = np.isin(fps2, uniq)
        return fps2[keep2]

    # -- queries ---------------------------------------------------------

    def count(self, item: Any) -> int:
        fp = hash_scalar(item, self.seed, self.hash_fn)
        i = np.searchsorted(self.fps, U64(fp))
        if i < len(self.fps) and int(self.fps[i]) == fp:
            return int(self.counts[i])
        return 0

    def count_batch(self, items: Any) -> np.ndarray:
        arr = _as_arrow_array(items)
        h = self._hash(arr)
        pos = np.searchsorted(self.fps, h)
        safe = np.minimum(pos, max(0, len(self.fps) - 1))
        out = np.zeros(len(h), dtype=np.uint64)
        if len(self.fps):
            hit = (pos < len(self.fps)) & (self.fps[safe] == h)
            out[hit] = self.counts[safe[hit]]
        return out

    def contains(self, item: Any) -> bool:
        return self.count(item) > 0

    def error_bound(self) -> int:
        """Cumulative truncation offset: ``true - est <= error_bound()``
        for every key; itself <= (n_total - sum(counts)) / (m + 1)."""
        return self.subtracted

    def list(self) -> list[tuple[Any, int]]:
        """(item, count) sorted count desc, then item asc (SQL-comparable
        deterministic tie order, like the HeavyKeeper variants' reports)."""
        order = np.lexsort((self.fps, ~self.counts))
        out = []
        for i in order:
            fp = int(self.fps[i])
            out.append((self.items.get(fp, fp), int(self.counts[i])))
        return out

    def to_table(self) -> pa.Table:
        pairs = self.list()
        return pa.table(
            {"item": pa.array([p[0] for p in pairs]),
             "count": pa.array([p[1] for p in pairs], type=pa.uint64())}
        )

    def mem_bytes(self) -> int:
        import sys

        return (
            self.fps.nbytes
            + self.counts.nbytes
            + sum(sys.getsizeof(v) for v in self.items.values())
        )

    def debug(self) -> str:
        lines = [f"MisraGries(m={self.m}, seed={self.seed}, "
                 f"n_total={self.n_total}, subtracted={self.subtracted})"]
        for item, count in self.list()[:50]:
            lines.append(f"  {item!r} -> {count}")
        return "\n".join(lines)

    # -- merge -----------------------------------------------------------

    def _check_compatible(self, other: "MisraGries") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError(
                f"cannot merge {type(other).__name__} into MisraGries"
            )
        if self.m != other.m:
            raise IncompatibleSketchError(f"incompatible m: {self.m} vs {other.m}")
        if hash_scalar(MERGE_PROBE, self.seed, self.hash_fn) != hash_scalar(
            MERGE_PROBE, other.seed, other.hash_fn
        ):
            raise IncompatibleSketchError("incompatible hasher (seed/backend)")

    def merge(self, other: "MisraGries") -> "MisraGries":
        """PODS'12 §3.1 merge; exact (plain counter sum) while combined
        distinct keys <= m, error bounds add when truncation fires."""
        self._check_compatible(other)
        self.n_total += other.n_total
        self.subtracted += other.subtracted
        self.items.update(
            {fp: v for fp, v in other.items.items() if fp not in self.items}
        )
        self._fold(other.fps, other.counts)
        return self

    # -- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        items_t = pa.table(
            {"fp": pa.array(
                np.fromiter(self.items.keys(), dtype=np.uint64,
                            count=len(self.items)),
                type=pa.uint64()),
             "item": pa.array(list(self.items.values()))}
        )
        return pack_sketch(
            {
                "kind": self.KIND,
                "m": self.m,
                "seed": self.seed,
                "hash_fn": self.hash_fn,
                "n_total": self.n_total,
                "subtracted": self.subtracted,
            },
            {"fps": self.fps, "counts": self.counts},
            {"items": items_t},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "MisraGries":
        self = cls(meta["m"], meta["seed"], meta.get("hash_fn", "auto"))
        self.fps = arrays["fps"].astype(np.uint64)
        self.counts = arrays["counts"].astype(np.uint64)
        t = tables["items"]
        self.items = dict(
            zip(
                # uint64 → Python int directly; an int64 detour would wrap
                # fingerprints >= 2**63 to negative keys
                t.column("fp").to_numpy(zero_copy_only=False).tolist(),
                t.column("item").to_pylist(),
            )
        )
        self.n_total = meta["n_total"]
        self.subtracted = meta["subtracted"]
        return self

    def state_equal(self, other: "MisraGries") -> bool:
        return (
            np.array_equal(self.fps, other.fps)
            and np.array_equal(self.counts, other.counts)
            and self.items == other.items
            and self.subtracted == other.subtracted
        )
