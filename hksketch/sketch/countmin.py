"""Count-Min sketch — mergeable frequency sketch (Cormode & Muthukrishnan 2005).

Not in the reference repo (SURVEY.md §2.7); adopts the reference's contracts
(seeded, param-checked elementwise-sum merge, serialization).  Row indices
derive from ONE hash per key exactly like the HeavyKeeper hash composition
(SURVEY.md §1.2), so accumulation is one vectorized scatter-add per row.

Guarantee: with width w and depth d, est ≤ true + εN with ε = e/w at
probability ≥ 1 − e^−d.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..hashing import _as_arrow_array, bucket_indices, derive_row_hashes, hash_array, hash_scalar
from .base import (
    DEFAULT_SEED,
    MERGE_PROBE,
    U64_MAX,
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)

U64 = np.uint64


@register_sketch("countmin")
class CountMinSketch:
    def __init__(
        self,
        width: int,
        depth: int,
        seed: int = DEFAULT_SEED,
        conservative: bool = False,
    ):
        if not isinstance(width, (int, np.integer)) or width < 1:
            raise BuilderError(f"width must be >= 1, got {width!r}")
        if not isinstance(depth, (int, np.integer)) or depth < 1:
            raise BuilderError(f"depth must be >= 1, got {depth!r}")
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        # conservative update (Estan & Varga 2002): raise each counter only
        # to est+w — tighter overestimates; merge stays elementwise-sum
        # (the merged bound is then the plain-CMS bound, documented).
        self.conservative = bool(conservative)
        self.cnt = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.total = 0  # stream mass N (for error-bound reporting)

    def add_batch(self, items: Any, weights: Any | None = None) -> None:
        arr = _as_arrow_array(items)
        n = len(arr)
        if n == 0:
            return
        h = hash_array(arr, self.seed)
        if weights is None:
            w = np.ones(n, dtype=np.uint64)
        else:
            from .base import validate_weights

            w = validate_weights(weights, n).astype(np.uint64)
        rows = derive_row_hashes(h, self.depth)
        if not self.conservative:
            for r in range(self.depth):
                idx = bucket_indices(rows[r], self.width)
                np.add.at(self.cnt[r], idx, w)
            self.total += int(w.sum())
            return
        # conservative path: collapse duplicates so each key updates once
        # per batch, then raise counters only to (current_min + w)
        from .base import collapse_batch

        uniq, _first, wsum = collapse_batch(h, w)
        urows = derive_row_hashes(uniq, self.depth)
        idxs = [bucket_indices(urows[r], self.width) for r in range(self.depth)]
        est = np.full(len(uniq), np.iinfo(np.uint64).max, dtype=np.uint64)
        for r in range(self.depth):
            est = np.minimum(est, self.cnt[r, idxs[r]])
        target = est + wsum  # saturation beyond u64 not practically reachable
        for r in range(self.depth):
            np.maximum.at(self.cnt[r], idxs[r], target)
        self.total += int(w.sum())

    def add(self, item: Any, increment: int = 1) -> None:
        self.add_batch([item], np.array([increment], dtype=np.uint64))

    def count(self, item: Any) -> int:
        return int(self.count_batch([item])[0])

    def count_batch(self, items: Any) -> np.ndarray:
        """Vectorized point queries: min over rows."""
        arr = _as_arrow_array(items)
        h = hash_array(arr, self.seed)
        rows = derive_row_hashes(h, self.depth)
        est = np.full(len(arr), U64(U64_MAX))
        for r in range(self.depth):
            idx = bucket_indices(rows[r], self.width)
            est = np.minimum(est, self.cnt[r, idx])
        return est

    def _check_compatible(self, other: "CountMinSketch") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.width != other.width or self.depth != other.depth:
            raise IncompatibleSketchError(
                f"incompatible dims: {self.width}x{self.depth} vs {other.width}x{other.depth}"
            )
        if self.conservative != other.conservative:
            raise IncompatibleSketchError("incompatible update modes")
        if hash_scalar(MERGE_PROBE, self.seed) != hash_scalar(MERGE_PROBE, other.seed):
            raise IncompatibleSketchError("incompatible hasher (different seeds)")

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self._check_compatible(other)
        s = self.cnt + other.cnt
        self.cnt = np.where(s < self.cnt, U64(U64_MAX), s)
        self.total += other.total
        return self

    def mem_bytes(self) -> int:
        return self.cnt.nbytes

    def to_bytes(self) -> bytes:
        return pack_sketch(
            {
                "kind": self.KIND,
                "width": self.width,
                "depth": self.depth,
                "seed": self.seed,
                "conservative": self.conservative,
                "total": self.total,
            },
            {"cnt": self.cnt},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "CountMinSketch":
        self = cls(
            meta["width"], meta["depth"], meta["seed"],
            meta.get("conservative", False),
        )
        self.cnt = arrays["cnt"].reshape(self.depth, self.width)
        self.total = meta["total"]
        return self

    def state_equal(self, other: "CountMinSketch") -> bool:
        return np.array_equal(self.cnt, other.cnt) and self.total == other.total
