"""KLL — mergeable quantile sketch with compactors
(Karnin, Lang, Liberty, "Optimal quantile approximation in streams",
FOCS 2016; see also KLL± VLDB'21 in PAPERS.md).

Not in the reference repo (SURVEY.md §2.7); adopts its contracts (seeded
construction — the seed drives the odd/even compaction coin — param-checked
merge, serialization).  Level h items carry weight 2^h; capacity of level h
(among H levels) is ``max(2, ceil(k · (2/3)^(H−1−h)))``.

Rank error: ε ≈ O(1/k) with high probability; the tests assert a loose
empirical bound against an exact oracle.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .base import (
    DEFAULT_SEED,
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    rng_state_from_json,
    rng_state_to_json,
    unpack_sketch,
)

_C = 2.0 / 3.0


@register_sketch("kll")
class KLL:
    def __init__(self, k: int = 200, seed: int = DEFAULT_SEED):
        if not isinstance(k, (int, np.integer)) or k < 8:
            raise BuilderError(f"k must be >= 8, got {k!r}")
        self.k = int(k)
        self.seed = int(seed)
        self.rng = np.random.default_rng(seed)
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0

    def _capacity(self, h: int) -> int:
        H = len(self.compactors)
        return max(2, int(np.ceil(self.k * (_C ** (H - 1 - h)))))

    def add_batch(self, values: Any) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self.n += len(v)
        self._compact_all()

    def add(self, value: float) -> None:
        self.add_batch([value])

    def _compact_all(self) -> None:
        # sweep until stable (growing H lowers the capacity of low levels)
        changed = True
        while changed:
            changed = False
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) > self._capacity(h):
                    self._compact_level(h)
                    changed = True

    def _compact_level(self, h: int) -> None:
        items = np.sort(self.compactors[h], kind="stable")
        if len(items) < 2:
            return
        if len(items) % 2 == 1:  # odd: retain the unpaired max at this level
            keep = items[-1:]
            items = items[:-1]
        else:
            keep = np.empty(0, dtype=np.float64)
        offset = int(self.rng.integers(0, 2))  # seeded compaction coin
        promoted = items[offset::2]  # one of each pair, weight doubles
        if h + 1 >= len(self.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        self.compactors[h + 1] = np.concatenate([self.compactors[h + 1], promoted])
        self.compactors[h] = keep

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, c in enumerate(self.compactors):
            if len(c):
                vals.append(c)
                wts.append(np.full(len(c), 2**h, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target))
        return float(v[min(i, len(v) - 1)])

    def rank(self, x: float) -> float:
        """Estimated fraction of items ≤ x."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return 0.0
        i = int(np.searchsorted(v, x, side="right"))
        return float(w[:i].sum() / w.sum())

    def _check_compatible(self, other: "KLL") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.k != other.k:
            raise IncompatibleSketchError(f"incompatible k: {self.k} vs {other.k}")

    def merge(self, other: "KLL") -> "KLL":
        self._check_compatible(other)
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for h, c in enumerate(other.compactors):
            if len(c):
                self.compactors[h] = np.concatenate([self.compactors[h], c])
        self.n += other.n
        self._compact_all()
        return self

    def mem_bytes(self) -> int:
        return int(sum(c.nbytes for c in self.compactors))

    def to_bytes(self) -> bytes:
        flat = (
            np.concatenate([c for c in self.compactors])
            if any(len(c) for c in self.compactors)
            else np.empty(0, dtype=np.float64)
        )
        lens = np.array([len(c) for c in self.compactors], dtype=np.int64)
        return pack_sketch(
            {
                "kind": self.KIND,
                "k": self.k,
                "seed": self.seed,
                "n": self.n,
                "rng_state": rng_state_to_json(self.rng),
            },
            {"flat": flat, "lens": lens},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "KLL":
        self = cls(meta["k"], meta["seed"])
        lens = arrays["lens"]
        flat = arrays["flat"]
        self.compactors = []
        off = 0
        for L in lens:
            self.compactors.append(flat[off : off + int(L)].copy())
            off += int(L)
        if not self.compactors:
            self.compactors = [np.empty(0, dtype=np.float64)]
        self.n = meta["n"]
        if meta.get("rng_state"):
            rng_state_from_json(self.rng, meta["rng_state"])
        return self

    def state_equal(self, other: "KLL") -> bool:
        return len(self.compactors) == len(other.compactors) and all(
            np.array_equal(a, b) for a, b in zip(self.compactors, other.compactors)
        )
