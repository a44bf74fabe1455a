"""AMS second-moment (F2) sketch — "tug-of-war" with bucketed rows.

From the published literature (Alon, Matias & Szegedy STOC'96; the bucketed
"fast-AMS" refinement of Thorup & Zhang SODA'04 / Charikar et al.'s count
sketch): depth independent rows, each hashing a key to one of ``width``
counters with a ±1 sign; a row estimates F2 = Σ f_k² as the sum of its
squared counters, and the sketch reports the MEDIAN over rows.  Relative
error ~ 1/sqrt(width) per row; the median over depth rows drives the
failure probability down exponentially.

Not in the reference repo (SURVEY.md §2.7); adopts the reference's sketch
contracts exactly like the CMS/HLL modules: seeded construction,
param-checked ELEMENTWISE-SUM merge (linear sketch → exactly mergeable and
associative), serialization, mem accounting.  Row hashes reuse the
reference's hash composition (`derive_row_hashes`); the sign is bit 63 of
the row hash, disjoint from the low bits `bucket_indices` consumes.

F2 (the "surprise number") measures stream skew: repeat-heavy corpora and
hot-key distributions show up as F2 >> N.  Weighted adds fold item weight
into the ±1 projection (F2 becomes Σ (Σ_k w)²).

The same state is the Charikar-Chen-Farach-Colton Count Sketch: read per
key instead of per row (``estimate_counts``) it gives UNBIASED point
frequencies with additive error sqrt(F2/width) — the signed counterpart
of count-min (which only over-estimates).  One linear sketch, two
published estimators.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..hashing import (
    _as_arrow_array,
    bucket_indices,
    derive_row_hashes,
    hash_array,
    hash_scalar,
)
from .base import (
    DEFAULT_SEED,
    MERGE_PROBE,
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)

U64 = np.uint64


@register_sketch("ams")
class AMSSketch:
    def __init__(self, width: int, depth: int = 5, seed: int = DEFAULT_SEED):
        if not isinstance(width, (int, np.integer)) or width < 1:
            raise BuilderError(f"width must be >= 1, got {width!r}")
        if not isinstance(depth, (int, np.integer)) or depth < 1:
            raise BuilderError(f"depth must be >= 1, got {depth!r}")
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed)
        self.cnt = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0  # stream mass (weight sum), for reporting

    def add_batch(self, items: Any, weights: Any | None = None) -> None:
        arr = _as_arrow_array(items)
        n = len(arr)
        if n == 0:
            return
        h = hash_array(arr, self.seed)
        if weights is None:
            w = np.ones(n, dtype=np.int64)
        else:
            from .base import validate_weights

            w = validate_weights(weights, n).astype(np.int64)
        rows = derive_row_hashes(h, self.depth)
        for r in range(self.depth):
            idx = bucket_indices(rows[r], self.width)
            sign = 1 - 2 * ((rows[r] >> U64(63)) & U64(1)).astype(np.int64)
            np.add.at(self.cnt[r], idx, sign * w)
        self.total += int(w.sum())

    def add(self, item: Any, increment: int = 1) -> None:
        self.add_batch([item], [increment])

    def estimate(self) -> float:
        """Median over rows of Σ counter² — the F2 estimate."""
        sq = (self.cnt.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(sq))

    def estimate_counts(self, items: Any) -> np.ndarray:
        """Count-Sketch point-frequency estimates (Charikar, Chen &
        Farach-Colton ICALP'02): the SAME ±1 state read the other way —
        per row ``sign(k) · counter[bucket(k)]``, median over rows.
        Unbiased per row; |error| ≤ sqrt(F2 / width) with constant
        probability per row, driven down exponentially by the median
        (the published Count-Sketch bound, asserted in tests).  Returns
        float64 (medians of even depth can fall between integers)."""
        arr = _as_arrow_array(items)
        n = len(arr)
        if n == 0:
            return np.empty(0, dtype=np.float64)
        h = hash_array(arr, self.seed)
        rows = derive_row_hashes(h, self.depth)
        est = np.empty((self.depth, n), dtype=np.float64)
        for r in range(self.depth):
            idx = bucket_indices(rows[r], self.width)
            sign = 1 - 2 * ((rows[r] >> U64(63)) & U64(1)).astype(np.int64)
            est[r] = sign * self.cnt[r, idx]
        return np.median(est, axis=0)

    def estimate_count(self, item: Any) -> float:
        return float(self.estimate_counts([item])[0])

    def _check_compatible(self, other: "AMSSketch") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.width != other.width or self.depth != other.depth:
            raise IncompatibleSketchError(
                f"incompatible dims: {(self.width, self.depth)} vs "
                f"{(other.width, other.depth)}"
            )
        if hash_scalar(MERGE_PROBE, self.seed) != hash_scalar(MERGE_PROBE, other.seed):
            raise IncompatibleSketchError("incompatible hasher (different seeds)")

    def merge(self, other: "AMSSketch") -> "AMSSketch":
        """Elementwise sum — AMS is a linear sketch, so merge is exact:
        sketch(A ⊎ B) == sketch(A) + sketch(B) state-identically."""
        self._check_compatible(other)
        self.cnt += other.cnt
        self.total += other.total
        return self

    def mem_bytes(self) -> int:
        return self.cnt.nbytes

    def to_bytes(self) -> bytes:
        return pack_sketch(
            {"kind": self.KIND, "width": self.width, "depth": self.depth,
             "seed": self.seed, "total": self.total},
            {"cnt": self.cnt.reshape(-1)},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "AMSSketch":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "AMSSketch":
        self = cls(meta["width"], meta["depth"], meta["seed"])
        self.cnt = (
            arrays["cnt"].astype(np.int64).reshape(self.depth, self.width)
        )
        self.total = meta["total"]
        return self

    def state_equal(self, other: "AMSSketch") -> bool:
        return (
            np.array_equal(self.cnt, other.cnt) and self.total == other.total
        )


def estimate_inner(a: "AMSSketch", b: "AMSSketch") -> float:
    """Inner-product (equi-join size) estimate from two compatible AMS
    sketches: Σ_k f_a(k)·f_b(k) ≈ median over rows of Σ_i cnt_a[r,i]·cnt_b[r,i]
    (Alon-Gibbons-Matias-Szegedy PODS'99 — the join-size estimation that
    lets a planner size a shuffle BEFORE paying for it).  Additive error
    ~ sqrt(F2(a)·F2(b)/width) per row, median over depth rows.
    """
    a._check_compatible(b)
    dots = (a.cnt.astype(np.float64) * b.cnt.astype(np.float64)).sum(axis=1)
    return float(np.median(dots))
