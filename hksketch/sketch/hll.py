"""HyperLogLog — mergeable distinct-count sketch (dense registers).

From the published literature (Flajolet et al. 2007; Heule et al. 2013
"HLL++" linear-counting threshold), NOT the reference repo — the reference
has no distinct-count sketch (SURVEY.md §2.7); this sketch adopts the
reference's HeavyKeeper contracts: seeded construction, param-checked
associative merge, serialization, mem accounting (SURVEY.md §7.6).

Standard error ≈ 1.04 / sqrt(m) with m = 2^p registers.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..hashing import _as_arrow_array, clz64, hash_array
from .base import (
    DEFAULT_SEED,
    MERGE_PROBE,
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)
from ..hashing import hash_scalar

U64 = np.uint64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


@register_sketch("hll")
class HyperLogLog:
    def __init__(self, p: int = 14, seed: int = DEFAULT_SEED):
        if not isinstance(p, (int, np.integer)) or not (4 <= p <= 18):
            raise BuilderError(f"precision p must be in [4, 18], got {p!r}")
        self.p = int(p)
        self.m = 1 << self.p
        self.seed = int(seed)
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_batch(self, items: Any) -> None:
        arr = _as_arrow_array(items)
        if len(arr) == 0:
            return
        h = hash_array(arr, self.seed)
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        w = h << U64(self.p)  # remaining 64-p bits, left-aligned
        rank = (clz64(w) + 1).clip(max=64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, item: Any) -> None:
        self.add_batch([item])

    def estimate(self) -> float:
        m = self.m
        reg = self.registers.astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-reg))
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                return float(m * np.log(m / zeros))  # linear counting
        return float(e)

    def __len__(self) -> int:
        return int(round(self.estimate()))

    def _check_compatible(self, other: "HyperLogLog") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.p != other.p:
            raise IncompatibleSketchError(f"incompatible p: {self.p} vs {other.p}")
        if hash_scalar(MERGE_PROBE, self.seed) != hash_scalar(MERGE_PROBE, other.seed):
            raise IncompatibleSketchError("incompatible hasher (different seeds)")

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._check_compatible(other)
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def mem_bytes(self) -> int:
        return self.registers.nbytes

    def to_bytes(self) -> bytes:
        return pack_sketch(
            {"kind": self.KIND, "p": self.p, "seed": self.seed},
            {"registers": self.registers},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "HyperLogLog":
        self = cls(meta["p"], meta["seed"])
        self.registers = arrays["registers"]
        return self

    def state_equal(self, other: "HyperLogLog") -> bool:
        return np.array_equal(self.registers, other.registers)
