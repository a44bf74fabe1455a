"""Bloom filter — mergeable set-membership sketch (Bloom 1970).

Not in the reference repo (SURVEY.md §2.7); adopts its contracts.  The k bit
positions derive from one hash per key via the same composition scheme as
HeavyKeeper rows (SURVEY.md §1.2).  Merge = bitwise OR (same m, k, seed).

False-positive rate ≈ (1 − e^{−kn/m})^k.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from ..hashing import _as_arrow_array, derive_row_hashes, hash_array, hash_scalar
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


@register_sketch("bloom")
class BloomFilter:
    def __init__(self, m_bits: int, k: int, seed: int = DEFAULT_SEED):
        if not isinstance(m_bits, (int, np.integer)) or m_bits < 8:
            raise BuilderError(f"m_bits must be >= 8, got {m_bits!r}")
        if not isinstance(k, (int, np.integer)) or k < 1:
            raise BuilderError(f"k must be >= 1, got {k!r}")
        self.m_bits = int(m_bits)
        self.k = int(k)
        self.seed = int(seed)
        self.bits = np.zeros((self.m_bits + 7) // 8, dtype=np.uint8)
        self.n_added = 0

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01, seed: int = DEFAULT_SEED):
        """Size for expected n items at target false-positive rate."""
        m = max(8, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
        k = max(1, int(round(m / max(n, 1) * math.log(2))))
        return cls(m, k, seed)

    def _positions(self, items: Any) -> np.ndarray:
        arr = _as_arrow_array(items)
        h = hash_array(arr, self.seed)
        rows = derive_row_hashes(h, self.k)  # (k, n)
        return (rows % U64(self.m_bits)).astype(np.int64)

    def add_batch(self, items: Any) -> None:
        if len(items) == 0:
            return
        pos = self._positions(items).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_added += (
            len(items) if not hasattr(items, "__len__") else len(items)
        )

    def add(self, item: Any) -> None:
        self.add_batch([item])

    def contains_batch(self, items: Any) -> np.ndarray:
        pos = self._positions(items)  # (k, n)
        got = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return got.all(axis=0)

    def contains(self, item: Any) -> bool:
        return bool(self.contains_batch([item])[0])

    def expected_fpr(self) -> float:
        frac_set = float(np.unpackbits(self.bits).sum()) / self.m_bits
        return frac_set**self.k

    def _check_compatible(self, other: "BloomFilter") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.m_bits != other.m_bits or self.k != other.k:
            raise IncompatibleSketchError(
                f"incompatible bloom dims: ({self.m_bits},{self.k}) vs ({other.m_bits},{other.k})"
            )
        if hash_scalar(MERGE_PROBE, self.seed) != hash_scalar(MERGE_PROBE, other.seed):
            raise IncompatibleSketchError("incompatible hasher (different seeds)")

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self._check_compatible(other)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def mem_bytes(self) -> int:
        return self.bits.nbytes

    def to_bytes(self) -> bytes:
        return pack_sketch(
            {
                "kind": self.KIND,
                "m_bits": self.m_bits,
                "k": self.k,
                "seed": self.seed,
                "n_added": self.n_added,
            },
            {"bits": self.bits},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "BloomFilter":
        self = cls(meta["m_bits"], meta["k"], meta["seed"])
        self.bits = arrays["bits"]
        self.n_added = meta["n_added"]
        return self

    def state_equal(self, other: "BloomFilter") -> bool:
        return np.array_equal(self.bits, other.bits)
