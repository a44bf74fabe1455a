"""Mergeable uniform row sample (bottom-k / order-sample design).

Each incoming row draws a uniform 64-bit tag from the sketch's seeded RNG;
the sample is the k rows with the SMALLEST tags.  Keeping min-k tags makes
the merge exactly associative and commutative (union → min-k), unlike the
classic single-stream reservoir (Vitter's Algorithm R) whose merge is only
distributional — the same trade the reference's generator makes when it
reservoir-samples its synthetic traces (`/root/reference/data/generate.py:30-34`).

Contracts match the sketch family: seeded construction, param-checked
merge, serialization, ``mem_bytes``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

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


@register_sketch("reservoir")
class ReservoirSample:
    def __init__(self, k: int, seed: int = DEFAULT_SEED):
        if not isinstance(k, (int, np.integer)) or k < 1:
            raise BuilderError(f"k must be >= 1, got {k!r}")
        self.k = int(k)
        self.seed = int(seed)
        self.rng = np.random.default_rng(seed)
        self.tags = np.empty(0, dtype=np.uint64)
        self.items: list[Any] = []
        self.n_seen = 0

    def add_batch(self, values: Any) -> None:
        vals = values.to_pylist() if isinstance(values, (pa.Array, pa.ChunkedArray)) else list(values)
        n = len(vals)
        if n == 0:
            return
        self.n_seen += n
        tags = self.rng.integers(0, 2**63, size=n, dtype=np.uint64)
        if n > self.k * 4:  # prune before materializing python objects
            keep = np.argpartition(tags, self.k)[: self.k]
            keep = keep[np.argsort(tags[keep], kind="stable")]
            tags = tags[keep]
            vals = [vals[i] for i in keep]
        self._fold(tags, vals)

    def _fold(self, tags: np.ndarray, vals: list) -> None:
        all_tags = np.concatenate([self.tags, tags])
        all_vals = self.items + list(vals)
        if len(all_tags) > self.k:
            keep = np.argpartition(all_tags, self.k)[: self.k]
        else:
            keep = np.arange(len(all_tags))
        keep = keep[np.argsort(all_tags[keep], kind="stable")]
        self.tags = all_tags[keep]
        self.items = [all_vals[i] for i in keep]

    def sample(self) -> list:
        return list(self.items)

    def _check_compatible(self, other: "ReservoirSample") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.k != other.k:
            raise IncompatibleSketchError(f"incompatible k: {self.k} vs {other.k}")

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        """Union → keep min-k tags: exactly associative and commutative."""
        self._check_compatible(other)
        self._fold(other.tags, other.items)
        self.n_seen += other.n_seen
        return self

    def mem_bytes(self) -> int:
        import sys

        return self.tags.nbytes + sum(sys.getsizeof(v) for v in self.items)

    def to_bytes(self) -> bytes:
        t = pa.table({"tag": pa.array(self.tags, type=pa.uint64()),
                      "item": pa.array(self.items)})
        return pack_sketch(
            {
                "kind": self.KIND,
                "k": self.k,
                "seed": self.seed,
                "n_seen": self.n_seen,
                "rng_state": rng_state_to_json(self.rng),
            },
            {},
            {"sample": t},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ReservoirSample":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "ReservoirSample":
        self = cls(meta["k"], meta["seed"])
        t = tables["sample"]
        self.tags = t.column("tag").to_numpy(zero_copy_only=False).astype(np.uint64)
        self.items = t.column("item").to_pylist()
        self.n_seen = meta["n_seen"]
        if meta.get("rng_state"):
            rng_state_from_json(self.rng, meta["rng_state"])
        return self

    def state_equal(self, other: "ReservoirSample") -> bool:
        return (
            np.array_equal(self.tags, other.tags)
            and self.items == other.items
            and self.n_seen == other.n_seen
        )
