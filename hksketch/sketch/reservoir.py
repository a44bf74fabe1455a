"""Mergeable uniform sample via keyed-hash bottom-k (KMV design).

Every row's tag is a keyed hash of its VALUE (``hash_array(values, seed)``),
and the sample is the k rows with the smallest tags.  Because the tag is a
function of the value — not a positional RNG draw — the design is:

- **uniform**: tags are i.i.d. uniform over distinct values regardless of
  how the stream is split into blocks (a per-block RNG would draw the same
  tag sequence in every block, biasing the merged sample toward fixed
  within-block offsets);
- **deterministic**: the same input and seed give the same sample on any
  partitioning, so distributed runs are reproducible and testable;
- **exactly merge-associative** with ONE shared seed: union → min-k, the
  same trade the reference's generator makes when it reservoir-samples its
  synthetic traces (`/root/reference/data/generate.py:30-34`).

Duplicate values share a tag, so this samples *distinct keys* (the KMV /
bottom-k sketch of Bar-Yossef et al.); for unique-id streams it is exactly
a uniform row sample.  Merging requires equal seeds (checked with the same
hash-probe rule as the counting sketches).

Contracts match the sketch family: seeded construction, param-checked
merge, serialization, ``mem_bytes``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..hashing import hash_array, hash_scalar
from .base import (
    DEFAULT_SEED,
    MERGE_PROBE,
    BuilderError,
    IncompatibleSketchError,
    pack_sketch,
    register_sketch,
    unpack_sketch,
)


@register_sketch("reservoir")
class ReservoirSample:
    """Mergeable bottom-k sample of DISTINCT VALUES (KMV), not of rows.

    .. warning::
       Duplicate values collapse to one tag: on a non-unique column this
       samples the distinct-value set, NOT a uniform row sample — a row
       appearing 1000× is exactly as likely to be in the sample as one
       appearing once.  It is a uniform ROW sample only for unique-id
       columns (every current caller).  ``DistinctValueSample`` is the
       honest alias; prefer it in new code.
    """

    def __init__(self, k: int, seed: int = DEFAULT_SEED):
        if not isinstance(k, (int, np.integer)) or k < 1:
            raise BuilderError(f"k must be >= 1, got {k!r}")
        self.k = int(k)
        self.seed = int(seed)
        self.tags = np.empty(0, dtype=np.uint64)
        self.items: list[Any] = []
        self.n_seen = 0

    def add_batch(self, values: Any) -> None:
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        arr = values if isinstance(values, pa.Array) else pa.array(list(values))
        n = len(arr)
        if n == 0:
            return
        self.n_seen += n
        tags = hash_array(arr, self.seed)
        # dedup first (duplicate values share a tag; first occurrence wins),
        # THEN keep the k smallest — np.unique returns tags sorted ascending
        uniq, first = np.unique(tags, return_index=True)
        if len(uniq) > self.k:
            uniq, first = uniq[: self.k], first[: self.k]
        vals = arr.take(pa.array(first)).to_pylist()
        self._fold(uniq, vals)

    def _fold(self, tags: np.ndarray, vals: list) -> None:
        all_tags = np.concatenate([self.tags, tags])
        all_vals = self.items + list(vals)
        # dedup by tag (duplicate values hash identically; first occurrence
        # wins deterministically) then keep the k smallest
        uniq, first = np.unique(all_tags, return_index=True)
        if len(uniq) > self.k:
            uniq, first = uniq[: self.k], first[: self.k]
        self.tags = uniq
        self.items = [all_vals[i] for i in first]

    def sample(self) -> list:
        return list(self.items)

    def _check_compatible(self, other: "ReservoirSample") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.k != other.k:
            raise IncompatibleSketchError(f"incompatible k: {self.k} vs {other.k}")
        if hash_scalar(MERGE_PROBE, self.seed) != hash_scalar(MERGE_PROBE, other.seed):
            raise IncompatibleSketchError(
                "incompatible seeds: keyed-hash bottom-k merges require one "
                "shared seed so tags live in the same hash space"
            )

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
        return self

    def state_equal(self, other: "ReservoirSample") -> bool:
        return (
            np.array_equal(self.tags, other.tags)
            and self.items == other.items
            and self.n_seen == other.n_seen
        )


# the semantically honest name: this class samples distinct VALUES (KMV),
# not rows — see the class docstring warning
DistinctValueSample = ReservoirSample
