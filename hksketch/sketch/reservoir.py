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

    def estimate(self) -> float:
        """KMV distinct-count estimate (Bar-Yossef et al. RANDOM'02;
        Beyer et al. SIGMOD'07 unbiased form).  With fewer than ``k``
        distinct tags retained the sketch has seen every distinct value and
        the answer is exact; otherwise ``(k-1) / U_(k)`` where ``U_(k)`` is
        the k-th smallest tag normalized to (0, 1].  Deterministic (tags are
        keyed hashes) and merge-consistent: merged sketches give the same
        estimate as a single pass, which the grouped-UDAF path relies on."""
        if len(self.tags) < self.k:
            return float(len(self.tags))
        # +1 so a (theoretically possible) zero tag cannot divide by zero
        u_k = (float(self.tags[-1]) + 1.0) / 2.0 ** 64
        return (self.k - 1) / u_k

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


@register_sketch("wsample")
class WeightedSample:
    """Mergeable weighted sample without replacement (Efraimidis–Spirakis
    A-ES, Inf. Process. Lett. 97(5), 2006) with DETERMINISTIC keys.

    Each distinct value draws an Exp(weight)-distributed key
    ``-ln(u) / w`` where ``u ∈ (0, 1]`` comes from the keyed value hash —
    not a positional RNG — and the sample is the k SMALLEST keys.  P(value
    is rank-1) = w / Σw, the weighted-sampling analogue of the KMV design
    above, with the same properties: partition-invariant, reproducible,
    and exactly merge-associative (union → per-tag min-key dedup → min-k).

    Rows with null, zero, or negative weights are skipped (an Exp(w) draw
    needs w > 0; a zero-weight row can never be sampled anyway).  A value
    recurring with DIFFERENT weights keeps its smallest key — the
    deterministic equivalent of "best draw wins", so merge order cannot
    change the result.
    """

    def __init__(self, k: int, seed: int = DEFAULT_SEED):
        if not isinstance(k, (int, np.integer)) or k < 1:
            raise BuilderError(f"k must be >= 1, got {k!r}")
        self.k = int(k)
        self.seed = int(seed)
        self.tags = np.empty(0, dtype=np.uint64)
        self.keys = np.empty(0, dtype=np.float64)
        self.items: list[Any] = []
        self.n_seen = 0

    @staticmethod
    def _draw_keys(tags: np.ndarray, w: np.ndarray) -> np.ndarray:
        # u ∈ (0, 1]: top 53 hash bits + 1, scaled — never 0, so the log is
        # finite; u = 1 gives key exactly 0.0 (the best possible draw)
        u = ((tags >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0**-53
        return -np.log(u) / w

    def add_batch(self, values: Any, weights: Any = None) -> None:
        if weights is None:
            raise BuilderError("WeightedSample.add_batch requires weights")
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        arr = values if isinstance(values, pa.Array) else pa.array(list(values))
        w = np.asarray(weights, dtype=np.float64)
        if len(w) != len(arr):
            raise BuilderError(
                f"weights length {len(w)} != values length {len(arr)}"
            )
        self.n_seen += len(arr)
        ok = np.isfinite(w) & (w > 0)
        if arr.null_count:
            ok &= np.asarray(pa.compute.is_valid(arr))
        if not ok.any():
            return
        idx = np.flatnonzero(ok)
        arr = arr.take(pa.array(idx))
        tags = hash_array(arr, self.seed)
        keys = self._draw_keys(tags, w[idx])
        self._fold(tags, keys, arr.to_pylist())

    def _fold(self, tags: np.ndarray, keys: np.ndarray, vals: list) -> None:
        all_tags = np.concatenate([self.tags, tags])
        all_keys = np.concatenate([self.keys, keys])
        all_vals = self.items + list(vals)
        # per-tag MIN-key dedup (associative), then min-k by (key, tag) —
        # the tag tie-break keeps ordering total and deterministic
        order = np.lexsort((all_keys, all_tags))
        t, k_, = all_tags[order], all_keys[order]
        first = np.flatnonzero(np.concatenate(([True], t[1:] != t[:-1])))
        t, k_ = t[first], k_[first]
        vi = order[first]
        pick = np.lexsort((t, k_))[: self.k]
        self.tags = t[pick]
        self.keys = k_[pick]
        self.items = [all_vals[vi[i]] for i in pick]

    def sample(self) -> list:
        order = np.lexsort((self.tags, self.keys))
        return [self.items[i] for i in order]

    def _check_compatible(self, other: "WeightedSample") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError("cannot merge different sketch kinds")
        if self.k != other.k:
            raise IncompatibleSketchError(f"incompatible k: {self.k} vs {other.k}")
        if hash_scalar(MERGE_PROBE, self.seed) != hash_scalar(MERGE_PROBE, other.seed):
            raise IncompatibleSketchError(
                "incompatible seeds: deterministic-key samples require one "
                "shared seed so keys live in the same hash space"
            )

    def merge(self, other: "WeightedSample") -> "WeightedSample":
        self._check_compatible(other)
        self._fold(other.tags, other.keys, other.items)
        self.n_seen += other.n_seen
        return self

    def mem_bytes(self) -> int:
        import sys

        return (self.tags.nbytes + self.keys.nbytes
                + sum(sys.getsizeof(v) for v in self.items))

    def to_bytes(self) -> bytes:
        t = pa.table({"tag": pa.array(self.tags, type=pa.uint64()),
                      "key": pa.array(self.keys, type=pa.float64()),
                      "item": pa.array(self.items)})
        return pack_sketch(
            {"kind": self.KIND, "k": self.k, "seed": self.seed,
             "n_seen": self.n_seen},
            {},
            {"sample": t},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "WeightedSample":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "WeightedSample":
        self = cls(meta["k"], meta["seed"])
        t = tables["sample"]
        self.tags = t.column("tag").to_numpy(zero_copy_only=False).astype(np.uint64)
        self.keys = t.column("key").to_numpy(zero_copy_only=False).astype(np.float64)
        self.items = t.column("item").to_pylist()
        self.n_seen = meta["n_seen"]
        return self

    def state_equal(self, other: "WeightedSample") -> bool:
        return (
            np.array_equal(self.tags, other.tags)
            and np.array_equal(self.keys, other.keys)
            and self.items == other.items
            and self.n_seen == other.n_seen
        )


def estimate_overlap(a: "ReservoirSample", b: "ReservoirSample") -> dict:
    """θ-sketch-style set-overlap estimation from two compatible KMV
    sketches (Dasgupta et al., "Theta sketch framework", PODS'16 lineage):
    the union's bottom-k defines the sampling threshold θ; the fraction of
    those tags present in BOTH sketches estimates the Jaccard, and
    intersection = jaccard × union.  Unlike HLL inclusion-exclusion the
    error scales with the UNION (not the sum of set sizes), which is what
    makes it usable for small intersections of large sets.

    Exact when BOTH sketches are below their k (every tag retained, so
    the union and intersection tag sets are complete — even if the union
    exceeds k); the sampled (k-1)/U_(k) path only engages when at least
    one side actually truncated.
    Returns dict(est_a, est_b, est_union, est_inter, est_jaccard).
    """
    a._check_compatible(b)
    union_tags = np.unique(np.concatenate([a.tags, b.tags]))
    k = a.k
    both = np.intersect1d(a.tags, b.tags, assume_unique=True)
    if len(a.tags) < a.k and len(b.tags) < b.k:
        # exact regime: nothing was ever dropped on either side
        est_union = float(len(union_tags))
        inter = float(len(both))
        return {
            "est_a": float(len(a.tags)),
            "est_b": float(len(b.tags)),
            "est_union": est_union,
            "est_inter": inter,
            "est_jaccard": inter / max(len(union_tags), 1),
        }
    if len(union_tags) >= k:
        union_tags = union_tags[:k]
        u_k = (float(union_tags[-1]) + 1.0) / 2.0 ** 64
        est_union = (k - 1) / u_k
    else:
        est_union = float(len(union_tags))
    m = int(np.isin(union_tags, both, assume_unique=True).sum())
    jac = m / max(len(union_tags), 1)
    return {
        "est_a": a.estimate(),
        "est_b": b.estimate(),
        "est_union": est_union,
        "est_inter": jac * est_union,
        "est_jaccard": jac,
    }


def estimate_anotb(a: "ReservoirSample", b: "ReservoirSample") -> dict:
    """θ-sketch A-NOT-B (set difference |A ∖ B|) from two compatible KMV
    sketches — the third classical sketch set operation next to union and
    intersection (Dasgupta et al., PODS'16 theta framework; the Apache
    DataSketches ``AnotB`` operator).

    Rule: let θ be the SMALLER of the two sketches' sampling thresholds
    (θ_x = 1 if sketch x never truncated, else its normalized k-th-smallest
    tag, the same normalization as ``estimate``).  Below θ both sketches
    retain EVERY distinct tag they saw, so membership of A's sub-θ tags in
    B is known exactly; the retained count of A-tags < θ absent from B,
    scaled by 1/θ, is the unbiased difference estimate.

    Exact when NEITHER side truncated (θ = 1: plain set difference of the
    complete tag sets) — the regime the oracle-gated query relies on;
    ``exact`` in the returned dict says which regime fired.  Returns
    dict(est_anotb, retained, theta, exact).
    """
    a._check_compatible(b)
    a_trunc = len(a.tags) >= a.k
    b_trunc = len(b.tags) >= b.k
    if not a_trunc and not b_trunc:
        only_a = np.setdiff1d(a.tags, b.tags, assume_unique=True)
        return {
            "est_anotb": float(len(only_a)),
            "retained": int(len(only_a)),
            "theta": 1.0,
            "exact": True,
        }
    # integer threshold: the k-th smallest tag of each truncated side;
    # tags are sorted ascending, so tags[-1] is the k-th smallest retained
    thr = min(
        (int(s.tags[-1]) for s, t in ((a, a_trunc), (b, b_trunc)) if t),
    )
    theta = (float(thr) + 1.0) / 2.0 ** 64  # same normalization as estimate()
    sub_a = a.tags[a.tags < np.uint64(thr)]
    only_a = np.setdiff1d(sub_a, b.tags, assume_unique=True)
    return {
        "est_anotb": float(len(only_a)) / theta,
        "retained": int(len(only_a)),
        "theta": theta,
        "exact": False,
    }
