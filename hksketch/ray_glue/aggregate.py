"""Ray Data UDAFs: every sketch as a distributed aggregation.

The distribution strategy mirrors the reference's intended scale-out —
"shard streams → per-shard sketch → merge()" (SURVEY.md §3.3,
`/root/reference/src/heavykeeper.rs:1162-1186`) — expressed as Ray Data's
``AggregateFnV2`` contract:

- ``aggregate_block``: one vectorized ``add_batch`` over the block's key
  column → a partial sketch, serialized to bytes (partial sketches flow
  through shuffles as ordinary binary values);
- ``combine``: deserialize + ``merge`` (the reference's C11/B3/K4 semantics)
  — Ray arranges these into a tree reduce;
- ``finalize``: decode the final sketch into the query's output value.

For a GLOBAL sketch (``ds.aggregate(...)``) there is no shuffle at all: each
block produces a partial and Ray tree-combines them.  For per-group sketches
(``ds.groupby(col).aggregate(...)``) only serialized partials cross the
exchange; pre-aggregation for skewed group keys lives in
``hksketch.ray_glue.stages``.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

from ..sketch import (
    KLL,
    BloomFilter,
    BucketedTopK,
    CountMinSketch,
    CuckooTopK,
    HyperLogLog,
    ReservoirSample,
    TDigest,
    WeightedSample,
    TopK,
    sketch_from_bytes,
)

try:
    from ray.data.aggregate import AggregateFnV2
    from ray.data.block import BlockAccessor
except Exception:  # pragma: no cover - allows kernel use without ray
    AggregateFnV2 = object  # type: ignore

    class BlockAccessor:  # type: ignore
        pass


_KINDS = {
    "topk": TopK,
    "bucketed": BucketedTopK,
    "cuckoo": CuckooTopK,
    "hll": HyperLogLog,
    "countmin": CountMinSketch,
    "bloom": BloomFilter,
    "tdigest": TDigest,
    "kll": KLL,
    "reservoir": ReservoirSample,
    "wsample": WeightedSample,
}


def _resolve_kind(kind: str):
    """Built-in kinds first, then the user-extensible serde registry
    (``@register_sketch`` in hksketch.sketch.base) — a custom sketch class
    registered there works through every UDAF/stage in this module."""
    cls = _KINDS.get(kind)
    if cls is None:
        from ..sketch.base import _REGISTRY

        cls = _REGISTRY.get(kind)
    if cls is None:
        raise ValueError(f"unknown sketch kind {kind!r}; one of {sorted(_KINDS)}")
    return cls


def sketch_config(kind: str, **params: Any) -> dict:
    """Validated sketch config shipped to every worker (constructing once
    here surfaces parameter errors on the driver, not in remote tasks)."""
    _resolve_kind(kind)(**params)  # validate eagerly
    return {"kind": kind, "params": dict(params)}


def make_sketch(cfg: dict):
    return _resolve_kind(cfg["kind"])(**cfg["params"])


def _to_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return BlockAccessor.for_block(block).to_arrow()


class SketchAggregate(AggregateFnV2):
    """Generic sketch UDAF over a key (or value) column.

    AggType = serialized sketch bytes (None until first non-empty block).
    ``finalize`` returns the sketch blob; use the typed subclasses below for
    decoded outputs.
    """

    def __init__(
        self,
        cfg: dict,
        on: str,
        weight_col: Optional[str] = None,
        alias_name: Optional[str] = None,
    ):
        self._cfg = dict(cfg)
        self._weight_col = weight_col
        super().__init__(
            alias_name or f"{cfg['kind']}({on})",
            zero_factory=lambda: None,
            on=on,
            ignore_nulls=True,
        )

    def empty_blob(self) -> bytes:
        """Serialized sketch of the EMPTY stream — what an aggregation over
        zero rows means.  ``Dataset.aggregate`` returns None for an empty
        dataset; callers use :func:`aggregate_sketch` (or this directly)
        instead of subscripting that None."""
        return make_sketch(self._cfg).to_bytes()

    # -- AggregateFnV2 contract -----------------------------------------

    def aggregate_block(self, block) -> Optional[bytes]:
        t = _to_arrow(block)
        if t.num_rows == 0:
            return None
        sk = make_sketch(self._cfg)
        col = t.column(self.get_target_column()).combine_chunks()
        self._accumulate(sk, col, t)
        return sk.to_bytes()

    def _accumulate(self, sk, col: pa.Array, t: pa.Table) -> None:
        kind = self._cfg["kind"]
        if kind in ("tdigest", "kll"):
            vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
            sk.add_batch(vals)
        elif kind in ("hll", "bloom", "reservoir"):
            sk.add_batch(col)
        else:  # frequency sketches accept optional weights
            w = None
            if self._weight_col is not None:
                w = t.column(self._weight_col).to_numpy(zero_copy_only=False)
            sk.add_batch(col, w)

    def combine(self, current: Optional[bytes], new: Optional[bytes]) -> Optional[bytes]:
        if current is None:
            return new
        if new is None:
            return current
        a = sketch_from_bytes(current)
        a.merge(sketch_from_bytes(new))
        return a.to_bytes()

    def finalize(self, accumulator: Optional[bytes]):
        return accumulator


class TopKAggregate(SketchAggregate):
    """finalize → list of {item, count} structs, count desc (C10 ``list()``)."""

    def finalize(self, accumulator: Optional[bytes]):
        if accumulator is None:
            return []
        sk = sketch_from_bytes(accumulator)
        return [{"item": i, "count": c} for i, c in sk.list()]


class HLLCountAggregate(SketchAggregate):
    """finalize → approximate distinct count (int)."""

    def __init__(self, on: str, p: int = 14, seed: int = 12345, alias_name=None):
        super().__init__(
            sketch_config("hll", p=p, seed=seed), on, alias_name=alias_name
        )

    def finalize(self, accumulator: Optional[bytes]):
        if accumulator is None:
            return 0
        return int(round(sketch_from_bytes(accumulator).estimate()))


class CountMinAggregate(SketchAggregate):
    """finalize → serialized CMS blob (point queries via broadcast lookup)."""

    def __init__(self, on: str, width: int = 4096, depth: int = 4, seed: int = 12345,
                 weight_col=None, alias_name=None):
        super().__init__(
            sketch_config("countmin", width=width, depth=depth, seed=seed),
            on, weight_col=weight_col, alias_name=alias_name,
        )


class BloomAggregate(SketchAggregate):
    """finalize → serialized Bloom blob (membership via broadcast lookup)."""

    def __init__(self, on: str, m_bits: int, k: int = 7, seed: int = 12345, alias_name=None):
        super().__init__(
            sketch_config("bloom", m_bits=m_bits, k=k, seed=seed), on,
            alias_name=alias_name,
        )


class TDigestQuantileAggregate(SketchAggregate):
    """finalize → list of quantile estimates at the requested q's."""

    def __init__(self, on: str, qs=(0.5,), compression: float = 200.0, alias_name=None):
        self._qs = list(qs)
        super().__init__(
            sketch_config("tdigest", compression=compression), on,
            alias_name=alias_name,
        )

    def finalize(self, accumulator: Optional[bytes]):
        if accumulator is None:
            return [float("nan")] * len(self._qs)
        sk = sketch_from_bytes(accumulator)
        return [sk.quantile(q) for q in self._qs]


class KLLQuantileAggregate(SketchAggregate):
    """finalize → list of quantile estimates at the requested q's."""

    def __init__(self, on: str, qs=(0.5,), k: int = 200, seed: int = 12345, alias_name=None):
        self._qs = list(qs)
        super().__init__(sketch_config("kll", k=k, seed=seed), on, alias_name=alias_name)

    def finalize(self, accumulator: Optional[bytes]):
        if accumulator is None:
            return [float("nan")] * len(self._qs)
        sk = sketch_from_bytes(accumulator)
        return [sk.quantile(q) for q in self._qs]


def aggregate_sketch(ds, agg: "SketchAggregate") -> bytes:
    """``ds.aggregate(agg)`` with the empty-dataset base case handled: zero
    input rows yield the sketch of the empty stream, never None."""
    out = ds.aggregate(agg)
    blob = None if out is None else out[agg.name]
    return blob if blob is not None else agg.empty_blob()
