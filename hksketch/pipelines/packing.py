"""Sequence packing for training-data preparation: assign documents to
fixed-token-budget packs.

The pretraining-loader question ("concatenate the corpus and cut it into
budget-sized sequences — which pack does each document land in?") expressed
Ray-Data-first:

- docs are hash-sharded by id (ONE shuffle, same fold as
  ``sessions.sessionize``); within a shard they are ordered canonically by
  id, so the layout is a pure function of (ids, token counts, shards) —
  deterministic under any block structure, any read order, and retries;
- inside a shard, pack assignment is the exclusive token cumsum floor-div
  budget — the concatenate-then-chunk semantics where a document can span
  a pack boundary (exactly how GPT-style loaders pack token streams);
  fully vectorized, no per-doc loop;
- pack ids are namespaced by shard (``shard * PACK_STRIDE + local``), so
  shards never coordinate: packing 10^12 docs is embarrassingly parallel
  after the one shuffle.  The last pack of each shard may be underfull
  (shards don't share boundaries) — the standard trade for coordination-
  free packing; with rows/shards ≈ 2M docs per shard the waste is ≤
  budget-1 tokens per shard, vanishing at scale.

Documents longer than the budget span multiple packs; their ``n_packs``
column reports how many.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pyarrow as pa

from ..ray_glue.partitioning import auto_shards
from .sessions import _shard_fn

# shard-local pack ids fit far below this stride at 2M docs/shard
_PACK_STRIDE = 1 << 40


def pack_token_budget(
    ds,
    id_col: str,
    tokens_col: str,
    budget: int,
    shards: Union[int, str] = "auto",
):
    """Assign each doc the pack(s) of a ``budget``-token stream layout.

    Returns Dataset[(id_col, tokens_col:int64, pack_id:int64,
    pack_offset:int64, n_packs:int64)] where ``pack_id`` is the pack the
    doc STARTS in, ``pack_offset`` its token offset inside that pack, and
    ``n_packs`` how many consecutive packs it touches.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shards == "auto":
        shards = auto_shards(ds, target_rows_per_shard=2_000_000)
    sharded = ds.map_batches(
        _shard_fn(id_col, int(shards)), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], type=pa.int64()),
             tokens_col: pa.array([], type=pa.int64()),
             "pack_id": pa.array([], type=pa.int64()),
             "pack_offset": pa.array([], type=pa.int64()),
             "n_packs": pa.array([], type=pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tok = g.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        shard_id = int(g.column("shard")[0].as_py())
        order = np.argsort(ids, kind="stable")
        ids, tok = ids[order], tok[order]
        if (tok < 0).any():
            raise ValueError("token counts must be non-negative")
        start = np.concatenate(([0], np.cumsum(tok)[:-1]))
        end = start + tok  # exclusive
        pack_local = start // budget
        # a doc touches packs [start//budget, (end-1)//budget]; zero-token
        # docs sit AT a boundary and touch exactly the pack they start in
        last = np.where(tok > 0, (end - 1) // budget, pack_local)
        base = np.int64(shard_id) * _PACK_STRIDE
        return pa.table(
            {id_col: pa.array(ids, type=pa.int64()),
             tokens_col: pa.array(tok, type=pa.int64()),
             "pack_id": pa.array(base + pack_local, type=pa.int64()),
             "pack_offset": pa.array(start - pack_local * budget,
                                     type=pa.int64()),
             "n_packs": pa.array(last - pack_local + 1, type=pa.int64())}
        )

    return sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")
