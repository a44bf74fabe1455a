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


def pair_flow_plan(
    cand_ds,
    shards: int | None = None,
    scratch: str | None = None,
    pairs_hint: int | None = None,
):
    """Dataset-native pair plan (round-4 VERDICT #3): the candidate pair
    table NEVER materializes on the driver.

    ``cand_ds``: a Dataset of (a, b) int64 pair rows, possibly containing
    duplicate pairs (the same pair colliding in several LSH bands lands in
    several bucket shards upstream) and ``runs.append_drop_sentinels``
    accounting rows (a < 0).

    Shape:

    1. ``map_batches`` assigns each pair its verify shard
       ``splitmix64(a·φ ⊕ splitmix64(b)) & (shards−1)`` — every duplicate
       of a pair maps to ONE shard, so the per-shard pass below removes
       cross-band duplicates without any global pass;
    2. ``groupby(shard).map_groups`` sorts + dedups its slice and WRITES
       it as one parquet file under ``scratch`` (the partitioned-write
       half of the plan: that file is the only copy of the pair table
       anywhere — reducers later read exactly their own slice via
       ``read_pair_slice``), returning only the shard's DISTINCT
       (doc_id, shard) rows plus one drop-accounting sentinel row;
    3. the driver collects ONLY that target table — O(candidate docs ×
       shards a doc touches), the same bound the gather fan-out already
       needs — and ``ray.put``s the fan-out map.

    → (shards, targets_ref, need, pair_dir, dropped_pairs,
    dropped_buckets).  The caller owns ``pair_dir`` cleanup AFTER the
    consuming Dataset has fully executed (the reducers read the files
    lazily).  ``scratch`` defaults to a fresh directory under the
    ``ray_glue.storage`` root, which on a multi-node cluster must be
    shared storage."""
    import os
    import uuid

    import ray

    from ..ray_glue.storage import artifact_dir

    if shards is None:
        if pairs_hint is not None:
            # ~10k pairs per verify shard amortizes the per-shard task +
            # slice-file overhead; the count still grows with the pair
            # table (100M pairs → 16k shards) and never drops below a
            # 32-cpu node's parallelism
            want = max(1, -(-int(pairs_hint) // 10_000))
            shards = max(16, min(1 << 14, 1 << (want - 1).bit_length()))
        else:
            shards = 256
    shards = int(shards)
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    if shards & (shards - 1):
        shards = 1 << shards.bit_length()

    pair_dir = scratch or artifact_dir("pairflow", uuid.uuid4().hex)
    os.makedirs(pair_dir, exist_ok=True)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def assign(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        ps = np.zeros(len(a), dtype=np.int32)  # sentinel rows ride shard 0
        real = a >= 0
        if real.any():
            with np.errstate(over="ignore"):  # mod-2^64 mixing
                h = splitmix64(
                    a[real].astype(np.uint64) * gold
                    ^ splitmix64(b[real].astype(np.uint64))
                )
            ps[real] = (h & np.uint64(shards - 1)).astype(np.int32)
        return pa.table(
            {"a": pa.array(a, type=pa.int64()),
             "b": pa.array(b, type=pa.int64()),
             "shard": pa.array(ps, type=pa.int32())}
        )

    assigned = cand_ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )

    def dedup_write(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        shard = int(g.column("shard")[0].as_py())
        a = g.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = g.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        dp = int(b[a == -1].sum())
        dbk = int(b[a == -2].sum())
        real = a >= 0
        a, b = a[real], b[real]
        docs = np.empty(0, dtype=np.int64)
        if len(a):
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            keep = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
            )
            a, b = a[keep], b[keep]
            # tmp + atomic rename: idempotent under Ray task retry
            final = os.path.join(pair_dir, f"pairs_{shard:05d}.parquet")
            tmp = f"{final}.{os.getpid()}.tmp"
            _pq.write_table(
                pa.table({"a": pa.array(a, type=pa.int64()),
                          "b": pa.array(b, type=pa.int64())}),
                tmp,
            )
            os.replace(tmp, final)
            docs = np.unique(np.concatenate([a, b]))
        zeros = np.zeros(len(docs), dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(np.concatenate([docs, [-1]]), type=pa.int64()),
             "shard": pa.array(
                 np.full(len(docs) + 1, shard, dtype=np.int32)
             ),
             "dropped_pairs": pa.array(
                 np.concatenate([zeros, [dp]]), type=pa.int64()
             ),
             "dropped_buckets": pa.array(
                 np.concatenate([zeros, [dbk]]), type=pa.int64()
             )}
        )

    tgt = (
        assigned.groupby("shard")
        .map_groups(dedup_write, batch_format="pyarrow")
        .to_pandas()
    )
    acc = tgt[tgt["doc_id"] < 0]
    dropped_pairs = int(acc["dropped_pairs"].sum())
    dropped_buckets = int(acc["dropped_buckets"].sum())
    tgt = tgt[tgt["doc_id"] >= 0]
    td = tgt["doc_id"].to_numpy().astype(np.int64)
    ts = tgt["shard"].to_numpy().astype(np.int32)
    o = np.lexsort((ts, td))
    td, ts = td[o], ts[o]
    targets_ref = ray.put((td, ts))
    return (
        shards, targets_ref, np.unique(td), pair_dir,
        dropped_pairs, dropped_buckets,
    )


def read_pair_slice(pair_dir: str, shard: int) -> tuple[np.ndarray, np.ndarray]:
    """Reducer side of ``pair_flow_plan``: this shard's sorted-unique
    (a, b) slice, or empty arrays if the shard emitted no pairs."""
    import os

    import pyarrow.parquet as _pq

    path = os.path.join(pair_dir, f"pairs_{shard:05d}.parquet")
    if not os.path.exists(path):
        e = np.empty(0, dtype=np.int64)
        return e, e
    t = _pq.read_table(path)
    return (
        t.column("a").to_numpy(zero_copy_only=False).astype(np.int64),
        t.column("b").to_numpy(zero_copy_only=False).astype(np.int64),
    )


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
