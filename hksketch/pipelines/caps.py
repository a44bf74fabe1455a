"""Deterministic per-group document caps (domain quotas).

The crawl-pipeline policy "keep at most N documents per host" (used by
every Common-Crawl-derived corpus to stop boilerplate-heavy domains from
dominating the training mix), as a bounded-shuffle Ray Data operator:

- **Rank, don't sample**: each row gets a deterministic rank that is a
  pure function of its id, and the N smallest ranks per group survive —
  stable across runs, partitionings, and cluster sizes, and monotone in N
  (raising the cap keeps every previously-kept doc, the same property as
  ``pipelines/splits.py``).
- **Bounded shuffle (the scale story)**: a per-batch combiner prunes each
  batch to its own top-N per group BEFORE the shuffle, so the exchange
  carries at most N rows per (batch, group) — the per-group partial
  top-N pushdown — and the final per-group selection touches ≤ N×#batches
  rows per group regardless of how hot the group is.
- **Shard-grouped final (the group-COUNT story)**: the reduce side
  groups by a fixed-cardinality key-hash shard, not by the raw group
  key — group count (hosts/sources) is unbounded at web scale and a
  ``groupby(group).map_groups`` would make one Python call per group;
  inside each shard the selection is ONE lexsort + run-scan over all of
  that shard's groups (the ``sessions.py`` discipline).

The default rank is an LCG ``(id*1103515245 + 12345) mod 2^31`` rather
than ``hashing.splitmix64`` ONLY so the DuckDB oracle can express the
identical integer arithmetic without uint64 emulation; production use at
web scale should pass ``rank_fn=splitmix64`` (same operator shape, better
mixing).  Ties rank→id so the kept set is total-order deterministic.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

LCG_MULT = 1103515245
LCG_ADD = 12345
LCG_MOD = 2147483648  # 2^31


def _with_shard(ds, group_col: str, shards: int):
    """Append a ``__shard`` column = key-hash of the group (int keys via
    splitmix64, strings via the process-independent hk64) so the reduce
    groupby has FIXED cardinality regardless of group count."""
    from ..ray_glue.joins import _key_shards

    def add(b: pa.Table) -> pa.Table:
        s = _key_shards(b.column(group_col).combine_chunks(), shards)
        return b.append_column("__shard", pa.array(s, type=pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def lcg_rank(ids: np.ndarray) -> np.ndarray:
    """Default deterministic rank; exactly mirrored by the SQL expression
    ``(id * 1103515245 + 12345) % 2147483648`` (no overflow for
    id < 2^63 / 1103515245 ≈ 8.4e9 — fine at fixture scales; pass
    splitmix64 beyond that)."""
    return (ids.astype(np.int64) * LCG_MULT + LCG_ADD) % LCG_MOD


def _prune_topn(
    groups: np.ndarray, ids: np.ndarray, ranks: np.ndarray, n: int
) -> np.ndarray:
    """Row indices of the ≤ n smallest (rank, id) rows per group —
    one lexsort + run-position arithmetic, no Python loop over groups."""
    codes = groups
    if groups.dtype.kind in ("O", "U", "S"):
        _, codes = np.unique(groups, return_inverse=True)
    order = np.lexsort((ids, ranks, codes))
    gc = codes[order]
    new = np.concatenate(([True], gc[1:] != gc[:-1]))
    starts = np.flatnonzero(new)
    # position of each row within its group run
    pos = np.arange(len(gc)) - np.repeat(starts, np.diff(
        np.concatenate((starts, [len(gc)]))
    ))
    return order[pos < n]


def cap_per_group(
    ds,
    group_col: str,
    id_col: str,
    n: int,
    rank_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    shards: int = 64,
):
    """Dataset → Dataset[(group_col, id_col, rank)] of the ≤ ``n``
    surviving rows per group.  SQL parity:
    ``QUALIFY row_number() OVER (PARTITION BY group ORDER BY rank, id) <= n``.
    ``shards`` fixes the reduce-side groupby cardinality (NOT the group
    count, which is unbounded); size it so post-combiner rows/shard fit a
    worker.
    """
    if n < 1:
        raise ValueError(f"cap n must be >= 1, got {n}")
    rank = rank_fn or lcg_rank

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        i = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        r = rank(i)
        if len(i):
            keep = _prune_topn(g, i, r, n)
            g, i, r = g[keep], i[keep], r[keep]
        return pa.table(
            {group_col: pa.array(g, type=b.schema.field(group_col).type),
             id_col: pa.array(i, type=pa.int64()),
             "rank": pa.array(r, type=pa.int64())}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(grp: pa.Table) -> pa.Table:
        # one shard = MANY groups; _prune_topn's lexsort + run scan
        # selects per group vectorized, so per-Python-call work is
        # rows/shards, independent of group count
        g = grp.column(group_col).to_numpy(zero_copy_only=False)
        i = grp.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        r = grp.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.sort(_prune_topn(g, i, r, n))
        return pa.table(
            {group_col: pa.array(g[keep],
                                 type=grp.schema.field(group_col).type),
             id_col: pa.array(i[keep], type=pa.int64()),
             "rank": pa.array(r[keep], type=pa.int64())}
        )

    return (
        _with_shard(pre, group_col, shards)
        .groupby("__shard")
        .map_groups(final, batch_format="pyarrow")
    )


def _prune_budget(
    groups: np.ndarray,
    ids: np.ndarray,
    ranks: np.ndarray,
    weights: np.ndarray,
    budget: int,
) -> np.ndarray:
    """Row indices whose per-group inclusive running weight (in (rank, id)
    order) is ≤ budget — one lexsort + segment-rebased cumsum."""
    codes = groups
    if groups.dtype.kind in ("O", "U", "S"):
        _, codes = np.unique(groups, return_inverse=True)
    order = np.lexsort((ids, ranks, codes))
    gc = codes[order]
    w = weights[order]
    new = np.concatenate(([True], gc[1:] != gc[:-1]))
    starts = np.flatnonzero(new)
    cs = np.cumsum(w)
    base = np.zeros(len(gc), dtype=cs.dtype)
    base[new] = np.concatenate(([0], cs[starts[1:] - 1]))
    seg_cs = cs - np.maximum.accumulate(base)
    return order[seg_cs <= budget]


def budget_per_group(
    ds,
    group_col: str,
    id_col: str,
    weight_col: str,
    budget: int,
    rank_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    shards: int = 64,
):
    """Per-group WEIGHT budget (the training-mix construction primitive:
    "take documents per source, in deterministic rank order, until the
    source's token budget is spent").  Keeps rows whose inclusive running
    weight in (rank, id) order is ≤ ``budget``; deterministic across
    partitionings and monotone in the budget.

    Scale shape: a per-batch combiner applies the SAME rule batch-locally
    BEFORE the shuffle — safe because the global running weight at any
    row is ≥ the batch-local running weight over that batch's
    earlier-ranked rows (weights are validated non-negative), so any row
    over budget locally is over budget globally.  The exchange therefore
    carries at most ceil(budget / min POSITIVE weight) positive-weight
    rows per (batch, group), PLUS every zero-weight row ranked before the
    budget exhausts — zero-weight rows ride free by definition, so a
    group flooded with them (e.g. millions of empty docs) is only
    bounded by the caller pre-filtering empties.  SQL parity:
    ``SUM(w) OVER (PARTITION BY g ORDER BY rank, id
    ROWS UNBOUNDED PRECEDING) <= budget``.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    rank = rank_fn or lcg_rank

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).to_numpy(zero_copy_only=False)
        i = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) and w.min() < 0:
            raise ValueError(
                f"budget_per_group requires non-negative {weight_col!r} "
                f"(the batch-local prune's containment argument fails "
                f"otherwise); got min {w.min()}"
            )
        r = rank(i)
        if len(i):
            keep = _prune_budget(g, i, r, w, budget)
            g, i, r, w = g[keep], i[keep], r[keep], w[keep]
        return pa.table(
            {group_col: pa.array(g, type=b.schema.field(group_col).type),
             id_col: pa.array(i, type=pa.int64()),
             "rank": pa.array(r, type=pa.int64()),
             weight_col: pa.array(w, type=pa.int64())}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def final(grp: pa.Table) -> pa.Table:
        # shard-grouped: many groups per call, vectorized segment cumsum
        g = grp.column(group_col).to_numpy(zero_copy_only=False)
        i = grp.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        r = grp.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
        w = grp.column(weight_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        keep = np.sort(_prune_budget(g, i, r, w, budget))
        return pa.table(
            {group_col: pa.array(g[keep],
                                 type=grp.schema.field(group_col).type),
             id_col: pa.array(i[keep], type=pa.int64()),
             "rank": pa.array(r[keep], type=pa.int64()),
             weight_col: pa.array(w[keep], type=pa.int64())}
        )

    return (
        _with_shard(pre, group_col, shards)
        .groupby("__shard")
        .map_groups(final, batch_format="pyarrow")
    )
