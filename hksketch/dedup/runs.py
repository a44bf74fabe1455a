"""Shared bucket-run → pair-synthesis kernels.

Three operators (MinHash-LSH candidate emission, exact n-gram shingle
pairing, group-profile cosine cross products) reduce to the same shape:
sort rows so equal bucket keys are adjacent, extract the runs, optionally
drop oversized runs (boilerplate buckets) with surfaced counts, then
synthesize all within-run upper-triangle pairs with one ``triu_indices``
broadcast per DISTINCT run size.  This module is the single home for that
kernel so cap accounting and the driver-side drop-sentinel protocol cannot
drift between the operators.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def runs_from_new_mask(new_run: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row boolean "starts a new run" mask (row 0 must be True) →
    ``(starts, sizes)`` int arrays."""
    starts = np.flatnonzero(new_run)
    sizes = np.diff(np.concatenate((starts, [len(new_run)])))
    return starts, sizes


def cap_runs(
    starts: np.ndarray, sizes: np.ndarray, max_run_size: int | None
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Keep runs of size ∈ [2, max_run_size]; return
    ``(use_starts, use_sizes, dropped_runs, dropped_pairs)`` where the drop
    counts cover runs LARGER than the cap (size-1 runs pair with nothing
    and are not "drops").  ``max_run_size=None`` disables the cap."""
    multi = sizes >= 2
    if max_run_size is None:
        use = multi
        return starts[use], sizes[use], 0, 0
    big = multi & (sizes > max_run_size)
    use = multi & ~big
    dropped_runs = int(big.sum())
    dropped_pairs = int((sizes[big] * (sizes[big] - 1) // 2).sum())
    return starts[use], sizes[use], dropped_runs, dropped_pairs


def triu_gather_indices(
    starts: np.ndarray, sizes: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All within-run (i < j) row-index pairs, synthesized with one
    ``triu_indices`` broadcast per distinct run size — no Python loop over
    runs or pairs.  Returns flat ``(ia, ib)`` int64 arrays; rows of a run
    keep their input order, so if runs are sorted the pairs are too."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s in np.unique(sizes):
        st = starts[sizes == s]
        iu, ju = np.triu_indices(int(s), 1)
        out_a.append((st[:, None] + iu[None, :]).ravel())
        out_b.append((st[:, None] + ju[None, :]).ravel())
    if not out_a:
        z = np.empty(0, dtype=np.int64)
        return z, z
    return (
        np.concatenate(out_a).astype(np.int64, copy=False),
        np.concatenate(out_b).astype(np.int64, copy=False),
    )


def append_drop_sentinels(
    t: pa.Table, count_col: str, dropped_pairs: int, dropped_runs: int
) -> pa.Table:
    """Append the two drop-sentinel rows (``a=-1`` → pairs dropped,
    ``a=-2`` → runs/buckets dropped, counts in ``count_col``, every other
    column zeroed) so per-shard tasks can surface drops through an
    ordinary shuffle.  Requires ids in column ``a`` to be non-negative."""
    cols = {}
    for field in t.schema:
        if field.name == "a":
            cols["a"] = pa.array([-1, -2], type=field.type)
        elif field.name == count_col:
            cols[field.name] = pa.array(
                [dropped_pairs, dropped_runs], type=field.type
            )
        else:
            cols[field.name] = pa.array([0, 0], type=field.type)
    return pa.concat_tables([t, pa.table(cols, schema=t.schema)])


def strip_drop_sentinels(
    df, count_col: str
) -> tuple["object", int, int]:
    """Driver side of ``append_drop_sentinels`` over a pandas frame:
    returns ``(frame without sentinel rows, dropped_pairs, dropped_runs)``."""
    sent = df["a"] < 0
    dropped_pairs = int(df.loc[df["a"] == -1, count_col].sum())
    dropped_runs = int(df.loc[df["a"] == -2, count_col].sum())
    if dropped_pairs or dropped_runs:
        df = df[~sent]
    return df, dropped_pairs, dropped_runs
