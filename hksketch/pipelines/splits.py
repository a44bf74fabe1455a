"""Deterministic hash-based dataset splits (train/val/test).

The data-mixing primitive every training pipeline needs: assign each
record to a named split as a PURE FUNCTION of (id, seed) — stable across
runs, partitionings, retries, and cluster sizes, with no coordination and
no stored assignment table.  ``u = splitmix64(id XOR seed) / 2^64`` is
uniform on [0, 1); cumulative fraction thresholds cut it into splits, so
enlarging one split keeps every record of the smaller split in place (the
monotone-threshold property that makes holdout sets stable as ratios
change).

Embarrassingly parallel: one vectorized hash + ``searchsorted`` per
batch; no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64

U64 = np.uint64


def split_thresholds(fractions: dict[str, float]) -> tuple[list[str], np.ndarray]:
    """Validate fractions (positive, sum to 1 within 1e-9) and return
    (names, cumulative uint64 thresholds)."""
    names = list(fractions)
    fr = np.array([fractions[n] for n in names], dtype=np.float64)
    if (fr <= 0).any():
        raise ValueError(f"split fractions must be positive: {fractions}")
    if abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {fr.sum()!r}")
    cum = np.cumsum(fr)
    cum[-1] = 1.0  # close the last bucket exactly
    # Thresholds must be computed in INTEGER math: float(2**64) - 1 rounds
    # back to 2**64 (not representable in float64), so a float-side clip is
    # a no-op and casting 2**64 to uint64 is undefined (0 on x86), which
    # would leave the array unsorted and misassign every record.
    thr = np.array(
        [min(int(round(float(c) * 2**64)), 2**64 - 1) for c in cum],
        dtype=np.uint64,
    )
    if (np.diff(thr.astype(object)) < 0).any():
        raise ValueError(f"split thresholds not monotone for {fractions}")
    return names, thr


def assign_split(
    ds,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 12345,
    split_col: str = "split",
):
    """Append ``split_col`` (string) to every row by hashing ``id_col``.

    Returns the input Dataset with the extra column; no shuffle."""
    names, thr = split_thresholds(fractions)
    seed_u = U64(seed & 0xFFFFFFFFFFFFFFFF)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(split_col, pa.array([], type=pa.string()))
        ids = (
            b.column(id_col).to_numpy(zero_copy_only=False)
            .astype(np.int64).view(U64)
        )
        u = splitmix64(ids ^ seed_u)
        idx = np.searchsorted(thr, u, side="right")
        # u == 2^64-1 lands past the clipped last threshold; it belongs to
        # the final split
        idx = np.minimum(idx, len(names) - 1)
        arr = np.asarray(names, dtype=object)[idx]
        return b.append_column(split_col, pa.array(arr, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
