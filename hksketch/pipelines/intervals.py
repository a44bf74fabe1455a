"""Distributed interval containment join (range/band join) — "for each
point, how many intervals contain it" — the non-equi join Ray Data's
Dataset API cannot express natively.

Strategy (the standard bucket-replication range-join plan, e.g.
IEJoin-adjacent systems and every streaming band join): fix a bucket
width ``w`` on the time axis; each POINT lands in exactly ONE bucket
(``floor(t / w)``), each INTERVAL ``[s, e]`` is replicated to every
bucket it overlaps (``floor(s/w) .. floor(e/w)`` — bounded fan-out of
``len/w + 2``).  ONE bucket-sharded shuffle co-locates each point with
every interval that could contain it, then a per-shard vectorized scan
answers containment counts:

    n_containing(t) = #(starts ≤ t) − #(ends < t)

via two ``searchsorted`` probes per bucket slice — no pair list is ever
built, so output is one row per point regardless of join selectivity
(the count aggregate is pushed INTO the join, the way a SQL engine
never does for ``LEFT JOIN .. GROUP BY``).

Scale: shuffle volume is points + replication × intervals; the
replication factor is explicit and CAPPED (``max_replication`` raises
with sizing guidance instead of silently amplifying a degenerate
config).  Skew: a time-spike bucket concentrates its rows in one shard
task, bounded by that bucket's actual row count; pick ``w`` near the
typical interval length so replication stays 2-3× (the band-join
wrapper does this automatically).

Points exactly on bucket boundaries are safe: ``s ≤ t ≤ e`` implies
``floor(s/w) ≤ floor(t/w) ≤ floor(e/w)``, so the containing interval is
always replicated into the point's bucket; replicas from neighbouring
ranges are rejected by the raw (unclipped) start/end comparison.

Reference scope note: the reference engine has no joins; this is part
of the engine-extension surface (`SURVEY.md §2` custom operators:
"as-of join, range join").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64

U64 = np.uint64

_POINT_EMPTY = pa.table(
    {"shard": pa.array([], type=pa.int32()),
     "bucket": pa.array([], type=pa.int64()),
     "t": pa.array([], type=pa.int64()),
     "pid": pa.array([], type=pa.int64()),
     "is_point": pa.array([], type=pa.bool_()),
     "start": pa.array([], type=pa.int64()),
     "end": pa.array([], type=pa.int64())}
)

_OUT_EMPTY = pa.table(
    {"pid": pa.array([], type=pa.int64()),
     "n_containing": pa.array([], type=pa.int64())}
)


def _ts_to_int64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/int column → int64 ndarray (µs for timestamp[us])."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    elif col.type != pa.int64():
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False)


def _shard_of(bucket: np.ndarray, shards: int) -> np.ndarray:
    return (
        splitmix64(bucket.astype(np.uint64)) & U64(shards - 1)
    ).astype(np.int32)


def interval_count_join(
    points,
    intervals,
    point_ts: str,
    point_id: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    shards: int = 64,
    max_replication: int = 64,
):
    """Per-point containment counts: returns a Dataset of
    ``(pid, n_containing)`` with one row per input point (zero counts
    included — LEFT-join semantics), where ``n_containing`` is the
    number of interval rows with ``start <= t <= end`` (both bounds
    INCLUSIVE, int64 µs math — bit-exact vs SQL ``BETWEEN``).
    """
    import polars as pl

    bucket_width = int(bucket_width)
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0 (got {bucket_width})")
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")
    w = np.int64(bucket_width)

    def point_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _POINT_EMPTY
        t = _ts_to_int64(batch.column(point_ts))
        pid = batch.column(point_id).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = np.floor_divide(t, w)
        z = np.zeros(len(t), dtype=np.int64)
        return pa.table(
            {"shard": pa.array(_shard_of(b, shards)),
             "bucket": pa.array(b, type=pa.int64()),
             "t": pa.array(t, type=pa.int64()),
             "pid": pa.array(pid, type=pa.int64()),
             "is_point": pa.array(np.ones(len(t), dtype=bool)),
             "start": pa.array(z, type=pa.int64()),
             "end": pa.array(z, type=pa.int64())}
        )

    def interval_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _POINT_EMPTY
        s = _ts_to_int64(batch.column(start_col))
        e = _ts_to_int64(batch.column(end_col))
        keep = s <= e  # empty/inverted intervals contain nothing
        s, e = s[keep], e[keep]
        if len(s) == 0:
            return _POINT_EMPTY
        b0 = np.floor_divide(s, w)
        b1 = np.floor_divide(e, w)
        rep = (b1 - b0 + 1).astype(np.int64)
        worst = int(rep.max())
        if worst > max_replication:
            raise ValueError(
                f"interval_count_join: an interval spans {worst} buckets "
                f"(> max_replication={max_replication}); raise bucket_width "
                f"(~typical interval length) or max_replication"
            )
        total = int(rep.sum())
        src = np.repeat(np.arange(len(s)), rep)
        # bucket offset within each interval's replica run
        starts = np.cumsum(np.concatenate(([0], rep[:-1])))
        offset = np.arange(total) - np.repeat(starts, rep)
        b = b0[src] + offset
        z = np.zeros(total, dtype=np.int64)
        return pa.table(
            {"shard": pa.array(_shard_of(b, shards)),
             "bucket": pa.array(b, type=pa.int64()),
             "t": pa.array(z, type=pa.int64()),
             "pid": pa.array(z, type=pa.int64()),
             "is_point": pa.array(np.zeros(total, dtype=bool)),
             "start": pa.array(s[src], type=pa.int64()),
             "end": pa.array(e[src], type=pa.int64())}
        )

    prows = points.map_batches(
        point_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    irows = intervals.map_batches(
        interval_rows, batch_format="pyarrow", zero_copy_batch=True
    )
    rows = prows.union(irows)

    def shard_scan(grp) -> pa.Table:
        if not len(grp):
            return _OUT_EMPTY
        df = pl.from_pandas(
            grp[["bucket", "t", "pid", "is_point", "start", "end"]]
        )
        pts = df.filter(pl.col("is_point")).sort(["bucket", "t"])
        if pts.height == 0:
            return _OUT_EMPTY
        ivs = df.filter(~pl.col("is_point"))
        pt_b = pts["bucket"].to_numpy()
        pt_t = pts["t"].to_numpy()
        pt_id = pts["pid"].to_numpy()
        out = np.zeros(pts.height, dtype=np.int64)
        if ivs.height:
            iv_sorted = ivs.sort("bucket")
            iv_b = iv_sorted["bucket"].to_numpy()
            iv_s = iv_sorted["start"].to_numpy()
            iv_e = iv_sorted["end"].to_numpy()
            # walk buckets present among points; vectorized searchsorted
            # probes inside each bucket slice
            p_starts = np.flatnonzero(
                np.concatenate(([True], pt_b[1:] != pt_b[:-1]))
            )
            p_ends = np.append(p_starts[1:], len(pt_b))
            for ps, pe in zip(p_starts, p_ends):
                b = pt_b[ps]
                ilo = np.searchsorted(iv_b, b, side="left")
                ihi = np.searchsorted(iv_b, b, side="right")
                if ihi == ilo:
                    continue
                ss = np.sort(iv_s[ilo:ihi])
                ee = np.sort(iv_e[ilo:ihi])
                tt = pt_t[ps:pe]
                out[ps:pe] = (
                    np.searchsorted(ss, tt, side="right")
                    - np.searchsorted(ee, tt, side="left")
                )
        return pa.table(
            {"pid": pa.array(pt_id, type=pa.int64()),
             "n_containing": pa.array(out, type=pa.int64())}
        )

    return rows.groupby("shard").map_groups(
        shard_scan, batch_format="pandas"
    )


def band_count_join(
    points,
    centers,
    point_ts: str,
    point_id: str,
    center_ts: str,
    delta: int,
    shards: int = 64,
):
    """Band join with counts: for each point, the number of CENTER rows
    within ``±delta`` (inclusive — ``center BETWEEN t-δ AND t+δ``,
    symmetric, so equivalently ``t ∈ [center-δ, center+δ]``).  Each
    center becomes the interval ``[c-δ, c+δ]`` and ``bucket_width`` is
    fixed at ``2δ``, capping replication at 3 buckets per center."""
    import pyarrow.compute as pc  # noqa: F401  (parity with callers)

    delta = int(delta)
    if delta <= 0:
        raise ValueError(f"delta must be > 0 (got {delta})")

    def to_intervals(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"start": pa.array([], type=pa.int64()),
                 "end": pa.array([], type=pa.int64())}
            )
        c = _ts_to_int64(batch.column(center_ts))
        return pa.table(
            {"start": pa.array(c - delta, type=pa.int64()),
             "end": pa.array(c + delta, type=pa.int64())}
        )

    intervals = centers.map_batches(
        to_intervals, batch_format="pyarrow", zero_copy_batch=True
    )
    return interval_count_join(
        points, intervals, point_ts, point_id, "start", "end",
        bucket_width=2 * delta, shards=shards,
    )
