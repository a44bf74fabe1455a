"""Keyed ordered-stream operators: sessionization and as-of lookup.

Scale shape (the reference discipline: per-event state in ONE ordered pass,
`examples/ip_files.rs:222-227`): a per-key ``groupby(key).map_groups``
creates millions of single-user pandas groups — the documented pathology.
Instead the key is hash-folded to ``shards`` partitions (same shape as
``dedup.minhash.lsh_candidate_pairs``), each shard arrives as ONE Arrow
table, is sorted once with ``np.lexsort`` by (key, ts, tiebreak), and a
vectorized segment scan (diff + boolean masks + reduceat-style counts)
produces per-key results.  The shuffle moves every event exactly once and
fan-in is bounded by ``shards``, independent of key cardinality.

Each shard group is ONE in-memory Arrow table, so per-task memory is
rows/shards.  ``shards="auto"`` (the default — round-2 VERDICT #2 fix)
scales the shard count with the input via Parquet-footer row estimates
(``ray_glue.partitioning.auto_shards``), bounding per-task rows near a
fixed target regardless of input size; a fixed int is still accepted for
tests and for callers that align shard counts across stages.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64
from ..ray_glue.partitioning import auto_shards

U64 = np.uint64

# per-shard row bound for the one-table-per-shard scan: ~2M events ≈ 50 MB
# of (key, ts, type) columns per task
_TARGET_ROWS_PER_SHARD = 2_000_000


def _resolve_shards(ds, shards: Union[int, str]) -> int:
    if shards == "auto":
        return auto_shards(ds, target_rows_per_shard=_TARGET_ROWS_PER_SHARD)
    return int(shards)


def _shard_fn(key_col: str, shards: int):
    """shards must be a power of two (mask-folded key hash)."""
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two, got {shards}")

    def shard(b: pa.Table) -> pa.Table:
        if not pa.types.is_integer(b.column(key_col).type):
            raise TypeError(
                f"sessionize/last_event_before require an integer key column; "
                f"{key_col!r} is {b.column(key_col).type} — hash or factorize "
                "string keys to int64 upstream"
            )
        keys = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        s = (splitmix64(keys.astype(np.uint64)) & U64(shards - 1)).astype(np.int32)
        return b.append_column("shard", pa.array(s))

    return shard


def _sorted_arrays(g: pa.Table, key_col: str, ts_col: str):
    """One lexsort per shard: rows ordered by (key, ts).  No tiebreak
    column: equal-ts orderings cannot change gap counts (gap 0) or max-ts
    lookups, and dropping it keeps an entire int64 column out of the
    shuffle."""
    keys = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ts = g.column(ts_col).combine_chunks().cast(pa.timestamp("us")).to_numpy()
    ts = ts.astype("datetime64[us]").astype(np.int64)
    order = np.lexsort((ts, keys))
    return keys[order], ts[order], order


def sessionize(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 43200.0,
    shards: Union[int, str] = "auto",
):
    """Per-key session count: a new session starts at any event whose gap
    to the previous event of the same key exceeds ``gap_seconds``.

    Returns a Dataset[(key_col, n_sessions:int64)].  Keys must be an
    integer column (hash/factorize strings upstream).
    """
    gap_us = int(gap_seconds * 1_000_000)
    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({key_col: pa.array([], type=pa.int64()),
                             "n_sessions": pa.array([], type=pa.int64())})
        keys, ts, _ = _sorted_arrays(g, key_col, ts_col)
        uniq, starts = np.unique(keys, return_index=True)
        same_key = keys[1:] == keys[:-1]
        brk = same_key & ((ts[1:] - ts[:-1]) > gap_us)
        # count breaks per key: break at position i+1 belongs to keys[i+1]
        n_breaks = np.bincount(
            np.searchsorted(uniq, keys[1:][brk]), minlength=len(uniq)
        )
        return pa.table(
            {key_col: pa.array(uniq, type=pa.int64()),
             "n_sessions": pa.array(1 + n_breaks, type=pa.int64())}
        )

    return sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")


def session_intervals(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 43200.0,
    shards: Union[int, str] = "auto",
):
    """Per-session time INTERVALS — ``(key, session_idx, session_start,
    session_end)`` with start/end as int64 µs (first/last event of the
    session) — the interval-table producer that composes with
    ``pipelines.intervals.interval_count_join`` ("how many active
    sessions contained time t").

    Same one-shuffle key-sharded scan as :func:`sessionize` (identical
    break rule: gap STRICTLY greater than ``gap_seconds``), so
    per-key session counts of the two operators agree by construction;
    ``session_idx`` numbers a key's sessions 0.. in time order.  Equal
    timestamps cannot flip boundaries (gap 0 never breaks), so the
    output is deterministic under any tie order.
    """
    gap_us = int(gap_seconds * 1_000_000)
    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )

    empty = pa.table(
        {key_col: pa.array([], type=pa.int64()),
         "session_idx": pa.array([], type=pa.int64()),
         "session_start": pa.array([], type=pa.int64()),
         "session_end": pa.array([], type=pa.int64())}
    )

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        keys, ts, _ = _sorted_arrays(g, key_col, ts_col)
        new = np.concatenate(
            ([True],
             (keys[1:] != keys[:-1]) | ((ts[1:] - ts[:-1]) > gap_us))
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts)) - 1
        skey = keys[starts]
        # session_idx: position of each session within its key's run
        kfirst = np.flatnonzero(
            np.concatenate(([True], skey[1:] != skey[:-1]))
        )
        krep = np.diff(np.append(kfirst, len(skey)))
        sidx = np.arange(len(skey)) - np.repeat(kfirst, krep)
        return pa.table(
            {key_col: pa.array(skey, type=pa.int64()),
             "session_idx": pa.array(sidx, type=pa.int64()),
             "session_start": pa.array(ts[starts], type=pa.int64()),
             "session_end": pa.array(ts[ends], type=pa.int64())}
        )

    return sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")


def last_event_before(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    anchor_type: str = "error",
    probe_type: str = "login",
    shards: Union[int, str] = "auto",
):
    """As-of lookup inside one keyed stream: per key, the latest
    ``probe_type`` timestamp strictly before the latest ``anchor_type``
    timestamp.  Keys without an anchor event are dropped; keys without a
    preceding probe get a null.

    Returns a Dataset[(key_col, last_error:timestamp, prev_login:timestamp)].
    """
    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], type=pa.int64()),
             "last_error": pa.array([], type=pa.timestamp("us")),
             "prev_login": pa.array([], type=pa.timestamp("us"))}
        )
        if g.num_rows == 0:
            return empty
        keys, ts, order = _sorted_arrays(g, key_col, ts_col)
        typ = g.column(type_col).to_numpy(zero_copy_only=False)[order]
        anchor = typ == anchor_type
        if not anchor.any():
            return empty
        # rows are ts-ascending within key → the LAST occurrence per key is
        # the max; np.unique on the reversed array yields last occurrences
        ak, ats = keys[anchor], ts[anchor]
        u_a, ridx = np.unique(ak[::-1], return_index=True)
        last_anchor = ats[::-1][ridx]  # max anchor ts per key (u_a sorted)
        probe = typ == probe_type
        pk, pts = keys[probe], ts[probe]
        pos = np.searchsorted(u_a, pk)
        pos_ok = pos < len(u_a)
        valid = np.zeros(len(pk), dtype=bool)
        valid[pos_ok] = (u_a[pos[pos_ok]] == pk[pos_ok]) & (
            pts[pos_ok] < last_anchor[pos[pos_ok]]
        )
        vk, vts = pk[valid], pts[valid]
        u_p, pridx = np.unique(vk[::-1], return_index=True)
        last_probe = vts[::-1][pridx]
        # align probe results to anchor keys (u_p ⊆ u_a)
        out_probe = np.zeros(len(u_a), dtype=np.int64)
        has_probe = np.zeros(len(u_a), dtype=bool)
        ppos = np.searchsorted(u_a, u_p)
        out_probe[ppos] = last_probe
        has_probe[ppos] = True
        return pa.table(
            {
                key_col: pa.array(u_a, type=pa.int64()),
                "last_error": pa.array(
                    last_anchor.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
                "prev_login": pa.Array.from_pandas(
                    np.where(has_probe, out_probe, 0).astype("datetime64[us]"),
                    mask=~has_probe,
                    type=pa.timestamp("us"),
                ),
            }
        )

    return sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")


_US_PER_DAY = 86_400_000_000


def max_gap(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    shards: Union[int, str] = "auto",
):
    """Per-key LAG statistics: the number of consecutive-event gaps and the
    LARGEST gap (``MAX(ts - lag(ts) OVER (PARTITION BY key ORDER BY ts))``)
    in integer microseconds.  The max does not telescope the way a gap SUM
    would, so it genuinely needs the ordered per-key scan — same ONE
    key-sharded shuffle + lexsort + segment ``maximum.reduceat`` shape as
    :func:`sessionize`.  Keys with a single event get ``n_gaps = 0`` and a
    null ``max_gap_us`` (SQL MAX-over-empty semantics).

    Returns a Dataset[(key_col, n_gaps:int64, max_gap_us:int64?)].
    """
    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], type=pa.int64()),
             "n_gaps": pa.array([], type=pa.int64()),
             "max_gap_us": pa.array([], type=pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        keys, ts, _ = _sorted_arrays(g, key_col, ts_col)
        uniq, starts = np.unique(keys, return_index=True)
        counts = np.diff(np.append(starts, len(keys)))
        gaps = ts[1:] - ts[:-1]
        same = keys[1:] == keys[:-1]
        # per-key max over its gap run: reduceat over the gap array with
        # cross-key positions masked to -1 (gaps are ≥ 0 within a key)
        masked = np.where(same, gaps, np.int64(-1))
        has_gap = counts > 1
        mx = np.full(len(uniq), -1, dtype=np.int64)
        if masked.size:
            # key i's gaps occupy masked[starts[i] : starts[i]+counts[i]-1];
            # reduceat needs monotonically increasing offsets, so clamp the
            # empty segments to their start and overwrite their result below
            offs = np.minimum(starts, masked.size - 1)
            seg_max = np.maximum.reduceat(masked, offs)
            mx = np.where(has_gap, seg_max, np.int64(-1))
        return pa.table(
            {key_col: pa.array(uniq, type=pa.int64()),
             "n_gaps": pa.array(counts - 1, type=pa.int64()),
             "max_gap_us": pa.Array.from_pandas(
                 mx, mask=~has_gap, type=pa.int64())}
        )

    return sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")


def transition_counts(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    shards: Union[int, str] = "auto",
):
    """Consecutive-event transition counts per key — the clickstream
    Markov matrix: ``COUNT(*) GROUP BY (LAG(type) OVER (PARTITION BY key
    ORDER BY ts, id), type)``.  Unlike :func:`max_gap`, equal timestamps
    DO change the answer here (which event comes first decides the
    pair), so the within-key order carries the ``id_col`` tie-break and
    the lexsort includes it — pinned by an equal-ts test.

    Shape: ONE key-sharded shuffle; per shard one lexsort orders
    (key, ts, id); cross-key boundaries drop; the per-shard (prev, next)
    pair counts pre-aggregate (vocabulary², tiny) before the final
    groupby.  Returns Dataset[(prev_type, next_type, n)].
    """
    import polars as pl

    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )
    empty = pa.table(
        {"prev_type": pa.array([], type=pa.string()),
         "next_type": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())}
    )

    def scan(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        keys = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            g.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
            .to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, ts, keys))
        same = keys[order][1:] == keys[order][:-1]
        if not same.any():
            return empty
        types = g.column(type_col).combine_chunks().take(pa.array(order))
        prev = types.slice(0, len(types) - 1).filter(pa.array(same))
        nxt = types.slice(1).filter(pa.array(same))
        t = (
            pl.from_arrow(pa.table({"prev_type": prev, "next_type": nxt}))
            .group_by(["prev_type", "next_type"])
            .agg(pl.len().cast(pl.Int64).alias("n"))
        ).to_arrow()
        return t.select(["prev_type", "next_type", "n"]).cast(empty.schema)

    from ray.data.aggregate import Sum

    return (
        sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def daily_retention(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    shards: Union[int, str] = "auto",
):
    """Per-day active keys and next-day retention: for each calendar day,
    how many keys were active that day, and how many of those were ALSO
    active the following day (classic D1-retention).

    Same scale shape as :func:`sessionize`: ONE key-sharded shuffle, one
    lexsort per shard, then a vectorized (key, day) dedup + consecutive-day
    scan; the second exchange carries one (day, counts) partial row per
    shard-day, bounded by the calendar, not the data.

    Returns a Dataset[(day:timestamp, active_users:int64,
    retained_users:int64)] sorted by day.
    """
    from ray.data.aggregate import Sum

    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"day": pa.array([], type=pa.timestamp("us")),
             "active_users": pa.array([], type=pa.int64()),
             "retained_users": pa.array([], type=pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        keys, ts, _ = _sorted_arrays(g, key_col, ts_col)
        day = ts // _US_PER_DAY  # floor division matches date_trunc('day')
        keep = np.concatenate(
            ([True], (keys[1:] != keys[:-1]) | (day[1:] != day[:-1]))
        )
        k2, d2 = keys[keep], day[keep]
        act_days, act_counts = np.unique(d2, return_counts=True)
        # a retained (key, day) pair: the SAME key appears on day+1; rows
        # are (key, day)-sorted so consecutive-row comparison suffices
        ret = (k2[1:] == k2[:-1]) & (d2[1:] - d2[:-1] == 1)
        rdays, rcounts = np.unique(d2[:-1][ret], return_counts=True)
        retained = np.zeros(len(act_days), dtype=np.int64)
        retained[np.searchsorted(act_days, rdays)] = rcounts
        return pa.table(
            {"day": pa.array(act_days * _US_PER_DAY).cast(pa.timestamp("us")),
             "active_users": pa.array(act_counts, type=pa.int64()),
             "retained_users": pa.array(retained, type=pa.int64())}
        )

    partial = sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")
    return (
        partial.groupby("day")
        .aggregate(
            Sum("active_users", alias_name="active_users"),
            Sum("retained_users", alias_name="retained_users"),
        )
        .sort("day")
    )


def conversion_funnel_daily(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_type: str = "view",
    to_type: str = "purchase",
    window_seconds: float = 3600.0,
    shards: Union[int, str] = "auto",
):
    """Daily funnel conversion: per day, how many ``to_type`` events had a
    ``from_type`` event by the same key strictly before them and within
    ``window_seconds`` (the view→purchase attribution question).

    Same ONE-shuffle shape as :func:`sessionize`; inside each sorted shard
    the "latest preceding from-event" is a pure-numpy running maximum of
    from-event positions (``np.maximum.accumulate``), guarded against
    leaking across key boundaries — no per-key Python loop.

    Returns a Dataset[(day:timestamp, n_target:int64, n_converted:int64)]
    sorted by day; days with no ``to_type`` events are absent (the SQL
    mirror drops them the same way).
    """
    from ray.data.aggregate import Sum

    window_us = int(window_seconds * 1_000_000)
    shards = _resolve_shards(ds, shards)
    sharded = ds.map_batches(
        _shard_fn(key_col, shards), batch_format="pyarrow", zero_copy_batch=True
    )

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"day": pa.array([], type=pa.timestamp("us")),
             "n_target": pa.array([], type=pa.int64()),
             "n_converted": pa.array([], type=pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        # sort (key, ts, from-events LAST within a timestamp): an equal-ts
        # from-event must not become the running max at a to-row — it would
        # fail the strict-before check and SHADOW an older in-window
        # from-event, making the answer depend on input row order
        keys0 = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts0 = (
            g.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
            .to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        typ0 = g.column(type_col).to_numpy(zero_copy_only=False)
        from_rank = (typ0 == from_type).astype(np.int8)
        order = np.lexsort((from_rank, ts0, keys0))
        keys, ts, typ = keys0[order], ts0[order], typ0[order]
        is_to = typ == to_type
        if not is_to.any():
            return empty
        n = len(keys)
        # latest STRICTLY-EARLIER from-event position at each row (running
        # max of from positions; -1 = none yet; equal-ts from-events sort
        # after to-events, so they cannot be the max at a to-row)
        last_from = np.maximum.accumulate(
            np.where(typ == from_type, np.arange(n), -1)
        )
        # key-boundary guard: a position inherited from the previous key's
        # segment is invalid
        uniq, seg_starts = np.unique(keys, return_index=True)
        row_seg_start = seg_starts[np.searchsorted(uniq, keys)]
        tpos = np.flatnonzero(is_to)
        lf = last_from[tpos]
        valid = lf >= row_seg_start[tpos]
        # strict before + window (equal timestamps never attribute: the
        # running max may include the to-row's own position only if it were
        # a from-row, which it is not)
        vts = np.where(valid, ts[np.maximum(lf, 0)], np.int64(-(1 << 62)))
        tts = ts[tpos]
        conv = valid & (vts < tts) & (vts >= tts - window_us)
        day = tts // _US_PER_DAY
        days, tcounts = np.unique(day, return_counts=True)
        cdays, ccounts = np.unique(day[conv], return_counts=True)
        converted = np.zeros(len(days), dtype=np.int64)
        converted[np.searchsorted(days, cdays)] = ccounts
        return pa.table(
            {"day": pa.array(days * _US_PER_DAY).cast(pa.timestamp("us")),
             "n_target": pa.array(tcounts, type=pa.int64()),
             "n_converted": pa.array(converted, type=pa.int64())}
        )

    partial = sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")
    return (
        partial.groupby("day")
        .aggregate(
            Sum("n_target", alias_name="n_target"),
            Sum("n_converted", alias_name="n_converted"),
        )
        .sort("day")
    )
