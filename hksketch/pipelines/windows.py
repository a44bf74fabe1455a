"""Distributed window/rank operators: per-group top-n ranking, keyed
running totals, and trailing calendar-window sums.

The reference's only ranked output is its global top-k list
(`/root/reference/src/heavykeeper.rs:371-382` — sort count desc, bounded
k); these operators generalize that "bounded ranked result" discipline to
SQL window-function shapes over Ray Data:

- ``grouped_topn`` — ``ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) <= n``.
  Scale shape: a per-batch PRUNE keeps at most n rows per group per batch
  (the mergeable-top-k insight: a group's global top-n is contained in the
  union of its per-batch top-n's), so the shuffle carries
  ≤ n × groups × blocks rows no matter how large the input; the final
  per-group rank assignment sees only those pruned rows.
- ``keyed_daily_running`` — ``SUM(x) OVER (PARTITION BY k ORDER BY day)``.
  Scale shape: per-batch (key, day) combiner partials, ONE key-sharded
  shuffle (same hash-fold as ``sessions.sessionize`` — never a per-key
  group), one lexsort + segment ``reduceat`` + per-key-offset ``cumsum``
  per shard.  A key's whole history lands in one shard, which is the
  partitioning assumption every PARTITION BY window needs.
- ``trailing_daily_sum`` — ``SUM(x) OVER (ORDER BY day RANGE BETWEEN w-1
  PRECEDING AND CURRENT ROW)``.  Scale shape: distributed daily combine
  first (calendar-bounded output), then each day's total is exploded to
  the ≤ w observed window-ends it contributes to (the bounded ×w fan-out
  that turns a sliding window into a partitionable group key — same trick
  as the rolling-distinct query) and re-aggregated.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pyarrow as pa

from ..ray_glue.partitioning import auto_shards
from .sessions import _shard_fn

_US_PER_DAY = 86_400_000_000

U64 = np.uint64


def grouped_topn(
    ds,
    group_col: str,
    order_col: str,
    id_col: str,
    n: int,
    descending: bool = True,
):
    """Top-``n`` rows per group by ``order_col`` (ties broken ``id_col``
    ascending — SQL ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY
    order_col [DESC], id_col)``), with the 1-based ``rank`` column.

    Returns Dataset[(group_col, id_col, order_col, rank:int64)].
    """
    import polars as pl

    cols = [group_col, id_col, order_col]

    def prune(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        if batch.num_rows == 0:
            return t
        out = (
            pl.from_arrow(t)
            .sort([order_col, id_col], descending=[descending, False])
            .group_by(group_col, maintain_order=True)
            .head(n)
        )
        return out.to_arrow().select(cols).cast(t.schema)

    pruned = ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    def rank_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column("rank", pa.array([], type=pa.int64()))
        out = (
            pl.from_arrow(g.select(cols))
            .sort([order_col, id_col], descending=[descending, False])
            .head(n)
        )
        t = out.to_arrow().cast(g.select(cols).schema)
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1), type=pa.int64())
        )

    return pruned.groupby(group_col).map_groups(rank_group, batch_format="pyarrow")


def _skyline2_scan(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean survivor mask of the 2-D maxima (Pareto skyline) under
    strict dominance: p dominates q iff p ≥ q on both axes and > on at
    least one.  Identical points do not dominate each other (all copies
    survive, SQL NOT-EXISTS parity).  One sort + one per-group max — no
    pairwise loop."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    order = np.lexsort((-y, -x))  # x desc, then y desc
    xs, ys = x[order], y[order]
    # equal-x groups; each group's max y is its first row (y desc within x)
    new_grp = np.concatenate(([True], xs[1:] != xs[:-1]))
    starts = np.flatnonzero(new_grp)
    gmax = ys[starts]
    # best y among all STRICTLY larger x = running max of previous groups
    best_prev = np.concatenate(([-np.inf], np.maximum.accumulate(gmax)[:-1]))
    grp_survives = gmax > best_prev
    grp_idx = np.cumsum(new_grp) - 1
    row_keep = grp_survives[grp_idx] & (ys == gmax[grp_idx])
    keep[order] = row_keep
    return keep


def skyline2(ds, x_col: str, y_col: str, id_col: str):
    """Distributed 2-D Pareto skyline (the multi-criteria "best trade-off"
    operator): rows not strictly dominated on (x, y).

    Scale shape: every batch reduces to its LOCAL skyline first (a point
    dominated within its batch is dominated globally — the same
    containment argument as the top-n prune), so only per-batch frontier
    candidates move; the final pass runs the same scan over the
    candidates.  The global frontier must fit one task — true of 2-D
    frontiers over correlated web/business data (|skyline| ~ O(log n) for
    independent axes); for anti-correlated axes with huge frontiers,
    partition by an x-range prefilter first.

    ``x_col``/``y_col`` must be orderable numerics/timestamps (compared
    as int64 microseconds for timestamps).  Returns
    Dataset[(id_col, x_col, y_col)].
    """
    def _as64(c: pa.ChunkedArray):
        # any temporal type (timestamp, date32/64) → integer microseconds;
        # numerics pass through
        if pa.types.is_temporal(c.type):
            c = c.cast(pa.timestamp("us")).cast(pa.int64())
        return c.to_numpy(zero_copy_only=False)

    def local(b: pa.Table) -> pa.Table:
        t = b.select([id_col, x_col, y_col])
        if b.num_rows == 0:
            return t
        x, y = _as64(b.column(x_col)), _as64(b.column(y_col))
        return t.filter(pa.array(_skyline2_scan(x, y)))

    cand = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
    # global pass over the bounded candidate set as ONE group
    cand = cand.map_batches(
        lambda b: b.append_column("_g", pa.array(np.zeros(b.num_rows, np.int32))),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def final(g: pa.Table) -> pa.Table:
        t = g.select([id_col, x_col, y_col])
        if g.num_rows == 0:
            return t
        xv, yv = _as64(t.column(x_col)), _as64(t.column(y_col))
        return t.filter(pa.array(_skyline2_scan(xv, yv)))

    return cand.groupby("_g").map_groups(final, batch_format="pyarrow")


def keyed_daily_running(
    ds,
    key_col: str,
    ts_col: str,
    amount_col: str,
    shards: Union[int, str] = "auto",
):
    """Per-key daily totals plus the running (cumulative) total ordered by
    day — ``SUM(amount) OVER (PARTITION BY key ORDER BY day)`` where
    ``amount`` is an int64 column (integer units keep every sum
    order-independent and bit-exact under any partitioning).

    Returns Dataset[(key_col, day:timestamp[us], amount_col:int64,
    ``cum_<amount_col>``:int64)].
    """
    import polars as pl

    if shards == "auto":
        shards = auto_shards(ds, target_rows_per_shard=2_000_000)
    cum_col = f"cum_{amount_col}"

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        day = ts // _US_PER_DAY
        g = (
            pl.DataFrame(
                {
                    key_col: batch.column(key_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "day": day,
                    amount_col: batch.column(amount_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .group_by([key_col, "day"])
            .agg(pl.col(amount_col).sum())
        ).to_arrow()
        return pa.table(
            {
                key_col: g.column(key_col).cast(pa.int64()),
                "day": g.column("day").cast(pa.int64()),
                amount_col: g.column(amount_col).cast(pa.int64()),
            }
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    sharded = pre.map_batches(
        _shard_fn(key_col, int(shards)), batch_format="pyarrow", zero_copy_batch=True
    )

    def scan(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], type=pa.int64()),
                "day": pa.array([], type=pa.timestamp("us")),
                amount_col: pa.array([], type=pa.int64()),
                cum_col: pa.array([], type=pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        keys = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        day = g.column("day").to_numpy(zero_copy_only=False)
        amt = g.column(amount_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((day, keys))
        keys, day, amt = keys[order], day[order], amt[order]
        # fold duplicate (key, day) partials from different batches
        new = np.concatenate(
            ([True], (keys[1:] != keys[:-1]) | (day[1:] != day[:-1]))
        )
        starts = np.flatnonzero(new)
        k2, d2 = keys[starts], day[starts]
        a2 = np.add.reduceat(amt, starts)
        # running sum per key: global cumsum minus the cumsum just before
        # each key's first row
        cum = np.cumsum(a2)
        key_start = np.concatenate(([True], k2[1:] != k2[:-1]))
        seg_starts = np.flatnonzero(key_start)
        offs = np.where(seg_starts > 0, cum[seg_starts - 1], 0)
        seg_lens = np.diff(np.append(seg_starts, len(k2)))
        run = cum - np.repeat(offs, seg_lens)  # sign-safe segment rebase
        return pa.table(
            {
                key_col: pa.array(k2, type=pa.int64()),
                "day": pa.array(d2 * _US_PER_DAY).cast(pa.timestamp("us")),
                amount_col: pa.array(a2, type=pa.int64()),
                cum_col: pa.array(run, type=pa.int64()),
            }
        )

    return sharded.groupby("shard").map_groups(scan, batch_format="pyarrow")


def trailing_daily_sum(ds, ts_col: str, amount_col: str, window: int = 7):
    """Daily totals plus the trailing ``window``-calendar-day sum —
    ``SUM(amount) OVER (ORDER BY day RANGE BETWEEN window-1 PRECEDING AND
    CURRENT ROW)`` over the observed days.  ``amount_col`` must be int64.

    Returns Dataset[(day:timestamp[us], amount_col:int64,
    ``trailing_<amount_col>``:int64)] sorted by day.
    """
    import polars as pl

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    trail_col = f"trailing_{amount_col}"

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
        day = ts // _US_PER_DAY
        g = (
            pl.DataFrame(
                {
                    "day": day,
                    amount_col: batch.column(amount_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .group_by("day")
            .agg(pl.col(amount_col).sum())
        ).to_arrow()
        return pa.table(
            {
                "day": g.column("day").cast(pa.int64()),
                amount_col: g.column(amount_col).cast(pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum(amount_col, alias_name=amount_col))
        .materialize()  # calendar-bounded; consumed twice below
    )

    # observed days (calendar-bounded, never data-bounded) gate the explode
    daily_pd = daily.to_pandas()
    if "day" not in daily_pd.columns or len(daily_pd) == 0:
        # empty stream: the aggregate emitted only schema-less empty blocks
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"day": pa.array([], type=pa.timestamp("us")),
                 amount_col: pa.array([], type=pa.int64()),
                 trail_col: pa.array([], type=pa.int64())}
            )
        )
    obs = np.unique(daily_pd["day"].to_numpy())

    def explode(batch: pa.Table) -> pa.Table:
        day = batch.column("day").to_numpy(zero_copy_only=False)
        amt = batch.column(amount_col).to_numpy(zero_copy_only=False)
        wend = (day[:, None] + np.arange(window)[None, :]).ravel()
        amts = np.repeat(amt, window)
        keep = np.isin(wend, obs)
        return pa.table(
            {
                "day": pa.array(wend[keep], type=pa.int64()),
                trail_col: pa.array(amts[keep], type=pa.int64()),
            }
        )

    trail = (
        daily.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum(trail_col, alias_name=trail_col))
    )

    # attach the day's own total: both sides are calendar-bounded; reuse the
    # big-big join rather than a driver merge so the shape stays distributed
    from ..ray_glue.joins import hash_join

    joined = hash_join(
        daily,
        trail,
        on="day",
        shards=32,
        lschema=pa.schema([("day", pa.int64()), (amount_col, pa.int64())]),
        rschema=pa.schema([("day", pa.int64()), (trail_col, pa.int64())]),
    )

    def publish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.multiply(
                    batch.column("day"), pa.scalar(_US_PER_DAY, type=pa.int64())
                ).cast(pa.timestamp("us")),
                amount_col: batch.column(amount_col),
                trail_col: batch.column(trail_col),
            }
        )

    return joined.map_batches(
        publish, batch_format="pyarrow", zero_copy_batch=True
    ).sort("day")
