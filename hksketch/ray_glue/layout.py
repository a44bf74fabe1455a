"""Z-order (Morton) data layout: multi-column-locality Parquet writes +
row-group-pruned 2-D range scans.

The lakehouse layout trick (Delta/Iceberg ``OPTIMIZE ZORDER BY``): a
sort on ``(a, b)`` clusters only ``a`` — a range predicate on ``b``
touches every file.  Interleaving the BITS of both columns into one
Morton key and sorting by it gives every file a small min/max box in
BOTH dimensions, so Parquet row-group statistics prune 2-D range
queries on either or both columns.  At 100 TB this is the difference
between scanning a shard and scanning the corpus; the write is ONE
ordinary distributed sort (Ray Data's sample-based range shuffle), no
extra machinery.

Pieces:

- ``morton_interleave``: vectorized 32↔32-bit interleave via the
  classic mask-spread sequence (exact vs a per-bit reference, tested).
- ``zorder_write``: min/max-scale both columns to 32-bit grids (two
  tiny aggregates), interleave, ``sort("z")``, write Parquet with
  bounded row-group sizes.  Linear scaling is the honest default and
  its skew caveat is explicit: heavily-skewed axes should pass
  ``breaks`` (e.g. quantiles from the library's t-digest/KLL sketches)
  to equalize cell occupancy.
- ``pruned_range_count``: exact COUNT over a 2-D range that consults
  row-group min/max statistics first and reads only overlapping
  groups; returns ``(count, groups_scanned, groups_total)`` so tests
  (and capacity planning) can ASSERT the pruning instead of trusting
  it.

Reference scope note: the reference engine has no storage layout
surface; this extends the engine's write/scan path (`SURVEY.md` §
extensions) the way ``sim/ivf.py``/``text/index.py`` extend its index
surface.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone
from typing import Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

U64 = np.uint64


def _spread32(x: np.ndarray) -> np.ndarray:
    """Spread each of 32 bits to even positions of a uint64
    (…b2_b1_b0 → …0b2_0b1_0b0)."""
    x = x.astype(np.uint64)
    x = (x | (x << U64(16))) & U64(0x0000FFFF0000FFFF)
    x = (x | (x << U64(8))) & U64(0x00FF00FF00FF00FF)
    x = (x | (x << U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << U64(2))) & U64(0x3333333333333333)
    x = (x | (x << U64(1))) & U64(0x5555555555555555)
    return x


def morton_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """uint32 grids → uint64 Morton keys (x in even bits, y in odd)."""
    return _spread32(x) | (_spread32(y) << U64(1))


def _scale_to_grid(
    v: np.ndarray, lo: float, hi: float, breaks: Optional[np.ndarray]
) -> np.ndarray:
    """Column values → uint32 grid cells: linear min/max scaling, or
    ``breaks``-based bucketing (sorted ascending; cell = searchsorted)
    for skewed axes."""
    if breaks is not None:
        return np.searchsorted(breaks, v, side="right").astype(np.uint32)
    if hi <= lo:
        return np.zeros(len(v), dtype=np.uint32)
    span = float(hi) - float(lo)
    f = (v.astype(np.float64) - float(lo)) / span
    return np.minimum(
        (f * 4294967295.0), 4294967295.0
    ).astype(np.uint32)


def zorder_write(
    ds,
    path: str,
    col_x: str,
    col_y: str,
    rows_per_group: int = 4096,
    breaks_x: Optional[Sequence[float]] = None,
    breaks_y: Optional[Sequence[float]] = None,
) -> str:
    """Write ``ds`` to Parquet clustered by the Morton key of
    ``(col_x, col_y)`` (both numeric/timestamp).  Returns ``path``.

    One distributed sort on the z column; the z column itself is NOT
    written (layout metadata, not data).  Row groups are bounded at
    ``rows_per_group`` so statistics stay fine-grained enough to prune.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min

    bx = np.asarray(breaks_x, dtype=np.float64) if breaks_x is not None else None
    by = np.asarray(breaks_y, dtype=np.float64) if breaks_y is not None else None

    def as_num(col: pa.ChunkedArray) -> pa.ChunkedArray:
        if pa.types.is_timestamp(col.type):
            return col.cast(pa.int64())
        return col

    if bx is None or by is None:
        probe = ds.map_batches(
            lambda b: pa.table(
                {"__x": as_num(b.column(col_x)).cast(pa.float64()),
                 "__y": as_num(b.column(col_y)).cast(pa.float64())}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        agg = probe.aggregate(
            Min("__x", alias_name="xlo"), Max("__x", alias_name="xhi"),
            Min("__y", alias_name="ylo"), Max("__y", alias_name="yhi"),
        )
        xlo, xhi = agg["xlo"], agg["xhi"]
        ylo, yhi = agg["ylo"], agg["yhi"]
    else:
        xlo = xhi = ylo = yhi = 0.0

    def add_z(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("__z", pa.array([], type=pa.uint64()))
        xv = as_num(b.column(col_x)).combine_chunks().cast(
            pa.float64()
        ).to_numpy(zero_copy_only=False)
        yv = as_num(b.column(col_y)).combine_chunks().cast(
            pa.float64()
        ).to_numpy(zero_copy_only=False)
        z = morton_interleave(
            _scale_to_grid(xv, xlo, xhi, bx),
            _scale_to_grid(yv, ylo, yhi, by),
        )
        return b.append_column("__z", pa.array(z, type=pa.uint64()))

    zds = ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
    sorted_ds = zds.sort("__z").drop_columns(["__z"])
    sorted_ds.write_parquet(
        path,
        row_group_size=int(rows_per_group),
        mode="overwrite",
    )
    return path


def pruned_range_count(
    path: str,
    col_x: str,
    x_range: Tuple[float, float],
    col_y: str,
    y_range: Tuple[float, float],
) -> Tuple[int, int, int]:
    """Exact row count with ``x_range[0] <= x <= x_range[1] AND
    y_range[0] <= y <= y_range[1]`` (inclusive), reading ONLY row groups
    whose statistics overlap the box.  Returns
    ``(count, groups_scanned, groups_total)``.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    xlo, xhi = x_range
    ylo, yhi = y_range
    count = 0
    scanned = 0
    total = 0
    dset = pads.dataset(path, format="parquet")
    for frag in dset.get_fragments():
        f = pq.ParquetFile(frag.path)
        schema = f.schema_arrow
        xi = schema.get_field_index(col_x)
        yi = schema.get_field_index(col_y)
        for g in range(f.metadata.num_row_groups):
            total += 1
            rg = f.metadata.row_group(g)
            sx = rg.column(xi).statistics
            sy = rg.column(yi).statistics
            if sx is not None and sy is not None and sx.has_min_max and sy.has_min_max:
                if (_as_f(sx.max) < xlo or _as_f(sx.min) > xhi
                        or _as_f(sy.max) < ylo or _as_f(sy.min) > yhi):
                    continue  # statistics exclude the box: skip the bytes
            scanned += 1
            t = f.read_row_group(g, columns=[col_x, col_y])
            xv = _numeric(t.column(col_x))
            yv = _numeric(t.column(col_y))
            count += int(
                np.count_nonzero(
                    (xv >= xlo) & (xv <= xhi) & (yv >= ylo) & (yv <= yhi)
                )
            )
    return count, scanned, total


def _as_f(v) -> float:
    """Row-group stat → comparable float (timestamps arrive as
    datetime).

    Parquet timestamp statistics come back as NAIVE datetimes whose
    wall-clock values are the stored (UTC-based) instants; converting
    via ``datetime.timestamp()`` would interpret them in the process's
    LOCAL timezone and shift the comparison by the UTC offset —
    silently skipping row groups that overlap the query box on any
    non-UTC host.  Route through Arrow's lossless int64-µs cast
    instead, which never consults the local zone.
    """
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return float(pa.scalar(v, pa.timestamp("us")).cast(pa.int64()).as_py())
    return float(v)


def _numeric(col: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    return col.combine_chunks().cast(pa.float64()).to_numpy(
        zero_copy_only=False
    )
