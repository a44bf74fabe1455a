"""Z-order layout: Morton kernel exactness, row-group pruning advantage
over single-column sort, count correctness, degenerate axes."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest


def test_morton_interleave_matches_bit_reference():
    from hksketch.ray_glue.layout import morton_interleave

    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, size=200, dtype=np.uint64).astype(np.uint32)
    y = rng.integers(0, 2**32, size=200, dtype=np.uint64).astype(np.uint32)
    z = morton_interleave(x, y)

    def ref(a, b):
        out = 0
        for i in range(32):
            out |= ((int(a) >> i) & 1) << (2 * i)
            out |= ((int(b) >> i) & 1) << (2 * i + 1)
        return out

    for i in range(len(x)):
        assert int(z[i]) == ref(x[i], y[i])
    # z-order preserves 2-D locality: the origin cell is the minimum
    assert morton_interleave(
        np.array([0], dtype=np.uint32), np.array([0], dtype=np.uint32)
    )[0] == 0


def test_zorder_prunes_secondary_axis(ray_session, tmp_path):
    """The selling point: a predicate selective on the SECONDARY column
    scans every row group of a primary-sorted layout but a small
    fraction of the z-ordered one — with identical exact counts."""
    import ray.data as rd

    from hksketch.ray_glue.layout import pruned_range_count, zorder_write

    rng = np.random.default_rng(0)
    n = 60_000
    t = pa.table(
        {"u": pa.array(rng.integers(0, 1000, n), type=pa.int64()),
         "ts": pa.array(rng.integers(0, 1_000_000, n), type=pa.int64())}
    )
    dz = str(tmp_path / "z")
    dn = str(tmp_path / "naive")
    zorder_write(
        rd.from_arrow(t).repartition(4), dz, "u", "ts", rows_per_group=2048
    )
    rd.from_arrow(t).repartition(4).sort("ts").write_parquet(
        dn, row_group_size=2048, mode="overwrite"
    )
    box_u, box_ts = (100.0, 150.0), (0.0, 1e6)
    cz, sz, tz = pruned_range_count(dz, "u", box_u, "ts", box_ts)
    cn, sn, tn = pruned_range_count(dn, "u", box_u, "ts", box_ts)
    u = t["u"].to_numpy()
    ts = t["ts"].to_numpy()
    brute = int(np.count_nonzero((u >= 100) & (u <= 150)))
    assert cz == cn == brute
    # ts-sorted layout can prune (at most) a runt block from the sort's
    # variable splits — never a meaningful fraction of a u predicate
    assert sn >= tn - 2
    assert sz < tz // 2  # z-order skips most groups
    # 2-D box selective on both axes still exact
    c2, _, _ = pruned_range_count(dz, "u", (100.0, 200.0), "ts", (1e5, 2e5))
    want = int(
        np.count_nonzero(
            (u >= 100) & (u <= 200) & (ts >= 1e5) & (ts <= 2e5)
        )
    )
    assert c2 == want


def test_zorder_timestamp_and_breaks(ray_session, tmp_path):
    import ray.data as rd

    from hksketch.ray_glue.layout import pruned_range_count, zorder_write

    rng = np.random.default_rng(1)
    n = 5_000
    base = 1_700_000_000_000_000
    ts_us = base + rng.integers(0, 10**9, n)
    t = pa.table(
        {"u": pa.array(rng.integers(0, 100, n), type=pa.int64()),
         "ts": pa.array(ts_us, type=pa.timestamp("us"))}
    )
    d = str(tmp_path / "zt")
    # skewed-axis path: explicit quantile-ish breaks for u
    zorder_write(
        rd.from_arrow(t).repartition(2), d, "u", "ts",
        rows_per_group=512, breaks_x=[25, 50, 75],
        breaks_y=[base + i * 2.5e8 for i in range(1, 4)],
    )
    lo, hi = float(base + 2e8), float(base + 4e8)
    c, s, tot = pruned_range_count(d, "u", (0.0, 49.0), "ts", (lo, hi))
    u = t["u"].to_numpy()
    tv = ts_us
    want = int(
        np.count_nonzero((u <= 49) & (tv >= lo) & (tv <= hi))
    )
    assert c == want
    assert s <= tot


def test_zorder_constant_axis_degenerate(ray_session, tmp_path):
    import ray.data as rd

    from hksketch.ray_glue.layout import pruned_range_count, zorder_write

    t = pa.table(
        {"u": pa.array([7] * 100, type=pa.int64()),
         "ts": pa.array(range(100), type=pa.int64())}
    )
    d = str(tmp_path / "zc")
    zorder_write(rd.from_arrow(t), d, "u", "ts", rows_per_group=32)
    c, _, _ = pruned_range_count(d, "u", (7.0, 7.0), "ts", (10.0, 19.0))
    assert c == 10
    c0, _, _ = pruned_range_count(d, "u", (8.0, 9.0), "ts", (0.0, 99.0))
    assert c0 == 0


def test_stat_conversion_is_timezone_independent():
    """Row-group timestamp stats are naive UTC instants; converting
    them through the process-local timezone would shift pruning bounds
    by the UTC offset and silently skip overlapping row groups."""
    import time
    from datetime import datetime, timezone

    from hksketch.ray_glue.layout import _as_f

    naive = datetime(2023, 11, 14, 22, 13, 20)  # 1_700_000_000 s UTC
    want_us = 1_700_000_000 * 1_000_000.0

    old_tz = os.environ.get("TZ")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            os.environ["TZ"] = tz
            time.tzset()
            assert _as_f(naive) == want_us, tz
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()

    # tz-aware stats (some writers) normalize to UTC too
    aware = naive.replace(tzinfo=timezone.utc)
    assert _as_f(aware) == want_us
    # non-datetime stats pass through
    assert _as_f(42) == 42.0
