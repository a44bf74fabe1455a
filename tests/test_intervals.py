"""Interval/band containment join: brute-force equality, boundary
inclusivity, bucket-boundary safety, replication cap, degenerate inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _pts(ts, ids=None):
    ids = list(range(len(ts))) if ids is None else ids
    return pa.table(
        {"event_id": pa.array(ids, type=pa.int64()),
         "ts": pa.array(ts, type=pa.int64())}
    )


def _ivs(pairs):
    return pa.table(
        {"start": pa.array([s for s, _ in pairs], type=pa.int64()),
         "end": pa.array([e for _, e in pairs], type=pa.int64())}
    )


def test_interval_count_matches_bruteforce(ray_session):
    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join

    rng = np.random.default_rng(0)
    t = rng.integers(0, 100_000, size=400).tolist()
    s = rng.integers(0, 100_000, size=200)
    ln = rng.integers(0, 5_000, size=200)
    ivs = list(zip(s.tolist(), (s + ln).tolist()))
    out = (
        interval_count_join(
            rd.from_arrow(_pts(t)).repartition(3),
            rd.from_arrow(_ivs(ivs)).repartition(2),
            "ts", "event_id", "start", "end",
            bucket_width=4_096, shards=16,
        )
        .to_pandas().set_index("pid").sort_index()
    )
    assert len(out) == len(t)  # every point present, zeros included
    ts_arr = np.array(t)
    for i in rng.choice(len(t), size=60, replace=False):
        want = sum(1 for a, b in ivs if a <= t[i] <= b)
        assert out.loc[i, "n_containing"] == want, (i, t[i])
    # full equality, vectorized
    sa = np.sort(s)
    ea = np.sort(s + ln)
    want_all = (
        np.searchsorted(sa, ts_arr, side="right")
        - np.searchsorted(ea, ts_arr, side="left")
    )
    got = out.sort_index()["n_containing"].to_numpy()
    assert (got == want_all).all()


def test_bounds_inclusive_and_bucket_boundaries(ray_session):
    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join

    w = 100
    # interval exactly [200, 300]: points at 199,200,300,301; point 300
    # sits on a bucket boundary (bucket 3) while the interval starts in
    # bucket 2 — replication must cover it
    out = (
        interval_count_join(
            rd.from_arrow(_pts([199, 200, 300, 301])),
            rd.from_arrow(_ivs([(200, 300)])),
            "ts", "event_id", "start", "end",
            bucket_width=w, shards=8,
        )
        .to_pandas().set_index("pid").sort_index()["n_containing"]
    )
    assert out.tolist() == [0, 1, 1, 0]


def test_negative_timestamps_floor_correctly(ray_session):
    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join

    out = (
        interval_count_join(
            rd.from_arrow(_pts([-150, -100, -50, 0, 50])),
            rd.from_arrow(_ivs([(-100, 0)])),
            "ts", "event_id", "start", "end",
            bucket_width=64, shards=8,
        )
        .to_pandas().set_index("pid").sort_index()["n_containing"]
    )
    assert out.tolist() == [0, 1, 1, 1, 0]


def test_band_count_join_symmetric(ray_session):
    import ray.data as rd

    from hksketch.pipelines.intervals import band_count_join

    pts = _pts([0, 1000, 5000])
    centers = pa.table({"cts": pa.array([900, 1100, 9000], type=pa.int64())})
    out = (
        band_count_join(
            rd.from_arrow(pts), rd.from_arrow(centers),
            "ts", "event_id", "cts", delta=150, shards=8,
        )
        .to_pandas().set_index("pid").sort_index()["n_containing"]
    )
    # point 1000: centers 900 and 1100 both within ±150 (inclusive)
    assert out.tolist() == [0, 2, 0]


def test_replication_cap_raises(ray_session):
    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join

    # raised inside the Ray task -> surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match="max_replication"):
        interval_count_join(
            rd.from_arrow(_pts([0])),
            rd.from_arrow(_ivs([(0, 10_000_000)])),
            "ts", "event_id", "start", "end",
            bucket_width=10, shards=8,
        ).materialize()
    with pytest.raises(ValueError):
        interval_count_join(
            rd.from_arrow(_pts([0])), rd.from_arrow(_ivs([(0, 1)])),
            "ts", "event_id", "start", "end", bucket_width=0,
        )


def test_inverted_and_empty_inputs(ray_session):
    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join

    # inverted interval contains nothing; empty interval table -> zeros
    out = (
        interval_count_join(
            rd.from_arrow(_pts([10, 20])),
            rd.from_arrow(_ivs([(50, 40)])),
            "ts", "event_id", "start", "end",
            bucket_width=64, shards=8,
        )
        .to_pandas()["n_containing"]
    )
    assert out.tolist() == [0, 0]


def test_timestamp_us_columns(ray_session):
    """timestamp[us] inputs take the µs-exact int64 path."""
    import ray.data as rd

    from hksketch.pipelines.intervals import band_count_join

    base = 1_700_000_000_000_000
    pts = pa.table(
        {"event_id": pa.array([0, 1], type=pa.int64()),
         "ts": pa.array([base, base + 10_000_000], type=pa.timestamp("us"))}
    )
    centers = pa.table(
        {"cts": pa.array([base + 4_000_000], type=pa.timestamp("us"))}
    )
    out = (
        band_count_join(
            rd.from_arrow(pts), rd.from_arrow(centers),
            "ts", "event_id", "cts", delta=5_000_000, shards=8,
        )
        .to_pandas().set_index("pid").sort_index()["n_containing"]
    )
    assert out.tolist() == [1, 0]


def test_hot_bucket_bounded(ray_session):
    """Skew edge: 10^4 intervals crammed into ONE time bucket must stay
    vectorized (two searchsorted probes per point), not pairwise — the
    whole join completes in seconds with exact counts."""
    import time

    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join

    rng = np.random.default_rng(5)
    s = rng.integers(0, 1000, size=10_000)
    ivs = list(zip(s.tolist(), (s + rng.integers(0, 50, size=10_000)).tolist()))
    pts = rng.integers(0, 1000, size=1_000).tolist()
    t0 = time.monotonic()
    out = (
        interval_count_join(
            rd.from_arrow(_pts(pts)), rd.from_arrow(_ivs(ivs)),
            "ts", "event_id", "start", "end",
            bucket_width=1 << 20, shards=8,  # everything in bucket 0
        )
        .to_pandas().set_index("pid").sort_index()
    )
    elapsed = time.monotonic() - t0
    assert elapsed < 30, f"hot bucket took {elapsed:.1f}s"
    sa = np.sort(s)
    ea = np.sort(np.array([e for _, e in ivs]))
    tarr = np.array(pts)
    want = (
        np.searchsorted(sa, tarr, side="right")
        - np.searchsorted(ea, tarr, side="left")
    )
    got = out["n_containing"].to_numpy()
    assert (got == want).all()
