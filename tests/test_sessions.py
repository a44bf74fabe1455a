"""Keyed ordered-stream operators: sessionize + last_event_before
(hash-shard + vectorized segment scan — no per-key groups)."""

import numpy as np
import pyarrow as pa
import pytest


def _events(rows):
    uid, ts, typ = zip(*rows)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    return pa.table(
        {
            "user_id": pa.array(uid, type=pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(int(s * 1_000_000), "us") for s in ts],
                type=pa.timestamp("us"),
            ),
            "event_type": pa.array(typ, type=pa.string()),
        }
    )


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd

    from hksketch.pipelines.sessions import sessionize

    # user 1: gaps 100s, exactly-gap (NOT a break), gap+1 (break)
    gap = 1000.0
    t = _events(
        [
            (1, 0, "x"), (1, 100, "x"), (1, 1100, "x"), (1, 2101, "x"),
            (2, 0, "x"),
            (3, 0, "x"), (3, 5000, "x"), (3, 10000, "x"),
        ]
    )
    out = {
        r["user_id"]: r["n_sessions"]
        for r in sessionize(rd.from_arrow(t), gap_seconds=gap, shards=8).take_all()
    }
    assert out == {1: 2, 2: 1, 3: 3}


def test_sessionize_matches_per_user_reference(ray_session):
    """Sharded scan == naive per-user computation on a random stream."""
    import ray.data as rd

    from hksketch.pipelines.sessions import sessionize

    rng = np.random.default_rng(5)
    n = 5000
    uid = rng.integers(0, 200, n)
    secs = rng.integers(0, 30 * 86400, n)
    rows = [(int(u), float(s), "x") for u, s in zip(uid, secs)]
    t = _events(rows)
    got = {
        r["user_id"]: r["n_sessions"]
        for r in sessionize(
            rd.from_arrow(t), gap_seconds=43200.0, shards=16
        ).take_all()
    }
    want = {}
    for u in np.unique(uid):
        s = np.sort(secs[uid == u])
        want[int(u)] = 1 + int((np.diff(s) > 43200).sum())
    assert got == want


def test_last_event_before(ray_session):
    import ray.data as rd

    from hksketch.pipelines.sessions import last_event_before

    t = _events(
        [
            (1, 0, "login"), (1, 50, "login"), (1, 100, "error"), (1, 200, "login"),
            (2, 10, "error"),                      # no prior login → null
            (3, 0, "login"), (3, 5, "click"),      # no error → dropped
            (4, 0, "error"), (4, 10, "login"), (4, 20, "error"),  # login<2nd err
        ]
    )
    rows = {
        r["user_id"]: r
        for r in last_event_before(rd.from_arrow(t), shards=8).take_all()
    }
    assert set(rows) == {1, 2, 4}
    base = np.datetime64("2024-01-01T00:00:00", "us")

    def sec(x):
        return (np.datetime64(x, "us") - base) / np.timedelta64(1, "s")

    assert sec(rows[1]["last_error"]) == 100 and sec(rows[1]["prev_login"]) == 50
    assert rows[2]["prev_login"] is None or rows[2]["prev_login"] != rows[2]["prev_login"]
    assert sec(rows[4]["last_error"]) == 20 and sec(rows[4]["prev_login"]) == 10


def test_shards_must_be_power_of_two():
    from hksketch.pipelines.sessions import _shard_fn

    with pytest.raises(ValueError):
        _shard_fn("user_id", 10)


def test_max_gap_matches_bruteforce(ray_session):
    """Sharded lag scan == naive per-user max gap, incl. singleton users
    (null max) and trailing-singleton reduceat edges."""
    import pandas as pd
    import ray.data as rd

    from hksketch.pipelines.sessions import max_gap

    rng = np.random.default_rng(17)
    n = 4000
    uid = rng.integers(0, 300, n)
    secs = rng.integers(0, 10 * 86400, n)
    rows = [(int(u), float(s), "x") for u, s in zip(uid, secs)]
    # force singleton users, incl. ones hashing anywhere in the shard order
    rows += [(10_001, 5.0, "x"), (10_002, 6.0, "x")]
    t = _events(rows)
    got = (
        max_gap(rd.from_arrow(t).repartition(5), "user_id", "ts", shards=8)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["us"] = df["ts"].astype("int64")
    want = {}
    for u, g in df.groupby("user_id"):
        ts = np.sort(g["us"].to_numpy())
        want[u] = (len(ts) - 1, int(np.diff(ts).max()) if len(ts) > 1 else None)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n_gaps, mx = want[r["user_id"]]
        assert r["n_gaps"] == n_gaps
        if mx is None:
            assert pd.isna(r["max_gap_us"])
        else:
            assert r["max_gap_us"] == mx


def test_max_gap_empty(ray_session):
    import ray.data as rd

    from hksketch.pipelines.sessions import max_gap

    import pyarrow as pa

    et = pa.table(
        {"user_id": pa.array([], type=pa.int64()),
         "ts": pa.array([], type=pa.timestamp("us"))}
    )
    assert max_gap(rd.from_arrow(et), "user_id", "ts", shards=4).count() == 0


def test_transition_counts_equal_ts_tiebreak(ray_session):
    """Equal timestamps order by event_id — the pair direction flips if
    the tie-break is wrong; verified against DuckDB's LAG window."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hksketch.pipelines.sessions import transition_counts

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = pa.table(
        {"event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
         "user_id": pa.array([7, 7, 7, 8, 8, 9], type=pa.int64()),
         "ts": pa.array([ts0, ts0, ts0 + 10, ts0 + 5, ts0 + 5, ts0]),
         "event_type": pa.array(["a", "b", "c", "x", "y", "solo"])}
    )
    got = (
        transition_counts(rd.from_arrow(rows).repartition(3), shards=4)
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", rows)
    want = con.sql("""
        WITH seq AS (
          SELECT event_type, LAG(event_type) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df().reset_index(drop=True)
    assert got["prev_type"].tolist() == want["prev_type"].tolist()
    assert got["next_type"].tolist() == want["next_type"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    # the equal-ts pairs specifically: (a→b) for user 7, (x→y) for user 8
    pairs = set(zip(got["prev_type"], got["next_type"]))
    assert ("a", "b") in pairs and ("x", "y") in pairs
    assert ("b", "a") not in pairs and ("y", "x") not in pairs


def test_session_intervals_constructed(ray_session):
    """Intervals match hand-computed sessions; counts agree with
    sessionize; composition with interval_count_join answers 'active
    sessions at t' exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hksketch.pipelines.intervals import interval_count_join
    from hksketch.pipelines.sessions import session_intervals, sessionize

    H = 3_600_000_000  # 1h in us
    rows = [  # (user, ts)
        (1, 0), (1, 1 * H), (1, 2 * H),          # session A: [0, 2h]
        (1, 20 * H), (1, 21 * H),                # session B: [20h, 21h]
        (2, 1 * H),                              # session C: [1h, 1h]
        (2, 30 * H), (2, 35 * H),                # session D: [30h, 35h]
    ]
    ev = pa.table(
        {"user_id": pa.array([u for u, _ in rows], type=pa.int64()),
         "ts": pa.array([t for _, t in rows], type=pa.timestamp("us")),
         "event_id": pa.array(range(len(rows)), type=pa.int64())}
    )
    ds = rd.from_arrow(ev).repartition(3)
    iv = (
        session_intervals(ds, gap_seconds=12 * 3600, shards=8)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    want = [
        (1, 0, 0, 2 * H), (1, 1, 20 * H, 21 * H),
        (2, 0, 1 * H, 1 * H), (2, 1, 30 * H, 35 * H),
    ]
    got = list(
        zip(iv["user_id"], iv["session_idx"],
            iv["session_start"], iv["session_end"])
    )
    assert got == want
    # agreement with sessionize's counts
    cnt = (
        sessionize(ds, gap_seconds=12 * 3600, shards=8)
        .to_pandas().set_index("user_id")["n_sessions"]
    )
    from collections import Counter

    per_key = Counter(iv["user_id"])
    assert {k: per_key[k] for k in cnt.index} == cnt.to_dict()

    # composition: how many sessions (any user) contain each probe time
    probes = pa.table(
        {"event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
         "ts": pa.array(
             [1 * H, 5 * H, 20 * H + 1800_000_000, 40 * H],
             type=pa.int64())}
    )
    out = (
        interval_count_join(
            rd.from_arrow(probes),
            session_intervals(ds, gap_seconds=12 * 3600, shards=8),
            "ts", "event_id", "session_start", "session_end",
            bucket_width=12 * H, shards=8,
        )
        .to_pandas().set_index("pid").sort_index()["n_containing"]
    )
    # t=1h: sessions A and C contain it; t=5h: none; t=20.5h: B; t=40h: none
    assert out.tolist() == [2, 0, 1, 0]
