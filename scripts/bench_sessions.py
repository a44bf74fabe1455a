"""Microbench: sessionization at 10M events — per-user map_groups (the
round-1 shape) vs hash-shard + lexsort + vectorized segment scan.

Usage: python scripts/bench_sessions.py [n_events] [n_users]
Prints one JSON line; paste results into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_events(n: int, users: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, users, n).astype(np.int64)
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 30 * 86400 * 1_000_000, n).astype("timedelta64[us]")
    return pa.table(
        {"user_id": pa.array(uid),
         "ts": pa.array(ts, type=pa.timestamp("us")),
         "event_id": pa.array(np.arange(n, dtype=np.int64))}
    )


def old_shape(ds):
    """Round-1 pathology: one pandas group per user."""

    def sessions(g):
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds()
        n = 1 + int((gaps > 43200).sum())
        return pa.table(
            {"user_id": pa.array([int(g["user_id"].iloc[0])], type=pa.int64()),
             "n_sessions": pa.array([n], type=pa.int64())}
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    users = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from hksketch.pipelines.sessions import sessionize

    t = make_events(n, users)
    path = "/tmp/bench_sessions_events"
    os.makedirs(path, exist_ok=True)
    import pyarrow.parquet as pq

    f = os.path.join(path, f"events_{n}_{users}.parquet")
    if not os.path.exists(f):
        pq.write_table(t, f)

    import ray.data as rd

    from hksketch.ray_glue.partitioning import auto_shards

    ds = rd.read_parquet(f, columns=["user_id", "ts"])
    shards = auto_shards(ds, target_rows_per_shard=2_000_000)
    t0 = time.perf_counter()
    new_rows = sessionize(ds, shards=shards).count()
    new_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    old_rows = old_shape(rd.read_parquet(f)).count()
    old_sec = time.perf_counter() - t0

    assert new_rows == old_rows == users, (new_rows, old_rows)
    # per-task memory bound evidence: the largest shard group's row count
    # (== the one in-memory Arrow table a scan task sorts)
    from hksketch.hashing import splitmix64

    uid = t.column("user_id").to_numpy().astype(np.uint64)
    per_shard = np.bincount(
        (splitmix64(uid) & np.uint64(shards - 1)).astype(np.int64),
        minlength=shards,
    )
    print(json.dumps(
        {"metric": "sessionize_10M", "n_events": n, "n_users": users,
         "auto_shards": int(shards),
         "max_shard_rows": int(per_shard.max()),
         "new_sec": round(new_sec, 2), "old_sec": round(old_sec, 2),
         "speedup": round(old_sec / new_sec, 1),
         "new_events_per_sec": int(n / new_sec)}
    ))
    ray.shutdown()


if __name__ == "__main__":
    main()
