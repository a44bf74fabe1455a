"""Microbench: per-group caps at unbounded GROUP count (round-4 VERDICT
#4 note).  The reduce side groups by a fixed-cardinality key-hash shard
(default 64) with one lexsort + run scan per shard, so cost must grow
with ROWS, not with the number of distinct groups.  Times cap_per_group
at rising group counts over a fixed row count and prints one JSON line.

Usage: python scripts/bench_caps_groups.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from hksketch.pipelines.caps import cap_per_group

    rows = 2_000_000
    out = {"rows": rows, "cap_n": 3, "shards": 64, "cells": []}
    rng = np.random.default_rng(17)
    ids = rng.permutation(rows).astype(np.int64)
    for n_groups in (10_000, 100_000, 1_000_000):
        g = rng.integers(0, n_groups, rows).astype(np.int64)
        t = pa.table({"grp": pa.array(g), "id": pa.array(ids)})
        ds = rd.from_arrow(t).repartition(16)
        t0 = time.perf_counter()
        got = cap_per_group(ds, "grp", "id", n=3, shards=64)
        n_out = got.count()
        sec = time.perf_counter() - t0
        out["cells"].append(
            {"groups": n_groups, "sec": round(sec, 3),
             "rows_per_sec": round(rows / sec, 1),
             "out_rows": int(n_out),
             "us_per_group": round(sec / n_groups * 1e6, 2)}
        )
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(json.dumps(out) + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()
