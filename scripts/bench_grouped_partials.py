"""Microbench: grouped-partial blob bytes vs group content on a long-tail
host distribution (round-2 VERDICT #4 'done' evidence).

Generates a Zipf host distribution (many one-row hosts), runs the grouped
partial fn on one batch, and reports partial bytes bucketed by group row
count — demonstrating bytes ∝ content, not configured sketch width.

Run: python scripts/bench_grouped_partials.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hksketch.ray_glue.aggregate import sketch_config
from hksketch.ray_glue.stages import make_partial_sketch_fn


def main():
    rng = np.random.default_rng(11)
    n = 200_000
    # Zipf hosts: a handful of giants, a long tail of singletons
    ranks = np.minimum((rng.zipf(1.3, n) - 1), 99_999)
    hosts = np.array([f"h{r}.example" for r in ranks])
    keys = rng.integers(0, 5000, n)
    t = pa.table({"host": pa.array(hosts), "key": pa.array(keys)})

    cfg = sketch_config(
        "bucketed", k=4096, width=1 << 15, depth=4, decay=0.9, seed=3
    )
    fn = make_partial_sketch_fn(cfg, "key", group_col="host")
    t0 = time.perf_counter()
    out = fn(t)
    dt = time.perf_counter() - t0

    sizes = np.array([len(b) for b in out.column("sketch").to_pylist()])
    counts = out.column("n_rows").to_numpy()
    buckets = [(1, 1), (2, 10), (11, 100), (101, 1000), (1001, 10**9)]
    rep = {}
    for lo, hi in buckets:
        m = (counts >= lo) & (counts <= hi)
        if m.any():
            rep[f"rows_{lo}_{hi}"] = {
                "groups": int(m.sum()),
                "avg_bytes": int(sizes[m].mean()),
                "max_bytes": int(sizes[m].max()),
            }
    dense_bytes = 0
    sk = __import__(
        "hksketch.ray_glue.aggregate", fromlist=["make_sketch"]
    ).make_sketch(cfg)
    sk.add_batch(pa.array([f"k{i}" for i in rng.integers(0, 50_000, 200_000)]))
    dense_bytes = len(sk.to_bytes())
    print(
        json.dumps(
            {
                "batch_rows": n,
                "groups": len(sizes),
                "batch_sec": round(dt, 3),
                "total_partial_bytes": int(sizes.sum()),
                "dense_reference_bytes": dense_bytes,
                "by_group_rows": rep,
            }
        )
    )


if __name__ == "__main__":
    main()
