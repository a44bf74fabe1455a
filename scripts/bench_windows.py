"""Streaming-window throughput microbench: events/sec through
WindowedAggregator (tumbling + sliding) and WindowedTopK at a realistic
batch size, single local Ray session.

Usage: python scripts/bench_windows.py [n_events] [batch_size]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16_384

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.windows import WindowedAggregator, WindowedTopK

    rng = np.random.default_rng(0)
    ts = np.sort(rng.integers(0, 3_600_000_000, size=n))  # 1h stream
    keys = rng.integers(0, 10_000, size=n)
    vals = rng.integers(1, 100, size=n)
    skeys = np.array([f"k{v}" for v in keys % 997], dtype=object)

    out = {"n_events": n, "batch_size": bs}

    def feed_agg(make):
        agg = make()
        t0 = time.perf_counter()
        emitted = 0
        try:
            for i in range(0, n, bs):
                agg.add_batch(pa.table(
                    {"key": pa.array(keys[i:i+bs], type=pa.int64()),
                     "ts": pa.array(ts[i:i+bs], type=pa.int64()),
                     "value": pa.array(vals[i:i+bs], type=pa.int64())}
                ))
                emitted += agg.poll().num_rows
            emitted += agg.flush().num_rows
            sec = time.perf_counter() - t0
        finally:
            agg.shutdown()
        return sec, emitted

    sec, emitted = feed_agg(lambda: WindowedAggregator(
        window_seconds=60, allowed_lateness_seconds=5, shards=8
    ))
    out["tumbling"] = {"sec": round(sec, 3),
                       "events_per_sec": round(n / sec),
                       "rows_emitted": emitted}

    sec, emitted = feed_agg(lambda: WindowedAggregator(
        window_seconds=60, allowed_lateness_seconds=5, shards=8,
        slide_seconds=30,
    ))
    out["sliding_2x"] = {"sec": round(sec, 3),
                         "events_per_sec": round(n / sec),
                         "rows_emitted": emitted}

    cfg = sketch_config("bucketed", k=100, width=1 << 13, depth=4,
                        decay=0.9, seed=1)
    agg = WindowedTopK(cfg, k=10, window_seconds=60,
                       allowed_lateness_seconds=5, shards=8)
    t0 = time.perf_counter()
    emitted = 0
    try:
        for i in range(0, n, bs):
            agg.add_batch(skeys[i:i+bs], ts[i:i+bs])
            emitted += agg.poll().num_rows
        emitted += agg.flush().num_rows
        sec = time.perf_counter() - t0
    finally:
        agg.shutdown()
    out["topk_sketch"] = {"sec": round(sec, 3),
                          "events_per_sec": round(n / sec),
                          "rows_emitted": emitted}

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
