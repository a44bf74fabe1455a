"""asof_join scale microbench: one big-big point-in-time lookup.

Synthesises a trades/quotes-shaped pair (left n_l rows, right n_r rows,
n_keys instruments, int64 µs times), runs ray_glue.joins.asof_join
end-to-end (consumed by count, never materialized to the driver), and
prints one JSON line with wall time and rows/sec.  Usage:

    python scripts/bench_asof.py [n_l] [n_r] [n_keys] [num_cpus] [exchange]
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
    n_l = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_r = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_keys = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else int(
        os.environ.get("RAY_GRAFT_CPUS", "32")
    )
    exchange = sys.argv[5] if len(sys.argv) > 5 else "wide"

    # one Rust thread per Ray worker (inherited by workers): an unpinned
    # polars pool (32 threads/task) oversubscribes the box and corrupts
    # the parallelism-level scaling signal — same discipline as bench.py
    os.environ.setdefault("POLARS_MAX_THREADS", "1")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from hksketch.ray_glue.joins import asof_join

    rng = np.random.default_rng(42)

    def mk(n: int, extra: str) -> pa.Table:
        return pa.table(
            {"k": pa.array(rng.integers(0, n_keys, n)),
             "t": pa.array(rng.integers(0, 86_400_000_000, n)),
             extra: pa.array(rng.random(n))}
        )

    lt, rt = mk(n_l, "lv"), mk(n_r, "rv")
    blocks = max(cpus, 16)
    L = ray.data.from_arrow(lt).repartition(blocks)
    R = ray.data.from_arrow(rt).repartition(blocks)
    schema_l, schema_r = lt.schema, rt.schema
    L.materialize(); R.materialize()  # exclude fixture cost from the mark

    t0 = time.perf_counter()
    out = asof_join(L, R, on="k", t_on="t", lschema=schema_l,
                    rschema=schema_r, exchange=exchange)
    import pyarrow.compute as pc

    def matched(b: pa.Table) -> pa.Table:
        return pa.table(
            {"m": pc.cast(pc.is_valid(b.column("rv")), pa.int64())}
        )

    n_matched = out.map_batches(
        matched, batch_format="pyarrow", zero_copy_batch=True
    ).sum("m")
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "asof_join_sec", "value": round(wall, 3), "unit": "sec",
        "n_left": n_l, "n_right": n_r, "n_keys": n_keys,
        "rows_per_sec": round((n_l + n_r) / wall),
        "matched": int(n_matched), "num_cpus": cpus, "exchange": exchange,
        "load_avg": os.getloadavg(),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
