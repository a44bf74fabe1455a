"""Microbench (round-3 VERDICT #2 'Done' criterion): driver memory of the
k-means partial fold must stay FLAT as the number of per-batch partial rows
grows 10x — the fold runs as worker-side tree tasks (`tree_fold_partials`),
so the driver only ever receives one (k, dim) + one (k,) array.

Prints one JSON line with tracemalloc driver peaks at N and 10N partials.
"""

import json
import os
import sys
import tracemalloc

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def partial_tables(n_rows: int, k: int, dim: int, rows_per_block: int = 64):
    rng = np.random.default_rng(7)
    blocks = []
    for s in range(0, n_rows, rows_per_block):
        m = min(rows_per_block, n_rows - s)
        blocks.append(
            pa.table(
                {
                    "sums": pa.array(
                        list(rng.standard_normal((m, k * dim))),
                        type=pa.list_(pa.float64()),
                    ),
                    "counts": pa.array(
                        list(rng.integers(0, 50, (m, k)).astype(np.float64)),
                        type=pa.list_(pa.float64()),
                    ),
                }
            )
        )
    return blocks


def fold_peak(n_partials: int, k: int = 8, dim: int = 64) -> dict:
    import ray
    import ray.data as rd

    from hksketch.sim.cluster import tree_fold_partials

    blocks = partial_tables(n_partials, k, dim)
    refs = [ray.put(b) for b in blocks]
    ds = rd.from_arrow_refs(refs)
    tracemalloc.start()
    S, n = tree_fold_partials(ds, cols=("sums", "counts"), shapes=((k, dim), (k,)))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # correctness spot check vs a direct driver-side fold
    exp_S = np.zeros((k, dim))
    exp_n = np.zeros(k)
    for b in blocks:
        exp_S += (
            b.column("sums").combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(b.num_rows, k, dim).sum(axis=0)
        )
        exp_n += (
            b.column("counts").combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(b.num_rows, k).sum(axis=0)
        )
    assert np.allclose(S, exp_S) and np.allclose(n, exp_n)
    return {"n_partials": n_partials, "driver_fold_peak_bytes": int(peak)}


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    lo = fold_peak(200)
    hi = fold_peak(2000)
    ratio = hi["driver_fold_peak_bytes"] / max(1, lo["driver_fold_peak_bytes"])
    print(
        json.dumps(
            {
                "metric": "kmeans_fold_driver_peak",
                "at_200_partials_bytes": lo["driver_fold_peak_bytes"],
                "at_2000_partials_bytes": hi["driver_fold_peak_bytes"],
                "peak_ratio_10x_rows": round(ratio, 3),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
