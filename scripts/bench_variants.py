"""Kernel microbenchmarks mirroring the reference's criterion suites
(`/root/reference/benches/topk_add.rs`, `topk_list.rs`,
`topk_vs_bucketed.rs:13-17`): insert throughput for the three variants at
the reference's config (1M Zipf(s=1.2) u64 keys, K=100, width=4096,
depth=4, decay=0.9) plus ``list()`` latency at k=5000, and the same for
uniform keys.  Single process — this measures the NumPy kernels, not Ray.

Usage: python scripts/bench_variants.py [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hksketch.sketch import BucketedTopK, CuckooTopK, TopK  # noqa: E402


def zipf_bounded(rng, s, n, size):
    x = rng.zipf(s, size=size)
    over = x > n
    while over.any():
        x[over] = rng.zipf(s, size=int(over.sum()))
        over = x > n
    return x.astype(np.uint64)


def bench_add(cls, keys, batch: int = 100_000) -> float:
    tk = cls(100, 4096, 4, 0.9, seed=1)
    t0 = time.perf_counter()
    for i in range(0, len(keys), batch):
        tk.add_batch(keys[i : i + batch])
    return len(keys) / (time.perf_counter() - t0)


def bench_list(cls, keys) -> float:
    tk = cls(5000, 1 << 14, 4, 0.9, seed=1)
    tk.add_batch(keys)
    t0 = time.perf_counter()
    for _ in range(20):
        tk.list()
    return (time.perf_counter() - t0) / 20


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    # host load on this shared box swings identical runs 3-5x minute to
    # minute; every cell runs HK_VARIANTS_REPEATS times, the table keeps
    # the fastest (best-case, least-contended) and the raw runs ship in
    # the output so medians can be re-derived
    repeats = int(os.environ.get("HK_VARIANTS_REPEATS", "3"))
    rng = np.random.default_rng(0xACC04ACC)
    zipf_keys = zipf_bounded(rng, 1.2, 1_000_000, n)
    uni_keys = rng.integers(0, 1_000_000, size=n).astype(np.uint64)
    out = {
        "n_keys": n,
        "config": "K=100 width=4096 depth=4 decay=0.9",
        "policy": f"fastest of {repeats} runs per cell; raw runs in *_runs",
    }
    for cls in (TopK, BucketedTopK, CuckooTopK):
        zr = [round(bench_add(cls, zipf_keys) / 1e6, 2) for _ in range(repeats)]
        ur = [round(bench_add(cls, uni_keys) / 1e6, 2) for _ in range(repeats)]
        lr = [round(bench_list(cls, zipf_keys) * 1e3, 2) for _ in range(repeats)]
        out[cls.__name__] = {
            "zipf1.2_melem_per_s": max(zr),
            "uniform_melem_per_s": max(ur),
            "list_k5000_ms": min(lr),
            "zipf_runs": zr,
            "uniform_runs": ur,
            "list_runs_ms": lr,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
