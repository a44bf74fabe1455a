"""Cluster job entrypoint — the script you hand to ``ray job submit``:

    ray job submit --working-dir . -- \
        python scripts/run_flagship_job.py --input <pages_parquet_dir> \
            --output /tmp/flagship_out --checkpoint-dir /tmp/flagship_ckpt

Runs the flagship web-pages pass (top-k tokens + hostnames, HLL distinct
urls, per-doc stats, LSH candidates) with per-partition checkpointing for
the token sketch, writes the top-k tables as Parquet and a metrics JSON.
On a cluster, ``ray.init()`` with no address connects to the running
cluster; standalone it starts a local one.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="webpages parquet dir")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--k", type=int, default=1000)
    p.add_argument("--seed", type=int, default=12345)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # on a cluster (ray job submit) this attaches to the running cluster;
        # standalone it starts a local head
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from hksketch.pipelines.flagship import bench_webpages, sketch_to_sorted_table
    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.checkpoint import run_checkpointed_sketch

    t0 = time.perf_counter()
    out = bench_webpages(args.input, seed=args.seed)
    wall = time.perf_counter() - t0

    # checkpointed (resumable) token sketch over the same input
    files = sorted(
        os.path.join(args.input, f)
        for f in os.listdir(args.input)
        if f.endswith(".parquet")
    )
    cfg = sketch_config(
        "bucketed", k=max(args.k * 4, 4096), width=1 << 15, depth=4, decay=0.9,
        seed=args.seed,
    )
    blob, ck_metrics = run_checkpointed_sketch(
        files, args.checkpoint_dir, cfg, key_col="text", tokenize=True
    )

    os.makedirs(args.output, exist_ok=True)
    pq.write_table(out["topk_tokens"], os.path.join(args.output, "topk_tokens.parquet"))
    pq.write_table(out["topk_hosts"], os.path.join(args.output, "topk_hosts.parquet"))
    pq.write_table(
        sketch_to_sorted_table(blob, "token", limit=args.k),
        os.path.join(args.output, "topk_tokens_checkpointed.parquet"),
    )
    metrics = {
        "wall_sec": round(wall, 3),
        "n_pages": out["n_pages"],
        "total_tokens": out["total_tokens"],
        "distinct_urls_est": out["distinct_urls"],
        "lsh_candidates": out["lsh_candidates"],
        "docs_per_sec": round(out["n_pages"] / wall, 1),
        "checkpoint": ck_metrics,
        "stage_sec": out.get("stage_sec", {}),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
