"""CLI entry points mirroring the reference's example programs.

- ``wordcount``: text file(s) → tokenize → HeavyKeeper top-k → stdout
  ``item count`` lines (the `examples/word_count.rs` pipeline, Ray-Data
  shape: read_text → fused tokenize+sketch partials → tree merge).
- ``flows``: fixed-width 13-byte flow trace files → top-k flows with
  accuracy metrics vs the exact oracle (the `examples/ip_files.rs`
  harness).

Owns its Ray session (guarded init) — library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _ensure_ray(num_cpus: int | None):
    """Init Ray if this process doesn't have a session yet; only then does
    the CLI own (and later shut down) the session."""
    import ray

    owned = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        owned = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, owned


def cmd_wordcount(args) -> int:
    ray, owned = _ensure_ray(args.num_cpus)
    import pyarrow as pa

    import ray.data as rd

    from .ray_glue.aggregate import sketch_config
    from .ray_glue.stages import global_sketch
    from .pipelines.flagship import sketch_to_sorted_table

    ds = rd.read_text(args.file)
    cfg = sketch_config(
        args.variant, k=max(args.k * 4, 64), width=args.width, depth=args.depth,
        decay=args.decay, seed=args.seed,
    )
    blob = global_sketch(ds, cfg, key_col="text", tokenize=True)
    out = sketch_to_sorted_table(blob, "item", limit=args.k)
    for item, count in zip(out.column("item").to_pylist(), out.column("count").to_pylist()):
        print(f"{item} {count}")
    if owned:
        ray.shutdown()
    return 0


def cmd_flows(args) -> int:
    ray, owned = _ensure_ray(args.num_cpus)
    from .metrics import score_results, true_topk
    from .pipelines.ops import exact_counts
    from .ray_glue.aggregate import sketch_config
    from .ray_glue.stages import global_sketch
    from .sketch import sketch_from_bytes
    from .sources.flows import format_flow_keys, read_flow_records

    ds = read_flow_records(args.path).materialize()
    n = ds.count()
    t0 = time.perf_counter()
    cfg = sketch_config(
        args.variant, k=args.k, width=args.width, depth=args.depth,
        decay=args.decay, seed=args.seed,
    )
    blob = global_sketch(ds, cfg, key_col="flow")
    wall = time.perf_counter() - t0
    sk = sketch_from_bytes(blob)
    reported = sk.list()

    # SMALL-SCALE ORACLE ONLY: the exact ground-truth dict is collected to
    # the driver so accuracy can be scored against it — this mirrors the
    # reference harness (examples/ip_files.rs:56-93) and is a SCORING
    # step, not a pipeline stage; at web scale the distinct-flow table
    # does not fit one process and the sketch IS the product (run without
    # scoring, or score against a sampled key set).
    truth = {
        r["flow"]: r["count"]
        for r in exact_counts(ds, "flow").take_all()
    }
    hit_ratio, are_rep, are_true = score_results(reported, truth, args.k)
    print(json.dumps({
        "packets": n,
        "flows": len(truth),
        "mpps": round(n / wall / 1e6, 3),
        "hit_ratio": round(hit_ratio, 4),
        "are_reported": round(are_rep, 6),
        "are_true_topk": round(are_true, 6),
    }))
    import pyarrow as pa

    top10 = pa.array([item for item, _ in reported[:10]], type=pa.binary())
    for label, (item, count) in zip(
        format_flow_keys(top10).to_pylist(), reported[:10]
    ):
        print(f"{label} {count}")
    if owned:
        ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="hksketch")
    sub = p.add_subparsers(dest="cmd", required=True)

    wc = sub.add_parser("wordcount", help="top-k words of a text file")
    wc.add_argument("file")
    wc.add_argument("-k", type=int, default=10)
    wc.add_argument("--width", type=int, default=8192)
    wc.add_argument("--depth", type=int, default=2)
    wc.add_argument("--decay", type=float, default=0.95)
    wc.add_argument("--seed", type=int, default=12345)
    wc.add_argument("--variant", default="bucketed", choices=["topk", "bucketed", "cuckoo"])
    wc.add_argument("--num-cpus", type=int, default=None)
    wc.set_defaults(fn=cmd_wordcount)

    fl = sub.add_parser("flows", help="top-k flows of fixed-width binary traces")
    fl.add_argument("path")
    fl.add_argument("-k", type=int, default=1000)
    fl.add_argument("--width", type=int, default=8192)
    fl.add_argument("--depth", type=int, default=4)
    fl.add_argument("--decay", type=float, default=0.95)
    fl.add_argument("--seed", type=int, default=12345)
    fl.add_argument("--variant", default="bucketed", choices=["topk", "bucketed", "cuckoo"])
    fl.add_argument("--num-cpus", type=int, default=None)
    fl.set_defaults(fn=cmd_flows)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
