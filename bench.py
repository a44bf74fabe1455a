"""Headline benchmark: flagship pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ..., "tokens_per_sec": ...}

``--scaling`` runs the same bench in two fresh processes (num_cpus=8 and 32)
and prints both throughputs + scaling efficiency (the sandbox proxy for the
north rule's N-vs-4N-node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    # warm the page cache so we measure compute+shuffle, not first disk read
    n_docs = 0
    n_events = 0
    for t in ("documents", "events", "lineitem"):
        meta = pq.read_table(f"{sf_dir}/{t}.parquet")
        if t == "documents":
            n_docs = meta.num_rows
        if t == "events":
            n_events = meta.num_rows
        del meta

    # warm the Ray worker pool (untimed): every worker imports the library
    # stack (hksketch, polars, numpy) once here instead of inside the first
    # timed query.
    import ray.data as rd

    from hksketch.text.tokenize import tokenize_column

    rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]).map_batches(
        lambda b: tokenize_column(b.column("text")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).count()

    qs = e.queries()
    bench_queries = [
        "topk_tokens_sketch",
        "topk_tokens_exact",
        "topk_users_sketch",
        "distinct_tokens_hll",
        "quantiles_value_tdigest",
        "q1_pricing_summary",
        "events_hourly",
        "dedup_exact" if "dedup_exact" in qs else None,
        "minhash_near_dupes" if "minhash_near_dupes" in qs else None,
        "knn_bruteforce" if "knn_bruteforce" in qs else None,
    ]
    times: dict[str, float] = {}
    for name in bench_queries:
        if name is None:
            continue
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        # consume lazily-built results
        if hasattr(res, "to_pandas") and not hasattr(res, "num_rows"):
            res.to_pandas()
        times[name] = round(time.perf_counter() - t0, 4)

    # web-pages heavy pass (the BASELINE.json docs/sec metric) on the
    # deterministic Common-Crawl-style fixture
    from hksketch.pipelines.fixtures import generate_webpages
    from hksketch.pipelines.flagship import bench_webpages

    pages_dir = generate_webpages(
        os.environ.get("HK_BENCH_PAGES_DIR", "/tmp/hkfix/webpages_bench"),
        n_pages=int(os.environ.get("HK_BENCH_PAGES", "200000")),
        n_hosts=20_000,
        vocab_size=50_000,
        seed=42,
        files=32,
    )
    t0 = time.perf_counter()
    web = bench_webpages(pages_dir)
    web_sec = round(time.perf_counter() - t0, 4)
    times["webpages_pass"] = web_sec

    total = round(sum(times.values()), 4)
    out = {
        "metric": "hksketch_headline_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs_per_sec": round(web["n_pages"] / web_sec, 1),
        "tokens_per_sec": round(web["total_tokens"] / web_sec, 1),
        "web_pages": web["n_pages"],
        "docs": n_docs,
        "events": n_events,
    }
    ray.shutdown()
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        results = {}
        for n in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
        t8, t32 = results[8]["value"], results[32]["value"]
        eff = (t8 / t32) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "hksketch_scaling",
                    "sec_8cpu": t8,
                    "sec_32cpu": t32,
                    "speedup": round(t8 / t32, 3),
                    "scaling_efficiency": round(eff, 3),
                    "queries_8": results[8]["queries"],
                    "queries_32": results[32]["queries"],
                    "sf": sf_dir,
                }
            )
        )
        return

    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
