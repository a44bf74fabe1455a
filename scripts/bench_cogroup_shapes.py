"""Microbench: per-distinct-token cogroup (groupby(token).map_groups)
vs sharded hash_join for the df-attach shape used by
``source_distinctive_terms`` / ``pmi_bigrams``.

The question the round-4 verdict asked: at web-scale vocabulary
(10^6-10^8 distinct tokens) is the attach step bounded per group?  A
``map_groups`` over the token key makes one Python call per DISTINCT
token, so its cost grows with vocabulary; the join shape pays one
polars hash join per key-range shard (shard count fixed), so its cost
grows only with ROWS.  This script times both shapes on a synthetic tf
table at increasing distinct-token counts and prints one JSON line.

Usage: python scripts/bench_cogroup_shapes.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tf(n_tokens: int, sources: int = 10, seed: int = 7) -> pa.Table:
    """tf table: each token appears in 1..sources sources (Zipf-ish)."""
    rng = np.random.default_rng(seed)
    reps = rng.integers(1, sources + 1, size=n_tokens)
    tok_idx = np.repeat(np.arange(n_tokens, dtype=np.int64), reps)
    src = rng.integers(0, sources, size=len(tok_idx))
    tf = rng.integers(1, 50, size=len(tok_idx)).astype(np.int64)
    toks = pa.array([f"t{i:08d}" for i in tok_idx], type=pa.string())
    return pa.table(
        {"source": pa.array([f"s{j}" for j in src], type=pa.string()),
         "token": toks, "tf": pa.array(tf, type=pa.int64())}
    )


def shape_map_groups(ds, n_src: float):
    """The ROUND-4 shape (kept here only as the comparison baseline):
    one Python call per distinct token."""
    def score_token_group(grp) -> pa.Table:
        tfv = grp["tf"].to_numpy().astype(np.float64)
        df = float(len(grp))
        x = tfv * np.log(n_src / df)
        tfidf = np.floor(x * 1000.0 + 0.5) / 1000.0
        return pa.table(
            {"source": pa.array(grp["source"], type=pa.string()),
             "token": pa.array(grp["token"], type=pa.string()),
             "tfidf": pa.array(tfidf, type=pa.float64())}
        )

    return ds.groupby("token").map_groups(
        score_token_group, batch_format="pandas"
    )


def shape_hash_join(ds, n_src: float):
    """The ROUND-5 shape: vectorized Count + sharded hash_join."""
    from ray.data.aggregate import Count

    from hksketch.ray_glue.joins import hash_join

    dfc = ds.groupby("token").aggregate(Count(alias_name="df"))
    tf_schema = pa.schema([("source", pa.string()),
                           ("token", pa.string()), ("tf", pa.int64())])
    df_schema = pa.schema([("token", pa.string()), ("df", pa.int64())])
    joined = hash_join(ds, dfc, on="token",
                       lschema=tf_schema, rschema=df_schema)

    def score(b: pa.Table) -> pa.Table:
        tfv = b.column("tf").to_numpy().astype(np.float64)
        dfv = b.column("df").to_numpy().astype(np.float64)
        x = tfv * np.log(n_src / dfv)
        tfidf = np.floor(x * 1000.0 + 0.5) / 1000.0
        return pa.table(
            {"source": b.column("source").cast(pa.string()),
             "token": b.column("token").cast(pa.string()),
             "tfidf": pa.array(tfidf, type=pa.float64())}
        )

    return joined.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)


def run_one(shape, t: pa.Table) -> tuple[float, int, float]:
    import ray.data as rd

    start = time.perf_counter()
    out = shape(rd.from_arrow(t).repartition(8), 10.0)
    n = out.count()
    sec = time.perf_counter() - start
    return sec, n, float(np.float64(n) / sec)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    results = {"shapes": {}}
    # the old shape is only run where it finishes in sane time; its
    # per-token cost is what disqualifies it, and that is visible by 1e5
    plans = [
        ("map_groups_per_token", shape_map_groups, [10_000, 100_000]),
        ("hash_join_sharded", shape_hash_join,
         [10_000, 100_000, 1_000_000]),
    ]
    for name, shape, sizes in plans:
        rows = []
        for n_tok in sizes:
            t = make_tf(n_tok)
            sec, n, rps = run_one(shape, t)
            rows.append({"distinct_tokens": n_tok, "rows": n,
                         "sec": round(sec, 3),
                         "rows_per_sec": round(rps, 1),
                         "us_per_distinct_token": round(sec / n_tok * 1e6, 2)})
            print(f"{name} @ {n_tok} tokens: {sec:.2f}s "
                  f"({rps:,.0f} rows/s)", file=sys.stderr)
        results["shapes"][name] = rows
    mg = results["shapes"]["map_groups_per_token"][-1]
    hj = [r for r in results["shapes"]["hash_join_sharded"]
          if r["distinct_tokens"] == mg["distinct_tokens"]][0]
    results["speedup_at_1e5"] = round(mg["sec"] / hj["sec"], 2)
    line = json.dumps(results)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(line + "\n")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
