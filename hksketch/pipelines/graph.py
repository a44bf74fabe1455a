"""Distributed PageRank over an edge Dataset.

The site-level authority score of the classic web pipeline (Page et al.
1999; Common-Crawl publishes exactly this as its host-level ranks), as
an iterative Ray Data job: per iteration ONE big-big `hash_join` ships
each node's rank to its out-edges and ONE combiner groupby folds the
contributions per destination.  Ranks live in a Dataset keyed by node —
the driver holds loop control only, never the rank vector.

Determinism (the property every other iterative kernel here pins —
k-means integer partials, CC signature folds): ranks are int64
fixed-point micro-units and every per-iteration update is integer
arithmetic (``contrib = rank // out_degree``, ``rank' = base +
(d_permille · inflow) // 1000``), so sums are order-independent and the
result is bit-identical under any partitioning, block structure, or
cluster size — verified against a single-process numpy recompute with
the same quantization.

Contract: every node must have at least one OUT-edge (no dangling-mass
redistribution is performed; feed symmetric/bidirectional edges — e.g.
both directions of a bipartite graph — to satisfy this trivially).
Each iteration's ranks are ``materialize()``d: without it the lazy
lineage re-executes all prior iterations per step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ray_glue.joins import auto_join, hash_join

SCALE = 10**12  # total rank mass in micro-units


def pagerank(
    edges,
    damping_permille: int = 850,
    iters: int = 6,
    shards: int | str = "auto",
    checkpoint_dir: str | None = None,
):
    """``edges``: Dataset[(src:int64, dst:int64)], pre-deduplicated.
    Returns Dataset[(node:int64, rank_micro:int64)] after ``iters``
    synchronous iterations from the uniform start.  ``damping_permille``
    is the damping factor in thousandths (850 = 0.85).

    ``checkpoint_dir``: when set, each completed iteration's rank table
    is written as partitioned Parquet (``iter=K/``) with a marker file,
    and a rerun RESUMES from the highest completed iteration ≤ ``iters``
    — because every update is integer arithmetic, the resumed run is
    bit-identical to an uninterrupted one (tested).  A ``params.json``
    lineage record (damping, node/edge counts, scale) guards against
    resuming onto a different graph or config: mismatch raises instead
    of silently mixing runs (same refusal contract as
    ``ray_glue/checkpoint.py``).  The directory must be on storage every
    worker and the driver share (see ``ray_glue/storage.py``)."""
    import json
    import os

    from ray.data.aggregate import Sum

    from .ops import exact_counts

    if not (0 <= damping_permille <= 1000):
        raise ValueError(f"damping_permille must be in [0, 1000], got "
                         f"{damping_permille}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if shards == "auto":
        # resolve ONCE from the edge-table size with a low floor: the
        # hash_join default floor of 32 is sized for one-shot joins, but
        # an iterative loop pays the per-shard shuffle overhead every
        # iteration, so small graphs should run few shards (still
        # footer-scaled up for real corpora: 2M edge rows per shard)
        from ..ray_glue.partitioning import auto_shards

        shards = auto_shards(
            edges, target_rows_per_shard=2_000_000, min_shards=4
        )

    # materialize the edge list once: it is consumed by the degree count,
    # the degree join AND (via deg) the node universe — an unmaterialized
    # caller chain (e.g. the lineitem⋈orders build) would otherwise
    # re-execute for each consumer (~3× the build cost, measured)
    edges = edges.materialize()
    deg = exact_counts(edges, "src", count_name="out_deg").materialize()
    edges_deg = hash_join(
        edges, deg, on="src", shards=shards,
        lschema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        rschema=pa.schema([("src", pa.int64()), ("out_deg", pa.int64())]),
    ).materialize()

    # node universe = distinct src (== distinct dst under the no-dangling
    # contract); initial rank = SCALE // N each
    nodes = deg
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"node": pa.array([], type=pa.int64()),
                 "rank_micro": pa.array([], type=pa.int64())}
            )
        )
    init = SCALE // n_nodes
    base = ((1000 - damping_permille) * SCALE // 1000) // n_nodes

    def init_fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {"node": b.column("src").cast(pa.int64()),
             "rank_micro": pa.array(
                 np.full(n, init, dtype=np.int64), type=pa.int64())}
        )

    rank_schema = pa.schema([("node", pa.int64()), ("rank_micro", pa.int64())])
    start_iter = 0
    ranks = None
    if checkpoint_dir:
        import ray.data as rd

        os.makedirs(checkpoint_dir, exist_ok=True)
        params = {
            "damping_permille": int(damping_permille),
            "n_nodes": int(n_nodes),
            "n_edges": int(edges_deg.count()),
            "scale": SCALE,
        }
        pfile = os.path.join(checkpoint_dir, "params.json")
        if os.path.exists(pfile):
            with open(pfile) as f:
                prior = json.load(f)
            if prior != params:
                raise ValueError(
                    f"pagerank checkpoint at {checkpoint_dir} was written "
                    f"for different params/graph ({prior} != {params}); "
                    f"refusing to resume — point at a fresh directory"
                )
        else:
            with open(pfile, "w") as f:
                json.dump(params, f)
        # resume from the highest iteration with a completion marker
        for k in range(int(iters), 0, -1):
            if os.path.exists(os.path.join(checkpoint_dir, f"_done_{k}")):
                # hive-style dir name makes the reader infer an `iter`
                # partition column — project it back out
                ranks = (
                    rd.read_parquet(os.path.join(checkpoint_dir, f"iter={k}"))
                    .map_batches(
                        lambda b: b.select(["node", "rank_micro"]).cast(
                            rank_schema
                        ),
                        batch_format="pyarrow", zero_copy_batch=True,
                    )
                    .materialize()
                )
                start_iter = k
                break
    if ranks is None:
        ranks = nodes.map_batches(
            init_fn, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    # pin the rank dataset's block count across iterations: the aggregate
    # otherwise emits a few more blocks than it consumed each round, and
    # the per-iteration cost compounds (measured +2 blocks/iter, join wall
    # 2s → 9s by iter 6 before this)
    rank_blocks = max(1, ranks.num_blocks())

    # zero-inflow row per node, union'd into every iteration's fold: a node
    # with out-edges but no inflow this round (possible on asymmetric
    # graphs that still satisfy the out-edge contract) must keep a rank row
    # — the inner join of the NEXT iteration would otherwise drop its
    # out-edges and the node would silently vanish (review finding)
    zero_inflow = nodes.map_batches(
        lambda b: pa.table(
            {"dst": b.column("src").cast(pa.int64()),
             "inflow": pa.array(
                 np.zeros(b.num_rows, dtype=np.int64), type=pa.int64())}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _it in range(start_iter, int(iters)):
        # auto_join: while the rank table fits the broadcast threshold
        # (node-count-sized — true until ~10^6 nodes) each iteration is a
        # ZERO-shuffle map over the edge blocks; beyond it the sharded
        # hash join takes over.  Measured: 4 iterations on a 97k-edge /
        # 1.6k-node graph 19.9s → 3.1s (the per-iteration all-to-all was
        # pure fixed cost at this scale).
        j = auto_join(
            edges_deg, ranks, on="src", right_on="node", shards=shards,
            lschema=pa.schema(
                [("src", pa.int64()), ("dst", pa.int64()),
                 ("out_deg", pa.int64())]
            ),
            rschema=rank_schema,
        )

        def contrib(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.schema(
                    [("dst", pa.int64()), ("inflow", pa.int64())]
                ).empty_table()
            r = b.column("rank_micro").to_numpy(zero_copy_only=False)
            d = b.column("out_deg").to_numpy(zero_copy_only=False)
            c = r // d  # integer split of the node's mass per out-edge
            import polars as pl

            g = (
                pl.from_arrow(
                    pa.table({"dst": b.column("dst"),
                              "inflow": pa.array(c, type=pa.int64())})
                )
                .group_by("dst")
                .agg(pl.col("inflow").sum())
            ).to_arrow()
            return g.select(["dst", "inflow"]).cast(
                pa.schema([("dst", pa.int64()), ("inflow", pa.int64())])
            )

        inflow = (
            j.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True)
            .union(zero_inflow)
            .groupby("dst")
            .aggregate(Sum("inflow", alias_name="inflow"))
        )

        def update(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return rank_schema.empty_table()
            inf = b.column("inflow").to_numpy(zero_copy_only=False)
            new = base + (damping_permille * inf) // 1000
            return pa.table(
                {"node": b.column("dst").cast(pa.int64()),
                 "rank_micro": pa.array(new, type=pa.int64())}
            )

        ranks = (
            inflow.map_batches(
                update, batch_format="pyarrow", zero_copy_batch=True
            )
            .repartition(rank_blocks)
            .materialize()
        )
        if checkpoint_dir:
            it_dir = os.path.join(checkpoint_dir, f"iter={_it + 1}")
            # overwrite mode clears any stale PARTIAL files from a crashed
            # earlier attempt at this iteration — without it write_parquet
            # appends uniquely-named files next to the stale ones and a
            # later resume reads duplicated rank rows (review finding)
            ranks.write_parquet(it_dir, mode="overwrite")
            # marker written AFTER the parquet lands: a crash mid-write
            # leaves no marker, so resume ignores the partial directory
            with open(os.path.join(checkpoint_dir, f"_done_{_it + 1}"), "w"):
                pass

    return ranks


def pagerank_local(
    src: np.ndarray,
    dst: np.ndarray,
    damping_permille: int = 850,
    iters: int = 6,
):
    """Single-process recompute with the IDENTICAL integer quantization —
    the bit-equality oracle for :func:`pagerank` in tests.  Returns
    (nodes sorted asc, rank_micro)."""
    nodes, inv_src = np.unique(src, return_inverse=True)
    n = len(nodes)
    idx_dst = np.searchsorted(nodes, dst)
    deg = np.bincount(inv_src, minlength=n).astype(np.int64)
    rank = np.full(n, SCALE // n, dtype=np.int64)
    base = ((1000 - damping_permille) * SCALE // 1000) // n
    for _ in range(iters):
        c = rank[inv_src] // deg[inv_src]
        inflow = np.zeros(n, dtype=np.int64)
        np.add.at(inflow, idx_dst, c)
        rank = base + (damping_permille * inflow) // 1000
    return nodes, rank
