"""Distributed connected components over a near-duplicate pair graph.

The dedup family's capstone: pair operators (``ngram``, ``minhash``,
``simhash``, ``sim.knn``) emit EDGES; picking one canonical document per
duplicate CLUSTER needs the transitive closure — A~B and B~C must land A,
B, C in one group even when A~C was never emitted.  This implements the
alternating large-star / small-star min-label contraction of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SoCC'14) — the
standard shuffle-bounded CC algorithm for exactly this workload —
expressed Ray-Data-first:

- each half-step is ONE hash-sharded shuffle (``groupby(shard)``) whose
  per-shard body is fully vectorized numpy (lexsort → boundary-diff runs
  → ``minimum.reduceat`` per-node mins → mask + take emission), the same
  run-scan shape as ``dedup/ngram.py``;
- edges are deduplicated per shard every step, so the edge multiset
  shrinks monotonically toward one star per component;
- the driver sees only an 8-byte-per-iteration convergence signature
  (unique-edge count + mixed 64-bit hash sum), never an edge;
- converges in O(log n) rounds (proven for the alternating schedule); a
  ``max_iters`` cap raises loudly rather than silently stopping early.

Labels are the component MINIMUM doc id — deterministic, so the result is
SQL-expressible (recursive-CTE transitive closure) and runs under the
driver's hash-exact oracle.

Reference scope note: the reference engine stops at pair emission
(`/root/reference/src/lib.rs` has no clustering); this operator is part
of the LLM-data-pipeline extension surface, like the dedup family it
completes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..hashing import splitmix64

U64 = np.uint64
_MIX = U64(0x9E3779B97F4A7C15)

_LABELS_EMPTY = pa.table(
    {"doc_id": pa.array([], type=pa.int64()),
     "cluster_id": pa.array([], type=pa.int64())}
)


def _unique_pairs(u: np.ndarray, v: np.ndarray):
    """Deduplicate (u, v) rows, returning sorted unique pairs."""
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    if len(u):
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        u, v = u[keep], v[keep]
    return u, v


def _star_shard_fn(node_of, shards):
    """map_batches stage: tag each edge row with the shard of its grouping
    node so ``groupby(shard)`` co-locates every edge of that node."""

    def fn(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        g = node_of(u, v)
        shard = (splitmix64(g.view(U64)) & U64(shards - 1)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    return fn


def _large_star_group(grp) -> pa.Table:
    """Large-star on one shard: for each node x (rows are the SYMMETRIC
    adjacency restricted to x's shard), m = min(N(x) ∪ {x}); emit (y, m)
    for strictly larger neighbors y > x.  Kiveris et al. Alg. 2."""
    x = grp["u"].to_numpy()
    y = grp["v"].to_numpy()
    x, y = _unique_pairs(x, y)
    if not len(x):
        return pa.table({"u": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64())})
    starts = np.flatnonzero(np.concatenate(([True], x[1:] != x[:-1])))
    run_min = np.minimum(np.minimum.reduceat(y, starts), x[starts])
    seg = np.repeat(np.arange(len(starts)), np.diff(np.concatenate((starts, [len(x)]))))
    m = run_min[seg]
    keep = y > x
    out_u, out_v = _unique_pairs(y[keep], m[keep])
    return pa.table({"u": pa.array(out_u, type=pa.int64()),
                     "v": pa.array(out_v, type=pa.int64())})


def _small_star_group(grp) -> pa.Table:
    """Small-star on one shard: edges arrive directed high→low (h, l);
    for each h, m = min(l's); emit (x, m) for x in N_small(h) ∪ {h},
    x ≠ m.  Kiveris et al. Alg. 3."""
    h = grp["u"].to_numpy()
    low = grp["v"].to_numpy()
    h, low = _unique_pairs(h, low)
    if not len(h):
        return pa.table({"u": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64())})
    starts = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
    run_min = np.minimum.reduceat(low, starts)  # all l < h, so min < h
    seg = np.repeat(np.arange(len(starts)), np.diff(np.concatenate((starts, [len(h)]))))
    m = run_min[seg]
    # neighbors x = low, x != m
    keep = low != m
    out_u = np.concatenate((low[keep], h[starts]))
    out_v = np.concatenate((m[keep], run_min))
    out_u, out_v = _unique_pairs(out_u, out_v)
    return pa.table({"u": pa.array(out_u, type=pa.int64()),
                     "v": pa.array(out_v, type=pa.int64())})


def _signature(ds) -> tuple[int, int, int]:
    """(edge-row count, sum of high-32 hash words, sum of low-32 words) —
    a batching-invariant convergence fingerprint computed with one Sum
    aggregate; the driver never sees an edge row.  Each per-edge summand
    is < 2^32, so int64 sums stay exact below 2^31 edges per run (beyond
    that, shard the signature — the comparison only needs equality)."""
    from ray.data.aggregate import Sum

    def sig(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        hi = np.maximum(u, v).view(U64)
        lo = np.minimum(u, v).view(U64)
        mix = splitmix64(hi * _MIX ^ splitmix64(lo))
        s_hi = int(np.sum(mix >> U64(32), dtype=np.uint64)) if len(mix) else 0
        s_lo = int(np.sum(mix & U64(0xFFFFFFFF), dtype=np.uint64)) if len(mix) else 0
        return pa.table({"n": pa.array([len(u)], type=pa.int64()),
                         "sh": pa.array([s_hi], type=pa.int64()),
                         "sl": pa.array([s_lo], type=pa.int64())})

    got = ds.map_batches(sig, batch_format="pyarrow", zero_copy_batch=True)
    row = got.aggregate(
        Sum("n", alias_name="n"), Sum("sh", alias_name="sh"),
        Sum("sl", alias_name="sl"),
    )
    return (int(row["n"] or 0), int(row["sh"] or 0), int(row["sl"] or 0))


def connected_components(
    edges,
    id_a: str = "id_a",
    id_b: str = "id_b",
    shards: int = 64,
    max_iters: int = 64,
    small_graph_edges: int = 250_000,
):
    """Label every node of an undirected edge list with its component's
    minimum node id.

    ``edges``: a ``ray.data.Dataset`` or ``pyarrow.Table`` with two int64
    id columns (self-loops and duplicate/reversed edges are tolerated).
    Returns a ``Dataset`` of ``(doc_id, cluster_id)`` — one row per node
    that appears in an edge; isolated documents never enter the graph and
    are their own implicit singletons.

    Scale: per round, two hash-sharded shuffles whose volume is the
    current edge count (non-increasing after round 1) and a scalar
    convergence aggregate.  No driver-side edge materialization.
    """
    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(edges.select([id_a, id_b]))
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"u": pa.array(np.maximum(a, b), type=pa.int64()),
                         "v": pa.array(np.minimum(a, b), type=pa.int64())})

    ds = edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.materialize()
    prev = _signature(ds)
    if prev[0] == 0:
        return rd.from_arrow(_LABELS_EMPTY)

    # Size-adaptive: a small edge set (the common case for near-dup graphs
    # at modest corpus sizes — pair output is threshold-bounded) does not
    # pay O(log n) rounds of shuffle fixed costs; ONE remote task runs
    # path-compressed union-find and returns the labels.  The signature's
    # edge count is already computed, so the choice costs nothing, and the
    # star-contraction path stays the 100-TB answer.
    if prev[0] <= small_graph_edges:
        import ray as _ray

        @_ray.remote
        def _uf(*blocks: pa.Table) -> pa.Table:
            # refs must be top-level args (variadic) so Ray resolves them;
            # refs nested inside a list arrive unresolved.
            t = pa.concat_tables(blocks)
            u = t.column("u").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            nodes = np.unique(np.concatenate((u, v)))
            idx = {int(n): i for i, n in enumerate(nodes)}
            parent = np.arange(len(nodes), dtype=np.int64)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(u, v):
                ra, rb = find(idx[int(a)]), find(idx[int(b)])
                if ra != rb:
                    # union toward the smaller NODE id so labels match the
                    # min-label contract directly
                    lo, hi = (ra, rb) if nodes[ra] <= nodes[rb] else (rb, ra)
                    parent[hi] = lo
            roots = np.array([find(i) for i in range(len(nodes))])
            return pa.table(
                {"doc_id": pa.array(nodes, type=pa.int64()),
                 "cluster_id": pa.array(nodes[roots], type=pa.int64())}
            )

        labels_t = _ray.get(_uf.remote(*ds.to_arrow_refs()))
        return rd.from_arrow(labels_t)

    for _ in range(max_iters):
        # ---- large-star: group by EVERY endpoint (symmetric adjacency)
        def sym(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            return pa.table(
                {"u": pa.array(np.concatenate((u, v)), type=pa.int64()),
                 "v": pa.array(np.concatenate((v, u)), type=pa.int64())}
            )

        big = (
            ds.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(
                _star_shard_fn(lambda u, v: u, shards),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("shard")
            .map_groups(_large_star_group, batch_format="pandas")
        )
        # ---- small-star: edges already high→low from emission? large-star
        # emits (y, m) with y > m, i.e. canonical high→low — group by high.
        small = (
            big.map_batches(
                _star_shard_fn(lambda u, v: u, shards),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("shard")
            .map_groups(_small_star_group, batch_format="pandas")
        )
        ds = small.materialize()
        cur = _signature(ds)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(edge signature still changing: {prev} -> {cur})"
        )

    # Converged: the edge set is a union of stars (member, root).  Labels =
    # every member row plus a self row per root; a member may still carry
    # one edge per shard path, so dedup per node with a final min fold.
    def label_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(np.concatenate((u, v)), type=pa.int64()),
             "cluster_id": pa.array(np.concatenate((v, v)), type=pa.int64())}
        )

    from ray.data.aggregate import Min

    labels = (
        ds.map_batches(label_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Min("cluster_id", alias_name="cluster_id"))
    )
    return labels
