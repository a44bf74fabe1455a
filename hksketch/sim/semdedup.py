"""SemDeDup: semantic deduplication over an embedding column.

Public recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means
cluster the (normalized) embedding space, then within each cluster mark
items whose cosine similarity to an earlier-kept item exceeds a
threshold as semantic duplicates.  Only within-cluster pairs are ever
compared, so the all-pairs cost is bounded by the largest cluster, and
the cluster count is the scale knob (the paper uses 50k clusters for
LAION-440M; here the default suits the test fixtures).

Distributed shape:

- ``kmeans_fit`` (``sim/cluster.py`` — bit-deterministic integer
  partials, worker-side tree fold) trains centroids on a scattered
  sample;
- ONE map pass tags each row with its cluster (broadcast centroids);
- ONE ``groupby(cluster).map_groups`` shuffle co-locates each cluster;
  inside the group task the duplicate rule is evaluated with a
  column-tiled dot-product scan — memory O(rows × tile), never the full
  n² similarity matrix at once;
- the output Dataset carries ``(vec_id, cluster, is_dup,
  max_prior_cos)`` scalars only; embeddings never reach the driver.

Duplicate rule (deterministic under any partitioning): ids ascending
within the cluster; row i is a duplicate iff
``max_{j < i} cos(x_j, x_i) > threshold`` — i.e. one kept representative
per ε-ball, the representative being the lowest id.  Strict ``>`` so a
pair sitting exactly at the threshold survives.

Partitioning assumption (documented per the operator contract): one
cluster's rows must fit in a worker's heap.  ``max_cluster_rows`` raises
with guidance to raise ``n_clusters`` rather than silently thrashing —
at web scale clusters are kept small by construction (n_clusters ∝
corpus size / target cluster size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .cluster import kmeans_fit
from .knn import _emb_matrix, _normalize

_OUT_SCHEMA = pa.schema(
    [("vec_id", pa.int64()), ("cluster", pa.int32()),
     ("is_dup", pa.bool_()), ("max_prior_cos", pa.float64())]
)


def semdedup_flags(
    ds,
    n_clusters: int = 8,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    iters: int = 10,
    max_cluster_rows: int = 200_000,
    tile: int = 1024,
    centroids: np.ndarray | None = None,
):
    """Dataset[(vec_id, cluster, is_dup, max_prior_cos)] — one flag row
    per input row.  ``max_prior_cos`` is null for the first (lowest-id)
    row of each cluster.  Pass precomputed ``centroids`` to skip the fit
    (e.g. when composing with other per-cluster stages)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    C = centroids if centroids is not None else kmeans_fit(
        ds, n_clusters, emb_col, id_col, seed, iters
    )
    cref = ray.put(np.asarray(C, dtype=np.float64))

    def tag(b: pa.Table) -> pa.Table:
        Ck = ray.get(cref)
        if b.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "cluster": pa.array([], type=pa.int32()),
                 emb_col: b.column(emb_col)}
            )
        m = _normalize(_emb_matrix(b.column(emb_col)))
        a = np.argmax(m @ Ck.T, axis=1).astype(np.int32)
        return pa.table(
            {id_col: b.column(id_col).cast(pa.int64()),
             "cluster": pa.array(a),
             emb_col: b.column(emb_col)}
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def prune(grp: pa.Table) -> pa.Table:
        n = grp.num_rows
        if n == 0:
            return _OUT_SCHEMA.empty_table()
        if n > max_cluster_rows:
            raise ValueError(
                f"semdedup cluster has {n} rows > max_cluster_rows="
                f"{max_cluster_rows}; raise n_clusters so clusters fit a "
                f"worker's heap (cost is O(cluster_rows^2) dot products)"
            )
        ids = grp.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = _normalize(_emb_matrix(grp.column(emb_col)))[order]
        best = np.full(n, -np.inf)
        # column-tiled scan: columns c0:c1 compare against all EARLIER
        # rows only (strict lower-triangle mask per tile)
        for c0 in range(1, n, tile):
            c1 = min(c0 + tile, n)
            S = M[:c1] @ M[c0:c1].T  # (c1, c1-c0)
            rows = np.arange(c1)[:, None]
            cols = np.arange(c0, c1)[None, :]
            S[rows >= cols] = -np.inf
            best[c0:c1] = S.max(axis=0)
        has_prior = np.isfinite(best)
        cos_out = np.where(has_prior, np.round(best, 6), 0.0)
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()),
             "cluster": grp.column("cluster").take(
                 pa.array(order)).cast(pa.int32()),
             "is_dup": pa.array(has_prior & (best > threshold)),
             "max_prior_cos": pa.array(cos_out, type=pa.float64(),
                                       mask=~has_prior)}
        )

    return tagged.groupby("cluster").map_groups(prune, batch_format="pyarrow")


def semdedup_summary(flags) -> pa.Table:
    """Per-cluster (cluster, n_rows, n_dups) from a ``semdedup_flags``
    Dataset — per-batch combiner partials, one tiny groupby, sorted by
    cluster id."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"cluster": pa.array([], type=pa.int32()),
                 "n_rows": pa.array([], type=pa.int64()),
                 "n_dups": pa.array([], type=pa.int64())}
            )
        import polars as pl

        g = (
            pl.from_arrow(b.select(["cluster", "is_dup"]))
            .group_by("cluster")
            .agg(pl.len().cast(pl.Int64).alias("n_rows"),
                 pl.col("is_dup").cast(pl.Int64).sum().alias("n_dups"))
        ).to_arrow()
        return pa.table(
            {"cluster": g.column("cluster").cast(pa.int32()),
             "n_rows": g.column("n_rows").cast(pa.int64()),
             "n_dups": g.column("n_dups").cast(pa.int64())}
        )

    agg = (
        flags.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_dups", alias_name="n_dups"))
    )
    blocks = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows > 0]
    empty = pa.table(
        {"cluster": pa.array([], type=pa.int32()),
         "n_rows": pa.array([], type=pa.int64()),
         "n_dups": pa.array([], type=pa.int64())}
    )
    if not blocks:
        return empty
    t = pa.concat_tables(
        [b.select(["cluster", "n_rows", "n_dups"]).cast(empty.schema)
         for b in blocks]
    ).combine_chunks()
    return t.take(pc.sort_indices(t, sort_keys=[("cluster", "ascending")]))
