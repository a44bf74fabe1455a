"""Distributed spherical k-means over an embedding column.

The training-data-curation clustering step (cluster → inspect / balance /
dedup per cluster) expressed Ray-Data-first:

- **init**: k-means++ on a deterministic SCATTERED sample
  (``scattered_sample_matrix`` — storage-order independent, cf. the IVF
  centroid-bias fix);
- **iterate**: Lloyd steps where each ``map_batches`` task assigns its
  batch with one matmul against the broadcast centroids (``ray.put`` once
  per iteration) and emits ONE partial row — per-cluster vector sums +
  counts — so the driver folds #batches × (k·dim) floats per iteration,
  never rows;
- **assign**: one streamed pass appending a ``cluster`` column.

Cosine geometry throughout (centroids re-normalized each step), matching
the sim module's other operators.  Deterministic for fixed (seed, data,
iters): no RNG after init, and partial sums are folded in float64 with a
fixed reduction order (sorted by batch index).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray

from .knn import _emb_matrix, _normalize, _train_centroids, scattered_sample_matrix


def kmeans_fit(
    ds,
    n_clusters: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    iters: int = 10,
    sample_rows: int = 4096,
) -> np.ndarray:
    """Returns (n_clusters, dim) unit-norm centroids."""
    C = _train_centroids(
        scattered_sample_matrix(ds, emb_col, id_col, sample_rows),
        n_clusters,
        seed,
    )
    C = _normalize(C)
    for _ in range(int(iters)):
        cref = ray.put(C)

        def partial(b: pa.Table, _cref=cref) -> pa.Table:
            Ck = ray.get(_cref)
            m = _normalize(_emb_matrix(b.column(emb_col)))
            a = np.argmax(m @ Ck.T, axis=1)
            k, dim = Ck.shape
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.reshape(-1)], type=pa.list_(pa.float64())),
                    "counts": pa.array([counts], type=pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()  # one small row per batch: k·dim floats + k counts
        k, dim = C.shape
        S = np.zeros((k, dim), dtype=np.float64)
        n = np.zeros(k, dtype=np.int64)
        for r in rows:
            S += np.asarray(r["sums"], dtype=np.float64).reshape(k, dim)
            n += np.asarray(r["counts"], dtype=np.int64)
        nonempty = n > 0
        newC = C.copy()
        newC[nonempty] = S[nonempty] / n[nonempty, None]
        newC = _normalize(newC)
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC
    return C


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Dataset[(id_col, cluster:int32, cos:double)] — one streamed pass."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pa.Table) -> pa.Table:
        Ck = ray.get(cref)
        m = _normalize(_emb_matrix(b.column(emb_col)))
        scores = m @ Ck.T
        a = np.argmax(scores, axis=1)
        return pa.table(
            {
                id_col: b.column(id_col),
                "cluster": pa.array(a.astype(np.int32)),
                "cos": pa.array(scores[np.arange(len(a)), a], type=pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def kmeans_cluster_sizes(
    ds,
    n_clusters: int = 8,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    iters: int = 10,
) -> pa.Table:
    """Fit + assign + per-cluster row counts and mean best-cosine
    (cohesion), sorted by cluster id."""
    C = kmeans_fit(ds, n_clusters, emb_col, id_col, seed, iters)
    assigned = kmeans_assign(ds, C, emb_col, id_col)

    def partial(b: pa.Table) -> pa.Table:
        a = b.column("cluster").to_numpy(zero_copy_only=False)
        cos = b.column("cos").to_numpy(zero_copy_only=False)
        n = np.bincount(a, minlength=n_clusters).astype(np.int64)
        s = np.zeros(n_clusters, dtype=np.float64)
        np.add.at(s, a, cos)
        return pa.table(
            {"n": pa.array([n], type=pa.list_(pa.int64())),
             "s": pa.array([s], type=pa.list_(pa.float64()))}
        )

    rows = assigned.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n = np.zeros(n_clusters, dtype=np.int64)
    s = np.zeros(n_clusters, dtype=np.float64)
    for r in rows:
        n += np.asarray(r["n"], dtype=np.int64)
        s += np.asarray(r["s"], dtype=np.float64)
    with np.errstate(invalid="ignore"):
        mean_cos = np.where(n > 0, s / np.maximum(n, 1), 0.0)
    return pa.table(
        {"cluster": pa.array(np.arange(n_clusters, dtype=np.int32)),
         "n": pa.array(n, type=pa.int64()),
         "mean_cos": pa.array(np.round(mean_cos, 6), type=pa.float64())}
    )
