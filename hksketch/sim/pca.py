"""Distributed PCA over an embedding column — one streamed pass of
EXACT integer moment partials, eigendecomposition on the driver.

The dimensionality-reduction member of the ``sim/`` family (whitening /
compression / visualization prep for the ANN stack): the covariance of
``n`` vectors needs only ``(n, Σx, Σxxᵀ)``, so the distributed part is
ONE ``map_batches`` pass emitting a fixed-size partial row per batch —
``dim + dim²`` int64s — tree-folded on workers
(``cluster.tree_fold_partials(exact=True)``, the k-means discipline):
embeddings are fixed-point-quantized BEFORE summation, so partials are
exact integers, the fold is associative, and the fitted model is
bit-deterministic for ANY block structure.  The driver receives one
``dim×dim`` matrix (4 KB at dim=32), runs ``numpy.linalg.eigh``, and
broadcasts the ``(k, dim)`` projection — never a data row.

Eigenvector sign is canonicalized (largest-|loading| coordinate made
positive) so projections are reproducible across LAPACK builds up to
that convention.

At 100 TB: the pass is embarrassingly parallel, the shuffle carries one
``O(dim²)`` row per batch, and dim² stays driver-trivial through
dim ≈ 4096 (128 MB); past that use randomized sketched PCA — out of
scope and documented.

Reference scope note: the reference engine has no linear algebra; this
extends the LLM-pipeline embedding surface like ``sim/pq.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .knn import _emb_matrix

_PCA_SCALE = float(1 << 20)


def pca_fit(
    ds,
    emb_col: str = "embedding",
    k: int = 8,
) -> dict:
    """One-pass PCA fit: returns ``{"mean": (dim,), "components":
    (k, dim) row-major principal axes (eigval desc), "eigvals": (dim,)
    desc, "explained_ratio": (dim,), "n": int}``.  Population
    covariance (divide by n), exact-integer moment accumulation."""
    from .cluster import tree_fold_partials

    k = int(k)
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")

    first = ds.limit(1).take(1)
    if not first:
        raise ValueError("pca_fit: empty dataset")
    dim = len(first[0][emb_col])
    if k > dim:
        raise ValueError(f"k={k} exceeds embedding dim {dim}")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"n": pa.array([np.zeros(1, dtype=np.int64)],
                               type=pa.list_(pa.int64())),
                 "sx": pa.array([np.zeros(dim, dtype=np.int64)],
                                type=pa.list_(pa.int64())),
                 "sxx": pa.array([np.zeros(dim * dim, dtype=np.int64)],
                                 type=pa.list_(pa.int64()))}
            )
        m = _emb_matrix(b.column(emb_col)).astype(np.float64)
        # fixed-point quantization BEFORE summation: partials are exact
        # ints, the tree fold is associative (k-means discipline)
        mi = np.rint(m * _PCA_SCALE).astype(np.int64)
        sx = mi.sum(axis=0)
        sxx = (mi.T @ mi).reshape(-1)
        return pa.table(
            {"n": pa.array([np.array([len(mi)], dtype=np.int64)],
                           type=pa.list_(pa.int64())),
             "sx": pa.array([sx], type=pa.list_(pa.int64())),
             "sxx": pa.array([sxx], type=pa.list_(pa.int64()))}
        )

    ni, sxi, sxxi = tree_fold_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        cols=("n", "sx", "sxx"),
        shapes=((1,), (dim,), (dim, dim)),
        exact=True,
    )
    n = int(np.asarray(ni, dtype=object).reshape(-1)[0])
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows (got {n})")
    sx = np.array([int(v) for v in np.asarray(sxi, dtype=object).reshape(-1)],
                  dtype=np.float64)
    sxx = np.array(
        [int(v) for v in np.asarray(sxxi, dtype=object).reshape(-1)],
        dtype=np.float64,
    ).reshape(dim, dim)
    mean = sx / (n * _PCA_SCALE)
    cov = sxx / (n * _PCA_SCALE ** 2) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals)
    evals = evals[order]
    evecs = evecs[:, order]
    # canonical sign: the largest-|loading| coordinate of each axis > 0
    for j in range(dim):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    evals = np.maximum(evals, 0.0)  # clamp tiny negative fp residue
    total = float(evals.sum()) or 1.0
    return {
        "mean": mean,
        "components": evecs[:, :k].T.copy(),
        "eigvals": evals,
        "explained_ratio": evals / total,
        "n": n,
    }


def pca_project(
    ds,
    model: dict,
    emb_col: str = "embedding",
    out_col: str = "pca",
    keep_cols: Optional[list] = None,
):
    """Append the k-dim projection ``(x - mean) @ componentsᵀ`` as a
    ``list<float64>`` column — one broadcast matmul per batch."""
    import ray

    mean = np.asarray(model["mean"], dtype=np.float64)
    comp = np.asarray(model["components"], dtype=np.float64)
    mref = ray.put((mean, comp))

    def project(b: pa.Table) -> pa.Table:
        mu, C = ray.get(mref)
        if b.num_rows == 0:
            out = pa.array([], type=pa.list_(pa.float64()))
        else:
            m = _emb_matrix(b.column(emb_col)).astype(np.float64)
            p = (m - mu) @ C.T
            out = pa.array(list(p), type=pa.list_(pa.float64()))
        cols = {c: b.column(c) for c in (keep_cols or b.column_names)}
        cols[out_col] = out
        return pa.table(cols)

    return ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
