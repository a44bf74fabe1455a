"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — the query matrix is broadcast
  (``ray.put`` once), each batch does one float32 matmul against it, and
  per-batch top-k candidates merge on the driver (candidates only: k rows
  per batch per query, never the full score matrix).  This is the baseline
  any ANN variant is validated against.
- ``knn_ivf``: IVF-flat scale path — deterministic seeded-sample centroids
  (k-means++-style seeding + a few Lloyd iterations on a sample), cluster
  assignment as a batch matmul, then search restricted to the ``nprobe``
  nearest clusters via a bucket groupby.
- ``embedding_near_dupes``: all-pairs cosine ≥ τ via block matmuls —
  embedding-cosine near-duplicate detection.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
import pyarrow as pa

import ray


def _emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(
    ds,
    query: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k of one query vector: (id, score) sorted score desc,
    id asc; scores rounded to 6 dp for cross-engine comparability."""
    qref = ray.put(np.asarray(query, dtype=np.float64))

    class Score:
        def __init__(self):
            q = ray.get(qref)
            self.q = q / (np.linalg.norm(q) or 1.0)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(batch.column(emb_col)))
            scores = m @ self.q
            ids = batch.column(id_col).to_numpy()
            if len(scores) > k:  # per-batch candidate pruning
                part = np.argpartition(-scores, k)[:k]
                ids, scores = ids[part], scores[part]
            return pa.table(
                {id_col: pa.array(ids, type=pa.int64()),
                 "score": pa.array(scores, type=pa.float64())}
            )

    cand = ds.map_batches(Score, batch_format="pyarrow", concurrency=2).take_all()
    best = heapq.nsmallest(k, cand, key=lambda r: (-r["score"], r[id_col]))
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in best], type=pa.int64()),
            "score": pa.array(
                [round(float(r["score"]), 6) for r in best], type=pa.float64()
            ),
        }
    )


def _train_centroids(sample: np.ndarray, n_clusters: int, seed: int, iters: int = 5):
    rng = np.random.default_rng(seed)
    n = len(sample)
    # k-means++-style seeding
    centroids = [sample[int(rng.integers(0, n))]]
    for _ in range(n_clusters - 1):
        d = np.min(
            [np.sum((sample - c) ** 2, axis=1) for c in centroids], axis=0
        )
        p = d / d.sum() if d.sum() > 0 else None
        centroids.append(sample[int(rng.choice(n, p=p))])
    C = np.stack(centroids)
    for _ in range(iters):
        assign = np.argmax(_normalize(sample) @ _normalize(C).T, axis=1)
        for j in range(n_clusters):
            m = assign == j
            if m.any():
                C[j] = sample[m].mean(axis=0)
    return _normalize(C)


def knn_ivf(
    ds,
    query: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    sample_rows: int = 4096,
) -> pa.Table:
    """IVF-flat approximate top-k: centroids trained on a deterministic
    sample, search restricted to the nprobe closest clusters."""
    sample_t = ds.limit(sample_rows).take_all()
    sample = np.array([r[emb_col] for r in sample_t], dtype=np.float64)
    C = _train_centroids(sample, n_clusters, seed)
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(C @ q))[:nprobe].tolist())
    cref = ray.put(C)
    qref = ray.put(q)

    class ProbeScore:
        def __init__(self):
            self.C = ray.get(cref)
            self.q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(batch.column(emb_col)))
            assign = np.argmax(m @ self.C.T, axis=1)
            mask = np.isin(assign, list(probe))
            ids = batch.column(id_col).to_numpy()[mask]
            scores = (m[mask] @ self.q)
            return pa.table(
                {id_col: pa.array(ids, type=pa.int64()),
                 "score": pa.array(scores, type=pa.float64())}
            )

    cand = ds.map_batches(ProbeScore, batch_format="pyarrow", concurrency=2).take_all()
    best = heapq.nsmallest(k, cand, key=lambda r: (-r["score"], r[id_col]))
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in best], type=pa.int64()),
            "score": pa.array(
                [round(float(r["score"]), 6) for r in best], type=pa.float64()
            ),
        }
    )


def embedding_near_dupes(
    ds,
    threshold: float = 0.4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    block: int = 2048,
) -> pa.Table:
    """All-pairs cosine ≥ threshold → (a, b) id pairs, a < b.

    Block-matmul over normalized vectors: the dataset streams once into
    normalized blocks (bounded by ``block`` rows); pairs emerge from
    block×block products.  At 100 TB scale the same code runs per LSH
    bucket (see dedup.minhash) instead of all-pairs; here the all-pairs
    form doubles as the correctness oracle."""
    ids_all, mats = [], []
    for batch in ds.iter_batches(batch_size=block, batch_format="pyarrow"):
        ids_all.append(batch.column(id_col).to_numpy().astype(np.int64))
        mats.append(_normalize(_emb_matrix(batch.column(emb_col))))
    if not mats:
        return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    out_a, out_b = [], []
    for i in range(len(mats)):
        for j in range(i, len(mats)):
            S = mats[i] @ mats[j].T
            ai, bj = np.nonzero(S >= threshold)
            a = ids_all[i][ai]
            b = ids_all[j][bj]
            keep = a < b
            out_a.append(a[keep])
            out_b.append(b[keep])
    a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    order = np.lexsort((b, a))
    return pa.table(
        {"a": pa.array(a[order], type=pa.int64()), "b": pa.array(b[order], type=pa.int64())}
    )
