"""IVF-flat as an ACTUAL persisted index (not a pruned full scan).

Layout::

    <index_dir>/
      MANIFEST.json            params (n_clusters, seed, dim, n, cols)
      centroids.parquet        (cluster: int32, centroid: list<double>)
      lists/cluster=<j>/...    inverted lists: the (id, embedding) rows
                               assigned to centroid j, partitioned Parquet

Build is one streaming pass: centroids train on a deterministic sample,
every batch assigns rows by one matmul, and ``write_parquet(...,
partition_cols=['cluster'])`` lays the inverted lists out as one directory
per cluster.  Queries read ONLY the ``nprobe`` probed partitions — at
10^12-vector scale the other ``n_clusters − nprobe`` directories never
leave storage, and the same index serves every subsequent query (the
round-1 version re-scanned and re-assigned the full dataset per query).

Storage contract: ``index_dir`` is written by WORKER tasks
(``write_parquet``) and read by the driver — on a multi-node cluster it
must be a shared mount / object-store URI, never a node-local path
(``hksketch.ray_glue.storage``; default root honors ``HK_STORAGE_ROOT``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .knn import _emb_matrix, _normalize, _train_centroids, scattered_sample_matrix


def _dataset_fingerprint(ds) -> str:
    """Cheap identity of the indexed data: sorted (path, size, mtime) of
    the input files when file-backed — so a regenerated dataset at the
    same path never silently reuses a stale index.  In-memory datasets
    get row count + a 256-row head-content probe: a bare row-count
    fallback collides for any two same-size tables, which would defeat
    the append double-count guards."""
    import hashlib

    try:
        files = ds.input_files()
    except Exception:
        files = []
    if files:
        parts = []
        for f in sorted(files):
            try:
                st = os.stat(f)
                parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
            except OSError:
                parts.append(f)
        payload = "|".join(parts).encode()
    else:
        head = ds.limit(256).to_pandas().to_csv(index=False).encode()
        payload = f"rows:{ds.count()}|".encode() + head
    return hashlib.sha256(payload).hexdigest()[:16]


def build_ivf_index(
    ds,
    index_dir: str,
    n_clusters: int = 16,
    seed: int = 7,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 4096,
    overwrite: bool = False,
) -> str:
    """Build (or reuse) the persisted index; returns ``index_dir``.

    An existing index is reused only when BOTH the params and the dataset
    fingerprint (input files + sizes + mtimes) match — regenerated data at
    the same path triggers a rebuild; ``overwrite=True`` forces one."""
    man_path = os.path.join(index_dir, "MANIFEST.json")
    params = {"n_clusters": int(n_clusters), "seed": int(seed),
              "emb_col": emb_col, "id_col": id_col,
              "sample_rows": int(sample_rows),
              "data_fingerprint": _dataset_fingerprint(ds)}
    if not overwrite and os.path.exists(man_path):
        old = json.load(open(man_path))
        if {k: old.get(k) for k in params} == params:
            return index_dir
    os.makedirs(index_dir, exist_ok=True)

    # scattered (hash-of-id order) sample: storage-order independent, so
    # source-/time-sorted inputs train unbiased centroids
    sample = scattered_sample_matrix(ds, emb_col, id_col, sample_rows)
    C = _train_centroids(sample, n_clusters, seed)
    cref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(b.column(emb_col)))
            assign = np.argmax(m @ self.C.T, axis=1).astype(np.int32)
            return pa.table(
                {id_col: b.column(id_col),
                 emb_col: b.column(emb_col),
                 "cluster": pa.array(assign)}
            )

    lists_dir = os.path.join(index_dir, "lists")
    ds.map_batches(
        Assign, batch_format="pyarrow", concurrency=2, zero_copy_batch=True
    ).write_parquet(lists_dir, partition_cols=["cluster"], mode="overwrite")

    pq.write_table(
        pa.table(
            {"cluster": pa.array(np.arange(n_clusters, dtype=np.int32)),
             "centroid": pa.array([c.tolist() for c in C],
                                  type=pa.list_(pa.float64()))}
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({**params, "dim": int(C.shape[1])}, f)
    os.replace(tmp, man_path)
    return index_dir


def append_ivf_index(ds, index_dir: str) -> str:
    """Incrementally ingest NEW vectors into an existing IVF index — the
    vector-side twin of ``text.index.append_inverted_index``: new rows
    are assigned to the EXISTING centroids (the coarse quantizer is
    frozen — the standard IVF maintenance contract; retrain+rebuild
    when drift accumulates) and land as additional Parquet files inside
    the same cluster partitions (``mode="append"``), so probed reads
    see the union with no rebuild.  Re-appending the same dataset is
    refused by fingerprint.  Recall caveat recorded in the manifest:
    appended vectors far from every existing centroid degrade list
    balance; ``appended_rows`` lets callers schedule a retrain."""
    import ray

    man_path = os.path.join(index_dir, "MANIFEST.json")
    man = json.load(open(man_path))
    fp = _dataset_fingerprint(ds)
    seen = [man["data_fingerprint"]] + man.get("appended_fingerprints", [])
    if fp in seen:
        raise ValueError(
            f"append_ivf_index: dataset fingerprint {fp} is already in "
            "the index — appending it again would double-count"
        )
    emb_col, id_col = man["emb_col"], man["id_col"]
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    C = np.array([np.asarray(c) for c in ct.column("centroid").to_pylist()])
    cref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(cref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(b.column(emb_col)))
            assign = np.argmax(m @ self.C.T, axis=1).astype(np.int32)
            return pa.table(
                {id_col: b.column(id_col),
                 emb_col: b.column(emb_col),
                 "cluster": pa.array(assign)}
            )

    n_new = ds.count()
    ds.map_batches(
        Assign, batch_format="pyarrow", concurrency=2, zero_copy_batch=True
    ).write_parquet(
        os.path.join(index_dir, "lists"),
        partition_cols=["cluster"], mode="append",
    )
    man["appended_fingerprints"] = man.get(
        "appended_fingerprints", []
    ) + [fp]
    man["appended_rows"] = int(man.get("appended_rows", 0)) + int(n_new)
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, man_path)
    return index_dir


def probed_paths(index_dir: str, query: np.ndarray, nprobe: int):
    """The nprobe nearest-centroid partition dirs for a query — exactly the
    files a search will read (exposed for bytes-read assertions)."""
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    C = np.array([np.asarray(c) for c in ct.column("centroid").to_pylist()])
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(C @ q))[:nprobe]
    clusters = ct.column("cluster").to_numpy()
    return [
        os.path.join(index_dir, "lists", f"cluster={clusters[j]}")
        for j in probe
        if os.path.isdir(os.path.join(index_dir, "lists", f"cluster={clusters[j]}"))
    ], q


def knn_ivf_index(
    index_dir: str,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Top-k from the persisted index: reads ONLY the probed inverted-list
    partitions (a Ray Data read over nprobe directories), scores each batch
    with one matmul, and merges per-batch candidates on the driver
    (k rows per batch only)."""
    import heapq

    import ray.data as rd

    man = json.load(open(os.path.join(index_dir, "MANIFEST.json")))
    emb_col, id_col = man["emb_col"], man["id_col"]
    paths, q = probed_paths(index_dir, query, nprobe)
    if not paths:
        return pa.table({id_col: pa.array([], type=pa.int64()),
                         "score": pa.array([], type=pa.float64())})

    def score(b: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(b.column(emb_col)))
        scores = m @ q
        ids = b.column(id_col).to_numpy()
        from .knn import _topk_by_score_then_id

        sel = _topk_by_score_then_id(scores, ids, k)
        ids, scores = ids[sel], scores[sel]
        return pa.table(
            {id_col: pa.array(ids, type=pa.int64()),
             "score": pa.array(scores, type=pa.float64())}
        )

    # expand partition dirs to files (read_parquet rejects a LIST of dirs)
    files = sorted(
        os.path.join(p, f)
        for p in paths
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    ds = rd.read_parquet(files, columns=[id_col, emb_col])
    cand = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True).take_all()
    best = heapq.nsmallest(k, cand, key=lambda r: (-r["score"], r[id_col]))
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in best], type=pa.int64()),
            "score": pa.array(
                [round(float(r["score"]), 6) for r in best], type=pa.float64()
            ),
        }
    )
