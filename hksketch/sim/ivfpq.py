"""IVF-PQ: the composite billion-scale ANN index (coarse quantizer +
product-quantized codes per inverted list) — the architecture behind
FAISS's IVFPQ (Jégou et al. TPAMI 2011 §V).

Layout::

    <index_dir>/
      MANIFEST.json             params + dataset fingerprint
      centroids.parquet         coarse centroids (cluster, centroid)
      codebooks.parquet         PQ codebooks (subspace, code, centroid)
      codes/cluster=<j>/...     (vec_id, code: list<uint8>) per list

Why the composition matters at 10^12 rows: IVF prunes the scan to
``nprobe / n_clusters`` of the corpus, PQ shrinks what IS scanned to
``m`` bytes/vector (here 16 vs 512 for raw float64), and the exact
re-rank touches only the shortlist's raw vectors — so a query reads
``corpus × nprobe/n_clusters × m/(8·dim)`` of the data, about 1/1000 of
an IVF-flat probe at these parameters.  By default (``residual=True``,
the TPAMI'11 IVFADC form) the PQ codes encode the residual ``x - c_j``
relative to each vector's coarse centroid — finer quantization at the
same bits; ADC scoring adds the ``q·c_j`` term back per list.  Pass
``residual=False`` for the simpler raw-vector (IVF-flat-PQ) encoding.

Storage contract: same as ``sim/ivf.py`` — ``index_dir`` must be shared
storage on a multi-node cluster (``hksketch.ray_glue.storage``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .ivf import _dataset_fingerprint
from .knn import _emb_matrix, _normalize, _train_centroids, scattered_sample_matrix
from .pq import _encode_matrix, _l2_lloyd


def build_ivfpq_index(
    ds,
    index_dir: str,
    n_clusters: int = 8,
    m: int = 16,
    ksub: int = 16,
    seed: int = 7,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 4096,
    overwrite: bool = False,
    residual: bool = True,
) -> str:
    """Build (or reuse, on matching params + data fingerprint) the
    persisted IVF-PQ index; returns ``index_dir``.  One scattered sample
    trains BOTH quantizers; one streamed pass assigns + encodes every
    row and lays the code lists out as cluster-partitioned Parquet.

    ``residual=True`` (default, the TPAMI'11 IVFADC form) PQ-encodes the
    residual ``x̂ − centroid`` instead of the raw vector: residuals span
    a much smaller cell, so the same m·log₂(ksub) bits quantize finer
    and recall rises (measured in tests); the query-side LUT then scores
    ``q·centroid_j + Σ lut[s, code]`` per probed list."""
    man_path = os.path.join(index_dir, "MANIFEST.json")
    params = {"n_clusters": int(n_clusters), "m": int(m), "ksub": int(ksub),
              "seed": int(seed), "emb_col": emb_col, "id_col": id_col,
              "sample_rows": int(sample_rows), "residual": bool(residual),
              "data_fingerprint": _dataset_fingerprint(ds)}
    if not overwrite and os.path.exists(man_path):
        old = json.load(open(man_path))
        if {k: old.get(k) for k in params} == params:
            return index_dir
    os.makedirs(index_dir, exist_ok=True)

    sample = _normalize(
        scattered_sample_matrix(ds, emb_col, id_col, sample_rows, seed=0x5A11)
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    C = _train_centroids(sample, n_clusters, seed)
    train = sample
    if residual:
        a = np.argmax(sample @ C.T, axis=1)
        train = sample - C[a]
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        books[s] = _l2_lloyd(train[:, s * dsub:(s + 1) * dsub], ksub, seed + s)
    cref, bref = ray.put(C), ray.put(books)

    class AssignEncode:
        def __init__(self):
            self.C = ray.get(cref)
            self.books = ray.get(bref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.schema(
                    [(id_col, pa.int64()),
                     ("code", pa.list_(pa.uint8())),
                     ("cluster", pa.int32())]
                ).empty_table()
            mm = _normalize(_emb_matrix(b.column(emb_col)))
            assign = np.argmax(mm @ self.C.T, axis=1).astype(np.int32)
            enc_in = mm - self.C[assign] if residual else mm
            codes = _encode_matrix(enc_in, self.books)
            flat = pa.array(codes.reshape(-1), type=pa.uint8())
            offsets = pa.array(
                np.arange(0, (b.num_rows + 1) * m, m, dtype=np.int32)
            )
            return pa.table(
                {id_col: b.column(id_col).cast(pa.int64()),
                 "code": pa.ListArray.from_arrays(offsets, flat),
                 "cluster": pa.array(assign)}
            )

    ds.map_batches(
        AssignEncode, batch_format="pyarrow", concurrency=2, zero_copy_batch=True
    ).write_parquet(
        os.path.join(index_dir, "codes"), partition_cols=["cluster"],
        mode="overwrite",
    )
    pq.write_table(
        pa.table(
            {"cluster": pa.array(np.arange(n_clusters, dtype=np.int32)),
             "centroid": pa.array([c.tolist() for c in C],
                                  type=pa.list_(pa.float64()))}
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    sub = np.repeat(np.arange(m, dtype=np.int32), ksub)
    code = np.tile(np.arange(ksub, dtype=np.int32), m)
    pq.write_table(
        pa.table(
            {"subspace": pa.array(sub), "code": pa.array(code),
             "centroid": pa.array(
                 [books[s, c].tolist() for s, c in zip(sub, code)],
                 type=pa.list_(pa.float64()))}
        ),
        os.path.join(index_dir, "codebooks.parquet"),
    )
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({**params, "dim": int(dim)}, f)
    os.replace(tmp, man_path)
    return index_dir


def _load_books(index_dir: str) -> np.ndarray:
    t = pq.read_table(os.path.join(index_dir, "codebooks.parquet"))
    man = json.load(open(os.path.join(index_dir, "MANIFEST.json")))
    m, ksub = man["m"], man["ksub"]
    dsub = man["dim"] // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s, c, cent in zip(t.column("subspace").to_pylist(),
                          t.column("code").to_pylist(),
                          t.column("centroid").to_pylist()):
        books[s, c] = np.asarray(cent)
    return books


def probed_code_paths(index_dir: str, query: np.ndarray, nprobe: int):
    """The nprobe nearest-centroid code-partition dirs (exposed for
    bytes-read assertions, same contract as ``ivf.probed_paths``)."""
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    C = np.array([np.asarray(c) for c in ct.column("centroid").to_pylist()])
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(C @ q))[:nprobe]
    clusters = ct.column("cluster").to_numpy()
    return [
        os.path.join(index_dir, "codes", f"cluster={clusters[j]}")
        for j in probe
        if os.path.isdir(
            os.path.join(index_dir, "codes", f"cluster={clusters[j]}"))
    ], q


def knn_ivfpq(
    index_dir: str,
    ds,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    shortlist_mult: int = 4,
) -> pa.Table:
    """Top-k for one query: ADC over ONLY the probed code partitions →
    ``k·shortlist_mult`` shortlist → exact cosine re-rank against the raw
    vectors of the shortlist ids (a bounded ``is_in``-pruned read of
    ``ds``).  Returns (vec_id, score) — exact cosine, 6 dp, ties by id."""
    import ray.data as rd

    man = json.load(open(os.path.join(index_dir, "MANIFEST.json")))
    emb_col, id_col = man["emb_col"], man["id_col"]
    m = man["m"]
    residual = bool(man.get("residual", False))
    books = _load_books(index_dir)
    paths, q = probed_code_paths(index_dir, query, nprobe)
    empty = pa.table(
        {"vec_id": pa.array([], type=pa.int64()),
         "score": pa.array([], type=pa.float64())}
    )
    if not paths:
        return empty
    dsub = books.shape[2]
    lut = np.stack(
        [books[s] @ q[s * dsub:(s + 1) * dsub] for s in range(m)]
    )  # (m, ksub)
    # residual form: score = q·centroid_j + Σ lut[s, code] per probed list
    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    Call = np.array([np.asarray(c) for c in ct.column("centroid").to_pylist()])
    qc = Call @ q  # (n_clusters,) — tiny, captured in the closure
    lref = ray.put(lut)
    short_n = k * shortlist_mult

    def adc(b: pa.Table) -> pa.Table:
        lt = ray.get(lref)
        if b.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "adc": pa.array([], type=pa.float64())}
            )
        col = b.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = (
            col.flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64).reshape(b.num_rows, m)
        )
        s = lt[np.arange(m)[None, :], codes].sum(axis=1)
        if residual:
            cl = (
                b.column("cluster").combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            s = s + qc[cl]
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        if len(s) > short_n:
            sel = np.lexsort((ids, -s))[:short_n]
            ids, s = ids[sel], s[sel]
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()),
             "adc": pa.array(s, type=pa.float64())}
        )

    files = sorted(
        os.path.join(p, f)
        for p in paths
        for f in os.listdir(p)
        if f.endswith(".parquet")
    )
    cols = [id_col, "code"] + (["cluster"] if residual else [])
    cand = (
        rd.read_parquet(files, columns=cols)
        .map_batches(adc, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    if not cand:
        return empty
    cand.sort(key=lambda r: (-r["adc"], r["vec_id"]))
    wanted = pa.array(
        sorted({r["vec_id"] for r in cand[:short_n]}), type=pa.int64()
    )

    import pyarrow.compute as pc

    def gather(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column(id_col), value_set=wanted))
        return pa.table(
            {"vec_id": b.column(id_col).cast(pa.int64()),
             emb_col: b.column(emb_col)}
        )

    rows = ds.map_batches(
        gather, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # ≤ k·mult rows by construction
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = _normalize(
        np.array([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    )
    scores = M @ q
    sel = np.lexsort((ids, -scores))[:k]
    return pa.table(
        {"vec_id": pa.array(ids[sel], type=pa.int64()),
         "score": pa.array(
             [round(float(x), 6) for x in scores[sel]], type=pa.float64())}
    )
