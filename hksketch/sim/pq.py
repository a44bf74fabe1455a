"""Product-quantization ANN over an embedding column.

Public recipe (Jégou, Douze, Schmid, "Product quantization for nearest
neighbor search", TPAMI 2011): split the (L2-normalized) vector into
``m`` subspaces, vector-quantize each subspace against its own
``ksub``-entry codebook, and answer queries by Asymmetric Distance
Computation (ADC) — a per-query lookup table of partial inner products,
so scoring a database vector is ``m`` uint8 gathers + a sum instead of a
``dim``-wide float multiply.

Why this is the scale path: the codes are ``m`` bytes per vector
(64-dim float32 → 8 bytes at m=8, a 32× compression), so the searchable
representation of a 10^12-row corpus fits where raw vectors cannot, and
the scan stays bandwidth-bound on codes, not floats.

Distributed shape:
- ``pq_train``: codebooks fit by plain L2 Lloyd per subspace on a
  SCATTERED hash-of-id sample (``scattered_sample_matrix`` — the same
  head-sample-bias fix as IVF); training state is (m, ksub, dsub) —
  tiny, driver-side on the sample only.
- ``pq_encode``: ONE streamed ``map_batches`` pass → Dataset
  [(vec_id, code: list<uint8>)]; encoding is a vectorized argmin of
  ``|x|² − 2·x·Cᵀ + |C|²`` per subspace.
- ``pq_search_adc``: broadcast the query LUTs once (``ray.put``); each
  batch scores all queries with gathers over its code matrix, prunes to
  a tie-correct per-(batch, query) top-k, and the driver merges
  k·q·batches candidate rows — identical merge shape to
  ``knn_bruteforce_multi``.

Everything is deterministic for a fixed seed: same codebooks, same
codes, same ranking (ties broken by ascending id).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray

from .knn import _emb_matrix, _normalize, scattered_sample_matrix


def _l2_lloyd(sample: np.ndarray, k: int, seed: int, iters: int = 20):
    """Plain L2 k-means on a small in-memory sample (k-means++ seeding);
    empty clusters keep their previous centroid.  Deterministic."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cents = [sample[int(rng.integers(0, n))]]
    for _ in range(k - 1):
        d = np.min(
            [np.sum((sample - c) ** 2, axis=1) for c in cents], axis=0
        )
        p = d / d.sum() if d.sum() > 0 else None
        cents.append(sample[int(rng.choice(n, p=p))])
    C = np.stack(cents)
    for _ in range(iters):
        d = (
            np.sum(sample**2, axis=1, keepdims=True)
            - 2.0 * sample @ C.T
            + np.sum(C**2, axis=1)[None, :]
        )
        a = np.argmin(d, axis=1)
        newC = C.copy()
        for j in range(k):
            mask = a == j
            if mask.any():
                newC[j] = sample[mask].mean(axis=0)
        if np.allclose(newC, C, atol=1e-12):
            return newC
        C = newC
    return C


def pq_train(
    ds,
    m: int = 8,
    ksub: int = 32,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0xA0,
    sample_rows: int = 4096,
) -> np.ndarray:
    """Codebooks of shape (m, ksub, dsub) trained per subspace on one
    scattered sample.  Requires dim % m == 0."""
    sample = _normalize(
        scattered_sample_matrix(ds, emb_col, id_col, sample_rows)
    )
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for s in range(m):
        sub = sample[:, s * dsub : (s + 1) * dsub]
        books[s] = _l2_lloyd(sub, ksub, seed + s)
    return books


def _encode_matrix(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) normalized vectors → (n, m) uint8 codes."""
    m, ksub, dsub = books.shape
    n = len(M)
    codes = np.empty((n, m), dtype=np.uint8)
    for s in range(m):
        sub = M[:, s * dsub : (s + 1) * dsub]
        C = books[s]
        d = (
            np.sum(sub**2, axis=1, keepdims=True)
            - 2.0 * sub @ C.T
            + np.sum(C**2, axis=1)[None, :]
        )
        codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def pq_encode(
    ds,
    books: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Dataset[(vec_id, code: list<uint8> of len m)] — one streamed pass,
    codebooks broadcast once."""
    bref = ray.put(np.asarray(books, dtype=np.float64))
    m = int(books.shape[0])

    def enc(b: pa.Table) -> pa.Table:
        bk = ray.get(bref)
        if b.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "code": pa.array([], type=pa.list_(pa.uint8()))}
            )
        M = _normalize(_emb_matrix(b.column(emb_col)))
        codes = _encode_matrix(M, bk)
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        offsets = pa.array(
            np.arange(0, (b.num_rows + 1) * m, m, dtype=np.int32)
        )
        return pa.table(
            {"vec_id": b.column(id_col).cast(pa.int64()),
             "code": pa.ListArray.from_arrays(offsets, flat)}
        )

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_search_adc(
    codes_ds,
    books: np.ndarray,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
) -> pa.Table:
    """ADC top-k for MANY queries over an encoded Dataset.  Returns
    (query_id, rank, vec_id, adc_score) sorted by (query_id, rank);
    scores are approximate inner products vs the normalized database
    vectors, rounded to 6 dp; ties break by ascending vec_id."""
    books = np.asarray(books, dtype=np.float64)
    m, ksub, dsub = books.shape
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    nq = len(Q)
    # (nq, m, ksub) partial inner products: lut[q, s, c] = q_s · C_s[c]
    luts = np.stack(
        [np.einsum("qd,cd->qc", Q[:, s * dsub:(s + 1) * dsub], books[s])
         for s in range(m)], axis=1,
    )
    lref = ray.put(luts)

    def score(b: pa.Table) -> pa.Table:
        lt = ray.get(lref)  # (nq, m, ksub)
        if b.num_rows == 0:
            return pa.table(
                {"qidx": pa.array([], type=pa.int64()),
                 "vec_id": pa.array([], type=pa.int64()),
                 "adc_score": pa.array([], type=pa.float64())}
            )
        col = b.column("code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = (
            col.flatten().to_numpy(zero_copy_only=False)
            .astype(np.int64).reshape(b.num_rows, m)
        )
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        out_q, out_id, out_s = [], [], []
        for qi in range(lt.shape[0]):
            s = lt[qi, np.arange(m)[None, :], codes].sum(axis=1)
            if len(s) > k:
                sel = np.lexsort((ids, -s))[:k]
            else:
                sel = np.arange(len(s))
            out_q.append(np.full(len(sel), qi, dtype=np.int64))
            out_id.append(ids[sel])
            out_s.append(s[sel])
        return pa.table(
            {"qidx": pa.array(np.concatenate(out_q)),
             "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
             "adc_score": pa.array(np.concatenate(out_s), type=pa.float64())}
        )

    cand = codes_ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    by_q: dict[int, list] = {j: [] for j in range(nq)}
    for r in cand:
        by_q[r["qidx"]].append(r)
    qid, rank, vid, sc = [], [], [], []
    for j in range(nq):
        best = heapq.nsmallest(
            k, by_q[j], key=lambda r: (-r["adc_score"], r["vec_id"])
        )
        for rk, r in enumerate(best, 1):
            qid.append(int(query_ids[j]))
            rank.append(rk)
            vid.append(r["vec_id"])
            sc.append(round(float(r["adc_score"]), 6))
    return pa.table(
        {"query_id": pa.array(qid, type=pa.int64()),
         "rank": pa.array(rank, type=pa.int64()),
         "vec_id": pa.array(vid, type=pa.int64()),
         "adc_score": pa.array(sc, type=pa.float64())}
    )


def pq_search_rerank(
    ds,
    codes_ds,
    books: np.ndarray,
    queries: np.ndarray,
    query_ids,
    k: int = 10,
    shortlist_mult: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """The production two-phase shape: ADC over the compressed codes
    retrieves a ``k × shortlist_mult`` shortlist per query (cheap, scans
    bytes), then ONE pruned pass over the raw vectors — filtered to the
    shortlist ids via a broadcast ``is_in`` — rescored exactly and
    re-ranked.  Final top-k recall equals the shortlist's recall, and the
    raw-vector read is bounded at ``k·mult·q`` rows regardless of corpus
    size.  Returns (query_id, rank, vec_id, score): exact cosine, 6 dp,
    ties by ascending id."""
    import pyarrow.compute as pc

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    short = pq_search_adc(
        codes_ds, books, queries, query_ids, k=k * shortlist_mult
    )
    if short.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "vec_id": pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}
        )
    wanted = pc.unique(short.column("vec_id").combine_chunks())

    def gather(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b.column(id_col), value_set=wanted))
        return pa.table(
            {"vec_id": b.column(id_col).cast(pa.int64()),
             emb_col: b.column(emb_col)}
        )

    rows = ds.map_batches(
        gather, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # bounded: ≤ k·mult·q rows by construction
    got_ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = _normalize(
        np.array([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    )
    id_pos = {int(i): p for p, i in enumerate(got_ids)}
    qid, rank, vid, sc = [], [], [], []
    short_q = short.column("query_id").to_numpy(zero_copy_only=False)
    short_v = short.column("vec_id").to_numpy(zero_copy_only=False)
    for j, q in enumerate(query_ids):
        cand = np.unique(short_v[short_q == int(q)])
        pos = np.array([id_pos[int(c)] for c in cand], dtype=np.int64)
        scores = M[pos] @ Q[j]
        order = np.lexsort((cand, -scores))[:k]
        for rk, oi in enumerate(order, 1):
            qid.append(int(q))
            rank.append(rk)
            vid.append(int(cand[oi]))
            sc.append(round(float(scores[oi]), 6))
    return pa.table(
        {"query_id": pa.array(qid, type=pa.int64()),
         "rank": pa.array(rank, type=pa.int64()),
         "vec_id": pa.array(vid, type=pa.int64()),
         "score": pa.array(sc, type=pa.float64())}
    )
