"""Persisted partitioned inverted index + pruned-read retrieval.

The search/retrieval member of the text surface (the corpus-serving
counterpart of ``sim/ivf.py``'s vector index): ONE build pass writes
token→(doc, tf) postings as Parquet partitioned by a STABLE hash of the
token, and every query then reads ONLY the partitions its terms route
to — the same partition-pruned-read discipline the IVF index proves
with byte-read assertions.

Build shape:

- documents are whole rows, so per-batch ``(doc, token) → tf`` partials
  (one vectorized tokenize + polars group_by per batch) are already
  GLOBALLY exact — no aggregation shuffle at all; the only exchange is
  the partitioned write.
- token routing uses the library's own ``hk64`` hash (splitmix64 over
  token bytes): process-independent, so an index built yesterday serves
  queries today — unlike in-process hashes that are only stable within
  one job.
- per-doc token counts (``doclens``) are written alongside, partitioned
  by a doc-id mask, so score-time length lookups are also pruned reads.
- MANIFEST.json records params + a dataset fingerprint (file
  paths/sizes/mtimes); a rebuilt corpus at the same path can never
  silently serve a stale index (same contract as ``build_ivf_index``).

Query shape: each term's postings load from exactly one partition
directory; AND-intersection walks sorted doc arrays
(``np.intersect1d``); integer tf-sum scores are exact (SQL-oracle-able)
and BM25 (Lucene ``ln(1 + (N-df+.5)/(df+.5))`` idf) is provided for
ranked retrieval.  The driver holds only the query terms' posting
lists — bounded by document frequency of the RAREST term for the
intersection; a 10^12-doc deployment shards this step by doc range
(the standard distributed-retrieval layout) — at that scale add a
``doc_shard`` second-level partition and fan the intersection out per
shard; the single-level layout here keeps the query path one pruned
read per term.

Reference scope note: the reference engine has no retrieval surface;
this extends the LLM-data-pipeline text family (corpus QA tooling:
"which documents contain these terms" is the first debugging query of
every corpus build).
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..hashing import hash_array

U64 = np.uint64

DEFAULT_SEED = 12345


def _dataset_fingerprint(ds) -> str:
    # one shared implementation (file stats, or row count + head-content
    # probe for in-memory inputs) — see sim/ivf.py for the rationale
    from ..sim.ivf import _dataset_fingerprint as fp

    return fp(ds)


def term_partitions(
    terms: Sequence[str], partitions: int, seed: int = DEFAULT_SEED
) -> np.ndarray:
    """Partition id per term — the routing used by BOTH build and query
    (hk64: stable across processes and sessions)."""
    arr = pa.array(list(terms), type=pa.large_string())
    h = hash_array(arr, seed, fn="hk64")
    return (h & U64(partitions - 1)).astype(np.int64)


def build_inverted_index(
    ds,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = 64,
    seed: int = DEFAULT_SEED,
    overwrite: bool = False,
) -> str:
    """Build (or reuse — params + fingerprint must both match) the
    persisted index; returns ``index_dir``."""
    from .tokenize import tokenize_column

    partitions = int(partitions)
    if partitions & (partitions - 1):
        raise ValueError(
            f"partitions must be a power of two (got {partitions})"
        )
    man_path = os.path.join(index_dir, "MANIFEST.json")
    params = {"text_col": text_col, "id_col": id_col,
              "partitions": partitions, "seed": int(seed),
              "data_fingerprint": _dataset_fingerprint(ds)}
    if not overwrite and os.path.exists(man_path):
        old = json.load(open(man_path))
        if {k: old.get(k) for k in params} == params:
            return index_dir
    os.makedirs(index_dir, exist_ok=True)

    n_docs, total_tokens = _write_index_files(
        ds, index_dir, text_col, id_col, partitions, seed, mode="overwrite"
    )
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {**params, "n_docs": n_docs, "total_tokens": total_tokens,
             "appended_fingerprints": []}, f
        )
    os.replace(tmp, man_path)
    return index_dir


def _write_index_files(
    ds, index_dir: str, text_col: str, id_col: str,
    partitions: int, seed: int, mode: str,
) -> tuple:
    """The shared postings/doclens write pass (build AND append use the
    same map fns so an appended index is file-for-file equivalent to a
    bigger build); returns (n_docs, total_tokens) of ``ds``."""
    from .tokenize import tokenize_column

    post_empty = pa.table(
        {"token": pa.array([], type=pa.large_string()),
         "doc_id": pa.array([], type=pa.int64()),
         "tf": pa.array([], type=pa.int64()),
         "partition": pa.array([], type=pa.int64())}
    )
    len_empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "dl": pa.array([], type=pa.int64()),
         "dl_part": pa.array([], type=pa.int64())}
    )

    def postings(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = tokenize_column(batch.column(text_col), with_doc_index=True)
        if t.num_rows == 0:
            return post_empty
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        didx = t.column("doc_idx").to_numpy(zero_copy_only=False)
        g = (
            pl.DataFrame(
                {"token": pl.from_arrow(t.column("token").combine_chunks()),
                 "doc_id": pl.Series(ids[didx])}
            )
            .group_by(["token", "doc_id"])
            .agg(pl.len().alias("tf"))
            .sort(["token", "doc_id"])
        )
        part = term_partitions(g["token"].to_list(), partitions, seed)
        return pa.table(
            {"token": g["token"].to_arrow().cast(pa.large_string()),
             "doc_id": g["doc_id"].to_arrow().cast(pa.int64()),
             "tf": g["tf"].to_arrow().cast(pa.int64()),
             "partition": pa.array(part, type=pa.int64())}
        )

    def doclens(batch: pa.Table) -> pa.Table:
        t = tokenize_column(batch.column(text_col), with_doc_index=True)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if t.num_rows == 0:
            dl = np.zeros(len(ids), dtype=np.int64)
        else:
            didx = t.column("doc_idx").to_numpy(zero_copy_only=False)
            dl = np.bincount(didx, minlength=len(ids)).astype(np.int64)
        if len(ids) == 0:
            return len_empty
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "dl": pa.array(dl, type=pa.int64()),
             "dl_part": pa.array(ids & np.int64(partitions - 1),
                                 type=pa.int64())}
        )

    ds.map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(
        os.path.join(index_dir, "postings"),
        partition_cols=["partition"], mode=mode,
    )
    lens = ds.map_batches(
        doclens, batch_format="pyarrow", zero_copy_batch=True
    )
    lens.write_parquet(
        os.path.join(index_dir, "doclens"),
        partition_cols=["dl_part"], mode=mode,
    )
    from ray.data.aggregate import Count, Sum

    tot = lens.aggregate(Count(), Sum("dl", alias_name="total"))
    return int(tot["count()"]), int(tot["total"] or 0)


def append_inverted_index(ds, index_dir: str) -> str:
    """Incrementally ingest NEW documents into an existing index — the
    production crawl-refresh path: new postings/doclens Parquet files
    land inside the same hash partitions (``mode="append"``), so every
    existing query path (pruned reads, AND/BM25, the doc-sharded
    distributed intersection) sees the union with no rebuild and no
    rewrite of prior files.  BM25's ``N``/``avgdl`` update through the
    manifest.  Caller contract: appended docs are NEW ``doc_id``s
    (re-appending is refused by fingerprint — double-counting guard);
    the append runs with the INDEX's recorded params, not the caller's.
    """
    man = _read_manifest(index_dir)
    fp = _dataset_fingerprint(ds)
    seen = [man["data_fingerprint"]] + man.get("appended_fingerprints", [])
    if fp in seen:
        raise ValueError(
            f"append_inverted_index: dataset fingerprint {fp} is already "
            "in the index — appending it again would double-count"
        )
    n_docs, total_tokens = _write_index_files(
        ds, index_dir, man["text_col"], man["id_col"],
        int(man["partitions"]), int(man["seed"]), mode="append",
    )
    man["n_docs"] = int(man["n_docs"]) + n_docs
    man["total_tokens"] = int(man["total_tokens"]) + total_tokens
    man["appended_fingerprints"] = man.get(
        "appended_fingerprints", []
    ) + [fp]
    man_path = os.path.join(index_dir, "MANIFEST.json")
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, man_path)
    return index_dir


def compact_inverted_index(index_dir: str) -> dict:
    """Maintenance pass for an appended index — the lakehouse
    small-files problem: each append adds files to every partition, and
    read cost grows with file count.  Compaction rewrites each
    postings/doclens partition as ONE file sorted by (token, doc_id) /
    doc_id (restoring locality appends can't provide).  Swap discipline
    per partition: write into ``<dir>.tmp``, rename live → ``.old``,
    ``.tmp`` → live, delete ``.old`` — a crash leaves ``.tmp``/``.old``
    residue that readers never touch (they resolve only the live name);
    single-writer maintenance op, run it offline like any OPTIMIZE.
    Returns ``{"partitions_compacted": n, "files_before": m,
    "files_after": k}``."""
    import shutil

    stats = {"partitions_compacted": 0, "files_before": 0,
             "files_after": 0}
    for sub, sort_keys in (
        ("postings", [("token", "ascending"), ("doc_id", "ascending")]),
        ("doclens", [("doc_id", "ascending")]),
    ):
        root = os.path.join(index_dir, sub)
        if not os.path.isdir(root):
            continue
        for part in sorted(os.listdir(root)):
            live = os.path.join(root, part)
            if not os.path.isdir(live) or "=" not in part or \
                    part.endswith((".tmp", ".old")):
                continue
            files = [f for f in os.listdir(live) if f.endswith(".parquet")]
            stats["files_before"] += len(files)
            if len(files) <= 1:
                stats["files_after"] += len(files)
                continue
            t = pq.read_table(live)
            t = t.sort_by(sort_keys)
            tmp = live + ".tmp"
            old = live + ".old"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            os.makedirs(tmp)
            pq.write_table(t, os.path.join(tmp, "compacted-0.parquet"))
            os.rename(live, old)
            os.rename(tmp, live)
            shutil.rmtree(old)
            stats["partitions_compacted"] += 1
            stats["files_after"] += 1
    return stats


def _read_manifest(index_dir: str) -> dict:
    return json.load(open(os.path.join(index_dir, "MANIFEST.json")))


def term_posting_paths(index_dir: str, terms: Sequence[str]) -> List[str]:
    """The partition dirs a query for ``terms`` reads — EXACTLY these and
    nothing else (exposed for pruned-read assertions, like
    ``ivf.probed_paths``)."""
    man = _read_manifest(index_dir)
    parts = sorted(
        set(term_partitions(terms, man["partitions"], man["seed"]).tolist())
    )
    return [
        os.path.join(index_dir, "postings", f"partition={p}") for p in parts
    ]


def read_postings(
    index_dir: str, terms: Sequence[str]
) -> dict:
    """term → (sorted doc_id ndarray, aligned tf ndarray), from pruned
    partition reads only."""
    want = set(terms)
    out = {t: (np.empty(0, np.int64), np.empty(0, np.int64)) for t in want}
    for path in term_posting_paths(index_dir, list(want)):
        if not os.path.isdir(path):
            continue
        t = pq.read_table(path, columns=["token", "doc_id", "tf"])
        tok = t.column("token").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy(zero_copy_only=False)
        for term in want:
            m = tok == term
            if m.any():
                d, f = doc[m], tf[m]
                o = np.argsort(d, kind="stable")
                out[term] = (d[o].astype(np.int64), f[o].astype(np.int64))
    return out


def search_and(
    index_dir: str, terms: Sequence[str], k: int = 20
) -> pa.Table:
    """Boolean AND retrieval with exact integer tf-sum ranking: documents
    containing EVERY term, ranked by Σ tf (desc), doc_id asc ties.
    Returns (doc_id, score) — deterministic, SQL-oracle-able."""
    terms = list(dict.fromkeys(terms))  # dedupe, keep order
    if not terms:
        raise ValueError("search_and requires at least one term")
    post = read_postings(index_dir, terms)
    docs = None
    for t in terms:
        d, _ = post[t]
        docs = d if docs is None else np.intersect1d(
            docs, d, assume_unique=True
        )
        if len(docs) == 0:
            break
    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "score": pa.array([], type=pa.int64())}
    )
    if docs is None or len(docs) == 0:
        return empty
    score = np.zeros(len(docs), dtype=np.int64)
    for t in terms:
        d, f = post[t]
        pos = np.searchsorted(d, docs)
        score += f[pos]
    order = np.lexsort((docs, -score))[: int(k)]
    return pa.table(
        {"doc_id": pa.array(docs[order], type=pa.int64()),
         "score": pa.array(score[order], type=pa.int64())}
    )


def search_and_distributed(
    index_dir: str,
    terms: Sequence[str],
    k: int = 20,
    doc_shards: int = 16,
):
    """The SCALE path of :func:`search_and` (its docstring's documented
    residual): instead of intersecting posting lists on the driver —
    bounded by the rarest term's document frequency, which a 10^12-doc
    corpus can blow past — the query terms' postings are read as a
    Dataset (still only the terms' partition directories), ONE bounded
    shuffle co-locates them by ``doc_id & (doc_shards-1)``, each shard
    intersects and scores its own doc range vectorized, and the global
    top-k is a ``sort().limit(k)`` over ≤ ``k × doc_shards`` candidate
    rows.  The driver never holds a posting list.  Exact same result
    contract as :func:`search_and` (Σtf desc, doc asc) — asserted
    equal in tests.
    """
    import polars as pl
    import ray.data as rd

    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("search_and_distributed requires at least one term")
    doc_shards = int(doc_shards)
    if doc_shards & (doc_shards - 1):
        raise ValueError(
            f"doc_shards must be a power of two (got {doc_shards})"
        )
    n_terms = len(terms)
    # read_parquet wants FILES when given a list — expand each term's
    # partition dir (still only the terms' partitions: the pruned read)
    paths = [
        os.path.join(p, f)
        for p in term_posting_paths(index_dir, terms)
        if os.path.isdir(p)
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "score": pa.array([], type=pa.int64())}
    )
    if not paths:
        return empty
    ds = rd.read_parquet(paths, columns=["token", "doc_id", "tf"])
    tset = set(terms)

    def shard_rows(b: pa.Table) -> pa.Table:
        tok = b.column("token").to_numpy(zero_copy_only=False)
        keep = np.isin(tok, list(tset))
        if not keep.any():
            return pa.table(
                {"dshard": pa.array([], type=pa.int32()),
                 "doc_id": pa.array([], type=pa.int64()),
                 "tf": pa.array([], type=pa.int64())}
            )
        doc = b.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        tf = b.column("tf").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {"dshard": pa.array(
                (doc & np.int64(doc_shards - 1)).astype(np.int32)),
             "doc_id": pa.array(doc, type=pa.int64()),
             "tf": pa.array(tf, type=pa.int64())}
        )

    rows = ds.map_batches(
        shard_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def shard_topk(grp) -> pa.Table:
        if not len(grp):
            return empty
        g = (
            pl.from_pandas(grp[["doc_id", "tf"]])
            .group_by("doc_id")
            .agg(pl.len().alias("nt"), pl.col("tf").sum().alias("score"))
            .filter(pl.col("nt") == n_terms)  # AND: every term present
            .sort(["score", "doc_id"], descending=[True, False])
            .head(k)
        )
        return pa.table(
            {"doc_id": g["doc_id"].to_arrow().cast(pa.int64()),
             "score": g["score"].to_arrow().cast(pa.int64())}
        )

    out = rows.groupby("dshard").map_groups(
        shard_topk, batch_format="pandas"
    ).sort(["score", "doc_id"], descending=[True, False]).limit(k)
    # ≤ k result rows: land them as a typed Table (an all-empty map_groups
    # output loses its schema through sort/limit — the known Ray empty-
    # block hazard — and the typed concat fallback restores the contract)
    from ..pipelines.ops import collect_blocks

    blocks = [b.select(["doc_id", "score"]).cast(empty.schema)
              for b in collect_blocks(out) if b.num_rows]
    return pa.concat_tables(blocks or [empty])


def _doclens_for(index_dir: str, doc_ids: np.ndarray) -> np.ndarray:
    """Pruned doclens lookup: reads only the dl_part partitions the
    candidate docs mask to."""
    man = _read_manifest(index_dir)
    parts = sorted(
        set((doc_ids & np.int64(man["partitions"] - 1)).tolist())
    )
    frames = []
    for p in parts:
        path = os.path.join(index_dir, "doclens", f"dl_part={p}")
        if os.path.isdir(path):
            frames.append(pq.read_table(path, columns=["doc_id", "dl"]))
    if not frames:
        return np.zeros(len(doc_ids), dtype=np.int64)
    t = pa.concat_tables(frames)
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    dl = t.column("dl").to_numpy(zero_copy_only=False)
    o = np.argsort(d, kind="stable")
    d, dl = d[o], dl[o]
    pos = np.searchsorted(d, doc_ids)
    pos = np.clip(pos, 0, len(d) - 1)
    out = np.where(d[pos] == doc_ids, dl[pos], 0)
    return out.astype(np.int64)


def bm25_search(
    index_dir: str,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "or",
) -> pa.Table:
    """BM25-ranked retrieval (Robertson/Spärck Jones; Lucene idf form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``).  ``mode='or'`` scores every
    doc matching ANY term (standard ranked retrieval); ``'and'``
    restricts to the AND set.  Terms are scored in SORTED term order so
    the float sum is bit-deterministic across runs.  Returns
    (doc_id, score:float64), score desc / doc asc."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and' (got {mode!r})")
    terms = sorted(dict.fromkeys(terms))
    if not terms:
        raise ValueError("bm25_search requires at least one term")
    man = _read_manifest(index_dir)
    n_docs = int(man["n_docs"])
    avgdl = (man["total_tokens"] / n_docs) if n_docs else 0.0
    post = read_postings(index_dir, terms)
    if mode == "and":
        cand = None
        for t in terms:
            d, _ = post[t]
            cand = d if cand is None else np.intersect1d(
                cand, d, assume_unique=True
            )
    else:
        cand = np.unique(np.concatenate([post[t][0] for t in terms]))
    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "score": pa.array([], type=pa.float64())}
    )
    if cand is None or len(cand) == 0:
        return empty
    dls = _doclens_for(index_dir, cand).astype(np.float64)
    score = np.zeros(len(cand), dtype=np.float64)
    for t in terms:  # sorted order -> deterministic float sum
        d, f = post[t]
        if len(d) == 0:
            continue
        df = len(d)
        idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        pos = np.searchsorted(d, cand)
        pos_c = np.clip(pos, 0, len(d) - 1)
        hit = d[pos_c] == cand
        tf = np.where(hit, f[pos_c], 0).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * (dls / avgdl if avgdl else 0.0))
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = np.where(hit, idf * tf * (k1 + 1.0) / denom, 0.0)
        score += contrib
    order = np.lexsort((cand, -score))[: int(k)]
    return pa.table(
        {"doc_id": pa.array(cand[order], type=pa.int64()),
         "score": pa.array(score[order], type=pa.float64())}
    )
