"""Flagship pipelines: HeavyKeeper top-k over web text, end to end.

The reference's word_count pipeline (SURVEY.md §3.1) re-expressed Ray-Data
first: ``read_parquet`` → fused tokenize+partial-sketch ``map_batches`` →
tree merge (``MergeSketchBlobs`` aggregate) → finalize ``list()`` → small
Arrow table.  Also the webpages variant over the BASELINE.json input_hint
schema (url/warc_ts/html/text/lang): extract text from html (byte-identical
invariant), top-k hostnames and tokens, HLL distinct urls.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..ray_glue.aggregate import sketch_config
from ..ray_glue.stages import global_sketch
from ..sketch import sketch_from_bytes
from .ops import read_table

def sketch_to_sorted_table(
    blob: bytes, item_name: str, count_name: str = "count", limit: Optional[int] = None
) -> pa.Table:
    """Finalize C10: sketch → (item, count) sorted count desc / item asc (the
    SQL-compatible deterministic tie order) and int64 counts."""
    sk = sketch_from_bytes(blob)
    t = sk.to_table()
    t = pa.table(
        {item_name: t.column("item"), count_name: t.column("count").cast(pa.int64())}
    )
    order = pc.sort_indices(
        t,
        sort_keys=[(count_name, "descending"), (item_name, "ascending")],
    )
    t = t.take(order)
    if limit is not None:
        t = t.slice(0, limit)
    return t


def topk_tokens_sketch(
    sf_dir: str,
    k: int = 100,
    variant: str = "bucketed",
    sketch_k: int = 4096,
    width: int = 1 << 15,
    depth: int = 4,
    decay: float = 0.9,
    seed: int = 12345,
    text_col: str = "text",
    table: str = "documents",
) -> pa.Table:
    """Global top-k tokens via HeavyKeeper (fused tokenize+sketch stage).

    ``sketch_k`` tracks far more keys than the reported ``k`` so the
    reported boundary is deep inside the tracked set (tie-determinism)."""
    ds = read_table(sf_dir, table, columns=[text_col])
    params = dict(k=sketch_k, width=width, depth=depth, decay=decay, seed=seed)
    blob = global_sketch(
        ds, sketch_config(variant, **params), key_col=text_col, tokenize=True
    )
    return sketch_to_sorted_table(blob, "token", "count", limit=k)


def topk_keys_sketch(
    sf_dir: str,
    table: str,
    key_col: str,
    k: int = 50,
    variant: str = "bucketed",
    sketch_k: int = 4096,
    width: int = 1 << 15,
    depth: int = 4,
    decay: float = 0.9,
    seed: int = 12345,
) -> pa.Table:
    ds = read_table(sf_dir, table, columns=[key_col])
    params = dict(k=sketch_k, width=width, depth=depth, decay=decay, seed=seed)
    blob = global_sketch(ds, sketch_config(variant, **params), key_col=key_col)
    return sketch_to_sorted_table(blob, key_col, "count", limit=k)


def heavy_hitter_tokens(
    sf_dir: str,
    phi: float = 0.01,
    variant: str = "bucketed",
    seed: int = 12345,
) -> pa.Table:
    """Paper-style φ-heavy-hitters (A3/A5 semantics,
    tests/accuracy_compare.rs:58-63,130-175): tokens whose estimated count
    ≥ ⌈φ·N⌉, N = total token mass."""
    ds = read_table(sf_dir, "documents", columns=["text"])
    cfg = sketch_config(
        variant, k=4096, width=1 << 15, depth=4, decay=0.9, seed=seed
    )
    # partials also carry n_rows = token counts; reuse global_sketch's fused
    # stage but keep N from the same pass.  STREAMING merge (round-3
    # VERDICT "What's wrong" #5): partial batches fold while the map stage
    # still produces — same partial-count-aware shape as global_sketch,
    # no take_all barrier
    from ..ray_glue.stages import make_partial_sketch_fn, tree_merge_many_streaming

    fn = make_partial_sketch_fn(cfg, "text", tokenize=True)
    partials = ds.map_batches(
        fn, batch_format="pyarrow", batch_size=8192, zero_copy_batch=True
    )
    n_tokens = 0

    def _counting_iter():
        nonlocal n_tokens
        for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
            n_tokens += int(np.sum(b.column("n_rows").to_numpy()))
            yield b

    (blob,) = tree_merge_many_streaming(_counting_iter(), ["sketch"])
    if not blob:  # empty stream (all batches tokenized to zero partials)
        from ..ray_glue.stages import make_sketch

        blob = make_sketch(cfg).to_bytes()
    t = sketch_to_sorted_table(blob, "token", "count")
    thresh = int(np.ceil(phi * n_tokens))
    return t.filter(pc.greater_equal(t.column("count"), pa.scalar(thresh)))


def bench_webpages(
    pages_dir: str, seed: int = 12345, doc_stats_dir: Optional[str] = None
) -> dict:
    """The scaling-benchmark workload: a full training-data pass over the
    Common-Crawl-style fixture —

    read(url, html) → extract text (exact envelope unwrap) →
    [a] fused tokenize + HeavyKeeper top-k tokens (tree merge)
    [b] hostname top-k
    [c] HLL distinct urls
    [d] per-doc stats: quality scores + rolling-hash fingerprint + SimHash,
        WRITTEN as partitioned Parquet (``doc_stats_dir``; one file per
        fused-stage task, side output so the partial rows stay 1-per-batch)
    [e] MinHash band rows → bucket groupby (the LSH shuffle)

    ONE streamed scan does all of it: extraction feeds the fused stage
    lazily (never materialized), and the LSH band rows come back to the
    object store as refs for the bucket shuffle.  Returns row counts (and
    the per-doc stats artifact) so callers can compute docs/sec.
    """
    import pyarrow.compute as _pc

    from ..dedup.minhash import MinHasher
    from ..dedup.simhash import SimHasher
    from ..ray_glue.aggregate import HLLCountAggregate
    from ..text.analysis import doc_fingerprints_batch, quality_scores_batch
    from ..text.extract import extract_text_column

    import os as _os
    import time as _time

    _dbg = _os.environ.get("HK_BENCH_DEBUG") == "1"
    _t = _time.perf_counter
    _marks: dict = {}

    def _mark(name, t0):
        _marks[name] = round(_t() - t0, 3)
        if _dbg:
            print(f"[bench_webpages] {name}: {_marks[name]}s", flush=True)
        return _t()

    _t0 = _t()
    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def extract(batch: pa.Table) -> pa.Table:
        text = extract_text_column(batch.column("html"))
        host = _pc.replace_substring_regex(
            batch.column("url"), pattern=r"^https?://([^/]*)/.*$", replacement=r"\1"
        )
        return pa.table({"url": batch.column("url"), "host": host, "text": text})

    # ONE fused per-doc pass over ONE streamed scan (round-3: the round-2
    # shape materialized extracted pages and re-scanned them for the LSH
    # band stage; both the materialize and the second scan were the fixed
    # costs capping 8→32 scaling).  Every per-document kernel — sketches,
    # quality, fingerprint, SimHash, MinHash banding — runs on the batch
    # while it is hot in cache, sharing a single tokenize, and emits one
    # partial row per batch; pages are never materialized.
    #
    # Batch size targets ~4 even task waves per worker slot: a fixed size
    # quantizes into a ragged final wave (98 tasks over 32 slots = 3.06
    # waves → the tail leaves most slots idle), which alone costs ~10-20%
    # at high parallelism.
    import ray as _ray

    from ..ray_glue.partitioning import estimate_rows

    est = estimate_rows(ds)
    cpus = int(_ray.available_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    batch_size = 4096
    if est:
        batch_size = int(min(8192, max(1024, est // (4 * max(1, cpus)))))
    pages = ds.map_batches(
        extract, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    from ..dedup.minhash import MinHasher, lsh_candidate_pairs
    from ..hashing import hash_array
    from ..sketch import BucketedTopK, HyperLogLog
    from ..text.tokenize import tokenize_column

    sh = SimHasher(seed=seed)
    mh = MinHasher(num_perm=64, ngram=3, seed=seed)
    if doc_stats_dir is None:
        # default resolves under the shared storage root (HK_STORAGE_ROOT);
        # the built-in /tmp fallback is SINGLE-NODE ONLY — worker tasks
        # write here, so on a cluster this must be a shared mount
        # (ray_glue.storage module docstring)
        from ..ray_glue.storage import artifact_dir

        doc_stats_dir = artifact_dir("bench", "doc_stats")
    import shutil as _shutil

    _shutil.rmtree(doc_stats_dir, ignore_errors=True)
    _os.makedirs(doc_stats_dir, exist_ok=True)

    _partial_schema = pa.schema(
        [
            ("tok_sketch", pa.binary()),
            ("host_sketch", pa.binary()),
            ("hll", pa.binary()),
            ("n_tokens", pa.int64()),
            ("n_docs", pa.int64()),
            ("band_id", pa.list_(pa.int32())),
            ("band_hash", pa.list_(pa.uint64())),
            ("band_doc", pa.list_(pa.int64())),
        ]
    )

    def fused_partials(batch: pa.Table) -> pa.Table:
        # empty blocks (empty parquet file / empty upstream batch) carry no
        # first url for the side-output tag — emit a 0-row partial table
        if batch.num_rows == 0:
            return _partial_schema.empty_table()
        # tokenize and hash ONCE; every per-doc operator shares the pass
        texts = batch.column("text").combine_chunks()
        toks = tokenize_column(texts, with_doc_index=True)
        didx = toks.column("doc_idx").to_numpy()
        th = hash_array(toks.column("token"), seed)  # sketch-compatible base
        tok_sk = BucketedTopK(4096, 1 << 15, 4, 0.9, seed=seed)
        tok_sk.add_batch(toks.column("token"), hashes=th)
        host_sk = BucketedTopK(2048, 1 << 14, 4, 0.9, seed=seed)
        host_sk.add_batch(batch.column("host"))
        hll = HyperLogLog(p=14, seed=seed)
        hll.add_batch(batch.column("url"))
        per_doc_tokens = np.bincount(didx, minlength=batch.num_rows)
        q = quality_scores_batch(
            pa.table({"doc_id": batch.column("url"), "text": texts}),
            "text",
            "doc_id",
            n_tokens_precomputed=per_doc_tokens,
        )
        fps = doc_fingerprints_batch(
            token_hashes=th, doc_idx=didx, n_docs=batch.num_rows
        )
        sims = sh.signatures(token_hashes=th, doc_idx=didx, n_docs=batch.num_rows)
        # per-doc stats side output: each task writes its own file (names
        # salted by pid+counter — the bench artifact is rebuilt per run)
        stats = pa.table(
            {
                "url": batch.column("url"),
                "host": batch.column("host"),
                "n_tokens": pa.array(per_doc_tokens, type=pa.int64()),
                "char_len": q.column("char_len"),
                "alpha_ratio": q.column("alpha_ratio"),
                "digit_ratio": q.column("digit_ratio"),
                "fingerprint": pa.array(fps, type=pa.uint64()),
                "simhash": pa.array(sims, type=pa.uint64()),
            }
        )
        import pyarrow.parquet as _pq

        # RETRY-IDEMPOTENT side output: the file name derives from the
        # batch's content (first/last url + row count), so a re-executed
        # task overwrites its own file instead of duplicating rows; tmp +
        # rename keeps readers from seeing partial files
        from ..hashing import hash_scalar

        tag = (
            f"{hash_scalar(batch.column('url')[0].as_py(), 3):016x}"
            f"-{hash_scalar(batch.column('url')[-1].as_py(), 3):016x}"
            f"-{batch.num_rows}"
        )
        final = _os.path.join(doc_stats_dir, f"part-{tag}.parquet")
        # "_"-prefixed names are ignored by parquet dataset discovery, so a
        # crashed half-written tmp never corrupts artifact reads
        tmp_f = _os.path.join(doc_stats_dir, f"_tmp-{tag}-{_os.getpid()}")
        _pq.write_table(stats, tmp_f)
        _os.replace(tmp_f, final)
        # MinHash banding from the SAME tokenize pass (doc ids from urls)
        doc_ids = (hash_array(batch.column("url"), 7) >> np.uint64(1)).astype(
            np.int64
        )
        bt = mh.band_rows(ids=doc_ids, bands=16, toks=toks)
        n_tok = int(per_doc_tokens.sum())
        return pa.table(
            {
                "tok_sketch": pa.array([tok_sk.to_bytes()], type=pa.binary()),
                "host_sketch": pa.array([host_sk.to_bytes()], type=pa.binary()),
                "hll": pa.array([hll.to_bytes()], type=pa.binary()),
                "n_tokens": pa.array([n_tok], type=pa.int64()),
                "n_docs": pa.array([batch.num_rows], type=pa.int64()),
                "band_id": pa.array(
                    [bt.column("band_id").to_numpy()], type=pa.list_(pa.int32())
                ),
                "band_hash": pa.array(
                    [bt.column("band_hash").to_numpy()], type=pa.list_(pa.uint64())
                ),
                "band_doc": pa.array(
                    [bt.column("doc_id").to_numpy()], type=pa.list_(pa.int64())
                ),
            }
        )

    from ..ray_glue.stages import tree_merge_many_streaming

    # STREAMING merge: iter_batches drives the lazy map stage and chunk
    # merge tasks launch while later batches are still producing — no
    # take_all barrier between "partials exist" and "partials merge"
    partials_ds = pages.map_batches(
        fused_partials, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True
    )
    total_tokens = 0
    stats_rows = 0
    band_refs: list = []
    import ray as _ray

    def _counting_iter():
        nonlocal total_tokens, stats_rows
        for b in partials_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            total_tokens += int(np.sum(b.column("n_tokens").to_numpy()))
            stats_rows += int(np.sum(b.column("n_docs").to_numpy()))
            # band rows go back to the object store as flat tables; the
            # driver holds REFS only (from_arrow_refs re-assembles the
            # Dataset for the LSH shuffle without a second page scan)
            band_refs.append(
                _ray.put(
                    pa.table(
                        {
                            "band_id": b.column("band_id").combine_chunks().flatten(),
                            "band_hash": b.column("band_hash")
                            .combine_chunks()
                            .flatten(),
                            "doc_id": b.column("band_doc").combine_chunks().flatten(),
                        }
                    )
                )
            )
            yield b

    tok_blob, host_blob, hll_blob = tree_merge_many_streaming(
        _counting_iter(), ["tok_sketch", "host_sketch", "hll"]
    )
    n_pages = stats_rows
    _t0 = _mark("fused_single_pass_and_merge", _t0)
    distinct_urls = int(round(sketch_from_bytes(hll_blob).estimate()))
    _t0 = _mark("tree_merges", _t0)

    bands = rd.from_arrow_refs(band_refs)
    n_candidates = lsh_candidate_pairs(bands, est_row_multiplier=1).num_rows
    _t0 = _mark("lsh", _t0)

    return {
        "n_pages": n_pages,
        "total_tokens": total_tokens,
        "distinct_urls": distinct_urls,
        "lsh_candidates": n_candidates,
        "doc_stats_dir": doc_stats_dir,
        "doc_stats_rows": stats_rows,
        "topk_tokens": sketch_to_sorted_table(tok_blob, "token", limit=20),
        "topk_hosts": sketch_to_sorted_table(host_blob, "host", limit=20),
        "stage_sec": _marks,
    }


def webpages_flagship(
    pages_dir: str,
    k: int = 100,
    variant: str = "bucketed",
    seed: int = 12345,
) -> dict:
    """End-to-end web-pages pipeline on the input_hint schema:
    html → text (exact envelope unwrap) → tokens → HeavyKeeper top-k;
    hostname top-k from urls; HLL distinct urls.  Returns small tables +
    metrics."""
    from ..ray_glue.aggregate import HLLCountAggregate
    from ..text.extract import extract_text_column

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def extract(batch: pa.Table) -> pa.Table:
        text = extract_text_column(batch.column("html"))
        host = pc.replace_substring_regex(
            batch.column("url"), pattern=r"^https?://([^/]*)/.*$", replacement=r"\1"
        )
        return pa.table({"url": batch.column("url"), "host": host, "text": text})

    pages = ds.map_batches(
        extract, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    )
    tok_cfg = sketch_config(
        variant, k=4096, width=1 << 15, depth=4, decay=0.9, seed=seed
    )
    host_cfg = sketch_config(
        variant, k=2048, width=1 << 14, depth=4, decay=0.9, seed=seed
    )
    tok_blob = global_sketch(pages, tok_cfg, key_col="text", tokenize=True)
    host_blob = global_sketch(pages, host_cfg, key_col="host")
    distinct_urls = pages.aggregate(
        HLLCountAggregate(on="url", p=14, seed=seed, alias_name="distinct_urls")
    )["distinct_urls"]
    return {
        "topk_tokens": sketch_to_sorted_table(tok_blob, "token", limit=k),
        "topk_hosts": sketch_to_sorted_table(host_blob, "host", limit=k),
        "distinct_urls": distinct_urls,
    }
