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

TOKEN_SKETCH = dict(kind_params=dict(k=4096, width=1 << 15, depth=4, decay=0.9))


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
    # stage but keep N via a parallel count
    from ..ray_glue.stages import make_partial_sketch_fn, MergeSketchBlobs

    fn = make_partial_sketch_fn(cfg, "text", tokenize=True)
    partials = ds.map_batches(
        fn, batch_format="pyarrow", batch_size=8192, zero_copy_batch=True
    ).materialize()  # tiny: one row per batch
    n_tokens = int(partials.sum("n_rows"))
    out = partials.aggregate(MergeSketchBlobs(on="sketch", alias_name="sketch"))
    blob = out["sketch"]
    t = sketch_to_sorted_table(blob, "token", "count")
    thresh = int(np.ceil(phi * n_tokens))
    return t.filter(pc.greater_equal(t.column("count"), pa.scalar(thresh)))


def bench_webpages(pages_dir: str, seed: int = 12345) -> dict:
    """The scaling-benchmark workload: a full training-data pass over the
    Common-Crawl-style fixture —

    read(url, html) → extract text (exact envelope unwrap) →
    [a] fused tokenize + HeavyKeeper top-k tokens (tree merge)
    [b] hostname top-k
    [c] HLL distinct urls
    [d] per-doc stats: quality scores + rolling-hash fingerprint + SimHash
    [e] MinHash band rows → bucket groupby (the LSH shuffle)

    The extracted pages are materialized ONCE (sized well under the object
    store) and every sub-pipeline streams from that shared intermediate.
    Returns row counts so callers can compute docs/sec.
    """
    import pyarrow.compute as _pc

    from ..dedup.minhash import MinHasher
    from ..dedup.simhash import SimHasher
    from ..ray_glue.aggregate import HLLCountAggregate
    from ..text.analysis import doc_fingerprints_batch, quality_scores_batch
    from ..text.extract import extract_text_column

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def extract(batch: pa.Table) -> pa.Table:
        text = extract_text_column(batch.column("html"))
        host = _pc.replace_substring_regex(
            batch.column("url"), pattern=r"^https?://([^/]*)/.*$", replacement=r"\1"
        )
        return pa.table({"url": batch.column("url"), "host": host, "text": text})

    pages = ds.map_batches(
        extract, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).materialize()
    n_pages = pages.count()

    tok_cfg = sketch_config("bucketed", k=4096, width=1 << 15, depth=4, decay=0.9, seed=seed)
    host_cfg = sketch_config("bucketed", k=2048, width=1 << 14, depth=4, decay=0.9, seed=seed)
    tok_blob = global_sketch(pages, tok_cfg, key_col="text", tokenize=True)
    host_blob = global_sketch(pages, host_cfg, key_col="host")
    distinct_urls = pages.aggregate(
        HLLCountAggregate(on="url", p=14, seed=seed, alias_name="distinct_urls")
    )["distinct_urls"]

    sh = SimHasher(seed=seed)

    def doc_stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").combine_chunks()
        q = quality_scores_batch(
            pa.table({"doc_id": batch.column("url"), "text": texts}), "text", "doc_id"
        )
        fp = doc_fingerprints_batch(texts)
        sig = sh.signatures(texts)
        return pa.table(
            {
                "n_tokens": q.column("n_tokens"),
                "alpha_ratio": q.column("alpha_ratio"),
                "fingerprint": pa.array(fp, type=pa.uint64()),
                "simhash": pa.array(sig, type=pa.uint64()),
            }
        )

    from ray.data.aggregate import Sum

    stats_out = pages.map_batches(
        doc_stats, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).aggregate(Sum("n_tokens", alias_name="total_tokens"))
    total_tokens = int(stats_out["total_tokens"])

    mh = MinHasher(num_perm=64, ngram=3, seed=seed)

    def band_stage(batch: pa.Table) -> pa.Table:
        from ..hashing import hash_array

        doc_ids = (hash_array(batch.column("url"), 7) >> np.uint64(1)).astype(
            np.int64
        )  # stable global doc id from the url
        return mh.band_rows(
            batch.column("text").combine_chunks(), doc_ids, bands=16
        )

    from ..dedup.minhash import lsh_candidate_pairs

    bands = pages.map_batches(
        band_stage, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    )
    n_candidates = lsh_candidate_pairs(bands).num_rows

    return {
        "n_pages": n_pages,
        "total_tokens": total_tokens,
        "distinct_urls": distinct_urls,
        "lsh_candidates": n_candidates,
        "topk_tokens": sketch_to_sorted_table(tok_blob, "token", limit=20),
        "topk_hosts": sketch_to_sorted_table(host_blob, "host", limit=20),
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
