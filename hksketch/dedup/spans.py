"""Duplicated-passage statistics: how much of each document is made of
token windows that occur elsewhere in the corpus.

The span-level member of the dedup family (exact n-gram Jaccard compares
whole documents; this scores WITHIN-document duplication), the practical
core of "train-data passage dedup" (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL'22 — their exact-substring pass,
here at fixed window size instead of suffix-array maximal matches, which
keeps the operator one-shuffle and SQL-expressible).

Shape (identical discipline to ``dedup/ngram.py``): one tokenize pass
emits one row per w-token window (hash-sharded on the window, string
carried so a hash collision cannot merge two windows), ONE shuffle, then
per-shard vectorized run-scans count global window multiplicity and fold
per-(doc, shard) partials; a final small ``groupby(doc_id).sum`` merges
shards.  The driver never sees a window row.  Shuffle volume is one row
per token (≈ the corpus token count) — the same inverted-index cost as
the exact Jaccard operator, with the same mitigation (the MinHash family
is the approximate fallback at extreme scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64

_PARTIAL_EMPTY = pa.table(
    {"shard": pa.array([], type=pa.int32()),
     "key": pa.array([], type=pa.uint64()),
     "g": pa.array([], type=pa.large_string()),
     "doc_id": pa.array([], type=pa.int64())}
)


def _window_strings(batch: pa.Table, text_col: str, id_col: str, w: int):
    """Tokenize + fixed-``w`` windowing shared by every span operator:
    returns ``(windows: pl.Series[str], win_doc_ids: int64 ndarray)``,
    window doc-ids nondecreasing in document order, or ``(None, None)``
    when the batch yields no window."""
    import polars as pl

    from ..text.tokenize import tokenize_column

    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    toks_t = tokenize_column(
        batch.column(text_col).combine_chunks(), with_doc_index=True
    )
    toks = toks_t.column("token").to_numpy(zero_copy_only=False)
    didx = toks_t.column("doc_idx").to_numpy(zero_copy_only=False)
    if len(toks) >= w:
        valid = didx[: len(didx) - w + 1] == didx[w - 1 :]
        idx = np.flatnonzero(valid)
    else:
        idx = np.empty(0, dtype=np.int64)
    if len(idx) == 0:
        return None, None
    g = toks[idx]
    for j in range(1, w):
        g = g + " "
        g = g + toks[idx + j]
    return pl.Series(g, dtype=pl.String), ids[didx[idx]]


def duplicated_span_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    shards: int | str = "auto",
):
    """Per-document duplicated-window stats at window size ``w`` tokens.

    Returns a Dataset of ``(doc_id, n_windows, n_dup_windows, dup_frac)``
    for every document with at least one window (≥ ``w`` tokens after the
    reference tokenizer).  A window is *duplicated* when its exact
    ``w``-token string occurs ≥ 2 times corpus-wide, counting multiplicity
    — including repeats inside the same document.  ``dup_frac`` is the
    single IEEE division ``n_dup_windows / n_windows`` (bit-exact vs the
    SQL oracle, like the Jaccard operators).
    """
    import polars as pl

    from ..ray_glue.partitioning import auto_shards, estimate_rows

    if shards == "auto":
        est = estimate_rows(ds)
        shards = auto_shards(
            ds,
            target_rows_per_shard=2_000_000,
            min_shards=64,
            rows_hint=None if est is None else est * 64,
        )
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    def window_rows(batch: pa.Table) -> pa.Table:
        s, win_ids = _window_strings(batch, text_col, id_col, w)
        if s is None:
            return _PARTIAL_EMPTY
        key = s.hash(seed=1).to_numpy().astype(np.uint64)
        return pa.table(
            {"shard": pa.array((key & U64(shards - 1)).astype(np.int32)),
             "key": pa.array(key, type=pa.uint64()),
             "g": pa.array(s.to_arrow().cast(pa.large_string())),
             "doc_id": pa.array(win_ids, type=pa.int64())}
        )

    rows = ds.map_batches(window_rows, batch_format="pyarrow", zero_copy_batch=True)

    def shard_stats(grp) -> pa.Table:
        out_empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "n_part": pa.array([], type=pa.int64()),
             "dup_part": pa.array([], type=pa.int64())}
        )
        if not len(grp):
            return out_empty
        df = pl.from_pandas(grp[["key", "g", "doc_id"]]).sort(["key", "g"])
        key = df["key"].to_numpy()
        doc = df["doc_id"].to_numpy()
        # window-identity runs: hash AND string must match (a collision
        # cannot merge two windows); string compare vectorized in polars
        g_new = (df["g"] != df["g"].shift(1)).fill_null(True).to_numpy()
        new = np.concatenate(([True], key[1:] != key[:-1])) | g_new
        run_id = np.cumsum(new) - 1
        run_len = np.bincount(run_id)
        dup = run_len[run_id] >= 2
        # per-doc fold inside this shard
        order2 = np.argsort(doc, kind="stable")
        doc, dup = doc[order2], dup[order2]
        starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        n_part = np.diff(np.concatenate((starts, [len(doc)])))
        dup_part = np.add.reduceat(dup.astype(np.int64), starts)
        return pa.table(
            {"doc_id": pa.array(doc[starts], type=pa.int64()),
             "n_part": pa.array(n_part, type=pa.int64()),
             "dup_part": pa.array(dup_part, type=pa.int64())}
        )

    partials = rows.groupby("shard").map_groups(shard_stats, batch_format="pandas")

    from ray.data.aggregate import Sum

    per_doc = partials.groupby("doc_id").aggregate(
        Sum("n_part", alias_name="n_windows"),
        Sum("dup_part", alias_name="n_dup_windows"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_windows").to_numpy()
        d = batch.column("n_dup_windows").to_numpy()
        frac = d.astype(np.float64) / n.astype(np.float64)
        return batch.append_column("dup_frac", pa.array(frac, type=pa.float64()))

    return per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def split_contamination_stats(
    ds,
    is_eval_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    shards: int | str = "auto",
):
    """Train→eval decontamination (the pre-release step of every LLM data
    pipeline, per Brown et al. NeurIPS'20 appx. C / Lee et al. ACL'22):
    for each EVAL-split document, how many of its exact ``w``-token
    windows also occur anywhere in the TRAIN split.

    ``is_eval_fn(ids: int64 ndarray) -> bool ndarray`` decides membership
    as a pure function of the id (use ``pipelines.splits`` machinery; the
    driver query uses the LCG rank so the SQL oracle can mirror it
    exactly).  Returns a Dataset of
    ``(doc_id, n_windows, n_contam_windows, contam_frac)`` over eval docs
    with ≥ 1 window; a window occurrence is contaminated when its exact
    string occurs ≥ 1 time in the train split (eval-internal duplicates do
    NOT count).

    Same one-shuffle shape as ``duplicated_span_stats``: window rows carry
    an ``is_eval`` flag, per-shard run-scans mark eval rows whose window
    run contains any train row, per-(doc, shard) partials fold, one small
    ``groupby(doc_id).sum`` finishes.  The driver never sees a window row.
    """
    import polars as pl

    from ..ray_glue.partitioning import auto_shards, estimate_rows

    if shards == "auto":
        est = estimate_rows(ds)
        shards = auto_shards(
            ds,
            target_rows_per_shard=2_000_000,
            min_shards=64,
            rows_hint=None if est is None else est * 64,
        )
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    flagged_empty = _PARTIAL_EMPTY.append_column(
        "is_eval", pa.array([], type=pa.bool_())
    )

    def window_rows(batch: pa.Table) -> pa.Table:
        s, win_ids = _window_strings(batch, text_col, id_col, w)
        if s is None:
            return flagged_empty
        key = s.hash(seed=1).to_numpy().astype(np.uint64)
        return pa.table(
            {"shard": pa.array((key & U64(shards - 1)).astype(np.int32)),
             "key": pa.array(key, type=pa.uint64()),
             "g": pa.array(s.to_arrow().cast(pa.large_string())),
             "doc_id": pa.array(win_ids, type=pa.int64()),
             "is_eval": pa.array(
                 np.asarray(is_eval_fn(win_ids), dtype=bool))}
        )

    rows = ds.map_batches(window_rows, batch_format="pyarrow", zero_copy_batch=True)

    def shard_stats(grp) -> pa.Table:
        out_empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "n_part": pa.array([], type=pa.int64()),
             "contam_part": pa.array([], type=pa.int64())}
        )
        if not len(grp):
            return out_empty
        df = pl.from_pandas(grp[["key", "g", "doc_id", "is_eval"]]).sort(
            ["key", "g"]
        )
        key = df["key"].to_numpy()
        doc = df["doc_id"].to_numpy()
        ev = df["is_eval"].to_numpy().astype(bool)
        g_new = (df["g"] != df["g"].shift(1)).fill_null(True).to_numpy()
        new = np.concatenate(([True], key[1:] != key[:-1])) | g_new
        run_id = np.cumsum(new) - 1
        # a run is contaminating when ANY of its rows is a train window
        train_in_run = np.bincount(run_id, weights=(~ev).astype(np.float64)) > 0
        contam = train_in_run[run_id] & ev
        doc_e = doc[ev]
        if len(doc_e) == 0:
            return out_empty
        contam_e = contam[ev]
        order2 = np.argsort(doc_e, kind="stable")
        doc_e, contam_e = doc_e[order2], contam_e[order2]
        starts = np.flatnonzero(
            np.concatenate(([True], doc_e[1:] != doc_e[:-1]))
        )
        n_part = np.diff(np.concatenate((starts, [len(doc_e)])))
        contam_part = np.add.reduceat(contam_e.astype(np.int64), starts)
        return pa.table(
            {"doc_id": pa.array(doc_e[starts], type=pa.int64()),
             "n_part": pa.array(n_part, type=pa.int64()),
             "contam_part": pa.array(contam_part, type=pa.int64())}
        )

    partials = rows.groupby("shard").map_groups(shard_stats, batch_format="pandas")

    from ray.data.aggregate import Sum

    per_doc = partials.groupby("doc_id").aggregate(
        Sum("n_part", alias_name="n_windows"),
        Sum("contam_part", alias_name="n_contam_windows"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_windows").to_numpy()
        d = batch.column("n_contam_windows").to_numpy()
        frac = d.astype(np.float64) / n.astype(np.float64)
        return batch.append_column(
            "contam_frac", pa.array(frac, type=pa.float64())
        )

    return per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


class _BloomFlagStage:
    """Actor-pool eval stage for ``bloom_decontaminate``: the broadcast
    train-window Bloom blob is fetched and deserialized ONCE per actor in
    ``__init__`` (the C8 ``contains`` lookup shape, same discipline as
    ``ray_glue.stages.SketchLookup``); ``__call__`` windows each batch's
    eval docs and folds per-doc hit counts — windows of a doc complete
    within its batch, so the output needs NO shuffle."""

    _EMPTY = pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "n_windows": pa.array([], type=pa.int64()),
         "n_flagged": pa.array([], type=pa.int64()),
         "flag_frac": pa.array([], type=pa.float64())}
    )

    def __init__(self, blob_or_ref, is_eval_fn, text_col, id_col, w):
        import ray

        from ..sketch import sketch_from_bytes

        blob = (
            ray.get(blob_or_ref)
            if isinstance(blob_or_ref, ray.ObjectRef)
            else blob_or_ref
        )
        self.bloom = sketch_from_bytes(blob)
        self.is_eval_fn = is_eval_fn
        self.text_col, self.id_col, self.w = text_col, id_col, w

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        emask = np.asarray(self.is_eval_fn(ids), dtype=bool)
        if not emask.any():
            return self._EMPTY
        sub = batch.filter(pa.array(emask))
        s, win_ids = _window_strings(sub, self.text_col, self.id_col, self.w)
        if s is None:
            return self._EMPTY
        hits = self.bloom.contains_batch(s.to_arrow())
        # win_ids are nondecreasing (document order) — fold runs directly
        starts = np.flatnonzero(
            np.concatenate(([True], win_ids[1:] != win_ids[:-1]))
        )
        n_w = np.diff(np.append(starts, len(win_ids)))
        n_f = np.add.reduceat(hits.astype(np.int64), starts)
        return pa.table(
            {"doc_id": pa.array(win_ids[starts], type=pa.int64()),
             "n_windows": pa.array(n_w, type=pa.int64()),
             "n_flagged": pa.array(n_f, type=pa.int64()),
             "flag_frac": pa.array(
                 n_f.astype(np.float64) / n_w.astype(np.float64),
                 type=pa.float64())}
        )


def bloom_decontaminate(
    ds,
    is_eval_fn,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    m_bits: int = 1 << 24,
    k: int = 7,
    seed: int = 12345,
    concurrency: int = 8,
):
    """Sketch-path decontamination: the ZERO-SHUFFLE companion of
    ``split_contamination_stats``.  A Bloom filter of every train-split
    ``w``-token window replaces the window-sharded shuffle:

    1. TRAIN pass (streamed, no shuffle): train docs' windows feed
       per-batch Bloom partials, tree-merged (``global_sketch`` — Bloom
       union is bitwise-or, exactly associative) into one filter.
    2. EVAL pass (streamed, no shuffle): the blob is ``ray.put`` once; an
       actor pool deserializes it once per actor and counts, per eval
       doc, windows present in the filter.

    Error is ONE-SIDED — Bloom has no false negatives — so per doc
    ``n_flagged >= n_contam_windows`` (the exact operator's count), with
    overcount bounded by the filter's false-positive rate at its fill
    (``BloomFilter.expected_fpr``).  This is the safe direction for a
    release gate: contaminated eval docs are never missed.

    Scale: the exact path shuffles one row per corpus token; this path
    moves only ``m_bits/8`` bytes once per actor.  Size ``m_bits`` to the
    train window cardinality (``BloomFilter.for_capacity``); past one
    machine's memory, shard into B independent filters by window-hash
    prefix and route lookups by the same prefix (the standard
    partitioned-Bloom layout — not needed at any test scale).

    Returns a Dataset of ``(doc_id, n_windows, n_flagged, flag_frac)``
    over eval docs with ≥ 1 window.
    """
    import ray

    from ..ray_glue.aggregate import sketch_config
    from ..ray_glue.stages import global_sketch

    cfg = sketch_config("bloom", m_bits=int(m_bits), k=int(k), seed=int(seed))

    train_empty = pa.table({"g": pa.array([], type=pa.large_string())})

    def train_windows(batch: pa.Table) -> pa.Table:
        import polars as pl

        s, win_ids = _window_strings(batch, text_col, id_col, w)
        if s is None:
            return train_empty
        keep = ~np.asarray(is_eval_fn(win_ids), dtype=bool)
        if not keep.any():
            return train_empty
        return pa.table(
            {"g": s.filter(pl.Series(keep)).to_arrow().cast(pa.large_string())}
        )

    wds = ds.map_batches(
        train_windows, batch_format="pyarrow", zero_copy_batch=True
    )
    blob = global_sketch(wds, cfg, "g")
    # the blob rides the actor constructor args: Ray puts it in the object
    # store ONCE and every actor fetches that copy (pre-putting a ref here
    # trips the actor-restart ownership hazard, ray#53727)
    return ds.map_batches(
        _BloomFlagStage,
        fn_constructor_args=(blob, is_eval_fn, text_col, id_col, w),
        batch_format="pyarrow",
        zero_copy_batch=True,
        # autoscaling pool: starts at 1 actor so the stage never deadlocks
        # waiting for slots on a small session; grows to `concurrency`
        concurrency=(1, int(concurrency)),
    )
