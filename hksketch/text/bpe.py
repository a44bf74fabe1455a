"""Distributed BPE tokenizer training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL'16) — the
tokenizer-construction step of an LLM data pipeline, expressed
Ray-Data-first.

The standard trainer trick (HuggingFace ``tokenizers``, SentencePiece
BPE mode): train on the WORD-TYPE table, not the raw corpus.  One
tokenize+count shuffle reduces the corpus to ``(word, count)`` rows —
sublinear in corpus size by Heaps' law — and every merge iteration then
touches only word types:

1. ``word_counts``: ONE combiner-shuffled exact count (the same
   ``ops.exact_counts`` shape as the token top-k queries).
2. Per merge iteration:
   - pair counting: ``map_batches`` explodes each word's current symbol
     sequence and pre-aggregates adjacent-pair counts per batch (polars,
     vectorized), then each partial block emits its LOCAL best pair and
     the driver folds block winners — an argmax tree-reduce, never a
     global sort;
   - merge application: the winning pair is broadcast in the closure;
     only words that CONTAIN the pair are re-spliced (vectorized
     candidate-run extraction with greedy left-to-right overlap
     resolution), everything else streams through untouched.  The new
     word table is materialized per iteration (it is the small side —
     types, not tokens — and materializing cuts the per-iteration
     lineage so iteration k never re-executes iterations 1..k-1).

The driver holds only the merge list (``n_merges`` rows) and one
best-pair row per block per iteration.  Determinism: ties on pair count
break to the lexicographically smallest ``"left right"`` string, so the
learned merge table is bit-stable across runs, block layouts and
cluster sizes (tested against a pure-local reference implementation).

At 100 TB: the word-type table is the only iterated state (typically
10^7-10^8 rows — hundreds of MB, trivially distributed); prune it with
``min_count`` (hapax types cannot win a merge against any repeated
pair until far down the vocab, and real trainers prune them for
exactly this reason).  Iteration cost is O(types) per merge with a
contains-filter fast path, not O(corpus).

Reference scope note: the reference engine (`/root/reference/src`) has
no tokenizer training; this module is part of the LLM-data-pipeline
extension surface, built on the same tokenize kernel
(``text/tokenize.py``) as the reference-parity word-count path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

_WORDS_SCHEMA = pa.schema(
    [("syms", pa.large_string()), ("count", pa.int64())]
)

_BEST_EMPTY = pa.table(
    {"pair": pa.array([], type=pa.large_string()),
     "n": pa.array([], type=pa.int64())}
)


def word_counts(ds, text_col: str = "text"):
    """Corpus → ``(word, count)`` Dataset (the reference tokenizer's
    alpha-run/lowercase/≤64B semantics), one combiner shuffle."""
    from ..pipelines.ops import exact_counts
    from .tokenize import tokenize_column

    def toks(batch: pa.Table) -> pa.Table:
        t = tokenize_column(batch.column(text_col))
        return pa.table({"word": t.column("token")})

    tok = ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True)
    return exact_counts(tok, "word", count_name="count")


def _to_symbol_table(words) -> "object":
    """(word, count) → (syms, count) with syms = space-joined characters
    (classic character-level BPE start state; symbols stay ``[a-z0-9]+``
    under the reference tokenizer, so the space-join encoding is
    collision-free)."""
    def split_chars(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return _WORDS_SCHEMA.empty_table()
        w = pl.from_arrow(batch.column("word").combine_chunks())
        if not isinstance(w, pl.Series):
            w = pl.Series(w)
        syms = (
            w.str.extract_all(r".")
            .list.join(" ")
            .to_arrow()
            .cast(pa.large_string())
        )
        return pa.table(
            {"syms": syms,
             "count": batch.column("count").cast(pa.int64())}
        )

    return words.map_batches(
        split_chars, batch_format="pyarrow", zero_copy_batch=True
    )


def _block_best_pair(batch: pa.Table) -> pa.Table:
    """Adjacent-pair counts for one block of the word table, reduced to
    the block's SINGLE best (count desc, pair asc) row."""
    import polars as pl

    if batch.num_rows == 0:
        return _BEST_EMPTY
    df = pl.from_arrow(batch).with_row_index("wid")
    d = (
        df.with_columns(pl.col("syms").str.split(" ").alias("s"))
        .select("wid", "count", "s")
        .explode("s", empty_as_null=False)
        .with_columns(nxt=pl.col("s").shift(-1).over("wid"))
        .drop_nulls("nxt")
    )
    if d.height == 0:
        return _BEST_EMPTY
    g = (
        d.with_columns(pair=pl.col("s") + pl.lit(" ") + pl.col("nxt"))
        .group_by("pair")
        .agg(pl.col("count").sum().alias("n"))
        .sort(["n", "pair"], descending=[True, False])
        .head(1)
    )
    return pa.table(
        {"pair": g["pair"].to_arrow().cast(pa.large_string()),
         "n": g["n"].to_arrow().cast(pa.int64())}
    )


def _block_pair_counts(batch: pa.Table) -> pa.Table:
    """Full per-block pair-count partial (used by the exact global
    argmax: partials → one small groupby → top-1)."""
    import polars as pl

    if batch.num_rows == 0:
        return _BEST_EMPTY
    df = pl.from_arrow(batch).with_row_index("wid")
    d = (
        df.with_columns(pl.col("syms").str.split(" ").alias("s"))
        .select("wid", "count", "s")
        .explode("s", empty_as_null=False)
        .with_columns(nxt=pl.col("s").shift(-1).over("wid"))
        .drop_nulls("nxt")
    )
    if d.height == 0:
        return _BEST_EMPTY
    g = (
        d.with_columns(pair=pl.col("s") + pl.lit(" ") + pl.col("nxt"))
        .group_by("pair")
        .agg(pl.col("count").sum().alias("n"))
    )
    return pa.table(
        {"pair": g["pair"].to_arrow().cast(pa.large_string()),
         "n": g["n"].to_arrow().cast(pa.int64())}
    )


def _greedy_candidates(cand: np.ndarray) -> np.ndarray:
    """Indices of kept merge sites under greedy left-to-right overlap
    resolution: within each run of ADJACENT candidate positions (which
    only occur when left==right, e.g. pair (a,a) in "a a a a"), keep
    every other site starting from the run head — "a a a a" → "aa aa"."""
    ci = np.flatnonzero(cand)
    if len(ci) == 0:
        return ci
    new_run = np.concatenate(([True], np.diff(ci) != 1))
    run_id = np.cumsum(new_run) - 1
    run_start_idx = np.flatnonzero(new_run)
    offset = np.arange(len(ci)) - run_start_idx[run_id]
    return ci[(offset % 2) == 0]


def _apply_merge_np(
    sym: np.ndarray, wid: np.ndarray, left: str, right: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Splice every greedy occurrence of (left, right) in the exploded
    (symbol, word-id) arrays; returns the new arrays."""
    if len(sym) < 2:
        return sym, wid
    cand = np.zeros(len(sym), dtype=bool)
    cand[:-1] = (sym[:-1] == left) & (sym[1:] == right) & (
        wid[:-1] == wid[1:]
    )
    sel = _greedy_candidates(cand)
    if len(sel) == 0:
        return sym, wid
    out = sym.copy()
    out[sel] = left + right
    drop = np.zeros(len(sym), dtype=bool)
    drop[sel + 1] = True
    keep = ~drop
    return out[keep], wid[keep]


def _make_merge_applier(left: str, right: str):
    """Batch fn re-splicing only the words that contain the pair."""
    needle = f"{left} {right}"

    def apply(batch: pa.Table) -> pa.Table:
        import polars as pl

        if batch.num_rows == 0:
            return _WORDS_SCHEMA.empty_table()
        df = pl.from_arrow(batch)
        # boundary-safe literal probe: symbols never contain spaces, so
        # padding with one space on each side makes " left right " an
        # exact two-symbol window match (contains() just routes rows —
        # the splice below is the exact judge)
        hit = df.select(
            hit=(pl.lit(" ") + pl.col("syms") + pl.lit(" "))
            .str.contains(f" {needle} ", literal=True)
        )["hit"].to_numpy()
        if not hit.any():
            return batch
        touched = df.filter(pl.Series(hit)).with_row_index("wid")
        d = (
            touched.with_columns(pl.col("syms").str.split(" ").alias("s"))
            .select("wid", "s")
            .explode("s", empty_as_null=False)
        )
        sym = d["s"].to_numpy()
        wid = d["wid"].to_numpy()
        sym2, wid2 = _apply_merge_np(sym, wid, left, right)
        rejoined = (
            pl.DataFrame({"wid": wid2, "s": sym2})
            .group_by("wid", maintain_order=True)
            .agg(pl.col("s").str.join(" ").alias("syms"))
        )
        new_syms = np.asarray(df["syms"].to_numpy(), dtype=object).copy()
        new_syms[np.flatnonzero(hit)] = rejoined["syms"].to_numpy()
        return pa.table(
            {"syms": pa.array(new_syms, type=pa.large_string()),
             "count": batch.column("count").cast(pa.int64())}
        )

    return apply


def bpe_train(
    ds,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    exact_argmax: bool = True,
    words=None,
) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from a documents Dataset.

    Returns ``[(left, right, pair_count), ...]`` in merge order.  Stops
    early (shorter list) when no pair occurs twice — merging hapax pairs
    is never useful and keeps the output deterministic.

    ``exact_argmax=True`` (default) computes the global best pair from
    full per-block pair-count partials through one SMALL groupby (pair
    cardinality ≪ type count) + top-1 — exact at any block layout.
    ``False`` folds per-block winners only (cheaper, but a pair split
    across blocks can be under-counted; offered for profiling).

    ``words``: pass a pre-computed ``(word, count)`` Dataset to skip the
    corpus scan (e.g. reuse across trainings with different vocab sizes).
    """
    import pyarrow.compute as pc

    from ..pipelines.ops import collect_blocks

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0 (got {n_merges})")
    if words is None:
        words = word_counts(ds, text_col)
    if min_count > 1:
        words = words.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("count"), pa.scalar(min_count))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    table = _to_symbol_table(words).materialize()

    merges: List[Tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        if exact_argmax:
            from ray.data.aggregate import Sum

            agg = (
                table.map_batches(
                    _block_pair_counts, batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                .groupby("pair")
                .aggregate(Sum("n", alias_name="n"))
            )
            best_blocks = collect_blocks(
                agg.map_batches(
                    lambda b: (
                        _BEST_EMPTY if b.num_rows == 0 else pa.table({
                            "pair": b.column("pair").cast(pa.large_string()),
                            "n": b.column("n").cast(pa.int64()),
                        }).take(
                            pc.sort_indices(
                                b.select(["n", "pair"]),
                                sort_keys=[("n", "descending"),
                                           ("pair", "ascending")],
                            )[:1]
                        )
                    ),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
            )
        else:
            best_blocks = collect_blocks(
                table.map_batches(
                    _block_best_pair, batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
        rows = [
            (t.column("pair")[i].as_py(), t.column("n")[i].as_py())
            for t in best_blocks
            for i in range(t.num_rows)
        ]
        if not rows:
            break
        # fold block winners: max count, tie → lexicographically least pair
        best_pair, best_n = min(rows, key=lambda r: (-r[1], r[0]))
        if best_n < 2:
            break
        left, right = best_pair.split(" ", 1)
        merges.append((left, right, int(best_n)))
        table = table.map_batches(
            _make_merge_applier(left, right),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
    return merges


def bpe_train_local(
    word_count_pairs, n_merges: int, min_count: int = 1
) -> List[Tuple[str, str, int]]:
    """Pure-local reference trainer over ``[(word, count), ...]`` — the
    equality oracle for :func:`bpe_train` (same start state, same greedy
    overlap rule, same tie-break)."""
    words = [
        (list(w), int(c)) for w, c in word_count_pairs
        if int(c) >= min_count
    ]
    merges: List[Tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        counts: dict = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        if n < 2:
            break
        merges.append((left, right, int(n)))
        merged = left + right
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i: i + 2] = [merged]
                i += 1
    return merges


def bpe_encode_batch(
    words: np.ndarray, merges: List[Tuple[str, str, int]]
) -> List[List[str]]:
    """Encode an array of words with a learned merge list (merges applied
    in learned order, greedy within each pass) — the vectorized per-batch
    worker kernel for downstream piece-count stages."""
    import polars as pl

    if len(words) == 0:
        return []
    s = pl.Series(list(words), dtype=pl.String)
    d = (
        pl.DataFrame({"w": s})
        .with_row_index("wid")
        .with_columns(pl.col("w").str.extract_all(r".").alias("s"))
        .select("wid", "s")
        .explode("s", empty_as_null=False)
    )
    sym = d["s"].to_numpy()
    wid = d["wid"].to_numpy()
    for left, right, _n in merges:
        sym, wid = _apply_merge_np(sym, wid, left, right)
    out: List[List[str]] = [[] for _ in range(len(words))]
    for symbol, w in zip(sym, wid):
        out[int(w)].append(symbol)
    return out


def bpe_piece_stats(
    ds,
    merges: List[Tuple[str, str, int]],
    text_col: str = "text",
    group_col: Optional[str] = None,
):
    """Corpus compression profile under a learned vocab: per group (or
    one ``__all__`` row), total words, total pieces, and pieces-per-word
    — the metric a tokenizer-selection pass compares across vocab sizes.
    One streamed pass; the shuffle carries one row per (batch, group).
    """
    from ray.data.aggregate import Sum

    from .tokenize import tokenize_column

    mlist = [(l, r, int(n)) for (l, r, n) in merges]

    empty = pa.table(
        {"group": pa.array([], type=pa.string()),
         "n_words": pa.array([], type=pa.int64()),
         "n_pieces": pa.array([], type=pa.int64())}
    )

    def per_batch(batch: pa.Table) -> pa.Table:
        import polars as pl

        t = tokenize_column(batch.column(text_col), with_doc_index=True)
        if t.num_rows == 0:
            return empty
        words = t.column("token").to_numpy(zero_copy_only=False)
        # encode each DISTINCT word once, then weight by its batch count
        df = pl.DataFrame({"w": pl.Series(words, dtype=pl.String)})
        if group_col is not None:
            didx = t.column("doc_idx").to_numpy(zero_copy_only=False)
            grp = batch.column(group_col).to_numpy(zero_copy_only=False)
            df = df.with_columns(
                g=pl.Series(np.asarray(grp, dtype=object)[didx],
                            dtype=pl.String)
            )
        else:
            df = df.with_columns(g=pl.lit("__all__"))
        cnt = df.group_by(["g", "w"]).agg(pl.len().alias("c"))
        uw = cnt["w"].to_numpy()
        pieces = bpe_encode_batch(uw, mlist)
        np_pieces = np.array([len(p) for p in pieces], dtype=np.int64)
        cc = cnt["c"].to_numpy().astype(np.int64)
        out = (
            cnt.with_columns(
                pieces=pl.Series(np_pieces * cc),
                words=pl.Series(cc),
            )
            .group_by("g")
            .agg(pl.col("words").sum(), pl.col("pieces").sum())
        )
        return pa.table(
            {"group": out["g"].to_arrow().cast(pa.string()),
             "n_words": out["words"].to_arrow().cast(pa.int64()),
             "n_pieces": out["pieces"].to_arrow().cast(pa.int64())}
        )

    pre = ds.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    agg = pre.groupby("group").aggregate(
        Sum("n_words", alias_name="n_words"),
        Sum("n_pieces", alias_name="n_pieces"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        w = batch.column("n_words").to_numpy().astype(np.float64)
        p = batch.column("n_pieces").to_numpy().astype(np.float64)
        return batch.append_column(
            "pieces_per_word", pa.array(p / w, type=pa.float64())
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
