"""Unigram language-model perplexity scoring — the CCNet-style corpus
quality filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", 2019 — their KenLM perplexity gate), built
from scratch as two Ray Data passes with an integer-exact score so the
DuckDB oracle can hash-match bit-for-bit.

Shape (design for 10^12 docs):

1. **Train** — one combiner-pattern shuffle: per-batch token counts
   (``polars group_by`` inside ``map_batches``, one row per distinct token
   per batch) → ``groupby(token).sum`` — shuffle volume ∝ distinct tokens
   per batch, not corpus tokens.  The counts table (vocab-sized, ≪ corpus)
   is materialized ONCE and reused for the three small follow-ups: total
   token count ``T``, vocab size ``V``, and the top-``vocab_cap`` model rows
   (``sort([c desc, token asc]).limit`` — deterministic cap; everything
   below the cap scores as out-of-vocabulary).
2. **Score** — a single streaming pass: the capped model is ``ray.put``
   once as (sorted token-hash array, per-token log-prob array); each actor
   binds it once in ``__init__`` and scores batches by hash +
   ``searchsorted`` — no shuffle, no re-ship per batch.

Score arithmetic (the oracle-exactness trick, same discipline as the PMI
collocations): per-token add-one log-probs are frozen to MICRO-units
(``floor(ln((c+1)/(T+V+1)) * 1e6 + 0.5)`` as int64) at model build, so the
per-document sum is an order-independent integer — immune to float
summation order across batches/shards — and the only floats in the output
(``ppl_milli``) are derived from those integers by a fixed operation
sequence mirrored in the SQL.  OOV tokens take ``c = 0``.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

import ray

from .tokenize import tokenize_column

_SCORE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
     ("nll_micro", pa.int64()), ("ppl_milli", pa.float64())]
)


def _logp_micro(counts: np.ndarray, total: int, vocab: int) -> np.ndarray:
    """``floor(ln((c+1)/(T+V+1)) * 1e6 + 0.5)`` as int64 — one IEEE
    division then ``ln``, exactly the oracle's expression shape."""
    denom = float(total) + float(vocab) + 1.0
    x = np.log((counts.astype(np.float64) + 1.0) / denom)
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def scattered_doc_sample(ds, id_col: str = "doc_id", keep_1_in: int = 100):
    """Deterministic hash-of-id sample for LM training at corpus scale.

    CCNet trains its LM on a reference subset, not the whole crawl;
    training the unigram model on a 1-in-``keep_1_in`` scattered sample
    cuts the training scan to ~1/k of the corpus while the scoring pass
    stays full.  Hash-scattered (splitmix-family ``hash_array``), so the
    sample is unbiased w.r.t. storage order — the same discipline as the
    IVF centroid sampling, whose head-sample-bias test shows why
    ``limit(n)`` is wrong here.  NOT used by the oracle-gated query (the
    SQL mirror needs the exact full-corpus model); this is the documented
    scale path for 10^12-doc runs."""
    from ..hashing import hash_array

    if keep_1_in < 1:
        raise ValueError(f"keep_1_in must be >= 1, got {keep_1_in}")
    mod = np.uint64(keep_1_in)

    def pick(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        h = hash_array(b.column(id_col), 0x5A3F)
        return b.filter(pa.array(h % mod == 0))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def train_unigram_lm(
    ds,
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
    seed: int = 0,
    batch_size: int = 8192,
):
    """Train the model over ``ds[text_col]``; returns a dict with sorted
    ``hashes`` (uint64), aligned ``logp`` (int64 micro-units), scalar
    ``oov`` logp, and the ``total``/``vocab`` counts it was built from.

    The returned arrays are ``vocab_cap``-bounded (driver-safe by
    construction); the counts *table* the cap is taken from stays
    distributed.
    """
    from ray.data.aggregate import Sum

    from ..hashing import hash_array

    try:
        import polars as pl
    except Exception:  # pragma: no cover
        pl = None

    def tok_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"token": pa.array([], type=pa.large_string()),
                             "c": pa.array([], type=pa.int64())})
        toks = tokenize_column(batch.column(text_col))
        tcol = toks.column("token").combine_chunks()
        if pl is not None:
            g = pl.DataFrame({"token": pl.from_arrow(tcol)}).group_by(
                "token"
            ).agg(pl.len().cast(pl.Int64).alias("c"))
            t = g.to_arrow()
            return pa.table({"token": t.column("token").cast(pa.large_string()),
                             "c": t.column("c")})
        import collections

        c = collections.Counter(tcol.to_pylist())
        return pa.table({"token": pa.array(list(c), type=pa.large_string()),
                         "c": pa.array(list(c.values()), type=pa.int64())})

    pre = ds.map_batches(
        tok_counts, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    # Vocab-sized table (≪ corpus tokens); materialized once so T / V / cap
    # don't re-run the tokenize pass three times.
    counts = pre.groupby("token").aggregate(Sum("c", alias_name="c")).materialize()
    vocab = int(counts.count())
    if vocab == 0:
        return {"hashes": np.empty(0, dtype=np.uint64),
                "logp": np.empty(0, dtype=np.int64),
                "counts": np.empty(0, dtype=np.int64),
                "oov": int(_logp_micro(np.zeros(1, dtype=np.int64), 0, 0)[0]),
                "total": 0, "vocab": 0, "seed": seed}
    total = int(counts.sum("c"))
    top = counts.sort(["c", "token"], descending=[True, False]).limit(vocab_cap)
    from ..pipelines.ops import collect_blocks

    # sort+limit can emit schema-less empty blocks — filter before concat
    # (vocab > 0 here, so at least one non-empty block exists)
    tt = pa.concat_tables(collect_blocks(top)).combine_chunks()
    toks = tt.column("token")
    c = tt.column("c").to_numpy().astype(np.int64)
    lp = _logp_micro(c, total, vocab)
    h = hash_array(toks, seed)
    order = np.argsort(h, kind="stable")
    return {"hashes": h[order], "logp": lp[order],
            "counts": c[order],
            "oov": int(_logp_micro(np.zeros(1, dtype=np.int64), total, vocab)[0]),
            "total": total, "vocab": vocab, "seed": seed}


class LMScore:
    """Actor-pool scoring stage: model bound once per actor in
    ``__init__`` (broadcast via ``ray.put``), batches scored by hash +
    ``searchsorted`` + int64 segment sums — no Python loop over rows."""

    def __init__(self, model_or_ref: Any, text_col: str = "text",
                 id_col: str = "doc_id"):
        model = (
            ray.get(model_or_ref)
            if isinstance(model_or_ref, ray.ObjectRef)
            else model_or_ref
        )
        self.hashes = model["hashes"]
        self.logp = model["logp"]
        self.oov = np.int64(model["oov"])
        self.seed = model["seed"]
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table, toks: pa.Table | None = None) -> pa.Table:
        from ..hashing import hash_array

        if batch.num_rows == 0:
            return _SCORE_SCHEMA.empty_table()
        if toks is None:  # fused callers share one tokenize pass
            toks = tokenize_column(batch.column(self.text_col),
                                   with_doc_index=True)
        didx = toks.column("doc_idx").to_numpy()
        n = batch.num_rows
        th = hash_array(toks.column("token"), self.seed)
        lp = np.full(len(th), self.oov, dtype=np.int64)
        if len(self.hashes) and len(th):
            pos = np.searchsorted(self.hashes, th)
            pos_c = np.minimum(pos, len(self.hashes) - 1)
            hit = self.hashes[pos_c] == th
            lp[hit] = self.logp[pos_c[hit]]
        # int64 segment sums in doc order: didx is ascending by
        # construction, so reduceat over the NONEMPTY segment starts is
        # exact (consecutive nonempty starts bound each segment; empty
        # segments share a boundary and are excluded — the reduceat
        # empty-segment pitfall never arises)
        starts = np.searchsorted(didx, np.arange(n), side="left")
        ends = np.append(starts[1:], len(lp)).astype(np.int64)
        keep = ends > starts
        if not keep.any():
            return _SCORE_SCHEMA.empty_table()
        s = np.add.reduceat(lp, starts[keep])
        nt = (ends - starts)[keep]
        ppl = np.exp((-s.astype(np.float64) / 1e6) / nt.astype(np.float64))
        ppl_milli = np.floor(ppl * 1000.0 + 0.5) / 1000.0
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "n_tokens": pa.array(nt),
                         "nll_micro": pa.array(-s),
                         "ppl_milli": pa.array(ppl_milli)})


def lm_perplexity(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 1 << 16,
    seed: int = 0,
    model: Optional[dict] = None,
    concurrency: "int | tuple" = (1, 8),
):
    """Train on ``ds`` (unless a pre-trained ``model`` is passed) and score
    every document: ``(doc_id, n_tokens, nll_micro, ppl_milli)`` for each
    doc with ≥ 1 token.  Two streaming passes over the text, one
    combiner-shuffle, one broadcast — nothing corpus-sized ever lands on
    the driver."""
    if model is None:
        model = train_unigram_lm(ds, text_col, vocab_cap=vocab_cap, seed=seed)
    ref = ray.put(model)
    return ds.map_batches(
        LMScore, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(ref, text_col, id_col), concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# Interpolated bigram LM (the CCNet gate one order up)
# ---------------------------------------------------------------------------

_LAMBDA = 0.75  # exactly representable in binary → (1 − λ) = 0.25 exact


def _pair_counts(ds, text_col: str, batch_size: int):
    """Distributed within-doc consecutive-bigram counts: per-batch polars
    group_by on the joined pair string (one row per distinct pair per
    batch) → groupby(pair).sum — shuffle ∝ distinct pairs per batch."""
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], type=pa.large_string()),
                          "c2": pa.array([], type=pa.int64())})
        if batch.num_rows == 0:
            return empty
        toks = tokenize_column(batch.column(text_col), with_doc_index=True)
        if toks.num_rows < 2:
            return empty
        import polars as pl

        t = pl.from_arrow(toks)
        d = t.with_columns(
            pl.col("token").shift(1).alias("prev"),
            pl.col("doc_idx").shift(1).alias("prev_doc"),
        ).filter(pl.col("doc_idx") == pl.col("prev_doc"))
        if d.height == 0:
            return empty
        g = (
            d.with_columns(
                (pl.col("prev") + pl.lit(" ") + pl.col("token")).alias("pair")
            )
            .group_by("pair")
            .agg(pl.len().cast(pl.Int64).alias("c2"))
        ).to_arrow()
        return pa.table({"pair": g.column("pair").cast(pa.large_string()),
                         "c2": g.column("c2").cast(pa.int64())})

    pre = ds.map_batches(
        pairs, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    return pre.groupby("pair").aggregate(Sum("c2", alias_name="c2")).materialize()


def train_bigram_lm(
    ds,
    text_col: str = "text",
    vocab_cap: int = 1 << 16,
    bigram_cap: int = 1 << 18,
    seed: int = 0,
    batch_size: int = 8192,
):
    """Interpolated bigram LM: ``P(w|prev) = λ·c₂(prev,w)/ctx(prev)
    + (1−λ)·P_add-one-unigram(w)`` with λ = 0.75 (binary-exact, so both
    engines share the literal).  Every per-position log-prob is frozen to
    int64 micro-units at TRAIN time, so scoring stays order-independent
    integer sums:

    - per capped bigram: ``lp_bi = floor(ln(λ·c₂/cx + (1−λ)·p_uni)·1e6
      + 0.5)`` (p_uni from the CAPPED unigram model, c = 0 below cap);
    - per token: ``lp_first`` (document-initial: pure unigram) and
      ``lp_backoff`` (unknown bigram: ``ln((1−λ)·p_uni)``), plus the two
      OOV scalars.

    The bigram table is capped deterministically (c₂ desc, pair asc);
    context totals ``ctx(prev)`` come from the UNCAPPED distributed pair
    table (a proper conditional).  All model arrays are cap-bounded —
    driver/broadcast safe; the counts tables stay distributed."""
    import pyarrow.compute as pc

    from ..hashing import hash_array
    from ..pipelines.ops import collect_blocks

    uni = train_unigram_lm(ds, text_col, vocab_cap=vocab_cap, seed=seed,
                           batch_size=batch_size)
    total, vocab = uni["total"], uni["vocab"]
    denom = float(total) + float(vocab) + 1.0 if vocab else 1.0
    lp_first = uni["logp"]
    # backoff per known token: ln((1−λ) · (c+1)/denom)
    if vocab:
        pb = (1.0 - _LAMBDA) * (
            (uni["counts"].astype(np.float64) + 1.0) / denom
        )
        lp_backoff = np.floor(np.log(pb) * 1e6 + 0.5).astype(np.int64)
        oov_backoff = int(np.floor(
            np.log((1.0 - _LAMBDA) * (1.0 / denom)) * 1e6 + 0.5
        ))
    else:
        lp_backoff = np.empty(0, dtype=np.int64)
        oov_backoff = 0
    model = {
        "uni_hashes": uni["hashes"], "lp_first": lp_first,
        "lp_backoff": lp_backoff, "oov_first": uni["oov"],
        "oov_backoff": oov_backoff,
        "bi_hashes": np.empty(0, dtype=np.uint64),
        "bi_lp": np.empty(0, dtype=np.int64),
        "total": total, "vocab": vocab, "seed": seed, "lam": _LAMBDA,
    }
    if vocab == 0:
        return model

    bi = _pair_counts(ds, text_col, batch_size)
    if bi.count() == 0:
        return model
    # ctx(prev) = Σ c₂ over the UNCAPPED pair table — distributed groupby
    from ray.data.aggregate import Sum

    def prev_of(b: pa.Table) -> pa.Table:
        pair = b.column("pair").cast(pa.string())
        prev = pc.replace_substring_regex(pair, " .*$", "")
        return pa.table({"prev": prev, "c2": b.column("c2")})

    ctx = (
        bi.map_batches(prev_of, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("prev")
        .aggregate(Sum("c2", alias_name="cx"))
    )
    top = bi.sort(["c2", "pair"], descending=[True, False]).limit(bigram_cap)
    tt = pa.concat_tables(
        collect_blocks(top)
        or [pa.table({"pair": pa.array([], type=pa.large_string()),
                      "c2": pa.array([], type=pa.int64())})]
    ).combine_chunks()
    if tt.num_rows == 0:
        return model
    pairs = tt.column("pair").cast(pa.string())
    c2 = tt.column("c2").to_numpy().astype(np.int64)
    prevs = pc.replace_substring_regex(pairs, " .*$", "")
    ws = pc.replace_substring_regex(pairs, "^.* ", "")
    # bounded ctx lookup: only the capped bigrams' prevs (≤ bigram_cap)
    prev_set = pc.unique(prevs)
    ctx_rows = pa.concat_tables(
        collect_blocks(
            ctx.map_batches(
                lambda b, _ps=prev_set: b.filter(
                    pc.is_in(b.column("prev"), value_set=_ps)
                ),
                batch_format="pyarrow", zero_copy_batch=True,
            )
        )
        or [pa.table({"prev": pa.array([], type=pa.string()),
                      "cx": pa.array([], type=pa.int64())})]
    ).combine_chunks()
    ctx_h = hash_array(ctx_rows.column("prev"), seed)
    ctx_order = np.argsort(ctx_h, kind="stable")
    ctx_h, ctx_v = ctx_h[ctx_order], (
        ctx_rows.column("cx").to_numpy().astype(np.int64)[ctx_order]
    )
    ph = hash_array(prevs, seed)
    pos = np.searchsorted(ctx_h, ph)
    pos_c = np.minimum(pos, max(len(ctx_h) - 1, 0))
    cx = np.where(
        (len(ctx_h) > 0) & (ctx_h[pos_c] == ph), ctx_v[pos_c], 1
    ).astype(np.int64)  # every capped bigram's prev IS in ctx by construction
    # unigram count of w under the CAP (0 when w fell below the cap)
    wh = hash_array(ws, seed)
    uh = uni["hashes"]
    wpos = np.searchsorted(uh, wh)
    wpos_c = np.minimum(wpos, max(len(uh) - 1, 0))
    whit = (len(uh) > 0) & (uh[wpos_c] == wh)
    cw = np.where(whit, uni["counts"][np.minimum(wpos_c, len(uh) - 1)], 0)
    p = _LAMBDA * (c2.astype(np.float64) / cx.astype(np.float64)) + (
        1.0 - _LAMBDA
    ) * ((cw.astype(np.float64) + 1.0) / denom)
    bi_lp = np.floor(np.log(p) * 1e6 + 0.5).astype(np.int64)
    bh = hash_array(pairs, seed)
    order = np.argsort(bh, kind="stable")
    model["bi_hashes"] = bh[order]
    model["bi_lp"] = bi_lp[order]
    return model


class BigramLMScore:
    """Actor-pool scoring stage for the interpolated bigram model: one
    tokenize per batch, token + pair hashes, three searchsorted lookups
    (bigram, first-token unigram, backoff), int64 segment sums — no
    Python loop over rows."""

    def __init__(self, model_or_ref: Any, text_col: str = "text",
                 id_col: str = "doc_id"):
        model = (
            ray.get(model_or_ref)
            if isinstance(model_or_ref, ray.ObjectRef)
            else model_or_ref
        )
        self.m = model
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..hashing import hash_array

        if batch.num_rows == 0:
            return _SCORE_SCHEMA.empty_table()
        m = self.m
        toks = tokenize_column(batch.column(self.text_col),
                               with_doc_index=True)
        didx = toks.column("doc_idx").to_numpy()
        n = batch.num_rows
        tcol = toks.column("token")
        th = hash_array(tcol, m["seed"])
        k = len(th)
        lp = np.empty(k, dtype=np.int64)
        if k:
            # unigram lookups (first-token and backoff variants)
            uh, lp_first, lp_back = (
                m["uni_hashes"], m["lp_first"], m["lp_backoff"])
            if len(uh):
                upos = np.minimum(np.searchsorted(uh, th), len(uh) - 1)
                uhit = uh[upos] == th
                first_lp = np.where(uhit, lp_first[upos],
                                    np.int64(m["oov_first"]))
                back_lp = np.where(uhit, lp_back[upos],
                                   np.int64(m["oov_backoff"]))
            else:
                first_lp = np.full(k, m["oov_first"], dtype=np.int64)
                back_lp = np.full(k, m["oov_backoff"], dtype=np.int64)
            # pair hashes for positions whose predecessor is in-doc
            same = np.zeros(k, dtype=bool)
            same[1:] = didx[1:] == didx[:-1]
            prev = tcol.slice(0, k - 1).cast(pa.string())
            cur = tcol.slice(1).cast(pa.string())
            joined = pc.binary_join_element_wise(prev, cur, " ")
            bh_tail = hash_array(joined, m["seed"])
            lp[:] = first_lp  # default: doc-initial unigram
            if len(m["bi_hashes"]):
                bpos = np.minimum(
                    np.searchsorted(m["bi_hashes"], bh_tail),
                    len(m["bi_hashes"]) - 1,
                )
                bhit = m["bi_hashes"][bpos] == bh_tail
            else:
                bhit = np.zeros(k - 1 if k else 0, dtype=bool)
                bpos = np.zeros(k - 1 if k else 0, dtype=np.int64)
            tail_idx = np.arange(1, k)
            use_bi = same[1:] & bhit
            use_back = same[1:] & ~bhit
            if len(m["bi_hashes"]):
                lp[tail_idx[use_bi]] = m["bi_lp"][bpos[use_bi]]
            lp[tail_idx[use_back]] = back_lp[1:][use_back]
        starts = np.searchsorted(didx, np.arange(n), side="left")
        ends = np.append(starts[1:], k).astype(np.int64)
        keep = ends > starts
        if not keep.any():
            return _SCORE_SCHEMA.empty_table()
        s = np.add.reduceat(lp, starts[keep])
        nt = (ends - starts)[keep]
        ppl = np.exp((-s.astype(np.float64) / 1e6) / nt.astype(np.float64))
        ppl_milli = np.floor(ppl * 1000.0 + 0.5) / 1000.0
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "n_tokens": pa.array(nt),
                         "nll_micro": pa.array(-s),
                         "ppl_milli": pa.array(ppl_milli)})


def lm_perplexity_bigram(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 1 << 16,
    bigram_cap: int = 1 << 18,
    seed: int = 0,
    model: Optional[dict] = None,
    concurrency: "int | tuple" = (1, 8),
):
    """Train the interpolated bigram LM (unless ``model`` given) and score
    every document — three streaming passes over the text (unigram
    counts, bigram counts, scoring), two combiner shuffles, one
    broadcast."""
    if model is None:
        model = train_bigram_lm(ds, text_col, vocab_cap=vocab_cap,
                                bigram_cap=bigram_cap, seed=seed)
    ref = ray.put(model)
    return ds.map_batches(
        BigramLMScore, batch_format="pyarrow", zero_copy_batch=True,
        fn_constructor_args=(ref, text_col, id_col), concurrency=concurrency,
    )
