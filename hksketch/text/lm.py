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
