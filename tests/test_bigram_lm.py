"""Interpolated bigram LM (text/lm.py): brute-force recompute equality,
edge cases (single-token docs, unseen bigrams at score time when the
model is trained on a different corpus, OOV tokens), determinism."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

LAM = 0.75


def _brute(train_docs, score_docs, vocab_cap=1 << 16, bigram_cap=1 << 18):
    """Pure-Python reference with the identical quantization rules."""
    from hksketch.text.tokenize import tokenize_text

    def toks(d):
        return tokenize_text(d)

    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    for d in train_docs:
        ts = toks(d)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for p, w in zip(ts, ts[1:]):
            bi[(p, w)] = bi.get((p, w), 0) + 1
            ctx[p] = ctx.get(p, 0) + 1
    T, V = sum(uni.values()), len(uni)
    denom = float(T) + float(V) + 1.0
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_cap])
    bicap = dict(
        sorted(bi.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        [:bigram_cap]
    )

    def fl(x):
        return int(math.floor(x * 1e6 + 0.5))

    out = []
    for doc_id, d in enumerate(score_docs):
        ts = toks(d)
        if not ts:
            continue
        s = 0
        for i, w in enumerate(ts):
            c = vocab.get(w, 0)
            pu = (float(c) + 1.0) / denom
            if i == 0:
                s += fl(math.log(pu))
            elif (ts[i - 1], w) in bicap:
                c2 = bicap[(ts[i - 1], w)]
                cx = ctx[ts[i - 1]]
                s += fl(math.log(LAM * (float(c2) / float(cx))
                                 + (1.0 - LAM) * pu))
            else:
                s += fl(math.log((1.0 - LAM) * pu))
        nt = len(ts)
        ppl = math.exp((-float(s) / 1e6) / float(nt))
        out.append(
            {"doc_id": doc_id, "n_tokens": nt, "nll_micro": -s,
             "ppl_milli": math.floor(ppl * 1000.0 + 0.5) / 1000.0}
        )
    return out


def _docs_ds(texts, blocks=1):
    import ray.data as rd

    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


TEXTS = [
    "the cat sat on the mat the cat ran",
    "the dog sat on the log",
    "cat",                       # single token: pure unigram
    "zebra quagga zebra",        # rare words
    "the cat sat the cat sat",   # repeated bigrams
    "",                          # empty: dropped from output
]


@pytest.mark.parametrize("blocks", [1, 4])
def test_bigram_lm_matches_bruteforce(ray_session, blocks):
    from hksketch.text.lm import lm_perplexity_bigram

    got = (
        lm_perplexity_bigram(_docs_ds(TEXTS, blocks))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _brute(TEXTS, TEXTS)
    assert got["doc_id"].tolist() == [w["doc_id"] for w in want]
    assert got["n_tokens"].tolist() == [w["n_tokens"] for w in want]
    assert got["nll_micro"].tolist() == [w["nll_micro"] for w in want]
    assert got["ppl_milli"].tolist() == [w["ppl_milli"] for w in want]


def test_bigram_lm_cross_corpus_oov_and_backoff(ray_session):
    """Model trained on one corpus scores another: OOV tokens and unseen
    bigrams take the backoff paths; results equal the reference."""
    from hksketch.text.lm import lm_perplexity_bigram, train_bigram_lm

    score_texts = ["the cat flew", "unknown words only", "dog the"]
    model = train_bigram_lm(_docs_ds(TEXTS), "text")
    got = (
        lm_perplexity_bigram(_docs_ds(score_texts), model=model)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _brute(TEXTS, score_texts)
    assert got["nll_micro"].tolist() == [w["nll_micro"] for w in want]
    assert got["ppl_milli"].tolist() == [w["ppl_milli"] for w in want]


def test_bigram_lm_lower_ppl_than_unigram_on_predictable_text(ray_session):
    """On text with strong bigram structure the interpolated model must
    beat the unigram gate (the reason to go one order up)."""
    from hksketch.text.lm import lm_perplexity, lm_perplexity_bigram

    texts = ["a b a b a b a b a b a b a b a b"] * 4
    uni = lm_perplexity(_docs_ds(texts)).to_pandas()
    bi = lm_perplexity_bigram(_docs_ds(texts)).to_pandas()
    assert (bi["ppl_milli"] < uni["ppl_milli"]).all()
