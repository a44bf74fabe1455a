"""Text analysis operators for training-data pipelines: language ID
(stopword/char-class heuristic), quality scoring (length/class ratios),
token counting, and document fingerprinting (rolling hash).

All vectorized per batch; the quality-score formulas are deliberately
SQL-expressible so the driver's DuckDB oracle can verify them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import hash_array, splitmix64
from .tokenize import tokenize_column

U64 = np.uint64

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for", "on", "with", "as", "at"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit", "den", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "dans", "que", "pour", "des", "du", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "un", "en", "que", "por", "para", "con", "del"},
}


def lang_id_batch(texts: pa.Array, toks: pa.Table | None = None) -> pa.Array:
    """Heuristic language per document: CJK-char share → ``zh``; else the
    language whose stopword set covers the largest token share; ``und``
    when nothing matches.

    Fully vectorized: ONE polars group_by over the exploded token column
    with an ``is_in(stopwords)`` sum per language, and
    ``str.count_matches`` for CJK chars — no Python loop over tokens or
    characters (the round-1 per-token loop was the hot-stage anti-pattern).
    Falls back to the pure-Python reference when polars is absent."""
    try:
        import polars as pl
    except Exception:  # pragma: no cover - no-polars deployments
        return _lang_id_batch_reference(texts)

    if toks is None:  # callers fusing several kernels pass one shared pass
        toks = tokenize_column(texts, with_doc_index=True)
    n = len(texts)
    langs = list(STOPWORDS)
    df = pl.from_arrow(toks)
    g = df.group_by("doc_idx").agg(
        [pl.len().cast(pl.Int64).alias("_total")]
        + [
            pl.col("token").is_in(sorted(sw)).sum().cast(pl.Int64).alias(lang)
            for lang, sw in STOPWORDS.items()
        ]
    )
    didx = g["doc_idx"].to_numpy()
    totals = np.zeros(n, dtype=np.int64)
    totals[didx] = g["_total"].to_numpy()
    ratio = np.zeros((n, len(langs)), dtype=np.float64)
    denom = np.maximum(totals, 1)
    for j, lang in enumerate(langs):
        c = np.zeros(n, dtype=np.int64)
        c[didx] = g[lang].to_numpy()
        ratio[:, j] = c / denom
    # CJK detection on raw text (vectorized char-class count)
    s = pl.from_arrow(texts)
    if isinstance(s, pl.DataFrame):  # pragma: no cover
        s = s.to_series()
    cjk = s.str.count_matches(r"[一-鿿]").fill_null(0).to_numpy()
    chars = s.str.len_chars().fill_null(0).to_numpy()
    cjk_ratio = cjk / np.maximum(chars, 1)
    best = np.argmax(ratio, axis=1)
    bestval = ratio[np.arange(n), best]
    out = np.where(
        cjk_ratio > 0.05,
        "zh",
        np.where(bestval >= 0.03, np.asarray(langs, dtype=object)[best], "und"),
    )
    return pa.array(out.tolist(), type=pa.string())


def _lang_id_batch_reference(texts: pa.Array) -> pa.Array:
    """Per-row Python reference implementation (tests only — asserts the
    vectorized path is behavior-identical)."""
    toks = tokenize_column(texts, with_doc_index=True)
    words = toks.column("token").to_pylist()
    didx = toks.column("doc_idx").to_numpy()
    n = len(texts)
    counts = {lang: np.zeros(n, dtype=np.int64) for lang in STOPWORDS}
    totals = np.zeros(n, dtype=np.int64)
    np.add.at(totals, didx, 1)
    for i, w in enumerate(words):
        for lang, sw in STOPWORDS.items():
            if w in sw:
                counts[lang][didx[i]] += 1
    cjk_ratio = np.zeros(n)
    for i, t in enumerate(texts.to_pylist()):
        if not t:
            continue
        cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
        cjk_ratio[i] = cjk / len(t)
    out = []
    langs = list(STOPWORDS)
    ratio = np.stack(
        [counts[lang] / np.maximum(totals, 1) for lang in langs], axis=1
    )
    best = np.argmax(ratio, axis=1)
    bestval = ratio[np.arange(n), best]
    for i in range(n):
        if cjk_ratio[i] > 0.05:
            out.append("zh")
        elif bestval[i] >= 0.03:
            out.append(langs[int(best[i])])
        else:
            out.append("und")
    return pa.array(out, type=pa.string())


def _ascii_class_counts(texts: pa.Array):
    """Per-doc (alpha_count, digit_count) via byte-class masks + one
    segment-sum each over the raw UTF-8 buffer — exactly the counts of the
    SQL ``[A-Za-z]`` / ``[0-9]`` character classes (those classes are pure
    ASCII, and ASCII bytes never occur inside multi-byte UTF-8 sequences).
    Returns None for layouts the fast path doesn't cover (nulls, non-flat
    string arrays) — callers fall back to the regex path."""
    if not isinstance(texts, pa.Array) or texts.null_count:
        return None
    if not (pa.types.is_string(texts.type) or pa.types.is_large_string(texts.type)):
        return None
    bufs = texts.buffers()
    odt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    offsets = np.frombuffer(bufs[1], dtype=odt)[
        texts.offset : texts.offset + len(texts) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    seg_len = np.diff(offsets)
    n = len(texts)
    if len(data) == 0:
        z = np.zeros(n, dtype=np.int64)
        return z, z
    # sentinel byte so a trailing empty doc's start == len(data) stays a
    # valid reduceat index WITHOUT clipping (clipping would shrink the
    # PREVIOUS segment's boundary and drop its last byte); the sentinel is
    # non-alpha/non-digit so it never contributes
    data = np.append(data, np.uint8(0))
    alpha = ((data >= 65) & (data <= 90)) | ((data >= 97) & (data <= 122))
    digit = (data >= 48) & (data <= 57)
    # remaining reduceat quirk: an empty segment returns data[start] —
    # zero empty segments afterwards
    starts = offsets[:-1]
    a = np.add.reduceat(alpha.astype(np.int64), starts)
    d = np.add.reduceat(digit.astype(np.int64), starts)
    empty = seg_len == 0
    a[empty] = 0
    d[empty] = 0
    return a, d


def quality_scores_batch(
    batch: pa.Table,
    text_col: str,
    id_col: str,
    n_tokens_precomputed: np.ndarray | None = None,
) -> pa.Table:
    """Exactly-SQL-expressible per-doc quality features:

    - ``char_len``: unicode character count;
    - ``n_tokens``: spec tokenizer count (``[A-Za-z]+`` runs ≤ 64 bytes);
    - ``alpha_ratio``: ASCII-alphabetic chars / char_len (0 for empty);
    - ``digit_ratio``: ASCII digits / char_len (0 for empty).

    ``n_tokens_precomputed`` (from a shared tokenize pass) skips the
    internal re-tokenize."""
    texts = batch.column(text_col).combine_chunks()
    char_len = pc.utf8_length(texts).cast(pa.int64())
    if n_tokens_precomputed is not None:
        n_tokens = pa.array(
            np.asarray(n_tokens_precomputed, dtype=np.int64), type=pa.int64()
        )
    else:
        from .tokenize import token_counts_per_doc

        n_tokens = pa.array(token_counts_per_doc(texts), type=pa.int64())
    counts = _ascii_class_counts(texts)
    if counts is not None:  # bytewise numpy: one pass per class, no regex
        alpha = pa.array(counts[0].astype("float64"))
        digit = pa.array(counts[1].astype("float64"))
    else:
        try:  # polars count_matches: same counts, ~10x faster than regex replace
            import polars as pl

            s = pl.from_arrow(texts)
            alpha = pa.array(
                s.str.count_matches("[A-Za-z]").to_numpy().astype("float64")
            )
            digit = pa.array(
                s.str.count_matches("[0-9]").to_numpy().astype("float64")
            )
        except Exception:  # pragma: no cover
            alpha = pc.utf8_length(
                pc.replace_substring_regex(texts, pattern="[^A-Za-z]", replacement="")
            ).cast(pa.float64())
            digit = pc.utf8_length(
                pc.replace_substring_regex(texts, pattern="[^0-9]", replacement="")
            ).cast(pa.float64())
    denom = pc.max_element_wise(char_len.cast(pa.float64()), pa.scalar(1.0))
    return pa.table(
        {
            id_col: batch.column(id_col),
            "char_len": char_len,
            "n_tokens": n_tokens,
            # single IEEE division → bitwise identical to the SQL oracle
            "alpha_ratio": pc.divide(alpha, denom),
            "digit_ratio": pc.divide(digit, denom),
        }
    )


FP_BASE = U64(1099511628211)


def doc_fingerprints_batch(
    texts: pa.Array | None = None,
    seed: int = 0xF1F0,
    *,
    token_hashes: np.ndarray | None = None,
    doc_idx: np.ndarray | None = None,
    n_docs: int | None = None,
) -> np.ndarray:
    """Order-sensitive rolling token-hash fingerprint per document:
    ``fp = Σ h(tok_i) · B^i  (mod 2^64)`` with B the FNV prime — a
    Rabin-Karp-style polynomial over the token stream, then finalized with
    splitmix64.  Deterministic; swapped tokens change the fingerprint.

    Pass ``token_hashes``/``doc_idx`` (from a shared tokenize+hash pass) to
    skip re-tokenizing; a per-use stream is derived from the base hashes so
    sharing one hash pass doesn't correlate the operators."""
    if token_hashes is not None:
        h = splitmix64(token_hashes ^ splitmix64(np.array([seed], dtype=np.uint64)))
        didx = doc_idx
        n = int(n_docs)
    else:
        toks = tokenize_column(texts, with_doc_index=True)
        h = hash_array(toks.column("token"), seed)
        didx = toks.column("doc_idx").to_numpy()
        n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if len(h):
        # position within each doc (didx nondecreasing: tokens in doc order)
        first = np.searchsorted(didx, np.arange(n))
        pos = np.arange(len(didx), dtype=np.int64) - first[didx]
        # B^pos mod 2^64 via ONE cumulative-product table indexed by pos
        # (positions are bounded by the longest document's token count)
        with np.errstate(over="ignore"):  # mod-2^64 arithmetic is intended
            max_pos = int(pos.max())
            table = np.empty(max_pos + 1, dtype=np.uint64)
            table[0] = 1
            if max_pos:
                np.cumprod(
                    np.full(max_pos, FP_BASE, dtype=np.uint64), out=table[1:]
                )
            powers = table[pos]
            docs_with = np.unique(didx)
            starts = np.searchsorted(didx, docs_with)
            out[docs_with] = np.add.reduceat(h * powers, starts)
    return splitmix64(out)


BPE_PIECE_RE = r"[A-Za-z0-9]{1,4}|[^A-Za-z0-9\s]"


def bpe_token_counts(texts: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Per-document BPE-ish subword token count: greedy runs of up to 4
    alphanumerics plus every non-space punctuation byte (``BPE_PIECE_RE``)
    — the standard cheap proxy for tokenizer cost when the real BPE vocab
    isn't available.  Vectorized via polars' Rust-regex
    ``str.count_matches``; the pattern is RE2-compatible, so the SQL
    oracle can recompute it with DuckDB's ``regexp_extract_all`` (both
    engines use leftmost-first greedy semantics; corpus is ASCII).  Nulls
    count 0."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    import polars as pl

    s = pl.from_arrow(texts)
    if not isinstance(s, pl.Series):  # empty arrow array edge
        return np.zeros(len(texts), dtype=np.int64)
    return (
        s.str.count_matches(BPE_PIECE_RE)
        .fill_null(0)
        .to_numpy()
        .astype(np.int64)
    )


def gopher_quality_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id",
    toks: pa.Table | None = None,
) -> pa.Table:
    """Gopher-style repetition/quality signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Table A1 repetition filters), adapted to
    word-level n-grams: per document ``n_words``, ``mean_word_chars``,
    ``dup_word_frac`` (1 − distinct/total), ``top_bigram_frac`` (most
    frequent adjacent pair / total pairs), ``dup_trigram_frac``
    (occurrences of within-doc repeated trigrams / total trigrams), and a
    composite ``gopher_pass`` flag (50 ≤ words ≤ 100 000, mean word length
    in [3, 10], top-bigram ≤ 0.20, dup-trigram ≤ 0.30 — the paper's
    thresholds for the signals kept here).

    Embarrassingly parallel — one tokenize pass per batch, polars
    group-bys, NO shuffle; every fraction is a single int64/int64 IEEE
    division so the DuckDB oracle hash-matches bit-for-bit.  Docs with
    zero tokens are excluded (the corpus-wide convention)."""
    import polars as pl

    from .tokenize import tokenize_column

    schema = pa.schema(
        [(id_col, pa.int64()), ("n_words", pa.int64()),
         ("mean_word_chars", pa.float64()), ("dup_word_frac", pa.float64()),
         ("top_bigram_frac", pa.float64()), ("dup_trigram_frac", pa.float64()),
         ("gopher_pass", pa.bool_())]
    )
    if batch.num_rows == 0:
        return schema.empty_table()
    if toks is None:  # fused callers share one tokenize pass
        toks = tokenize_column(batch.column(text_col), with_doc_index=True)
    if toks.num_rows == 0:
        return schema.empty_table()
    didx = toks.column("doc_idx").to_numpy()
    tok = toks.column("token").combine_chunks()

    df = pl.DataFrame({"d": didx, "w": pl.from_arrow(tok)})
    wstat = (
        df.group_by("d")
        .agg(n=pl.len().cast(pl.Int64),
             nd=pl.col("w").n_unique().cast(pl.Int64),
             chars=pl.col("w").str.len_bytes().sum().cast(pl.Int64))
        .sort("d")
    )
    docs = wstat["d"].to_numpy()
    n = wstat["n"].to_numpy().astype(np.int64)
    nd = wstat["nd"].to_numpy().astype(np.int64)
    chars = wstat["chars"].to_numpy().astype(np.int64)

    def _ngram_stats(k: int, reducer: str) -> np.ndarray:
        """Per-doc max (reducer='max') k-gram multiplicity or summed
        multiplicity of repeated k-grams (reducer='dup'), aligned to
        ``docs``; vectorized adjacency via shifted doc-index equality."""
        out = np.zeros(len(docs), dtype=np.int64)
        if len(didx) < k:
            return out
        same = didx[k - 1:] == didx[: len(didx) - k + 1]
        idx = np.flatnonzero(same)
        if len(idx) == 0:
            return out
        import pyarrow.compute as pc

        parts = [tok.take(pa.array(idx + j, type=pa.int64()))
                 for j in range(k)]
        joined = parts[0]
        for p in parts[1:]:
            joined = pc.binary_join_element_wise(joined, p, " ")
        g = pl.DataFrame({"d": didx[idx], "g": pl.from_arrow(joined)})
        gc = g.group_by(["d", "g"]).agg(c=pl.len().cast(pl.Int64))
        if reducer == "max":
            r = gc.group_by("d").agg(v=pl.col("c").max()).sort("d")
        else:
            r = (
                gc.filter(pl.col("c") >= 2)
                .group_by("d")
                .agg(v=pl.col("c").sum())
                .sort("d")
            )
        pos = np.searchsorted(docs, r["d"].to_numpy())
        out[pos] = r["v"].to_numpy().astype(np.int64)
        return out

    bmax = _ngram_stats(2, "max")
    tdup = _ngram_stats(3, "dup")

    nf = n.astype(np.float64)
    mean_chars = chars.astype(np.float64) / nf
    dup_word = (n - nd).astype(np.float64) / nf
    top_bigram = np.where(n >= 2, bmax.astype(np.float64)
                          / np.maximum(n - 1, 1).astype(np.float64), 0.0)
    dup_trigram = np.where(n >= 3, tdup.astype(np.float64)
                           / np.maximum(n - 2, 1).astype(np.float64), 0.0)
    ok = ((n >= 50) & (n <= 100_000)
          & (mean_chars >= 3.0) & (mean_chars <= 10.0)
          & (top_bigram <= 0.20) & (dup_trigram <= 0.30))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)[docs]
    return pa.table(
        {id_col: pa.array(ids, type=pa.int64()),
         "n_words": pa.array(n), "mean_word_chars": pa.array(mean_chars),
         "dup_word_frac": pa.array(dup_word),
         "top_bigram_frac": pa.array(top_bigram),
         "dup_trigram_frac": pa.array(dup_trigram),
         "gopher_pass": pa.array(ok)}
    )


def json_int_field(col, field: str):
    """Vectorized integer-field extraction from a JSON-string column
    (``json_extract(col, '$.field') :: BIGINT`` semantics for flat
    objects): one pyarrow ``extract_regex`` kernel over the Arrow buffer —
    no per-row json.loads.  Rows without the field (or with a non-integer
    value) yield null, matching SQL json_extract's null propagation.

    Top-level-field extraction by regex is exact for non-nested objects
    (the common event-props shape); nested objects with a same-named inner
    key would need a real parser — callers with nested payloads should
    decode via polars ``str.json_decode`` instead.  The value must be a
    bare JSON integer followed by ``,`` or ``}`` — floats and exponent
    forms yield null (DuckDB's CAST(json AS BIGINT) instead truncates;
    the shipped oracle only exercises integer-valued fields), and the
    delimiter requirement keeps ``"k": 7`` QUOTED INSIDE a string value
    from false-matching."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    pat = r'"' + re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)\s*[,}]'
    m = pc.extract_regex(col, pattern=pat)
    return pc.cast(pc.struct_field(m, "v"), pa.int64())
