"""ASCII word tokenizer — byte-identity anchor vs the reference.

Spec (mirrors `/root/reference/examples/word_count.rs:131-165`, FIXTURES.md F2):

- a token is a maximal run of ASCII alphabetic bytes (``[A-Za-z]+``); every
  other byte is a separator (`word_count.rs:137-149`);
- tokens longer than 64 bytes are skipped entirely, NOT truncated
  (`word_count.rs:152`, ``MAX_WORD_LEN = 64`` at `word_count.rs:9`);
- tokens are lowercased byte-wise (``to_ascii_lowercase`` semantics,
  `word_count.rs:157-158`) — we extract first and lowercase after, so
  Unicode lowercasing rules can never create or alter token bytes;
- each token contributes weight 1 (`word_count.rs:162`).

Byte-level and str-level tokenization agree for UTF-8 input because no
UTF-8 continuation/lead byte falls in ``[A-Za-z]``.

Vectorized via polars ``str.extract_all`` (Rust regex) with a pure-Python
oracle (`tokenize_text`) used by the conformance tests.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

MAX_WORD_LEN = 64
_TOKEN_RE = re.compile(rb"[A-Za-z]+")

try:
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False


def tokenize_text(text: str | bytes) -> list[str]:
    """Pure-Python oracle tokenizer (the conformance spec)."""
    data = text.encode("utf-8") if isinstance(text, str) else text
    out = []
    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if len(tok) <= MAX_WORD_LEN:
            out.append(tok.lower().decode("ascii"))
    return out


def tokenize_column(
    texts: pa.Array | pa.ChunkedArray,
    with_doc_index: bool = False,
) -> pa.Table:
    """Vectorized tokenizer over an Arrow string column.

    Returns a table with column ``token`` (exploded, one row per token, in
    document order) and, when ``with_doc_index``, an ``doc_idx`` int64 column
    mapping each token back to its input row.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if _HAVE_POLARS:
        s = pl.from_arrow(texts)
        if not isinstance(s, pl.Series):
            s = pl.Series(s)
        df = pl.DataFrame({"text": s})
        out = (
            df.with_row_index("doc_idx")
            .with_columns(pl.col("text").str.extract_all(r"[A-Za-z]+").alias("tok"))
            .drop("text")
            .explode("tok", empty_as_null=False)
            .drop_nulls("tok")
            .filter(pl.col("tok").str.len_bytes() <= MAX_WORD_LEN)
            .with_columns(pl.col("tok").str.to_lowercase().alias("token"))
            .drop("tok")
        )
        t = out.to_arrow()
        token = t.column("token")
        if token.type != pa.large_string():
            token = token.cast(pa.large_string())
        cols = {"token": token.cast(pa.string())}
        if with_doc_index:
            cols["doc_idx"] = t.column("doc_idx").cast(pa.int64())
        return pa.table(cols)
    # fallback: python loop
    tokens: list[str] = []
    idxs: list[int] = []
    for i, v in enumerate(texts.to_pylist()):
        if v is None:
            continue
        for tok in tokenize_text(v):
            tokens.append(tok)
            idxs.append(i)
    cols = {"token": pa.array(tokens, type=pa.string())}
    if with_doc_index:
        cols["doc_idx"] = pa.array(idxs, type=pa.int64())
    return pa.table(cols)


def token_counts_per_doc(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Number of (length-filtered) tokens per document, vectorized."""
    t = tokenize_column(texts, with_doc_index=True)
    n = len(texts)
    idx = t.column("doc_idx").to_numpy()
    return np.bincount(idx, minlength=n).astype(np.int64)
