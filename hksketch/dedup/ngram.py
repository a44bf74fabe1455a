"""Exact word n-gram Jaccard similarity (the MinHash verifier and a
standalone small-scale dedup oracle)."""

from __future__ import annotations

from ..text.tokenize import tokenize_text


def shingle_set(text: str, n: int = 3) -> frozenset:
    toks = tokenize_text(text)
    if len(toks) < n:
        return frozenset()
    return frozenset(tuple(toks[i : i + n]) for i in range(len(toks) - n + 1))


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    return jaccard(shingle_set(text_a, n), shingle_set(text_b, n))
