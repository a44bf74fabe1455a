"""Accuracy metrics, verbatim semantics from the reference harness.

- ``score``: hit_ratio = |reported ∩ true-top-k| / k; ARE over reported
  items present in the truth (`/root/reference/tests/accuracy_compare.rs:102-128`).
- ``score_paper_metrics``: reported set filtered by estimate ≥ threshold;
  precision & recall vs true heavy hitters (true count ≥ ⌈φ·N⌉); ARE over
  the TRUE set using the sketch's count (missing ⇒ 0)
  (`tests/accuracy_compare.rs:130-175`).
- ``score_results``: the trace-harness variant — hit_ratio, ARE over
  reported, ARE over true top-k (`examples/ip_files.rs:126-172`).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Sequence


def true_topk(truth: Mapping[Any, int], k: int) -> list[tuple[Any, int]]:
    """Sort count desc, key asc, truncate k (A2 semantics)."""
    return sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def score(
    reported: Sequence[tuple[Any, int]], truth: Mapping[Any, int], k: int
) -> tuple[float, float]:
    """(hit_ratio, ARE over reported∩truth)."""
    true_set = {key for key, _ in true_topk(truth, k)}
    rep_keys = {key for key, _ in reported}
    hit_ratio = len(rep_keys & true_set) / k
    errs = [
        abs(est - truth[key]) / truth[key]
        for key, est in reported
        if key in truth and truth[key] > 0
    ]
    are = sum(errs) / len(errs) if errs else 0.0
    return hit_ratio, are


def score_paper_metrics(
    sketch,
    reported: Sequence[tuple[Any, int]],
    truth: Mapping[Any, int],
    phi: float,
    n: int,
) -> tuple[float, float, float]:
    """(precision, recall, ARE-over-true-heavy-hitters)."""
    threshold = math.ceil(phi * n)
    true_hh = {key for key, c in truth.items() if c >= threshold}
    rep = {key for key, est in reported if est >= threshold}
    tp = len(rep & true_hh)
    precision = tp / len(rep) if rep else 1.0
    recall = tp / len(true_hh) if true_hh else 1.0
    errs = []
    for key in true_hh:
        est = sketch.count(key)
        errs.append(abs(est - truth[key]) / truth[key])
    are = sum(errs) / len(errs) if errs else 0.0
    return precision, recall, are


def score_results(
    reported: Sequence[tuple[Any, int]], truth: Mapping[Any, int], k: int
) -> tuple[float, float, float]:
    """(hit_ratio, ARE_reported, ARE_true_top_k) — needs count lookups only
    for reported items, so it works from the finalized list alone."""
    tk = true_topk(truth, k)
    true_set = {key for key, _ in tk}
    rep = dict(reported)
    hit_ratio = len(set(rep) & true_set) / min(k, len(true_set)) if tk else 1.0
    errs_rep = [
        abs(est - truth[key]) / truth[key] for key, est in rep.items() if key in truth
    ]
    are_rep = sum(errs_rep) / len(errs_rep) if errs_rep else 0.0
    errs_true = [
        abs(rep.get(key, 0) - c) / c for key, c in tk if c > 0
    ]
    are_true = sum(errs_true) / len(errs_true) if errs_true else 0.0
    return hit_ratio, are_rep, are_true
