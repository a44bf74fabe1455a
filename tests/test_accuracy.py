"""Statistical accuracy gates vs the exact oracle (BASELINE.md ✓gate rows,
mirroring /root/reference/tests/accuracy_compare.rs).

The paper-style heavy-hitter gate runs at the reference's exact
configuration (1M Zipf(1.2) samples, K=512, width=256, depth=4, decay=0.9,
φ=0.0005).  The hit-ratio gate uses the reference's floors with a
proportionally scaled stream (1M rows / 200k-key universe instead of
5M / 1M) to keep the suite fast; the 5M full-size variant runs under
``-m slow``.
"""

import collections

import numpy as np
import pytest

from hksketch.metrics import score, score_paper_metrics
from hksketch.sketch import BucketedTopK, CuckooTopK, TopK

SEED = 0xACC04ACC  # tests/accuracy_compare.rs:20


def zipf_bounded(rng, s, n, size):
    x = rng.zipf(s, size=size)
    over = x > n
    while over.any():
        x[over] = rng.zipf(s, size=int(over.sum()))
        over = x > n
    return x.astype(np.uint64)


def _run_stream(cls, keys, k, width, depth, decay, batches=20):
    tk = cls(k, width, depth, decay, seed=SEED)
    for chunk in np.array_split(keys, batches):
        tk.add_batch(chunk)
    return tk


@pytest.mark.parametrize(
    "s,floor",
    [(2.0, 0.80), (1.2, 0.50), (1.05, 0.20)],  # accuracy_compare.rs:203-272
)
def test_hit_ratio_floors(s, floor):
    rng = np.random.default_rng(SEED)
    keys = zipf_bounded(rng, s, 200_000, 1_000_000)
    truth = collections.Counter(keys.tolist())
    tk = _run_stream(BucketedTopK, keys, 100, 256, 4, 0.9)
    hit_ratio, are = score(tk.list(), truth, 100)
    assert hit_ratio >= floor, (s, hit_ratio)
    assert are < 1.0, (s, are)


@pytest.mark.parametrize("cls", [TopK, BucketedTopK, CuckooTopK])
def test_paper_heavy_hitter_floors(cls):
    # accuracy_compare.rs:274-404 exact configuration
    rng = np.random.default_rng(SEED)
    keys = zipf_bounded(rng, 1.2, 1_000_000, 1_000_000)
    truth = collections.Counter(keys.tolist())
    tk = _run_stream(cls, keys, 512, 256, 4, 0.9)
    precision, recall, are = score_paper_metrics(
        tk, tk.list(), truth, phi=0.0005, n=len(keys)
    )
    assert precision >= 0.85, precision
    assert recall >= 0.75, recall
    assert are < 0.25, are


@pytest.mark.slow
@pytest.mark.parametrize(
    "s,floor", [(2.0, 0.80), (1.2, 0.50), (1.05, 0.20)]
)
def test_hit_ratio_floors_full_size(s, floor):
    # the reference's full 5M-row / 1M-universe stream
    rng = np.random.default_rng(SEED)
    keys = zipf_bounded(rng, s, 1_000_000, 5_000_000)
    truth = collections.Counter(keys.tolist())
    tk = _run_stream(BucketedTopK, keys, 100, 256, 4, 0.9, batches=50)
    hit_ratio, are = score(tk.list(), truth, 100)
    assert hit_ratio >= floor, (s, hit_ratio)
    assert are < 1.0, (s, are)
