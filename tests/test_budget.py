"""budget_per_group (pipelines/caps.py): token-budget mixture sampling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _brute(rows, budget):
    """(group, id, w) kept set by the definition: inclusive running weight
    in (lcg_rank, id) order ≤ budget."""
    from hksketch.pipelines.caps import lcg_rank

    kept = set()
    by_g: dict = {}
    for g, i, w in rows:
        by_g.setdefault(g, []).append((int(lcg_rank(np.array([i]))[0]), i, w))
    for g, lst in by_g.items():
        lst.sort()
        cum = 0
        for r, i, w in lst:
            cum += w
            if cum <= budget:
                kept.add((g, i))
    return kept


def _ds(rows, blocks=1):
    import ray.data as rd

    t = pa.table(
        {"source": pa.array([r[0] for r in rows]),
         "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
         "n_chars": pa.array([r[2] for r in rows], type=pa.int64())}
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


@pytest.mark.parametrize("blocks", [1, 7])
def test_budget_matches_bruteforce_any_partitioning(ray_session, blocks):
    from hksketch.pipelines.caps import budget_per_group

    rng = np.random.default_rng(11)
    rows = [
        (f"s{rng.integers(0, 4)}", int(i), int(rng.integers(0, 40)))
        for i in rng.permutation(60)
    ]
    out = budget_per_group(
        _ds(rows, blocks), "source", "doc_id", "n_chars", budget=100
    ).to_pandas()
    got = set(zip(out["source"], out["doc_id"]))
    assert got == _brute(rows, 100)


def test_budget_monotone_and_zero(ray_session):
    from hksketch.pipelines.caps import budget_per_group

    rows = [("a", i, 10) for i in range(10)]
    small = budget_per_group(
        _ds(rows), "source", "doc_id", "n_chars", budget=30
    ).to_pandas()
    big = budget_per_group(
        _ds(rows), "source", "doc_id", "n_chars", budget=70
    ).to_pandas()
    assert len(small) == 3 and len(big) == 7
    assert set(small["doc_id"]) <= set(big["doc_id"])  # monotone in budget
    none = budget_per_group(
        _ds(rows), "source", "doc_id", "n_chars", budget=0
    ).to_pandas()
    assert len(none) == 0


def test_budget_zero_weight_rows_ride_free(ray_session):
    """Zero-weight rows never consume budget and survive whenever the
    running total at their position is within budget."""
    from hksketch.pipelines.caps import budget_per_group

    rows = [("a", 1, 0), ("a", 2, 5), ("a", 3, 0), ("a", 4, 5)]
    out = budget_per_group(
        _ds(rows), "source", "doc_id", "n_chars", budget=5
    ).to_pandas()
    got = set(zip(out["source"], out["doc_id"]))
    assert got == _brute(rows, 5)
    assert len(out) == len(got)  # no duplicate emissions


def test_budget_validation(ray_session):
    from hksketch.pipelines.caps import budget_per_group

    with pytest.raises(ValueError):
        budget_per_group(_ds([("a", 1, 1)]), "source", "doc_id", "n_chars", -1)
    import ray

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        budget_per_group(
            _ds([("a", 1, -5)]), "source", "doc_id", "n_chars", 10
        ).to_pandas()
