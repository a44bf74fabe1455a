"""Window/rank operators: grouped_topn, keyed_daily_running,
trailing_daily_sum, pivot_counts, rollup2_sums — each checked against a
brute-force pandas/numpy recompute across multi-block inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_US_PER_DAY = 86_400_000_000


def _rand_events(n=4000, n_users=60, n_days=40, seed=3, neg=False):
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, n_users, n).astype(np.int64)
    day = rng.integers(0, n_days, n).astype(np.int64)
    ts = day * _US_PER_DAY + rng.integers(0, _US_PER_DAY, n)
    amt = rng.integers(-500 if neg else 1, 500, n).astype(np.int64)
    return pa.table(
        {
            "user_id": pa.array(uid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "amount": pa.array(amt),
        }
    )


def test_grouped_topn_matches_bruteforce(ray_session):
    import ray.data as rd

    from hksketch.pipelines.windows import grouped_topn

    rng = np.random.default_rng(7)
    n = 3000
    t = pa.table(
        {
            "grp": pa.array(rng.integers(0, 8, n).astype(np.int64)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
            # coarse values force ties → the id tie-break must decide
            "val": pa.array(rng.integers(0, 20, n).astype(np.float64)),
        }
    )
    ds = rd.from_arrow(t).repartition(7)
    got = (
        grouped_topn(ds, "grp", "val", "id", n=5)
        .to_pandas()
        .sort_values(["grp", "rank"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df = df.sort_values(["val", "id"], ascending=[False, True])
    want = (
        df.groupby("grp", sort=True)
        .head(5)
        .assign(rank=lambda d: d.groupby("grp").cumcount() + 1)
        .sort_values(["grp", "rank"])
        .reset_index(drop=True)
    )
    assert list(got["grp"]) == list(want["grp"])
    assert list(got["id"]) == list(want["id"])
    assert list(got["rank"]) == list(want["rank"])
    assert np.allclose(got["val"], want["val"])


def test_grouped_topn_small_groups(ray_session):
    """Groups with fewer than n rows return all their rows, ranked."""
    import ray.data as rd

    from hksketch.pipelines.windows import grouped_topn

    t = pa.table(
        {
            "grp": pa.array([1, 1, 2], type=pa.int64()),
            "id": pa.array([10, 11, 12], type=pa.int64()),
            "val": pa.array([5.0, 7.0, 1.0]),
        }
    )
    got = (
        grouped_topn(rd.from_arrow(t), "grp", "val", "id", n=5)
        .to_pandas()
        .sort_values(["grp", "rank"])
    )
    assert list(got["id"]) == [11, 10, 12]
    assert list(got["rank"]) == [1, 2, 1]


def test_keyed_daily_running_matches_pandas(ray_session):
    import ray.data as rd

    from hksketch.pipelines.windows import keyed_daily_running

    t = _rand_events(neg=True)  # negative amounts exercise the sign-safe rebase
    ds = rd.from_arrow(t).repartition(9)
    got = (
        keyed_daily_running(ds, "user_id", "ts", "amount", shards=8)
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["day"] = (df["ts"].astype("int64") // _US_PER_DAY) * _US_PER_DAY
    daily = (
        df.groupby(["user_id", "day"], as_index=False)["amount"]
        .sum()
        .sort_values(["user_id", "day"])
    )
    daily["cum_amount"] = daily.groupby("user_id")["amount"].cumsum()
    daily["day"] = pd.to_datetime(daily["day"], unit="us")
    want = daily.reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["day"].values == want["day"].values).all()
    assert (got["amount"].values == want["amount"].values).all()
    assert (got["cum_amount"].values == want["cum_amount"].values).all()


def test_trailing_daily_sum_with_gap_days(ray_session):
    import ray.data as rd

    from hksketch.pipelines.windows import trailing_daily_sum

    # days 0,1,2,9,10 — day 9's window [3..9] must NOT include days 0-2
    days = np.array([0, 0, 1, 2, 9, 10, 10], dtype=np.int64)
    amt = np.array([5, 7, 11, 13, 17, 19, 23], dtype=np.int64)
    t = pa.table(
        {
            "ts": pa.array(days * _US_PER_DAY + 1234).cast(pa.timestamp("us")),
            "amount": pa.array(amt),
        }
    )
    got = (
        trailing_daily_sum(rd.from_arrow(t).repartition(3), "ts", "amount", window=7)
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    want_daily = {0: 12, 1: 11, 2: 13, 9: 17, 10: 42}
    want_trail = {0: 12, 1: 23, 2: 36, 9: 17, 10: 59}
    got_days = (got["day"].astype("int64") // _US_PER_DAY).tolist()
    assert got_days == sorted(want_daily)
    assert got["amount"].tolist() == [want_daily[d] for d in got_days]
    assert got["trailing_amount"].tolist() == [want_trail[d] for d in got_days]


def test_pivot_counts_matches_crosstab(ray_session):
    import ray.data as rd

    from hksketch.pipelines.ops import pivot_counts

    rng = np.random.default_rng(11)
    n = 2000
    vals = ["a", "b", "c"]
    t = pa.table(
        {
            "row": pa.array(rng.integers(0, 12, n).astype(np.int64)),
            "col": pa.array(
                [vals[i] for i in rng.integers(0, 3, n)], type=pa.string()
            ),
        }
    )
    # include a pivot value absent from the data → all-zero column
    got = (
        pivot_counts(rd.from_arrow(t).repartition(5), "row", "col",
                     values=["a", "b", "c", "zzz"])
        .to_pandas()
        .sort_values("row")
        .reset_index(drop=True)
    )
    want = pd.crosstab(
        t.to_pandas()["row"], t.to_pandas()["col"]
    ).sort_index()
    for v in vals:
        assert got[f"n_{v}"].tolist() == want[v].tolist()
    assert (got["n_zzz"] == 0).all()


def test_rollup2_sums_matches_manual(ray_session):
    import ray.data as rd

    from hksketch.pipelines.ops import rollup2_sums

    rng = np.random.default_rng(13)
    n = 1500
    a = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    b = np.array(["p", "q"])[rng.integers(0, 2, n)]
    amt = rng.integers(0, 100, n).astype(np.int64)
    t = pa.table(
        {"a": pa.array(a, type=pa.string()),
         "b": pa.array(b, type=pa.string()),
         "amount": pa.array(amt)}
    )
    out = rollup2_sums(
        rd.from_arrow(t).repartition(4), "a", "b", "amount"
    ).to_pandas()
    df = t.to_pandas()
    # finest
    fine = df.groupby(["a", "b"])["amount"].agg(["sum", "size"])
    for (av, bv), row in fine.iterrows():
        m = out[(out["a"] == av) & (out["b"] == bv)]
        assert len(m) == 1
        assert m["amount"].iloc[0] == row["sum"]
        assert m["n_rows"].iloc[0] == row["size"]
    # per-a subtotals (b null)
    for av, row in df.groupby("a")["amount"].agg(["sum", "size"]).iterrows():
        m = out[(out["a"] == av) & (out["b"].isna())]
        assert len(m) == 1
        assert m["amount"].iloc[0] == row["sum"]
    # grand total
    g = out[out["a"].isna() & out["b"].isna()]
    assert len(g) == 1
    assert g["amount"].iloc[0] == amt.sum()
    assert g["n_rows"].iloc[0] == n
    assert len(out) == len(fine) + df["a"].nunique() + 1


def test_windows_empty_inputs(ray_session):
    """Empty streams produce typed empty results, not crashes."""
    import ray.data as rd

    from hksketch.pipelines.ops import pivot_counts, rollup2_sums
    from hksketch.pipelines.windows import (
        grouped_topn,
        keyed_daily_running,
        trailing_daily_sum,
    )

    et = pa.table(
        {
            "user_id": pa.array([], type=pa.int64()),
            "ts": pa.array([], type=pa.timestamp("us")),
            "amount": pa.array([], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(et)
    assert keyed_daily_running(ds, "user_id", "ts", "amount", shards=4).count() == 0
    assert trailing_daily_sum(ds, "ts", "amount").count() == 0
    gt = pa.table(
        {"grp": pa.array([], type=pa.int64()),
         "id": pa.array([], type=pa.int64()),
         "val": pa.array([], type=pa.float64())}
    )
    assert grouped_topn(rd.from_arrow(gt), "grp", "val", "id", n=3).count() == 0
    pt = pa.table(
        {"row": pa.array([], type=pa.int64()),
         "col": pa.array([], type=pa.string())}
    )
    assert pivot_counts(rd.from_arrow(pt), "row", "col", ["a"]).count() == 0
    rt = pa.table(
        {"a": pa.array([], type=pa.string()),
         "b": pa.array([], type=pa.string()),
         "amount": pa.array([], type=pa.int64())}
    )
    r = rollup2_sums(rd.from_arrow(rt), "a", "b", "amount")
    assert r.num_rows == 1  # the grand-total row of the empty stream
    assert r.column("n_rows")[0].as_py() == 0


def test_pack_token_budget_recompute_and_invariants(ray_session):
    """Packing is a pure function of (ids, token counts, shards):
    independent numpy recompute matches, offsets respect the budget, and
    each shard's stream is contiguous (start_{i+1} = start_i + tok_i)."""
    import ray.data as rd

    from hksketch.hashing import splitmix64
    from hksketch.pipelines.packing import _PACK_STRIDE, pack_token_budget

    rng = np.random.default_rng(23)
    n, budget, shards = 3000, 1000, 8
    ids = rng.permutation(n).astype(np.int64)
    tok = rng.integers(0, 600, n).astype(np.int64)
    tok[::97] = 0          # zero-token docs
    tok[::101] = 2500      # docs longer than the budget (span packs)
    t = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(tok)})
    got = (
        pack_token_budget(rd.from_arrow(t).repartition(6), "doc_id",
                          "n_tokens", budget=budget, shards=shards)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # independent recompute
    shard = (splitmix64(ids.astype(np.uint64)) & np.uint64(shards - 1)).astype(int)
    want = {}
    for s in range(shards):
        m = shard == s
        sid, stok = ids[m], tok[m]
        o = np.argsort(sid)
        sid, stok = sid[o], stok[o]
        start = np.concatenate(([0], np.cumsum(stok)[:-1]))
        for i, d in enumerate(sid):
            pl_ = start[i] // budget
            last = (start[i] + stok[i] - 1) // budget if stok[i] else pl_
            want[int(d)] = (
                s * _PACK_STRIDE + pl_, start[i] - pl_ * budget, last - pl_ + 1
            )
    assert len(got) == n
    for _, r in got.iterrows():
        wp, wo, wn = want[int(r["doc_id"])]
        assert (r["pack_id"], r["pack_offset"], r["n_packs"]) == (wp, wo, wn)
    assert (got["pack_offset"] < budget).all() and (got["pack_offset"] >= 0).all()
    # determinism across block structures
    got2 = (
        pack_token_budget(rd.from_arrow(t).repartition(2), "doc_id",
                          "n_tokens", budget=budget, shards=shards)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["pack_id"].values == got2["pack_id"].values).all()
    assert (got["pack_offset"].values == got2["pack_offset"].values).all()


def test_pack_token_budget_validation(ray_session):
    import ray.data as rd

    from hksketch.pipelines.packing import pack_token_budget

    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "n_tokens": pa.array([5], type=pa.int64())})
    with pytest.raises(ValueError):
        pack_token_budget(rd.from_arrow(t), "doc_id", "n_tokens", budget=0)
    bad = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                    "n_tokens": pa.array([-2], type=pa.int64())})
    with pytest.raises(Exception):
        pack_token_budget(
            rd.from_arrow(bad), "doc_id", "n_tokens", budget=10, shards=2
        ).to_pandas()


def test_json_int_field():
    from hksketch.text.analysis import json_int_field

    col = pa.array(
        ['{"k": 42}', '{"k": -7, "j": 1}', '{"j": 3}', None,
         '{"k": "notint"}', '{ "k" : 0 }'],
        type=pa.string(),
    )
    got = json_int_field(col, "k").to_pylist()
    assert got == [42, -7, None, None, None, 0]


def test_assign_split_determinism_and_fractions(ray_session):
    """Split assignment is a pure function of (id, seed): identical across
    partitionings, splits are disjoint+exhaustive, fractions near target,
    and growing a split keeps the smaller splits' members (monotone
    thresholds)."""
    import ray.data as rd

    from hksketch.pipelines.splits import assign_split

    n = 20000
    t = pa.table({"id": pa.array(np.arange(n, dtype=np.int64))})

    def counts(fr, parts, seed=7):
        out = (
            assign_split(rd.from_arrow(t).repartition(parts), "id", fr, seed=seed)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        return out

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = counts(fr, 3)
    b = counts(fr, 11)
    assert (a["split"].values == b["split"].values).all()  # partition-invariant
    vc = a["split"].value_counts()
    assert abs(vc["train"] / n - 0.8) < 0.02
    assert abs(vc["val"] / n - 0.1) < 0.01
    assert abs(vc["test"] / n - 0.01 * 10) < 0.01
    # different seed → different assignment (overwhelmingly)
    c = counts(fr, 3, seed=8)
    assert (a["split"].values != c["split"].values).any()
    # monotone thresholds: growing train keeps every old train member
    d = counts({"train": 0.9, "val": 0.05, "test": 0.05}, 3)
    was_train = a["split"].values == "train"
    assert (d["split"].values[was_train] == "train").all()


def test_assign_split_validation():
    from hksketch.pipelines.splits import split_thresholds

    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})  # doesn't sum to 1
    with pytest.raises(ValueError):
        split_thresholds({"a": 1.5, "b": -0.5})


def test_split_thresholds_integer_math():
    """Regression: the final threshold is 2^64-1, computed in INTEGER math
    (float(2^64)-1 rounds back to 2^64, whose uint64 cast is undefined and
    yielded 0 on x86 — an unsorted array misassigning every record in 2-
    and 5-way splits; 3/4-way shapes masked the bug)."""
    from hksketch.pipelines.splits import split_thresholds

    for fr in (
        {"train": 0.8, "test": 0.2},
        {"a": 0.2, "b": 0.2, "c": 0.2, "d": 0.2, "e": 0.2},
        {"x": 0.5, "y": 0.5},
    ):
        names, thr = split_thresholds(fr)
        as_int = thr.astype(object)
        assert as_int[-1] == 2**64 - 1
        assert all(as_int[i] < as_int[i + 1] for i in range(len(as_int) - 1))
        # spot-check assignment: u = frac*2^64 lands in the right bucket
        cum = 0.0
        for want, f in fr.items():
            u = np.uint64(min(int((cum + f / 2) * 2**64), 2**64 - 1))
            idx = min(int(np.searchsorted(thr, u, side="right")), len(names) - 1)
            assert names[idx] == want, (fr, want, names[idx])
            cum += f


def test_frequent_directions_null_row_weight_alignment():
    """Regression: null vector rows must drop their weights too, and a
    weight-length mismatch raises instead of silently truncating."""
    from hksketch.sketch.base import BuilderError
    from hksketch.sketch.fd import FrequentDirections

    col = pa.array([[1.0, 0.0], None, [0.0, 1.0]], type=pa.list_(pa.float64()))
    fd = FrequentDirections(4)
    fd.add_batch(col, weights=[1.0, 5.0, 9.0])
    assert abs(fd.frob_sq - 10.0) < 1e-12  # 1*1 + 9*1, NOT 1 + 5
    with pytest.raises(BuilderError):
        FrequentDirections(4).add_batch(col, weights=[1.0, 2.0])


def test_global_sketch_empty_stream_yields_empty_sketch(ray_session):
    """Regression: a dataset whose every batch is filtered away returns the
    sketch of the EMPTY stream (deserializable), not b'' or None — on BOTH
    merge paths."""
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import global_sketch
    from hksketch.sketch.base import sketch_from_bytes

    t = pa.table({"k": pa.array([], type=pa.string())})
    cfg = sketch_config("bucketed", k=4, width=64, depth=2, decay=0.9, seed=1)
    for via in ("driver", "aggregate"):
        blob = global_sketch(rd.from_arrow(t), cfg, "k", merge_via=via)
        sk = sketch_from_bytes(blob)
        assert sk.list() == []


def test_skyline2_matches_bruteforce(ray_session):
    """Distributed 2-D skyline == O(n^2) dominance check, with ties on
    both axes and duplicate points (all copies of an undominated point
    survive)."""
    import ray.data as rd

    from hksketch.pipelines.windows import skyline2

    rng = np.random.default_rng(41)
    n = 1200
    x = rng.integers(0, 40, n).astype(np.float64)  # coarse → many ties
    y = rng.integers(0, 40, n).astype(np.int64)
    # inject exact duplicates at an extreme point
    x[0] = x[1] = 100.0
    y[0] = y[1] = 1
    t = pa.table(
        {"id": pa.array(np.arange(n, dtype=np.int64)),
         "x": pa.array(x), "y": pa.array(y)}
    )
    got = (
        skyline2(rd.from_arrow(t).repartition(6), "x", "y", "id")
        .to_pandas()
        .sort_values("id")
    )
    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dominated[i] = bool(
            np.any((x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i])))
        )
    want = set(np.flatnonzero(~dominated).tolist())
    assert set(got["id"].tolist()) == want
    assert {0, 1} <= want  # both duplicate extremes survive


def test_skyline2_empty(ray_session):
    import ray.data as rd

    from hksketch.pipelines.windows import skyline2

    t = pa.table(
        {"id": pa.array([], type=pa.int64()),
         "x": pa.array([], type=pa.float64()),
         "y": pa.array([], type=pa.int64())}
    )
    assert skyline2(rd.from_arrow(t), "x", "y", "id").count() == 0


def test_cap_per_group_matches_bruteforce(ray_session):
    """cap_per_group == SQL QUALIFY row_number() <= n semantics: smallest
    (rank, id) per group survive; partition-invariant; monotone in n
    (raising the cap keeps every previously-kept row); per-batch combiner
    emits ≤ n rows per (batch, group)."""
    import ray.data as rd

    from hksketch.pipelines.caps import cap_per_group, lcg_rank

    rng = np.random.default_rng(5)
    n_rows = 5000
    ids = rng.permutation(n_rows).astype(np.int64)
    groups = np.array([f"g{int(v)}" for v in rng.integers(0, 7, n_rows)])
    t = pa.table({"grp": pa.array(groups), "id": pa.array(ids)})

    def brute(n):
        r = lcg_rank(ids)
        kept = []
        for g in np.unique(groups):
            m = groups == g
            order = np.lexsort((ids[m], r[m]))
            kept += list(zip([g] * min(n, m.sum()), ids[m][order][:n]))
        return set(kept)

    def run(n, parts):
        out = (
            cap_per_group(rd.from_arrow(t).repartition(parts), "grp", "id", n)
            .to_pandas()
        )
        return set(zip(out["grp"], out["id"]))

    got8 = run(8, 5)
    assert got8 == brute(8)
    assert run(8, 13) == got8  # partition-invariant
    got20 = run(20, 5)
    assert got20 == brute(20)
    assert got8 <= got20  # monotone in n

    # the combiner bound: a single batch never emits more than n per group
    from hksketch.pipelines.caps import _prune_topn

    keep = _prune_topn(groups, ids, lcg_rank(ids), 8)
    kept_groups = groups[keep]
    _, counts = np.unique(kept_groups, return_counts=True)
    assert (counts <= 8).all()

    with pytest.raises(ValueError):
        cap_per_group(rd.from_arrow(t), "grp", "id", 0)
