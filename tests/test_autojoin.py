"""auto_join / broadcast_join (ray_glue/joins.py): plan selection from
footer estimates, and semantic parity of both physical plans with
DuckDB (dup keys, null keys, suffixing, left join)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


LT = pa.table(
    {"k": pa.array([1, 2, 2, 3, None, 9], type=pa.int64()),
     "a": pa.array(["p", "q", "r", "s", "t", "u"]),
     "n": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64())}
)
RT = pa.table(
    {"k": pa.array([2, 2, 3, None, 7], type=pa.int64()),
     "a": pa.array(["x1", "x2", "x3", "x4", "x5"]),
     "w": pa.array([10, 20, 30, 40, 50], type=pa.int64())}
)


def _want(how: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("lt", LT)
    con.register("rt", RT)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return (
        con.sql(
            f"""SELECT lt.k, lt.a, lt.n, rt.a AS a_r, rt.w
                FROM lt {join} rt ON lt.k = rt.k"""
        )
        .df()
        .sort_values(["n", "a_r"], na_position="last")
        .reset_index(drop=True)
    )


def _got(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()[["k", "a", "n", "a_r", "w"]]
        .sort_values(["n", "a_r"], na_position="last")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_duckdb(ray_session, how):
    import ray.data as rd

    from hksketch.ray_glue.joins import broadcast_join, hash_join

    l = rd.from_arrow(LT).repartition(3)
    r = rd.from_arrow(RT)
    b = _got(broadcast_join(l, r, on="k", how=how,
                            lschema=LT.schema, rschema=RT.schema))
    h = _got(hash_join(l, r, on="k", how=how, shards=4,
                       lschema=LT.schema, rschema=RT.schema))
    w = _want(how)
    for got, label in ((b, "broadcast"), (h, "hash")):
        assert len(got) == len(w), (label, len(got), len(w))
        pd.testing.assert_frame_equal(got, w, check_dtype=False)


def test_auto_join_plan_selection(ray_session, tmp_path):
    import ray.data as rd

    from hksketch.ray_glue.joins import auto_join

    pq.write_table(RT, str(tmp_path / "right.parquet"))
    l = rd.from_arrow(LT)
    r_file = rd.read_parquet(str(tmp_path / "right.parquet"))

    # file-backed small right side → broadcast
    _, plan = auto_join(l, r_file, on="k", explain=True,
                        lschema=LT.schema, rschema=RT.schema)
    assert plan == "broadcast"
    # threshold below the estimate → sharded hash join
    _, plan = auto_join(l, r_file, on="k", explain=True, shards=4,
                        broadcast_threshold_rows=2,
                        lschema=LT.schema, rschema=RT.schema)
    assert plan == "hash"
    # unknown estimate (in-memory mapped side) → conservative hash
    r_mapped = rd.from_arrow(RT).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    _, plan = auto_join(l, r_mapped, on="k", explain=True, shards=4,
                        lschema=LT.schema, rschema=RT.schema)
    assert plan == "hash"
    # both plans produce identical rows
    b = _got(auto_join(l, r_file, on="k",
                       lschema=LT.schema, rschema=RT.schema))
    h = _got(auto_join(l, r_file, on="k", shards=4,
                       broadcast_threshold_rows=2,
                       lschema=LT.schema, rschema=RT.schema))
    pd.testing.assert_frame_equal(b, h, check_dtype=False)


def test_skew_join_matches_hash_join_on_skewed_data(ray_session):
    """One key owns half the left side: skew_join must detect it, route
    it through the broadcast plan, and produce exactly the plain
    hash_join rows."""
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join, skew_join

    rng = np.random.default_rng(2)
    hot_key = 7
    keys = np.concatenate(
        [np.full(500, hot_key), rng.integers(100, 200, 500)]
    )
    rng.shuffle(keys)
    lt = pa.table(
        {"k": pa.array(keys, type=pa.int64()),
         "n": pa.array(np.arange(len(keys)), type=pa.int64())}
    )
    rt = pa.table(
        {"k": pa.array(list(range(100, 160)) + [hot_key, hot_key],
                       type=pa.int64()),
         "w": pa.array(range(62), type=pa.int64())}
    )
    l = rd.from_arrow(lt).repartition(4)
    r = rd.from_arrow(rt)
    got, hot = skew_join(
        l, r, on="k", shards=4, hot_min_share_ppm=100_000,
        lschema=lt.schema, rschema=rt.schema, explain=True,
    )
    assert hot == [hot_key]  # the detector found exactly the hot key
    want = hash_join(l, r, on="k", shards=4,
                     lschema=lt.schema, rschema=rt.schema)
    g = got.to_pandas().sort_values(["n", "w"]).reset_index(drop=True)
    w = want.to_pandas().sort_values(["n", "w"]).reset_index(drop=True)
    assert len(g) == len(w) == 500 * 2 + sum(
        1 for k in keys if 100 <= k < 160
    )
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_skew_join_no_hot_keys_falls_through(ray_session):
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join, skew_join

    rng = np.random.default_rng(3)
    keys = rng.permutation(1000)  # all keys unique → nothing hot
    lt = pa.table(
        {"k": pa.array(keys, type=pa.int64()),
         "n": pa.array(np.arange(1000), type=pa.int64())}
    )
    rt = pa.table(
        {"k": pa.array(range(0, 1000, 7), type=pa.int64()),
         "w": pa.array(range(0, 1000, 7), type=pa.int64())}
    )
    l, r = rd.from_arrow(lt), rd.from_arrow(rt)
    got, hot = skew_join(
        l, r, on="k", shards=4, hot_min_share_ppm=100_000,
        lschema=lt.schema, rschema=rt.schema, explain=True,
    )
    assert hot == []
    want = hash_join(l, r, on="k", shards=4,
                     lschema=lt.schema, rschema=rt.schema)
    g = got.to_pandas().sort_values("n").reset_index(drop=True)
    w = want.to_pandas().sort_values("n").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_skew_join_right_hot_bound_raises(ray_session):
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.joins import skew_join

    lt = pa.table(
        {"k": pa.array(np.full(100, 1), type=pa.int64()),
         "n": pa.array(np.arange(100), type=pa.int64())}
    )
    rt = pa.table(
        {"k": pa.array(np.full(50, 1), type=pa.int64()),
         "w": pa.array(np.arange(50), type=pa.int64())}
    )
    with pytest.raises(ValueError, match="does not fit a broadcast"):
        skew_join(
            rd.from_arrow(lt), rd.from_arrow(rt), on="k", shards=4,
            hot_min_share_ppm=100_000, max_hot_right_rows=10,
            lschema=lt.schema, rschema=rt.schema,
        )


SLT = pa.table(
    {"src": pa.array(["alpha", "beta", "beta", "gamma", None, "omega"]),
     "a": pa.array(["p", "q", "r", "s", "t", "u"]),
     "n": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64())}
)
SRT = pa.table(
    {"src": pa.array(["beta", "beta", "gamma", None, "zeta"]),
     "a": pa.array(["x1", "x2", "x3", "x4", "x5"]),
     "w": pa.array([10, 20, 30, 40, 50], type=pa.int64())}
)


def _want_str(how: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("lt", SLT)
    con.register("rt", SRT)
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return (
        con.sql(
            f"""SELECT lt.src, lt.a, lt.n, rt.a AS a_r, rt.w
                FROM lt {join} rt ON lt.src = rt.src"""
        )
        .df()
        .sort_values(["n", "a_r"], na_position="last")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("plan", ["hash", "broadcast"])
def test_string_key_join_matches_duckdb(ray_session, how, plan):
    """String keys take the hk64 shard path (hash) / polars string join
    (broadcast) with identical SQL semantics: dup keys fan out, null
    keys never match, left join preserves unmatched+null-key rows."""
    import ray.data as rd

    from hksketch.ray_glue.joins import broadcast_join, hash_join

    lt = rd.from_arrow(SLT).repartition(3)
    rt = rd.from_arrow(SRT).repartition(2)
    fn = hash_join if plan == "hash" else broadcast_join
    kw = {"shards": 8} if plan == "hash" else {}
    out = fn(lt, rt, "src", how=how,
             lschema=SLT.schema, rschema=SRT.schema, **kw)
    got = (
        out.to_pandas()[["src", "a", "n", "a_r", "w"]]
        .sort_values(["n", "a_r"], na_position="last")
        .reset_index(drop=True)
    )
    want = _want_str(how)
    pd.testing.assert_frame_equal(
        got.astype({"w": "float64"}), want.astype({"w": "float64"}),
        check_dtype=False,
    )


def test_mixed_key_family_raises(ray_session):
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    lt = rd.from_arrow(SLT)
    rt = rd.from_arrow(RT)
    with pytest.raises(TypeError, match="integer or both string"):
        hash_join(lt, rt, "src", right_on="k",
                  lschema=SLT.schema, rschema=RT.schema, shards=8)


def test_skew_join_string_keys(ray_session):
    """String-keyed skew join: a hot hostname routes through the
    broadcast plan; union equals the plain string hash join."""
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join, skew_join

    rng = np.random.default_rng(0)
    hosts = ["hot.example"] * 5000 + [
        f"cold{i}.example" for i in rng.integers(0, 200, size=5000)
    ]
    lt = pa.table(
        {"host": pa.array(hosts),
         "n": pa.array(range(len(hosts)), type=pa.int64())}
    )
    rt = pa.table(
        {"host": pa.array(
            ["hot.example"] + [f"cold{i}.example" for i in range(200)]),
         "w": pa.array(range(201), type=pa.int64())}
    )
    l = rd.from_arrow(lt).repartition(4)
    r = rd.from_arrow(rt).repartition(2)
    out, hot = skew_join(
        l, r, "host", shards=16, hot_k=8, hot_min_share_ppm=100_000,
        lschema=lt.schema, rschema=rt.schema, explain=True,
    )
    assert hot == ["hot.example"]
    got = (
        out.to_pandas().sort_values(["n"]).reset_index(drop=True)
    )
    want = (
        hash_join(l, r, "host", shards=16,
                  lschema=lt.schema, rschema=rt.schema)
        .to_pandas().sort_values(["n"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["host", "n", "w"]], want[["host", "n", "w"]]
    )


@pytest.mark.parametrize("fixture", ["int", "str"])
def test_full_outer_join_matches_duckdb(ray_session, fixture):
    """FULL OUTER on the sharded plan: unmatched rows of both sides
    survive with nulls; null keys never match but survive."""
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    lt_t, rt_t, key = (LT, RT, "k") if fixture == "int" else (SLT, SRT, "src")
    con = duckdb.connect()
    con.register("lt", lt_t)
    con.register("rt", rt_t)
    want = (
        con.sql(
            f"""SELECT COALESCE(lt.{key}, rt.{key}) AS {key},
                       lt.a, lt.n, rt.a AS a_r, rt.w
                FROM lt FULL JOIN rt ON lt.{key} = rt.{key}"""
        )
        .df()
        .sort_values(["n", "w", "a_r"], na_position="last")
        .reset_index(drop=True)
    )
    out = hash_join(
        rd.from_arrow(lt_t).repartition(3),
        rd.from_arrow(rt_t).repartition(2),
        key, how="full", shards=8,
        lschema=lt_t.schema, rschema=rt_t.schema,
    )
    got = (
        out.to_pandas()[[key, "a", "n", "a_r", "w"]]
        .sort_values(["n", "w", "a_r"], na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"w": "float64", "n": "float64"}),
        want.astype({"w": "float64", "n": "float64"}),
        check_dtype=False,
    )


def test_full_outer_rejected_on_broadcast(ray_session):
    import ray.data as rd

    from hksketch.ray_glue.joins import auto_join, broadcast_join

    lt = rd.from_arrow(LT)
    rt = rd.from_arrow(RT)
    with pytest.raises(ValueError):
        broadcast_join(lt, rt, "k", how="full",
                       lschema=LT.schema, rschema=RT.schema)
    # auto_join must route full to the sharded plan even for a tiny side
    ds, plan = auto_join(lt, rt, "k", how="full", explain=True,
                         lschema=LT.schema, rschema=RT.schema, shards=8)
    assert plan == "hash"
    assert ds.count() > 0


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_refs_exchange_matches_duckdb(ray_session, how):
    """exchange='refs' (side-separated per-shard-ref plan) must be
    row-identical to the wide plan and to DuckDB — dup keys, null keys
    (left-side nulls survive a LEFT join), suffixing."""
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    l = rd.from_arrow(LT).repartition(3)
    r = rd.from_arrow(RT)
    got = _got(hash_join(l, r, on="k", how=how, shards=4,
                         lschema=LT.schema, rschema=RT.schema,
                         exchange="refs"))
    w = _want(how)
    assert len(got) == len(w)
    pd.testing.assert_frame_equal(got, w, check_dtype=False)


def test_hash_join_refs_rejects_full_and_bad_exchange(ray_session):
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    l = rd.from_arrow(LT)
    r = rd.from_arrow(RT)
    with pytest.raises(ValueError, match="full outer"):
        hash_join(l, r, on="k", how="full", shards=4, exchange="refs",
                  lschema=LT.schema, rschema=RT.schema)
    with pytest.raises(ValueError, match="exchange"):
        hash_join(l, r, on="k", shards=4, exchange="zip",
                  lschema=LT.schema, rschema=RT.schema)
