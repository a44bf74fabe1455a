"""ray_glue.joins.asof_join — the general two-dataset point-in-time join.

Every directional/tolerance/how combination is pinned against an
independent engine (DuckDB ASOF JOIN or pandas merge_asof) on randomized
inputs, plus the null/tie/type contracts the docstring promises.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from hksketch.ray_glue.joins import asof_join


def _rand_sides(seed: int, n_l: int = 4000, n_r: int = 1600, keys: int = 40):
    rng = np.random.default_rng(seed)
    lt = pa.table(
        {"k": pa.array(rng.integers(0, keys, n_l)),
         "t": pa.array(rng.integers(0, 80_000, n_l)),
         "lv": pa.array(rng.random(n_l))}
    )
    rt = pa.table(
        {"k": pa.array(rng.integers(0, keys, n_r)),
         "t": pa.array(rng.integers(0, 80_000, n_r)),
         "rv": pa.array(rng.random(n_r)),
         "rid": pa.array(np.arange(n_r))}
    )
    return lt, rt


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["k", "t", "lv", "t_r", "rv", "rid"]].copy()
    df["rid"] = df["rid"].astype("float64")
    return df.sort_values(["k", "t", "lv"]).reset_index(drop=True)


@pytest.mark.parametrize("exchange", ["wide", "refs"])
def test_backward_left_matches_duckdb(ray_session, exchange):
    import ray

    lt, rt = _rand_sides(7)
    out = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="k", t_on="t", right_tiebreak="rid", shards=8,
        exchange=exchange,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    # backward tie rule: MAX tiebreak wins among equal-t right rows
    exp = con.sql(
        """
        SELECT l.k, l.t, l.lv, r.t AS t_r, r.rv, r.rid
        FROM l ASOF LEFT JOIN (
          SELECT * FROM (
            SELECT *, row_number() OVER
              (PARTITION BY k, t ORDER BY rid DESC) rn FROM r
          ) WHERE rn = 1
        ) r ON l.k = r.k AND l.t >= r.t
        """
    ).df()
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


@pytest.mark.parametrize("exchange", ["wide", "refs"])
def test_forward_tolerance_inner_matches_duckdb(ray_session, exchange):
    import ray

    lt, rt = _rand_sides(11)
    out = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="k", t_on="t", direction="forward", tolerance=500,
        how="inner", right_tiebreak="rid", shards=8, exchange=exchange,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    # forward tie rule: MIN tiebreak wins
    exp = con.sql(
        """
        SELECT l.k, l.t, l.lv, r.t AS t_r, r.rv, r.rid
        FROM l ASOF JOIN (
          SELECT * FROM (
            SELECT *, row_number() OVER
              (PARTITION BY k, t ORDER BY rid ASC) rn FROM r
          ) WHERE rn = 1
        ) r ON l.k = r.k AND r.t >= l.t AND r.t - l.t <= 500
        """
    ).df()
    assert len(out) > 0
    pd.testing.assert_frame_equal(_norm(out), _norm(exp), check_dtype=False)


@pytest.mark.parametrize("exchange", ["wide", "refs"])
def test_nearest_matches_pandas_merge_asof(ray_session, exchange):
    import ray

    rng = np.random.default_rng(3)
    n_l, n_r = 3000, 1500
    ldf = pd.DataFrame(
        {"k": rng.integers(0, 20, n_l), "t": rng.integers(0, 50_000, n_l),
         "lv": rng.random(n_l)}
    )
    rdf = pd.DataFrame(
        {"k": rng.integers(0, 20, n_r), "t": rng.integers(0, 50_000, n_r),
         "rv": rng.random(n_r)}
    ).drop_duplicates(subset=["k", "t"])  # unique (k,t) → nearest is unique
    out = asof_join(
        ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
        on="k", t_on="t", direction="nearest", shards=8,
        exchange=exchange,
    ).to_pandas()
    exp = pd.merge_asof(
        ldf.sort_values("t"), rdf.sort_values("t"),
        on="t", by="k", direction="nearest", suffixes=("", "_r"),
    )
    got = out.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    # equidistant two-sided ties can legitimately differ between engines;
    # with unique (k,t) right rows they are measure-zero on this input —
    # require exact agreement
    assert (got["rv"].fillna(-1.0) != exp["rv"].fillna(-1.0)).sum() == 0


@pytest.mark.parametrize("exchange", ["wide", "refs"])
def test_null_contract_and_inner(ray_session, exchange):
    import ray

    lt = pa.table(
        {"k": pa.array([1, None, 2, 2], type=pa.int64()),
         "t": pa.array([10, 5, None, 20], type=pa.int64()),
         "lv": pa.array([1.0, 2.0, 3.0, 4.0])}
    )
    rt = pa.table(
        {"k": pa.array([1, None, 2, 2], type=pa.int64()),
         "t": pa.array([5, 1, None, 15], type=pa.int64()),
         "rv": pa.array([10.0, 20.0, 30.0, 40.0])}
    )
    out = (
        asof_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                  on="k", t_on="t", shards=4, exchange=exchange)
        .to_pandas().set_index("lv").sort_index()
    )
    # left null key / null time rows survive unmatched under LEFT
    assert len(out) == 4
    assert pd.isna(out.loc[2.0, "rv"]) and pd.isna(out.loc[3.0, "rv"])
    # right null-key (rv=20) and null-time (rv=30) rows never match
    assert out.loc[1.0, "rv"] == 10.0
    assert out.loc[4.0, "rv"] == 40.0
    inner = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="k", t_on="t", how="inner", shards=4, exchange=exchange,
    ).to_pandas()
    assert sorted(inner["lv"]) == [1.0, 4.0]


@pytest.mark.parametrize("exchange", ["wide", "refs"])
def test_timestamp_and_string_keys_preserve_types(ray_session, exchange):
    import ray

    lt = pa.table(
        {"k": pa.array(["a", "a", "b"], type=pa.large_string()),
         "ts": pa.array(
             [pd.Timestamp("2026-01-01 00:00:01"),
              pd.Timestamp("2026-01-01 00:00:05"),
              pd.Timestamp("2026-01-02")], type=pa.timestamp("us")),
         "lv": pa.array([1, 2, 3], type=pa.int64())}
    )
    rt = pa.table(
        {"k": pa.array(["a", "b"], type=pa.large_string()),
         "ts": pa.array(
             [pd.Timestamp("2026-01-01 00:00:03"),
              pd.Timestamp("2026-01-01")], type=pa.timestamp("us")),
         "rv": pa.array([7, 8], type=pa.int64())}
    )
    ds = asof_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                   on="k", t_on="ts", shards=4, exchange=exchange)
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["ts"] == pa.timestamp("us")
    assert types["ts_r"] == pa.timestamp("us")  # clash suffixed, type kept
    assert types["k"] == pa.large_string()
    df = ds.to_pandas().set_index("lv").sort_index()
    assert pd.isna(df.loc[1, "ts_r"])  # nothing at-or-before 00:00:01
    assert df.loc[2, "rv"] == 7 and df.loc[3, "rv"] == 8


def test_validation_errors(ray_session):
    import ray

    lt = pa.table({"k": pa.array([1]), "t": pa.array([1]),
                   "s": pa.array(["x"])})
    L = ray.data.from_arrow(lt)
    R = ray.data.from_arrow(lt)
    with pytest.raises(ValueError, match="how"):
        asof_join(L, R, on="k", t_on="t", how="outer", shards=4)
    with pytest.raises(ValueError, match="direction"):
        asof_join(L, R, on="k", t_on="t", direction="up", shards=4)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(L, R, on="k", t_on="t", tolerance=0, shards=4)
    with pytest.raises(ValueError, match="exchange"):
        asof_join(L, R, on="k", t_on="t", shards=4, exchange="zip")
    with pytest.raises(TypeError, match="time columns"):
        asof_join(L, R, on="k", t_on="s", shards=4)
    with pytest.raises(KeyError, match="right_tiebreak"):
        asof_join(L, R, on="k", t_on="t", right_tiebreak="zz", shards=4)
    with pytest.raises(ValueError, match="power of two"):
        asof_join(L, R, on="k", t_on="t", shards=3)


# ---------- property: tie-heavy small domains vs a brute-force oracle ----------

from hypothesis import given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.integers(0, 3),            # key (4 keys → heavy collisions)
              st.one_of(st.none(), st.integers(0, 12))),  # time (ties + nulls)
    min_size=1, max_size=25,
)


def _brute_asof(lrows, rrows, direction, tolerance):
    """Per left row, the matched right TIME (tie-invariant even without a
    tiebreak column) — None when unmatched."""
    out = []
    for k, t in lrows:
        if t is None:
            out.append(None)
            continue
        cand = [rt for rk, rt in rrows if rk == k and rt is not None]
        if direction == "backward":
            cand = [rt for rt in cand
                    if rt <= t and (tolerance is None or t - rt <= tolerance)]
            out.append(max(cand) if cand else None)
        elif direction == "forward":
            cand = [rt for rt in cand
                    if rt >= t and (tolerance is None or rt - t <= tolerance)]
            out.append(min(cand) if cand else None)
        else:  # nearest: compare the matched DISTANCE (equidistant-tie safe)
            cand = [abs(rt - t) for rt in cand
                    if tolerance is None or abs(rt - t) <= tolerance]
            out.append(min(cand) if cand else None)
    return out


@given(lrows=_rows, rrows=_rows,
       direction=st.sampled_from(["backward", "forward", "nearest"]),
       tolerance=st.one_of(st.none(), st.integers(1, 5)))
@settings(max_examples=12, deadline=None)
def test_asof_matched_time_matches_bruteforce(
    ray_session, lrows, rrows, direction, tolerance
):
    import ray

    lt = pa.table(
        {"k": pa.array([k for k, _ in lrows], type=pa.int64()),
         "t": pa.array([t for _, t in lrows], type=pa.int64()),
         "lid": pa.array(np.arange(len(lrows)))}
    )
    rt = pa.table(
        {"k": pa.array([k for k, _ in rrows], type=pa.int64()),
         "t": pa.array([t for _, t in rrows], type=pa.int64())}
    )
    out = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="k", t_on="t", direction=direction, tolerance=tolerance, shards=4,
    ).to_pandas().sort_values("lid")
    assert len(out) == len(lrows)  # LEFT: every left row survives
    exp = _brute_asof(lrows, rrows, direction, tolerance)
    got = out["t_r"].tolist()
    for i, (g, e) in enumerate(zip(got, exp)):
        g = None if pd.isna(g) else int(g)
        if direction == "nearest" and g is not None:
            g = abs(g - lrows[i][1])
        assert g == e, (i, lrows[i], g, e)


def test_empty_output_keeps_schema(ray_session):
    import ray

    lt = pa.table(
        {"k": pa.array([1, 2], type=pa.int64()),
         "t": pa.array([10, 20], type=pa.int64()),
         "lv": pa.array([1.0, 2.0])}
    )
    rschema = pa.schema(
        [("k", pa.int64()), ("t", pa.int64()), ("rv", pa.float64())]
    )
    # inner + empty right → zero rows, but Dataset.schema() must survive
    # and downstream map_batches must still see TYPED zero-row batches
    # (Ray's to_pandas drops columns for ANY all-empty dataset — callers
    # needing a pandas-stable empty result materialize arrow themselves)
    expect = ["k", "t", "lv", "t_r", "rv"]
    out = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rschema.empty_table()),
        on="k", t_on="t", how="inner", shards=4, rschema=rschema,
    )
    assert out.count() == 0
    assert out.schema().names == expect

    def probe(b: pa.Table) -> pa.Table:
        assert b.schema.names == expect, b.schema
        return b

    assert out.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True
    ).count() == 0
    # empty LEFT too
    out2 = asof_join(
        ray.data.from_arrow(lt.schema.empty_table()),
        ray.data.from_arrow(pa.table(
            {"k": pa.array([1], type=pa.int64()),
             "t": pa.array([5], type=pa.int64()),
             "rv": pa.array([9.0])})),
        on="k", t_on="t", shards=4, lschema=lt.schema,
    )
    assert out2.count() == 0
    assert out2.schema().names == expect
