"""Distributed PageRank (pipelines/graph.py): bit-equality vs the
single-process recompute, structure sanity, validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(src, dst, blocks=1):
    import ray.data as rd

    t = pa.table(
        {"src": pa.array(src, type=pa.int64()),
         "dst": pa.array(dst, type=pa.int64())}
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_pagerank_star_graph_bit_equal_and_hub_wins(ray_session):
    from hksketch.pipelines.graph import pagerank, pagerank_local

    # star: hub 0 ↔ spokes 1..5 (symmetric, so no dangling nodes)
    src = [0] * 5 + [1, 2, 3, 4, 5]
    dst = [1, 2, 3, 4, 5] + [0] * 5
    got = (
        pagerank(_edges_ds(src, dst, blocks=3), iters=6, shards=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    nodes, rank = pagerank_local(np.array(src), np.array(dst), iters=6)
    assert got["node"].tolist() == nodes.tolist()
    assert got["rank_micro"].tolist() == rank.tolist()  # BIT equality
    assert got.loc[got["rank_micro"].idxmax(), "node"] == 0  # hub dominates
    # spokes are symmetric → identical ranks
    spokes = got[got["node"] > 0]["rank_micro"]
    assert spokes.nunique() == 1


def test_pagerank_partition_invariant(ray_session):
    from hksketch.pipelines.graph import pagerank

    rng = np.random.default_rng(4)
    # random symmetric graph on 30 nodes
    a = rng.integers(0, 30, 120)
    b = rng.integers(0, 30, 120)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    r1 = (
        pagerank(_edges_ds(src, dst, blocks=1), iters=5, shards=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    r2 = (
        pagerank(_edges_ds(src, dst, blocks=9), iters=5, shards=8)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert r1.equals(r2)


def test_pagerank_mass_and_validation(ray_session):
    from hksketch.pipelines.graph import SCALE, pagerank, pagerank_local

    src = [0, 1, 1, 2, 2, 0]
    dst = [1, 0, 2, 1, 0, 2]
    got = pagerank(_edges_ds(src, dst), iters=4, shards=4).to_pandas()
    # integer floor division leaks at most a few units per node per
    # iteration: total mass stays within iters × nodes × 1000 of SCALE
    assert abs(got["rank_micro"].sum() - SCALE) < 4 * 3 * 1000 + 3
    with pytest.raises(ValueError):
        pagerank(_edges_ds(src, dst), damping_permille=1500)
    with pytest.raises(ValueError):
        pagerank(_edges_ds(src, dst), iters=0)


def test_supplier_pagerank_query_matches_local_recompute(ray_session):
    """The driver query at sf0.001 equals the single-process recompute of
    the same edge list (built independently via DuckDB)."""
    import duckdb

    import __ray_entry__ as e
    from hksketch.pipelines.graph import pagerank_local

    import pandas as pd

    got = e.queries()["supplier_pagerank"]("/root/testdata/sf0.001")
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    pairs = con.sql(
        """SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
           FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet') li
           JOIN read_parquet('/root/testdata/sf0.001/orders.parquet') o
             ON li.l_orderkey = o.o_orderkey"""
    ).fetchnumpy()
    src = np.concatenate([pairs["c"], pairs["s"]]).astype(np.int64)
    dst = np.concatenate([pairs["s"], pairs["c"]]).astype(np.int64)
    nodes, rank = pagerank_local(src, dst, iters=6)
    order = np.lexsort((nodes, -rank))[:20]
    want_nodes, want_rank = nodes[order], rank[order]
    got_nodes = np.where(
        got["node_type"].to_numpy() == "customer",
        got["key"].to_numpy() * 2, got["key"].to_numpy() * 2 + 1,
    )
    assert got_nodes.tolist() == want_nodes.tolist()
    assert got["rank_micro"].tolist() == want_rank.tolist()


def test_pagerank_checkpoint_resume_bit_identical(ray_session, tmp_path):
    """Run 2 iters with a checkpoint dir, then ask for 5 from the same
    dir: the resumed run must be bit-identical to an uninterrupted
    5-iter run; param drift refuses; partial dirs without markers are
    ignored."""
    import os

    from hksketch.pipelines.graph import pagerank

    rng = np.random.default_rng(6)
    a = rng.integers(0, 25, 100)
    b = rng.integers(0, 25, 100)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    ck = str(tmp_path / "pr_ck")

    direct = (
        pagerank(_edges_ds(src, dst), iters=5, shards=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pagerank(_edges_ds(src, dst), iters=2, shards=4, checkpoint_dir=ck)
    assert os.path.exists(os.path.join(ck, "_done_2"))
    resumed = (
        pagerank(_edges_ds(src, dst), iters=5, shards=4, checkpoint_dir=ck)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert resumed.equals(direct)

    # a partial iteration dir WITHOUT its marker is ignored on resume
    os.makedirs(os.path.join(ck, "iter=9"), exist_ok=True)
    again = (
        pagerank(_edges_ds(src, dst), iters=5, shards=4, checkpoint_dir=ck)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert again.equals(direct)

    # param drift refuses instead of silently mixing runs
    with pytest.raises(ValueError, match="refusing to resume"):
        pagerank(_edges_ds(src, dst), iters=5, shards=4,
                 damping_permille=500, checkpoint_dir=ck)


def test_pagerank_asymmetric_graph_keeps_no_inflow_nodes(ray_session):
    """Every node has an out-edge but node 3 receives no inflow: it must
    keep its base-rank row (not vanish), bit-equal to the local
    recompute (review finding)."""
    from hksketch.pipelines.graph import pagerank, pagerank_local

    src = [3, 1, 2]
    dst = [1, 2, 1]
    got = (
        pagerank(_edges_ds(src, dst), iters=4, shards=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    nodes, rank = pagerank_local(np.array(src), np.array(dst), iters=4)
    assert got["node"].tolist() == nodes.tolist() == [1, 2, 3]
    assert got["rank_micro"].tolist() == rank.tolist()


def test_pagerank_checkpoint_overwrites_stale_partial_files(
    ray_session, tmp_path
):
    """A crashed attempt leaves PARQUET FILES (not just a dir) in
    iter=K without a marker: the rerun must overwrite them, not append
    (review finding — duplicated rank rows corrupt every later join)."""
    import os

    import pyarrow.parquet as pq_

    from hksketch.pipelines.graph import pagerank

    src = [0, 1, 1, 2, 2, 0]
    dst = [1, 0, 2, 1, 0, 2]
    ck = str(tmp_path / "ck")
    direct = (
        pagerank(_edges_ds(src, dst), iters=3, shards=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    # first attempt completes iteration 1 only
    pagerank(_edges_ds(src, dst), iters=1, shards=4, checkpoint_dir=ck)
    # simulate a crash mid-write of iteration 2: stale partial parquet
    it2 = os.path.join(ck, "iter=2")
    os.makedirs(it2, exist_ok=True)
    stale = pa.table(
        {"node": pa.array([0, 0, 1], type=pa.int64()),
         "rank_micro": pa.array([1, 1, 1], type=pa.int64())}
    )
    pq_.write_table(stale, os.path.join(it2, "stale-partial.parquet"))
    resumed = (
        pagerank(_edges_ds(src, dst), iters=3, shards=4, checkpoint_dir=ck)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert resumed.equals(direct)
    # iter=2 now holds exactly 3 unique node rows (no stale duplicates)
    t = pq_.read_table(it2)
    assert t.num_rows == 3 and len(set(t.column("node").to_pylist())) == 3
