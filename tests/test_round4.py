"""Round-4 fixes (VERDICT_r3 "Next round" + ADVICE items), each tested."""

import logging
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------- ADVICE: logging filter drops only the benign messages ----------


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord("x", logging.WARNING, "f.py", 1, msg, None, None)


def test_log_filter_drops_only_benign():
    from hksketch import _DropKnownBenign

    f = _DropKnownBenign()
    assert not f.filter(
        _rec("Failed to hash the schemas (for deduplication): boom")
    )
    # benign: empty NEW schema (map_groups group-less bundle)
    assert not f.filter(
        _rec(
            "Operator produced a RefBundle with a different schema than the "
            "previous one. Previous schema: a: int64, new schema: . This may "
            "lead to unexpected behavior."
        )
    )
    # REAL divergence (two non-empty schemas) must pass through
    assert f.filter(
        _rec(
            "Operator produced a RefBundle with a different schema than the "
            "previous one. Previous schema: a: int64, new schema: b: double. "
            "This may lead to unexpected behavior."
        )
    )
    # unrelated executor warnings must pass through
    assert f.filter(_rec("spilling 2 GiB to disk"))


def test_library_import_does_not_raise_logger_levels():
    import hksketch  # noqa: F401
    import hksketch.ray_glue  # noqa: F401

    for name in (
        "ray.data._internal.arrow_ops.transform_pyarrow",
        "ray.data._internal.execution.streaming_executor_state",
    ):
        lg = logging.getLogger(name)
        # the library must not raise the logger's LEVEL (that hid real
        # warnings); it installs a message filter instead
        assert lg.level in (logging.NOTSET, logging.WARNING, logging.INFO, logging.DEBUG)
        from hksketch import _DropKnownBenign

        assert any(isinstance(x, _DropKnownBenign) for x in lg.filters)


# ---------- ADVICE: pass_hashes detects real parameters only ----------


def test_accepts_hashes_kwarg_ignores_locals():
    from hksketch.ray_glue.stages import _accepts_hashes_kwarg

    def with_param(keys, weights=None, hashes=None):
        return hashes

    def with_local(keys, weights=None):
        hashes = keys  # local named `hashes`, NOT a parameter
        return hashes

    assert _accepts_hashes_kwarg(with_param)
    assert not _accepts_hashes_kwarg(with_local)
    assert not _accepts_hashes_kwarg(len)  # builtin: no signature crash


# ---------- ADVICE: pair_shard_plan rejects/rounds non-pow2 shards ----------


def test_pair_shard_plan_non_pow2_rounds_up(ray_session):
    from hksketch.dedup.pairverify import pair_shard_plan

    cand = pa.table(
        {"a": pa.array(np.arange(100), type=pa.int64()),
         "b": pa.array(np.arange(100, 200), type=pa.int64())}
    )
    plan = pair_shard_plan(cand, shards=20)  # non-pow2 → 32
    shards = plan[3]
    assert shards == 32
    with pytest.raises(ValueError):
        pair_shard_plan(cand, shards=0)


# ---------- VERDICT #2: kmeans fold runs on workers, not the driver ----------


def test_kmeans_fit_has_no_driver_fold():
    import inspect

    from hksketch.sim import cluster

    src = inspect.getsource(cluster.kmeans_fit)
    assert "take_all" not in src  # the fit loop must never materialize rows


def test_tree_fold_partials_matches_direct_sum(ray_session):
    import ray.data as rd

    from hksketch.sim.cluster import tree_fold_partials

    rng = np.random.default_rng(3)
    k, dim = 4, 8
    tables = [
        pa.table(
            {"sums": pa.array(list(rng.standard_normal((5, k * dim))),
                              type=pa.list_(pa.float64())),
             "counts": pa.array(list(rng.integers(0, 9, (5, k)).astype(float)),
                                type=pa.list_(pa.float64()))}
        )
        for _ in range(40)  # > fanin: exercises the multi-level tree
    ]
    ds = rd.from_arrow_refs([ray_session.put(t) for t in tables])
    S, n = tree_fold_partials(ds, cols=("sums", "counts"), shapes=((k, dim), (k,)))
    exp_S = sum(
        t.column("sums").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(5, k, dim).sum(axis=0)
        for t in tables
    )
    exp_n = sum(
        t.column("counts").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(5, k).sum(axis=0)
        for t in tables
    )
    assert np.allclose(S, exp_S)
    assert np.allclose(n, exp_n)


# ---------- ADVICE: fused_partials survives empty blocks ----------


def test_bench_webpages_with_empty_parquet_file(ray_session, webpages_tiny, tmp_path):
    import pyarrow.parquet as _pq

    from hksketch.pipelines.flagship import bench_webpages

    pages = str(tmp_path / "pages")
    shutil.copytree(webpages_tiny, pages)
    # an empty file with the fixture's schema — an empty block upstream
    first = sorted(f for f in os.listdir(webpages_tiny) if f.endswith(".parquet"))[0]
    schema = _pq.read_schema(os.path.join(webpages_tiny, first))
    _pq.write_table(schema.empty_table(), os.path.join(pages, "part-empty.parquet"))
    n_expect = _pq.read_table(webpages_tiny, columns=["url"]).num_rows
    out = bench_webpages(pages, doc_stats_dir=str(tmp_path / "stats"))
    assert out["n_pages"] == n_expect
    assert out["doc_stats_rows"] == n_expect
