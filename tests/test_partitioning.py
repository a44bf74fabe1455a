"""Input-size estimation and adaptive shard counts."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from hksketch.ray_glue.partitioning import auto_shards, estimate_rows, next_pow2


def test_next_pow2():
    assert next_pow2(1) == 1
    assert next_pow2(2) == 2
    assert next_pow2(3) == 4
    assert next_pow2(1000) == 1024


def test_estimate_rows_from_footers(ray_session, tmp_path):
    import ray.data as rd

    for i, n in enumerate([100, 250, 650]):
        pq.write_table(
            pa.table({"x": pa.array(np.arange(n))}),
            str(tmp_path / f"f{i}.parquet"),
        )
    ds = rd.read_parquet(str(tmp_path))
    assert estimate_rows(ds) == 1000
    # maps over a read do NOT expose input files on this Ray version —
    # estimate_rows returns None and callers must pass rows_hint from the
    # source (the contract sessionize/minhash rely on)
    mapped = ds.map_batches(lambda b: b, batch_format="pyarrow")
    assert estimate_rows(mapped) is None
    # materialized datasets answer via count()
    assert estimate_rows(ds.materialize()) == 1000


def test_auto_shards_scales_with_rows(ray_session, tmp_path):
    import ray.data as rd

    pq.write_table(pa.table({"x": pa.array(np.arange(10))}), str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    # tiny input → the floor
    assert auto_shards(ds, target_rows_per_shard=1000) == 64
    # hint-driven scaling: 10M rows at 1M target → 16, clamped up to floor 64
    assert auto_shards(ds, target_rows_per_shard=1_000_000, rows_hint=10_000_000) == 64
    # 300M rows → 512 shards (next pow2 of 300)
    assert (
        auto_shards(ds, target_rows_per_shard=1_000_000, rows_hint=300_000_000) == 512
    )
    # cap respected
    assert (
        auto_shards(
            ds, target_rows_per_shard=1, rows_hint=10**12, max_shards=1 << 12
        )
        == 1 << 12
    )
    # unknown input → the documented floor default
    assert auto_shards(rd.from_items([{"x": 1}]).map_batches(lambda b: b)) == 64
