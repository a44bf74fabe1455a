"""Content-defined chunking: vectorized-vs-scalar kernel equality,
boundary bounds, insertion-shift robustness, distributed-vs-local
recompute equality."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _rand_text(rng, n):
    return "".join(chr(c) for c in rng.integers(97, 123, size=n))


def test_gear_vectorized_matches_scalar_recurrence():
    import warnings

    from hksketch.dedup.cdc import gear_hashes, gear_table

    gear = gear_table()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=3000, dtype=np.uint8)
    h = np.uint64(0)
    ref = np.empty(len(arr), dtype=np.uint64)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # intentional uint64 wraparound
        for i, b in enumerate(arr):
            h = (h << np.uint64(1)) + gear[b]
            ref[i] = h
    assert (gear_hashes(arr, gear) == ref).all()


def test_chunk_bounds_and_determinism():
    from hksketch.dedup.cdc import chunk_document, gear_table

    gear = gear_table()
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes()
    ends = chunk_document(data, gear, bits=6, min_len=32, max_len=256)
    lens = np.diff(np.concatenate(([0], ends)))
    assert ends[-1] == len(data)
    assert (lens[:-1] >= 32).all()  # only the tail may undershoot min
    assert (lens <= 256).all()
    ends2 = chunk_document(data, gear, bits=6, min_len=32, max_len=256)
    assert (ends == ends2).all()
    # empty input -> no chunks
    assert len(chunk_document(b"", gear)) == 0


def test_insertion_shift_robustness():
    """The CDC selling point: a prefix insertion shifts every byte
    offset, yet almost all chunk digests survive — fixed-offset blocks
    would share none."""
    from hksketch.dedup.cdc import chunk_digests_local, gear_table

    gear = gear_table()
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, size=6000, dtype=np.uint8).tobytes()
    a = {d for d, _ in chunk_digests_local(data, gear, 6, 32, 256)}
    b = {
        d for d, _ in chunk_digests_local(
            b"inserted prefix bytes-" + data, gear, 6, 32, 256
        )
    }
    assert len(a & b) / len(a) > 0.8


def test_cdc_dup_stats_matches_local_recompute(ray_session):
    import ray.data as rd

    from hksketch.dedup.cdc import (
        cdc_dup_stats,
        chunk_digests_local,
        gear_table,
    )

    rng = np.random.default_rng(1)
    shared = _rand_text(rng, 1500)
    texts = [
        _rand_text(rng, 800) + shared + _rand_text(rng, 300),
        shared + _rand_text(rng, 1200),
        _rand_text(rng, 2500),
        _rand_text(rng, 100),
    ]
    docs = pa.table(
        {"doc_id": pa.array(range(4), type=pa.int64()),
         "text": pa.array(texts)}
    )
    out = (
        cdc_dup_stats(
            rd.from_arrow(docs).repartition(2),
            bits=6, min_len=32, max_len=256, shards=64,
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    gear = gear_table()
    allc = {
        i: chunk_digests_local(t.encode(), gear, 6, 32, 256)
        for i, t in enumerate(texts)
    }
    cnt = Counter(d for cs in allc.values() for d, _ in cs)
    for i, cs in allc.items():
        n_dup = sum(1 for d, _ in cs if cnt[d] >= 2)
        db = sum(ln for d, ln in cs if cnt[d] >= 2)
        assert out.loc[i, "n_chunks"] == len(cs)
        assert out.loc[i, "n_dup_chunks"] == n_dup
        assert out.loc[i, "n_bytes"] == len(texts[i])
        assert out.loc[i, "dup_bytes"] == db
    # the planted 1500-byte overlap is found despite shifted offsets
    assert out.loc[0, "dup_byte_frac"] > 0.3
    assert out.loc[1, "dup_byte_frac"] > 0.3
    assert out.loc[2, "n_dup_chunks"] == 0


def test_cdc_batch_boundary_independence(ray_session):
    """Chunking hashes each document independently (per-doc warmup
    repair), so block layout cannot change any chunk digest."""
    import ray.data as rd

    from hksketch.dedup.cdc import cdc_dup_stats

    rng = np.random.default_rng(4)
    texts = [_rand_text(rng, 1200) for _ in range(6)]
    texts[3] = texts[0]  # exact dup pair
    docs = pa.table(
        {"doc_id": pa.array(range(6), type=pa.int64()),
         "text": pa.array(texts)}
    )
    kw = dict(bits=6, min_len=32, max_len=256, shards=64)
    a = (
        cdc_dup_stats(rd.from_arrow(docs).repartition(1), **kw)
        .to_pandas().set_index("doc_id").sort_index()
    )
    b = (
        cdc_dup_stats(rd.from_arrow(docs).repartition(6), **kw)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (a == b).all().all()
    assert a.loc[0, "dup_byte_frac"] == 1.0
    assert a.loc[3, "dup_byte_frac"] == 1.0


def test_cdc_invalid_config_raises(ray_session):
    import ray.data as rd

    from hksketch.dedup.cdc import cdc_dup_stats

    docs = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "text": pa.array(["abc"])}
    )
    ds = rd.from_arrow(docs)
    with pytest.raises(ValueError):
        cdc_dup_stats(ds, bits=0)
    with pytest.raises(ValueError):
        cdc_dup_stats(ds, min_len=100, max_len=50)
    with pytest.raises(ValueError):
        cdc_dup_stats(ds, shards=48)
