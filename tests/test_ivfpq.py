"""IVF-PQ composite index (sim/ivfpq.py): recall, pruned reads,
manifest reuse, validation."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq_
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(tmp_path_factory, ray_session):
    import ray.data as rd

    from hksketch.sim.ivfpq import build_ivfpq_index

    d = str(tmp_path_factory.mktemp("ivfpq"))
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    build_ivfpq_index(ds, d, n_clusters=8, m=16, ksub=16, seed=7)
    return d


def test_ivfpq_layout_and_manifest_reuse(index, ray_session):
    import ray.data as rd

    from hksketch.sim.ivfpq import build_ivfpq_index

    man = json.load(open(os.path.join(index, "MANIFEST.json")))
    assert man["n_clusters"] == 8 and man["m"] == 16 and man["dim"] == 64
    assert os.path.exists(os.path.join(index, "centroids.parquet"))
    assert os.path.exists(os.path.join(index, "codebooks.parquet"))
    lists = [d for d in os.listdir(os.path.join(index, "codes"))
             if d.startswith("cluster=")]
    assert 1 <= len(lists) <= 8
    # codes cover every row, 16 uint8 entries each
    t = pq_.read_table(os.path.join(index, "codes"))
    assert t.num_rows == 500
    assert all(len(c) == 16 for c in t.column("code").to_pylist()[:20])
    # rebuild with identical params + data is a no-op (manifest reuse)
    mtime = os.path.getmtime(os.path.join(index, "MANIFEST.json"))
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    build_ivfpq_index(ds, index, n_clusters=8, m=16, ksub=16, seed=7)
    assert os.path.getmtime(os.path.join(index, "MANIFEST.json")) == mtime


def test_ivfpq_full_probe_recall(index, ray_session):
    """nprobe = n_clusters degenerates to full-corpus PQ + exact rerank —
    recall of the true top-10 ≥ 0.8 (matches the plain-PQ measurement)."""
    import ray.data as rd

    from hksketch.sim.ivfpq import knn_ivfpq
    from hksketch.sim.knn import knn_bruteforce

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    t = pq_.read_table(f"{SF_DIR}/embeddings.parquet")
    recalls = []
    for qid in (0, 1, 2):
        q = np.asarray(
            t.filter(pc.equal(t.column("vec_id"), qid))
            .column("embedding")[0].as_py()
        )
        got = knn_ivfpq(index, ds, q, k=10, nprobe=8, shortlist_mult=8)
        want = knn_bruteforce(ds, q, k=10)
        recalls.append(len(
            set(got.column("vec_id").to_pylist())
            & set(want.column("vec_id").to_pylist())
        ) / 10)
        # rerank scores are exact cosine for ids the oracle also returned
        ex = {r["vec_id"]: r["score"] for r in want.to_pylist()}
        for r in got.to_pylist():
            if r["vec_id"] in ex:
                assert abs(r["score"] - ex[r["vec_id"]]) < 1e-9
    assert np.mean(recalls) >= 0.8, recalls


def test_ivfpq_probe_prunes_partitions(index, ray_session):
    """nprobe=2 touches exactly 2 code partitions and still returns k
    rows drawn only from those partitions' ids."""
    import ray.data as rd

    from hksketch.sim.ivfpq import knn_ivfpq, probed_code_paths

    t = pq_.read_table(f"{SF_DIR}/embeddings.parquet")
    q = np.asarray(
        t.filter(pc.equal(t.column("vec_id"), 1)).column("embedding")[0].as_py()
    )
    paths, _ = probed_code_paths(index, q, nprobe=2)
    assert len(paths) == 2
    allowed = set()
    for p in paths:
        allowed.update(pq_.read_table(p).column("vec_id").to_pylist())
    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    got = knn_ivfpq(index, ds, q, k=10, nprobe=2)
    assert got.num_rows == 10
    assert set(got.column("vec_id").to_pylist()) <= allowed


def test_ivfpq_dim_validation(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from hksketch.sim.ivfpq import build_ivfpq_index

    rng = np.random.default_rng(0)
    t = pa.table(
        {"vec_id": pa.array(range(20), type=pa.int64()),
         "embedding": pa.array(
             [rng.normal(size=10).tolist() for _ in range(20)],
             type=pa.list_(pa.float32()))}
    )
    with pytest.raises(ValueError):
        build_ivfpq_index(rd.from_arrow(t), str(tmp_path / "x"), m=16)


def test_ivfpq_residual_beats_raw_at_tight_shortlist(ray_session, tmp_path):
    """Residual encoding (the TPAMI'11 IVFADC form) must not lose recall
    vs raw-vector PQ at the same bits, and measured here it wins at the
    tight shortlist (0.77 vs 0.67 mean on the fixture)."""
    import ray.data as rd

    from hksketch.sim.ivfpq import build_ivfpq_index, knn_ivfpq
    from hksketch.sim.knn import knn_bruteforce

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    t = pq_.read_table(f"{SF_DIR}/embeddings.parquet")

    def recall(index_dir):
        rs = []
        for qid in (0, 1, 2):
            q = np.asarray(
                t.filter(pc.equal(t.column("vec_id"), qid))
                .column("embedding")[0].as_py()
            )
            got = knn_ivfpq(index_dir, ds, q, k=10, nprobe=8,
                            shortlist_mult=4)
            want = knn_bruteforce(ds, q, k=10)
            rs.append(len(
                set(got.column("vec_id").to_pylist())
                & set(want.column("vec_id").to_pylist())
            ) / 10)
        return float(np.mean(rs))

    raw_dir = str(tmp_path / "raw")
    res_dir = str(tmp_path / "res")
    build_ivfpq_index(ds, raw_dir, n_clusters=8, m=16, ksub=16, seed=7,
                      residual=False)
    build_ivfpq_index(ds, res_dir, n_clusters=8, m=16, ksub=16, seed=7,
                      residual=True)
    assert recall(res_dir) >= recall(raw_dir)
    assert recall(res_dir) >= 0.7
