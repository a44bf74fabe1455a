"""Similarity search: brute-force cosine top-k baseline + IVF scale path."""

import numpy as np
import pyarrow as pa


def _vec_table(n=500, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(0, 1, (n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
        }
    ), m


def test_knn_bruteforce_matches_numpy(ray_session):
    import ray.data as rd

    from hksketch.sim.knn import knn_bruteforce

    t, m = _vec_table()
    ds = rd.from_arrow(t)
    q = m[7]
    out = knn_bruteforce(ds, q, k=10)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    scores = mn @ qn.astype(np.float64)
    expect = np.lexsort((np.arange(len(scores)), -scores))[:10]
    assert out.column("vec_id").to_pylist() == expect.tolist()
    assert out.column("vec_id").to_pylist()[0] == 7  # self-match first


def test_knn_ivf_recall(ray_session):
    import ray.data as rd

    from hksketch.sim.knn import knn_bruteforce, knn_ivf

    t, m = _vec_table(n=1000, dim=16, seed=3)
    ds = rd.from_arrow(t)
    q = m[42]
    exact = set(knn_bruteforce(ds, q, k=10).column("vec_id").to_pylist())
    approx = set(
        knn_ivf(ds, q, k=10, n_clusters=8, nprobe=4, seed=7).column("vec_id").to_pylist()
    )
    assert len(exact & approx) >= 6  # recall ≥ 0.6 with nprobe=half


def test_embedding_near_dupes_finds_planted(ray_session):
    import ray.data as rd

    from hksketch.sim.knn import embedding_near_dupes

    t, m = _vec_table(n=200, dim=16, seed=5)
    # plant a near-duplicate of vector 3 as id 200
    near = m[3] + np.random.default_rng(0).normal(0, 0.01, 16).astype(np.float32)
    t2 = pa.table(
        {
            "vec_id": pa.array(list(range(200)) + [200], type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in m] + [list(map(float, near))],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(t2)
    out = embedding_near_dupes(ds, threshold=0.99)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (3, 200) in pairs
