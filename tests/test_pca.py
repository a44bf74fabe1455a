"""Distributed PCA: exact-integer moment equality vs local recompute,
bit-determinism across block layouts, projection contract, guards."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_table(n=1500, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(0, 1, (dim, dim))
    cov = A @ np.diag(np.linspace(5, 0.1, dim)) @ A.T / dim
    m = rng.multivariate_normal(np.ones(dim), cov, size=n).astype(np.float32)
    return pa.table(
        {"vec_id": pa.array(range(n), type=pa.int64()),
         "embedding": pa.array(
             [list(map(float, r)) for r in m], type=pa.list_(pa.float32())
         )}
    ), m


def test_pca_matches_local_recompute(ray_session):
    import ray.data as rd

    from hksketch.sim.pca import _PCA_SCALE, pca_fit

    t, m = _emb_table()
    n, dim = m.shape
    model = pca_fit(rd.from_arrow(t).repartition(5), k=4)
    # local truth on the SAME fixed-point quantization
    mi = np.rint(m.astype(np.float64) * _PCA_SCALE).astype(np.int64)
    mean = mi.sum(0) / (n * _PCA_SCALE)
    cov = (
        (mi.T.astype(np.float64) @ mi) / (n * _PCA_SCALE ** 2)
        - np.outer(mean, mean)
    )
    evals = np.maximum(np.sort(np.linalg.eigvalsh(cov))[::-1], 0)
    assert np.allclose(model["eigvals"], evals, rtol=1e-9)
    assert np.allclose(model["mean"], mean, rtol=1e-12)
    assert model["n"] == n
    assert model["components"].shape == (4, dim)
    assert abs(float(model["explained_ratio"].sum()) - 1.0) < 1e-12
    # eigvals descending
    assert (np.diff(model["eigvals"]) <= 1e-12).all()


def test_pca_bit_deterministic_across_layouts(ray_session):
    import ray.data as rd

    from hksketch.sim.pca import pca_fit

    t, _ = _emb_table(n=800, seed=1)
    a = pca_fit(rd.from_arrow(t).repartition(1), k=3)
    b = pca_fit(rd.from_arrow(t).repartition(7), k=3)
    assert (a["mean"] == b["mean"]).all()
    assert (a["eigvals"] == b["eigvals"]).all()
    assert (a["components"] == b["components"]).all()


def test_pca_project_contract(ray_session):
    import ray.data as rd

    from hksketch.sim.pca import pca_fit, pca_project

    t, m = _emb_table(n=600, seed=2)
    ds = rd.from_arrow(t).repartition(3)
    model = pca_fit(ds, k=5)
    out = (
        pca_project(ds, model, keep_cols=["vec_id"])
        .to_pandas().sort_values("vec_id")
    )
    p = np.array(out["pca"].tolist())
    assert p.shape == (600, 5)
    want = (m.astype(np.float64) - model["mean"]) @ model["components"].T
    assert np.allclose(p, want, atol=1e-9)
    # components are orthonormal; projected variance per axis == eigval
    C = model["components"]
    assert np.allclose(C @ C.T, np.eye(5), atol=1e-10)
    var = p.var(axis=0)
    assert np.allclose(var, model["eigvals"][:5], rtol=1e-6)


def test_pca_guards(ray_session):
    import ray.data as rd

    from hksketch.sim.pca import pca_fit

    t, _ = _emb_table(n=10, dim=8, seed=3)
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError):
        pca_fit(ds, k=0)
    with pytest.raises(ValueError):
        pca_fit(ds, k=9)  # > dim
    with pytest.raises(ValueError):
        pca_fit(rd.from_arrow(t.slice(0, 1)), k=2)  # n < 2
