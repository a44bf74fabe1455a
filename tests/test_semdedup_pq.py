"""SemDeDup (sim/semdedup.py) and product-quantization ANN (sim/pq.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rand_unit(rng, n, dim=16):
    m = rng.normal(size=(n, dim))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _emb_table(ids, vecs):
    return pa.table(
        {"vec_id": pa.array(ids, type=pa.int64()),
         "embedding": pa.array([v.tolist() for v in vecs],
                               type=pa.list_(pa.float32()))}
    )


# ---------- SemDeDup ----------


def test_semdedup_flags_injected_duplicates(ray_session):
    """Exact copies of earlier vectors (higher ids) are flagged; the
    lowest id of each ball is kept; everything else survives."""
    import ray.data as rd

    from hksketch.sim.semdedup import semdedup_flags

    rng = np.random.default_rng(3)
    base = _rand_unit(rng, 40)
    ids = list(range(40))
    # ids 100..102 duplicate vectors 5, 17, 23
    dup_src = [5, 17, 23]
    vecs = np.concatenate([base, base[dup_src]])
    ids = ids + [100, 101, 102]
    ds = rd.from_arrow(_emb_table(ids, vecs))
    flags = semdedup_flags(ds, n_clusters=4, threshold=0.95, seed=1).to_pandas()
    assert sorted(flags["vec_id"]) == sorted(ids)  # completeness
    dup_ids = set(flags[flags["is_dup"]]["vec_id"])
    assert dup_ids == {100, 101, 102}
    # the kept representative (lower id) is NOT flagged
    for src in dup_src:
        assert not flags[flags["vec_id"] == src]["is_dup"].iloc[0]
    # exact copies score cos ≈ 1.0 against their source
    assert (
        flags[flags["vec_id"].isin([100, 101, 102])]["max_prior_cos"] > 0.999
    ).all()


def test_semdedup_no_dupes_and_determinism(ray_session):
    import ray.data as rd

    from hksketch.sim.semdedup import semdedup_flags

    rng = np.random.default_rng(9)
    vecs = _rand_unit(rng, 60)
    ds = rd.from_arrow(_emb_table(range(60), vecs))
    a = semdedup_flags(ds, n_clusters=4, threshold=0.95, seed=1).to_pandas()
    b = semdedup_flags(ds, n_clusters=4, threshold=0.95, seed=1).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert not a["is_dup"].any()  # random 16-dim unit vectors: no 0.95 pairs
    assert a.equals(b)


def test_semdedup_strict_threshold_and_validation(ray_session):
    """threshold is strict `>`: at threshold=1.0 even exact copies
    (cos == 1.0) survive; invalid thresholds raise."""
    import ray.data as rd

    from hksketch.sim.semdedup import semdedup_flags

    v = np.array([[1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
    ds = rd.from_arrow(_emb_table([1, 2], v))
    flags = semdedup_flags(ds, n_clusters=1, threshold=1.0, seed=1).to_pandas()
    assert not flags["is_dup"].any()
    with pytest.raises(ValueError):
        semdedup_flags(ds, n_clusters=1, threshold=0.0)
    with pytest.raises(ValueError):
        semdedup_flags(ds, n_clusters=1, threshold=1.5)


def test_semdedup_cluster_size_guard(ray_session):
    import ray
    import ray.data as rd

    from hksketch.sim.semdedup import semdedup_flags

    rng = np.random.default_rng(1)
    vecs = _rand_unit(rng, 30)
    ds = rd.from_arrow(_emb_table(range(30), vecs))
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        semdedup_flags(
            ds, n_clusters=1, threshold=0.9, max_cluster_rows=10
        ).to_pandas()


def test_semdedup_summary_counts(ray_session):
    import ray.data as rd

    from hksketch.sim.semdedup import semdedup_flags, semdedup_summary

    rng = np.random.default_rng(3)
    base = _rand_unit(rng, 20)
    vecs = np.concatenate([base, base[:2]])
    ids = list(range(20)) + [50, 51]
    ds = rd.from_arrow(_emb_table(ids, vecs))
    flags = semdedup_flags(ds, n_clusters=2, threshold=0.95, seed=1)
    summ = semdedup_summary(flags).to_pandas()
    assert summ["n_rows"].sum() == 22
    assert summ["n_dups"].sum() == 2
    assert (summ["cluster"].values == np.sort(summ["cluster"].values)).all()


# ---------- Product quantization ----------


def test_pq_dim_validation(ray_session):
    import ray.data as rd

    from hksketch.sim.pq import pq_train

    rng = np.random.default_rng(0)
    ds = rd.from_arrow(_emb_table(range(20), _rand_unit(rng, 20, dim=10)))
    with pytest.raises(ValueError):
        pq_train(ds, m=4, ksub=4)


def test_pq_encode_shape_and_determinism(ray_session):
    import ray.data as rd

    from hksketch.sim.pq import pq_encode, pq_train

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train(ds, m=16, ksub=16)
    assert books.shape == (16, 16, 4)
    a = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    b = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    assert len(a) == 500
    assert all(len(c) == 16 for c in a["code"])
    assert all(0 <= v < 16 for c in a["code"] for v in c)
    assert [list(x) for x in a["code"]] == [list(x) for x in b["code"]]


def test_pq_rerank_recall_and_exact_scores(ray_session):
    """Shortlist+rerank recall ≥ 0.8 of the true top-10, and every
    reported score equals the exact cosine (rerank is exact over the
    shortlist)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_
    import ray.data as rd

    from hksketch.sim.knn import knn_bruteforce_multi
    from hksketch.sim.pq import pq_encode, pq_search_rerank, pq_train

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    t = pq_.read_table(f"{SF_DIR}/embeddings.parquet")
    qrows = t.filter(pc.less(t.column("vec_id"), 3))
    Q = np.stack([np.asarray(v.as_py()) for v in qrows.column("embedding")])
    qids = qrows.column("vec_id").to_pylist()
    books = pq_train(ds, m=16, ksub=16)
    codes = pq_encode(ds, books)
    got = pq_search_rerank(ds, codes, books, Q, qids, k=10, shortlist_mult=4)
    exact = knn_bruteforce_multi(ds, Q, qids, k=10)
    recalls = []
    for q in qids:
        g = set(
            got.filter(pc.equal(got.column("query_id"), q))
            .column("vec_id").to_pylist()
        )
        w = set(
            exact.filter(pc.equal(exact.column("query_id"), q))
            .column("vec_id").to_pylist()
        )
        recalls.append(len(g & w) / 10)
    assert np.mean(recalls) >= 0.8, recalls
    # rerank scores are exact cosine: check against the brute-force table
    ex = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in exact.to_pylist()
    }
    for r in got.to_pylist():
        key = (r["query_id"], r["vec_id"])
        if key in ex:
            assert abs(r["score"] - ex[key]) < 1e-9


def test_pq_adc_orders_close_pairs_correctly(ray_session):
    """ADC must rank an exact duplicate of the query above an orthogonal
    vector — the quantization error bound in its crudest observable
    form."""
    import ray.data as rd

    from hksketch.sim.pq import pq_encode, pq_search_adc, pq_train

    rng = np.random.default_rng(5)
    base = _rand_unit(rng, 64, dim=16)
    q = base[0]
    ortho = np.zeros(16)
    ortho[0], q0 = 1.0, q / np.linalg.norm(q)
    ortho -= ortho @ q0 * q0
    ortho /= np.linalg.norm(ortho)
    vecs = np.concatenate([base, [q], [ortho]])
    ids = list(range(64)) + [900, 901]
    ds = rd.from_arrow(_emb_table(ids, vecs))
    books = pq_train(ds, m=4, ksub=16)
    codes = pq_encode(ds, books)
    res = pq_search_adc(codes, books, np.array([q]), [0], k=len(ids))
    scores = {r["vec_id"]: r["adc_score"] for r in res.to_pylist()}
    assert scores[900] > scores[901]
