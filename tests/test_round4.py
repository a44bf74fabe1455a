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


# ---------- VERDICT #3: vectorized + capped LSH pair emission ----------


def _band_rows_table(band_hash, doc_id):
    n = len(doc_id)
    return pa.table(
        {"band_id": pa.array(np.zeros(n, dtype=np.int32)),
         "band_hash": pa.array(np.asarray(band_hash, dtype=np.uint64),
                               type=pa.uint64()),
         "doc_id": pa.array(np.asarray(doc_id, dtype=np.int64))}
    )


def test_lsh_pairs_match_bruteforce_reference(ray_session):
    """Vectorized emission must equal the per-bucket double loop."""
    import itertools

    import ray.data as rd

    from hksketch.dedup.minhash import lsh_candidate_pairs

    rng = np.random.default_rng(11)
    bh = rng.integers(0, 30, 500).astype(np.uint64)  # many multi-doc buckets
    ids = rng.integers(0, 120, 500).astype(np.int64)
    got = lsh_candidate_pairs(
        rd.from_arrow(_band_rows_table(bh, ids)), shards=16, rows_hint=500
    )
    # reference: per bucket, unique ids, all unordered pairs
    exp = set()
    for h in np.unique(bh):
        members = np.unique(ids[bh == h])
        exp |= set(itertools.combinations(members.tolist(), 2))
    have = set(zip(got.column("a").to_pylist(), got.column("b").to_pylist()))
    assert have == exp
    assert got.schema.metadata[b"lsh_dropped_pairs"] == b"0"


def test_lsh_degenerate_bucket_capped_and_logged(ray_session):
    """10^4 identical band rows: bounded time/memory, logged drop count,
    small buckets in the same input still pair."""
    import ray.data as rd

    from hksketch.dedup.minhash import lsh_candidate_pairs

    n = 10_000
    bh = np.full(n, 7, dtype=np.uint64)
    ids = np.arange(n, dtype=np.int64)
    # plus one small, legitimate bucket
    bh = np.concatenate([bh, np.full(3, 9, dtype=np.uint64)])
    ids = np.concatenate([ids, np.array([20_001, 20_002, 20_003])])
    got = lsh_candidate_pairs(
        rd.from_arrow(_band_rows_table(bh, ids)), shards=16,
        rows_hint=len(ids), max_bucket_size=1024,
    )
    have = set(zip(got.column("a").to_pylist(), got.column("b").to_pylist()))
    assert have == {(20_001, 20_002), (20_001, 20_003), (20_002, 20_003)}
    assert got.schema.metadata[b"lsh_dropped_buckets"] == b"1"
    assert int(got.schema.metadata[b"lsh_dropped_pairs"]) == n * (n - 1) // 2


def test_lsh_bucket_at_cap_still_emits(ray_session):
    import ray.data as rd

    from hksketch.dedup.minhash import lsh_candidate_pairs

    s = 64
    got = lsh_candidate_pairs(
        rd.from_arrow(
            _band_rows_table(np.full(s, 5, dtype=np.uint64), np.arange(s))
        ),
        shards=16, rows_hint=s, max_bucket_size=64,
    )
    assert got.num_rows == s * (s - 1) // 2
    assert got.schema.metadata[b"lsh_dropped_pairs"] == b"0"


# ---------- VERDICT #6: pair table ships per-shard, never whole ----------


def test_pair_shard_plan_per_shard_slices(ray_session):
    from hksketch.dedup.pairverify import pair_shard_plan

    n = 200_000  # synthetic many-pairs regime
    cand = pa.table(
        {"a": pa.array(np.arange(n), type=pa.int64()),
         "b": pa.array(np.arange(n, 2 * n), type=pa.int64())}
    )
    a_np, b_np, n_pairs, shards, _tref, pairs_refs, _need = pair_shard_plan(cand)
    assert len(pairs_refs) == shards  # one ref per shard, not one whole-table ref
    seen_pid, seen_a, seen_b, max_slice = [], [], [], 0
    for r in pairs_refs:
        pid, a, b = ray_session.get(r)
        max_slice = max(max_slice, len(pid))
        seen_pid.append(pid)
        seen_a.append(a)
        seen_b.append(b)
    # slices partition the full table exactly
    pid = np.concatenate(seen_pid)
    order = np.argsort(pid)
    assert np.array_equal(pid[order], np.arange(n_pairs))
    assert np.array_equal(np.concatenate(seen_a)[order], a_np)
    assert np.array_equal(np.concatenate(seen_b)[order], b_np)
    # no shard holds more than a few multiples of the fair share
    assert max_slice < 4 * (n_pairs // shards + 1)


# ---------- VERDICT #7: vectorized weighted decay matches the scalar loop ----


@pytest.mark.parametrize("cls_name", ["TopK", "BucketedTopK"])
def test_weighted_decay_batch_equals_scalar_at_forced_decay(cls_name):
    """decay=1.0 makes every roll succeed, so the weighted decay loop's
    outcome is roll-independent — the vectorized multi-pass path must then
    produce EXACTLY the scalar event-loop's cell state for any weights.
    (Cells evolve independently per bucket for these variants, so a
    fingerprint-ascending scalar feed replays the batch order; the batch
    is large enough that round 0 takes the >=48-key vectorized path.)"""
    import hksketch.sketch as sk
    from hksketch.hashing import hash_array

    cls = getattr(sk, cls_name)
    rng = np.random.default_rng(5)
    # many keys over few buckets → the decay path dominates and round 0
    # holds hundreds of keys (vectorized); deep rounds fall to scalar
    keys = rng.integers(0, 4096, size=30_000).astype(np.uint64)
    weights = rng.integers(1, 9, size=30_000).astype(np.uint64)

    batch = cls(32, 256, 2, 1.0, seed=9)
    batch.add_batch(keys, weights)

    scalar = cls(32, 256, 2, 1.0, seed=9)
    # same collapsed (unique, summed-weight) stream, FINGERPRINT-ascending
    # (the batch path's documented processing order)
    import pandas as pd

    df = (
        pd.DataFrame({"k": keys, "w": weights}).groupby("k", sort=False).sum()
    )
    uk = df.index.to_numpy().astype(np.uint64)
    uw = df["w"].to_numpy().astype(np.uint64)
    order = np.argsort(hash_array(uk, 9))
    for k, w in zip(uk[order], uw[order]):
        scalar.add(int(k), int(w))

    assert np.array_equal(batch.fp, scalar.fp)
    assert np.array_equal(batch.cnt, scalar.cnt)


def test_cuckoo_weighted_lobby_decay_forced():
    """Cuckoo weighted loser path at decay=1.0 vs a direct model of the
    reference's lobby loop (src/cuckoo.rs:709-731): resident count c vs
    challenger weight w → resident c-w if w < c, else challenger takes the
    lobby with count w-c+1.  Heavy rows are pre-filled with huge counts so
    promotion never fires; >=48 keys per round exercise the vectorized
    multi-pass loop."""
    from hksketch.hashing import hash_array
    from hksketch.sketch import CuckooTopK

    width, depth = 64, 2
    tk = CuckooTopK(16, width, depth, 1.0, seed=3)
    # fill every heavy cell: distinct fps, huge counts (no empties, no
    # takeover possible at these weights)
    tk.heavy_fp[:] = np.arange(1, width * depth + 1, dtype=np.uint64).reshape(
        width, depth
    )
    tk.heavy_cnt[:] = np.uint64(1 << 40)

    rng = np.random.default_rng(8)
    keys = rng.integers(10_000, 1_000_000, size=3000).astype(np.uint64)
    weights = rng.integers(1, 9, size=3000).astype(np.uint64)
    tk.add_batch(keys, weights)

    # model: per primary bucket, fingerprint-ascending challenger sequence
    h = hash_array(keys, 3)
    import pandas as pd

    df = pd.DataFrame({"h": h, "w": weights}).groupby("h", sort=True).sum()
    fps = df.index.to_numpy().astype(np.uint64)
    ws = df["w"].to_numpy().astype(np.uint64)
    lobby = {}
    for fp, w in zip(fps, ws):  # fps sorted → per-bucket order matches
        b, _a = tk._bucket_pair(int(fp))
        res = lobby.get(b)
        if res is None or res[0] == int(fp):
            lobby[b] = (int(fp), (res[1] if res else 0) + int(w))
        else:
            rfp, c = res
            lobby[b] = (int(fp), int(w) - c + 1) if int(w) >= c else (rfp, c - int(w))
    for b, (fp, c) in lobby.items():
        assert int(tk.lobby_fp[b]) == fp, b
        assert int(tk.lobby_cnt[b]) == c, b


# ---------- new sketch: Misra-Gries frequent items (mergeable) ----------


def test_mg_exact_regime_matches_counter():
    from collections import Counter

    from hksketch.sketch import MisraGries

    rng = np.random.default_rng(4)
    keys = [f"k{z}" for z in rng.zipf(1.5, 30_000) if z < 5000]
    mg = MisraGries(1 << 14, seed=12345)  # m >> distinct → exact
    for s in range(0, len(keys), 7000):
        mg.add_batch(keys[s : s + 7000])
    truth = Counter(keys)
    assert mg.error_bound() == 0
    got = dict(mg.list())
    assert got == dict(truth)
    # count_batch agrees
    probe = list(truth)[:100]
    assert mg.count_batch(probe).tolist() == [truth[k] for k in probe]


def test_mg_error_bound_under_truncation():
    from collections import Counter

    from hksketch.sketch import MisraGries

    rng = np.random.default_rng(9)
    keys = [int(z) for z in rng.zipf(1.3, 50_000)]
    truth = Counter(keys)
    m = 64
    mg = MisraGries(m, seed=1)
    for s in range(0, len(keys), 9000):
        mg.add_batch(np.array(keys[s : s + 9000], dtype=np.int64))
    err = mg.error_bound()
    assert 0 < err <= (mg.n_total - int(mg.counts.sum())) // (m + 1) + 1
    # one-sided: est <= true <= est + err, for every resident AND absent key
    got = dict(mg.list())
    for k, true in truth.most_common(200):
        est = got.get(k, 0)
        assert est <= true <= est + err, (k, est, true, err)


def test_mg_merge_exact_regime_associative_and_guarded():
    import pytest as _pytest

    from hksketch.sketch import MisraGries, sketch_from_bytes
    from hksketch.sketch.base import IncompatibleSketchError

    rng = np.random.default_rng(2)
    chunks = [
        np.array([f"u{v}" for v in rng.integers(0, 500, 4000)])
        for _ in range(3)
    ]

    def build(data):
        mg = MisraGries(4096, seed=7)
        mg.add_batch(data)
        return mg

    a, b, c = (build(ch) for ch in chunks)
    left = build(chunks[0]).merge(build(chunks[1]).merge(build(chunks[2])))
    right = build(chunks[0]).merge(build(chunks[1])).merge(build(chunks[2]))
    assert left.state_equal(right)  # exact regime: associative
    # roundtrip
    blob = left.to_bytes()
    back = sketch_from_bytes(blob)
    assert back.state_equal(left)
    assert back.list() == left.list()
    with _pytest.raises(IncompatibleSketchError):
        build(chunks[0]).merge(MisraGries(4096, seed=8))
    with _pytest.raises(IncompatibleSketchError):
        build(chunks[0]).merge(MisraGries(2048, seed=7))


def test_mg_merge_bound_holds_under_truncation():
    from collections import Counter

    from hksketch.sketch import MisraGries

    rng = np.random.default_rng(13)
    parts = [
        [int(z) for z in rng.zipf(1.3, 20_000)] for _ in range(4)
    ]
    m = 48
    summaries = []
    for p in parts:
        mg = MisraGries(m, seed=3)
        mg.add_batch(np.array(p, dtype=np.int64))
        summaries.append(mg)
    acc = summaries[0]
    for s in summaries[1:]:
        acc = acc.merge(s)
    truth = Counter([k for p in parts for k in p])
    err = acc.error_bound()
    got = dict(acc.list())
    for k, true in truth.most_common(100):
        est = got.get(k, 0)
        assert est <= true <= est + err, (k, est, true, err)
    assert err <= (acc.n_total - int(acc.counts.sum())) // (m + 1) + 1


# ---------- new sketch: Frequent Directions (mergeable matrix sketch) ----


def _dense_gram_gap(A, fd):
    """Eigenvalues of AᵀA − BᵀB (ascending) for bound checks."""
    s, Vt = np.linalg.svd(fd.B[: fd.nrows], full_matrices=False)[1:]
    return np.linalg.eigvalsh(A.T @ A - (Vt.T * (s**2)) @ Vt)


def test_fd_exact_regime_matches_dense_svd():
    from hksketch.sketch import FrequentDirections

    rng = np.random.default_rng(21)
    A = rng.standard_normal((700, 32))
    fd = FrequentDirections(512)  # cap 1024 > 700 rows → never shrinks
    for s in range(0, 700, 150):
        fd.add_batch(A[s : s + 150])
    assert fd.error_bound() == 0
    assert np.allclose(
        fd.singular_values(), np.linalg.svd(A, compute_uv=False), rtol=1e-10
    )


def test_fd_spectral_bound_under_shrinking():
    from hksketch.sketch import FrequentDirections

    rng = np.random.default_rng(22)
    U = rng.standard_normal((3000, 4))
    V = rng.standard_normal((4, 48))
    A = U @ V + rng.standard_normal((3000, 48)) * 0.05
    fd = FrequentDirections(12)
    for s in range(0, 3000, 250):
        fd.add_batch(A[s : s + 250])
    ev = _dense_gram_gap(A, fd)
    assert ev.min() > -1e-6  # BᵀB ⪯ AᵀA (underestimate, like MG)
    assert ev.max() <= fd.error_bound() + 1e-6
    assert fd.error_bound() <= fd.frob_sq / 12 + 1e-6
    # strong low-rank signal survives an aggressive sketch
    s_true = np.linalg.svd(A, compute_uv=False)
    s_fd = fd.singular_values()
    assert np.all(s_fd[:4] ** 2 >= s_true[:4] ** 2 - fd.error_bound() - 1e-6)


def test_fd_merge_bound_weights_and_guards():
    import pytest as _pytest

    from hksketch.sketch import FrequentDirections, MisraGries, sketch_from_bytes
    from hksketch.sketch.base import BuilderError, IncompatibleSketchError

    rng = np.random.default_rng(23)
    A = rng.standard_normal((1600, 24))
    parts = []
    for j in range(4):
        fd = FrequentDirections(10)
        fd.add_batch(A[j * 400 : (j + 1) * 400])
        parts.append(fd)
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.merge(p)
    ev = _dense_gram_gap(A, acc)
    assert ev.min() > -1e-6 and ev.max() <= acc.error_bound() + 1e-6
    # roundtrip through the registry
    back = sketch_from_bytes(acc.to_bytes())
    assert back.state_equal(acc)
    assert np.allclose(back.singular_values(), acc.singular_values())
    # weighted rows enter as sqrt(w)·row: weight 4 == the row 4 times
    fa = FrequentDirections(64)
    fa.add_batch(A[:8], weights=np.full(8, 4.0))
    fb = FrequentDirections(64)
    fb.add_batch(np.repeat(A[:8], 4, axis=0))
    sb = fb.singular_values()
    assert np.allclose(fa.singular_values(), sb[:8])
    assert np.all(sb[8:] < 1e-10)  # 4 copies of 8 rows: rank <= 8
    # guards
    with _pytest.raises(BuilderError):
        FrequentDirections(1)
    with _pytest.raises(BuilderError):
        fd0 = FrequentDirections(8)
        fd0.add_batch(A[:4, :10])
        fd0.add_batch(A[:4, :12])
    with _pytest.raises(IncompatibleSketchError):
        FrequentDirections(8).merge(FrequentDirections(16))
    with _pytest.raises(IncompatibleSketchError):
        FrequentDirections(8).merge(MisraGries(8))


def test_fd_arrow_list_column_and_driver_query(ray_session):
    """FD ingests an Arrow list<float> column through the generic
    global_sketch partial path, and the driver query returns the spectrum."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.queries()["embedding_principal_directions"]("/root/testdata/sf0.001")
    assert out.num_rows == 8
    assert out.column_names == ["rank", "sigma", "energy_frac"]
    sig = out.column("sigma").to_pylist()
    assert all(a >= b > 0 for a, b in zip(sig, sig[1:]))
    ef = out.column("energy_frac").to_pylist()
    assert 0 < sum(ef) <= 1.0 + 1e-9


# ---------- BPE-ish token counting ----------


def test_bpe_token_counts_matches_reference_regex():
    import re

    import pyarrow as pa

    from hksketch.text.analysis import BPE_PIECE_RE, bpe_token_counts

    texts = [
        "hello world",  # hell+o, worl+d -> 4
        "a",
        "",
        None,
        "don't stop-me now!!",
        "x" * 23,  # ceil(23/4) = 6 pieces
        "mixed123digits and... CAPS",
        "  spaced   out  ",
    ]
    got = bpe_token_counts(pa.array(texts, type=pa.string()))
    ref = [
        0 if t is None else len(re.findall(BPE_PIECE_RE, t)) for t in texts
    ]
    assert got.tolist() == ref
    assert got[0] == 4 and got[5] == 6


# ---------- lang_id SQL oracle parity ----------


def test_lang_id_sql_oracle_matches_engine_on_edge_cases():
    """The DuckDB mirror of lang_id (built from the live STOPWORDS dict)
    must agree with the engine on ties, the 0.03 floor, empty docs and the
    CJK short-circuit — the cases where an off-by-one in the argmax order
    or a `>` vs `>=` would silently diverge."""
    import duckdb
    import pyarrow as pa

    from __ray_entry__ import _lang_id_sql
    from hksketch.text.analysis import lang_id_batch

    texts = [
        "the cat sat on the mat and it was good",        # clearly en
        "der hund und die katze sind nicht da",          # clearly de
        "le chat est dans la maison pour le moment",     # fr
        "el perro y la casa es una cosa del dia",        # es
        "the der xxxx yyyy zzzz qqqq wwww rrrr",         # en/de tie -> en (argmax first)
        "zzz qqq www rrr ttt uuu vvv",                   # no stopwords -> und
        "",                                              # empty -> und
        "the " + "x " * 200,                             # ratio < 0.03 -> und
        "汉字汉字汉字 some ascii",                          # CJK share -> zh
        "und und und",                                   # de-only stopword
    ]
    eng = lang_id_batch(pa.array(texts, type=pa.string())).to_pylist()

    con = duckdb.connect()
    con.register(
        "documents",
        pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())}),
    )
    sql = con.execute(_lang_id_sql() + " ORDER BY doc_id").df()
    assert sql["lang_pred"].tolist() == eng
    assert eng[4] == "en" and eng[5] == "und" and eng[6] == "und"
    assert eng[7] == "und" and eng[8] == "zh" and eng[9] == "de"


# ---------- exact n-gram Jaccard near-dup ----------


def _ngram_corpus():
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(letters[(i // 26**p) % 26] for p in range(3)) for i in range(400)
    ]
    import numpy as np

    docs = []
    for i in range(40):
        rng = np.random.default_rng(i)
        docs.append(
            {"doc_id": i,
             "text": " ".join(vocab[int(x)] for x in rng.integers(0, 400, 50))}
        )
    # planted near-dup: doc 40 = doc 0 with a few words changed
    words = docs[0]["text"].split()
    words[5] = "zzz"
    docs.append({"doc_id": 40, "text": " ".join(words)})
    # exact dup
    docs.append({"doc_id": 41, "text": docs[1]["text"]})
    # sub-n-token docs: no shingles, never pair (even with each other)
    docs.append({"doc_id": 42, "text": "ab cd"})
    docs.append({"doc_id": 43, "text": "ab cd"})
    return docs


def test_ngram_jaccard_near_dupes_matches_bruteforce(ray_session):
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from hksketch.dedup.ngram import (
        ngram_jaccard,
        ngram_jaccard_near_dupes,
        shingle_set,
    )

    docs = _ngram_corpus()
    ds = rd.from_arrow(pa.Table.from_pylist(docs)).repartition(7)
    out = ngram_jaccard_near_dupes(ds, "text", "doc_id", n=3, threshold=0.5)

    expect = {}
    for a, b in itertools.combinations(docs, 2):
        # empty-shingle docs are excluded by construction (the SQL oracle
        # drops them too); the pure-pair helper would call them jaccard=1
        if not shingle_set(a["text"]) or not shingle_set(b["text"]):
            continue
        j = ngram_jaccard(a["text"], b["text"], n=3)
        if j >= 0.5:
            expect[(a["doc_id"], b["doc_id"])] = j
    got = {
        (ia, ib): j
        for ia, ib, j in zip(out.column("id_a").to_pylist(),
                             out.column("id_b").to_pylist(),
                             out.column("jaccard").to_pylist())
    }
    assert got == expect
    assert (0, 40) in got and got[(1, 41)] == 1.0
    assert not any(42 in p or 43 in p for p in got)


def test_ngram_jaccard_bucket_cap_drops_are_surfaced(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hksketch.dedup.ngram import ngram_jaccard_near_dupes

    # every doc shares the same single shingle -> one degenerate bucket
    docs = [{"doc_id": i, "text": "aaa bbb ccc"} for i in range(20)]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    out = ngram_jaccard_near_dupes(
        ds, "text", "doc_id", n=3, threshold=0.5, max_bucket_size=8
    )
    # the bucket (size 20 > cap 8) is dropped: no pairs, but the drop is
    # loudly surfaced in the schema metadata, never silent
    assert out.num_rows == 0
    assert out.schema.metadata[b"ngram_dropped_buckets"] == b"1"
    assert out.schema.metadata[b"ngram_dropped_pairs"] == str(20 * 19 // 2).encode()

    # uncapped, all 190 pairs are exact dups at jaccard 1.0
    out2 = ngram_jaccard_near_dupes(ds, "text", "doc_id", n=3, threshold=0.5)
    assert out2.num_rows == 190
    assert set(out2.column("jaccard").to_pylist()) == {1.0}


# ---------- fixture regeneration guard ----------


def test_generate_webpages_clears_stale_outputs_on_param_change(tmp_path):
    """Changing generation params must not leave part files from the old
    generation behind (a smaller ``files`` count used to silently mix two
    fixtures)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from hksketch.pipelines.fixtures import generate_webpages

    d = str(tmp_path / "pages")
    generate_webpages(d, n_pages=800, n_hosts=40, seed=1, files=8)
    generate_webpages(d, n_pages=400, n_hosts=20, seed=2, files=2)
    files = glob.glob(d + "/*.parquet")
    assert len(files) == 2
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 400
    assert [f for f in os.listdir(d) if f.startswith("_done_")] == [
        "_done_400_20_5000_2_2"
    ]
    # same params again: marker short-circuits, nothing rewritten
    mtimes = {f: os.path.getmtime(f) for f in files}
    generate_webpages(d, n_pages=400, n_hosts=20, seed=2, files=2)
    assert {f: os.path.getmtime(f) for f in files} == mtimes


# ---------- review fix: PQ batch update keeps live-membership semantics ----


def test_pq_batch_update_reentry_after_eviction():
    """A key tracked at batch start but evicted by a larger-count insert
    during the SAME batch must re-enter through the normal gate (the
    round-4 first draft classified tracked keys once up front and lost
    them; found by review with this exact scenario)."""
    import pyarrow as pa

    from hksketch.sketch.base import pq_batch_update
    from hksketch.sketch.pq import TopKQueue

    def fresh_pq():
        pq = TopKQueue(3)
        pq.upsert(100, "A", 5)
        pq.upsert(200, "D", 7)
        pq.upsert(300, "B", 10)
        return pq

    # case 1: untracked C (smaller fp) ties tracked A at 6 → C's insert
    # evicts A (min=5); A re-enters the loop via the gate and fails (6<=6)
    pq = fresh_pq()
    pq_batch_update(
        pq,
        np.array([51, 100], dtype=np.uint64),
        np.array([6, 6], dtype=np.uint64),
        pa.array(["C", "A"]),
        np.array([0, 1]),
        min_gate_start=5,
    )
    assert {f: e[0] for f, e in pq._map.items()} == {51: 6, 200: 7, 300: 10}

    # case 2: tracked A has the smaller fp → raised to 6 first; C then
    # fails the strict gate — membership resolution is fp-order at ties
    pq = fresh_pq()
    pq_batch_update(
        pq,
        np.array([100, 151], dtype=np.uint64),
        np.array([6, 6], dtype=np.uint64),
        pa.array(["A", "C"]),
        np.array([0, 1]),
        min_gate_start=5,
    )
    assert {f: e[0] for f, e in pq._map.items()} == {100: 6, 200: 7, 300: 10}


def test_lsh_rejects_negative_doc_ids(ray_session):
    import ray.data as rd

    from hksketch.dedup.minhash import lsh_candidate_pairs

    bad = _band_rows_table(np.array([5, 5], dtype=np.uint64),
                           np.array([-1, 7], dtype=np.int64))
    with pytest.raises(Exception, match="non-negative doc ids"):
        lsh_candidate_pairs(rd.from_arrow(bad), shards=16, rows_hint=2)


# ---------- VERDICT #4: shared-storage root threads through ----------


def test_storage_root_resolution(monkeypatch, tmp_path):
    from hksketch.ray_glue.storage import artifact_dir, storage_root

    monkeypatch.delenv("HK_STORAGE_ROOT", raising=False)
    assert storage_root() == "/tmp/hksketch_artifacts"  # single-node default
    monkeypatch.setenv("HK_STORAGE_ROOT", str(tmp_path / "shared"))
    assert storage_root() == str(tmp_path / "shared")
    assert artifact_dir("ivf", "x") == str(tmp_path / "shared" / "ivf" / "x")
    # explicit root beats env
    assert storage_root("/mnt/other") == "/mnt/other"


def test_artifacts_land_under_non_default_root(
    ray_session, webpages_tiny, monkeypatch, tmp_path
):
    """Every worker-written artifact with a defaulted location must resolve
    under HK_STORAGE_ROOT when it is set."""
    root = tmp_path / "sharedroot"
    monkeypatch.setenv("HK_STORAGE_ROOT", str(root))

    from hksketch.pipelines.flagship import bench_webpages

    out = bench_webpages(webpages_tiny)  # doc_stats_dir defaulted
    assert out["doc_stats_dir"].startswith(str(root))
    assert os.path.isdir(out["doc_stats_dir"])
    assert any(
        f.endswith(".parquet") for f in os.listdir(out["doc_stats_dir"])
    )


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


# ---------- TF-IDF top terms ----------


def test_tfidf_top_terms_matches_duckdb(ray_session):
    """The distributed (tf, df) partials + milli-rounded score must equal a
    DuckDB recompute bit-for-bit (the oracle contract), including tf=df
    ties and an all-docs token whose idf is exactly 0."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from hksketch.pipelines.ops import tfidf_top_terms

    docs = [
        {"doc_id": 1, "text": "the quick brown fox the the"},
        {"doc_id": 2, "text": "the lazy dog dog"},
        {"doc_id": 3, "text": "the quick dog jumps over"},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": None},
        {"doc_id": 6, "text": "Zebra zebra ZEBRA " + "x" * 100},
    ]
    t = pa.Table.from_pylist(docs)
    ds = rd.from_arrow(t).repartition(3)
    got = tfidf_top_terms(ds, n_docs=len(docs), k=50).to_pandas()

    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql("""
WITH doc_toks AS (
  SELECT doc_id, lower(tok) AS token
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[A-Za-z]+')) AS tok
        FROM documents)
  WHERE length(tok) <= 64
), stats AS (
  SELECT token, CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM doc_toks GROUP BY token
)
SELECT token, tf, df,
       round(CAST(tf AS DOUBLE)
             * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
                  / CAST(df AS DOUBLE)), 3) AS tfidf
FROM stats ORDER BY tfidf DESC, token ASC LIMIT 50
""").df()
    got = got.sort_values(["tfidf", "token"], ascending=[False, True]).reset_index(drop=True)
    want = want.sort_values(["tfidf", "token"], ascending=[False, True]).reset_index(drop=True)
    assert list(got.columns) == ["token", "tf", "df", "tfidf"] or set(got.columns) == set(want.columns)
    got = got[["token", "tf", "df", "tfidf"]]
    want = want[["token", "tf", "df", "tfidf"]]
    assert got["token"].tolist() == want["token"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    # bitwise: the half-away milli rounding must cancel the 1-ulp ln drift
    assert [v.hex() for v in got["tfidf"]] == [v.hex() for v in want["tfidf"]]
    # the 64-byte token cap drops the 100-x run; 'the' appears in 3 of 6 docs
    assert "x" * 100 not in set(got["token"])
    the = got[got["token"] == "the"].iloc[0]
    assert the["tf"] == 5 and the["df"] == 3


def test_tfidf_halfaway_rounding_matches_duckdb_round():
    """floor(x*1000+0.5)/1000 == DuckDB round(x, 3) for nonnegative doubles,
    including exact .0005 boundaries where numpy's banker's round differs."""
    import duckdb
    import numpy as np

    xs = np.array([0.0005, 0.0015, 1.0625e-1, 2.5e-3, 123.4565, 0.0,
                   7.5e-4, 999999.9995])
    ours = np.floor(xs * 1000.0 + 0.5) / 1000.0
    want = np.array([
        duckdb.sql(f"SELECT round(CAST({v!r} AS DOUBLE), 3)").fetchone()[0]
        for v in xs
    ])
    assert [a.hex() for a in ours] == [b.hex() for b in want]


# ---------- connected components (dup clusters) ----------


def _cc_brute(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(mem) for mem in comp.values() for n in mem}


def test_connected_components_matches_union_find(ray_session):
    """Alternating star contraction must equal union-find min-labels on
    chains (multi-round convergence), multi-component graphs, duplicate /
    reversed edges and self-loops."""
    import numpy as np
    import pyarrow as pa

    from hksketch.dedup.components import connected_components

    rng = np.random.default_rng(7)
    cases = [
        # chain + separate triangle + self loop + reversed dup
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 10), (12, 12), (11, 12)],
        # long path: needs several star rounds
        [(i, i + 1) for i in range(120)],
        # random multigraph
        [(int(rng.integers(0, 60)) * 3 + 1, int(rng.integers(0, 60)) * 3 + 1)
         for _ in range(300)],
    ]
    for e in cases:
        t = pa.table(
            {"id_a": pa.array([a for a, _ in e], type=pa.int64()),
             "id_b": pa.array([b for _, b in e], type=pa.int64())}
        )
        nodes = {a for a, b in e if a != b} | {b for a, b in e if a != b}
        want = _cc_brute([p for p in e if p[0] != p[1]], nodes)
        # both execution paths must agree with union-find: the small-graph
        # single-task path (default) and the distributed star contraction
        # (forced with small_graph_edges=0)
        for kw in ({}, {"small_graph_edges": 0}):
            got = (
                connected_components(t, **kw)
                .to_pandas().set_index("doc_id")["cluster_id"].to_dict()
            )
            assert got == want, kw


def test_connected_components_empty_and_shard_validation(ray_session):
    import pyarrow as pa
    import pytest

    from hksketch.dedup.components import connected_components

    t = pa.table({"id_a": pa.array([], type=pa.int64()),
                  "id_b": pa.array([], type=pa.int64())})
    assert connected_components(t).to_pandas().empty
    with pytest.raises(ValueError, match="power of two"):
        connected_components(
            pa.table({"id_a": pa.array([1], type=pa.int64()),
                      "id_b": pa.array([2], type=pa.int64())}),
            shards=3,
        )


def test_dup_clusters_transitive_via_chain(ray_session, tmp_path):
    """A~B and B~C near-dups (but A!~C) must share one cluster labeled by
    the minimum doc id — the exact property pair listing lacks."""
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray.data as rd

    from hksketch.dedup.components import connected_components
    from hksketch.dedup.ngram import ngram_jaccard_near_dupes

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    words = base.split()
    # B overlaps A on the left half and C on the right half; A and C share
    # too little for jaccard >= 0.5
    # trigram overlaps: A∩B = 11/13 = 0.846, B∩C = 9/17 = 0.529 (both
    # >= 0.5); A∩C = 8/18 = 0.444 (below)
    a_text = " ".join(words[:14])
    b_text = " ".join(words[1:15])
    c_text = " ".join(words[4:20])
    docs = pa.Table.from_pylist(
        [{"doc_id": 5, "text": a_text},
         {"doc_id": 3, "text": b_text},
         {"doc_id": 9, "text": c_text},
         {"doc_id": 7, "text": "完全 другое content entirely unrelated words here now"}]
    )
    ds = rd.from_arrow(docs).repartition(2)
    pairs = ngram_jaccard_near_dupes(ds, "text", "doc_id", n=3, threshold=0.5)
    got_pairs = set(zip(pairs.column("id_a").to_pylist(),
                        pairs.column("id_b").to_pylist()))
    assert (3, 5) in got_pairs and (3, 9) in got_pairs
    assert (5, 9) not in got_pairs  # transitivity is CC's job, not the pairs'
    labels = connected_components(pairs, "id_a", "id_b").to_pandas()
    lab = labels.set_index("doc_id")["cluster_id"].to_dict()
    assert lab == {3: 3, 5: 3, 9: 3}


# ---------- top bigrams ----------


def test_top_bigrams_pairs_within_doc_only(ray_session, tmp_path):
    """Bigrams must never bridge two documents; nulls/empty docs and
    sub-2-token batches are safe."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    import __ray_entry__ as e

    docs = pa.Table.from_pylist(
        [{"doc_id": 1, "text": "red fox red fox"},
         {"doc_id": 2, "text": "fox red"},          # crosses rows only if buggy
         {"doc_id": 3, "text": ""},
         {"doc_id": 4, "text": None},
         {"doc_id": 5, "text": "solo"}]
    )
    d = tmp_path / "sf"
    d.mkdir()
    _pq.write_table(docs, str(d / "documents.parquet"))
    got = e.queries()["top_bigrams"](str(d)).to_pandas()
    m = dict(zip(got["bigram"], got["count"]))
    assert m == {"red fox": 2, "fox red": 2}


# ---------- duplicated spans ----------


def test_duplicated_span_stats_matches_bruteforce(ray_session):
    """Window-multiplicity stats must equal a Counter recompute, including
    a window repeated WITHIN one document and docs shorter than w."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from hksketch.dedup.spans import duplicated_span_stats
    from hksketch.text.tokenize import tokenize_text

    W = 3
    docs = [
        {"doc_id": 1, "text": "a b c d e f"},           # windows: abc bcd cde def
        {"doc_id": 2, "text": "x y a b c d q"},          # shares abc, bcd
        {"doc_id": 3, "text": "r s r s r s r s"},        # self-repeating windows
        {"doc_id": 4, "text": "too short"},              # < w tokens: no row
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": None},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs)).repartition(3)
    got = (
        duplicated_span_stats(ds, "text", "doc_id", w=W, shards=8)
        .to_pandas().set_index("doc_id").sort_index()
    )

    wins = {}
    for d in docs:
        toks = tokenize_text(d["text"]) if d["text"] else []
        wins[d["doc_id"]] = [
            " ".join(toks[i:i + W]) for i in range(len(toks) - W + 1)
        ]
    tot = Counter(w for ws in wins.values() for w in ws)
    for did, ws in wins.items():
        if not ws:
            assert did not in got.index
            continue
        nd = sum(1 for w in ws if tot[w] >= 2)
        row = got.loc[did]
        assert row["n_windows"] == len(ws)
        assert row["n_dup_windows"] == nd
        assert row["dup_frac"] == nd / len(ws)
    # doc 3's self-repeats count as duplicated
    assert got.loc[3, "n_dup_windows"] == got.loc[3, "n_windows"]


def test_duplicated_span_stats_shard_validation(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from hksketch.dedup.spans import duplicated_span_stats

    ds = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 1, "text": "a b c"}]))
    with pytest.raises(ValueError, match="power of two"):
        duplicated_span_stats(ds, shards=12)


# ---------- weighted sample (A-ES) ----------


def test_weighted_sample_recompute_and_partition_invariance(ray_session):
    """The distributed UDAF result must equal a single-pass driver
    recompute of the A-ES keys over the full table, for ANY batch split."""
    import numpy as np
    import pyarrow as pa

    from hksketch.hashing import hash_array
    from hksketch.sketch.reservoir import WeightedSample

    rng = np.random.default_rng(5)
    ids = np.arange(1000, dtype=np.int64)
    w = rng.integers(1, 5000, 1000).astype(np.float64)
    w[::97] = 0.0  # zero weights must be skipped

    def run(splits):
        s = WeightedSample(50, seed=99)
        for lo, hi in splits:
            s.add_batch(pa.array(ids[lo:hi]), w[lo:hi])
        return s.sample()

    one = run([(0, 1000)])
    many = run([(0, 137), (137, 138), (138, 700), (700, 1000)])
    assert one == many

    # driver recompute: same key formula over all w>0 rows
    ok = w > 0
    tags = hash_array(pa.array(ids[ok]), 99)
    u = ((tags >> np.uint64(11)).astype(np.float64) + 1.0) * 2.0**-53
    keys = -np.log(u) / w[ok]
    order = np.lexsort((tags, keys))[:50]
    assert one == [int(i) for i in ids[ok][order]]


def test_weighted_sample_merge_associative_and_guards():
    import numpy as np
    import pyarrow as pa
    import pytest

    from hksketch.sketch.base import BuilderError, IncompatibleSketchError
    from hksketch.sketch.reservoir import WeightedSample

    rng = np.random.default_rng(11)
    parts = []
    for i in range(3):
        s = WeightedSample(20, seed=4)
        ids = rng.integers(0, 10_000, 300)
        s.add_batch(pa.array(ids), rng.random(300) * 10 + 0.1)
        parts.append(s)

    def m(a, b):
        from hksketch.sketch import sketch_from_bytes

        x = sketch_from_bytes(a.to_bytes())
        return x.merge(sketch_from_bytes(b.to_bytes()))

    left = m(m(parts[0], parts[1]), parts[2])
    right = m(parts[0], m(parts[1], parts[2]))
    assert left.state_equal(right)

    with pytest.raises(BuilderError):
        WeightedSample(0)
    with pytest.raises(BuilderError):
        WeightedSample(5).add_batch(pa.array([1, 2]))  # no weights
    with pytest.raises(BuilderError):
        WeightedSample(5).add_batch(pa.array([1, 2]), np.array([1.0]))
    with pytest.raises(IncompatibleSketchError):
        a, b = WeightedSample(5, seed=1), WeightedSample(5, seed=2)
        a.add_batch(pa.array([1]), np.array([1.0]))
        b.add_batch(pa.array([1]), np.array([1.0]))
        a.merge(b)


def test_weighted_sample_bias_toward_heavy_rows():
    """A single dominant weight must appear in every seed's sample; the
    rank-1 frequency of heavy rows must exceed light rows across seeds."""
    import numpy as np
    import pyarrow as pa

    from hksketch.sketch.reservoir import WeightedSample

    ids = pa.array(np.arange(200, dtype=np.int64))
    w = np.ones(200)
    w[7] = 1e9
    heavy_rank1 = 0
    for seed in range(40):
        s = WeightedSample(10, seed=seed)
        s.add_batch(ids, w)
        got = s.sample()
        assert 7 in got
        heavy_rank1 += got[0] == 7
    assert heavy_rank1 >= 35  # P(rank-1) ≈ w7/Σw ≈ 0.9999


def test_sample_docs_weighted_udaf_equals_single_sketch(ray_session):
    """The distributed global_sketch merge path must reproduce one driver
    WeightedSample pass over the full table exactly."""
    import pyarrow.parquet as _pq

    import __ray_entry__ as e
    from hksketch.sketch.reservoir import WeightedSample

    sf = "/root/testdata/sf0.001"
    got = e.queries()["sample_docs_weighted"](sf).column("doc_id").to_pylist()
    t = _pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"])
    s = WeightedSample(100, seed=e.SEED)
    s.add_batch(
        t.column("doc_id").combine_chunks(),
        t.column("n_chars").to_numpy(zero_copy_only=False).astype(float),
    )
    assert got == sorted(s.sample())


# ---------- per-source distinctive terms ----------


def test_source_distinctive_terms_matches_duckdb(ray_session, tmp_path):
    """Group-wise TF-IDF (cogroup df attach, per-source top-5) must equal
    the SQL recompute on a corpus with a token unique to one source, a
    token shared by all, and a tfidf tie broken by token order."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as _pq

    import __ray_entry__ as e

    docs = pa.Table.from_pylist(
        [{"doc_id": 1, "source": "feedA", "text": "shared rare rare zeta"},
         {"doc_id": 2, "source": "feedA", "text": "shared alpha beta"},
         {"doc_id": 3, "source": "feedB", "text": "shared gamma gamma gamma"},
         {"doc_id": 4, "source": "feedB", "text": "shared zeta"},
         {"doc_id": 5, "source": "feedC", "text": "shared only here once"}]
    )
    d = tmp_path / "sf"
    d.mkdir()
    _pq.write_table(docs, str(d / "documents.parquet"))
    got = (
        e.queries()["source_distinctive_terms"](str(d)).to_pandas()
        .sort_values(["source", "tfidf", "token"],
                     ascending=[True, False, True]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(e.oracle_sql()["source_distinctive_terms"]).df().reset_index(drop=True)
    assert got["source"].tolist() == want["source"].tolist()
    assert got["token"].tolist() == want["token"].tolist()
    assert got["tf"].tolist() == want["tf"].tolist()
    assert [v.hex() for v in got["tfidf"]] == [v.hex() for v in want["tfidf"]]
    # 'shared' occurs in every source: idf = ln(1) = 0 exactly
    sh = got[got["token"] == "shared"]
    assert (sh["tfidf"] == 0.0).all()


# ---------- percentile-gated quality filter ----------


def test_quality_gated_counts_matches_duckdb(ray_session, tmp_path):
    """Median-threshold composition: exact quantile_disc median broadcast
    into the filter; null texts excluded on both sides; counts must match
    the SQL recompute exactly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as _pq

    import __ray_entry__ as e

    docs = pa.Table.from_pylist(
        [{"doc_id": 1, "source": "a", "text": "all alpha words here"},
         {"doc_id": 2, "source": "a", "text": "1234 5678 90"},
         {"doc_id": 3, "source": "b", "text": "half 1234 half abcd"},
         {"doc_id": 4, "source": "b", "text": None},
         {"doc_id": 5, "source": "b", "text": ""},
         {"doc_id": 6, "source": "c", "text": "mostly alpha 1"}]
    )
    d = tmp_path / "sf"
    d.mkdir()
    _pq.write_table(docs, str(d / "documents.parquet"))
    got = e.queries()["quality_gated_counts"](str(d)).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(e.oracle_sql()["quality_gated_counts"]).df()
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()


# ---------- distributed hash join ----------


def test_hash_join_matches_duckdb_semantics(ray_session):
    """Inner/left equi-join vs DuckDB on the same inputs: duplicate keys
    on both sides (cartesian within key), null keys (never match; left
    keeps the row), clash suffixing, list payloads."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    lt = pa.table({
        "k": pa.array([1, 2, 2, 3, None, 9], type=pa.int64()),
        "a": pa.array(["p", "q", "r", "s", "t", "u"]),
        "n": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
    })
    rt = pa.table({
        "k": pa.array([2, 2, 3, None, 7], type=pa.int64()),
        "emb": pa.array([[1.0], [2.0, 3.0], [4.0], [5.0], [6.0]],
                        type=pa.list_(pa.float32())),
        "n": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
    })
    left = rd.from_arrow(lt).repartition(3)
    right = rd.from_arrow(rt).repartition(2)

    con = duckdb.connect()
    con.register("lt", lt)
    con.register("rt", rt)

    for how, sql in [
        ("inner", "SELECT lt.k, a, lt.n, emb, rt.n AS n_r FROM lt JOIN rt ON lt.k = rt.k"),
        ("left", "SELECT lt.k, a, lt.n, emb, rt.n AS n_r FROM lt LEFT JOIN rt ON lt.k = rt.k"),
    ]:
        got = (
            hash_join(left, right, on="k", how=how, shards=8)
            .to_pandas()
            .sort_values(["k", "a", "n_r"], na_position="last")
            .reset_index(drop=True)
        )
        want = (
            con.sql(sql).df()
            .sort_values(["k", "a", "n_r"], na_position="last")
            .reset_index(drop=True)
        )
        assert len(got) == len(want), how
        for c in ("k", "a", "n", "n_r"):
            pd.testing.assert_series_equal(
                got[c], want[c], check_dtype=False, check_names=False
            ), (how, c)
        # list payload: compare as tuples (None/NaN-safe — DuckDB returns
        # NaN for an unmatched list cell, Ray returns None)
        def _norm(v):
            if v is None or (isinstance(v, float) and v != v):
                return None
            return tuple(v)

        assert [_norm(v) for v in got["emb"]] == [_norm(v) for v in want["emb"]], how


def test_hash_join_validation(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    ds = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()),
                                 "v": pa.array([2], type=pa.int64())}))
    with pytest.raises(ValueError, match="how"):
        hash_join(ds, ds, on="k", how="outer")
    with pytest.raises(ValueError, match="power of two"):
        hash_join(ds, ds, on="k", shards=6)


# ---------- superspreaders: exact distinct-count top-k + KMV estimate ----------


def test_kmv_estimate_exact_below_k_and_merge_consistent():
    from hksketch.sketch.reservoir import DistinctValueSample

    # fewer distinct values than k: estimate is exact
    s = DistinctValueSample(k=64, seed=7)
    s.add_batch(pa.array([i % 40 for i in range(1000)], type=pa.int64()))
    assert s.estimate() == 40.0

    # above k: merged estimate == single-pass estimate (same min-k tag set)
    vals = np.arange(10_000, dtype=np.int64)
    one = DistinctValueSample(k=128, seed=7)
    one.add_batch(pa.array(vals))
    parts = []
    for lo in range(0, len(vals), 1337):
        p = DistinctValueSample(k=128, seed=7)
        p.add_batch(pa.array(vals[lo:lo + 1337]))
        parts.append(p)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.estimate() == one.estimate()
    # KMV error bound: rel err ~ 1/sqrt(k); allow 4 sigma
    assert abs(one.estimate() - 10_000) / 10_000 < 4 / np.sqrt(128)


def test_distinct_count_topk_matches_duckdb(ray_session):
    import duckdb

    from hksketch.pipelines.ops import distinct_count_topk, read_table

    sf = "/root/testdata/sf0.001"
    ds = read_table(sf, "lineitem", ["l_suppkey", "l_partkey"])
    got = (
        distinct_count_topk(ds, "l_suppkey", "l_partkey", k=10,
                            count_name="distinct_parts")
        .to_pandas()
    )
    want = duckdb.sql(
        f"SELECT l_suppkey, count(DISTINCT l_partkey) AS distinct_parts "
        f"FROM '{sf}/lineitem.parquet' GROUP BY l_suppkey "
        f"ORDER BY distinct_parts DESC, l_suppkey LIMIT 10"
    ).df()
    assert got["l_suppkey"].tolist() == want["l_suppkey"].tolist()
    assert got["distinct_parts"].tolist() == want["distinct_parts"].tolist()


def test_superspreader_kmv_bounded_error_and_deterministic(ray_session):
    import duckdb
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    a = e.queries()["superspreader_suppliers_kmv"](sf).to_pandas()
    b = e.queries()["superspreader_suppliers_kmv"](sf).to_pandas()
    # deterministic under re-execution (value-keyed hash tags)
    assert a.equals(b)
    truth = (
        duckdb.sql(
            f"SELECT l_suppkey, count(DISTINCT l_partkey) d "
            f"FROM '{sf}/lineitem.parquet' GROUP BY l_suppkey"
        )
        .df()
        .set_index("l_suppkey")["d"]
    )
    for r in a.itertuples():
        rel = abs(r.est_distinct - truth[r.l_suppkey]) / truth[r.l_suppkey]
        assert rel < 4 / np.sqrt(256), (r.l_suppkey, rel)


def test_decayed_weights_zero_beyond_table():
    from __ray_entry__ import _DECAY_W_MICRO

    # the table's own tail is already 0, so truncating at 150 days loses
    # nothing — ages beyond the table and ages in its zero tail agree
    assert _DECAY_W_MICRO[0] == 1_000_000
    assert _DECAY_W_MICRO[-1] == 0
    assert int(round(0.9 ** 151 * 1e6)) == 0


def test_decayed_topk_users_partition_invariant(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    a = e.queries()["decayed_topk_users"](sf).to_pandas()
    b = e.queries()["decayed_topk_users"](sf).to_pandas()
    # integer micro-unit sums are order-independent → bitwise-identical
    # results under re-execution with different block orders
    assert a.equals(b)
    assert (a["decayed_count"] > 0).all()


# ---------- containment (one-sided Jaccard) near-dup ----------


def test_containment_catches_quotes_jaccard_misses(ray_session):
    import ray.data as rd

    from hksketch.dedup.ngram import ngram_jaccard_near_dupes, shingle_set

    quote = "the quick brown fox jumps over the lazy dog near the river"
    # tokenizer keeps alpha runs only, so filler words must be distinct
    # WITHOUT digits
    filler = " ".join(
        f"{chr(97 + i // 26)}{chr(97 + i % 26)}filler" for i in range(120)
    )
    long_doc = filler + " " + quote
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], type=pa.int64()),
         "text": pa.array([quote, long_doc, "completely unrelated text here"])}
    )
    ds = rd.from_arrow(t)
    # sanity on the brute-force metric itself
    a, b = shingle_set(quote), shingle_set(long_doc)
    inter = len(a & b)
    assert inter == len(a)  # fully contained
    assert inter / len(a | b) < 0.5  # jaccard misses it

    got_c = ngram_jaccard_near_dupes(
        ds, "text", "doc_id", n=3, threshold=0.8, metric="containment",
        shards=8,
    )
    assert got_c.column("id_a").to_pylist() == [1]
    assert got_c.column("id_b").to_pylist() == [2]
    assert got_c.column("containment").to_pylist() == [1.0]

    got_j = ngram_jaccard_near_dupes(
        ds, "text", "doc_id", n=3, threshold=0.5, metric="jaccard", shards=8
    )
    assert got_j.num_rows == 0  # symmetric jaccard does NOT flag the quote


def test_containment_metric_validation(ray_session):
    import pytest
    import ray.data as rd

    from hksketch.dedup.ngram import ngram_jaccard_near_dupes

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": pa.array(["x"])})
    )
    with pytest.raises(ValueError, match="metric"):
        ngram_jaccard_near_dupes(ds, metric="dice", shards=8)


# ---------- retention / rolling windows ----------


def test_daily_retention_matches_duckdb(ray_session):
    import duckdb

    from hksketch.pipelines.ops import read_table
    from hksketch.pipelines.sessions import daily_retention

    sf = "/root/testdata/sf0.001"
    got = daily_retention(
        read_table(sf, "events", ["user_id", "ts"]), shards=8
    ).to_pandas()
    want = duckdb.sql(f"""
        WITH dd AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                    FROM '{sf}/events.parquet'),
        act AS (SELECT day, count(*) AS a FROM dd GROUP BY day),
        ret AS (SELECT d.day, count(*) AS r FROM dd d JOIN dd n
                  ON n.user_id = d.user_id AND n.day = d.day + INTERVAL 1 DAY
                GROUP BY 1)
        SELECT a.day, a.a AS active_users, COALESCE(r.r, 0) AS retained_users
        FROM act a LEFT JOIN ret r USING (day) ORDER BY a.day
    """).df()
    assert got["day"].tolist() == want["day"].tolist()
    assert got["active_users"].tolist() == want["active_users"].tolist()
    assert got["retained_users"].tolist() == want["retained_users"].tolist()


def test_rolling_hll_tracks_exact_within_bound(ray_session):
    import numpy as np
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    exact = e.queries()["rolling_distinct_users"](sf).to_pandas()
    est = e.queries()["rolling_distinct_users_hll"](sf).to_pandas()
    assert est["window_end"].tolist() == exact["window_end"].tolist()
    rel = (
        np.abs(est["est_distinct_users"].to_numpy()
               - exact["distinct_users"].to_numpy())
        / np.maximum(exact["distinct_users"].to_numpy(), 1)
    )
    # HLL p=14 → ~1.04/sqrt(2^14) ≈ 0.8% typical; allow 5%
    assert rel.max() < 0.05, rel.max()


def test_funnel_edge_cases_match_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from hksketch.pipelines.sessions import conversion_funnel_daily

    base = pd.Timestamp("2024-03-01 10:00:00")
    H = pd.Timedelta(hours=1)
    rows = [
        # converted: view 30 min before purchase
        (1, base, "view"), (1, base + H / 2, "purchase"),
        # converted: view exactly 1h before (>= boundary is INCLUSIVE)
        (2, base, "view"), (2, base + H, "purchase"),
        # NOT converted: equal timestamps (strict before)
        (3, base, "view"), (3, base, "purchase"),
        # NOT converted: view after purchase
        (4, base + H, "view"), (4, base, "purchase"),
        # NOT converted: other user's view
        (5, base, "view"), (6, base + H / 2, "purchase"),
        # converted twice from one view (both purchases inside window)
        (7, base, "view"), (7, base + H / 4, "purchase"),
        (7, base + H / 2, "purchase"),
        # view slightly too old (61 min)
        (8, base, "view"), (8, base + H + pd.Timedelta(minutes=1), "purchase"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    got = conversion_funnel_daily(
        rd.from_pandas(df), shards=4
    ).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH t AS (SELECT user_id, ts FROM events WHERE event_type='purchase'),
        f AS (SELECT user_id, ts FROM events WHERE event_type='view'),
        conv AS (SELECT t.ts, EXISTS (
            SELECT 1 FROM f WHERE f.user_id = t.user_id
            AND f.ts < t.ts AND f.ts >= t.ts - INTERVAL 1 HOUR) AS ok FROM t)
        SELECT date_trunc('day', ts) AS day, count(*) AS n_target,
               sum(CASE WHEN ok THEN 1 ELSE 0 END) AS n_converted
        FROM conv GROUP BY 1 ORDER BY 1
    """).df()
    assert got["n_target"].tolist() == want["n_target"].tolist()
    assert got["n_converted"].tolist() == want["n_converted"].tolist()
    # the boundary semantics the test constructs: 1h-exact converts,
    # equal-ts / reversed / cross-user / 61-min do not; user 7 counts twice
    assert got["n_converted"].sum() == 4


def test_grouped_tdigest_tracks_exact_quantiles(ray_session):
    import numpy as np
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    exact = e.queries()["quantiles_by_event_type"](sf).to_pandas()
    est = e.queries()["quantiles_by_event_type_tdigest"](sf).to_pandas()
    # exact twin publishes one row per type with q50/q95/q99 columns
    exact = exact.set_index("event_type")
    for r in est.itertuples():
        col = {0.25: "q25", 0.5: "q50", 0.75: "q75"}[r.q]
        true = float(exact.loc[r.event_type, col])
        spread = float(exact.loc[r.event_type, "q75"]) - float(
            exact.loc[r.event_type, "q25"]
        )
        # t-digest at compression=200: 5% of the IQR is a loose,
        # stable bound
        assert abs(r.value - true) <= 0.05 * max(spread, 1e-9), (
            r.event_type, r.q, r.value, true
        )


# ---------- KMV theta-style overlap ----------


def test_kmv_overlap_exact_regime_and_bound():
    import numpy as np

    from hksketch.sketch.reservoir import DistinctValueSample, estimate_overlap

    # exact regime: both sets below k → every number exact
    a = DistinctValueSample(k=512, seed=3)
    b = DistinctValueSample(k=512, seed=3)
    a.add_batch(pa.array(np.arange(0, 300, dtype=np.int64)))
    b.add_batch(pa.array(np.arange(200, 500, dtype=np.int64)))
    est = estimate_overlap(a, b)
    assert est["est_a"] == 300.0 and est["est_b"] == 300.0
    assert est["est_union"] == 500.0
    assert est["est_inter"] == 100.0

    # sampling regime: 20k ∪ 20k with 5k overlap at k=1024 → ~3% rel err,
    # allow 4 sigma ≈ 12.5%
    a = DistinctValueSample(k=1024, seed=3)
    b = DistinctValueSample(k=1024, seed=3)
    a.add_batch(pa.array(np.arange(0, 20_000, dtype=np.int64)))
    b.add_batch(pa.array(np.arange(15_000, 35_000, dtype=np.int64)))
    est = estimate_overlap(a, b)
    assert abs(est["est_union"] - 35_000) / 35_000 < 4 / np.sqrt(1024)
    assert abs(est["est_inter"] - 5_000) / 5_000 < 0.2

    # incompatible seeds refuse
    import pytest

    from hksketch.sketch.base import IncompatibleSketchError

    c = DistinctValueSample(k=1024, seed=99)
    with pytest.raises(IncompatibleSketchError):
        estimate_overlap(a, c)


def test_user_overlap_kmv_query_tracks_exact(ray_session):
    import duckdb
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.01"
    got = e.queries()["user_overlap_kmv"](sf).to_pandas().iloc[0]
    want = duckdb.sql(f"""
        SELECT count(DISTINCT CASE WHEN event_type='click' THEN user_id END) c,
               count(DISTINCT CASE WHEN event_type='error' THEN user_id END) er,
               count(DISTINCT CASE WHEN event_type IN ('click','error')
                              THEN user_id END) u
        FROM '{sf}/events.parquet'
    """).fetchone()
    inter = want[0] + want[1] - want[2]
    # 150 users at sf0.01 → exact regime at k=2048: all four numbers exact
    assert got["n_click"] == want[0]
    assert got["n_error"] == want[1]
    assert got["n_union"] == want[2]
    assert got["n_intersection"] == inter


# ---------- AMS F2 sketch ----------


def test_ams_contracts_and_bounds():
    import numpy as np
    import pytest
    from collections import Counter

    from hksketch.sketch import AMSSketch, sketch_from_bytes
    from hksketch.sketch.base import BuilderError, IncompatibleSketchError

    with pytest.raises(BuilderError):
        AMSSketch(width=0)
    with pytest.raises(BuilderError):
        AMSSketch(width=16, depth=0)

    rng = np.random.default_rng(1)
    keys = rng.zipf(1.5, 100_000).astype(np.int64)
    truth = float(sum(c * c for c in Counter(keys.tolist()).values()))
    one = AMSSketch(width=2048, depth=7, seed=9)
    one.add_batch(pa.array(keys))
    assert abs(one.estimate() - truth) / truth < 4 / np.sqrt(2048)

    # linear sketch: 3-way merge is STATE-identical to the single pass,
    # in any association order
    parts = []
    for lo in (0, 40_000, 70_000):
        p = AMSSketch(width=2048, depth=7, seed=9)
        p.add_batch(pa.array(keys[lo:lo + 30_000 if lo else 40_000]))
        parts.append(p)
    ab_c = AMSSketch(width=2048, depth=7, seed=9)
    ab_c.add_batch(pa.array(keys[:40_000]))
    ab_c.add_batch(pa.array(keys[40_000:70_000]))
    ab_c.add_batch(pa.array(keys[70_000:]))
    m1 = parts[0].merge(parts[1]).merge(parts[2])
    assert m1.state_equal(ab_c)

    # weighted adds: F2 of summed weights
    w = AMSSketch(width=2048, depth=5, seed=9)
    w.add_batch(pa.array([1, 1, 2], type=pa.int64()), [3, 4, 5])
    wt = float(7 ** 2 + 5 ** 2)
    assert abs(w.estimate() - wt) / wt < 0.5

    # serde + incompatible guards
    rt = sketch_from_bytes(one.to_bytes())
    assert rt.state_equal(one)
    with pytest.raises(IncompatibleSketchError):
        one.merge(AMSSketch(width=1024, depth=7, seed=9))
    with pytest.raises(IncompatibleSketchError):
        one.merge(AMSSketch(width=2048, depth=7, seed=10))


def test_ams_query_tracks_exact_f2(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.01"
    exact = e.queries()["second_moment_users_exact"](sf).to_pandas()["f2"][0]
    est = e.queries()["second_moment_users_ams"](sf).to_pandas()["f2_est"][0]
    assert abs(est - exact) / exact < 0.1, (est, exact)


def test_ams_inner_product_tracks_exact_join_size(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.01"
    exact = e.queries()["join_size_users_daypair"](sf).to_pandas()["join_size"][0]
    est = e.queries()["join_size_users_daypair_ams"](sf).to_pandas()[
        "join_size_est"
    ][0]
    assert exact > 0
    assert abs(est - exact) / exact < 0.15, (est, exact)


def test_estimate_inner_guards_and_small_exact():
    import pytest

    from hksketch.sketch.ams import AMSSketch, estimate_inner
    from hksketch.sketch.base import IncompatibleSketchError

    a = AMSSketch(width=1 << 14, depth=7, seed=4)
    b = AMSSketch(width=1 << 14, depth=7, seed=4)
    a.add_batch(pa.array([1, 1, 2, 3], type=pa.int64()))
    b.add_batch(pa.array([1, 3, 3, 4], type=pa.int64()))
    # truth: f_a·f_b = 2*1 (key 1) + 1*2 (key 3) = 4; wide sketch with 4
    # keys → collision-free, estimate exact
    assert estimate_inner(a, b) == 4.0
    with pytest.raises(IncompatibleSketchError):
        estimate_inner(a, AMSSketch(width=1 << 14, depth=7, seed=5))


# ---------- grouped KLL / grouped weighted sample ----------


def test_grouped_kll_exact_regime_matches_exact_twin(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    exact = e.queries()["doc_length_quantiles_per_lang"](sf).to_pandas()
    kll = e.queries()["doc_length_quantiles_per_lang_kll"](sf).to_pandas()
    assert exact["lang"].tolist() == kll["lang"].tolist()
    # per-group n < k=256 at sf0.001 → KLL is exact and its rank rule is
    # quantile_disc's; values must agree exactly
    for c in ("q25", "q50", "q75"):
        assert exact[c].astype(float).tolist() == kll[c].tolist(), c


def test_grouped_weighted_sample_recompute_equality(ray_session):
    import duckdb
    import __ray_entry__ as e

    from hksketch.sketch.reservoir import WeightedSample

    sf = "/root/testdata/sf0.001"
    a = e.queries()["sample_docs_weighted_per_source"](sf).to_pandas()
    b = e.queries()["sample_docs_weighted_per_source"](sf).to_pandas()
    assert a.equals(b)  # deterministic under re-execution
    # driver-side recompute of one group must match the distributed merge
    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{sf}/documents.parquet' "
        f"WHERE source = 'src0'"
    ).fetchall()
    ws = WeightedSample(k=5, seed=12345)
    ws.add_batch([r[0] for r in rows], [r[1] for r in rows])
    want = sorted(int(d) for d in ws.sample())
    got = sorted(a[a["source"] == "src0"]["doc_id"].tolist())
    assert got == want


def test_sketch_accuracy_report_floors(ray_session):
    import __ray_entry__ as e

    out = e.queries()["sketch_accuracy_report"]("/root/testdata/sf0.01").to_pandas()
    assert out["variant"].tolist() == ["bucketed", "topk", "cuckoo"]
    # at the flagship config every variant's reported top-100 is hash-exact
    # vs the oracle, so the self-reported metrics must be perfect
    assert (out["hit_ratio"] == 1.0).all(), out
    assert (out["are"] == 0.0).all(), out


def test_new_queries_survive_degenerate_single_row_tables(
    ray_session, tmp_path
):
    """One event / one doc / one embedding: every events- and documents-
    based round-4 query must return (possibly empty) results, not crash —
    single-type event streams, single observed days, and dup-free corpora
    are all reachable states of a real partition."""
    import numpy as np
    import pyarrow.parquet as pq2
    import __ray_entry__ as e

    d = str(tmp_path)
    pq2.write_table(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([np.datetime64("2024-01-01T10:00:00", "us")]),
        "user_id": pa.array([7], pa.int64()),
        "event_type": pa.array(["click"]),
        "value": pa.array([1.5], pa.float64()),
        "props": pa.array(["{}"]),
    }), f"{d}/events.parquet")
    pq2.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["hello world text here"]),
        "lang": pa.array(["en"]),
        "source": pa.array(["src0"]),
        "n_chars": pa.array([21], pa.int64()),
    }), f"{d}/documents.parquet")
    pq2.write_table(pa.table({
        "vec_id": pa.array([1], pa.int64()),
        "embedding": pa.array([[0.1] * 16], pa.list_(pa.float32())),
        "label": pa.array([0], pa.int32()),
    }), f"{d}/embeddings.parquet")

    q = e.queries()
    for name in ("user_overlap_kmv", "join_size_users_daypair",
                 "join_size_users_daypair_ams", "clean_corpus_near_ids",
                 "user_retention_daily", "funnel_view_purchase",
                 "rolling_distinct_users", "trending_users",
                 "cumulative_users_daily", "decayed_topk_users"):
        out = q[name](d)
        # EXECUTE lazy Datasets — without this the "must not raise"
        # guarantee is vacuous for plans that never run (round-4 review)
        if not isinstance(out, pa.Table):
            out = pa.Table.from_pandas(out.to_pandas())
        assert out.num_rows >= 0
    # spot-check the degenerate semantics
    keep = q["clean_corpus_near_ids"](d).to_pandas()
    assert keep["doc_id"].tolist() == [1]
    ov = q["user_overlap_kmv"](d).to_pandas().iloc[0]
    assert ov["n_click"] == 1 and ov["n_error"] == 0
    js = q["join_size_users_daypair"](d).to_pandas()["join_size"][0]
    assert js == 1  # single day: both sides are the same stream, 1·1


def test_hash_join_schemaless_empty_side_raises_clearly(ray_session):
    import pytest
    import ray.data as rd

    from hksketch.ray_glue.joins import hash_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                   "v": pa.array([2], pa.int64())}))
    # a mapped dataset that produces zero rows loses its schema entirely
    empty_mapped = left.map_batches(
        lambda b: pa.table({"k": pa.array([], pa.int64()),
                            "w": pa.array([], pa.int64())}).filter(
                                pa.array([], pa.bool_())),
        batch_format="pyarrow",
    ).filter(lambda r: False)
    if empty_mapped.schema() is None:
        with pytest.raises(ValueError, match="no schema"):
            hash_join(left, empty_mapped, on="k", shards=8)
    else:  # Ray kept a schema on this version — join must then just work
        out = hash_join(left, empty_mapped, on="k", how="left", shards=8)
        assert out.count() == 1


def test_events_profile_one_scan_matches_exact_twins(ray_session):
    import duckdb
    import numpy as np
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.01"
    prof = e.queries()["events_profile"](sf).to_pandas().set_index("event_type")
    want = duckdb.sql(f"""
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS du,
               quantile_disc(value, 0.5) AS med
        FROM '{sf}/events.parquet' GROUP BY 1 ORDER BY 1
    """).df().set_index("event_type")
    assert sorted(prof.index) == sorted(want.index)
    for et in want.index:
        # count column is EXACT
        assert prof.loc[et, "n_events"] == want.loc[et, "n"]
        # HLL p=14 ~0.8% typical; allow 5%
        assert (abs(prof.loc[et, "est_distinct_users"] - want.loc[et, "du"])
                / want.loc[et, "du"]) < 0.05
        # t-digest median within 5% of the exact median
        assert (abs(prof.loc[et, "est_median_value"] - want.loc[et, "med"])
                / max(abs(want.loc[et, "med"]), 1e-9)) < 0.05


def test_funnel_equal_ts_view_does_not_shadow_older_view(ray_session):
    """Regression (round-4 review): a view at EXACTLY the purchase's
    timestamp must not shadow an older in-window view — and the answer
    must not depend on input row order."""
    import pandas as pd
    import ray.data as rd

    from hksketch.pipelines.sessions import conversion_funnel_daily

    base = pd.Timestamp("2024-03-01 10:00:00")
    rows = [
        (7, base, "view"),                                   # in-window
        (7, base + pd.Timedelta(minutes=30), "view"),        # equal-ts
        (7, base + pd.Timedelta(minutes=30), "purchase"),
    ]
    for perm in ([0, 1, 2], [0, 2, 1], [2, 1, 0], [1, 0, 2]):
        df = pd.DataFrame(
            [rows[i] for i in perm], columns=["user_id", "ts", "event_type"]
        )
        got = conversion_funnel_daily(rd.from_pandas(df), shards=4).to_pandas()
        # the 10:00 view converts the purchase regardless of row order
        assert got["n_converted"].tolist() == [1], perm


def test_kmv_overlap_exact_even_when_union_exceeds_k():
    """Regression (round-4 review): two below-k sketches whose UNION
    exceeds k still hold every tag — the estimate must be exact, not the
    sampled path."""
    import numpy as np

    from hksketch.sketch.reservoir import DistinctValueSample, estimate_overlap

    a = DistinctValueSample(k=512, seed=3)
    b = DistinctValueSample(k=512, seed=3)
    a.add_batch(pa.array(np.arange(0, 300, dtype=np.int64)))
    b.add_batch(pa.array(np.arange(300, 600, dtype=np.int64)))  # disjoint
    est = estimate_overlap(a, b)
    assert est["est_union"] == 600.0
    assert est["est_inter"] == 0.0
    assert est["est_jaccard"] == 0.0


def test_previously_crashing_queries_on_degenerate_tables(ray_session, tmp_path):
    """Regression for the degenerate-sweep findings: empty filtered
    streams (global_sketch / SketchAggregate → sketch of the EMPTY stream,
    never None), empty repartition blocks in the block-pair and k-means
    fold tasks, and the no-qualifying-orders base case."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from degenerate_sweep import write_tiny
    import __ray_entry__ as e

    d = str(tmp_path)
    write_tiny(d)
    q = e.queries()
    for name in ("cms_heavy_change_users", "hll_user_overlap",
                 "top_unshipped_orders", "embed_near_dupes",
                 "kmeans_embedding_clusters", "cms_event_type_counts",
                 "bloom_users_membership"):
        out = q[name](d)
        if not isinstance(out, pa.Table):
            out = pa.Table.from_pandas(out.to_pandas())
        assert out.num_rows >= 0, name
    # empty-stream sketch semantics: zero qualifying orders → 0-row result
    assert q["top_unshipped_orders"](d).num_rows == 0


# ---------- LM perplexity (CCNet-style unigram quality gate) ----------


def test_lm_perplexity_matches_brute_force_with_oov(ray_session):
    """vocab_cap=2 forces the OOV path (the capped regime the driver
    oracle can't reach at sf0.01, where cap >= vocab): scores must equal
    an independent per-token brute force, micro-int exact."""
    import math

    import ray.data as rd

    from hksketch.text.lm import lm_perplexity, train_unigram_lm

    docs = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
         "text": ["aa bb aa cc", "bb bb zz aa", "", "cc"]}
    )
    ds = rd.from_arrow(docs)
    model = train_unigram_lm(ds, vocab_cap=2)
    # counts: aa 3, bb 3, cc 2, zz 1 → top-2 by (count desc, token asc)
    # keeps aa and bb; cc/zz are OOV
    assert model["vocab"] == 4 and model["total"] == 9
    assert len(model["hashes"]) == 2
    out = (
        lm_perplexity(ds, vocab_cap=2, model=model)
        .sort("doc_id")
        .to_pandas()
    )
    cnt = {"aa": 3, "bb": 3}
    T, V = 9, 4
    lp = {t: math.floor(math.log((c + 1.0) / (T + V + 1.0)) * 1e6 + 0.5)
          for t, c in cnt.items()}
    oov = math.floor(math.log(1.0 / (T + V + 1.0)) * 1e6 + 0.5)
    assert model["oov"] == oov
    exp_rows = []
    for did, toks in [(1, ["aa", "bb", "aa", "cc"]),
                      (2, ["bb", "bb", "zz", "aa"]), (4, ["cc"])]:
        s = sum(lp.get(t, oov) for t in toks)
        ppl = math.exp((-s / 1e6) / len(toks))
        exp_rows.append((did, len(toks), -s,
                         math.floor(ppl * 1000.0 + 0.5) / 1000.0))
    assert list(out.itertuples(index=False, name=None)) == exp_rows
    # doc 3 (zero tokens) is excluded, not scored as 0
    assert 3 not in set(out["doc_id"])


def test_lm_perplexity_degenerate_inputs(ray_session):
    """Empty corpus and all-empty-text corpus: train yields the documented
    base model (vocab 0, oov logp 0) and scoring emits the full schema with
    zero rows — the empty-partition contract every operator here keeps."""
    import ray.data as rd

    from hksketch.text.lm import lm_perplexity, train_unigram_lm

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    m = train_unigram_lm(rd.from_arrow(empty))
    assert m["vocab"] == 0 and m["total"] == 0 and m["oov"] == 0
    blank = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "text": pa.array(["1234 !!"])})
    out = lm_perplexity(rd.from_arrow(blank)).to_pandas()
    assert len(out) == 0
    # the batch-level contract carries the full schema even when every
    # doc is token-less (Ray may drop all-empty blocks dataset-level)
    from hksketch.text.lm import LMScore

    bt = LMScore(m)(blank)
    assert bt.num_rows == 0
    assert bt.schema.names == ["doc_id", "n_tokens", "nll_micro",
                               "ppl_milli"]


def test_gopher_quality_hand_computed():
    """Repetition metrics on hand-checkable docs: heavy bigram repetition,
    short docs, and the n=1 / n=2 denominators-zero edges."""
    from hksketch.text.analysis import gopher_quality_batch

    batch = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
         "text": ["ab ab ab ab cd",          # bigram "ab ab" x3 of 4
                  "xx",                       # n=1: both fracs 0
                  "one two",                  # n=2: trigram frac 0
                  ""]}                        # token-less: excluded
    )
    out = gopher_quality_batch(batch)
    assert out.column("doc_id").to_pylist() == [1, 2, 3]
    r = {c: out.column(c).to_pylist() for c in out.schema.names}
    # doc 1: n=5, nd=2 (ab, cd), chars=10
    assert r["n_words"][0] == 5
    assert r["mean_word_chars"][0] == 10 / 5
    assert r["dup_word_frac"][0] == 3 / 5
    # bigrams: (ab,ab) x3, (ab,cd) x1 -> max 3 of 4
    assert r["top_bigram_frac"][0] == 3 / 4
    # trigrams: (ab ab ab) x2, (ab ab cd) x1 -> dup occurrences 2 of 3
    assert r["dup_trigram_frac"][0] == 2 / 3
    assert r["gopher_pass"][0] is False  # repetition + n < 50
    # doc 2: single token, mean 2.0, all fracs 0, fails length gate only
    assert r["n_words"][1] == 1 and r["top_bigram_frac"][1] == 0.0
    assert r["dup_trigram_frac"][1] == 0.0
    # doc 3: one bigram occurring once -> frac 1.0; trigram frac 0
    assert r["top_bigram_frac"][2] == 1.0
    assert r["dup_trigram_frac"][2] == 0.0
    # empty batch keeps the full schema
    assert gopher_quality_batch(batch.slice(0, 0)).schema.names == list(
        out.schema.names
    )


def test_corpus_filter_flags_composite(ray_session, tmp_path):
    """Composite gate: each flag independently computable from the
    standalone operators; keep == conjunction; duplicate texts keep only
    the min doc_id; runs on the 1-row degenerate table."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    from degenerate_sweep import write_tiny

    import __ray_entry__ as e

    out = e.queries()["corpus_filter_flags"](
        "/root/testdata/sf0.001"
    ).to_pandas()
    assert len(out) == 500
    conj = (out.lang_ok & out.gopher_ok & out.ppl_ok & out.first_dup)
    assert (out.keep == conj).all()
    # the median gate must split the corpus roughly in half
    assert 0.4 <= out.ppl_ok.mean() <= 0.6
    d = str(tmp_path)
    write_tiny(d)
    tiny = e.queries()["corpus_filter_flags"](d).to_pandas()
    assert list(tiny.columns) == ["doc_id", "lang_ok", "gopher_ok",
                                  "ppl_ok", "first_dup", "keep"]
    assert len(tiny) <= 1


def test_countsketch_point_estimates_bound_and_linearity():
    """Count-Sketch reads of the AMS state: unbiased point frequencies
    with the published additive bound |err| <= sqrt(F2/width) (3x slack
    for the fixed seed), and merge-equals-single-pass linearity."""
    from hksketch.sketch.ams import AMSSketch

    rng = np.random.default_rng(11)
    keys = rng.zipf(1.5, size=40_000)
    keys = keys[keys < 10_000].astype(np.uint64)
    from collections import Counter

    truth = Counter(keys.tolist())
    f2 = sum(c * c for c in truth.values())
    sk = AMSSketch(8192, depth=7, seed=5)
    sk.add_batch(keys)
    hot = [k for k, _ in truth.most_common(20)]
    est = sk.estimate_counts(np.array(hot, dtype=np.uint64))
    bound = 3.0 * (f2 / 8192) ** 0.5
    for k, e in zip(hot, est):
        assert abs(e - truth[k]) <= bound, (k, e, truth[k], bound)
    # linearity: two halves merged read identically to one pass
    a = AMSSketch(8192, depth=7, seed=5)
    b = AMSSketch(8192, depth=7, seed=5)
    a.add_batch(keys[: len(keys) // 2])
    b.add_batch(keys[len(keys) // 2:])
    a.merge(b)
    assert np.array_equal(
        a.estimate_counts(np.array(hot, dtype=np.uint64)), est
    )
    # empty probe
    assert len(sk.estimate_counts(np.array([], dtype=np.uint64))) == 0


def test_lm_sample_trained_model_scores_full_corpus(ray_session):
    """The scale path: a 1-in-2 hash-scattered sample trains a smaller
    model that still ranks the full corpus consistently with the
    full-corpus model (rank correlation of per-doc ppl), and the sample
    itself is storage-order independent."""
    import ray.data as rd

    from hksketch.text.lm import (
        lm_perplexity,
        scattered_doc_sample,
        train_unigram_lm,
    )

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    sample = scattered_doc_sample(ds, keep_1_in=2)
    n_sample = sample.count()
    assert 0 < n_sample < 500
    m_full = train_unigram_lm(ds)
    m_samp = train_unigram_lm(sample)
    assert 0 < m_samp["total"] < m_full["total"]
    full = lm_perplexity(ds, model=m_full).sort("doc_id").to_pandas()
    samp = lm_perplexity(ds, model=m_samp).sort("doc_id").to_pandas()
    assert len(full) == len(samp) == 500  # scoring pass stays full
    # Spearman by hand (no scipy in this container): Pearson over ranks.
    # The fixture corpus is near-uniform word soup from one shared vocab,
    # so per-doc ppl spreads are narrow and a half-corpus model reshuffles
    # mid-ranks; 0.73 observed with the current hash backend.  The gate
    # guards against the sample path breaking outright (rho ≈ 0) — kept
    # loose because the sampled doc SET depends on hash_array's backend,
    # which may change values across polars versions.
    rho = full["ppl_milli"].rank().corr(samp["ppl_milli"].rank())
    assert rho > 0.5, rho
    # storage-order independence: different block split, same sample ids
    resplit = rd.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"],
                              override_num_blocks=7)
    ids_a = sorted(r["doc_id"]
                   for r in scattered_doc_sample(ds, keep_1_in=2).take_all())
    ids_b = sorted(
        r["doc_id"]
        for r in scattered_doc_sample(resplit, keep_1_in=2).take_all()
    )
    assert ids_a == ids_b


def test_hash_join_schema_bypass_avoids_shuffle_reexecution(ray_session):
    """Ray infers a post-all-to-all dataset's schema by RUNNING the
    shuffle, so joining a groupby output without passing rschema executes
    the upstream map twice; with the known schema it runs once.  Results
    must be identical either way."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from hksketch.ray_glue.joins import hash_join

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def inc(self):
            self.n += 1

        def get(self):
            return self.n

    left = rd.from_arrow(
        pa.table({"k": pa.array(range(64), pa.int64()),
                  "v": pa.array(range(64), pa.int64())})
    )

    def run(with_schema: bool):
        c = Counter.remote()

        def tap(b: pa.Table) -> pa.Table:
            ray.get(c.inc.remote())
            return b

        base = rd.from_arrow(
            pa.table({"k": pa.array([i % 8 for i in range(64)], pa.int64()),
                      "w": pa.array(range(64), pa.int64())})
        )
        right = base.map_batches(
            tap, batch_format="pyarrow", zero_copy_batch=True
        ).groupby("k").aggregate(Sum("w", alias_name="w"))
        kw = {}
        if with_schema:
            kw["rschema"] = pa.schema([("k", pa.int64()),
                                       ("w", pa.int64())])
        out = hash_join(left, right, on="k", **kw).to_pandas()
        return out.sort_values(["k", "v"]).reset_index(drop=True), ray.get(
            c.get.remote()
        )

    out_with, n_with = run(True)
    out_without, n_without = run(False)
    assert out_with.equals(out_without)
    assert n_with >= 1
    # without the schema hint the tap stage ran a second full pass
    assert n_without > n_with, (n_without, n_with)
