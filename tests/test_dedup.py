"""Dedup suite: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import numpy as np
import pyarrow as pa
import pytest

from hksketch.dedup.minhash import MinHasher
from hksketch.dedup.ngram import jaccard, ngram_jaccard, shingle_set
from hksketch.dedup.simhash import SimHasher, hamming64


BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into the woods "
    "while the hunter watches quietly from behind an old oak tree near the river"
)
NEAR = BASE.replace("quietly", "silently")  # one-token change
FAR = "completely different content about databases indexes queries and storage engines"


def test_ngram_jaccard_basics():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert 0.5 < ngram_jaccard(BASE, NEAR) < 1.0
    assert ngram_jaccard(BASE, FAR) == 0.0
    assert jaccard(frozenset(), frozenset()) == 1.0
    assert shingle_set("a b", 3) == frozenset()


def test_minhash_estimates_jaccard():
    mh = MinHasher(num_perm=256, ngram=3, seed=1)
    texts = pa.array([BASE, NEAR, FAR], type=pa.string())
    sig = mh.signatures(texts)
    est_near = float((sig[0] == sig[1]).mean())
    true_near = ngram_jaccard(BASE, NEAR)
    assert abs(est_near - true_near) < 0.15
    assert float((sig[0] == sig[2]).mean()) < 0.05


def test_minhash_deterministic_across_instances():
    texts = pa.array([BASE, NEAR], type=pa.string())
    a = MinHasher(128, 3, seed=9).signatures(texts)
    b = MinHasher(128, 3, seed=9).signatures(texts)
    assert np.array_equal(a, b)
    c = MinHasher(128, 3, seed=10).signatures(texts)
    assert not np.array_equal(a, c)


def test_simhash_hamming_reflects_similarity():
    sh = SimHasher(seed=1)
    sig = sh.signatures(pa.array([BASE, NEAR, FAR], type=pa.string()))
    d_near = int(hamming64(sig[0:1], sig[1:2])[0])
    d_far = int(hamming64(sig[0:1], sig[2:3])[0])
    assert d_near < d_far
    assert d_near <= 8
    assert d_far > 10


def test_exact_dedup_pipeline(ray_session):
    import ray.data as rd

    from hksketch.dedup.exact import exact_dedup

    rows = [
        {"doc_id": 1, "text": "aaa"},
        {"doc_id": 2, "text": "bbb"},
        {"doc_id": 3, "text": "aaa"},  # dup of 1
        {"doc_id": 4, "text": "ccc"},
        {"doc_id": 5, "text": "bbb"},  # dup of 2
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    kept = sorted(r["doc_id"] for r in exact_dedup(ds, "text", "doc_id").take_all())
    assert kept == [1, 2, 4]


def test_minhash_lsh_pipeline_finds_planted_dupes(ray_session):
    import ray.data as rd

    from hksketch.dedup.minhash import minhash_near_dupes

    docs = [{"doc_id": 1, "text": BASE}, {"doc_id": 2, "text": NEAR},
            {"doc_id": 3, "text": FAR}]
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(letters[(i // 26**p) % 26] for p in range(3)) for i in range(500)
    ]
    for i in range(4, 30):  # noise docs (alphabetic words: digits are separators)
        rng = np.random.default_rng(i)
        docs.append(
            {"doc_id": i,
             "text": " ".join(vocab[int(x)] for x in rng.integers(0, 500, 40))}
        )
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    out = minhash_near_dupes(
        ds, "text", "doc_id", num_perm=128, bands=32, seed=1,
        verify_threshold=0.5,
    )
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)  # no false positives survive verify


def test_simhash_pipeline_finds_planted_dupes(ray_session):
    import ray.data as rd

    from hksketch.dedup.simhash import simhash_near_dupes

    docs = [{"doc_id": 1, "text": BASE}, {"doc_id": 2, "text": NEAR},
            {"doc_id": 3, "text": FAR}]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    out = simhash_near_dupes(ds, "text", "doc_id", max_hamming=8, seed=1)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_distributed_verify_matches_exact_jaccard(ray_session):
    """Hashed-shingle Jaccard from the distributed semi-join equals the
    exact token-tuple shingle Jaccard (collisions are 2^-64)."""
    import ray.data as rd

    from hksketch.dedup.minhash import minhash_near_dupes
    from hksketch.dedup.ngram import ngram_jaccard

    docs = [{"doc_id": 1, "text": BASE}, {"doc_id": 2, "text": NEAR}]
    out = minhash_near_dupes(
        rd.from_arrow(pa.Table.from_pylist(docs)), "text", "doc_id",
        num_perm=64, bands=32, seed=1, verify_threshold=0.0,
    )
    got = {(a, b): j for a, b, j in zip(out.column("a").to_pylist(),
                                        out.column("b").to_pylist(),
                                        out.column("jaccard").to_pylist())}
    assert got[(1, 2)] == pytest.approx(ngram_jaccard(BASE, NEAR, 3), abs=1e-12)


def test_minhash_verify_exact_on_duplicate_cluster(ray_session, tmp_path):
    """A large duplicate cluster (the quadratic-candidate regime): the
    distributed verify must return exactly the brute-force Jaccard for
    every candidate pair, with small per-(doc, shard)-deduped chunks."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from hksketch.dedup.minhash import MinHasher, minhash_near_dupes

    rng = np.random.default_rng(2)
    base = [f"tok{i}" for i in rng.integers(0, 400, 120)]
    docs = []
    for i in range(60):  # 60-doc near-dup cluster → ~1.7k candidate pairs
        d = list(base)
        for _ in range(rng.integers(0, 4)):
            d[rng.integers(0, len(d))] = f"tok{rng.integers(0, 400)}"
        docs.append(" ".join(d))
    for i in range(40):  # unrelated docs
        docs.append(" ".join(f"z{rng.integers(0, 5000)}" for _ in range(100)))
    t = pa.table(
        {"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
         "text": pa.array(docs)}
    )
    f = str(tmp_path / "cluster.parquet")
    pq.write_table(t, f)
    out = minhash_near_dupes(
        rd.read_parquet(f), "text", "doc_id", num_perm=64, bands=16,
        verify_threshold=0.5, seed=3,
    )
    assert out.num_rows > 500  # the cluster really is quadratic in pairs

    # chunk-boundary coverage: a tiny chunk_pairs forces many reduce
    # iterations; results must be identical to the default single chunk
    from hksketch.dedup.minhash import (
        MinHasher as _MH,
        lsh_candidate_pairs,
        verify_pairs_distributed,
    )

    ds2 = rd.read_parquet(f)
    mh2 = _MH(num_perm=64, ngram=3, seed=3)

    def _stage(batch):
        return mh2.band_rows(
            batch.column("text").combine_chunks(),
            batch.column("doc_id").to_numpy(), 16,
        )

    cand2 = lsh_candidate_pairs(
        ds2.map_batches(_stage, batch_format="pyarrow", zero_copy_batch=True)
    )
    chunked = verify_pairs_distributed(
        ds2, cand2, mh2, "text", "doc_id", 0.5, chunk_pairs=7
    )
    assert chunked.equals(out)

    # brute-force verification of every reported pair's jaccard
    mh = MinHasher(num_perm=64, ngram=3, seed=3)
    sets = {}
    for i, d in enumerate(docs):
        sh, _ = mh.shingle_hashes(pa.array([d]))
        sets[i] = np.unique(sh)
    for a, b, j in zip(out.column("a").to_pylist(), out.column("b").to_pylist(),
                       out.column("jaccard").to_pylist()):
        inter = len(np.intersect1d(sets[a], sets[b], assume_unique=True))
        union = len(sets[a]) + len(sets[b]) - inter
        want = 1.0 if union == 0 else inter / union
        assert abs(j - want) < 1e-12, (a, b, j, want)
        assert want >= 0.5


def test_split_contamination_constructed(ray_session):
    """Eval doc sharing an 8-token passage with a train doc is flagged;
    eval-internal duplicates do NOT count; train docs never appear."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hksketch.dedup.spans import split_contamination_stats

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    filler = "one two three four five six seven eight nine ten"
    docs = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
         "text": pa.array(
             [passage + " " + filler,            # train, holds the passage
              filler + " " + passage,            # eval: contaminated tail
              "uniq words nobody else repeats here at all okay fine yes",
              passage + " " + passage]           # eval: dup passage inside
         )}
    )
    # ids 1,2,3 are eval; 0 is train
    out = (
        split_contamination_stats(
            rd.from_arrow(docs).repartition(2),
            is_eval_fn=lambda ids: ids > 0,
            w=8, shards=64,
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert set(out.index) == {1, 2, 3}
    # doc 1: 18 tokens -> 11 windows; shared with train doc 0: the pure
    # passage window + the 3 pure-filler windows (both docs contain the
    # 10-token filler run) = 4
    assert out.loc[1, "n_windows"] == 11
    assert out.loc[1, "n_contam_windows"] == 4
    # doc 2: unique text, zero contamination
    assert out.loc[2, "n_contam_windows"] == 0
    # doc 3: the repeated passage matches TRAIN doc 0, so its two exact
    # passage windows are contaminated via doc 0 (not via self-dup);
    # windows spanning the two copies exist only in doc 3 -> clean
    assert out.loc[3, "n_windows"] == 9
    assert out.loc[3, "n_contam_windows"] == 2

    # with doc 0 made eval too, doc 3's passage windows lose their train
    # source: eval-internal duplication must not count
    out2 = (
        split_contamination_stats(
            rd.from_arrow(docs), is_eval_fn=lambda ids: ids >= 0,
            w=8, shards=64,
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (out2["n_contam_windows"] == 0).all()


def test_bloom_decontaminate_one_sided_vs_exact(ray_session):
    """Bloom path vs the exact operator on the same corpus: identical doc
    set and n_windows, n_flagged >= n_contam_windows always (Bloom has no
    false negatives), and exact equality at a generously-sized filter
    (fill so low the expected FP count over all probed windows is ~0)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hksketch.dedup.spans import (
        bloom_decontaminate,
        split_contamination_stats,
    )

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i:03d}" for i in range(60)])
    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts, ids = [], []
    for i in range(40):
        body = " ".join(rng.choice(vocab, size=30))
        if i % 5 == 0:  # plant the passage in train AND eval docs
            body = body + " " + passage
        texts.append(body)
        ids.append(i)
    docs = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
    )

    def is_eval(a):
        return (np.asarray(a) % 4) == 0

    ds = rd.from_arrow(docs).repartition(3)
    exact = (
        split_contamination_stats(ds, is_eval, w=8, shards=64)
        .to_pandas().set_index("doc_id").sort_index()
    )
    bloom = (
        bloom_decontaminate(
            ds, is_eval, w=8, m_bits=1 << 20, k=7, concurrency=2
        )
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert list(bloom.index) == list(exact.index)
    assert (bloom["n_windows"] == exact["n_windows"]).all()
    assert (bloom["n_flagged"] >= exact["n_contam_windows"]).all()
    assert (bloom["n_flagged"] == exact["n_contam_windows"]).all()
    got = bloom.loc[bloom["n_flagged"] > 0]
    assert len(got) > 0  # the planted passage was actually flagged
