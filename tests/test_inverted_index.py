"""Inverted index: build/reuse/stale-rebuild contract, pruned partition
reads, AND-search brute-force equality, BM25 recompute, guards."""

import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _corpus(rng, n_docs=40, vocab=24, words=30):
    # alpha-only vocabulary: the reference tokenizer keeps [A-Za-z]+ runs,
    # so digit-bearing fake words would all collapse to one token
    vs = ["".join(("w", chr(97 + i // 5), chr(97 + i % 5))) for i in range(vocab)]
    texts = [
        " ".join(rng.choice(vs, size=words).tolist()) for _ in range(n_docs)
    ]
    return pa.table(
        {"doc_id": pa.array(range(n_docs), type=pa.int64()),
         "text": pa.array(texts)}
    )


@pytest.fixture()
def built(ray_session, tmp_path):
    import ray.data as rd

    from hksketch.text.index import build_inverted_index

    rng = np.random.default_rng(0)
    docs = _corpus(rng)
    idx = build_inverted_index(
        rd.from_arrow(docs).repartition(3), str(tmp_path / "idx"),
        partitions=8,
    )
    return idx, docs


def test_search_and_matches_bruteforce(built):
    from hksketch.text.index import search_and

    idx, docs = built
    texts = docs.column("text").to_pylist()
    for terms in (["waa", "wab"], ["wba"], ["waa", "wab", "wac"]):
        got = search_and(idx, terms, k=100).to_pandas()
        want = []
        for i, t in enumerate(texts):
            c = Counter(t.split())
            if all(c[x] > 0 for x in terms):
                want.append((i, sum(c[x] for x in terms)))
        want.sort(key=lambda r: (-r[1], r[0]))
        assert list(zip(got["doc_id"], got["score"])) == want, terms


def test_pruned_read_touches_only_term_partitions(built):
    from hksketch.text.index import term_posting_paths

    idx, _ = built
    paths = term_posting_paths(idx, ["waa", "wab"])
    assert len(paths) <= 2
    all_parts = sorted(
        p for p in os.listdir(os.path.join(idx, "postings"))
        if p.startswith("partition=")
    )
    assert len(all_parts) > len(paths)  # a query must not read everything
    for p in paths:
        assert os.path.basename(p) in all_parts


def test_bm25_matches_local_recompute(built):
    from hksketch.text.index import bm25_search

    idx, docs = built
    texts = docs.column("text").to_pylist()
    terms = ["waa", "wad"]
    got = bm25_search(idx, terms, k=1000).to_pandas()
    n = len(texts)
    counters = [Counter(t.split()) for t in texts]
    dls = [sum(c.values()) for c in counters]
    avgdl = sum(dls) / n
    want = {}
    for t in sorted(terms):
        df = sum(1 for c in counters if c[t] > 0)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, c in enumerate(counters):
            tf = c[t]
            if tf:
                want[i] = want.get(i, 0.0) + (
                    idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avgdl))
                )
    assert set(got["doc_id"]) == set(want)
    for d, s in zip(got["doc_id"], got["score"]):
        assert s == pytest.approx(want[d], rel=1e-12)
    # and-mode is a subset of or-mode
    got_and = bm25_search(idx, terms, k=1000, mode="and").to_pandas()
    both = {
        i for i, c in enumerate(counters)
        if c["waa"] > 0 and c["wad"] > 0
    }
    assert set(got_and["doc_id"]) == both


def test_index_reuse_and_stale_rebuild(ray_session, tmp_path):
    import json

    import ray.data as rd

    from hksketch.text.index import build_inverted_index

    rng = np.random.default_rng(1)
    docs = _corpus(rng, n_docs=10)
    ds = rd.from_arrow(docs)
    d = str(tmp_path / "idx2")
    build_inverted_index(ds, d, partitions=8)
    man1 = json.load(open(os.path.join(d, "MANIFEST.json")))
    build_inverted_index(ds, d, partitions=8)  # reuse: same manifest obj
    man2 = json.load(open(os.path.join(d, "MANIFEST.json")))
    assert man1 == man2
    # different params -> rebuild
    build_inverted_index(ds, d, partitions=16)
    man3 = json.load(open(os.path.join(d, "MANIFEST.json")))
    assert man3["partitions"] == 16


def test_guards(built):
    from hksketch.text.index import bm25_search, search_and

    idx, _ = built
    with pytest.raises(ValueError):
        search_and(idx, [])
    with pytest.raises(ValueError):
        bm25_search(idx, ["waa"], mode="xor")
    # unknown term -> empty AND result, not an error
    out = search_and(idx, ["zzznotaterm"]).to_pandas()
    assert len(out) == 0


def test_build_rejects_non_pow2_partitions(ray_session, tmp_path):
    import ray.data as rd

    from hksketch.text.index import build_inverted_index

    docs = _corpus(np.random.default_rng(2), n_docs=3)
    with pytest.raises(ValueError):
        build_inverted_index(
            rd.from_arrow(docs), str(tmp_path / "bad"), partitions=12
        )


def test_search_and_distributed_equals_driver_path(built):
    """The doc-sharded scale path returns exactly the driver-side
    intersection's rows (same AND semantics, same tie rule)."""
    from hksketch.text.index import search_and, search_and_distributed

    idx, _ = built
    for terms in (["waa", "wab"], ["wba"], ["waa", "wab", "wac"],
                  ["zzznotaterm"], ["waa", "zzznotaterm"]):
        a = search_and(idx, terms, k=15).to_pandas()
        b = search_and_distributed(idx, terms, k=15, doc_shards=4).to_pandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), terms
        assert a["score"].tolist() == b["score"].tolist(), terms


def test_search_and_distributed_guards(built):
    from hksketch.text.index import search_and_distributed

    idx, _ = built
    with pytest.raises(ValueError):
        search_and_distributed(idx, [])
    with pytest.raises(ValueError):
        search_and_distributed(idx, ["waa"], doc_shards=12)


def test_append_equals_full_build(ray_session, tmp_path):
    """Incremental ingestion: build on half the corpus, append the other
    half — every query path answers identically to the single-shot
    index (files land in the same partitions; manifest N/avgdl update)."""
    import ray.data as rd

    from hksketch.text.index import (
        append_inverted_index,
        bm25_search,
        build_inverted_index,
        search_and,
        search_and_distributed,
    )

    rng = np.random.default_rng(5)
    docs = _corpus(rng, n_docs=60)
    half_a = docs.slice(0, 30)
    half_b = docs.slice(30)

    full = build_inverted_index(
        rd.from_arrow(docs).repartition(3), str(tmp_path / "full"),
        partitions=8,
    )
    inc = build_inverted_index(
        rd.from_arrow(half_a).repartition(2), str(tmp_path / "inc"),
        partitions=8,
    )
    append_inverted_index(rd.from_arrow(half_b).repartition(2), inc)

    terms = ["waa", "wab"]
    a1 = search_and(full, terms, k=100).to_pydict()
    a2 = search_and(inc, terms, k=100).to_pydict()
    assert a1 == a2
    d1 = search_and_distributed(full, terms, k=100).to_pydict()
    d2 = search_and_distributed(inc, terms, k=100).to_pydict()
    assert d1 == d2
    b1 = bm25_search(full, terms, k=100).to_pandas()
    b2 = bm25_search(inc, terms, k=100).to_pandas()
    assert b1["doc_id"].tolist() == b2["doc_id"].tolist()
    np.testing.assert_allclose(b1["score"], b2["score"], rtol=1e-12)

    # double-append refused by fingerprint
    with pytest.raises(ValueError, match="double-count"):
        append_inverted_index(rd.from_arrow(half_b).repartition(2), inc)


def test_compaction_preserves_results(ray_session, tmp_path):
    import os

    import ray.data as rd

    from hksketch.text.index import (
        append_inverted_index,
        bm25_search,
        build_inverted_index,
        compact_inverted_index,
        search_and,
    )

    rng = np.random.default_rng(6)
    docs = _corpus(rng, n_docs=40)
    idx = build_inverted_index(
        rd.from_arrow(docs.slice(0, 20)).repartition(2),
        str(tmp_path / "c"), partitions=4,
    )
    append_inverted_index(rd.from_arrow(docs.slice(20)).repartition(2), idx)
    before_and = search_and(idx, ["waa", "wab"], k=100).to_pydict()
    before_bm = bm25_search(idx, ["waa", "wab"], k=100).to_pydict()
    stats = compact_inverted_index(idx)
    assert stats["partitions_compacted"] > 0
    assert stats["files_after"] < stats["files_before"]
    # every live partition is now a single file; no residue dirs
    pdir = os.path.join(idx, "postings")
    for part in os.listdir(pdir):
        assert not part.endswith((".tmp", ".old"))
        files = os.listdir(os.path.join(pdir, part))
        assert len([f for f in files if f.endswith(".parquet")]) == 1
    assert search_and(idx, ["waa", "wab"], k=100).to_pydict() == before_and
    assert bm25_search(idx, ["waa", "wab"], k=100).to_pydict() == before_bm
    # idempotent
    stats2 = compact_inverted_index(idx)
    assert stats2["partitions_compacted"] == 0
