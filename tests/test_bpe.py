"""BPE trainer: distributed-vs-local equality, greedy overlap semantics,
block-layout invariance, encode/stats consistency."""

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )


def test_greedy_candidates_overlap_rule():
    from hksketch.text.bpe import _greedy_candidates

    # "a a a a": candidates at 0,1,2 -> keep 0,2 (alternation)
    c = np.array([True, True, True, False])
    assert _greedy_candidates(c).tolist() == [0, 2]
    # disjoint candidates all kept
    c = np.array([True, False, True, False])
    assert _greedy_candidates(c).tolist() == [0, 2]
    assert _greedy_candidates(np.zeros(4, dtype=bool)).tolist() == []


def test_apply_merge_np_matches_sequential_splice():
    from hksketch.text.bpe import _apply_merge_np

    sym = np.array(["a", "a", "a", "a", "b", "a", "a"], dtype=object)
    wid = np.array([0, 0, 0, 0, 0, 0, 0])
    out, ow = _apply_merge_np(sym, wid, "a", "a")
    assert out.tolist() == ["aa", "aa", "b", "aa"]
    # word boundary blocks the merge
    sym = np.array(["a", "a"], dtype=object)
    wid = np.array([0, 1])
    out, _ = _apply_merge_np(sym, wid, "a", "a")
    assert out.tolist() == ["a", "a"]


def test_bpe_train_matches_local_reference(ray_session):
    import ray.data as rd

    from hksketch.text.bpe import bpe_train, bpe_train_local, word_counts

    texts = [
        "the quick brown fox jumps over the lazy dog the the",
        "she sells sea shells by the sea shore",
        "peter piper picked a peck of pickled peppers",
        "how much wood would a woodchuck chuck",
    ] * 3
    ds = rd.from_arrow(_docs(texts)).repartition(3)
    wc = word_counts(ds, "text").to_pandas()
    local = bpe_train_local(list(zip(wc["word"], wc["count"])), 12)
    dist = bpe_train(ds, 12, "text")
    assert dist == local
    assert len(dist) == 12
    # counts strictly positive, >= 2 (hapax-pair stop rule)
    assert all(n >= 2 for _, _, n in dist)


def test_bpe_train_block_layout_invariant(ray_session):
    import ray.data as rd

    from hksketch.text.bpe import bpe_train

    texts = ["banana bandana cabana" for _ in range(5)] + [
        "an analog annal anna banal" for _ in range(4)
    ]
    a = bpe_train(rd.from_arrow(_docs(texts)).repartition(1), 8, "text")
    b = bpe_train(rd.from_arrow(_docs(texts)).repartition(5), 8, "text")
    assert a == b


def test_bpe_train_early_stop_on_hapax(ray_session):
    import ray.data as rd

    from hksketch.text.bpe import bpe_train

    # every adjacent pair occurs exactly once -> zero merges
    out = bpe_train(rd.from_arrow(_docs(["abcdef"])), 5, "text")
    assert out == []


def test_bpe_encode_applies_merges_in_order():
    from hksketch.text.bpe import bpe_encode_batch

    merges = [("h", "e", 0), ("t", "he", 0), ("l", "l", 0)]
    out = bpe_encode_batch(
        np.array(["the", "hello", "he", "x"], dtype=object), merges
    )
    assert out == [["the"], ["he", "ll", "o"], ["he"], ["x"]]
    assert bpe_encode_batch(np.array([], dtype=object), merges) == []


def test_bpe_piece_stats_recompute(ray_session):
    import ray.data as rd

    from hksketch.text.bpe import (
        bpe_encode_batch,
        bpe_piece_stats,
        bpe_train,
        word_counts,
    )
    from hksketch.text.tokenize import tokenize_column

    texts = [
        "the thermal theme there is the theory",
        "other leather weather together the",
    ] * 2
    ds = rd.from_arrow(_docs(texts)).repartition(2)
    merges = bpe_train(ds, 6, "text")
    got = bpe_piece_stats(ds, merges, "text").to_pandas().set_index("group")

    # recompute truth locally: encode every token occurrence
    toks = tokenize_column(pa.array(texts)).column("token").to_numpy(
        zero_copy_only=False
    )
    pieces = bpe_encode_batch(toks, merges)
    want_words = len(toks)
    want_pieces = sum(len(p) for p in pieces)
    assert got.loc["__all__", "n_words"] == want_words
    assert got.loc["__all__", "n_pieces"] == want_pieces
    assert got.loc["__all__", "pieces_per_word"] == pytest.approx(
        want_pieces / want_words
    )
    # compression must be real: merges learned on this corpus shorten it
    assert want_pieces < sum(len(t) for t in toks)


def test_bpe_piece_stats_grouped(ray_session):
    import ray.data as rd

    from hksketch.text.bpe import bpe_piece_stats, bpe_train

    t = pa.table(
        {"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
         "text": pa.array(["aaaa aaaa", "aaaa", "bb bb bb", "bb"]),
         "source": pa.array(["s1", "s1", "s2", "s2"])}
    )
    ds = rd.from_arrow(t).repartition(2)
    merges = bpe_train(ds, 3, "text")
    out = (
        bpe_piece_stats(ds, merges, "text", group_col="source")
        .to_pandas().set_index("group").sort_index()
    )
    assert set(out.index) == {"s1", "s2"}
    assert out.loc["s1", "n_words"] == 3
    assert out.loc["s2", "n_words"] == 4
    # merges: (a,a)->aa count 12? then (aa,aa)->aaaa, (b,b)->bb
    # every "aaaa" word ends as one piece, every "bb" as one piece
    assert out.loc["s1", "n_pieces"] == 3
    assert out.loc["s2", "n_pieces"] == 4


def test_bpe_min_count_prunes_word_types(ray_session):
    import ray.data as rd

    from hksketch.text.bpe import bpe_train, bpe_train_local, word_counts

    texts = ["zz zz zz zz", "qxj"]  # qxj is a hapax type
    ds = rd.from_arrow(_docs(texts))
    with_hapax = bpe_train(ds, 2, "text", min_count=1)
    no_hapax = bpe_train(ds, 2, "text", min_count=2)
    assert with_hapax[0][:2] == ("z", "z")
    assert no_hapax == [("z", "z", 4)]
    wc = word_counts(ds, "text").to_pandas()
    assert no_hapax == bpe_train_local(
        list(zip(wc["word"], wc["count"])), 2, min_count=2
    )
