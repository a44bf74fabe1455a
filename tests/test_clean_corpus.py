"""Resumable partitioned-Parquet corpus materialization."""

import json
import os

import pyarrow.parquet as pq


def _files(d):
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _shards(out):
    return sorted(s for s in os.listdir(out) if s.startswith("shard="))


def test_clean_corpus_filters_dedups_and_resumes(ray_session, webpages_tiny, tmp_path):
    from hksketch.pipelines.clean_corpus import materialize_clean_corpus

    out = str(tmp_path / "clean")
    files = _files(webpages_tiny)
    m1 = materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    assert m1["built"] == len(files) and m1["skipped"] == 0
    assert m1["rows_out"] <= m1["rows_in"]
    # output layout: one shard dir per input file, with meta; plus the
    # partitioned duplicate-id index
    shards = _shards(out)
    assert len(shards) == len(files)
    assert os.path.exists(os.path.join(out, "_dups", "_DUPS_META.json"))
    meta = json.load(open(os.path.join(out, shards[0], "_META.json")))
    assert meta["rows_in"] >= meta["rows_out"]
    total_rows = sum(
        pq.read_table(os.path.join(out, s, "part.parquet")).num_rows for s in shards
    )
    assert total_rows == m1["rows_out"]
    # resume: everything skipped (dup index reused via fingerprint)
    m2 = materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    assert m2["skipped"] == len(files) and m2["built"] == 0
    assert m2["duplicates_dropped_global"] == m1["duplicates_dropped_global"]
    # partial resume: drop one shard, only it rebuilds
    import shutil

    shutil.rmtree(os.path.join(out, shards[0]))
    m3 = materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    assert m3["built"] == 1 and m3["skipped"] == len(files) - 1
    total_rows2 = sum(
        pq.read_table(os.path.join(out, s, "part.parquet")).num_rows
        for s in _shards(out)
    )
    assert total_rows2 == total_rows


def test_clean_corpus_matches_independent_dedup(ray_session, webpages_tiny, tmp_path):
    """Surviving id set == independent polars recompute of the same
    filter+min-id-dedup rule (exact, not approximate: the dup index is a
    partitioned anti-join, not a Bloom)."""
    import polars as pl

    from hksketch.pipelines.clean_corpus import materialize_clean_corpus
    from hksketch.text.analysis import quality_scores_batch

    out = str(tmp_path / "clean2")
    files = _files(webpages_tiny)
    materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    got = set()
    for s in _shards(out):
        got |= set(
            pq.read_table(os.path.join(out, s, "part.parquet"), columns=["url"])
            .column("url")
            .to_pylist()
        )

    import pyarrow as pa

    t = pa.concat_tables([pq.read_table(f, columns=["url", "text"]) for f in files])
    q = quality_scores_batch(t, "text", "url")
    keep = (q.column("n_tokens").to_numpy() >= 10) & (
        q.column("alpha_ratio").to_numpy() >= 0.5
    )
    surv = pl.from_arrow(t.filter(pa.array(keep)))
    want = set(
        surv.group_by("text")
        .agg(pl.col("url").min())
        .get_column("url")
        .to_list()
    )
    assert got == want


def test_clean_corpus_drops_cross_file_duplicates(
    ray_session, webpages_tiny, tmp_path
):
    """Inject exact-dup texts into a SECOND file: the keeper (min url) stays,
    dups drop, and the dup index partition lands under the dup's own src."""
    import pyarrow as pa

    src = _files(webpages_tiny)[0]
    t = pq.read_table(src)
    data = str(tmp_path / "data")
    os.makedirs(data)
    pq.write_table(t, os.path.join(data, "orig.parquet"))
    # 5 copies of rows 0-4's text under new urls sorting AFTER the originals
    dup = t.slice(0, 5)
    dup = dup.set_column(
        dup.schema.get_field_index("url"),
        "url",
        pa.array([f"https://zzz.example/dup/{i}" for i in range(5)]),
    )
    pq.write_table(dup, os.path.join(data, "extra.parquet"))

    from hksketch.pipelines.clean_corpus import materialize_clean_corpus

    out = str(tmp_path / "clean3")
    m = materialize_clean_corpus(
        _files(data), out, min_tokens=0, min_alpha=0.0
    )
    assert m["duplicates_dropped_global"] == 5
    assert m["rows_out"] == m["rows_in"] - 5
    kept_extra = pq.read_table(
        os.path.join(out, "shard=extra", "part.parquet"), columns=["url"]
    )
    assert kept_extra.num_rows == 0  # every injected dup dropped
    # dup index partitioned by the DUP's source file, not the keeper's
    assert os.path.isdir(os.path.join(out, "_dups", "src=extra"))
    assert not os.path.isdir(os.path.join(out, "_dups", "src=orig"))


def test_duplicate_index_is_per_source_and_fingerprinted(
    ray_session, webpages_tiny, tmp_path
):
    from hksketch.pipelines.clean_corpus import build_duplicate_index

    files = _files(webpages_tiny)
    root = str(tmp_path / "dups")
    m = build_duplicate_index(files, root, "text", "url")
    assert m["n_duplicates"] >= 0
    # every partition key is one of the input file stems
    stems = {os.path.splitext(os.path.basename(f))[0] for f in files}
    for d in os.listdir(root):
        if d.startswith("src="):
            assert d[len("src="):] in stems
    # unchanged input → reused without rebuild (manifest fingerprint)
    m2 = build_duplicate_index(files, root, "text", "url")
    assert m2 == m


def test_dup_index_src_matches_any_extension(ray_session, webpages_tiny, tmp_path):
    """Regression: dup partitions must land under _src_name(path) for ANY
    input extension, or the clean pass silently skips dedup."""
    import shutil

    import pyarrow as pa

    src = _files(webpages_tiny)[0]
    data = str(tmp_path / "data")
    os.makedirs(data)
    shutil.copy(src, os.path.join(data, "orig.pq"))  # non-.parquet name
    t = pq.read_table(src).slice(0, 3)
    t = t.set_column(
        t.schema.get_field_index("url"),
        "url",
        pa.array([f"https://zzz.example/d/{i}" for i in range(3)]),
    )
    pq.write_table(t, os.path.join(data, "extra.pq"))

    from hksketch.pipelines.clean_corpus import materialize_clean_corpus

    out = str(tmp_path / "clean")
    files = sorted(
        os.path.join(data, f) for f in os.listdir(data)
    )
    m = materialize_clean_corpus(files, out, min_tokens=0, min_alpha=0.0)
    assert m["duplicates_dropped_global"] == 3
    assert m["rows_out"] == m["rows_in"] - 3
    assert os.path.isdir(os.path.join(out, "_dups", "src=extra"))
