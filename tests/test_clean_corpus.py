"""Resumable partitioned-Parquet corpus materialization."""

import json
import os

import pyarrow.parquet as pq


def _files(d):
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def test_clean_corpus_filters_dedups_and_resumes(ray_session, webpages_tiny, tmp_path):
    from hksketch.pipelines.clean_corpus import materialize_clean_corpus

    out = str(tmp_path / "clean")
    files = _files(webpages_tiny)
    m1 = materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    assert m1["built"] == len(files) and m1["skipped"] == 0
    assert m1["rows_out"] <= m1["rows_in"]
    # output layout: one shard dir per input file, with meta
    shards = sorted(os.listdir(out))
    assert len(shards) == len(files)
    meta = json.load(open(os.path.join(out, shards[0], "_META.json")))
    assert meta["rows_in"] >= meta["rows_out"]
    total_rows = sum(
        pq.read_table(os.path.join(out, s, "part.parquet")).num_rows for s in shards
    )
    assert total_rows == m1["rows_out"]
    # resume: everything skipped
    m2 = materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    assert m2["skipped"] == len(files) and m2["built"] == 0
    # partial resume: drop one shard, only it rebuilds
    import shutil

    shutil.rmtree(os.path.join(out, shards[0]))
    m3 = materialize_clean_corpus(files, out, min_tokens=10, min_alpha=0.5)
    assert m3["built"] == 1 and m3["skipped"] == len(files) - 1
    total_rows2 = sum(
        pq.read_table(os.path.join(out, s, "part.parquet")).num_rows
        for s in sorted(os.listdir(out))
    )
    assert total_rows2 == total_rows
