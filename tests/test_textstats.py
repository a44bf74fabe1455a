"""Edge cases for type_token_ratio and zipf_slope (constructed docs vs
the generated oracle SQL — null/empty text, >64-byte tokens, rank ties)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_ttr_edge_cases_match_duckdb(ray_session, tmp_path):
    import __ray_entry__ as e

    long_tok = "x" * 65  # dropped by the 64-byte filter on both sides
    rows = [
        {"doc_id": 1, "text": "The the THE cat"},          # 4 tokens, 2 types
        {"doc_id": 2, "text": ""},                          # empty
        {"doc_id": 3, "text": None},                        # null text
        {"doc_id": 4, "text": f"{long_tok} ok"},            # long token dropped
        {"doc_id": 5, "text": "1234 !!"},                   # no alpha runs
        {"doc_id": 6, "text": "a b c a2b"},                 # a2b → 'a','b' runs
    ]
    d = _write_docs(tmp_path, rows)
    got = e.queries()["type_token_ratio"](d).to_pandas()
    con = duckdb.connect()
    con.register("documents", pa.Table.from_pylist(rows))
    want = con.sql(e.oracle_sql()["type_token_ratio"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )
    by_id = {r.doc_id: r for r in got.itertuples()}
    assert by_id[1].n_tokens == 4 and by_id[1].n_types == 2
    assert by_id[2].n_tokens == 0 and pd.isna(by_id[2].ttr_milli)
    assert by_id[4].n_tokens == 1  # the 65-byte token is gone entirely
    assert by_id[6].n_tokens == 5 and by_id[6].n_types == 3


def test_zipf_slope_matches_duckdb_and_known_value(ray_session, tmp_path):
    import __ray_entry__ as e

    # construct an exact-Zipf corpus: token_i appears ceil(100/i) times →
    # slope of ln(freq) vs ln(rank) ≈ −1 (ties broken identically on
    # both sides by token asc)
    words = []
    for i in range(1, 21):
        words += [f"tok{chr(ord('a') + i - 1)}"] * (100 // i)
    rows = [{"doc_id": 1, "text": " ".join(words)}]
    d = _write_docs(tmp_path, rows)
    got = e.queries()["zipf_slope"](d).to_pandas()
    con = duckdb.connect()
    con.register("documents", pa.Table.from_pylist(rows))
    want = con.sql(e.oracle_sql()["zipf_slope"]).df()
    assert got["n_terms"].iloc[0] == want["n_terms"].iloc[0] == 20
    assert int(got["slope_milli"].iloc[0]) == int(want["slope_milli"].iloc[0])
    assert -1100 <= got["slope_milli"].iloc[0] <= -900


def test_zipf_slope_degenerate_single_term(ray_session, tmp_path):
    import __ray_entry__ as e

    rows = [{"doc_id": 1, "text": "same same same"}]
    d = _write_docs(tmp_path, rows)
    got = e.queries()["zipf_slope"](d).to_pandas()
    assert got["n_terms"].iloc[0] == 1
    assert pd.isna(got["slope_milli"].iloc[0])


def test_compression_ratio_determinism_and_known_values(ray_session, tmp_path):
    import zlib

    import __ray_entry__ as e

    rows = [
        {"doc_id": 1, "text": "aaaa" * 500},       # highly compressible
        {"doc_id": 2, "text": None},                # null → empty
        {"doc_id": 3, "text": ""},                  # empty
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog"},
    ]
    d = _write_docs(tmp_path, rows)
    a = e.queries()["compression_ratio"](d).to_pandas()
    b = e.queries()["compression_ratio"](d).to_pandas()
    assert a.equals(b)  # deterministic
    by = {r.doc_id: r for r in a.itertuples()}
    raw1 = ("aaaa" * 500).encode()
    c1 = len(zlib.compress(raw1, level=6))
    assert by[1].raw_len == len(raw1)
    assert by[1].compressed_len == c1
    assert by[1].ratio_milli == (1000 * c1 + len(raw1) // 2) // len(raw1)
    assert by[1].ratio_milli < 100        # repetitive text compresses hard
    assert by[4].ratio_milli > 500        # short natural text barely does
    for empty_id in (2, 3):
        assert by[empty_id].raw_len == 0
        assert pd.isna(by[empty_id].ratio_milli)
