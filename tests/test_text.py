"""Tokenizer conformance (FIXTURES.md F2) + extraction invariant (F1)."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from hksketch.text.extract import PREFIX, SUFFIX, extract_text_column
from hksketch.text.tokenize import tokenize_column, tokenize_text

GOLDEN = [
    # (input, expected tokens)
    ("Hello, World!", ["hello", "world"]),
    ("a b c", ["a", "b", "c"]),
    ("", []),
    ("123 456", []),
    ("don't stop", ["don", "t", "stop"]),
    ("MixedCASE words", ["mixedcase", "words"]),
    ("a" * 63 + " " + "b" * 64 + " " + "c" * 65, ["a" * 63, "b" * 64]),  # 65 skipped
    ("tab\tnewline\nend", ["tab", "newline", "end"]),
    ("naïve café", ["na", "ve", "caf"]),  # non-ASCII bytes are separators
    ("x" * 64, ["x" * 64]),
    ("x" * 65, []),  # skipped entirely, not truncated
    ("A1B2C3", ["a", "b", "c"]),
]


def test_oracle_tokenizer_golden():
    for text, expected in GOLDEN:
        assert tokenize_text(text) == expected, text


def test_vectorized_matches_oracle_on_golden():
    arr = pa.array([t for t, _ in GOLDEN], type=pa.string())
    out = tokenize_column(arr).column("token").to_pylist()
    expected = [tok for _, toks in GOLDEN for tok in toks]
    assert out == expected


def test_vectorized_matches_oracle_on_fixture(webpages_tiny):
    t = pq.read_table(webpages_tiny, columns=["text"])
    texts = t.column("text").combine_chunks()
    vec = tokenize_column(texts).column("token").to_pylist()
    oracle = [tok for s in texts.to_pylist() for tok in tokenize_text(s)]
    assert vec == oracle


def test_doc_index_mapping():
    arr = pa.array(["one two", "", "three"], type=pa.string())
    t = tokenize_column(arr, with_doc_index=True)
    assert t.column("token").to_pylist() == ["one", "two", "three"]
    assert t.column("doc_idx").to_pylist() == [0, 0, 2]


def test_extract_invariant_byte_identical(webpages_tiny):
    t = pq.read_table(webpages_tiny)
    ext = extract_text_column(t.column("html"))
    assert pc.all(pc.equal(ext, t.column("text").combine_chunks())).as_py()


def test_extract_fallback_tag_strip():
    raw = [b"<p>hi</p> there", PREFIX + b"wrapped" + SUFFIX]
    out = extract_text_column(pa.array(raw, type=pa.binary())).to_pylist()
    assert out == ["hi there", "wrapped"]


def test_fixture_deterministic(webpages_tiny, tmp_path):
    from hksketch.pipelines.fixtures import generate_webpages

    d2 = generate_webpages(
        str(tmp_path / "again"), n_pages=1000, n_hosts=200, vocab_size=1000,
        seed=42, files=2,
    )
    a = pq.read_table(webpages_tiny)
    b = pq.read_table(d2)
    assert a.equals(b)
