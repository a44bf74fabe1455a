"""Text analysis: language ID, quality scores, fingerprints."""

import numpy as np
import pyarrow as pa

from hksketch.text.analysis import (
    doc_fingerprints_batch,
    lang_id_batch,
    quality_scores_batch,
)


def test_lang_id_heuristic():
    texts = pa.array(
        [
            "the cat sat on the mat and it was happy with that",
            "der hund ist nicht in das haus und ich bin mit den kindern",
            "le chat est dans la maison et les enfants sont pour le jardin",
            "el perro es un animal y la casa es para los gatos del pueblo",
            "这是一个中文句子用来测试语言识别",
            "xyzzy plugh qwerty",
        ],
        type=pa.string(),
    )
    out = lang_id_batch(texts).to_pylist()
    assert out == ["en", "de", "fr", "es", "zh", "und"]


def test_quality_scores():
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3], type=pa.int64()),
         "text": pa.array(["abc 123!", "", "x" * 70 + " ok"], type=pa.string())}
    )
    out = quality_scores_batch(t, "text", "doc_id")
    assert out.column("char_len").to_pylist() == [8, 0, 73]
    # "abc" yes; "123" no; 70-byte run skipped? no — 70 ≤ 64 is false → skipped
    assert out.column("n_tokens").to_pylist() == [1, 0, 1]
    assert out.column("alpha_ratio").to_pylist()[0] == 3 / 8
    assert out.column("digit_ratio").to_pylist()[0] == 3 / 8
    assert out.column("alpha_ratio").to_pylist()[1] == 0.0


def test_doc_fingerprints_order_sensitive_and_deterministic():
    a = pa.array(["alpha beta gamma", "beta alpha gamma", "alpha beta gamma"],
                 type=pa.string())
    fps = doc_fingerprints_batch(a)
    assert fps[0] == fps[2]  # identical text → identical fingerprint
    assert fps[0] != fps[1]  # order matters (rolling hash)
    again = doc_fingerprints_batch(a)
    assert np.array_equal(fps, again)


def test_lang_id_vectorized_matches_reference():
    """The polars is_in/count_matches path must be behavior-identical to
    the per-row Python reference on real corpus text (incl. empties)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hksketch.text.analysis import _lang_id_batch_reference, lang_id_batch

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    texts = pa.concat_arrays(
        [t.column("text").combine_chunks(), pa.array(["", "一二三四五六", "der die und das ist"])]
    )
    assert lang_id_batch(texts).to_pylist() == _lang_id_batch_reference(texts).to_pylist()


def test_ascii_class_counts_trailing_empty_docs():
    """Regression: a batch ending in empty docs must not drop the previous
    doc's final byte (the clipped-reduceat bug)."""
    import numpy as np
    import polars as pl
    import pyarrow as pa

    from hksketch.text.analysis import _ascii_class_counts, quality_scores_batch

    for texts in (["abcde", ""], ["", "", ""], ["a1", ""],
                  ["", "abc", "", "d9", ""], ["é", ""]):
        arr = pa.array(texts, type=pa.string())
        a, d = _ascii_class_counts(arr)
        s = pl.Series(texts)
        assert (a == s.str.count_matches("[A-Za-z]").to_numpy()).all()
        assert (d == s.str.count_matches("[0-9]").to_numpy()).all()
    b = pa.table({"doc_id": pa.array([1, 2]), "text": pa.array(["abcde", ""])})
    q = quality_scores_batch(b, "text", "doc_id")
    assert q.column("alpha_ratio").to_pylist() == [1.0, 0.0]
