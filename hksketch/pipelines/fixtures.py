"""Deterministic synthetic fixtures (FIXTURES.md).

All generators are pure functions of ``(seed, scale)``; no wall clock, no
external data.  The ``webpages`` table mirrors BASELINE.json's
``input_hint`` schema: ``url: string, warc_ts: timestamp[us], html: binary,
text: string, lang: string``; hostname and token frequencies are Zipf(s=1.2)
so the reference's accuracy gates apply (cf. the seeded Zipf streams of
`/root/reference/tests/accuracy_compare.rs:29-41`).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..text.extract import PREFIX, SUFFIX

EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_ASCII = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def make_vocab(size: int, seed: int = 42) -> list[str]:
    """Deterministic ASCII-alphabetic vocabulary, lengths 1..64, ~20% of
    words carrying mixed case to exercise lowercasing (FIXTURES.md F1)."""
    rng = np.random.default_rng(seed)
    words = []
    for _ in range(size):
        # mostly short words, a tail of 1..64-byte lengths (incl. 63/64 edges)
        L = int(rng.integers(2, 12)) if rng.random() < 0.8 else int(rng.integers(1, 65))
        w = "".join(_ASCII[rng.integers(0, 26, size=L)])
        if rng.random() < 0.2:  # mixed-case variant exercises lowercasing
            w = "".join(c.upper() if rng.random() < 0.3 else c for c in w)
        words.append(w)
    return words


def _zipf_bounded(rng: np.random.Generator, s: float, n: int, size: int) -> np.ndarray:
    """Zipf(s) samples truncated to [1, n] by rejection-free clipping via
    re-draw modulo (deterministic; distributional fidelity is what matters)."""
    x = rng.zipf(s, size=size)
    over = x > n
    while over.any():
        x[over] = rng.zipf(s, size=int(over.sum()))
        over = x > n
    return x


def generate_webpages(
    out_dir: str,
    n_pages: int = 20_000,
    n_hosts: int = 2_000,
    vocab_size: int = 5_000,
    seed: int = 42,
    files: int = 4,
    zipf_s: float = 1.2,
) -> str:
    """Write the webpages fixture as ``files`` parquet files under out_dir.

    Deterministic for fixed (seed, sizes). Returns out_dir.
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(
        out_dir, f"_done_{n_pages}_{n_hosts}_{vocab_size}_{seed}_{files}"
    )
    if os.path.exists(marker):
        return out_dir
    # A DIFFERENT param set was generated here before: writing now would
    # only overwrite the first ``files`` part files and leave the rest
    # stale, silently mixing two fixtures — clear every previous output
    # (and its marker) first.
    stale = [
        f
        for f in os.listdir(out_dir)
        if f.startswith("_done_") or (f.startswith("part-") and f.endswith(".parquet"))
    ]
    for f in stale:
        os.remove(os.path.join(out_dir, f))
    rng = np.random.default_rng(seed)
    vocab = np.array(make_vocab(vocab_size, seed), dtype=object)

    host_ids = _zipf_bounded(rng, zipf_s, n_hosts, n_pages) - 1
    path_counter: dict[int, int] = {}
    n_words = rng.integers(50, 201, size=n_pages)
    total_words = int(n_words.sum())
    word_ids = _zipf_bounded(rng, zipf_s, vocab_size, total_words) - 1
    langs = np.where(
        rng.random(n_pages) < 0.95,
        "en",
        np.where(rng.random(n_pages) < 0.5, "de", "fr"),
    )

    offs = np.concatenate([[0], np.cumsum(n_words)])
    try:  # vectorized assembly (polars): ~20x faster for large fixtures
        import polars as pl

        page_of_word = np.repeat(np.arange(n_pages, dtype=np.int64), n_words)
        words = pl.Series("w", vocab.tolist(), dtype=pl.String).gather(word_ids)
        texts = (
            pl.DataFrame({"p": page_of_word, "w": words})
            .group_by("p", maintain_order=True)
            .agg(pl.col("w").str.join(" ").alias("t"))["t"]
            .to_list()
        )
        # per-host deterministic path counter
        order = np.argsort(host_ids, kind="stable")
        seq = np.empty(n_pages, dtype=np.int64)
        sh = host_ids[order]
        run = np.arange(n_pages) - np.maximum.accumulate(
            np.where(np.r_[True, sh[1:] != sh[:-1]], np.arange(n_pages), 0)
        )
        seq[order] = run
        urls = [
            f"https://host{int(h)}.example/p/{int(c)}"
            for h, c in zip(host_ids, seq)
        ]
    except Exception:
        urls, texts = [], []
        for i in range(n_pages):
            h = int(host_ids[i])
            c = path_counter.get(h, 0)
            path_counter[h] = c + 1
            urls.append(f"https://host{h}.example/p/{c}")
            texts.append(" ".join(vocab[word_ids[offs[i] : offs[i + 1]]]))

    htmls = [PREFIX + t.encode() + SUFFIX for t in texts]
    ts = (EPOCH_US + np.arange(n_pages, dtype=np.int64) * 1_000_000).astype(
        "datetime64[us]"
    )
    table = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )
    per = (n_pages + files - 1) // files
    for f in range(files):
        chunk = table.slice(f * per, per)
        if len(chunk):
            pq.write_table(
                chunk, os.path.join(out_dir, f"part-{f:04d}.parquet"),
                row_group_size=max(1024, per // 4),
            )
    open(marker, "w").close()
    return out_dir


def generate_zipf_keys(
    out_path: str, n: int, universe: int, s: float, seed: int
) -> str:
    """F3 sketch-accuracy fixture: columns key:uint64, weight:uint64."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if os.path.exists(out_path):
        return out_path
    rng = np.random.default_rng(seed)
    keys = _zipf_bounded(rng, s, universe, n).astype(np.uint64)
    t = pa.table(
        {
            "key": pa.array(keys, type=pa.uint64()),
            "weight": pa.array(np.ones(n, dtype=np.uint64), type=pa.uint64()),
        }
    )
    pq.write_table(t, out_path)
    return out_path


def generate_flows(out_path: str, n: int = 1_000_000, distinct: int = 50_000, seed: int = 42) -> str:
    """F4 binary-key fixture: 13-byte flow keys (src_ip(4) src_port(2)
    dst_ip(4) dst_port(2) proto(1)), power-law multiplicities (alpha=2.0,
    mirroring /root/reference/data/generate.py:6-29)."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if os.path.exists(out_path):
        return out_path
    rng = np.random.default_rng(seed)
    uniq = rng.integers(0, 256, size=(distinct, 13), dtype=np.uint8)
    uniq[:, 12] = np.where(rng.random(distinct) < 0.5, 6, 17)
    ids = _zipf_bounded(rng, 2.0, distinct, n) - 1
    recs = uniq[ids]
    flows = [recs[i].tobytes() for i in range(n)]
    t = pa.table({"flow": pa.array(flows, type=pa.binary())})
    pq.write_table(t, out_path)
    return out_path
