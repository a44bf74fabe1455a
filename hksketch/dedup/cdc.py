"""Content-defined chunking (CDC) dedup — Gear-hash chunk boundaries +
chunk-digest duplicate statistics.

The storage-systems member of the dedup family (LBFS/Gear/FastCDC
lineage: Xia et al., "FastCDC", USENIX ATC'16): chunk boundaries are a
pure function of local CONTENT, so inserting or deleting bytes shifts
only the chunks that actually changed — the robustness fixed-offset
blocks lack, and the reason CDC finds shared passages between revisions
of a page where offset-based comparison finds nothing.  Complements the
token-window operators (``dedup/spans.py``): spans dedup exact w-token
windows; CDC dedups variable-size byte regions at configurable
granularity with one row per CHUNK (≈ bytes/2^bits), far fewer than one
row per token.

Pipeline shape (the house dedup discipline):

1. Chunking is embarrassingly parallel per document.  The Gear rolling
   hash ``h_i = (h_{i-1} << 1) + gear[b_i]`` telescopes to
   ``h_i = Σ_{j=0..63} gear[b_{i-j}] << j  (mod 2^64)`` — a 64-tap
   shift-convolution computed as 64 VECTORIZED numpy passes over the
   batch's concatenated bytes (no per-byte Python), exact vs the scalar
   recurrence (tested).  Boundary candidates ``(h & mask) == 0`` are a
   position property independent of chunk starts, so min/max chunk-size
   enforcement is a short walk over the SPARSE candidate list
   (~1/2^bits of positions), not the bytes.
2. Each chunk gets a 16-byte BLAKE2b digest; dedup compares digests
   only (2^-64 collision odds at 10^12 chunks — documented trade vs the
   spans operator, which ships the window string to make collisions
   impossible).  Chunk BYTES never leave the chunking stage.
3. One digest-sharded shuffle; per-shard vectorized run-scans count
   global digest multiplicity and fold per-(doc, shard) partials; a
   final small ``groupby(doc_id).sum`` emits per-doc
   ``(n_chunks, n_dup_chunks, n_bytes, dup_bytes, dup_byte_frac)``.

Not SQL-expressible (the rolling hash is a byte-level recurrence), so
the driver query is rows-only; ``tests/test_cdc.py`` pins the
vectorized-vs-scalar kernel equality, boundary determinism, min/max
bounds, insertion-shift robustness, and a full local recompute of the
stats.

Reference scope note: the reference engine has no chunking; this module
extends the LLM-data-pipeline surface like the rest of ``dedup/``.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64

U64 = np.uint64

DEFAULT_SEED = 12345


def gear_table(seed: int = DEFAULT_SEED) -> np.ndarray:
    """256-entry uint64 gear table, deterministic in ``seed``."""
    return splitmix64(
        np.arange(256, dtype=np.uint64) + (U64(seed) << U64(32))
    )


def gear_hashes(data: np.ndarray, gear: np.ndarray) -> np.ndarray:
    """Vectorized rolling Gear hash over a uint8 array: position ``i``
    holds ``Σ_{j=0..min(i,63)} gear[data[i-j]] << j  (mod 2^64)`` —
    identical to iterating ``h = (h << 1) + gear[b]`` from the start of
    ``data`` (shifts ≥ 64 vanish)."""
    g = gear[data]
    h = g.copy()
    n = len(g)
    for j in range(1, min(64, n)):
        h[j:] += g[: n - j] << U64(j)
    return h


def _chunk_ends(
    cand: np.ndarray, n: int, min_len: int, max_len: int
) -> np.ndarray:
    """Chunk END offsets (exclusive) for one document from the sorted
    candidate boundary positions (inclusive byte index of each hash
    hit): standard greedy walk — each chunk ends at the first candidate
    giving length in [min_len, max_len], else is cut hard at max_len;
    a remainder shorter than min_len becomes the final chunk as-is."""
    ends: List[int] = []
    start = 0
    m = len(cand)
    while start < n:
        rem = n - start
        if rem <= min_len:
            ends.append(n)
            break
        k = int(np.searchsorted(cand, start + min_len - 1, side="left"))
        limit = start + min(rem, max_len)
        if k < m and cand[k] < limit:
            end = int(cand[k]) + 1
        else:
            end = limit
        ends.append(end)
        start = end
    return np.asarray(ends, dtype=np.int64)


def chunk_document(
    data: bytes,
    gear: np.ndarray,
    bits: int = 10,
    min_len: int = 256,
    max_len: int = 4096,
) -> np.ndarray:
    """Chunk end-offsets for one document (the scalar-callable unit the
    tests drive; the batch stage below inlines the same steps)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64)
    mask = U64((1 << bits) - 1)
    h = gear_hashes(arr, gear)
    cand = np.flatnonzero((h & mask) == 0)
    return _chunk_ends(cand, len(arr), min_len, max_len)


def chunk_digests_local(
    data: bytes,
    gear: np.ndarray,
    bits: int = 10,
    min_len: int = 256,
    max_len: int = 4096,
) -> List[Tuple[bytes, int]]:
    """(digest, length) per chunk — the local reference used by both the
    distributed stage and the recompute tests."""
    ends = chunk_document(data, gear, bits, min_len, max_len)
    out: List[Tuple[bytes, int]] = []
    start = 0
    for e in ends:
        e = int(e)
        out.append(
            (hashlib.blake2b(data[start:e], digest_size=16).digest(),
             e - start)
        )
        start = e
    return out


_ROWS_EMPTY = pa.table(
    {"shard": pa.array([], type=pa.int32()),
     "digest": pa.array([], type=pa.large_binary()),
     "doc_id": pa.array([], type=pa.int64()),
     "nbytes": pa.array([], type=pa.int64())}
)


def cdc_dup_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 10,
    min_len: int = 256,
    max_len: int = 4096,
    seed: int = DEFAULT_SEED,
    shards: int | str = "auto",
):
    """Per-document CDC duplicate-byte statistics: for every document,
    how many of its content-defined chunks (and bytes) belong to chunks
    whose digest occurs ≥ 2 times corpus-wide (multiplicity counted,
    including within-document repeats — the ``duplicated_span_stats``
    convention at chunk granularity).

    Returns a Dataset of ``(doc_id, n_chunks, n_dup_chunks, n_bytes,
    dup_bytes, dup_byte_frac)`` over documents with ≥ 1 byte of text.
    """
    import polars as pl

    from ..ray_glue.partitioning import auto_shards, estimate_rows

    if bits < 1 or min_len < 1 or max_len < min_len:
        raise ValueError(
            f"invalid CDC config: bits={bits} min_len={min_len} "
            f"max_len={max_len}"
        )
    if shards == "auto":
        est = estimate_rows(ds)
        # ~bytes/2^bits chunk rows per doc — far fewer than tokens; size
        # shards from the doc estimate with a per-doc chunk-count factor
        shards = auto_shards(
            ds,
            target_rows_per_shard=2_000_000,
            min_shards=64,
            rows_hint=None if est is None else est * 8,
        )
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    gear = gear_table(seed)
    mask = U64((1 << bits) - 1)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        texts = batch.column(text_col).combine_chunks()
        # ONE concatenated uint8 view of the whole batch (Arrow's own
        # value buffer, zero-copy) + per-doc offsets; the 64-tap kernel
        # runs once over the batch, then per-doc candidate slices are
        # cheap index arithmetic
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lb = texts.cast(pa.large_binary())
        if lb.buffers()[2] is None or len(lb) == 0:
            return _ROWS_EMPTY
        obuf = np.frombuffer(lb.buffers()[1], dtype=np.int64)
        offs = obuf[lb.offset: lb.offset + len(lb) + 1]
        buf = np.frombuffer(lb.buffers()[2], dtype=np.uint8)[
            offs[0]: offs[-1]
        ]
        offs = offs - offs[0]
        if len(buf) == 0:
            return _ROWS_EMPTY
        h = gear_hashes(buf, gear)
        # reset the 64-byte warmup across doc boundaries? No: the
        # telescoped hash at position i mixes bytes i-63..i of the
        # CONCATENATED buffer, so the first 63 bytes of a doc would see
        # the previous doc's tail.  Hash each doc's region independently
        # by recomputing the first 63 positions per doc:
        doc_starts = offs[:-1]
        for s in doc_starts[1:]:
            s = int(s)
            head = buf[s: min(s + 63, len(buf))]
            if len(head):
                h[s: s + len(head)] = gear_hashes(head, gear)
        cand_all = np.flatnonzero((h & mask) == 0)
        digests: List[bytes] = []
        doc_out: List[int] = []
        nb_out: List[int] = []
        mv = memoryview(buf)
        for d in range(len(ids)):
            s, e = int(offs[d]), int(offs[d + 1])
            if e == s:
                continue
            lo = np.searchsorted(cand_all, s, side="left")
            hi = np.searchsorted(cand_all, e - 1, side="right")
            ends = _chunk_ends(cand_all[lo:hi] - s, e - s, min_len, max_len)
            start = 0
            for en in ends:
                en = int(en)
                digests.append(
                    hashlib.blake2b(
                        mv[s + start: s + en], digest_size=16
                    ).digest()
                )
                doc_out.append(ids[d])
                nb_out.append(en - start)
                start = en
        if not digests:
            return _ROWS_EMPTY
        head8 = np.frombuffer(
            b"".join(dg[:8] for dg in digests), dtype="<u8"
        )
        return pa.table(
            {"shard": pa.array(
                (head8 & U64(shards - 1)).astype(np.int32)),
             "digest": pa.array(digests, type=pa.large_binary()),
             "doc_id": pa.array(doc_out, type=pa.int64()),
             "nbytes": pa.array(nb_out, type=pa.int64())}
        )

    rows = ds.map_batches(chunk_rows, batch_format="pyarrow", zero_copy_batch=True)

    def shard_stats(grp) -> pa.Table:
        out_empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "n_part": pa.array([], type=pa.int64()),
             "dup_part": pa.array([], type=pa.int64()),
             "b_part": pa.array([], type=pa.int64()),
             "db_part": pa.array([], type=pa.int64())}
        )
        if not len(grp):
            return out_empty
        df = pl.from_pandas(grp[["digest", "doc_id", "nbytes"]]).sort(
            "digest"
        )
        doc = df["doc_id"].to_numpy()
        nb = df["nbytes"].to_numpy()
        d_new = (df["digest"] != df["digest"].shift(1)).fill_null(
            True
        ).to_numpy()
        run_id = np.cumsum(d_new) - 1
        run_len = np.bincount(run_id)
        dup = run_len[run_id] >= 2
        order2 = np.argsort(doc, kind="stable")
        doc, dup, nb = doc[order2], dup[order2], nb[order2]
        starts = np.flatnonzero(
            np.concatenate(([True], doc[1:] != doc[:-1]))
        )
        n_part = np.diff(np.concatenate((starts, [len(doc)])))
        dup_part = np.add.reduceat(dup.astype(np.int64), starts)
        b_part = np.add.reduceat(nb.astype(np.int64), starts)
        db_part = np.add.reduceat(
            np.where(dup, nb, 0).astype(np.int64), starts
        )
        return pa.table(
            {"doc_id": pa.array(doc[starts], type=pa.int64()),
             "n_part": pa.array(n_part, type=pa.int64()),
             "dup_part": pa.array(dup_part, type=pa.int64()),
             "b_part": pa.array(b_part, type=pa.int64()),
             "db_part": pa.array(db_part, type=pa.int64())}
        )

    partials = rows.groupby("shard").map_groups(
        shard_stats, batch_format="pandas"
    )

    from ray.data.aggregate import Sum

    per_doc = partials.groupby("doc_id").aggregate(
        Sum("n_part", alias_name="n_chunks"),
        Sum("dup_part", alias_name="n_dup_chunks"),
        Sum("b_part", alias_name="n_bytes"),
        Sum("db_part", alias_name="dup_bytes"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("n_bytes").to_numpy().astype(np.float64)
        db = batch.column("dup_bytes").to_numpy().astype(np.float64)
        return batch.append_column(
            "dup_byte_frac", pa.array(db / b, type=pa.float64())
        )

    return per_doc.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )
