"""Deterministic, seedable, vectorized 64-bit hashing.

The reference derives every per-row index from ONE hash call per key
(`/root/reference/src/hash_composition.rs:13-44`): ``h1 = hash(item)``,
``h2 = (h1 >> 32) * 0x517cc1b727220a95`` (wrapping), then for row i>0
``h1 = rotl64(h1 + h2, 5)``; the bucket index is ``h1 & (width-1)`` when
width is a power of two, else ``h1 % width``; the fingerprint is the
original ``h1``.

We reproduce that *structure* (single hash -> fingerprint + arithmetically
derived per-row indices) with a deterministic seedable hash, vectorized over
Arrow / NumPy columns.  We do NOT need ahash bit-parity (accuracy contracts
are statistical, SURVEY.md §1.2) — we DO need cross-worker determinism for a
fixed seed so per-partition sketches are merge-compatible.

Backends:

- ``polars`` (default when importable): ``Series.hash(seed)`` — Rust SIMD,
  ~35 M tokens/s/core.  Deterministic for a FIXED polars version only; a
  version-drifted cluster is caught explicitly, not silently: live merges
  check a hash probe (``MERGE_PROBE``) and checkpoints refuse resume on
  probe drift (ray_glue/checkpoint.py lineage).
- ``hk64``: self-owned splitmix64 composition over 8-byte words of each
  value, pure NumPy over the Arrow buffers.  Its bit stream is pinned by
  THIS library alone — the backend to choose when cross-version stability
  matters more than speed, and the fallback when polars is absent.
  Measured ceiling on the dev container is ~1 M tokens/s/core (NumPy
  elementwise ops run ~10-30 M elem/s there vs polars' SIMD): making it
  the DEFAULT cost 2× flagship wall time (webpages_pass 7.4 s → 15.2 s at
  sf0.1/32 cpus), so the fast backend stays default and hk64 is the
  pinned-determinism option — an explicit measured trade, see BASELINE.md.
- ``blake2b``: keyed per-element hashlib, last-resort for exotic types.
"""

from __future__ import annotations

import struct
import sys
from typing import Any

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - import guard
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False

U64 = np.uint64
_H2_MULT = U64(0x517CC1B727220A95)
_ROT = U64(5)
_INV_ROT = U64(64 - 5)


def _as_arrow_array(values: Any) -> pa.Array:
    """Normalize list / numpy / arrow / chunked input to a pyarrow Array."""
    if isinstance(values, pa.ChunkedArray):
        return values.combine_chunks()
    if isinstance(values, pa.Array):
        return values
    if isinstance(values, np.ndarray):
        return pa.array(values)
    return pa.array(list(values))


def _blake2b_u64(value: bytes, seed: int) -> int:
    import hashlib

    key = struct.pack("<Q", seed & 0xFFFFFFFFFFFFFFFF)
    return struct.unpack(
        "<Q", hashlib.blake2b(value, digest_size=8, key=key).digest()
    )[0]


HASH_FNS = ("auto", "hk64", "polars", "blake2b")

_GOLDEN = U64(0x9E3779B97F4A7C15)
_BYTE_POWERS = (U64(1) << (U64(8) * np.arange(8, dtype=np.uint64))).astype(np.uint64)


def resolve_hash_fn(fn: str) -> str:
    """'auto' → fastest available backend, hk64 when polars is absent
    (pluggable-hasher support, reference C3 `with_hasher`,
    src/heavykeeper.rs:123-131).  Version drift of the fast backend is
    caught by merge probes + checkpoint lineage, never silent."""
    if fn not in HASH_FNS:
        raise ValueError(f"unknown hash fn {fn!r}; one of {HASH_FNS}")
    if fn == "auto":
        return "polars" if _HAVE_POLARS else "hk64"
    if fn == "polars" and not _HAVE_POLARS:
        raise ValueError("polars hash backend unavailable")
    return fn


def _seed_state(seed: int, n: int, lens: np.ndarray) -> np.ndarray:
    s = splitmix64(np.array([seed & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64))[0]
    return splitmix64((s ^ _GOLDEN) ^ lens.astype(np.uint64))


def _hk64_bytes(arr: pa.Array, seed: int) -> np.ndarray:
    """Vectorized variable-length byte hash over the Arrow buffers.

    Structure (order-sensitive, fully flat — no per-row or per-round loop):
    split each value into little-endian 8-byte words (zero-padded tail),
    hash every word with its position — ``g = splitmix64(word ^
    splitmix64(pos ^ seed'))`` — XOR-combine the words of each value with
    one ``bitwise_xor.reduceat`` over the flattened word stream, and
    finalize with the value length and seed state.  A handful of NumPy
    passes over the raw byte buffer; works for string/large_string/binary/
    large_binary including slices (absolute offsets) and nulls (hashed as
    empty, matching the blake2b fallback)."""
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    odt = np.int32 if arr.type in (pa.string(), pa.binary()) else np.int64
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + n + 1]
    starts = offs[:-1].astype(np.int64)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
        lens = np.where(valid, lens, 0)
    h0 = _seed_state(seed, n, lens)
    total = int(lens.sum())
    if total == 0:
        return splitmix64(h0 ^ _GOLDEN)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    cum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
    # byte→value ownership WITHOUT np.repeat (slow for millions of tiny
    # segments): +1 markers at segment boundaries, cumsum
    owner = np.zeros(total, dtype=np.int64)
    np.add.at(owner, cum[1:-1][cum[1:-1] < total], 1)
    owner = np.cumsum(owner)
    pos_in_val = np.arange(total, dtype=np.int64) - cum[owner]
    if arr.null_count == 0 and starts[0] + total == int(offs[-1]):
        flat = data[starts[0] : starts[0] + total]  # contiguous fast path
    else:
        flat = data[starts[owner] + pos_in_val]
    # pad every value to a multiple of 8 bytes, then VIEW as uint64 words —
    # no per-byte shifts
    wpv = (lens + 7) >> 3  # words per value
    wcum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(wpv)])
    padded = np.zeros(int(wcum[-1]) * 8, dtype=np.uint8)
    padded[pos_in_val + 8 * wcum[owner]] = flat
    words = padded.view(np.uint64)
    if sys.byteorder != "little":  # pragma: no cover
        words = words.byteswap()
    nw = len(words)
    wowner = np.zeros(nw, dtype=np.int64)
    np.add.at(wowner, wcum[1:-1][wcum[1:-1] < nw], 1)
    wowner = np.cumsum(wowner)
    wpos = (np.arange(nw, dtype=np.int64) - wcum[wowner]).astype(np.uint64)
    smix = splitmix64(
        np.array([(seed ^ 0xA5A5A5A5) & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    )[0]
    g = splitmix64(words ^ splitmix64(wpos ^ smix))
    nonempty = wpv > 0
    combined = np.zeros(n, dtype=np.uint64)
    combined[nonempty] = np.bitwise_xor.reduceat(g, wcum[:-1][nonempty])
    return splitmix64(h0 ^ combined ^ _GOLDEN)


def _hk64_ints(vals: np.ndarray, seed: int, nulls: np.ndarray | None = None) -> np.ndarray:
    """Fixed-width integer keys: two splitmix64 rounds over the value and a
    seed-derived state (8-byte scalar fast path; no byte gathers)."""
    x = vals.astype(np.int64, copy=False).view(np.uint64)
    lens = np.full(len(x), 8, dtype=np.int64)
    if nulls is not None:
        lens = np.where(nulls, 0, lens)
        x = np.where(nulls, U64(0), x)
    h = _seed_state(seed, len(x), lens)
    return splitmix64(splitmix64(h ^ x) ^ _GOLDEN)


def hash_array(values: Any, seed: int, fn: str = "auto") -> np.ndarray:
    """Hash a column of keys to uint64, deterministically for a fixed seed.

    Accepts pyarrow Array/ChunkedArray, numpy arrays, or python sequences of
    str/bytes/int.  str and bytes with the same contents hash identically
    (both hash their raw bytes).  Returns a uint64 numpy array.
    """
    arr = _as_arrow_array(values)
    backend = resolve_hash_fn(fn)
    if backend == "hk64":
        t = arr.type
        if pa.types.is_string(t) or pa.types.is_large_string(t) or \
                pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return _hk64_bytes(arr, seed)
        if pa.types.is_integer(t):
            nulls = (~np.asarray(arr.is_valid())) if arr.null_count else None
            if pa.types.is_unsigned_integer(t) and t.bit_width == 64:
                # uint64 ≥ 2^63 would fail a checked int64 cast; hash the
                # 8-byte pattern directly (bit-reinterpret, no range check)
                ints = arr.fill_null(0) if arr.null_count else arr
                vals = ints.to_numpy(zero_copy_only=False).astype(np.uint64)
                return _hk64_ints(vals.view(np.int64), seed, nulls)
            ints = arr.cast(pa.int64())
            if arr.null_count:  # fill first: nulls→NaN float in to_numpy
                ints = ints.fill_null(0)
            return _hk64_ints(ints.to_numpy(zero_copy_only=False), seed, nulls)
        # other types (float/bool/…) → canonical bytes via blake2b fallback
        backend = "blake2b"
    if backend == "polars":
        s = pl.from_arrow(arr)
        if isinstance(s, pl.DataFrame):  # struct columns arrive as a frame
            s = s.to_series()
        # large_string/large_binary → fine; polars hashes value bytes.
        return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
    # Slow fallback: per-element blake2b keyed by seed.
    out = np.empty(len(arr), dtype=np.uint64)
    for i, v in enumerate(arr.to_pylist()):
        if v is None:
            out[i] = _blake2b_u64(b"", seed)
        elif isinstance(v, bytes):
            out[i] = _blake2b_u64(v, seed)
        elif isinstance(v, str):
            out[i] = _blake2b_u64(v.encode("utf-8"), seed)
        else:
            out[i] = _blake2b_u64(struct.pack("<q", int(v)), seed)
    return out


def hash_scalar(value: Any, seed: int, fn: str = "auto") -> int:
    """Hash one key; identical to ``hash_array([value], seed)[0]``."""
    return int(hash_array([value], seed, fn)[0])


def membership_mask(ids: np.ndarray, sorted_need: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``ids`` in the SORTED array ``sorted_need``
    — the broadcast-id semi-join primitive shared by MinHash candidate
    verification and LSH embedding gathering (one implementation, not
    per-module copies of the searchsorted/bounds/equality idiom)."""
    pos = np.searchsorted(sorted_need, ids)
    ok = pos < len(sorted_need)
    mask = np.zeros(len(ids), dtype=bool)
    mask[ok] = sorted_need[pos[ok]] == ids[ok]
    return mask


def rotl64(x: np.ndarray, r: np.uint64 = _ROT) -> np.ndarray:
    x = x.astype(np.uint64, copy=False)
    return (x << r) | (x >> (U64(64) - r))


def derive_row_hashes(h1: np.ndarray, depth: int) -> np.ndarray:
    """Per-row hash stream, shape (depth, n), mirroring HashComposer.

    Row 0 uses h1 itself; row i>0 uses h1 = rotl64(h1 + h2, 5) with
    h2 = (h1_orig >> 32) * 0x517cc1b727220a95 (wrapping arithmetic).
    Structure from /root/reference/src/hash_composition.rs:35-44.
    """
    h1 = h1.astype(np.uint64, copy=True)
    h2 = (h1 >> U64(32)) * _H2_MULT  # wraps like the reference
    out = np.empty((depth, len(h1)), dtype=np.uint64)
    out[0] = h1
    cur = h1
    for i in range(1, depth):
        cur = rotl64(cur + h2)
        out[i] = cur
    return out


def bucket_indices(h: np.ndarray, width: int) -> np.ndarray:
    """AND-mask fast path for power-of-two width, else modulo."""
    if width > 1 and (width & (width - 1)) == 0:
        return (h & U64(width - 1)).astype(np.int64)
    return (h % U64(width)).astype(np.int64)


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (clz(0) = 64), via a
    6-step binary search on value magnitude."""
    v = x.astype(np.uint64, copy=True)
    res = np.zeros(len(v), dtype=np.int64)
    nz = v != 0
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (U64(1) << U64(s))
        res[big] += s
        v = np.where(big, v >> U64(s), v)
    # res = floor(log2(x)) for x>0
    out = np.where(nz, 63 - res, 64)
    return out.astype(np.int64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (public domain constant schedule); used for the
    cuckoo alternate-bucket derivation (structure of
    /root/reference/src/cuckoo.rs:571-582) and for index hashing of uint64
    keys without polars."""
    x = x.astype(np.uint64, copy=True)
    x += U64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
    return x ^ (x >> U64(31))
