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

Primary vectorized hash: polars ``Series.hash(seed)`` (seeded xxh3-style,
deterministic across processes for a fixed polars version).  Fallback:
``hashlib.blake2b`` keyed by the seed, per element (slow path, used only if
polars is unavailable).
"""

from __future__ import annotations

import struct
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


HASH_FNS = ("auto", "polars", "blake2b")


def resolve_hash_fn(fn: str) -> str:
    """'auto' → the fastest available backend (pluggable-hasher support,
    reference C3 `with_hasher`, src/heavykeeper.rs:123-131)."""
    if fn not in HASH_FNS:
        raise ValueError(f"unknown hash fn {fn!r}; one of {HASH_FNS}")
    if fn == "auto":
        return "polars" if _HAVE_POLARS else "blake2b"
    if fn == "polars" and not _HAVE_POLARS:
        raise ValueError("polars hash backend unavailable")
    return fn


def hash_array(values: Any, seed: int, fn: str = "auto") -> np.ndarray:
    """Hash a column of keys to uint64, deterministically for a fixed seed.

    Accepts pyarrow Array/ChunkedArray, numpy arrays, or python sequences of
    str/bytes/int.  str and bytes with the same contents hash identically
    (polars hashes both as raw bytes).  Returns a uint64 numpy array.
    """
    arr = _as_arrow_array(values)
    if resolve_hash_fn(fn) == "polars":
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
