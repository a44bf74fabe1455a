"""Shared sketch plumbing: config validation, decay tables, serialization.

Every sketch in this package follows the contracts the reference establishes
for HeavyKeeper (SURVEY.md §2.1, §7.6):

- seeded construction (`/root/reference/src/heavykeeper.rs:118-121`) with
  validated parameters (`/root/reference/src/bucketed.rs:577-585`);
- param-compat-checked associative ``merge`` incl. a seed/hasher probe
  (`/root/reference/src/bucketed.rs:373-375`);
- ``to_bytes``/``from_bytes`` (sketches travel through Ray shuffles as
  binary blobs inside ordinary Arrow rows);
- ``mem_bytes`` accounting (`/root/reference/src/heavykeeper.rs:388-403`).
"""

from __future__ import annotations

import json
import math
import struct
from typing import Any, Type

import numpy as np
import pyarrow as pa

U64_MAX = 2**64 - 1
U64_MAX_F = 18446744073709551615.0  # u64::MAX as f64 (rounds to 2^64)
DECAY_LOOKUP_SIZE = 1024
DEFAULT_SEED = 12345
MERGE_PROBE = b"hksketch-merge-compat-probe"

_MAGIC = b"HKS1"
_MAGIC_Z = b"HKSZ"

try:
    import polars as pl

    _HAVE_POLARS_BASE = True
except Exception:  # pragma: no cover
    _HAVE_POLARS_BASE = False


class SketchError(ValueError):
    """Base error for sketch construction/merge failures."""


class BuilderError(SketchError):
    """Invalid construction parameters (mirrors the reference's builder
    validation, /root/reference/src/bucketed.rs:558-597)."""


class IncompatibleSketchError(SketchError):
    """Merge between sketches with differing params/seed
    (/root/reference/src/heavykeeper.rs:407-434)."""


def validate_topk_params(k: int, width: int, depth: int, decay: float) -> None:
    if not isinstance(k, (int, np.integer)) or k < 1:
        raise BuilderError(f"k must be a positive integer, got {k!r}")
    if not isinstance(width, (int, np.integer)) or width < 1:
        raise BuilderError(f"width must be >= 1, got {width!r}")
    if not isinstance(depth, (int, np.integer)) or depth < 1:
        raise BuilderError(f"depth must be >= 1, got {depth!r}")
    if not isinstance(decay, (int, float)) or not math.isfinite(decay):
        raise BuilderError(f"decay must be finite, got {decay!r}")
    if not (0.0 <= float(decay) <= 1.0):
        raise BuilderError(f"decay must be in [0, 1], got {decay!r}")


import functools


@functools.lru_cache(maxsize=64)
def _decay_thresholds_cached(decay: float, num_entries: int) -> np.ndarray:
    out = np.empty(num_entries, dtype=np.uint64)
    for c in range(num_entries):
        v = (float(decay) ** c) * U64_MAX_F
        out[c] = min(int(v), U64_MAX) if v > 0 else 0
    out.setflags(write=False)  # shared across instances — must stay immutable
    return out


def precompute_decay_thresholds(
    decay: float, num_entries: int = DECAY_LOOKUP_SIZE
) -> np.ndarray:
    """``threshold[c] = decay^c * u64::MAX`` with saturating float→u64 cast.

    Full-u64 scaling so decay=1.0 ⇒ the roll always fires
    (/root/reference/src/heavykeeper.rs:95-104).  Memoized per (decay, n):
    the grouped-partial path constructs thousands of sketches per batch and
    the table is pure; instances share one read-only array.
    """
    return _decay_thresholds_cached(float(decay), int(num_entries))


def decay_threshold(table: np.ndarray, count: int) -> int:
    """Table lookup for count < len(table); otherwise extrapolate via
    ``last^q * table[r]`` with powf (/root/reference/src/heavykeeper.rs:356-369)."""
    n = len(table)
    if count < n:
        return int(table[count])
    last = float(table[n - 1]) / U64_MAX_F
    divisor = n - 1
    q = float(count // divisor)
    r = int(count % divisor)
    rem = float(table[r]) / U64_MAX_F
    v = (last**q) * rem * U64_MAX_F
    return min(int(v), U64_MAX)


def weighted_decay_rolls(
    rng: "np.random.Generator",
    decay_tbl: np.ndarray,
    get_cnt,
    set_cnt,
    weights: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized multi-pass weighted decay, shared by all three HeavyKeeper
    variants (the one roll-for-roll-delicate loop in the engine; keeping a
    single copy is what keeps the variants' decay semantics from drifting).

    Reference loop semantics (src/heavykeeper.rs:309-327,
    src/bucketed.rs:452-476, src/cuckoo.rs:709-731): each pass rolls once
    per key with remaining weight, decrements the occupying count on
    success, and on reaching zero the key takes the cell over with the
    REMAINING weight; every roll consumes one weight unit.  Callers
    guarantee all keys address DISTINCT cells (occurrence-round invariant)
    and that starting counts are below ``len(decay_tbl)`` (counts only
    shrink during the loop, so they stay in table range).

    ``get_cnt(idx)`` / ``set_cnt(idx, values)`` read/write the occupying
    counts for key indices ``idx``; cell takeover (fingerprint write,
    count = returned final, any promotion) is the CALLER's job after the
    loop — deferral is exact because no other key touches a taken cell.

    Returns ``(took_over mask, final count per key)``; keys whose weight
    ran out leave their cell decayed and get final 0.
    """
    nk = len(weights)
    rem = weights.astype(np.uint64, copy=True)
    active = np.ones(nk, dtype=bool)
    took = np.zeros(nk, dtype=bool)
    final = np.zeros(nk, dtype=np.uint64)
    u64max = np.uint64(U64_MAX)
    one = np.uint64(1)
    while active.any():
        ai = np.flatnonzero(active)
        cur = get_cnt(ai)
        thresholds = decay_tbl[cur]
        rolls = rng.integers(0, u64max, size=len(ai), dtype=np.uint64, endpoint=True)
        succ = rolls < thresholds
        newcnt = cur - succ.astype(np.uint64)
        set_cnt(ai, newcnt)
        zero = succ & (newcnt == 0)
        zi = ai[zero]
        if len(zi):
            final[zi] = rem[zi]
            took[zi] = True
            active[zi] = False
        live = ai[~zero]
        rem[live] -= one
        active[live] = rem[live] > 0
    return took, final


def pq_batch_update(
    pq,
    uniq: np.ndarray,
    final: np.ndarray,
    arr,
    first_idx: np.ndarray,
    min_gate_start: int,
    valid: "np.ndarray | None" = None,
) -> None:
    """Batched paper-Alg.-1 top-k register update, shared by the three
    HeavyKeeper variants: raise-only for tracked keys, min-gated insert
    otherwise (src/heavykeeper.rs:331-354, src/bucketed.rs:237-257).

    Candidates are processed in (count desc, fingerprint asc) order with
    LIVE membership checks — a key tracked at batch start but evicted by
    an earlier (larger-count) insert re-enters through the normal gate,
    exactly as in a sequential event replay.  The descending order allows
    an early stop: the PQ min only grows during the loop, so once an
    untracked candidate fails the strict > gate, every later one fails it
    too — the loop ends as soon as no batch-start-tracked candidates
    remain either.  The untracked prefilter against ``min_gate_start``
    (the min when the batch began; 0 when not full) is exact for the same
    reason.  NOTE: membership at exact count ties can differ from a
    fingerprint-ascending replay — both are deterministic resolutions of
    a tie the reference resolves by stream arrival order, which batch
    collapse already abstracts away (SURVEY deviations #2/#5).
    """
    if len(pq._map):
        tracked = np.fromiter(pq._map.keys(), dtype=np.uint64, count=len(pq._map))
        is_tracked = np.isin(uniq, tracked)
    else:
        is_tracked = np.zeros(len(uniq), dtype=bool)
    cand = final > 0
    if valid is not None:
        cand &= valid
    idxs = np.flatnonzero(cand)
    if min_gate_start:
        idxs = idxs[is_tracked[idxs] | (final[idxs] > np.uint64(min_gate_start))]
    idxs = idxs[np.lexsort((uniq[idxs], ~final[idxs]))]  # count desc, fp asc
    tracked_left = int(is_tracked[idxs].sum())
    for i in idxs:
        fp = int(uniq[i])
        count = int(final[i])
        if is_tracked[i]:
            tracked_left -= 1
        if fp in pq:
            pq.update_if_present(fp, count)
            continue
        if pq.is_full() and count <= pq.min_count():
            if tracked_left == 0:
                break
            continue
        pq.upsert(fp, arr[int(first_idx[i])].as_py(), count)


# ---------------------------------------------------------------------------
# Serialization framing
# ---------------------------------------------------------------------------

def pack_sketch(
    header: dict[str, Any],
    arrays: dict[str, np.ndarray],
    tables: dict[str, pa.Table] | None = None,
    nonzero_hints: dict[str, np.ndarray] | None = None,
) -> bytes:
    """Frame: MAGIC | u32 header_len | header json | raw array bytes |
    arrow-IPC tables.  Array dtype/shape and table byte-lengths live in the
    header so decoding needs no probing."""
    tables = tables or {}
    meta = dict(header)
    # sparse encoding: a partial sketch built from a small group slice is a
    # mostly-zero width-sized array; storing (nonzero index, value) pairs
    # makes blob bytes proportional to CONTENT, not configured width (the
    # grouped-partial long-tail requirement), while reconstructing a
    # bit-identical array — merge semantics are untouched.
    specs: dict[str, dict] = {}
    payloads: list[bytes] = []
    for name, a in arrays.items():
        spec = {"dtype": str(a.dtype), "shape": list(a.shape)}
        flat = np.ascontiguousarray(a).reshape(-1)
        if flat.size >= 1024 and flat.dtype.kind in "uif":
            hint = (nonzero_hints or {}).get(name)
            if hint is not None:
                # caller-tracked superset of nonzero slots (sorted): scan
                # only those instead of the full width — O(touched), the
                # per-group-partial fast path
                cand = np.asarray(hint, dtype=np.int64)
                nz = cand[flat[cand] != 0]
            else:
                nz = np.flatnonzero(flat)
            # break-even: u32 index + value per entry vs dense value per slot
            if len(nz) * 3 < flat.size:
                spec["sparse"] = int(len(nz))
                payloads.append(nz.astype(np.uint32).tobytes())
                payloads.append(flat[nz].tobytes())
                specs[name] = spec
                continue
        payloads.append(flat.tobytes())
        specs[name] = spec
    meta["_arrays"] = specs
    table_blobs: dict[str, bytes] = {}
    for name, t in tables.items():
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        table_blobs[name] = sink.getvalue().to_pybytes()
    meta["_tables"] = {name: len(b) for name, b in table_blobs.items()}
    hdr = json.dumps(meta, separators=(",", ":")).encode("utf-8")
    parts = [struct.pack("<I", len(hdr)), hdr]
    parts.extend(payloads)
    for name in meta["_tables"]:
        parts.append(table_blobs[name])
    # sketch arrays are sparse early in a stream; cheap zlib level-1 framing
    # shrinks partial blobs ~100x through the object store / shuffle.
    import zlib

    return _MAGIC_Z + zlib.compress(b"".join(parts), level=1)


def unpack_sketch(
    blob: bytes,
) -> tuple[dict[str, Any], dict[str, np.ndarray], dict[str, pa.Table]]:
    if blob[:4] == _MAGIC_Z:
        import zlib

        blob = zlib.decompress(blob[4:])
    elif blob[:4] == _MAGIC:
        blob = blob[4:]
    else:
        raise SketchError("not a serialized sketch (bad magic)")
    (hdr_len,) = struct.unpack("<I", blob[:4])
    off = 4 + hdr_len
    meta = json.loads(blob[4:off].decode("utf-8"))
    arrays: dict[str, np.ndarray] = {}
    for name, spec in meta.pop("_arrays").items():
        dtype = np.dtype(spec["dtype"])
        shape = tuple(spec["shape"])
        size = int(np.prod(shape)) if shape else 1
        if "sparse" in spec:
            nnz = int(spec["sparse"])
            idx = np.frombuffer(blob, dtype=np.uint32, count=nnz, offset=off)
            off += 4 * nnz
            vals = np.frombuffer(blob, dtype=dtype, count=nnz, offset=off)
            off += dtype.itemsize * nnz
            full = np.zeros(size, dtype=dtype)
            full[idx] = vals
            arrays[name] = full.reshape(shape)
        else:
            arrays[name] = (
                np.frombuffer(blob, dtype=dtype, count=size, offset=off)
                .reshape(shape)
                .copy()
            )
            off += dtype.itemsize * size
    tables: dict[str, pa.Table] = {}
    for name, nbytes in meta.pop("_tables").items():
        with pa.ipc.open_stream(pa.BufferReader(blob[off : off + nbytes])) as r:
            tables[name] = r.read_all()
        off += nbytes
    return meta, arrays, tables


def validate_weights(weights, n: int):
    """Count-sketch weights must be non-negative integers: a negative value
    would wrap to an enormous uint64 counter and a fractional one would
    silently truncate.  Returns the validated array (or None) — raises
    ``ValueError`` instead of corrupting counters."""
    if weights is None:
        return None
    w = np.asarray(weights)
    if len(w) != n:
        raise ValueError(f"weights length {len(w)} != batch length {n}")
    if w.dtype.kind == "f":
        if not np.isfinite(w).all():
            raise ValueError("weights must be finite")
        if (w < 0).any():
            raise ValueError("weights must be non-negative")
        if (w != np.floor(w)).any():
            raise ValueError("weights must be whole numbers (counts)")
    elif w.dtype.kind == "i":
        if (w < 0).any():
            raise ValueError("weights must be non-negative")
    elif w.dtype.kind != "u":
        return validate_weights(np.asarray([int(x) for x in weights]), n)
    return w


def collapse_batch(h: np.ndarray, weights) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse a hashed key column to (unique_fp, first_occurrence_idx,
    summed_weights:uint64), fingerprint-ascending.

    Fast path: a polars (Rust) groupby — ~50x faster than
    ``np.unique(return_index/return_inverse)`` on multi-million-row
    batches.  Exact integer fallback when weights are large enough to lose
    float64 precision (saturating at u64::MAX like the reference's counts).
    """
    n = len(h)
    weights = validate_weights(weights, n)
    exact_needed = weights is not None and bool(
        (np.asarray(weights, dtype=np.float64) >= 2**53).any()
    )
    # numpy unique wins below ~256k rows (measured 8.3ms vs 10.8ms at
    # 100k, flipping to 152ms vs 45ms at 1M): polars' per-call setup and
    # hash-table build only pay off once the sort becomes the bottleneck
    if _HAVE_POLARS_BASE and not exact_needed and n >= 262_144:
        df_cols = {"h": h, "i": np.arange(n, dtype=np.int64)}
        if weights is not None:
            df_cols["w"] = np.asarray(weights, dtype=np.float64)
        df = pl.DataFrame(df_cols)
        aggs = [pl.col("i").min().alias("first")]
        if weights is None:
            aggs.append(pl.len().cast(pl.Float64).alias("ws"))
        else:
            aggs.append(pl.col("w").sum().alias("ws"))
        g = df.group_by("h").agg(aggs).sort("h")
        uniq = g["h"].to_numpy().astype(np.uint64, copy=False)
        first_idx = g["first"].to_numpy()
        wsum = g["ws"].to_numpy()
        if not bool((wsum >= 2**53).any()):
            keep = wsum > 0
            return uniq[keep], first_idx[keep], wsum[keep].astype(np.uint64)
    if weights is None:
        w = np.ones(n, dtype=np.float64)
    else:
        w = np.asarray(weights, dtype=np.float64)
    uniq, first_idx, inv = np.unique(h, return_index=True, return_inverse=True)
    if not exact_needed:
        wsum = np.bincount(inv, weights=w, minlength=len(uniq))
        if not bool((wsum >= 2**53).any()):
            keep = wsum > 0
            return uniq[keep], first_idx[keep], wsum[keep].astype(np.uint64)
    # exact integer path
    totals = [0] * len(uniq)
    wl = [int(x) for x in (np.asarray(weights) if weights is not None else np.ones(n, dtype=np.int64))]
    for i, g in enumerate(inv):
        totals[g] += wl[i]
    arr = np.array([min(t, U64_MAX) for t in totals], dtype=np.uint64)
    keep = arr > 0
    return uniq[keep], first_idx[keep], arr[keep]


class SketchBuilder:
    """Fluent fallible builder (reference C4, src/heavykeeper.rs:503-578):
    ``Cls.builder().k(..).width(..).depth(..).decay(..).seed(..).build()``.
    Missing required fields raise ``BuilderError`` at build()."""

    _REQUIRED = ("k", "width", "depth", "decay")
    _OPTIONAL = {"seed": DEFAULT_SEED, "hash_fn": "auto"}

    def __init__(self, cls, extra_optional: dict | None = None):
        self._cls = cls
        self._vals: dict = {}
        self._optional = dict(self._OPTIONAL)
        if extra_optional:
            self._optional.update(extra_optional)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._REQUIRED or name in self._optional:

            def setter(value):
                self._vals[name] = value
                return self

            return setter
        raise AttributeError(f"builder has no field {name!r}")

    def build(self):
        missing = [f for f in self._REQUIRED if f not in self._vals]
        if missing:
            raise BuilderError(f"missing field(s): {', '.join(missing)}")
        kwargs = dict(self._optional)
        kwargs.update(self._vals)
        return self._cls(**kwargs)


def pq_override(pq, h: np.ndarray, out: np.ndarray) -> np.ndarray:
    """Vectorized 'PQ count wins over raw sketch reading' rule (C7): where a
    hashed key is tracked in the top-k register, replace the bucket reading
    with the tracked count."""
    if not len(pq._map):
        return out
    fps = np.fromiter(pq._map.keys(), dtype=np.uint64, count=len(pq._map))
    cnts = np.fromiter(
        (e[0] for e in pq._map.values()), dtype=np.uint64, count=len(pq._map)
    )
    order = np.argsort(fps)
    fps, cnts = fps[order], cnts[order]
    pos = np.searchsorted(fps, h)
    pos_c = np.clip(pos, 0, len(fps) - 1)
    found = fps[pos_c] == h
    out[found] = cnts[pos_c[found]]
    return out


def rng_state_to_json(rng: "np.random.Generator") -> dict:
    st = rng.bit_generator.state
    return {
        "bit_generator": st["bit_generator"],
        "state": str(st["state"]["state"]),
        "inc": str(st["state"]["inc"]),
        "has_uint32": st.get("has_uint32", 0),
        "uinteger": st.get("uinteger", 0),
    }


def rng_state_from_json(rng: "np.random.Generator", js: dict) -> None:
    rng.bit_generator.state = {
        "bit_generator": js["bit_generator"],
        "state": {"state": int(js["state"]), "inc": int(js["inc"])},
        "has_uint32": js.get("has_uint32", 0),
        "uinteger": js.get("uinteger", 0),
    }


_REGISTRY: dict[str, Type] = {}


def register_sketch(kind: str):
    def deco(cls):
        _REGISTRY[kind] = cls
        cls.KIND = kind
        return cls

    return deco


def sketch_from_bytes(blob: bytes):
    """Polymorphic deserialization for any registered sketch kind."""
    meta, arrays, tables = unpack_sketch(blob)
    cls = _REGISTRY.get(meta.get("kind", ""))
    if cls is None:
        raise SketchError(f"unknown sketch kind {meta.get('kind')!r}")
    return cls._from_parts(meta, arrays, tables)


def pq_to_table(pq) -> pa.Table:
    """TopKQueue → arrow table (fp, count, seq, item) in sorted output order."""
    entries = pq.entries()
    fps = pa.array([e[0] for e in entries], type=pa.uint64())
    counts = pa.array([e[1] for e in entries], type=pa.uint64())
    seqs = pa.array([e[2] for e in entries], type=pa.uint64())
    items = pa.array([e[3] for e in entries])
    return pa.table({"fp": fps, "count": counts, "seq": seqs, "item": items})


def pq_from_table(t: pa.Table, k: int, seq_counter: int):
    from .pq import TopKQueue

    pq = TopKQueue(k)
    fps = t.column("fp").to_pylist()
    counts = t.column("count").to_pylist()
    seqs = t.column("seq").to_pylist()
    items = t.column("item").to_pylist()
    for fp, count, seq, item in zip(fps, counts, seqs, items):
        pq._map[fp] = [count, seq, item]
        import heapq

        heapq.heappush(pq._heap, (count, seq, fp))
    pq._seq = max(seq_counter, max(seqs, default=-1) + 1)
    return pq
