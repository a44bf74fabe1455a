"""Canonical HeavyKeeper ``TopK`` — depth rows × width buckets.

Semantics from the reference's ``TopK`` (`/root/reference/src/heavykeeper.rs`):
one hash per key, per-row indices derived arithmetically from it
(`src/hash_composition.rs:35-44`); per row — fingerprint match OR empty
bucket → take/keep the bucket and ``count += increment``
(`src/heavykeeper.rs:303-307`); otherwise a probabilistic decay loop over the
occupying count with takeover on zero (`src/heavykeeper.rs:309-327`).  The
tracked max count across rows feeds the top-k register (max-only, min-gated,
`src/heavykeeper.rs:331-354`).  ``count`` reads the PQ first, else the MIN
over rows with a matching fingerprint (`src/heavykeeper.rs:220-246`).
``merge`` is elementwise: same fp → sum; self empty → copy; else keep self;
PQs merged by per-item count sum (`src/heavykeeper.rs:406-457`).

Batch-vectorized like BucketedTopK: unique fingerprints with summed weights,
NumPy fast paths per row incl. multi-pass vectorized weighted decay;
intra-batch same-bucket conflicts serialize via occurrence rounds;
fingerprint-ascending deterministic order.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..hashing import (
    _as_arrow_array,
    bucket_indices,
    derive_row_hashes,
    hash_array,
    hash_scalar,
)
from .base import (
    DEFAULT_SEED,
    collapse_batch,
    MERGE_PROBE,
    U64_MAX,
    IncompatibleSketchError,
    decay_threshold,
    pack_sketch,
    pq_from_table,
    pq_to_table,
    precompute_decay_thresholds,
    register_sketch,
    pq_override,
    rng_state_from_json,
    rng_state_to_json,
    pq_batch_update,
    unpack_sketch,
    validate_topk_params,
    weighted_decay_rolls,
)
from .pq import TopKQueue

U64 = np.uint64
# weighted decays up to this weight run through the vectorized multi-pass
# roll loop (pass count = max weight in the round); heavier weights are
# rare (they mostly hit the match fast path) and stay scalar
_W_CAP = U64(64)


@register_sketch("topk")
class TopK:
    """Canonical HeavyKeeper top-k sketch (depth independent rows)."""

    def __init__(
        self,
        k: int,
        width: int,
        depth: int,
        decay: float,
        seed: int = DEFAULT_SEED,
        hash_fn: str = "auto",
    ):
        validate_topk_params(k, width, depth, decay)
        from ..hashing import resolve_hash_fn

        self.k = int(k)
        self.width = int(width)
        self.depth = int(depth)
        self.decay = float(decay)
        self.seed = int(seed)
        self.hash_fn = resolve_hash_fn(hash_fn)
        self.fp = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.cnt = np.zeros((self.depth, self.width), dtype=np.uint64)
        self.decay_tbl = precompute_decay_thresholds(self.decay)
        self.rng = np.random.default_rng(self.seed)
        self.pq = TopKQueue(self.k)

    def add(self, item: Any, increment: int = 1) -> None:
        self.add_batch([item], np.array([increment], dtype=np.uint64))

    def add_batch(self, items: Any, weights: Any | None = None) -> None:
        arr = _as_arrow_array(items)
        n = len(arr)
        if n == 0:
            return
        h = hash_array(arr, self.seed, self.hash_fn)
        uniq, first_idx, wsum = collapse_batch(h, weights)
        if len(uniq) == 0:
            return

        m = len(uniq)
        d = self.depth
        row_h = derive_row_hashes(uniq, d)  # (depth, m)

        # ALL depth rows stacked into ONE occurrence-round loop: stacked
        # entry s = r·m + i addresses flat cell r·width + bucket(r, i) —
        # cells never collide across rows, so a single argsort + run scan
        # serializes every same-cell conflict while each round's vector
        # ops cover all rows at once (the per-row loop paid depth× the
        # Python round overhead and depth× the RNG calls for the same
        # arithmetic; measured ~1.5x on the 1M-key Zipf microbench)
        idx2 = np.empty((d, m), dtype=np.int64)
        for r in range(d):
            idx2[r] = bucket_indices(row_h[r], self.width)
        flat_idx = (
            np.arange(d, dtype=np.int64)[:, None] * self.width + idx2
        ).ravel()  # (d·m,) row-major: s = r·m + i
        fpf = self.fp.reshape(-1)  # views share memory with fp/cnt
        cntf = self.cnt.reshape(-1)
        # each stacked entry is processed exactly once across all rounds;
        # its final bucket count lands here and the per-key max over rows
        # reduces at the end (a fancy-indexed running max would silently
        # drop duplicates of a key across rows within one round)
        cand_count = np.zeros(d * m, dtype=np.uint64)

        order = np.argsort(flat_idx, kind="stable")
        si = flat_idx[order]
        run_starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
        run_sizes = np.diff(np.concatenate((run_starts, [d * m])))
        max_rounds = int(run_sizes.max()) if m else 0
        for rnd in range(max_rounds):
            live = run_sizes > rnd
            sel = order[run_starts[live] + rnd]
            sel.sort()  # row-major then fingerprint-ascending order
            if len(sel) == 0:
                break
            km = sel % m  # key index of each stacked entry
            if len(sel) < 48:
                for s, i in zip(sel, km):
                    r = int(s // m)
                    c = self._add_one_row(
                        r, int(row_h[r, i]), int(uniq[i]), int(wsum[i])
                    )
                    if c is not None:
                        cand_count[s] = c
                continue
            cells = flat_idx[sel]
            bfp = fpf[cells]
            bcnt = cntf[cells]
            matches = bfp == uniq[km]  # fp match (src/heavykeeper.rs:303)
            empty = bcnt == 0
            fast = matches | empty
            if fast.any():
                cc = cells[fast]
                old = cntf[cc]
                new = old + wsum[km[fast]]
                new = np.where(new < old, U64(U64_MAX), new)
                fpf[cc] = uniq[km[fast]]
                cntf[cc] = new
                cand_count[sel[fast]] = new
            needs_decay = ~fast
            fi = np.flatnonzero(needs_decay & (wsum[km] <= _W_CAP))
            if len(fi):
                small = bcnt[fi] < len(self.decay_tbl)
                fi = fi[small]
            if len(fi):
                fcells = cells[fi]
                taken, final_cnt = weighted_decay_rolls(
                    self.rng,
                    self.decay_tbl,
                    lambda ai, _fc=fcells: cntf[_fc[ai]],
                    lambda ai, v, _fc=fcells: cntf.__setitem__(_fc[ai], v),
                    wsum[km[fi]],
                )
                ti = fi[taken]
                if len(ti):
                    fpf[cells[ti]] = uniq[km[ti]]
                    cntf[cells[ti]] = final_cnt[taken]
                    cand_count[sel[ti]] = final_cnt[taken]
            handled = np.zeros(len(sel), dtype=bool)
            handled[fi] = True
            for s, i in zip(
                sel[needs_decay & ~handled], km[needs_decay & ~handled]
            ):
                r = int(s // m)
                c = self._add_one_row(
                    r, int(row_h[r, i]), int(uniq[i]), int(wsum[i])
                )
                if c is not None:
                    cand_count[s] = c

        max_count = cand_count.reshape(d, m).max(axis=0)
        self._update_pq(uniq, max_count, arr, first_idx)

    def _add_one_row(self, r: int, rh: int, fp: int, increment: int) -> int | None:
        """Scalar per-row update incl. the decay loop
        (src/heavykeeper.rs:294-328)."""
        # pure-int bucket derivation (same math as hashing.bucket_indices):
        # this fallback runs thousands of times per adversarial batch, and
        # a per-call 1-element ndarray dominated its profile
        w = self.width
        b = (rh & (w - 1)) if (w & (w - 1)) == 0 else (rh % w)
        cur_fp = int(self.fp[r, b])
        cur_cnt = int(self.cnt[r, b])
        if cur_fp == fp or cur_cnt == 0:
            new = min(cur_cnt + increment, U64_MAX)
            self.fp[r, b] = fp
            self.cnt[r, b] = new
            return new
        remaining = increment
        while remaining > 0:
            current = int(self.cnt[r, b])
            threshold = decay_threshold(self.decay_tbl, current)
            roll = int(self.rng.integers(0, U64_MAX, dtype=np.uint64, endpoint=True))
            if roll < threshold:
                current -= 1
                self.cnt[r, b] = current
                if current == 0:
                    self.fp[r, b] = fp
                    self.cnt[r, b] = remaining
                    return remaining
            remaining -= 1
        return None

    def _update_pq(
        self,
        uniq: np.ndarray,
        max_count: np.ndarray,
        arr: pa.Array,
        first_idx: np.ndarray,
    ) -> None:
        pq_batch_update(
            self.pq, uniq, max_count, arr, first_idx,
            self.pq.min_count() if self.pq.is_full() else 0,
        )


    @classmethod
    def builder(cls):
        from .base import SketchBuilder

        return SketchBuilder(cls)

    def add_with_evicted(self, item: Any, increment: int = 1):
        """Single-event insert reporting (evicted, newly_tracked) — the
        reference C6 eviction contract (src/heavykeeper.rs:281-354)."""
        if increment == 0:
            return (None, False)
        fp = hash_scalar(item, self.seed, self.hash_fn)
        row_h = derive_row_hashes(np.array([fp], dtype=np.uint64), self.depth)[:, 0]
        max_count = 0
        for r in range(self.depth):
            c = self._add_one_row(r, int(row_h[r]), fp, int(increment))
            if c is not None and c > max_count:
                max_count = c
        if max_count == 0:
            return (None, False)
        pq = self.pq
        if fp in pq:
            pq.update_if_present(fp, max_count)
            return (None, False)
        if pq.is_full() and max_count <= pq.min_count():
            return (None, False)
        had_room = not pq.is_full()
        evicted = pq.upsert(fp, item, max_count)
        return (evicted, evicted is not None or had_room)

    def debug(self) -> str:
        """Dump params, non-zero buckets (count desc) and PQ contents
        (reference C13, src/heavykeeper.rs:461-495)."""
        lines = [
            f"TopK(k={self.k}, width={self.width}, depth={self.depth}, "
            f"decay={self.decay}, seed={self.seed})",
        ]
        nz = np.argwhere(self.cnt > 0)
        cells = sorted(
            ((int(self.cnt[r, c]), int(self.fp[r, c]), int(r), int(c)) for r, c in nz),
            reverse=True,
        )
        for count, fp, r, c in cells[:50]:
            lines.append(f"  row {r} bucket {c} fp={fp:016x} count={count}")
        for item, count in self.pq.iter_sorted():
            lines.append(f"  pq {item!r} -> {count}")
        return "\n".join(lines)

    # -- queries ---------------------------------------------------------

    def count(self, item: Any) -> int:
        fp = hash_scalar(item, self.seed, self.hash_fn)
        c = self.pq.get(fp)
        if c is not None:
            return c
        return self._bucket_count_fp(fp)

    def _bucket_count_fp(self, fp: int) -> int:
        """Min over rows whose bucket holds this fingerprint
        (src/heavykeeper.rs:220-246); 0 if no row matches."""
        row_h = derive_row_hashes(np.array([fp], dtype=np.uint64), self.depth)[:, 0]
        best: int | None = None
        for r in range(self.depth):
            b = int(bucket_indices(row_h[r : r + 1], self.width)[0])
            if int(self.fp[r, b]) == fp and int(self.cnt[r, b]) > 0:
                c = int(self.cnt[r, b])
                best = c if best is None else min(best, c)
        return best or 0

    def count_batch(self, items: Any) -> np.ndarray:
        """Vectorized point queries: PQ count if tracked, else MIN over rows
        with a matching fingerprint (src/heavykeeper.rs:220-246)."""
        arr = _as_arrow_array(items)
        h = hash_array(arr, self.seed, self.hash_fn)
        rows_h = derive_row_hashes(h, self.depth)
        best = np.full(len(h), U64(U64_MAX))
        anym = np.zeros(len(h), dtype=bool)
        for r in range(self.depth):
            idx = bucket_indices(rows_h[r], self.width)
            m = (self.fp[r, idx] == h) & (self.cnt[r, idx] > 0)
            best[m] = np.minimum(best[m], self.cnt[r, idx][m])
            anym |= m
        out = np.where(anym, best, U64(0))
        return pq_override(self.pq, h, out)

    def contains(self, item: Any) -> bool:
        return self.count(item) > 0

    def query(self, item: Any) -> bool:
        """Deprecated alias for ``contains`` (reference
        src/heavykeeper.rs:201-209, deprecated since 0.6.9)."""
        import warnings

        warnings.warn(
            "query() is deprecated; use contains()",
            DeprecationWarning, stacklevel=2,
        )
        return self.contains(item)

    def contains_top_k(self, item: Any) -> bool:
        return hash_scalar(item, self.seed, self.hash_fn) in self.pq

    def list(self) -> list[tuple[Any, int]]:
        return list(self.pq.iter_sorted())

    def to_table(self) -> pa.Table:
        items, counts = [], []
        for item, count in self.pq.iter_sorted():
            items.append(item)
            counts.append(count)
        return pa.table(
            {"item": pa.array(items), "count": pa.array(counts, type=pa.uint64())}
        )

    def mem_bytes(self) -> int:
        return (
            self.fp.nbytes + self.cnt.nbytes + self.decay_tbl.nbytes + self.pq.mem_bytes()
        )

    # -- merge -----------------------------------------------------------

    def _check_compatible(self, other: "TopK") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError(
                f"cannot merge {type(other).__name__} into {type(self).__name__}"
            )
        for attr in ("width", "depth", "decay", "k"):
            if getattr(self, attr) != getattr(other, attr):
                raise IncompatibleSketchError(
                    f"incompatible {attr}: {getattr(self, attr)} vs {getattr(other, attr)}"
                )
        if hash_scalar(MERGE_PROBE, self.seed, self.hash_fn) != hash_scalar(
            MERGE_PROBE, other.seed, other.hash_fn
        ):
            raise IncompatibleSketchError("incompatible hasher (seed/backend)")

    def merge(self, other: "TopK") -> "TopK":
        """Elementwise bucket merge + per-item PQ count sum
        (src/heavykeeper.rs:406-457)."""
        self._check_compatible(other)
        same = self.fp == other.fp
        summed = self.cnt + other.cnt
        summed = np.where(summed < self.cnt, U64(U64_MAX), summed)  # saturate
        self_empty = self.cnt == 0
        self.cnt = np.where(same, summed, np.where(self_empty, other.cnt, self.cnt))
        self.fp = np.where(same, self.fp, np.where(self_empty, other.fp, self.fp))
        for fp, o_count, _seq, item in other.pq.entries():
            s_count = self.pq.get(fp) or 0
            self.pq.upsert(fp, item, min(s_count + o_count, U64_MAX))
        return self

    # -- serialization ---------------------------------------------------

    def to_bytes(self) -> bytes:
        header = {
            "kind": self.KIND,
            "k": self.k,
            "width": self.width,
            "depth": self.depth,
            "decay": self.decay,
            "seed": self.seed,
            "hash_fn": self.hash_fn,
            "seq": self.pq.seq_counter,
            "rng_state": rng_state_to_json(self.rng),
        }
        return pack_sketch(
            header, {"fp": self.fp, "cnt": self.cnt}, {"pq": pq_to_table(self.pq)}
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TopK":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "TopK":
        self = cls(
            meta["k"], meta["width"], meta["depth"], meta["decay"], meta["seed"],
            meta.get("hash_fn", "auto"),
        )
        self.fp = arrays["fp"].reshape(self.depth, self.width)
        self.cnt = arrays["cnt"].reshape(self.depth, self.width)
        self.pq = pq_from_table(tables["pq"], self.k, meta["seq"])
        if meta.get("rng_state"):
            rng_state_from_json(self.rng, meta["rng_state"])
        return self

    def state_equal(self, other: "TopK") -> bool:
        return (
            np.array_equal(self.fp, other.fp)
            and np.array_equal(self.cnt, other.cnt)
            and {f: e[0] for f, e in self.pq._map.items()}
            == {f: e[0] for f, e in other.pq._map.items()}
        )
