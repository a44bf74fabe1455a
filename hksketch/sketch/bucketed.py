"""BucketedTopK — single-hash HeavyKeeper variant (the engine's default).

Semantics from the reference's ``BucketedTopK``
(`/root/reference/src/bucketed.rs`): one hash per key selects ONE bucket of
``depth`` cells; scan cells for fingerprint match / first empty / min-count
cell (`src/bucketed.rs:187-258`); match → saturating add; empty → claim;
else probabilistic decay of the min cell only with takeover on zero
(`src/bucketed.rs:452-476`).  The top-k register holds max-only counts
(paper Alg. 1 heap rule), gated by the cached min PQ count when full.
Merge is PQ-first with pre-merge bucket-count snapshots, then per-bucket
cell union with min-eviction (`src/bucketed.rs:348-449`).

This implementation is *batch-vectorized*: keys are collapsed to unique
fingerprints with summed weights per batch (the reference itself collapses
duplicates via the ``increment`` argument, `src/bucketed.rs:187`), the
match/claim fast paths run as NumPy gathers/scatters, and only decay-path
keys and intra-batch bucket conflicts fall back to an ordered scalar loop.
Processing order within a batch is fingerprint-ascending — deterministic and
independent of row order inside the batch; merge compatibility across
workers only requires equal (k, width, depth, decay, seed).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..hashing import _as_arrow_array, bucket_indices, hash_array, hash_scalar
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
    unpack_sketch,
    validate_topk_params,
    pq_batch_update,
    pq_override,
    rng_state_to_json,
    rng_state_from_json,
    weighted_decay_rolls,
)
from .pq import TopKQueue

U64 = np.uint64
# weighted decays up to this weight run the vectorized multi-pass roll
# loop; heavier weights (rare — they mostly match fast-path) stay scalar
_W_CAP = U64(64)


@register_sketch("bucketed")
class BucketedTopK:
    """Top-k heavy-hitter sketch; bucketed (single-hash) HeavyKeeper layout."""

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
        # cells[b, c]: bucket b holds `depth` cells
        self.fp = np.zeros((self.width, self.depth), dtype=np.uint64)
        self.cnt = np.zeros((self.width, self.depth), dtype=np.uint64)
        self.decay_tbl = precompute_decay_thresholds(self.decay)
        self.rng = np.random.default_rng(self.seed)
        self.pq = TopKQueue(self.k)
        self.min_pq_count = 0
        # touched-bucket tracking: while the set of written buckets stays
        # small (the per-group-partial regime), serialization scans only
        # those rows instead of the full width — None = unknown/full
        self._touched: "set[int] | None" = set()

    # -- hashing ---------------------------------------------------------

    def _hash(self, values: Any) -> np.ndarray:
        return hash_array(values, self.seed, self.hash_fn)

    def _track_touched(self, bidx: np.ndarray) -> None:
        if self._touched is None:
            return
        if len(self._touched) + len(bidx) > self.width // 8:
            self._touched = None
            return
        self._touched.update(np.unique(bidx).tolist())

    # -- core add --------------------------------------------------------

    def add(self, item: Any, increment: int = 1) -> None:
        self.add_batch([item], np.array([increment], dtype=np.uint64))

    def add_batch(
        self, items: Any, weights: Any | None = None, hashes: Any | None = None
    ) -> None:
        """Add a column of keys with optional weights (one weighted stream
        event per row; weight 0 rows are no-ops, src/bucketed.rs:193-195).
        ``hashes`` may carry precomputed ``hash_array(items, seed, hash_fn)``
        values to share one hash pass across fused operators."""
        arr = _as_arrow_array(items)
        n = len(arr)
        if n == 0:
            return
        h = hashes if hashes is not None else self._hash(arr)
        uniq, first_idx, wsum = collapse_batch(h, weights)
        if len(uniq) == 0:
            return
        self._add_unique(uniq, wsum, arr, first_idx)

    def _add_unique(
        self,
        uniq: np.ndarray,
        wsum: np.ndarray,
        arr: pa.Array,
        first_idx: np.ndarray,
    ) -> None:
        """Per-bucket occurrence-round vectorization: keys are processed in
        fingerprint-ascending order per bucket; round r handles every
        bucket's r-th key at once, so each round's buckets are distinct and
        the whole round runs as NumPy gathers/scatters — match, claim, and
        the multi-pass weighted decay (one vectorized roll per weight unit,
        exactly the reference's while-loop, src/bucketed.rs:452-476).
        Table-overflow counts and weights beyond _W_CAP stay scalar."""
        m = len(uniq)
        bidx = bucket_indices(uniq, self.width)
        self._track_touched(bidx)

        # occurrence rank of each key within its bucket (fingerprint order)
        order = np.argsort(bidx, kind="stable")
        sb = bidx[order]
        starts = np.where(np.r_[True, sb[1:] != sb[:-1]], np.arange(m), 0)
        rank_sorted = np.arange(m) - np.maximum.accumulate(starts)
        ranks = np.empty(m, dtype=np.int64)
        ranks[order] = rank_sorted

        final = np.zeros(m, dtype=np.uint64)
        ok = np.ones(m, dtype=bool)  # False → decay failed, no cell count

        max_rank = int(ranks.max()) if m else 0
        for r in range(max_rank + 1):
            sel = np.flatnonzero(ranks == r)
            if len(sel) == 0:
                break
            if len(sel) < 48:  # tiny tail rounds: scalar beats setup cost
                for i in sel:
                    c = self._add_one(int(uniq[i]), int(bidx[i]), int(wsum[i]))
                    if c is None:
                        ok[i] = False
                    else:
                        final[i] = c
                continue
            rows = bidx[sel]
            bfp = self.fp[rows]  # fresh gather: state current for round r
            bcnt = self.cnt[rows]
            nonzero = bcnt > 0
            match_mask = (bfp == uniq[sel, None]) & nonzero
            has_match = match_mask.any(axis=1)
            match_col = np.argmax(match_mask, axis=1)
            empty_mask = ~nonzero
            has_empty = empty_mask.any(axis=1)
            empty_col = np.argmax(empty_mask, axis=1)

            mm = has_match
            if mm.any():
                rr, cc = rows[mm], match_col[mm]
                old = self.cnt[rr, cc]
                new = old + wsum[sel[mm]]
                new = np.where(new < old, U64(U64_MAX), new)  # saturating
                self.cnt[rr, cc] = new
                final[sel[mm]] = new
            ee = ~has_match & has_empty
            if ee.any():
                rr, cc = rows[ee], empty_col[ee]
                self.fp[rr, cc] = uniq[sel[ee]]
                self.cnt[rr, cc] = wsum[sel[ee]]
                final[sel[ee]] = wsum[sel[ee]]

            needs_decay = ~has_match & ~has_empty
            fast = needs_decay & (wsum[sel] <= _W_CAP)
            fi = np.flatnonzero(fast)
            if len(fi):
                rr = rows[fi]
                sub = bcnt[fi]
                mincol = np.argmin(sub, axis=1)  # first minimal, scan order
                mincnt = sub[np.arange(len(fi)), mincol]
                small = mincnt < len(self.decay_tbl)
                fi, rr, mincol = fi[small], rr[small], mincol[small]
                if len(fi):
                    # shared multi-pass roll loop (base.weighted_decay_rolls,
                    # src/bucketed.rs:452-476); distinct buckets per round ⇒
                    # passes never interact; takeover applied after the loop
                    ok[sel[fi]] = False
                    taken, final_cnt = weighted_decay_rolls(
                        self.rng,
                        self.decay_tbl,
                        lambda ai, _r=rr, _c=mincol: self.cnt[_r[ai], _c[ai]],
                        lambda ai, v, _r=rr, _c=mincol: self.cnt.__setitem__(
                            (_r[ai], _c[ai]), v
                        ),
                        wsum[sel[fi]],
                    )
                    ti = fi[taken]
                    if len(ti):
                        self.fp[rr[taken], mincol[taken]] = uniq[sel[ti]]
                        self.cnt[rr[taken], mincol[taken]] = final_cnt[taken]
                        final[sel[ti]] = final_cnt[taken]
                        ok[sel[ti]] = True
            # huge-count or beyond-cap decays → exact scalar loop
            handled = np.zeros(len(sel), dtype=bool)
            handled[fi] = True
            slow = needs_decay & ~handled
            for i in sel[slow]:
                c = self._add_one(int(uniq[i]), int(bidx[i]), int(wsum[i]))
                if c is None:
                    ok[i] = False
                else:
                    final[i] = c

        self._update_pq(uniq, final, ok, arr, first_idx)

    def _add_one(self, fp: int, b: int, increment: int) -> int | None:
        """Scalar single-bucket update (exact src/bucketed.rs:196-235 scan)."""
        cells_fp = self.fp[b]
        cells_cnt = self.cnt[b]
        matched = -1
        first_empty = -1
        min_idx = 0
        min_count = U64_MAX + 1
        for i in range(self.depth):
            c = int(cells_cnt[i])
            if c == 0:
                if first_empty < 0:
                    first_empty = i
                continue
            if matched < 0 and int(cells_fp[i]) == fp:
                matched = i
            if c < min_count:
                min_count = c
                min_idx = i
        if matched >= 0:
            new = min(int(cells_cnt[matched]) + increment, U64_MAX)
            cells_cnt[matched] = new
            return new
        if first_empty >= 0:
            cells_fp[first_empty] = fp
            cells_cnt[first_empty] = increment
            return increment
        return self._decay_and_maybe_evict(b, min_idx, fp, increment)

    def _decay_and_maybe_evict(
        self, b: int, min_idx: int, fp: int, increment: int
    ) -> int | None:
        """Probabilistic decay of the min cell; takeover on zero
        (src/bucketed.rs:452-476). Some(count) if the new item took the cell."""
        remaining = increment
        cnt = self.cnt[b]
        while remaining > 0:
            current = int(cnt[min_idx])
            threshold = decay_threshold(self.decay_tbl, current)
            roll = int(self.rng.integers(0, U64_MAX, dtype=np.uint64, endpoint=True))
            if roll < threshold:
                current -= 1
                cnt[min_idx] = current
                if current == 0:
                    self.fp[b][min_idx] = fp
                    cnt[min_idx] = remaining
                    return remaining
            remaining -= 1
        return None

    def _update_pq(
        self,
        uniq: np.ndarray,
        final: np.ndarray,
        ok: np.ndarray,
        arr: pa.Array,
        first_idx: np.ndarray,
    ) -> None:
        """Batched paper-Alg.-1 heap update: raise-only for tracked keys,
        min-gated insert otherwise (src/bucketed.rs:237-257).  Candidate
        prefilter vs the batch-start min is exact because the PQ min only
        grows during the loop."""
        pq_batch_update(
            self.pq, uniq, final, arr, first_idx,
            self.min_pq_count if self.pq.is_full() else 0, valid=ok,
        )
        if self.pq.is_full():
            self.min_pq_count = self.pq.min_count()


    @classmethod
    def builder(cls):
        from .base import SketchBuilder

        return SketchBuilder(cls)

    def add_with_evicted(self, item: Any, increment: int = 1):
        """Single-event insert reporting (evicted, newly_tracked) — the
        reference C6 eviction contract (src/bucketed.rs:187-258)."""
        if increment == 0:
            return (None, False)
        fp = hash_scalar(item, self.seed, self.hash_fn)
        b = int(bucket_indices(np.array([fp], dtype=np.uint64), self.width)[0])
        if self._touched is not None:
            self._touched.add(b)
        c = self._add_one(fp, b, int(increment))
        return self._pq_single(fp, item, c)

    def _pq_single(self, fp: int, item: Any, count: int | None):
        if count is None or count == 0:
            return (None, False)
        pq = self.pq
        if fp in pq:
            pq.update_if_present(fp, count)
            if pq.is_full():
                self.min_pq_count = pq.min_count()
            return (None, False)
        if pq.is_full() and count <= pq.min_count():
            return (None, False)
        had_room = not pq.is_full()
        evicted = pq.upsert(fp, item, count)
        if pq.is_full():
            self.min_pq_count = pq.min_count()
        return (evicted, evicted is not None or had_room)

    def debug(self) -> str:
        """Dump params, non-zero cells (count desc) and PQ contents
        (reference C13, src/heavykeeper.rs:461-495)."""
        lines = [
            f"{type(self).__name__}(k={self.k}, width={self.width}, "
            f"depth={self.depth}, decay={self.decay}, seed={self.seed})",
        ]
        nz = np.argwhere(self.cnt > 0)
        cells = sorted(
            ((int(self.cnt[r, c]), int(self.fp[r, c]), int(r), int(c)) for r, c in nz),
            reverse=True,
        )
        for count, fp, r, c in cells[:50]:
            lines.append(f"  cell[{r},{c}] fp={fp:016x} count={count}")
        for item, count in self.pq.iter_sorted():
            lines.append(f"  pq {item!r} -> {count}")
        return "\n".join(lines)

    # -- queries ---------------------------------------------------------

    def bucket_count_fp(self, fp: int) -> int:
        b = int(bucket_indices(np.array([fp], dtype=np.uint64), self.width)[0])
        for i in range(self.depth):
            if int(self.cnt[b][i]) > 0 and int(self.fp[b][i]) == fp:
                return int(self.cnt[b][i])
        return 0

    def bucket_count(self, item: Any) -> int:
        return self.bucket_count_fp(hash_scalar(item, self.seed, self.hash_fn))

    def count(self, item: Any) -> int:
        fp = hash_scalar(item, self.seed, self.hash_fn)
        c = self.pq.get(fp)
        if c is not None:
            return c
        return self.bucket_count_fp(fp)

    def count_batch(self, items: Any) -> np.ndarray:
        """Vectorized point queries (C7): PQ count if tracked, else the
        bucket reading; 0 when absent."""
        arr = _as_arrow_array(items)
        h = self._hash(arr)
        bidx = bucket_indices(h, self.width)
        bfp = self.fp[bidx]
        bcnt = self.cnt[bidx]
        match = (bfp == h[:, None]) & (bcnt > 0)
        has = match.any(axis=1)
        col = np.argmax(match, axis=1)
        out = np.zeros(len(h), dtype=np.uint64)
        rows = np.flatnonzero(has)
        out[rows] = self.cnt[bidx[rows], col[rows]]
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
        """(item, count) sorted count desc, insertion-sequence asc."""
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
            self.fp.nbytes
            + self.cnt.nbytes
            + self.decay_tbl.nbytes
            + self.pq.mem_bytes()
        )

    # -- merge -----------------------------------------------------------

    def _check_compatible(self, other: "BucketedTopK") -> None:
        if type(self) is not type(other):
            raise IncompatibleSketchError(
                f"cannot merge {type(other).__name__} into {type(self).__name__}"
            )
        for attr in ("width", "depth", "decay", "k"):
            if getattr(self, attr) != getattr(other, attr):
                raise IncompatibleSketchError(
                    f"incompatible {attr}: {getattr(self, attr)} vs {getattr(other, attr)}"
                )
        # hasher probe (src/bucketed.rs:373-375): differing seeds/backends
        # hash the probe differently, so cross-hasher merges are rejected.
        if hash_scalar(MERGE_PROBE, self.seed, self.hash_fn) != hash_scalar(
            MERGE_PROBE, other.seed, other.hash_fn
        ):
            raise IncompatibleSketchError("incompatible hasher (seed/backend)")

    def merge(self, other: "BucketedTopK") -> "BucketedTopK":
        """In-place merge of ``other`` (src/bucketed.rs:348-449): PQ first
        using pre-merge bucket counts as fallback; then per-bucket cell union
        by fingerprint with min-count eviction on full buckets."""
        self._check_compatible(other)
        if self._touched is not None:
            if other._touched is None:
                self._touched = None
            else:
                self._touched |= other._touched
                if len(self._touched) * 8 > self.width:
                    self._touched = None

        other_pairs = other.pq.entries()  # pre-merge snapshot, sorted order
        other_fps = set(other.pq._map)
        self_only = [
            (fp, e[0], e[2])
            for fp, e in sorted(
                self.pq._map.items(), key=lambda kv: (-kv[1][0], kv[1][1])
            )
            if fp not in other_fps
        ]
        for fp, o_count, _seq, item in other_pairs:
            s_count = self.pq.get(fp)
            if s_count is not None:
                merged = min(s_count + o_count, U64_MAX)
            else:
                merged = min(self.bucket_count_fp(fp) + o_count, U64_MAX)
            self.pq.upsert(fp, item, merged)
        for fp, s_count, item in self_only:
            merged = min(s_count + other.bucket_count_fp(fp), U64_MAX)
            self.pq.upsert(fp, item, merged)

        # cell union, one incoming column at a time (vectorized over buckets)
        for o in range(self.depth):
            ofp = other.fp[:, o]
            ocnt = other.cnt[:, o]
            active = ocnt > 0
            if not active.any():
                continue
            nonzero = self.cnt > 0
            match = (self.fp == ofp[:, None]) & nonzero
            has_match = match.any(axis=1) & active
            mcol = np.argmax(match, axis=1)
            rows = np.flatnonzero(has_match)
            if len(rows):
                old = self.cnt[rows, mcol[rows]]
                new = old + ocnt[rows]
                self.cnt[rows, mcol[rows]] = np.where(new < old, U64(U64_MAX), new)
            rest = active & ~has_match
            empty = ~nonzero
            has_empty = empty.any(axis=1) & rest
            ecol = np.argmax(empty, axis=1)
            rows = np.flatnonzero(has_empty)
            if len(rows):
                self.fp[rows, ecol[rows]] = ofp[rows]
                self.cnt[rows, ecol[rows]] = ocnt[rows]
            rest = rest & ~has_empty
            rows = np.flatnonzero(rest)
            if len(rows):
                # full bucket: replace min cell iff incoming > min
                sub = self.cnt[rows]
                mincol = np.argmin(sub, axis=1)
                mincnt = sub[np.arange(len(rows)), mincol]
                takeover = ocnt[rows] > mincnt
                trows = rows[takeover]
                tcols = mincol[takeover]
                self.fp[trows, tcols] = ofp[trows]
                self.cnt[trows, tcols] = ocnt[trows]

        if self.pq.is_full():
            self.min_pq_count = self.pq.min_count()
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
            "min_pq_count": self.min_pq_count,
            "seq": self.pq.seq_counter,
            "rng_state": rng_state_to_json(self.rng),
        }
        hints = None
        if self._touched is not None:
            rows = np.fromiter(self._touched, dtype=np.int64)
            rows.sort()
            idx = (rows[:, None] * self.depth + np.arange(self.depth)).reshape(-1)
            hints = {"fp": idx, "cnt": idx}
        return pack_sketch(
            header,
            {"fp": self.fp, "cnt": self.cnt},
            {"pq": pq_to_table(self.pq)},
            nonzero_hints=hints,
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BucketedTopK":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "BucketedTopK":
        self = cls(
            meta["k"], meta["width"], meta["depth"], meta["decay"], meta["seed"],
            meta.get("hash_fn", "auto"),
        )
        self.fp = arrays["fp"].reshape(self.width, self.depth)
        self.cnt = arrays["cnt"].reshape(self.width, self.depth)
        self._touched = None  # deserialized state: touched set unknown
        self.pq = pq_from_table(tables["pq"], self.k, meta["seq"])
        self.min_pq_count = meta["min_pq_count"]
        if meta.get("rng_state"):
            rng_state_from_json(self.rng, meta["rng_state"])
        return self

    def state_equal(self, other: "BucketedTopK") -> bool:
        return (
            np.array_equal(self.fp, other.fp)
            and np.array_equal(self.cnt, other.cnt)
            and {f: e[0] for f, e in self.pq._map.items()}
            == {f: e[0] for f, e in other.pq._map.items()}
        )
