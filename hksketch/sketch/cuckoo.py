"""CuckooTopK — lobby + cuckoo-homed heavy slots (highest-accuracy variant).

Semantics from the reference's ``CuckooTopK`` (`/root/reference/src/cuckoo.rs`):
each bucket has one probabilistic-decay "lobby" cell plus ``depth``
non-decaying "heavy" slots.  New fingerprints land in the lobby of their
primary bucket (`update_lobby`, `src/cuckoo.rs:635-644`); on winning the
lobby they attempt promotion into an empty heavy slot of the primary or
alternate bucket, else evict the min victim iff strictly heavier, re-homing
the victim via a bounded kick chain (`promote`/`relocate_victim`,
`src/cuckoo.rs:653-707`, ``max_kicks`` default 8, `src/cuckoo.rs:27`).
Heavy hits are a non-decaying saturating add (`src/cuckoo.rs:258-261`).
Alternate bucket: ``index(mix64(fp ^ 0x9e3779b97f4a7c15))`` bumped by one if
equal (`src/cuckoo.rs:571-582`).  Merge is PQ-first with pre-merge snapshots,
then other's heavy cells re-inserted by cuckoo semantics with heavy-XOR-lobby
folding, then other's lobbies (higher-count-wins, ties keep self) —
deterministic, no decay rolls (`src/cuckoo.rs:410-553`).

Vectorization: the heavy-hit fast path is a NumPy gather/scatter; the
lobby path runs in per-primary-bucket occurrence rounds (weight-1 decay is
exactly one roll) with a bulk promote PREcheck — only promotes that can
mutate fall to the scalar scan/kick code.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..hashing import _as_arrow_array, bucket_indices, hash_array, hash_scalar, splitmix64
from .base import (
    DEFAULT_SEED,
    collapse_batch,
    MERGE_PROBE,
    U64_MAX,
    BuilderError,
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
DEFAULT_MAX_KICKS = 8
_ALT_XOR = U64(0x9E3779B97F4A7C15)
# weighted lobby updates up to this weight run the vectorized multi-pass
# roll loop; heavier weights (rare — they mostly heavy-hit) stay scalar
_W_CAP = U64(64)


def _dense_counts(values: np.ndarray, positions: np.ndarray, n: int) -> np.ndarray:
    """Scatter per-candidate counts into a sel-length dense array (the
    shape ``_promote_precheck`` indexes by candidate position)."""
    out = np.zeros(n, dtype=np.uint64)
    out[positions] = values
    return out


@register_sketch("cuckoo")
class CuckooTopK:
    def __init__(
        self,
        k: int,
        width: int,
        depth: int,
        decay: float,
        seed: int = DEFAULT_SEED,
        max_kicks: int = DEFAULT_MAX_KICKS,
        hash_fn: str = "auto",
    ):
        validate_topk_params(k, width, depth, decay)
        from ..hashing import resolve_hash_fn

        self.hash_fn = resolve_hash_fn(hash_fn)
        if not isinstance(max_kicks, (int, np.integer)) or max_kicks < 1:
            raise BuilderError(f"max_kicks must be >= 1, got {max_kicks!r}")
        self.k = int(k)
        self.width = int(width)
        self.depth = int(depth)
        self.decay = float(decay)
        self.seed = int(seed)
        self.max_kicks = int(max_kicks)
        self.lobby_fp = np.zeros(self.width, dtype=np.uint64)
        self.lobby_cnt = np.zeros(self.width, dtype=np.uint64)
        self.heavy_fp = np.zeros((self.width, self.depth), dtype=np.uint64)
        self.heavy_cnt = np.zeros((self.width, self.depth), dtype=np.uint64)
        self.decay_tbl = precompute_decay_thresholds(self.decay)
        self.rng = np.random.default_rng(self.seed)
        self.pq = TopKQueue(self.k)
        self.min_pq_count = 0

    # -- bucket derivation ----------------------------------------------

    def _bucket_pair_vec(self, fps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        primary = bucket_indices(fps, self.width)
        if self.width == 1:
            return primary, primary.copy()
        alt_h = splitmix64((fps ^ _ALT_XOR) - U64(0x9E3779B97F4A7C15))
        alternate = bucket_indices(alt_h, self.width)
        clash = alternate == primary
        alternate[clash] = (alternate[clash] + 1) % self.width
        return primary, alternate

    def _bucket_pair(self, fp: int) -> tuple[int, int]:
        """Scalar twin of ``_bucket_pair_vec`` in pure Python ints (round 4:
        the 1-element-ndarray version dominated the scalar fallback paths —
        ~15 µs/call of array allocation for 3 multiplies)."""
        w = self.width
        pow2 = (w & (w - 1)) == 0
        primary = fp & (w - 1) if pow2 else fp % w
        if w == 1:
            return primary, primary
        M = (1 << 64) - 1
        # (fp ^ _ALT_XOR) - golden, then the splitmix64 finalizer — same
        # constant schedule as hashing.splitmix64
        x = ((fp ^ int(_ALT_XOR)) - 0x9E3779B97F4A7C15) & M
        x = (x + 0x9E3779B97F4A7C15) & M
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
        x = x ^ (x >> 31)
        alternate = x & (w - 1) if pow2 else x % w
        if alternate == primary:
            alternate = (alternate + 1) % w
        return primary, alternate

    # -- add -------------------------------------------------------------

    def add(self, item: Any, increment: int = 1) -> None:
        self.add_batch([item], np.array([increment], dtype=np.uint64))

    def add_batch(self, items: Any, weights: Any | None = None) -> None:
        arr = _as_arrow_array(items)
        n = len(arr)
        if n == 0:
            return
        h = hash_array(arr, self.seed, self.hash_fn)
        uniq, first_idx, wsum = collapse_batch(h, weights)
        m = len(uniq)
        if m == 0:
            return

        primary, alternate = self._bucket_pair_vec(uniq)
        # vectorized heavy-hit fast path (src/cuckoo.rs:246-261)
        pfp = self.heavy_fp[primary]
        pcnt = self.heavy_cnt[primary]
        pmatch = (pfp == uniq[:, None]) & (pcnt > 0)
        p_has = pmatch.any(axis=1)
        afp = self.heavy_fp[alternate]
        acnt = self.heavy_cnt[alternate]
        amatch = (afp == uniq[:, None]) & (acnt > 0)
        a_has = amatch.any(axis=1) & ~p_has
        heavy_hit = p_has | a_has

        # conflicts: two batch keys touching the same heavy bucket
        tb = np.concatenate([primary[heavy_hit], alternate[heavy_hit]])
        if len(tb):
            sb, cts = np.unique(tb, return_counts=True)
            dup_buckets = sb[cts > 1]
            in_dup = np.isin(primary, dup_buckets) | np.isin(alternate, dup_buckets)
        else:
            in_dup = np.zeros(m, dtype=bool)
        fast = heavy_hit & ~in_dup

        final = np.zeros(m, dtype=np.uint64)
        touched = np.zeros(m, dtype=bool)

        if fast.any():
            rows = np.where(p_has[fast], primary[fast], alternate[fast])
            cols = np.where(
                p_has[fast],
                np.argmax(pmatch, axis=1)[fast],
                np.argmax(amatch, axis=1)[fast],
            )
            old = self.heavy_cnt[rows, cols]
            new = old + wsum[fast]
            new = np.where(new < old, U64(U64_MAX), new)
            self.heavy_cnt[rows, cols] = new
            final[fast] = new
            touched[fast] = True

        # lobby path, per-primary-bucket occurrence rounds; weight-1 decay
        # is a single roll (src/cuckoo.rs:709-731) and weights ≤ _W_CAP run
        # the same roll loop as vectorized passes (round 4); winners
        # attempt promotion scalar (bounded heavy scans).
        slow = ~fast
        # keys whose fp IS heavy but fell out of the vectorized fast path
        # (shared-bucket conflicts) must go through the scalar heavy check,
        # never the lobby path
        w1 = slow & (wsum <= _W_CAP) & ~heavy_hit
        for i in np.flatnonzero(slow & ~w1):
            c = self._add_one(int(uniq[i]), int(wsum[i]))
            if c is not None:
                final[i] = c
                touched[i] = True

        sel_all = np.flatnonzero(w1)
        if len(sel_all):
            p_all = primary[sel_all]
            order = np.argsort(p_all, kind="stable")
            sp = p_all[order]
            nsel = len(sel_all)
            run_starts = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
            run_sizes = np.diff(np.concatenate((run_starts, [nsel])))
            for rnd in range(int(run_sizes.max()) if nsel else 0):
                live = run_sizes > rnd
                sel = sel_all[order[run_starts[live] + rnd]]
                sel.sort()  # fingerprint-ascending processing order
                if len(sel) == 0:
                    break
                if len(sel) < 48:
                    for i in sel:
                        c = self._add_one(int(uniq[i]), int(wsum[i]))
                        if c is not None:
                            final[i] = c
                            touched[i] = True
                    continue
                pb = primary[sel]
                lfp = self.lobby_fp[pb]
                lcnt = self.lobby_cnt[pb]
                winners = (lcnt == 0) | (lfp == uniq[sel])
                wincnt = lcnt + wsum[sel]
                wincnt = np.where(wincnt < lcnt, U64(U64_MAX), wincnt)
                # vectorized lobby add for winners; promotion attempt scalar
                wi = np.flatnonzero(winners)
                self.lobby_fp[pb[wi]] = uniq[sel[wi]]
                self.lobby_cnt[pb[wi]] = wincnt[wi]
                self._promote_precheck(
                    wi, sel, pb, alternate, uniq, wincnt, final, touched
                )
                # losers: multi-pass decay of the resident lobby occupant —
                # pass p rolls once per key with remaining weight; takeover
                # on zero claims the lobby with the REMAINING weight and
                # attempts promotion at that count (src/cuckoo.rs:709-731
                # loop semantics, one weight unit consumed per roll)
                li = np.flatnonzero(~winners)
                if len(li):
                    small = lcnt[li] < len(self.decay_tbl)
                    for i in sel[li[~small]]:  # huge resident counts: scalar
                        c = self._add_one(int(uniq[i]), int(wsum[i]))
                        if c is not None:
                            final[i] = c
                            touched[i] = True
                    li = li[small]
                if len(li):
                    # shared multi-pass roll loop (base.weighted_decay_rolls,
                    # src/cuckoo.rs:709-731); lobby takeover + promotion
                    # applied after the loop (deferral exact: distinct
                    # lobbies per round, and the loop never reads heavy)
                    lb = pb[li]
                    taken, final_cnt = weighted_decay_rolls(
                        self.rng,
                        self.decay_tbl,
                        lambda ai, _b=lb: self.lobby_cnt[_b[ai]],
                        lambda ai, v, _b=lb: self.lobby_cnt.__setitem__(
                            _b[ai], v
                        ),
                        wsum[sel[li]],
                    )
                    ti = li[taken]
                    if len(ti):
                        self.lobby_fp[pb[ti]] = uniq[sel[ti]]
                        self.lobby_cnt[pb[ti]] = final_cnt[taken]
                        self._promote_precheck(
                            ti, sel, pb, alternate, uniq,
                            _dense_counts(final_cnt[taken], ti, len(sel)),
                            final, touched,
                        )

        self._update_pq(uniq, final, touched, arr, first_idx)

    def _promote_precheck(
        self, wi, sel, pb, alternate, uniq, counts, final, touched
    ) -> None:
        """Vectorized promote PREcheck + scalar promotes for survivors: a
        promote that would fail (no empty slot, count <= min victim)
        mutates nothing, and during adds empties never appear and victim
        minima never shrink — so a bulk snapshot precheck is sound;
        survivors re-check scalar before mutating.  ``counts[j]`` is the
        lobby count for candidate ``wi[j]`` indexed like ``sel``."""
        if len(wi) == 0:
            return
        ap = alternate[sel[wi]]
        pcnt = self.heavy_cnt[pb[wi]]
        acnt = self.heavy_cnt[ap]
        any_empty = (pcnt == 0).any(axis=1) | (acnt == 0).any(axis=1)
        vmin = np.minimum(pcnt.min(axis=1), acnt.min(axis=1))
        may_succeed = any_empty | (counts[wi] > vmin)
        for j in wi[may_succeed]:
            i = int(sel[j])
            fp = int(uniq[i])
            count = int(counts[j])
            prim, alt = int(pb[j]), int(alternate[i])
            if self._promote(fp, count, prim, alt):
                if int(self.lobby_fp[prim]) == fp:
                    self.lobby_fp[prim] = 0
                    self.lobby_cnt[prim] = 0
                final[i] = count
                touched[i] = True

    def _add_one(self, fp: int, increment: int) -> int | None:
        primary, alternate = self._bucket_pair(fp)
        idx = self._find_heavy(fp, primary, alternate)
        if idx is not None:
            b, c = idx
            new = min(int(self.heavy_cnt[b, c]) + increment, U64_MAX)
            self.heavy_cnt[b, c] = new
            return new
        lobby_count = self._update_lobby(primary, fp, increment)
        if lobby_count is None:
            return None
        if self._promote(fp, lobby_count, primary, alternate):
            if int(self.lobby_fp[primary]) == fp:
                self.lobby_fp[primary] = 0
                self.lobby_cnt[primary] = 0
            return lobby_count
        return None  # still in lobby: not PQ-eligible (src/cuckoo.rs:268-272)

    def _find_heavy(self, fp: int, primary: int, alternate: int):
        for b in (primary,) if alternate == primary else (primary, alternate):
            for c in range(self.depth):
                if int(self.heavy_cnt[b, c]) > 0 and int(self.heavy_fp[b, c]) == fp:
                    return (b, c)
        return None

    def _find_empty(self, b: int) -> int | None:
        for c in range(self.depth):
            if int(self.heavy_cnt[b, c]) == 0:
                return c
        return None

    def _min_heavy(self, b: int) -> tuple[int, int]:
        col = int(np.argmin(self.heavy_cnt[b]))
        return col, int(self.heavy_cnt[b, col])

    def _update_lobby(self, b: int, fp: int, increment: int) -> int | None:
        lc = int(self.lobby_cnt[b])
        if lc == 0 or int(self.lobby_fp[b]) == fp:
            new = min(lc + increment, U64_MAX)
            self.lobby_fp[b] = fp
            self.lobby_cnt[b] = new
            return new
        # decay the resident lobby occupant (src/cuckoo.rs:709-731)
        remaining = increment
        while remaining > 0:
            current = int(self.lobby_cnt[b])
            threshold = decay_threshold(self.decay_tbl, current)
            roll = int(self.rng.integers(0, U64_MAX, dtype=np.uint64, endpoint=True))
            if roll < threshold:
                current -= 1
                self.lobby_cnt[b] = current
                if current == 0:
                    self.lobby_fp[b] = fp
                    self.lobby_cnt[b] = remaining
                    return remaining
            remaining -= 1
        return None

    def _promote(self, fp: int, count: int, primary: int, alternate: int) -> bool:
        c = self._find_empty(primary)
        if c is not None:
            self.heavy_fp[primary, c] = fp
            self.heavy_cnt[primary, c] = count
            return True
        if alternate != primary:
            c = self._find_empty(alternate)
            if c is not None:
                self.heavy_fp[alternate, c] = fp
                self.heavy_cnt[alternate, c] = count
                return True
        vb, (vc, vcount) = primary, self._min_heavy(primary)
        if alternate != primary:
            ac, acount = self._min_heavy(alternate)
            if acount < vcount:
                vb, vc, vcount = alternate, ac, acount
        if count <= vcount:
            return False
        victim_fp, victim_cnt = int(self.heavy_fp[vb, vc]), int(self.heavy_cnt[vb, vc])
        self.heavy_fp[vb, vc] = fp
        self.heavy_cnt[vb, vc] = count
        self._relocate_victim(victim_fp, victim_cnt, vb)
        return True

    def _relocate_victim(self, v_fp: int, v_cnt: int, from_bucket: int) -> None:
        for _ in range(self.max_kicks):
            if v_cnt == 0:
                return
            primary, alternate = self._bucket_pair(v_fp)
            target = alternate if from_bucket == primary else primary
            if target == from_bucket:
                return
            c = self._find_empty(target)
            if c is not None:
                self.heavy_fp[target, c] = v_fp
                self.heavy_cnt[target, c] = v_cnt
                return
            tc, tcount = self._min_heavy(target)
            if v_cnt <= tcount:
                return
            nfp, ncnt = int(self.heavy_fp[target, tc]), int(self.heavy_cnt[target, tc])
            self.heavy_fp[target, tc] = v_fp
            self.heavy_cnt[target, tc] = v_cnt
            v_fp, v_cnt = nfp, ncnt
            from_bucket = target

    def _update_pq(self, uniq, final, touched, arr, first_idx) -> None:
        pq = self.pq
        pq_batch_update(
            pq, uniq, final, arr, first_idx,
            self.min_pq_count if pq.is_full() else 0, valid=touched,
        )
        if pq.is_full():
            self.min_pq_count = pq.min_count()


    @classmethod
    def builder(cls):
        from .base import SketchBuilder

        return SketchBuilder(cls, extra_optional={"max_kicks": DEFAULT_MAX_KICKS})

    def add_with_evicted(self, item: Any, increment: int = 1):
        """Single-event insert reporting (evicted, newly_tracked) — the
        reference C6 eviction contract (src/cuckoo.rs:246-273)."""
        if increment == 0:
            return (None, False)
        fp = hash_scalar(item, self.seed, self.hash_fn)
        c = self._add_one(fp, int(increment))
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
        nz = np.argwhere(self.heavy_cnt > 0)
        cells = sorted(
            ((int(self.heavy_cnt[r, c]), int(self.heavy_fp[r, c]), int(r), int(c)) for r, c in nz),
            reverse=True,
        )
        for count, fp, r, c in cells[:50]:
            lines.append(f"  cell[{r},{c}] fp={fp:016x} count={count}")
        for item, count in self.pq.iter_sorted():
            lines.append(f"  pq {item!r} -> {count}")
        return "\n".join(lines)

    # -- queries ---------------------------------------------------------

    def bucket_count_fp(self, fp: int) -> int:
        primary, alternate = self._bucket_pair(fp)
        idx = self._find_heavy(fp, primary, alternate)
        if idx is not None:
            return int(self.heavy_cnt[idx[0], idx[1]])
        if int(self.lobby_fp[primary]) == fp:
            return int(self.lobby_cnt[primary])
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
        """Vectorized point queries: PQ if tracked, else heavy slot in either
        candidate bucket, else primary lobby (src/cuckoo.rs:280-312)."""
        arr = _as_arrow_array(items)
        h = hash_array(arr, self.seed, self.hash_fn)
        primary, alternate = self._bucket_pair_vec(h)
        out = np.zeros(len(h), dtype=np.uint64)
        pm = (self.heavy_fp[primary] == h[:, None]) & (self.heavy_cnt[primary] > 0)
        am = (self.heavy_fp[alternate] == h[:, None]) & (self.heavy_cnt[alternate] > 0)
        p_has = pm.any(axis=1)
        a_has = am.any(axis=1) & ~p_has
        rows = np.flatnonzero(p_has)
        out[rows] = self.heavy_cnt[primary[rows], np.argmax(pm, axis=1)[rows]]
        rows = np.flatnonzero(a_has)
        out[rows] = self.heavy_cnt[alternate[rows], np.argmax(am, axis=1)[rows]]
        lob = ~p_has & ~a_has & (self.lobby_fp[primary] == h) & (self.lobby_cnt[primary] > 0)
        out[lob] = self.lobby_cnt[primary[lob]]
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
            self.lobby_fp.nbytes
            + self.lobby_cnt.nbytes
            + self.heavy_fp.nbytes
            + self.heavy_cnt.nbytes
            + self.decay_tbl.nbytes
            + self.pq.mem_bytes()
        )

    # -- merge -----------------------------------------------------------

    def _check_compatible(self, other: "CuckooTopK") -> None:
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

    def merge(self, other: "CuckooTopK") -> "CuckooTopK":
        """Deterministic merge — no decay rolls (src/cuckoo.rs:408-553)."""
        self._check_compatible(other)

        other_pairs = other.pq.entries()
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
            self.pq.upsert(fp, item, min(s_count + other.bucket_count_fp(fp), U64_MAX))

        # other's heavy cells, in cell order (heavy XOR lobby invariant)
        for b in range(other.width):
            for c in range(other.depth):
                ocnt = int(other.heavy_cnt[b, c])
                if ocnt == 0:
                    continue
                fp = int(other.heavy_fp[b, c])
                count = ocnt
                primary, alternate = self._bucket_pair(fp)
                if int(self.lobby_cnt[primary]) > 0 and int(self.lobby_fp[primary]) == fp:
                    count = min(count + int(self.lobby_cnt[primary]), U64_MAX)
                    self.lobby_fp[primary] = 0
                    self.lobby_cnt[primary] = 0
                idx = self._find_heavy(fp, primary, alternate)
                if idx is not None:
                    self.heavy_cnt[idx] = min(int(self.heavy_cnt[idx]) + count, U64_MAX)
                    continue
                col = self._find_empty(primary)
                if col is not None:
                    self.heavy_fp[primary, col] = fp
                    self.heavy_cnt[primary, col] = count
                    continue
                if alternate != primary:
                    col = self._find_empty(alternate)
                    if col is not None:
                        self.heavy_fp[alternate, col] = fp
                        self.heavy_cnt[alternate, col] = count
                        continue
                vb, (vc, vcount) = primary, self._min_heavy(primary)
                if alternate != primary:
                    ac, acount = self._min_heavy(alternate)
                    if acount < vcount:
                        vb, vc, vcount = alternate, ac, acount
                if count > vcount:
                    victim_fp = int(self.heavy_fp[vb, vc])
                    victim_cnt = int(self.heavy_cnt[vb, vc])
                    self.heavy_fp[vb, vc] = fp
                    self.heavy_cnt[vb, vc] = count
                    self._relocate_victim(victim_fp, victim_cnt, vb)

        # other's lobbies: fold into heavy if already heavy, else
        # lobby-vs-lobby higher-count-wins (ties keep self)
        for b in range(other.width):
            ocnt = int(other.lobby_cnt[b])
            if ocnt == 0:
                continue
            fp = int(other.lobby_fp[b])
            primary, alternate = self._bucket_pair(fp)
            idx = self._find_heavy(fp, primary, alternate)
            if idx is not None:
                self.heavy_cnt[idx] = min(int(self.heavy_cnt[idx]) + ocnt, U64_MAX)
                continue
            lc = int(self.lobby_cnt[primary])
            if lc > 0 and int(self.lobby_fp[primary]) == fp:
                self.lobby_cnt[primary] = min(lc + ocnt, U64_MAX)
            elif lc == 0 or ocnt > lc:
                self.lobby_fp[primary] = fp
                self.lobby_cnt[primary] = ocnt
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
            "max_kicks": self.max_kicks,
            "hash_fn": self.hash_fn,
            "min_pq_count": self.min_pq_count,
            "seq": self.pq.seq_counter,
            "rng_state": rng_state_to_json(self.rng),
        }
        return pack_sketch(
            header,
            {
                "lobby_fp": self.lobby_fp,
                "lobby_cnt": self.lobby_cnt,
                "heavy_fp": self.heavy_fp,
                "heavy_cnt": self.heavy_cnt,
            },
            {"pq": pq_to_table(self.pq)},
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooTopK":
        meta, arrays, tables = unpack_sketch(blob)
        return cls._from_parts(meta, arrays, tables)

    @classmethod
    def _from_parts(cls, meta, arrays, tables) -> "CuckooTopK":
        self = cls(
            meta["k"],
            meta["width"],
            meta["depth"],
            meta["decay"],
            meta["seed"],
            meta.get("max_kicks", DEFAULT_MAX_KICKS),
            meta.get("hash_fn", "auto"),
        )
        self.lobby_fp = arrays["lobby_fp"]
        self.lobby_cnt = arrays["lobby_cnt"]
        self.heavy_fp = arrays["heavy_fp"].reshape(self.width, self.depth)
        self.heavy_cnt = arrays["heavy_cnt"].reshape(self.width, self.depth)
        self.pq = pq_from_table(tables["pq"], self.k, meta["seq"])
        self.min_pq_count = meta["min_pq_count"]
        if meta.get("rng_state"):
            rng_state_from_json(self.rng, meta["rng_state"])
        return self

    def state_equal(self, other: "CuckooTopK") -> bool:
        return (
            np.array_equal(self.lobby_fp, other.lobby_fp)
            and np.array_equal(self.lobby_cnt, other.lobby_cnt)
            and np.array_equal(self.heavy_fp, other.heavy_fp)
            and np.array_equal(self.heavy_cnt, other.heavy_cnt)
            and {f: e[0] for f, e in self.pq._map.items()}
            == {f: e[0] for f, e in other.pq._map.items()}
        )
