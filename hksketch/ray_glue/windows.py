"""Event-time streaming windows with watermarks and allowed lateness.

The streaming-window member of the engine's live surface
(``streaming.py`` covers query-at-any-time SKETCHES — this module
covers Flink-style event-time windowing over an unbounded,
out-of-order stream): tumbling and hopping aggregation
(:class:`WindowedAggregator`), gap sessions with merge-on-arrival
(:class:`SessionWindows`), per-window heavy hitters
(:class:`WindowedTopK`) and per-window distinct counts
(:class:`WindowedDistinct`) via cross-shard mergeable-sketch folds:

- events carry their own (event-time) timestamps and arrive out of
  order; each is assigned to the tumbling window ``ts // W * W``;
- each KEY-HASH shard actor folds per-(window, key) integer partials
  vectorized (np.unique over composite codes, never a per-row loop)
  and tracks its local watermark = max event ts seen;
- the GLOBAL watermark is the SOURCE watermark: the max event ts the
  facade has ingested.  (Key-hash shards are not independent sources —
  an idle shard must not stall the watermark at −∞, the classic
  idle-partition hazard.  With multiple independent FACADES feeding
  one downstream, take the min of their source watermarks — the
  standard multi-input rule — which is exactly what
  ``WindowShard.poll_finalized`` supports: it finalizes against
  whatever watermark the coordinator hands it and only ratchets.);
- a window FINALIZES when ``window_end + allowed_lateness <= global
  watermark``: it is emitted exactly once and evicted from shard state,
  so actor memory is bounded by ACTIVE windows × keys, not stream
  length;
- an event arriving for an already-finalized window is LATE: counted
  (``late_dropped``) and dropped, never silently lost — the
  drop-after-lateness behavior of a production stream processor, made
  loud.

Determinism: given the same batch sequence per shard, emitted windows,
totals and late counts are identical (watermarks are pure maxima; the
fold is associative integer addition), so tests can assert exact
outputs and compare on-time totals against a batch recompute.

Reference scope note: the reference engine streams but has no windowed
aggregation (`/root/reference/src` exposes add/query only); this module
is part of the engine-extension surface.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

import ray

from ..hashing import splitmix64

U64 = np.uint64

_OUT_SCHEMA = pa.schema(
    [("window_start", pa.int64()),
     ("key", pa.int64()),
     ("n_events", pa.int64()),
     ("value_sum", pa.int64())]
)


@ray.remote
class WindowShard:
    """One key-hash shard of the windowed aggregator.  State:
    ``{window_start: {key: [n, sum]}}`` plus the local watermark and the
    last GLOBAL watermark this shard finalized against."""

    def __init__(self, window_us: int, lateness_us: int, slide_us: int = 0):
        self.w = int(window_us)
        self.late = int(lateness_us)
        self.slide = int(slide_us) or self.w
        self.state: dict = {}
        self.local_wm = -(1 << 62)
        self.last_gw = -(1 << 62)
        self.late_dropped = 0

    def add_batch(self, keys, ts, values) -> int:
        """Fold a batch (int64 arrays); returns this shard's local
        watermark after the batch.  Sliding mode assigns each event to
        its ``window/slide`` overlapping windows (bounded fan-out, the
        hopping-window standard); ``late_dropped`` then counts dropped
        (event, window) ASSIGNMENTS — an event can be late for its
        oldest window yet on time for its newest."""
        keys = np.asarray(keys, dtype=np.int64)
        ts = np.asarray(ts, dtype=np.int64)
        values = np.asarray(values, dtype=np.int64)
        if len(ts):
            self.local_wm = max(self.local_wm, int(ts.max()))
            k = self.w // self.slide
            win = (ts // self.slide) * self.slide  # newest window start
            if k > 1:
                reps = len(ts)
                off = np.tile(
                    np.arange(k, dtype=np.int64) * self.slide, reps
                )
                win = np.repeat(win, k) - off
                keys = np.repeat(keys, k)
                values = np.repeat(values, k)
            # late = the window was already finalized against last_gw
            late = (win + self.w + self.late) <= self.last_gw
            n_late = int(late.sum())
            if n_late:
                self.late_dropped += n_late
                keep = ~late
                keys, win, values = keys[keep], win[keep], values[keep]
            if len(win):
                # vectorized per-(window, key) fold
                order = np.lexsort((keys, win))
                w_s, k_s, v_s = win[order], keys[order], values[order]
                new = np.concatenate(
                    ([True], (w_s[1:] != w_s[:-1]) | (k_s[1:] != k_s[:-1]))
                )
                starts = np.flatnonzero(new)
                cnt = np.diff(np.append(starts, len(w_s)))
                vs = np.add.reduceat(v_s, starts)
                for i, st in enumerate(starts):
                    slot = self.state.setdefault(
                        int(w_s[st]), {}
                    ).setdefault(int(k_s[st]), [0, 0])
                    slot[0] += int(cnt[i])
                    slot[1] += int(vs[i])
        return self.local_wm

    def watermark(self) -> int:
        return self.local_wm

    def poll_finalized(self, global_wm: int) -> bytes:
        """Emit (serialized Arrow) every window with
        ``end + lateness <= global_wm``, evicting it — exactly-once."""
        self.last_gw = max(self.last_gw, int(global_wm))
        done = [
            ws for ws in self.state
            if ws + self.w + self.late <= self.last_gw
        ]
        rows_w: List[int] = []
        rows_k: List[int] = []
        rows_n: List[int] = []
        rows_v: List[int] = []
        for ws in sorted(done):
            for k in sorted(self.state[ws]):
                n, v = self.state[ws][k]
                rows_w.append(ws)
                rows_k.append(k)
                rows_n.append(n)
                rows_v.append(v)
            del self.state[ws]
        t = pa.table(
            {"window_start": pa.array(rows_w, type=pa.int64()),
             "key": pa.array(rows_k, type=pa.int64()),
             "n_events": pa.array(rows_n, type=pa.int64()),
             "value_sum": pa.array(rows_v, type=pa.int64())}
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as wr:
            wr.write_table(t)
        return sink.getvalue().to_pybytes()

    def flush(self) -> bytes:
        """End-of-stream: finalize everything still active."""
        return self.poll_finalized(1 << 62)

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped,
                "active_windows": len(self.state),
                "local_watermark": self.local_wm}

    def checkpoint(self) -> bytes:
        """Serialize the FULL shard state (open windows, watermarks,
        late counter) as one Arrow IPC payload — a restored shard
        continues the stream exactly where this one stopped, including
        the exactly-once frontier (``last_gw``)."""
        rows_w, rows_k, rows_n, rows_v = [], [], [], []
        for ws in sorted(self.state):
            for k in sorted(self.state[ws]):
                n, v = self.state[ws][k]
                rows_w.append(ws)
                rows_k.append(k)
                rows_n.append(n)
                rows_v.append(v)
        t = pa.table(
            {"w": pa.array(rows_w, type=pa.int64()),
             "k": pa.array(rows_k, type=pa.int64()),
             "n": pa.array(rows_n, type=pa.int64()),
             "v": pa.array(rows_v, type=pa.int64())},
        )
        t = t.replace_schema_metadata(
            {"local_wm": str(self.local_wm),
             "last_gw": str(self.last_gw),
             "late_dropped": str(self.late_dropped),
             "w_us": str(self.w), "late_us": str(self.late),
             "slide_us": str(self.slide)}
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as wr:
            wr.write_table(t)
        return sink.getvalue().to_pybytes()

    def restore(self, blob: bytes) -> None:
        """Load a :meth:`checkpoint` payload; refuses a checkpoint taken
        under different window parameters (the checkpoint.py param-
        refusal contract)."""
        t = _read_ipc(blob)
        meta = {k.decode(): v.decode()
                for k, v in (t.schema.metadata or {}).items()}
        if (int(meta["w_us"]), int(meta["late_us"]),
                int(meta["slide_us"])) != (self.w, self.late, self.slide):
            raise ValueError(
                "window checkpoint params mismatch: "
                f"saved (w={meta['w_us']}, late={meta['late_us']}, "
                f"slide={meta['slide_us']}) vs this shard "
                f"(w={self.w}, late={self.late}, slide={self.slide})"
            )
        self.state = {}
        for w, k, n, v in zip(
            t.column("w").to_pylist(), t.column("k").to_pylist(),
            t.column("n").to_pylist(), t.column("v").to_pylist(),
        ):
            self.state.setdefault(int(w), {})[int(k)] = [int(n), int(v)]
        self.local_wm = int(meta["local_wm"])
        self.last_gw = int(meta["last_gw"])
        self.late_dropped = int(meta["late_dropped"])


def _sync_exact_us(agg, params: dict, fields, rebuild) -> None:
    """Force a checkpoint-restored facade onto the EXACT integer µs
    params saved in the checkpoint.

    ``from_checkpoint`` reconstructs through float seconds
    (``p["w_us"] / 1e6`` → ctor → ``round(x * 1e6)``); ``round()``
    round-trips every duration below ~2^51 µs (~71 years), but if the
    reconstruction ever drifts (astronomical params), the facade and
    the saved shard blobs would disagree and ``restore()`` would raise
    a spurious param-mismatch.  Overwrite the facade fields with the
    exact ints and rebuild the shard actors with them instead.
    """
    if all(getattr(agg, f) == int(params[f]) for f in fields):
        return
    for f in fields:
        setattr(agg, f, int(params[f]))
    for s in agg.shards:
        ray.kill(s)
    agg.shards = [rebuild(agg) for _ in range(agg.n_shards)]


def _read_ipc(blob: bytes) -> pa.Table:
    with pa.ipc.open_stream(pa.BufferReader(blob)) as rd:
        return rd.read_all()


@ray.remote
class SessionShard:
    """One key-hash shard of STREAMING SESSION windows (the third window
    family: gap-based, data-driven extents that MERGE when an event
    bridges two open sessions).  All events of a key live on one shard,
    so merging is local: per batch, events sessionize vectorized within
    the batch first, then each batch-session folds into the key's open
    session list (splice/merge — touches only keys present in the
    batch).  A session finalizes when
    ``session_end + gap + lateness <= watermark``: no on-time event can
    extend it any more (an extender would need ``ts < end + gap``,
    which the lateness budget already classifies as late)."""

    def __init__(self, gap_us: int, lateness_us: int):
        self.gap = int(gap_us)
        self.late = int(lateness_us)
        self.state: dict = {}  # key -> sorted list of [start, end, n]
        self.last_gw = -(1 << 62)
        self.late_dropped = 0

    def add_batch(self, keys, ts) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        ts = np.asarray(ts, dtype=np.int64)
        if not len(ts):
            return
        late = ts + self.late <= self.last_gw
        n_late = int(late.sum())
        if n_late:
            self.late_dropped += n_late
            keep = ~late
            keys, ts = keys[keep], ts[keep]
        if not len(ts):
            return
        order = np.lexsort((ts, keys))
        k_s, t_s = keys[order], ts[order]
        kstarts = np.flatnonzero(
            np.concatenate(([True], k_s[1:] != k_s[:-1]))
        )
        kends = np.append(kstarts[1:], len(k_s))
        for st, en in zip(kstarts, kends):
            key = int(k_s[st])
            tt = t_s[st:en]
            # sessionize within the batch slice (vectorized)
            brk = np.flatnonzero(
                np.concatenate(([True], (tt[1:] - tt[:-1]) > self.gap))
            )
            bends = np.append(brk[1:], len(tt))
            sessions = self.state.setdefault(key, [])
            for bs, be in zip(brk, bends):
                self._fold(sessions, int(tt[bs]), int(tt[be - 1]),
                           int(be - bs))

    def _fold(self, sessions: list, s: int, e: int, n: int) -> None:
        """Merge the new [s, e] run into the key's open sessions: absorb
        every session within ``gap`` of it (list stays sorted, disjoint
        beyond-gap)."""
        lo, hi = s, e
        cnt = n
        keep = []
        for sess in sessions:
            if sess[1] + self.gap < lo or hi + self.gap < sess[0]:
                keep.append(sess)
            else:  # bridges: merge extents and counts
                lo = min(lo, sess[0])
                hi = max(hi, sess[1])
                cnt += sess[2]
        keep.append([lo, hi, cnt])
        keep.sort()
        sessions[:] = keep

    def poll_finalized(self, global_wm: int) -> bytes:
        self.last_gw = max(self.last_gw, int(global_wm))
        rows_k, rows_s, rows_e, rows_n = [], [], [], []
        dead_keys = []
        for key in self.state:
            sessions = self.state[key]
            still = []
            for sess in sessions:
                if sess[1] + self.gap + self.late <= self.last_gw:
                    rows_k.append(key)
                    rows_s.append(sess[0])
                    rows_e.append(sess[1])
                    rows_n.append(sess[2])
                else:
                    still.append(sess)
            if still:
                self.state[key] = still
            else:
                dead_keys.append(key)
        for key in dead_keys:
            del self.state[key]
        t = pa.table(
            {"key": pa.array(rows_k, type=pa.int64()),
             "session_start": pa.array(rows_s, type=pa.int64()),
             "session_end": pa.array(rows_e, type=pa.int64()),
             "n_events": pa.array(rows_n, type=pa.int64())}
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as wr:
            wr.write_table(t)
        return sink.getvalue().to_pybytes()

    def flush(self) -> bytes:
        return self.poll_finalized(1 << 62)

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped,
                "active_sessions": sum(
                     len(v) for v in self.state.values())}

    def checkpoint(self) -> bytes:
        rows_k, rows_s, rows_e, rows_n = [], [], [], []
        for key in sorted(self.state):
            for s, e, n in self.state[key]:
                rows_k.append(key)
                rows_s.append(s)
                rows_e.append(e)
                rows_n.append(n)
        t = pa.table(
            {"k": pa.array(rows_k, type=pa.int64()),
             "s": pa.array(rows_s, type=pa.int64()),
             "e": pa.array(rows_e, type=pa.int64()),
             "n": pa.array(rows_n, type=pa.int64())}
        ).replace_schema_metadata(
            {"last_gw": str(self.last_gw),
             "late_dropped": str(self.late_dropped),
             "gap_us": str(self.gap), "late_us": str(self.late)}
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, t.schema) as wr:
            wr.write_table(t)
        return sink.getvalue().to_pybytes()

    def restore(self, blob: bytes) -> None:
        t = _read_ipc(blob)
        meta = {k.decode(): v.decode()
                for k, v in (t.schema.metadata or {}).items()}
        if (int(meta["gap_us"]), int(meta["late_us"])) != (
                self.gap, self.late):
            raise ValueError(
                "session checkpoint params mismatch: saved "
                f"(gap={meta['gap_us']}, late={meta['late_us']}) vs "
                f"(gap={self.gap}, late={self.late})"
            )
        self.state = {}
        for k, s, e, n in zip(
            t.column("k").to_pylist(), t.column("s").to_pylist(),
            t.column("e").to_pylist(), t.column("n").to_pylist(),
        ):
            self.state.setdefault(int(k), []).append(
                [int(s), int(e), int(n)]
            )
        self.last_gw = int(meta["last_gw"])
        self.late_dropped = int(meta["late_dropped"])


class SessionWindows:
    """Driver facade for streaming session windows: key-hash routing
    (a key's whole session history lives on one shard), source
    watermark, exactly-once emission of ``(key, session_start,
    session_end, n_events)`` rows."""

    def __init__(
        self,
        gap_seconds: float,
        allowed_lateness_seconds: float = 0.0,
        shards: int = 4,
    ):
        if gap_seconds <= 0:
            raise ValueError("gap_seconds must be > 0")
        if allowed_lateness_seconds < 0:
            raise ValueError("allowed_lateness_seconds must be >= 0")
        shards = int(shards)
        if shards < 1 or shards & (shards - 1):
            raise ValueError(f"shards must be a power of two (got {shards})")
        self.gap_us = round(gap_seconds * 1_000_000)
        self.late_us = round(allowed_lateness_seconds * 1_000_000)
        self.n_shards = shards
        self.src_wm = -(1 << 62)
        self.shards = [
            SessionShard.remote(self.gap_us, self.late_us)
            for _ in range(shards)
        ]

    def add_batch(self, keys, ts) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        ts = np.asarray(ts, dtype=np.int64)
        if not len(ts):
            return
        self.src_wm = max(self.src_wm, int(ts.max()))
        shard = (splitmix64(keys.view(U64)) & U64(self.n_shards - 1)).astype(
            np.int64
        )
        refs = []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(self.shards[s].add_batch.remote(keys[m], ts[m]))
        ray.get(refs)

    def _collect(self, blobs: List[bytes]) -> pa.Table:
        parts = [_read_ipc(b) for b in blobs]
        t = pa.concat_tables([p for p in parts if p.num_rows] or parts[:1])
        return t.sort_by(
            [("key", "ascending"), ("session_start", "ascending")]
        )

    def poll(self) -> pa.Table:
        return self._collect(
            ray.get([
                s.poll_finalized.remote(self.src_wm) for s in self.shards
            ])
        )

    def flush(self) -> pa.Table:
        return self._collect(
            ray.get([s.flush.remote() for s in self.shards])
        )

    def late_dropped(self) -> int:
        return sum(
            s["late_dropped"]
            for s in ray.get([sh.stats.remote() for sh in self.shards])
        )

    def checkpoint(self) -> dict:
        return {
            "shards": ray.get(
                [s.checkpoint.remote() for s in self.shards]
            ),
            "src_wm": self.src_wm,
            "params": {"gap_us": self.gap_us, "late_us": self.late_us,
                       "n_shards": self.n_shards},
        }

    @classmethod
    def from_checkpoint(cls, chk: dict) -> "SessionWindows":
        p = chk["params"]
        agg = cls(
            gap_seconds=p["gap_us"] / 1e6,
            allowed_lateness_seconds=p["late_us"] / 1e6,
            shards=p["n_shards"],
        )
        _sync_exact_us(
            agg, p, ("gap_us", "late_us"),
            lambda a: SessionShard.remote(a.gap_us, a.late_us),
        )
        ray.get([
            s.restore.remote(b)
            for s, b in zip(agg.shards, chk["shards"])
        ])
        agg.src_wm = chk["src_wm"]
        return agg

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


@ray.remote
class WindowSketchShard:
    """One shard of the windowed HEAVY-HITTER stream: state is one
    MERGEABLE sketch per active window.  Keys route by hash (disjoint
    key sets per shard → lower per-shard cardinality → better sketch
    accuracy), and finalization returns per-window sketch BLOBS — the
    facade merges shard blobs in shard-index order (C11 merge is the
    cross-shard combiner, exactly the engine's core primitive) and
    ranks.  Watermark / lateness / exactly-once semantics are identical
    to :class:`WindowShard`."""

    def __init__(self, window_us: int, lateness_us: int, cfg: dict):
        from .aggregate import make_sketch

        self.w = int(window_us)
        self.late = int(lateness_us)
        self.cfg = cfg
        self._make = make_sketch
        self.state: dict = {}
        self.last_gw = -(1 << 62)
        self.late_dropped = 0

    def add_batch(self, keys, ts) -> None:
        keys = np.asarray(keys)
        ts = np.asarray(ts, dtype=np.int64)
        if not len(ts):
            return
        win = (ts // self.w) * self.w
        late = (win + self.w + self.late) <= self.last_gw
        n_late = int(late.sum())
        if n_late:
            self.late_dropped += n_late
            keep = ~late
            keys, win = keys[keep], win[keep]
        if not len(win):
            return
        order = np.argsort(win, kind="stable")
        w_s, k_s = win[order], keys[order]
        starts = np.flatnonzero(
            np.concatenate(([True], w_s[1:] != w_s[:-1]))
        )
        ends = np.append(starts[1:], len(w_s))
        for st, en in zip(starts, ends):
            sk = self.state.get(int(w_s[st]))
            if sk is None:
                sk = self.state[int(w_s[st])] = self._make(self.cfg)
            sk.add_batch(k_s[st:en])

    def poll_finalized(self, global_wm: int) -> dict:
        """{window_start: sketch blob} for every finalized window
        (evicted — exactly-once)."""
        self.last_gw = max(self.last_gw, int(global_wm))
        done = sorted(
            ws for ws in self.state
            if ws + self.w + self.late <= self.last_gw
        )
        out = {}
        for ws in done:
            out[ws] = self.state.pop(ws).to_bytes()
        return out

    def flush(self) -> dict:
        return self.poll_finalized(1 << 62)

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped,
                "active_windows": len(self.state)}

    def checkpoint(self) -> dict:
        """Open-window sketch blobs + frontier/late state (sketches
        already serialize; params ride along for refusal on restore)."""
        return {
            "windows": {ws: sk.to_bytes()
                        for ws, sk in sorted(self.state.items())},
            "last_gw": self.last_gw,
            "late_dropped": self.late_dropped,
            "w_us": self.w, "late_us": self.late,
            "cfg": self.cfg,
        }

    def restore(self, chk: dict) -> None:
        from ..sketch import sketch_from_bytes

        if (int(chk["w_us"]), int(chk["late_us"]),
                chk["cfg"]) != (self.w, self.late, self.cfg):
            raise ValueError(
                "sketch-window checkpoint params mismatch: saved "
                f"(w={chk['w_us']}, late={chk['late_us']}, "
                f"cfg={chk['cfg']}) vs (w={self.w}, late={self.late}, "
                f"cfg={self.cfg})"
            )
        self.state = {
            int(ws): sketch_from_bytes(b)
            for ws, b in chk["windows"].items()
        }
        self.last_gw = int(chk["last_gw"])
        self.late_dropped = int(chk["late_dropped"])


class WindowedDistinct:
    """Streaming per-window DISTINCT counting: one mergeable KMV
    (``"reservoir"`` cfg) per window per shard behind the same
    watermark machinery, merged cross-shard at finalization.  In the
    exact regime (sketch ``k`` > per-window cardinality) the estimate
    IS the exact COUNT(DISTINCT) — deterministic, SQL-gateable;
    beyond it, the KMV (k-1)/U_(k) estimator with its published error
    takes over (document which regime a deployment sits in).  Emits
    ``(window_start, n_distinct)`` exactly once per window."""

    def __init__(
        self,
        cfg: dict,
        window_seconds: float,
        allowed_lateness_seconds: float = 0.0,
        shards: int = 4,
    ):
        if window_seconds <= 0:
            raise ValueError("window_seconds must be > 0")
        shards = int(shards)
        if shards < 1 or shards & (shards - 1):
            raise ValueError(f"shards must be a power of two (got {shards})")
        self.w_us = round(window_seconds * 1_000_000)
        self.late_us = round(allowed_lateness_seconds * 1_000_000)
        self.n_shards = shards
        self.src_wm = -(1 << 62)
        self._cfg = cfg
        self.shards = [
            WindowSketchShard.remote(self.w_us, self.late_us, cfg)
            for _ in range(shards)
        ]

    def add_batch(self, keys, ts) -> None:
        from ..hashing import hash_array

        keys = np.asarray(keys)
        ts = np.asarray(ts, dtype=np.int64)
        if not len(ts):
            return
        self.src_wm = max(self.src_wm, int(ts.max()))
        h = hash_array(pa.array(keys), 1, fn="hk64")
        shard = (h & U64(self.n_shards - 1)).astype(np.int64)
        refs = []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(self.shards[s].add_batch.remote(keys[m], ts[m]))
        ray.get(refs)

    def _assemble(self, maps: List[dict]) -> pa.Table:
        from ..sketch import sketch_from_bytes

        wins = sorted({w for m in maps for w in m})
        rows_w, rows_n = [], []
        for w in wins:
            merged = None
            for m in maps:
                if w not in m:
                    continue
                sk = sketch_from_bytes(m[w])
                if merged is None:
                    merged = sk
                else:
                    merged.merge(sk)
            rows_w.append(w)
            rows_n.append(int(round(merged.estimate())))
        return pa.table(
            {"window_start": pa.array(rows_w, type=pa.int64()),
             "n_distinct": pa.array(rows_n, type=pa.int64())}
        )

    def poll(self) -> pa.Table:
        return self._assemble(ray.get(
            [s.poll_finalized.remote(self.src_wm) for s in self.shards]
        ))

    def flush(self) -> pa.Table:
        return self._assemble(
            ray.get([s.flush.remote() for s in self.shards])
        )

    def late_dropped(self) -> int:
        return sum(
            s["late_dropped"]
            for s in ray.get([sh.stats.remote() for sh in self.shards])
        )

    def checkpoint(self) -> dict:
        return {
            "shards": ray.get([s.checkpoint.remote() for s in self.shards]),
            "src_wm": self.src_wm,
            "params": {"w_us": self.w_us, "late_us": self.late_us,
                       "n_shards": self.n_shards},
            "cfg": self._cfg,
        }

    @classmethod
    def from_checkpoint(cls, chk: dict) -> "WindowedDistinct":
        p = chk["params"]
        agg = cls(
            chk["cfg"], window_seconds=p["w_us"] / 1e6,
            allowed_lateness_seconds=p["late_us"] / 1e6,
            shards=p["n_shards"],
        )
        _sync_exact_us(
            agg, p, ("w_us", "late_us"),
            lambda a: WindowSketchShard.remote(a.w_us, a.late_us, a._cfg),
        )
        ray.get([
            s.restore.remote(b)
            for s, b in zip(agg.shards, chk["shards"])
        ])
        agg.src_wm = chk["src_wm"]
        return agg

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


class WindowedTopK:
    """Streaming per-window heavy hitters: the flagship HeavyKeeper
    (or any registered sketch with ``list()``) behind the event-time
    window/watermark machinery.  ``poll()``/``flush()`` return rows
    ``(window_start, key, count)`` — each finalized window's merged
    top-``k``, ranked (count desc, key asc) after the cross-shard
    merge, emitted exactly once."""

    def __init__(
        self,
        cfg: dict,
        k: int,
        window_seconds: float,
        allowed_lateness_seconds: float = 0.0,
        shards: int = 4,
    ):
        if window_seconds <= 0:
            raise ValueError("window_seconds must be > 0")
        shards = int(shards)
        if shards < 1 or shards & (shards - 1):
            raise ValueError(f"shards must be a power of two (got {shards})")
        self.w_us = round(window_seconds * 1_000_000)
        self.late_us = round(allowed_lateness_seconds * 1_000_000)
        self.k = int(k)
        self.n_shards = shards
        self.src_wm = -(1 << 62)
        self._cfg = cfg
        self.shards = [
            WindowSketchShard.remote(self.w_us, self.late_us, cfg)
            for _ in range(shards)
        ]

    def checkpoint(self) -> dict:
        return {
            "shards": ray.get([s.checkpoint.remote() for s in self.shards]),
            "src_wm": self.src_wm,
            "params": {"w_us": self.w_us, "late_us": self.late_us,
                       "n_shards": self.n_shards, "k": self.k},
            "cfg": self._cfg,
        }

    @classmethod
    def from_checkpoint(cls, chk: dict) -> "WindowedTopK":
        p = chk["params"]
        agg = cls(
            chk["cfg"], k=p["k"], window_seconds=p["w_us"] / 1e6,
            allowed_lateness_seconds=p["late_us"] / 1e6,
            shards=p["n_shards"],
        )
        _sync_exact_us(
            agg, p, ("w_us", "late_us"),
            lambda a: WindowSketchShard.remote(a.w_us, a.late_us, a._cfg),
        )
        ray.get([
            s.restore.remote(b)
            for s, b in zip(agg.shards, chk["shards"])
        ])
        agg.src_wm = chk["src_wm"]
        return agg

    def add_batch(self, keys, ts) -> None:
        from ..hashing import hash_array

        keys = np.asarray(keys)
        ts = np.asarray(ts, dtype=np.int64)
        if not len(ts):
            return
        self.src_wm = max(self.src_wm, int(ts.max()))
        h = hash_array(pa.array(keys), 1, fn="hk64")
        shard = (h & U64(self.n_shards - 1)).astype(np.int64)
        refs = []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(
                    self.shards[s].add_batch.remote(keys[m], ts[m])
                )
        ray.get(refs)

    def _assemble(self, maps: List[dict]) -> pa.Table:
        from ..sketch import sketch_from_bytes

        wins = sorted({w for m in maps for w in m})
        rows_w, rows_k, rows_c = [], [], []
        for w in wins:
            merged = None
            for m in maps:  # shard-index order: deterministic merge
                if w not in m:
                    continue
                sk = sketch_from_bytes(m[w])
                if merged is None:
                    merged = sk
                else:
                    merged.merge(sk)
            items = merged.list()
            items.sort(key=lambda r: (-int(r[1]), r[0]))
            for key, cnt in items[: self.k]:
                rows_w.append(w)
                rows_k.append(key)
                rows_c.append(int(cnt))
        return pa.table(
            {"window_start": pa.array(rows_w, type=pa.int64()),
             "key": pa.array(rows_k),
             "count": pa.array(rows_c, type=pa.int64())}
        )

    def poll(self) -> pa.Table:
        maps = ray.get(
            [s.poll_finalized.remote(self.src_wm) for s in self.shards]
        )
        return self._assemble(maps)

    def flush(self) -> pa.Table:
        return self._assemble(
            ray.get([s.flush.remote() for s in self.shards])
        )

    def late_dropped(self) -> int:
        return sum(
            s["late_dropped"]
            for s in ray.get([sh.stats.remote() for sh in self.shards])
        )

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


class WindowedAggregator:
    """Driver facade: key-hash routing to shard actors, SOURCE
    watermark (max ingested event ts — idle shards must not stall
    finalization; the multi-facade min rule lives in the module
    docstring), exactly-once window emission.

    ``add_batch(table)`` routes rows by ``splitmix64(key) & mask`` so a
    (window, key) pair lives on exactly ONE shard — finalized outputs
    concatenate with no cross-shard merge.  ``poll()`` advances the
    global watermark and returns newly-finalized windows; ``flush()``
    finalizes everything (end of stream).  Values must be pre-scaled
    int64 (the engine's exact-integer discipline).
    """

    def __init__(
        self,
        window_seconds: float,
        allowed_lateness_seconds: float = 0.0,
        shards: int = 4,
        key_col: str = "key",
        ts_col: str = "ts",
        value_col: Optional[str] = "value",
        slide_seconds: Optional[float] = None,
    ):
        if window_seconds <= 0:
            raise ValueError("window_seconds must be > 0")
        if allowed_lateness_seconds < 0:
            raise ValueError("allowed_lateness_seconds must be >= 0")
        shards = int(shards)
        if shards < 1 or shards & (shards - 1):
            raise ValueError(f"shards must be a power of two (got {shards})")
        self.w_us = round(window_seconds * 1_000_000)
        self.late_us = round(allowed_lateness_seconds * 1_000_000)
        slide_us = (
            self.w_us if slide_seconds is None
            else round(slide_seconds * 1_000_000)
        )
        if slide_us <= 0 or self.w_us % slide_us != 0:
            raise ValueError(
                f"slide ({slide_us}us) must be > 0 and divide the window "
                f"({self.w_us}us)"
            )
        self.slide_us = slide_us
        self.n_shards = shards
        self.key_col, self.ts_col, self.value_col = key_col, ts_col, value_col
        self.src_wm = -(1 << 62)
        self.shards = [
            WindowShard.remote(self.w_us, self.late_us, slide_us)
            for _ in range(shards)
        ]

    def _cols(self, batch: pa.Table):
        keys = batch.column(self.key_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ts = batch.column(self.ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        ts = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        if self.value_col is None:
            vals = np.ones(len(keys), dtype=np.int64)
        else:
            vals = batch.column(self.value_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        return keys, ts, vals

    def add_batch(self, batch: pa.Table) -> None:
        keys, ts, vals = self._cols(batch)
        if len(ts):
            self.src_wm = max(self.src_wm, int(ts.max()))
        shard = (splitmix64(keys.view(U64)) & U64(self.n_shards - 1)).astype(
            np.int64
        )
        refs = []
        for s in range(self.n_shards):
            m = shard == s
            if m.any():
                refs.append(
                    self.shards[s].add_batch.remote(keys[m], ts[m], vals[m])
                )
        ray.get(refs)  # backpressure: one in-flight wave per caller batch

    def global_watermark(self) -> int:
        """The facade's SOURCE watermark (max ingested event ts) — see
        the module docstring for the idle-shard rationale."""
        return self.src_wm

    def poll(self) -> pa.Table:
        gw = self.global_watermark()
        blobs = ray.get(
            [s.poll_finalized.remote(gw) for s in self.shards]
        )
        parts = [_read_ipc(b) for b in blobs]
        t = pa.concat_tables([p for p in parts if p.num_rows]
                             or [_OUT_SCHEMA.empty_table()])
        return t.sort_by([("window_start", "ascending"),
                          ("key", "ascending")])

    def flush(self) -> pa.Table:
        blobs = ray.get([s.flush.remote() for s in self.shards])
        parts = [_read_ipc(b) for b in blobs]
        t = pa.concat_tables([p for p in parts if p.num_rows]
                             or [_OUT_SCHEMA.empty_table()])
        return t.sort_by([("window_start", "ascending"),
                          ("key", "ascending")])

    def late_dropped(self) -> int:
        return sum(
            s["late_dropped"]
            for s in ray.get([sh.stats.remote() for sh in self.shards])
        )

    def active_windows(self) -> int:
        return sum(
            s["active_windows"]
            for s in ray.get([sh.stats.remote() for sh in self.shards])
        )

    def checkpoint(self) -> dict:
        """Whole-aggregator checkpoint: per-shard state blobs + facade
        watermark + params.  Hand the dict to
        :meth:`WindowedAggregator.from_checkpoint` (optionally after a
        full process restart) and the stream continues exactly-once."""
        return {
            "shards": ray.get(
                [s.checkpoint.remote() for s in self.shards]
            ),
            "src_wm": self.src_wm,
            "params": {
                "w_us": self.w_us, "late_us": self.late_us,
                "slide_us": self.slide_us, "n_shards": self.n_shards,
            },
        }

    @classmethod
    def from_checkpoint(
        cls,
        chk: dict,
        key_col: str = "key",
        ts_col: str = "ts",
        value_col: Optional[str] = "value",
    ) -> "WindowedAggregator":
        p = chk["params"]
        agg = cls(
            window_seconds=p["w_us"] / 1e6,
            allowed_lateness_seconds=p["late_us"] / 1e6,
            shards=p["n_shards"],
            key_col=key_col, ts_col=ts_col, value_col=value_col,
            slide_seconds=p["slide_us"] / 1e6,
        )
        _sync_exact_us(
            agg, p, ("w_us", "late_us", "slide_us"),
            lambda a: WindowShard.remote(a.w_us, a.late_us, a.slide_us),
        )
        ray.get([
            s.restore.remote(b)
            for s, b in zip(agg.shards, chk["shards"])
        ])
        agg.src_wm = chk["src_wm"]
        return agg

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
