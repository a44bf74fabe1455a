"""Event-time windowed aggregation: watermark finalization timing,
exactly-once emission, late-drop accounting, batch-recompute equality,
bounded state."""

import numpy as np
import pyarrow as pa
import pytest


def _batch(keys, ts, vals):
    return pa.table(
        {"key": pa.array(keys, type=pa.int64()),
         "ts": pa.array(ts, type=pa.int64()),
         "value": pa.array(vals, type=pa.int64())}
    )


def test_window_lifecycle_and_late_drops(ray_session):
    from hksketch.ray_glue.windows import WindowedAggregator

    W = 10_000_000  # 10s windows in us
    agg = WindowedAggregator(
        window_seconds=10, allowed_lateness_seconds=5, shards=2
    )
    try:
        # window [0,10s): key 1 twice; window [10s,20s): key 2 once
        agg.add_batch(_batch([1, 1, 2], [1_000_000, 2_000_000, 11_000_000],
                             [10, 20, 30]))
        # watermark = 11s < 10s+5s lateness -> nothing finalizes
        out = agg.poll()
        assert out.num_rows == 0
        # advance past 15s -> window 0 finalizes (exactly once)
        agg.add_batch(_batch([3], [16_000_000], [40]))
        out = agg.poll().to_pydict()
        assert out["window_start"] == [0]
        assert out["key"] == [1]
        assert out["n_events"] == [2]
        assert out["value_sum"] == [30]
        assert agg.poll().num_rows == 0  # never re-emitted
        # an event for the finalized window is late and dropped, counted
        agg.add_batch(_batch([1], [3_000_000], [99]))
        assert agg.late_dropped() == 1
        # an event for window 1 (still open: 20s+5s > 16s) is ON time
        agg.add_batch(_batch([2], [12_000_000], [5]))
        final = agg.flush().to_pydict()
        assert final["window_start"] == [W, W]
        assert final["key"] == [2, 3]
        assert final["n_events"] == [2, 1]
        assert final["value_sum"] == [35, 40]
        assert agg.active_windows() == 0  # state fully drained
    finally:
        agg.shutdown()


def test_windows_match_batch_recompute(ray_session):
    """Feeding a shuffled (bounded-disorder) stream: on-time events'
    finalized totals equal a plain batch groupby; late drops + emitted
    events account for every input row."""
    from hksketch.ray_glue.windows import WindowedAggregator

    rng = np.random.default_rng(0)
    n = 20_000
    ts = np.sort(rng.integers(0, 600_000_000, size=n))  # 10 min of events
    # bounded disorder: swap within 64-row neighborhoods
    idx = np.arange(n) + rng.integers(-64, 64, size=n)
    order = np.argsort(idx, kind="stable")
    ts = ts[order]
    keys = rng.integers(0, 50, size=n)
    vals = rng.integers(1, 100, size=n)

    agg = WindowedAggregator(
        window_seconds=30, allowed_lateness_seconds=10, shards=4
    )
    try:
        got_parts = []
        for i in range(0, n, 1000):
            agg.add_batch(_batch(keys[i:i+1000], ts[i:i+1000], vals[i:i+1000]))
            t = agg.poll()
            if t.num_rows:
                got_parts.append(t)
        got_parts.append(agg.flush())
        got = (
            pa.concat_tables(got_parts)
            .to_pandas()
            .sort_values(["window_start", "key"])
            .reset_index(drop=True)
        )
        n_late = agg.late_dropped()
        # bounded 64-row disorder << 10s lateness at this density -> no drops
        assert n_late == 0
        # exact batch recompute
        import pandas as pd

        df = pd.DataFrame(
            {"window_start": (ts // 30_000_000) * 30_000_000,
             "key": keys, "value": vals}
        )
        want = (
            df.groupby(["window_start", "key"])
            .agg(n_events=("value", "size"), value_sum=("value", "sum"))
            .reset_index()
            .sort_values(["window_start", "key"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"n_events": "int64", "value_sum": "int64"}),
            want.astype({"n_events": "int64", "value_sum": "int64"}),
        )
        # every window was emitted exactly once (no dup (window, key))
        assert not got.duplicated(["window_start", "key"]).any()
    finally:
        agg.shutdown()


def test_late_drops_counted_under_heavy_disorder(ray_session):
    """Disorder far beyond the lateness budget: drops happen, are
    counted, and emitted + dropped == input rows."""
    from hksketch.ray_glue.windows import WindowedAggregator

    rng = np.random.default_rng(1)
    n = 5_000
    ts = np.sort(rng.integers(0, 300_000_000, size=n))
    idx = np.arange(n) + rng.integers(-2000, 2000, size=n)  # wild disorder
    order = np.argsort(idx, kind="stable")
    ts = ts[order]
    keys = rng.integers(0, 10, size=n)

    agg = WindowedAggregator(
        window_seconds=5, allowed_lateness_seconds=1, shards=2,
        value_col=None,
    )
    try:
        parts = []
        for i in range(0, n, 500):
            agg.add_batch(
                pa.table({"key": pa.array(keys[i:i+500], type=pa.int64()),
                          "ts": pa.array(ts[i:i+500], type=pa.int64())})
            )
            t = agg.poll()
            if t.num_rows:
                parts.append(t)
        parts.append(agg.flush())
        emitted = sum(
            int(x) for p in parts
            for x in p.column("n_events").to_pylist()
        )
        dropped = agg.late_dropped()
        assert dropped > 0
        assert emitted + dropped == n
    finally:
        agg.shutdown()


def test_window_guards(ray_session):
    from hksketch.ray_glue.windows import WindowedAggregator

    with pytest.raises(ValueError):
        WindowedAggregator(window_seconds=0)
    with pytest.raises(ValueError):
        WindowedAggregator(window_seconds=1, allowed_lateness_seconds=-1)
    with pytest.raises(ValueError):
        WindowedAggregator(window_seconds=1, shards=3)


def test_sliding_windows_match_batch_recompute(ray_session):
    """Hopping mode (window 20s, slide 10s): every event lands in 2
    windows; streamed totals equal the exploded batch recompute."""
    import pandas as pd

    from hksketch.ray_glue.windows import WindowedAggregator

    rng = np.random.default_rng(2)
    n = 5_000
    ts = np.sort(rng.integers(0, 120_000_000, size=n))
    keys = rng.integers(0, 8, size=n)
    vals = rng.integers(1, 50, size=n)

    agg = WindowedAggregator(
        window_seconds=20, allowed_lateness_seconds=5, shards=2,
        slide_seconds=10,
    )
    try:
        parts = []
        for i in range(0, n, 700):
            agg.add_batch(_batch(keys[i:i+700], ts[i:i+700], vals[i:i+700]))
            t = agg.poll()
            if t.num_rows:
                parts.append(t)
        parts.append(agg.flush())
        assert agg.late_dropped() == 0  # in-order feed
        got = (
            pa.concat_tables(parts).to_pandas()
            .sort_values(["window_start", "key"]).reset_index(drop=True)
        )
        rows = []
        for j in (0, 1):
            w = (ts // 10_000_000) * 10_000_000 - j * 10_000_000
            rows.append(pd.DataFrame(
                {"window_start": w, "key": keys, "value": vals}
            ))
        want = (
            pd.concat(rows)
            .groupby(["window_start", "key"])
            .agg(n_events=("value", "size"), value_sum=("value", "sum"))
            .reset_index()
            .sort_values(["window_start", "key"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"n_events": "int64", "value_sum": "int64"}),
            want.astype({"n_events": "int64", "value_sum": "int64"}),
        )
    finally:
        agg.shutdown()


def test_sliding_guard(ray_session):
    from hksketch.ray_glue.windows import WindowedAggregator

    with pytest.raises(ValueError, match="divide the window"):
        WindowedAggregator(window_seconds=20, slide_seconds=7)


def test_windowed_topk_exact_regime(ray_session):
    """Streaming per-window heavy hitters: cross-shard sketch merge per
    finalized window; in the exact regime (width >> keys) the merged
    top-k equals the batch per-window top-k including tie order."""
    from collections import Counter

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.windows import WindowedTopK

    rng = np.random.default_rng(3)
    n = 8_000
    ts = np.sort(rng.integers(0, 120_000_000, size=n))  # two 60s windows
    keys = np.array(
        [f"u{v}" for v in rng.zipf(1.5, size=n) % 97], dtype=object
    )
    cfg = sketch_config(
        "bucketed", k=10, width=1 << 12, depth=4, decay=0.9, seed=7
    )
    agg = WindowedTopK(
        cfg, k=10, window_seconds=60, allowed_lateness_seconds=5, shards=4
    )
    try:
        parts = []
        for i in range(0, n, 900):
            agg.add_batch(keys[i:i+900], ts[i:i+900])
            t = agg.poll()
            if t.num_rows:
                parts.append(t)
        parts.append(agg.flush())
        assert agg.late_dropped() == 0
        got = pa.concat_tables(parts).to_pydict()
        # batch truth per window
        win = (ts // 60_000_000) * 60_000_000
        want_rows = []
        for w in sorted(set(win.tolist())):
            c = Counter(keys[win == w].tolist())
            ranked = sorted(c.items(), key=lambda r: (-r[1], r[0]))[:10]
            for k_, n_ in ranked:
                want_rows.append((w, k_, n_))
        got_rows = list(
            zip(got["window_start"], got["key"], got["count"])
        )
        assert got_rows == want_rows
    finally:
        agg.shutdown()


def test_windowed_topk_exactly_once_and_late(ray_session):
    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.windows import WindowedTopK

    cfg = sketch_config(
        "bucketed", k=5, width=1 << 10, depth=4, decay=0.9, seed=1
    )
    agg = WindowedTopK(
        cfg, k=5, window_seconds=10, allowed_lateness_seconds=0, shards=2
    )
    try:
        agg.add_batch(np.array(["a", "a", "b"], dtype=object),
                      np.array([1_000_000, 2_000_000, 3_000_000]))
        agg.add_batch(np.array(["c"], dtype=object),
                      np.array([11_000_000]))
        out = agg.poll().to_pydict()
        assert out["window_start"] == [0, 0]
        assert out["key"] == ["a", "b"]
        assert out["count"] == [2, 1]
        assert agg.poll().num_rows == 0  # exactly once
        agg.add_batch(np.array(["a"], dtype=object),
                      np.array([500_000]))  # late for window 0
        assert agg.late_dropped() == 1
    finally:
        agg.shutdown()


def test_session_windows_merge_and_finalize(ray_session):
    """Gap sessions: bridging event MERGES two open sessions; sessions
    finalize only when the watermark clears end+gap+lateness; late
    events counted."""
    from hksketch.ray_glue.windows import SessionWindows

    S = 1_000_000  # 1s in us
    agg = SessionWindows(gap_seconds=10, allowed_lateness_seconds=15,
                         shards=2)
    try:
        # key 1: events at 0s and 20s -> two open sessions (gap 10s);
        # neither finalizes at wm 20s (0+10+15 > 20)
        agg.add_batch(np.array([1, 1]), np.array([0, 20 * S]))
        assert agg.poll().num_rows == 0
        # bridge at 10s (exactly gap from both ends; on time): MERGE
        agg.add_batch(np.array([1]), np.array([10 * S]))
        # advance watermark to 50s with another key
        agg.add_batch(np.array([2]), np.array([50 * S]))
        out = agg.poll().to_pydict()
        # merged session [0,20s] finalizes: 20+10+15 = 45 <= 50
        assert out["key"] == [1]
        assert out["session_start"] == [0]
        assert out["session_end"] == [20 * S]
        assert out["n_events"] == [3]
        assert agg.poll().num_rows == 0  # exactly once
        # late event behind the watermark is dropped + counted
        agg.add_batch(np.array([1]), np.array([5 * S]))
        assert agg.late_dropped() == 1
        final = agg.flush().to_pydict()
        assert final["key"] == [2]
        assert final["n_events"] == [1]
    finally:
        agg.shutdown()


def test_session_windows_match_batch_sessionize(ray_session):
    """Bounded-disorder replay of a synthetic stream: streamed sessions
    (extents, counts) equal the batch sessionization recompute."""
    import pandas as pd

    from hksketch.ray_glue.windows import SessionWindows

    rng = np.random.default_rng(4)
    n = 10_000
    ts = np.sort(rng.integers(0, 3_600_000_000, size=n))  # 1h of events
    idx = np.arange(n) + rng.integers(-32, 32, size=n)
    order = np.argsort(idx, kind="stable")
    ts_o = ts[order]
    keys = rng.integers(0, 40, size=n)[order]

    GAP = 5  # 5s gap
    agg = SessionWindows(gap_seconds=GAP, allowed_lateness_seconds=30,
                         shards=4)
    try:
        parts = []
        for i in range(0, n, 800):
            agg.add_batch(keys[i:i+800], ts_o[i:i+800])
            t = agg.poll()
            if t.num_rows:
                parts.append(t)
        parts.append(agg.flush())
        assert agg.late_dropped() == 0
        got = (
            pa.concat_tables(parts).to_pandas()
            .sort_values(["key", "session_start"]).reset_index(drop=True)
        )
        # batch recompute
        df = pd.DataFrame({"key": keys, "ts": ts_o}).sort_values(
            ["key", "ts"]
        )
        rows = []
        for k, g in df.groupby("key"):
            t_arr = g["ts"].to_numpy()
            brk = np.flatnonzero(
                np.concatenate(([True],
                                (t_arr[1:] - t_arr[:-1]) > GAP * 1_000_000))
            )
            ends = np.append(brk[1:], len(t_arr))
            for bs, be in zip(brk, ends):
                rows.append((k, t_arr[bs], t_arr[be - 1], be - bs))
        want = pd.DataFrame(
            rows, columns=["key", "session_start", "session_end",
                           "n_events"]
        ).sort_values(["key", "session_start"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64")
        )
    finally:
        agg.shutdown()


def test_session_windows_guards(ray_session):
    from hksketch.ray_glue.windows import SessionWindows

    with pytest.raises(ValueError):
        SessionWindows(gap_seconds=0)
    with pytest.raises(ValueError):
        SessionWindows(gap_seconds=1, shards=5)


def test_checkpoint_restore_continues_exactly_once(ray_session):
    """Feed half the stream, checkpoint, KILL the aggregator, restore a
    fresh one, feed the rest: finalized windows (and late counts) equal
    the uninterrupted run — including the exactly-once frontier."""
    import pandas as pd

    from hksketch.ray_glue.windows import WindowedAggregator

    rng = np.random.default_rng(6)
    n = 8_000
    ts = np.sort(rng.integers(0, 240_000_000, size=n))
    keys = rng.integers(0, 20, size=n)
    vals = rng.integers(1, 30, size=n)

    def run(split):
        agg = WindowedAggregator(
            window_seconds=15, allowed_lateness_seconds=5, shards=2
        )
        parts = []
        try:
            for i in range(0, split, 600):
                j = min(i + 600, split)
                agg.add_batch(_batch(keys[i:j], ts[i:j], vals[i:j]))
                t = agg.poll()
                if t.num_rows:
                    parts.append(t)
            if split < n:
                chk = agg.checkpoint()
                agg.shutdown()
                agg = WindowedAggregator.from_checkpoint(chk)
                for i in range(split, n, 600):
                    agg.add_batch(_batch(keys[i:i+600], ts[i:i+600],
                                         vals[i:i+600]))
                    t = agg.poll()
                    if t.num_rows:
                        parts.append(t)
            parts.append(agg.flush())
            return (
                pa.concat_tables(parts).to_pandas()
                .sort_values(["window_start", "key"])
                .reset_index(drop=True)
            )
        finally:
            agg.shutdown()

    uninterrupted = run(n)
    restarted = run(n // 2 + 37)
    pd.testing.assert_frame_equal(uninterrupted, restarted)


def test_checkpoint_param_mismatch_refused(ray_session):
    from hksketch.ray_glue.windows import WindowedAggregator

    a = WindowedAggregator(window_seconds=10, shards=2)
    try:
        a.add_batch(_batch([1], [1_000_000], [2]))
        chk = a.checkpoint()
    finally:
        a.shutdown()
    chk["params"]["w_us"] = 20_000_000  # tampered window size
    with pytest.raises(Exception, match="params mismatch"):
        WindowedAggregator.from_checkpoint(chk)


def test_actor_crash_recovery_via_checkpoint_replay(ray_session):
    """Kafka-style recovery drill: checkpoint after every batch, KILL a
    shard actor mid-stream, restore the aggregator from the last
    checkpoint and REPLAY the source from that offset — finalized
    windows equal the uninterrupted run (emitted-but-refed windows are
    impossible: the restored exactly-once frontier rejects re-emission,
    and pre-frontier events count as late only if beyond the budget —
    here the replay resumes exactly at the checkpoint offset)."""
    import pandas as pd
    import ray

    from hksketch.ray_glue.windows import WindowedAggregator

    rng = np.random.default_rng(8)
    n = 6_000
    ts = np.sort(rng.integers(0, 180_000_000, size=n))
    keys = rng.integers(0, 15, size=n)
    vals = rng.integers(1, 20, size=n)
    B = 500

    def uninterrupted():
        agg = WindowedAggregator(window_seconds=10, shards=2)
        parts = []
        try:
            for i in range(0, n, B):
                agg.add_batch(_batch(keys[i:i+B], ts[i:i+B], vals[i:i+B]))
                t = agg.poll()
                if t.num_rows:
                    parts.append(t)
            parts.append(agg.flush())
            return (
                pa.concat_tables(parts).to_pandas()
                .sort_values(["window_start", "key"]).reset_index(drop=True)
            )
        finally:
            agg.shutdown()

    def crashy(kill_at_batch=6):
        agg = WindowedAggregator(window_seconds=10, shards=2)
        parts = []
        chk, chk_offset = agg.checkpoint(), 0
        try:
            i = 0
            killed = False
            while i < n:
                if not killed and i // B == kill_at_batch:
                    ray.kill(agg.shards[0])  # simulate node loss
                    killed = True
                try:
                    agg.add_batch(
                        _batch(keys[i:i+B], ts[i:i+B], vals[i:i+B])
                    )
                except ray.exceptions.RayActorError:
                    # recover: fresh actors from the last checkpoint,
                    # replay the source from the checkpoint offset
                    agg.shutdown()
                    agg = WindowedAggregator.from_checkpoint(chk)
                    i = chk_offset
                    continue
                t = agg.poll()
                if t.num_rows:
                    parts.append(t)
                i += B
                chk, chk_offset = agg.checkpoint(), i
            parts.append(agg.flush())
            return (
                pa.concat_tables(parts).to_pandas()
                .sort_values(["window_start", "key"]).reset_index(drop=True)
            )
        finally:
            agg.shutdown()

    a = uninterrupted()
    b = crashy()
    # exactly-once across the crash: no duplicated (window, key) rows
    assert not b.duplicated(["window_start", "key"]).any()
    pd.testing.assert_frame_equal(a, b)


def test_windowed_distinct_exact_regime(ray_session):
    """Per-window KMV distinct counts: exact when sketch k exceeds
    per-window cardinality, merged across key-hash shards."""
    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.windows import WindowedDistinct

    rng = np.random.default_rng(9)
    n = 6_000
    ts = np.sort(rng.integers(0, 120_000_000, size=n))  # two 60s windows
    keys = rng.integers(0, 300, size=n)
    cfg = sketch_config("reservoir", k=2048, seed=5)
    agg = WindowedDistinct(
        cfg, window_seconds=60, allowed_lateness_seconds=5, shards=4
    )
    try:
        parts = []
        for i in range(0, n, 900):
            agg.add_batch(keys[i:i+900], ts[i:i+900])
            t = agg.poll()
            if t.num_rows:
                parts.append(t)
        parts.append(agg.flush())
        assert agg.late_dropped() == 0
        got = pa.concat_tables(parts).to_pydict()
        win = (ts // 60_000_000) * 60_000_000
        want_w = sorted(set(win.tolist()))
        want_n = [len(set(keys[win == w].tolist())) for w in want_w]
        assert got["window_start"] == want_w
        assert got["n_distinct"] == want_n
    finally:
        agg.shutdown()


def test_session_checkpoint_restore_equals_uninterrupted(ray_session):
    import pandas as pd

    from hksketch.ray_glue.windows import SessionWindows

    rng = np.random.default_rng(11)
    n = 6_000
    ts = np.sort(rng.integers(0, 1_200_000_000, size=n))
    keys = rng.integers(0, 25, size=n)

    def run(split):
        agg = SessionWindows(gap_seconds=4, allowed_lateness_seconds=10,
                             shards=2)
        parts = []
        try:
            for i in range(0, split, 700):
                j = min(i + 700, split)
                agg.add_batch(keys[i:j], ts[i:j])
                t = agg.poll()
                if t.num_rows:
                    parts.append(t)
            if split < n:
                chk = agg.checkpoint()
                agg.shutdown()
                agg = SessionWindows.from_checkpoint(chk)
                for i in range(split, n, 700):
                    agg.add_batch(keys[i:i+700], ts[i:i+700])
                    t = agg.poll()
                    if t.num_rows:
                        parts.append(t)
            parts.append(agg.flush())
            return (
                pa.concat_tables(parts).to_pandas()
                .sort_values(["key", "session_start"])
                .reset_index(drop=True)
            )
        finally:
            agg.shutdown()

    pd.testing.assert_frame_equal(run(n), run(n // 2 + 111))


def test_sketch_window_checkpoint_restore(ray_session):
    """WindowedDistinct checkpoint mid-stream; restored run equals the
    uninterrupted one (sketch blobs round-trip with the frontier)."""
    import pandas as pd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.windows import WindowedDistinct

    rng = np.random.default_rng(12)
    n = 6_000
    ts = np.sort(rng.integers(0, 180_000_000, size=n))
    keys = rng.integers(0, 200, size=n)
    cfg = sketch_config("reservoir", k=1024, seed=3)

    def run(split):
        agg = WindowedDistinct(cfg, window_seconds=15,
                               allowed_lateness_seconds=5, shards=2)
        parts = []
        try:
            for i in range(0, split, 700):
                j = min(i + 700, split)
                agg.add_batch(keys[i:j], ts[i:j])
                t = agg.poll()
                if t.num_rows:
                    parts.append(t)
            if split < n:
                chk = agg.checkpoint()
                agg.shutdown()
                agg = WindowedDistinct.from_checkpoint(chk)
                for i in range(split, n, 700):
                    agg.add_batch(keys[i:i+700], ts[i:i+700])
                    t = agg.poll()
                    if t.num_rows:
                        parts.append(t)
            parts.append(agg.flush())
            return (
                pa.concat_tables(parts).to_pandas()
                .sort_values("window_start").reset_index(drop=True)
            )
        finally:
            agg.shutdown()

    pd.testing.assert_frame_equal(run(n), run(n // 2 + 53))


def test_topk_window_checkpoint_restore(ray_session):
    import pandas as pd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.windows import WindowedTopK

    rng = np.random.default_rng(13)
    n = 5_000
    ts = np.sort(rng.integers(0, 120_000_000, size=n))
    keys = np.array([f"u{v}" for v in rng.zipf(1.5, size=n) % 50],
                    dtype=object)
    cfg = sketch_config("bucketed", k=512, width=1 << 11, depth=4,
                        decay=0.9, seed=2)

    def run(split):
        agg = WindowedTopK(cfg, k=8, window_seconds=30,
                           allowed_lateness_seconds=5, shards=2)
        parts = []
        try:
            for i in range(0, split, 600):
                j = min(i + 600, split)
                agg.add_batch(keys[i:j], ts[i:j])
                t = agg.poll()
                if t.num_rows:
                    parts.append(t)
            if split < n:
                chk = agg.checkpoint()
                agg.shutdown()
                agg = WindowedTopK.from_checkpoint(chk)
                for i in range(split, n, 600):
                    agg.add_batch(keys[i:i+600], ts[i:i+600])
                    t = agg.poll()
                    if t.num_rows:
                        parts.append(t)
            parts.append(agg.flush())
            return (
                pa.concat_tables(parts).to_pandas()
                .reset_index(drop=True)
            )
        finally:
            agg.shutdown()

    pd.testing.assert_frame_equal(run(n), run(n // 2 + 29))


def test_checkpoint_restores_non_round_us_params(ray_session):
    """Regression: from_checkpoint rebuilds µs params through float
    seconds; int() truncation turned 1_000_001 µs into 1_000_000 µs and
    the shard restore raised a spurious param mismatch.  round() (plus
    the exact-int sync) must make every integer-µs setting restorable."""
    from hksketch.ray_glue.windows import (
        SessionWindows, WindowedAggregator,
    )

    # 1.000001 s window, 2.3 s lateness, 0.200001 s slide — none of
    # these µs values survive int(x/1e6*1e6) truncation.
    w_us, late_us = 1_000_001 * 5, 2_300_000
    a = WindowedAggregator(
        window_seconds=(w_us) / 1e6,
        allowed_lateness_seconds=late_us / 1e6,
        slide_seconds=(w_us // 5) / 1e6,
        shards=2,
    )
    try:
        assert (a.w_us, a.late_us, a.slide_us) == (w_us, late_us, w_us // 5)
        a.add_batch(_batch([1, 2], [500_000, 2_500_000], [3, 4]))
        chk = a.checkpoint()
    finally:
        a.shutdown()
    b = WindowedAggregator.from_checkpoint(chk)  # must not raise
    try:
        assert (b.w_us, b.late_us, b.slide_us) == (w_us, late_us, w_us // 5)
        t = b.flush()
        assert t.num_rows == 10  # 2 events × (w/slide = 5) sliding panes
    finally:
        b.shutdown()

    s = SessionWindows(gap_seconds=2.3, allowed_lateness_seconds=0.000001)
    try:
        assert (s.gap_us, s.late_us) == (2_300_000, 1)
        s.add_batch([7], [1_000_000])
        chk = s.checkpoint()
    finally:
        s.shutdown()
    s2 = SessionWindows.from_checkpoint(chk)
    try:
        assert (s2.gap_us, s2.late_us) == (2_300_000, 1)
        assert s2.flush().num_rows == 1
    finally:
        s2.shutdown()
