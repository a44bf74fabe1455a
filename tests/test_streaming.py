"""Query-at-any-time streaming sketch actors."""

import numpy as np


def test_streaming_topk_query_any_time(ray_session):
    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.streaming import StreamingSketch

    cfg = sketch_config("bucketed", k=20, width=4096, depth=4, decay=0.9, seed=3)
    st = StreamingSketch(cfg, shards=3)
    rng = np.random.default_rng(0)
    keys = rng.zipf(1.4, size=60_000).astype(np.int64)

    import collections

    truth = collections.Counter()
    chunks = np.array_split(keys, 12)
    # mid-stream query after a third of the data
    for c in chunks[:4]:
        st.add_batch(c.tolist())
        truth.update(c.tolist())
    mid = dict(st.list())
    top_true_mid = truth.most_common(5)
    for k, c in top_true_mid:
        assert mid.get(k) == c  # exact regime: live counts match truth
    # stream the rest, query again
    for c in chunks[4:]:
        st.add_batch(c.tolist())
        truth.update(c.tolist())
    assert st.flush() == len(keys)
    final = dict(st.list())
    for k, c in truth.most_common(5):
        assert final.get(k) == c
    assert st.count(int(truth.most_common(1)[0][0])) == truth.most_common(1)[0][1]
    st.shutdown()


def test_streaming_hll(ray_session):
    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.streaming import StreamingSketch

    st = StreamingSketch(sketch_config("hll", p=12, seed=1), shards=2)
    for i in range(4):
        st.add_batch(list(range(i * 10_000, (i + 1) * 10_000)))
    est = st.snapshot().estimate()
    assert abs(est - 40_000) / 40_000 < 0.05
    st.shutdown()
