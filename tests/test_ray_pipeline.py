"""End-to-end Ray Data pipeline tests on the deterministic webpages fixture
(SURVEY.md §7.1 minimum slice + §7.2.3-6)."""

import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _truth_hosts(pages_dir):
    t = pq.read_table(pages_dir, columns=["url"])
    hosts = [u.split("//")[1].split("/")[0] for u in t.column("url").to_pylist()]
    return collections.Counter(hosts)


def test_flagship_webpages_pipeline(ray_session, webpages_tiny):
    from hksketch.pipelines.flagship import webpages_flagship

    out = webpages_flagship(webpages_tiny, k=20, seed=7)
    truth = _truth_hosts(webpages_tiny)
    top = out["topk_hosts"]
    # exact regime (width >> hosts): counts match the exact oracle
    got = dict(zip(top.column("host").to_pylist(), top.column("count").to_pylist()))
    for host, c in got.items():
        assert truth[host] == c
    true20 = [h for h, _ in sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:20]]
    assert set(got) == set(true20)
    # HLL distinct urls within 3σ
    n_urls = pq.read_table(webpages_tiny, columns=["url"]).num_rows
    assert abs(out["distinct_urls"] - n_urls) / n_urls < 3 * 1.04 / np.sqrt(1 << 14)


def test_global_sketch_matches_local(ray_session, webpages_tiny):
    """Distributed tree-merged sketch == single-process sketch on the same
    rows (merge-compatibility across workers, SURVEY.md §1.2)."""
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import global_sketch
    from hksketch.sketch import BucketedTopK, sketch_from_bytes

    ds = rd.read_parquet(webpages_tiny, columns=["lang"])
    cfg = sketch_config("bucketed", k=10, width=1024, depth=4, decay=0.9, seed=3)
    blob = global_sketch(ds, cfg, key_col="lang")
    dist = dict(sketch_from_bytes(blob).list())

    local = BucketedTopK(10, 1024, 4, 0.9, seed=3)
    t = pq.read_table(webpages_tiny, columns=["lang"])
    local.add_batch(t.column("lang").combine_chunks())
    assert dist == dict(local.list())


def test_grouped_sketch(ray_session, webpages_tiny):
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import grouped_sketch
    from hksketch.sketch import sketch_from_bytes

    ds = rd.read_parquet(webpages_tiny, columns=["lang", "text"])
    cfg = sketch_config("bucketed", k=64, width=4096, depth=4, decay=0.9, seed=3)
    out = grouped_sketch(ds, cfg, key_col="text", group_col="lang", tokenize=True)
    rows = out.take_all()
    assert {r["lang"] for r in rows} == {"en", "de", "fr"}
    # per-group counts match a per-group local tokenize+count
    from hksketch.text.tokenize import tokenize_text

    t = pq.read_table(webpages_tiny, columns=["lang", "text"])
    for row in rows:
        sk = sketch_from_bytes(row["sketch"])
        truth = collections.Counter()
        for lang, text in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
            if lang == row["lang"]:
                truth.update(tokenize_text(text))
        for item, count in sk.list()[:20]:
            assert truth[item] == count


def test_sketch_lookup_stage(ray_session, webpages_tiny):
    import ray
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import SketchLookup, global_sketch

    ds = rd.read_parquet(webpages_tiny, columns=["lang"])
    cfg = sketch_config("bucketed", k=10, width=1024, depth=4, decay=0.9, seed=3)
    blob = global_sketch(ds, cfg, key_col="lang")
    ref = ray.put(blob)
    annotated = ds.map_batches(
        SketchLookup,
        fn_constructor_args=(ref, "lang"),
        batch_format="pyarrow",
        concurrency=2,
    )
    rows = annotated.take(50)
    t = pq.read_table(webpages_tiny, columns=["lang"])
    truth = collections.Counter(t.column("lang").to_pylist())
    for r in rows:
        assert r["est_count"] == truth[r["lang"]]


def test_checkpoint_resume(ray_session, webpages_tiny, tmp_path):
    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.checkpoint import run_checkpointed_sketch
    from hksketch.sketch import sketch_from_bytes

    files = sorted(
        os.path.join(webpages_tiny, f)
        for f in os.listdir(webpages_tiny)
        if f.endswith(".parquet")
    )
    cfg = sketch_config("bucketed", k=50, width=4096, depth=4, decay=0.9, seed=3)
    ck = str(tmp_path / "ck")
    blob1, m1 = run_checkpointed_sketch(files, ck, cfg, key_col="lang")
    assert m1["resumed_skipped"] == 0 and m1["partitions"] == len(files)
    # resume: all partitions skipped, byte-identical result
    blob2, m2 = run_checkpointed_sketch(files, ck, cfg, key_col="lang")
    assert m2["resumed_skipped"] == len(files)
    assert sketch_from_bytes(blob1).list() == sketch_from_bytes(blob2).list()
    # param change → refuses the dir
    cfg2 = sketch_config("bucketed", k=51, width=4096, depth=4, decay=0.9, seed=3)
    with pytest.raises(ValueError):
        run_checkpointed_sketch(files, ck, cfg2, key_col="lang")
    # partial-state resume: delete one blob, rerun builds only that one
    os.remove(os.path.join(ck, "part-00000.sketch"))
    blob3, m3 = run_checkpointed_sketch(files, ck, cfg, key_col="lang")
    assert m3["resumed_skipped"] == len(files) - 1
    assert sketch_from_bytes(blob3).list() == sketch_from_bytes(blob1).list()
    # lineage carries the environment fingerprint; a drifted hash probe in
    # the persisted manifest is refused (cross-version merge guard)
    import json

    man_path = os.path.join(ck, "MANIFEST.json")
    man = json.load(open(man_path))
    assert man["hksketch_version"] and isinstance(man["hash_probe"], int)
    part_meta = json.load(open(os.path.join(ck, "part-00000.json")))
    assert part_meta["hash_probe"] == man["hash_probe"]
    man["hash_probe"] = man["hash_probe"] ^ 1
    json.dump(man, open(man_path, "w"))
    with pytest.raises(ValueError, match="hash environment"):
        run_checkpointed_sketch(files, ck, cfg, key_col="lang")


def test_extraction_invariant_distributed(ray_session, webpages_tiny):
    """Per-row invariant at the pipeline level: extract(html) == text for
    every url (BASELINE.json input_hint)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from hksketch.text.extract import extract_text_column

    ds = rd.read_parquet(webpages_tiny, columns=["url", "html", "text"])

    def check(b: pa.Table) -> pa.Table:
        ext = extract_text_column(b.column("html"))
        ok = pc.equal(ext, b.column("text").combine_chunks())
        return pa.table({"url": b.column("url"), "ok": ok})

    out = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
    assert all(r["ok"] for r in out.take_all())


def test_quantile_udaf_accuracy(ray_session):
    import ray.data as rd

    from hksketch.ray_glue.aggregate import TDigestQuantileAggregate

    rng = np.random.default_rng(0)
    vals = rng.random(50_000)
    ds = rd.from_arrow(pa.table({"v": vals}))
    agg = TDigestQuantileAggregate(on="v", qs=(0.1, 0.5, 0.9), compression=200, alias_name="q")
    got = ds.aggregate(agg)["q"]
    for est, q in zip(got, (0.1, 0.5, 0.9)):
        assert abs(est - q) < 0.02


def test_tree_merge_many_streaming_equals_sequential(ray_session):
    """Streaming chunked merge == plain sequential fold (same blobs)."""
    import numpy as np
    import pyarrow as pa

    from hksketch.ray_glue.aggregate import make_sketch, sketch_config
    from hksketch.ray_glue.stages import tree_merge_many_streaming
    from hksketch.sketch import sketch_from_bytes

    cfg = sketch_config("hll", p=12, seed=5)
    blobs = []
    rng = np.random.default_rng(0)
    for i in range(20):  # > fanin to force chunking
        sk = make_sketch(cfg)
        sk.add_batch(rng.integers(0, 100_000, 5000))
        blobs.append(sk.to_bytes())

    def batches():
        for i in range(0, 20, 3):
            chunk = blobs[i : i + 3]
            yield pa.table({"s": pa.array(chunk, type=pa.binary())})

    (merged,) = tree_merge_many_streaming(batches(), ["s"], fanin=8)
    ref = sketch_from_bytes(blobs[0])
    for b in blobs[1:]:
        ref.merge(sketch_from_bytes(b))
    assert sketch_from_bytes(merged).state_equal(ref)


def test_grouped_sketch_absorbs_hot_key_skew(ray_session):
    """North-rule skew contract: a group holding 50% of all rows reaches
    its reducer as ≤ #batches partial rows (one per (batch, group)), not
    #rows — the per-batch partial IS the salt.  Counts stay exact in the
    exact regime."""
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import grouped_sketch, make_partial_sketch_fn
    from hksketch.sketch import sketch_from_bytes

    rng = np.random.default_rng(0)
    n = 40_000
    hosts = np.where(
        rng.random(n) < 0.5, "hot.example.com",
        np.array([f"h{i}.example.com" for i in rng.integers(0, 40, n)]),
    )
    t = pa.table({"host": pa.array(hosts), "key": pa.array(rng.integers(0, 50, n))})
    ds = rd.from_arrow(t)
    cfg = sketch_config("bucketed", k=64, width=1024, depth=2, decay=0.9, seed=3)

    # shuffle-side volume: partial rows per group, ≤ number of batches
    fn = make_partial_sketch_fn(cfg, "key", group_col="host")
    partials = ds.map_batches(
        fn, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).take_all()
    n_batches = int(np.ceil(n / 4096)) + 2  # block splits may add a few
    hot_rows = sum(1 for r in partials if r["host"] == "hot.example.com")
    assert hot_rows <= n_batches  # 20k raw rows arrived as ≤ ~12 partials

    # end-to-end exactness for the hot group
    out = grouped_sketch(ds, cfg, key_col="key", group_col="host", batch_size=4096)
    hot = [r for r in out.take_all() if r["host"] == "hot.example.com"]
    assert len(hot) == 1
    got = dict(sketch_from_bytes(hot[0]["sketch"]).list())
    truth = collections.Counter(
        t.column("key").to_numpy()[hosts == "hot.example.com"].tolist()
    )
    assert {k: v for k, v in got.items()} == dict(truth)


def test_partial_sketch_retry_idempotent(ray_session, tmp_path):
    """The design claim behind stateless partial-per-batch accumulation
    (stages.py docstring): a retried task rebuilds the IDENTICAL partial,
    so a mid-run worker failure cannot double-count.  Inject one task
    failure; Ray retries; the merged counts still equal the exact truth."""
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import make_partial_sketch_fn, tree_merge_blobs
    from hksketch.sketch import sketch_from_bytes

    rng = np.random.default_rng(1)
    keys = rng.integers(0, 30, 20_000)
    t = pa.table({"key": pa.array(keys)})
    cfg = sketch_config("bucketed", k=64, width=1024, depth=2, decay=0.9, seed=3)
    inner = make_partial_sketch_fn(cfg, "key")
    flag = tmp_path / "injected_failure"

    def flaky(batch: pa.Table) -> pa.Table:
        # kill the WORKER PROCESS once (a system failure — Ray retries the
        # task; a user exception would not be retried)
        if not flag.exists():
            flag.touch()
            import os as _os

            _os._exit(1)
        return inner(batch)

    ds = rd.from_arrow(t).repartition(8)
    rows = ds.map_batches(
        flaky, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).take_all()
    blob = tree_merge_blobs([r["sketch"] for r in rows])
    got = dict(sketch_from_bytes(blob).list())
    truth = collections.Counter(keys.tolist())
    assert flag.exists()  # the failure really happened
    assert {k: v for k, v in got.items()} == dict(truth)


def test_grouped_partials_bytes_proportional_to_content(ray_session):
    """Long-tail cardinality contract (round-2 VERDICT #4): per-group
    partial blobs are sparse-packed, so a one-row host's partial is
    hundreds of bytes while the configured dense width would be ~100 KB —
    bytes ∝ group content, not sketch width."""
    import numpy as np
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import make_partial_sketch_fn

    rng = np.random.default_rng(5)
    # 2000 rows over 1500 hosts: mostly singleton groups (the hostname tail)
    hosts = np.array([f"h{i}.example" for i in rng.integers(0, 1500, 2000)])
    t = pa.table({"host": pa.array(hosts), "key": pa.array(rng.integers(0, 9, 2000))})
    cfg = sketch_config("bucketed", k=4096, width=1 << 15, depth=4, decay=0.9, seed=3)
    fn = make_partial_sketch_fn(cfg, "key", group_col="host")
    out = fn(t)
    sizes = [len(b) for b in out.column("sketch").to_pylist()]
    counts = out.column("n_rows").to_numpy()
    singleton = [s for s, c in zip(sizes, counts) if c == 1]
    assert singleton and max(singleton) < 2000  # ≪ dense ~330 KB
    # total partial volume for the whole long-tail batch stays small
    assert sum(sizes) < 2_000_000


def test_tokens_per_host_query_exact_vs_recompute(ray_session):
    """The per-hostname query's sketch counts equal an independent polars
    tokenize+count in the exact regime (k ≫ per-host vocab)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_rentry", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.queries()["tokens_per_host_sketch"]("unused")
    assert out.num_rows == 40  # 20 hosts × top-2

    import collections as _c

    from hksketch.text.tokenize import tokenize_text

    t = pq.read_table("/tmp/hksketch_fixtures/webpages_perhost",
                      columns=["url", "text"])
    per_host: dict = {}
    for url, text in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
        host = url.split("//")[1].split("/")[0]
        per_host.setdefault(host, _c.Counter()).update(tokenize_text(text))
    for host, token, count in zip(
        out.column("host").to_pylist(),
        out.column("token").to_pylist(),
        out.column("count").to_pylist(),
    ):
        assert per_host[host][token] == count, (host, token)


def test_bench_webpages_emits_per_doc_stats(ray_session, webpages_tiny, tmp_path):
    """The fused pass's per-doc work is observable: fingerprints + simhash
    + quality land in a parquet artifact with one row per page."""
    from hksketch.pipelines.flagship import bench_webpages

    out = str(tmp_path / "doc_stats")
    r = bench_webpages(webpages_tiny, doc_stats_dir=out)
    t = pq.read_table(out)
    assert t.num_rows == r["n_pages"] == r["doc_stats_rows"]
    assert {"url", "fingerprint", "simhash", "n_tokens", "alpha_ratio"} <= set(
        t.schema.names
    )
    # fingerprints match the standalone kernel for a sample row (the fused
    # pass derives them from the flagship-seed token-hash stream)
    from hksketch.hashing import hash_array
    from hksketch.text.analysis import doc_fingerprints_batch
    from hksketch.text.tokenize import tokenize_column

    src = pq.read_table(webpages_tiny, columns=["url", "text"])
    url0 = src.column("url")[0].as_py()
    toks = tokenize_column(src.column("text").combine_chunks().slice(0, 1),
                           with_doc_index=True)
    fp0 = doc_fingerprints_batch(
        token_hashes=hash_array(toks.column("token"), 12345),
        doc_idx=toks.column("doc_idx").to_numpy(),
        n_docs=1,
    )[0]
    got = t.filter(pa.array(
        [u == url0 for u in t.column("url").to_pylist()]
    )).column("fingerprint")[0].as_py()
    assert got == fp0


def test_sketch_partials_retry_idempotent(ray_session, tmp_path):
    """Lineage-based task retry (SURVEY §4.2 contract): a transient
    failure on the FIRST attempt of every partial-sketch task must leave
    the merged result bit-identical to a clean run — the per-batch
    partial is a pure function of the batch, so re-execution is
    idempotent.  Failure injection: one marker file per batch content
    hash; attempt 1 raises, the Ray retry (retry_exceptions) succeeds."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from hksketch.ray_glue.aggregate import sketch_config
    from hksketch.ray_glue.stages import make_partial_sketch_fn
    from hksketch.ray_glue.stages import tree_merge_blobs
    from hksketch.sketch import sketch_from_bytes

    rng = np.random.default_rng(8)
    keys = rng.zipf(1.3, 5000).astype(np.int64)
    t = pa.table({"k": pa.array(keys, type=pa.int64())})
    cfg = sketch_config("bucketed", k=50, width=1 << 10, depth=4,
                        decay=0.9, seed=3)
    fn = make_partial_sketch_fn(cfg, "k")
    marker_dir = str(tmp_path)

    def flaky(b: pa.Table) -> pa.Table:
        h = hashlib.sha1(
            b.column("k").combine_chunks().to_numpy().tobytes()
        ).hexdigest()
        mark = os.path.join(marker_dir, h)
        if not os.path.exists(mark):
            with open(mark, "w"):
                pass
            raise RuntimeError("injected transient failure (attempt 1)")
        return fn(b)

    def run(mapper):
        ds = rd.from_arrow(t).repartition(4)
        parts = ds.map_batches(
            mapper, batch_format="pyarrow", zero_copy_batch=True,
            retry_exceptions=True, max_retries=3,
        )
        blobs = [r["sketch"] for r in parts.take_all()]
        return tree_merge_blobs(blobs)

    clean = run(fn)
    retried = run(flaky)
    assert len(os.listdir(marker_dir)) >= 4  # every task failed once
    assert sketch_from_bytes(retried).list() == sketch_from_bytes(clean).list()


def test_run_flagship_job_entrypoint(webpages_tiny, tmp_path):
    """Drive scripts/run_flagship_job.py — the ``ray job submit``
    entrypoint — end-to-end in a fresh process: it must run the flagship
    pass, write the three top-k parquet outputs plus metrics.json, agree
    with itself across the checkpointed and streaming paths, and RESUME
    (skip all partitions) on a second invocation with the same
    checkpoint dir."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "run_flagship_job.py")
    out_dir = str(tmp_path / "job_out")
    ck_dir = str(tmp_path / "job_ckpt")

    def run():
        return subprocess.run(
            [sys.executable, script, "--input", webpages_tiny,
             "--output", out_dir, "--checkpoint-dir", ck_dir, "--k", "50"],
            capture_output=True, text=True, timeout=300,
        )

    r1 = run()
    assert r1.returncode == 0, r1.stderr[-2000:]
    metrics = json.loads(open(os.path.join(out_dir, "metrics.json")).read())
    assert metrics["n_pages"] == 1000
    assert metrics["total_tokens"] > 0
    assert metrics["checkpoint"]["resumed_skipped"] == 0
    assert metrics["checkpoint"]["partitions"] >= 1

    t_stream = pq.read_table(os.path.join(out_dir, "topk_tokens.parquet"))
    t_ck = pq.read_table(
        os.path.join(out_dir, "topk_tokens_checkpointed.parquet")
    )
    assert t_ck.num_rows == 50 and t_stream.num_rows > 0
    # same sketch params + exact regime (vocab 1000 < k·4) → the
    # checkpointed path must reproduce the streaming path's head
    # (the streaming table carries bench_webpages' own row limit)
    n = min(t_ck.num_rows, t_stream.num_rows)
    assert t_ck.slice(0, n).to_pydict() == t_stream.slice(0, n).to_pydict()
    hosts = pq.read_table(os.path.join(out_dir, "topk_hosts.parquet"))
    assert hosts.num_rows > 0

    # second run with the same checkpoint dir: every partition skips
    r2 = run()
    assert r2.returncode == 0, r2.stderr[-2000:]
    m2 = json.loads(open(os.path.join(out_dir, "metrics.json")).read())
    assert m2["checkpoint"]["resumed_skipped"] == m2["checkpoint"]["partitions"]
    t_ck2 = pq.read_table(
        os.path.join(out_dir, "topk_tokens_checkpointed.parquet")
    )
    assert t_ck2.to_pydict() == t_ck.to_pydict()
