"""Round-5 items: Dataset-end-to-end pair flow (candidate pairs never
materialize on the driver), shard-grouped per-group caps, and the
broadcast-join ray.put contract."""

import os
import tracemalloc

import numpy as np
import pyarrow as pa
import pytest


# ---------- VERDICT r4 #3: pair_flow_plan partitioned write ----------


def test_pair_flow_plan_partitioned_write(ray_session, tmp_path):
    """The plan writes one sorted-unique parquet slice per shard whose
    union is exactly the distinct pair set, dedups cross-band duplicate
    pairs, strips drop sentinels into aggregate counts, and the driver
    table holds only DISTINCT (doc, shard) targets."""
    import ray.data as rd

    from hksketch.dedup.pairverify import pair_flow_plan, read_pair_slice
    from hksketch.dedup.runs import append_drop_sentinels

    rng = np.random.default_rng(11)
    n = 5_000
    a = rng.integers(0, 300, n).astype(np.int64)
    b = a + 1 + rng.integers(0, 50, n).astype(np.int64)
    t = pa.table({"a": pa.array(a, type=pa.int64()),
                  "b": pa.array(b, type=pa.int64())})
    # duplicate every pair once (the multi-band collision shape) and add
    # two sentinel batches worth of drop accounting
    dup = pa.concat_tables([t, t])
    with_sent = append_drop_sentinels(dup, "b", dropped_pairs=7, dropped_runs=2)
    cand_ds = rd.from_arrow(with_sent)

    shards, targets_ref, need, pair_dir, dp, dbk = pair_flow_plan(
        cand_ds, shards=32, scratch=str(tmp_path / "pairs")
    )
    assert shards == 32
    assert dp == 7 and dbk == 2

    want = np.unique(np.stack([a, b], axis=1), axis=0)
    got_a, got_b = [], []
    n_files = 0
    for s in range(shards):
        sa, sb = read_pair_slice(pair_dir, s)
        if len(sa):
            n_files += 1
            # each slice is itself sorted-unique
            k = sa.astype(object) * (1 << 32) + sb.astype(object)
            assert all(k[i] < k[i + 1] for i in range(len(k) - 1))
        got_a.append(sa)
        got_b.append(sb)
    assert n_files > 1  # genuinely partitioned
    got = np.unique(
        np.stack([np.concatenate(got_a), np.concatenate(got_b)], axis=1), axis=0
    )
    assert np.array_equal(got, want)
    assert len(got) == sum(len(x) for x in got_a)  # no cross-shard dup

    td, ts = ray_session.get(targets_ref)
    # targets are distinct (doc, shard) rows covering every pair side
    pairs_seen = set(zip(td.tolist(), ts.tolist()))
    assert len(pairs_seen) == len(td)
    assert np.array_equal(need, np.unique(np.concatenate([a, b])))


def test_pair_flow_driver_allocation_independent_of_pairs(ray_session, tmp_path):
    """Driver-side allocation during the plan is bounded by the DOC count,
    not the pair count: 10x the distinct pairs over the same 600 docs must
    not grow the driver's Python allocation peak materially (the pair
    table lives in worker-written parquet slices, the driver sees only the
    (doc, shard) target table)."""
    import ray.data as rd

    from hksketch.dedup.pairverify import pair_flow_plan

    def make(n_pairs: int, seed: int):
        rng = np.random.default_rng(seed)
        # distinct pairs over a FIXED 600-doc universe
        seen = set()
        while len(seen) < n_pairs:
            x = rng.integers(0, 600, size=n_pairs * 2).astype(np.int64)
            y = rng.integers(0, 600, size=n_pairs * 2).astype(np.int64)
            for i in range(len(x)):
                if x[i] < y[i]:
                    seen.add((int(x[i]), int(y[i])))
                    if len(seen) >= n_pairs:
                        break
        arr = np.array(sorted(seen), dtype=np.int64)
        return pa.table({"a": pa.array(arr[:, 0]), "b": pa.array(arr[:, 1])})

    def peak(n_pairs: int, seed: int, tag: str) -> int:
        cand = rd.from_arrow(make(n_pairs, seed))
        tracemalloc.start()
        tracemalloc.reset_peak()
        pair_flow_plan(cand, shards=32, scratch=str(tmp_path / tag))
        _, pk = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        return pk

    peak(2_000, 1, "warm")  # warm caches/imports out of the measurement
    small = peak(2_000, 2, "small")
    big = peak(20_000, 3, "big")
    # 10x pairs; same doc universe → driver peak must stay ~flat.  Allow
    # 3x headroom for allocator noise; the failing (driver-collected)
    # shape would show ~10x.
    assert big < max(small, 1_000_000) * 3, (small, big)


def test_verify_flow_matches_distributed(ray_session, tmp_path):
    """verify_pairs_flow (Dataset end-to-end) returns exactly the pairs
    verify_pairs_distributed confirms, with identical jaccard values."""
    import ray.data as rd

    from hksketch.dedup.minhash import (
        MinHasher,
        lsh_candidate_pair_rows,
        lsh_candidate_pairs,
        verify_pairs_distributed,
        verify_pairs_flow,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(60)]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
    docs = []
    for d in base:
        docs.append(d)
        if rng.random() < 0.6:  # near-dup with a small edit
            toks = d.split()
            toks[int(rng.integers(0, len(toks)))] = "zzz"
            docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), type=pa.int64()),
                  "text": pa.array(docs, type=pa.string())})
    ds = rd.from_arrow(t)
    mh = MinHasher(num_perm=64, ngram=3, seed=9)

    def stage(batch):
        return mh.band_rows(
            batch.column("text").combine_chunks(),
            batch.column("doc_id").to_numpy(), 16,
        )

    rows = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
    old = verify_pairs_distributed(
        ds, lsh_candidate_pairs(rows), mh, "text", "doc_id", 0.5, chunk_pairs=13
    )

    rows2 = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)
    got_ds, pair_dir = verify_pairs_flow(
        ds, lsh_candidate_pair_rows(rows2), mh, "text", "doc_id", 0.5,
        shards=16, chunk_pairs=13, scratch=str(tmp_path / "flow"),
    )
    parts = [x for x in ray_session.get(got_ds.to_arrow_refs()) if x.num_rows]
    new = pa.concat_tables(parts).combine_chunks().sort_by(
        [("a", "ascending"), ("b", "ascending")]
    )
    assert new.num_rows == old.num_rows > 0
    assert new.column("a").to_pylist() == old.column("a").to_pylist()
    assert new.column("b").to_pylist() == old.column("b").to_pylist()
    assert np.allclose(
        new.column("jaccard").to_numpy(), old.column("jaccard").to_numpy()
    )
    # partitioned slices really exist on shared storage
    assert any(
        f.startswith("pairs_") for f in os.listdir(pair_dir)
    )


# ---------- VERDICT r4 #10: real-PNG decode branch, no PIL to WRITE ----------


def _png_rgb(pixels: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG encoder via raw zlib — no imaging library
    needed to WRITE one, so the real-decode branch is exercisable in a
    codec-less container the moment PIL appears."""
    import struct
    import zlib

    h, w, _ = pixels.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_image_decode_real_png_and_mixed_failure_accounting(ray_session):
    """A real PNG written with raw zlib drives the PIL branch when PIL is
    importable (pixel-exact roundtrip, decode_failed=False) while garbage
    payloads in the SAME batch are flagged decode_failed=True; without PIL
    every row flags decode_failed=True via the deterministic fake.  Green
    in both environments."""
    import ray.data as rd

    from hksketch.multimodal.stubs import ImageDecodeStage

    rng = np.random.default_rng(21)
    w = h = 8
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    png = _png_rgb(img)
    garbage = b"NOTANIMAGE" + bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    t = pa.table(
        {"id": pa.array([0, 1], type=pa.int64()),
         "image": pa.array([png, garbage], type=pa.binary())}
    )
    out = (
        rd.from_arrow(t)
        .map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs=dict(width=w, height=h),
            batch_size=2, concurrency=1, batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    flags = out["decode_failed"].tolist()
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except Exception:
        have_pil = False
    if have_pil:
        assert flags == [False, True]
        got = np.array(out.loc[0, "pixels"], dtype=np.uint8).reshape(h, w, 3)
        assert np.array_equal(got, img)  # pixel-exact real decode
    else:
        assert flags == [True, True]
    # the fake fallback is deterministic either way: same garbage payload
    # decodes to the same pixels across runs
    out2 = (
        rd.from_arrow(t)
        .map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs=dict(width=w, height=h),
            batch_size=2, concurrency=1, batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out.loc[1, "pixels"]) == list(out2.loc[1, "pixels"])


def test_png_writer_is_a_valid_png():
    """The raw-zlib PNG writer emits a structurally valid file (magic,
    IHDR geometry, CRCs) — checked without PIL so the writer itself is
    covered even in the codec-less container."""
    import struct
    import zlib

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    blob = _png_rgb(img)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    off, seen, chunks = 8, [], {}
    while off < len(blob):
        (ln,) = struct.unpack(">I", blob[off : off + 4])
        tag = blob[off + 4 : off + 8]
        payload = blob[off + 8 : off + 8 + ln]
        (crc,) = struct.unpack(">I", blob[off + 8 + ln : off + 12 + ln])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF), tag
        seen.append(tag)
        chunks[tag] = payload
        off += 12 + ln
    assert seen == [b"IHDR", b"IDAT", b"IEND"]
    w, h = struct.unpack(">II", chunks[b"IHDR"][:8])
    assert (w, h) == (8, 8)
    # the IDAT inflates to h filter-prefixed scanlines of the raw pixels
    raw = zlib.decompress(chunks[b"IDAT"])
    assert len(raw) == 8 * (1 + 8 * 3)
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(8, 1 + 8 * 3)
    assert (scan[:, 0] == 0).all()  # filter byte 0 per scanline
    assert np.array_equal(scan[:, 1:].reshape(8, 8, 3), img)


# ---------- reference C-API completeness: deprecated query alias ----------


def test_query_alias_deprecated_on_all_variants():
    import warnings

    from hksketch.sketch import BucketedTopK, CuckooTopK, TopK

    for cls in (TopK, BucketedTopK, CuckooTopK):
        sk = cls(5, 64, 2, 0.9)
        sk.add("x")
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert sk.query("x") is True
            assert sk.query("zzz") is False
        assert any(issubclass(r.category, DeprecationWarning) for r in rec)


# ---------- VERDICT r4 #4: caps at unbounded group count ----------


def test_cap_per_group_shard_grouped_many_groups(ray_session):
    """10k distinct groups flow through the fixed-cardinality shard
    reduce and match the brute-force per-group top-N exactly."""
    import ray.data as rd

    from hksketch.pipelines.caps import cap_per_group, lcg_rank

    rng = np.random.default_rng(3)
    n = 60_000
    g = rng.integers(0, 10_000, n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"grp": pa.array(g), "id": pa.array(ids)})
    out = cap_per_group(
        rd.from_arrow(t), "grp", "id", n=3, shards=16
    ).to_pandas()
    assert (out.groupby("grp").size() <= 3).all()
    # brute force
    import pandas as pd

    df = pd.DataFrame({"grp": g, "id": ids})
    df["rank"] = lcg_rank(df["id"].to_numpy())
    want = (
        df.sort_values(["grp", "rank", "id"]).groupby("grp").head(3)
    )
    got = set(zip(out["grp"], out["id"]))
    assert got == set(zip(want["grp"], want["id"]))


def test_minhash_near_dupes_routes_agree(ray_session):
    """minhash_near_dupes' volume-routed verify: the small-regime
    (collected + per-shard refs) and flow (Dataset end-to-end) paths
    return identical confirmed pairs and jaccard values."""
    import ray.data as rd

    from hksketch.dedup.minhash import minhash_near_dupes

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(80)]
    docs = []
    for i in range(40):
        d = " ".join(rng.choice(vocab, 50))
        docs.append(d)
        if rng.random() < 0.5:
            toks = d.split()
            toks[int(rng.integers(0, len(toks)))] = "qqq"
            docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), type=pa.int64()),
                  "text": pa.array(docs, type=pa.string())})
    kw = dict(num_perm=64, bands=16, ngram=3, seed=4, verify_threshold=0.5)
    small = minhash_near_dupes(rd.from_arrow(t), "text", "doc_id", **kw)
    flow = minhash_near_dupes(
        rd.from_arrow(t), "text", "doc_id", flow_min_pairs=0, **kw
    )
    assert small.num_rows == flow.num_rows > 0
    assert small.column("a").to_pylist() == flow.column("a").to_pylist()
    assert small.column("b").to_pylist() == flow.column("b").to_pylist()
    assert np.allclose(
        small.column("jaccard").to_numpy(), flow.column("jaccard").to_numpy()
    )


def test_fold_grouped_partials_matches_shuffle_groupby(ray_session):
    """Driver fold of per-batch partials == Ray Data groupby().aggregate()
    (and polars type round-trips are cast back to the partials' schema)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from hksketch.pipelines.ops import fold_grouped_partials, grouped_count

    rng = np.random.default_rng(8)
    n = 40_000
    t = pa.table(
        {"g1": pa.array(rng.choice(["a", "b", "c"], n)),
         "g2": pa.array(rng.integers(0, 7, n), type=pa.int32()),
         "v": pa.array(rng.integers(-50, 50, n), type=pa.int64())}
    )
    import polars as pl

    def pre(b):
        return (
            pl.from_arrow(b).group_by(["g1", "g2"])
            .agg(pl.col("v").sum(), pl.len().cast(pl.Int64).alias("n"))
            .to_arrow()
            .cast(pa.schema([("g1", pa.string()), ("g2", pa.int32()),
                             ("v", pa.int64()), ("n", pa.int64())]))
        )

    ds = rd.from_arrow(t).repartition(9)
    folded = fold_grouped_partials(
        ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        ["g1", "g2"], ["v", "n"],
    )
    want = (
        rd.from_arrow(t).groupby(["g1", "g2"])
        .aggregate(Sum("v", alias_name="v")).to_pandas()
        .sort_values(["g1", "g2"]).reset_index(drop=True)
    )
    got = folded.to_pandas()[["g1", "g2", "v"]]
    assert got["v"].tolist() == want["v"].tolist()
    assert got["g1"].tolist() == want["g1"].tolist()
    assert folded.schema.field("g2").type == pa.int32()
    assert int(folded.column("n").to_pandas().sum()) == n

    # grouped_count merge_via="driver" == shuffle path
    drv = grouped_count(
        rd.from_arrow(t), ["g1", "g2"], count_name="c", merge_via="driver"
    ).to_pandas().sort_values(["g1", "g2"]).reset_index(drop=True)
    shf = grouped_count(rd.from_arrow(t), ["g1", "g2"], count_name="c") \
        .to_pandas().sort_values(["g1", "g2"]).reset_index(drop=True)
    assert drv["c"].tolist() == shf["c"].tolist()

    # empty input → None from the fold
    empty = rd.from_arrow(t.slice(0, 0))
    assert fold_grouped_partials(
        empty.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True),
        ["g1", "g2"], ["v", "n"],
    ) is None


def test_user_anotb_kmv_matches_duckdb(ray_session):
    """Pin the θ-sketch A-NOT-B query at sf0.001: exact regime (k=8192 ≫
    purchasers) must reproduce DuckDB's set-difference counts bit-exact."""
    import glob

    import duckdb
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    res = e.queries()["user_anotb_kmv"](sf)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    con = duckdb.connect()
    for f in glob.glob(f"{sf}/*.parquet"):
        name = f.rsplit("/", 1)[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    ref = con.sql(e.oracle_sql()["user_anotb_kmv"]).df()
    assert sorted(res.columns) == sorted(ref.columns)
    got = res[sorted(res.columns)].iloc[0].tolist()
    want = ref[sorted(ref.columns)].iloc[0].tolist()
    assert got == want, (got, want)
