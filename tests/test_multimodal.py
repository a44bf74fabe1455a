"""Multimodal stub stages: the decode is faked (no codec libs in the
container) but the Ray plumbing — schema, actor-pool signature, batch flow,
output layout — is real and exercised end to end."""

import numpy as np
import pyarrow as pa
import pytest

from hksketch.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    fake_image_bytes,
)


def _image_table(n=8):
    return pa.table(
        {
            "id": pa.array(range(n), type=pa.int64()),
            "image": pa.array([fake_image_bytes(i) for i in range(n)], type=pa.binary()),
        }
    )


def test_image_decode_schema_and_determinism():
    stage = ImageDecodeStage()
    out = stage(_image_table())
    assert out.column_names == ["id", "pixels", "height", "width", "decode_failed"]
    assert len(out.column("pixels")[0].as_py()) == 32 * 32 * 3
    out2 = ImageDecodeStage()(_image_table())
    assert out.equals(out2)  # fake decode is deterministic


def test_image_decode_strict_raises():
    """Strict mode on fixture (non-image) payloads: without a codec it
    raises NotImplementedError; with PIL present the codec's own decode
    error propagates (garbage input must fail loudly either way)."""
    try:
        import PIL.Image  # noqa: F401

        expected: tuple = (Exception,)
    except Exception:
        expected = (NotImplementedError,)
    with pytest.raises(expected):
        ImageDecodeStage(strict=True)(_image_table(1))


def test_resize_shapes():
    decoded = ImageDecodeStage()(_image_table(4))
    small = ImageResizeStage(out_w=8, out_h=8)(decoded)
    assert len(small.column("pixels")[0].as_py()) == 8 * 8 * 3
    assert small.column("width").to_pylist() == [8, 8, 8, 8]


def test_audio_features():
    t = pa.table(
        {"id": pa.array([1, 2], type=pa.int64()),
         "audio": pa.array([b"\x01" * 100, b"\x02" * 100], type=pa.binary())}
    )
    out = AudioFeatureStage(n_features=16)(t)
    assert len(out.column("features")[0].as_py()) == 16
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(strict=True)(t)


def test_video_frame_sampling():
    t = pa.table(
        {"id": pa.array([7], type=pa.int64()),
         "video": pa.array([bytes(range(256)) * 200], type=pa.binary())}  # 50 frames
    )
    out = VideoFrameSampleStage(frame_bytes=1024, every_n=10)(t)
    assert out.column("frame_idx").to_pylist() == [0, 10, 20, 30, 40]
    assert all(len(f) == 1024 for f in out.column("frame").to_pylist())


def test_pipeline_through_ray(ray_session):
    """Actor-pool plumbing: decode → resize as map_batches stages."""
    import ray.data as rd

    ds = rd.from_arrow(_image_table(16))
    out = (
        ds.map_batches(
            ImageDecodeStage, batch_format="pyarrow", batch_size=4, concurrency=2
        )
        .map_batches(
            ImageResizeStage,
            fn_constructor_kwargs={"out_w": 8, "out_h": 8},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
    )
    rows = out.take_all()
    assert len(rows) == 16
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in rows)


def test_image_decode_real_pil_path_strict():
    """Strict mode with a REAL codec: decodes actual encoded images.
    Runs with PIL when importable; skips otherwise (container has none)."""
    pytest.importorskip("PIL.Image")
    import io

    import numpy as np
    import PIL.Image

    from hksketch.multimodal.stubs import ImageDecodeStage

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)]
    payloads = []
    for m in imgs:
        buf = io.BytesIO()
        PIL.Image.fromarray(m).save(buf, format="PNG")
        payloads.append(buf.getvalue())
    batch = pa.table(
        {"id": pa.array([0, 1, 2], type=pa.int64()),
         "image": pa.array(payloads, type=pa.binary())}
    )
    out = ImageDecodeStage(width=8, height=8, strict=True)(batch)
    got = (
        out.column("pixels").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(3, 8, 8, 3)
    )
    for i in range(3):  # PNG is lossless → exact pixels back
        assert (got[i] == imgs[i]).all()


def test_image_decode_real_path_with_injected_codec(monkeypatch):
    """Exercise the PIL code path in THIS container by injecting a minimal
    PIL.Image shim — proves the real branch (open → convert → resize →
    asarray) is wired, not dead code behind the import guard."""
    import sys
    import types

    import numpy as np

    class _FakeImg:
        def __init__(self, payload: bytes):
            side = int(np.sqrt(len(payload) // 3))
            self._arr = np.frombuffer(payload[: side * side * 3], dtype=np.uint8)
            self._arr = self._arr.reshape(side, side, 3)
            self.size = (side, side)

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def resize(self, wh):
            w, h = wh
            yi = (np.arange(h) * self._arr.shape[0] // h)
            xi = (np.arange(w) * self._arr.shape[1] // w)
            out = _FakeImg(b"\0" * (w * h * 3))
            out._arr = self._arr[yi][:, xi]
            out.size = (w, h)
            return out

        def __array__(self, dtype=None):
            return self._arr.astype(dtype or np.uint8)

    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = lambda f: _FakeImg(f.read())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    from hksketch.multimodal.stubs import ImageDecodeStage

    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    batch = pa.table(
        {"id": pa.array([7], type=pa.int64()),
         "image": pa.array([raw.tobytes()], type=pa.binary())}
    )
    stage = ImageDecodeStage(width=8, height=8, strict=True)
    assert stage._have_codec
    out = stage(batch)
    got = (
        out.column("pixels").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        .reshape(1, 8, 8, 3)
    )
    yi = (np.arange(8) * 16 // 8)
    assert (got[0] == raw[yi][:, yi]).all()


def test_decode_failed_column_flags_fallback_rows():
    """Non-strict decode surfaces fake-substitution per row instead of
    silently synthesizing pixels for corrupt payloads."""
    import numpy as np

    from hksketch.multimodal.stubs import ImageDecodeStage

    stage = ImageDecodeStage()
    out = stage(_image_table())
    flags = out.column("decode_failed").to_pylist()
    assert len(flags) == out.num_rows
    if stage._have_codec:
        # fixture payloads are not decodable images → all flagged
        assert all(flags)
    else:
        assert all(flags)  # codec-less container: every decode is synthetic


def test_image_near_dupes_finds_identical_payloads(ray_session):
    """Identical payload bytes decode to identical pixels → hamming-0
    pair; unrelated payloads (independent fake pixels) stay unpaired."""
    import numpy as np
    import ray.data as rd

    from hksketch.multimodal.stubs import fake_image_bytes, image_near_dupes

    payloads = [fake_image_bytes(i) for i in range(40)]
    payloads.append(payloads[3])  # id 40 duplicates id 3
    t = pa.table(
        {"id": pa.array(np.arange(len(payloads), dtype=np.int64)),
         "image": pa.array(payloads, type=pa.binary())}
    )
    out = image_near_dupes(rd.from_arrow(t), max_hamming=2)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (3, 40) in pairs
    assert out.filter(
        pa.compute.equal(out.column("hamming"), 0)
    ).num_rows >= 1
    # random unrelated 64-bit hashes almost never collide within hamming 2
    assert len(pairs) <= 3
