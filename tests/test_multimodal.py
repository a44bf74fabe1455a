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
    assert out.column_names == ["id", "pixels", "height", "width"]
    assert len(out.column("pixels")[0].as_py()) == 32 * 32 * 3
    out2 = ImageDecodeStage()(_image_table())
    assert out.equals(out2)  # fake decode is deterministic


def test_image_decode_strict_raises():
    with pytest.raises(NotImplementedError):
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
