"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
actor-pool decode / resize / feature-extract stages.

The image/audio codec libraries are not available in this container, so the
DECODE step is stubbed (clearly marked): with ``strict=True`` the stage
raises ``NotImplementedError`` exactly where a real decoder would plug in;
by default it produces a **deterministic fake decode** (seeded from the
payload hash) so the Ray-side plumbing — schema, batch size, actor
signature, memory shape, output layout — is real and testable end to end.

Scale notes baked into the stage defaults: binary payloads are large, so
``batch_size`` must be small (``DataContext.target_max_block_size`` governs
block splits); decode is CPU-heavy stateful work → callable CLASS passed to
``map_batches(..., concurrency=N, num_cpus=1)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_array

# suggested map_batches settings for large binary payloads
IMAGE_BATCH_SIZE = 64
AUDIO_BATCH_SIZE = 32


def fake_image_bytes(seed: int, w: int = 32, h: int = 32) -> bytes:
    """Deterministic fake 'encoded image' payload for fixtures."""
    rng = np.random.default_rng(seed)
    return b"FAKEIMG1" + rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()


def _decode_fake(payloads: pa.Array, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: pixels seeded by the payload hash — the
    placeholder for a real `PIL.Image.open` / `cv2.imdecode` call."""
    hashes = hash_array(payloads, 0x1A6E)
    out = np.empty((len(payloads), h, w, 3), dtype=np.uint8)
    for i, hv in enumerate(hashes):
        rng = np.random.default_rng(int(hv))
        out[i] = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return out


class ImageDecodeStage:
    """binary → uint8 HWC pixels (+pass-through id).

    REAL decode when PIL is importable (activates automatically): each
    payload goes through ``PIL.Image.open`` → ``convert("RGB")`` →
    ``resize((width, height))`` — per-image decode is inherently per-row;
    the vectorization rule applies to the array math around it, not the
    codec call.  Without a codec the stage falls back to the deterministic
    fake decode (seeded by payload hash) so the Ray-side plumbing stays
    testable; ``strict=True`` forbids the fake (raises where a real decoder
    is required)."""

    def __init__(self, image_col: str = "image", id_col: str = "id",
                 width: int = 32, height: int = 32, strict: bool = False):
        self.image_col = image_col
        self.id_col = id_col
        self.width = width
        self.height = height
        self.strict = strict
        try:  # the real path, when a codec library exists
            import PIL.Image  # noqa: F401

            self._have_codec = True
        except Exception:
            self._have_codec = False

    def _decode_real(self, payloads: pa.Array) -> "tuple[np.ndarray, np.ndarray]":
        """Per payload: PIL decode when the bytes ARE a decodable image;
        non-strict mode falls back to the deterministic fake for payloads
        PIL rejects (fixture blobs are not real encodings) and FLAGS the
        row in the returned failure mask — corrupt-image rates must be
        observable, not silently synthesized away; strict mode propagates
        the codec error (garbage input should fail loudly)."""
        import io

        import PIL.Image

        out = np.empty((len(payloads), self.height, self.width, 3), dtype=np.uint8)
        failed = np.zeros(len(payloads), dtype=bool)
        for i, payload in enumerate(payloads.to_pylist()):
            try:
                img = PIL.Image.open(io.BytesIO(payload)).convert("RGB")
            except Exception:
                if self.strict:
                    raise
                failed[i] = True
                out[i] = _decode_fake(
                    payloads.slice(i, 1), self.width, self.height
                )[0]
                continue
            if img.size != (self.width, self.height):
                img = img.resize((self.width, self.height))
            out[i] = np.asarray(img, dtype=np.uint8).reshape(
                self.height, self.width, 3
            )
        return out, failed

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.image_col).combine_chunks()
        if self._have_codec:
            pixels, failed = self._decode_real(payloads)
        elif self.strict:
            raise NotImplementedError(
                "image decode requires PIL (not in this container); "
                "run with strict=False for the deterministic fake decode"
            )
        else:
            pixels = _decode_fake(payloads, self.width, self.height)
            # no codec at all: every row is a synthetic decode
            failed = np.ones(len(pixels), dtype=bool)
        flat = pixels.reshape(len(pixels), -1)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.ravel(), type=pa.uint8()), flat.shape[1]
                ),
                "height": pa.array([self.height] * len(pixels), type=pa.int32()),
                "width": pa.array([self.width] * len(pixels), type=pa.int32()),
                # per-row decode provenance: True = deterministic fake was
                # substituted (corrupt payload or codec-less container)
                "decode_failed": pa.array(failed, type=pa.bool_()),
            }
        )


class ImageResizeStage:
    """pixels → nearest-neighbor resized pixels (pure NumPy, real)."""

    def __init__(self, out_w: int = 16, out_h: int = 16, id_col: str = "id"):
        self.out_w = out_w
        self.out_h = out_h
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        h = int(batch.column("height")[0].as_py())
        w = int(batch.column("width")[0].as_py())
        flat = batch.column("pixels").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        imgs = flat.reshape(n, h, w, 3)
        yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
        xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
        small = imgs[:, yi][:, :, xi]
        flat_out = small.reshape(n, -1)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat_out.ravel(), type=pa.uint8()), flat_out.shape[1]
                ),
                "height": pa.array([self.out_h] * n, type=pa.int32()),
                "width": pa.array([self.out_w] * n, type=pa.int32()),
            }
        )


class AudioFeatureStage:
    """binary audio → fixed-size feature vector.  STUB feature extraction
    (seeded by payload hash) behind the same actor signature a real
    mel-spectrogram stage would use."""

    def __init__(self, audio_col: str = "audio", id_col: str = "id",
                 n_features: int = 64, strict: bool = False):
        self.audio_col = audio_col
        self.id_col = id_col
        self.n_features = n_features
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "audio decode requires soundfile/librosa (not in container)"
            )
        hashes = hash_array(batch.column(self.audio_col).combine_chunks(), 0xA0D10)
        feats = np.empty((batch.num_rows, self.n_features), dtype=np.float32)
        for i, hv in enumerate(hashes):
            feats[i] = np.random.default_rng(int(hv)).random(self.n_features)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float32()), self.n_features
                ),
            }
        )


class VideoFrameSampleStage:
    """binary video → every-Nth-'frame' payload slices.  STUB framing: a
    real stage would demux containers; this slices the payload into
    fixed-size pseudo-frames so downstream plumbing (flat_map-style row
    explosion, frame indices) is exercised."""

    def __init__(self, video_col: str = "video", id_col: str = "id",
                 frame_bytes: int = 1024, every_n: int = 10, strict: bool = False):
        self.video_col = video_col
        self.id_col = id_col
        self.frame_bytes = frame_bytes
        self.every_n = every_n
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video demux requires ffmpeg (not in container)")
        ids, frame_idx, frames = [], [], []
        for vid, payload in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.video_col).to_pylist(),
        ):
            n_frames = max(1, len(payload) // self.frame_bytes)
            for f in range(0, n_frames, self.every_n):
                ids.append(vid)
                frame_idx.append(f)
                frames.append(payload[f * self.frame_bytes : (f + 1) * self.frame_bytes])
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


class AHashStage:
    """pixels → 64-bit average perceptual hash (REAL math, codec-free):
    grayscale → 8×8 nearest-neighbor downsample → bit b set when cell b is
    brighter than the image's 8×8 mean.  Deterministic; near-identical
    images differ in few bits, so ``dedup.simhash.hamming_near_dupes``
    blocks them exactly."""

    def __init__(self, id_col: str = "id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "sig": pa.array([], type=pa.uint64())}
            )
        h = int(batch.column("height")[0].as_py())
        w = int(batch.column("width")[0].as_py())
        flat = batch.column("pixels").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
        imgs = flat.reshape(n, h, w, 3).astype(np.float64)
        gray = imgs @ np.array([0.299, 0.587, 0.114])
        yi = (np.arange(8) * h // 8).astype(np.int64)
        xi = (np.arange(8) * w // 8).astype(np.int64)
        cells = gray[:, yi][:, :, xi].reshape(n, 64)
        bits = cells > cells.mean(axis=1, keepdims=True)
        sig = (
            bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {"doc_id": pa.array(
                batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                type=pa.int64()),
             "sig": pa.array(sig, type=pa.uint64())}
        )


def image_near_dupes(
    ds,
    image_col: str = "image",
    id_col: str = "id",
    max_hamming: int = 3,
    width: int = 32,
    height: int = 32,
):
    """Near-duplicate image pairs: decode (real PIL when importable, the
    deterministic fake otherwise) → aHash → generic Hamming pigeonhole
    blocking.  Returns pa.Table(a, b, hamming)."""
    from ..dedup.simhash import hamming_near_dupes

    decoded = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=dict(
            image_col=image_col, id_col=id_col, width=width, height=height
        ),
        batch_format="pyarrow",
        concurrency=2,
        zero_copy_batch=True,
    )
    sigs = decoded.map_batches(
        AHashStage,
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        concurrency=2,
        zero_copy_batch=True,
    )
    return hamming_near_dupes(sigs, max_hamming=max_hamming)
