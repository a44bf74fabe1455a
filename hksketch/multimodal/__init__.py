from .stubs import (
    AudioFeatureStage,
    ImageDecodeStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    fake_image_bytes,
)

__all__ = [
    "ImageDecodeStage",
    "ImageResizeStage",
    "AudioFeatureStage",
    "VideoFrameSampleStage",
    "fake_image_bytes",
]
