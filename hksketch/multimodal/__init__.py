from .stubs import (
    AHashStage,
    AudioFeatureStage,
    ImageDecodeStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    fake_image_bytes,
    image_near_dupes,
)

__all__ = [
    "ImageDecodeStage",
    "ImageResizeStage",
    "AHashStage",
    "AudioFeatureStage",
    "VideoFrameSampleStage",
    "image_near_dupes",
    "fake_image_bytes",
]
