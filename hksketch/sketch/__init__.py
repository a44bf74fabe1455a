"""Pure NumPy sketch kernels — no Ray imports (SURVEY.md §7.0).

HeavyKeeper family (semantics from /root/reference/src/): ``TopK`` (canonical
depth×width), ``BucketedTopK`` (single-hash, default), ``CuckooTopK``.
Literature sketches with the same contracts (seeded, param-checked merge,
serializable): ``HyperLogLog``, ``CountMinSketch``, ``BloomFilter``,
``TDigest``, ``KLL``.
"""

from .base import (
    BuilderError,
    IncompatibleSketchError,
    SketchError,
    sketch_from_bytes,
)
from .bucketed import BucketedTopK
from .pq import TopKQueue

__all__ = [
    "BucketedTopK",
    "TopKQueue",
    "SketchError",
    "BuilderError",
    "IncompatibleSketchError",
    "sketch_from_bytes",
]
