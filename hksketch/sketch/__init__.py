"""Pure NumPy sketch kernels — no Ray imports (SURVEY.md §7.0).

HeavyKeeper family (semantics from /root/reference/src/): ``TopK`` (canonical
depth×width), ``BucketedTopK`` (single-hash, default), ``CuckooTopK``.
Literature sketches with the same contracts (seeded, param-checked merge,
serializable): ``HyperLogLog``, ``CountMinSketch``, ``BloomFilter``,
``TDigest``, ``KLL``, ``MisraGries``, ``FrequentDirections``.
"""

from .base import (
    BuilderError,
    IncompatibleSketchError,
    SketchError,
    sketch_from_bytes,
)
from .bloom import BloomFilter
from .bucketed import BucketedTopK
from .countmin import CountMinSketch
from .cuckoo import CuckooTopK
from .ams import AMSSketch
from .fd import FrequentDirections
from .hll import HyperLogLog
from .kll import KLL
from .mg import MisraGries
from .pq import TopKQueue
from .reservoir import DistinctValueSample, ReservoirSample, WeightedSample
from .tdigest import TDigest
from .topk import TopK

__all__ = [
    "TopK",
    "BucketedTopK",
    "CuckooTopK",
    "HyperLogLog",
    "CountMinSketch",
    "BloomFilter",
    "TDigest",
    "KLL",
    "MisraGries",
    "FrequentDirections",
    "TopKQueue",
    "ReservoirSample",
    "DistinctValueSample",
    "WeightedSample",
    "SketchError",
    "BuilderError",
    "IncompatibleSketchError",
    "sketch_from_bytes",
    "AMSSketch",
]
