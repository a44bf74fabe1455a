from .aggregate import (
    BloomAggregate,
    CountMinAggregate,
    HLLCountAggregate,
    KLLQuantileAggregate,
    SketchAggregate,
    TDigestQuantileAggregate,
    TopKAggregate,
    sketch_config,
)

__all__ = [
    "SketchAggregate",
    "TopKAggregate",
    "HLLCountAggregate",
    "CountMinAggregate",
    "BloomAggregate",
    "TDigestQuantileAggregate",
    "KLLQuantileAggregate",
    "sketch_config",
]
