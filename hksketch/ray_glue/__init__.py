# ray.data's import-time logging config resets logger levels, so the
# benign-warning silencing must run AFTER it (hksketch/__init__ runs too
# early when hksketch is imported before ray.data)
import logging as _logging

import ray.data as _rd  # noqa: F401  (forces configure_logging first)

for _name in (
    "ray.data._internal.arrow_ops.transform_pyarrow",
    # "new schema: ." for the empty-schema bundles map_groups emits on
    # group-less sorted blocks — routine in the sharded run-scans here
    "ray.data._internal.execution.streaming_executor_state",
):
    _logging.getLogger(_name).setLevel(_logging.ERROR)

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
