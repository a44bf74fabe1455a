# ray.data's import-time logging config resets logger state, so the
# benign-warning filters must (re-)install AFTER it (hksketch/__init__ runs
# too early when hksketch is imported before ray.data).  Filters drop only
# the two known-benign messages — real executor warnings pass through.
import ray.data as _rd  # noqa: F401  (forces configure_logging first)

from .. import _install_log_filters

_install_log_filters()

from .joins import hash_join
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
    "hash_join",
]
