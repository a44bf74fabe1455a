"""hksketch — a Ray-Data-native distributed sketch / approximate-aggregation
engine with the query capabilities of pmcgleenon/heavykeeper-rs (v0.7.0),
rebuilt from scratch on `ray.data.Dataset` pipelines.

Layout (SURVEY.md §7.0):
- ``hksketch.sketch``     pure NumPy kernels (no Ray): HeavyKeeper top-k
  variants + HLL / count-min / Bloom / t-digest / KLL.
- ``hksketch.ray_glue``   Ray Data UDAFs (AggregateFnV2), actor-pool stages,
  checkpoint/resume.
- ``hksketch.text``       tokenizer / extraction / analysis (vectorized).
- ``hksketch.dedup``      exact + MinHash-LSH + SimHash + n-gram + embedding dedup.
- ``hksketch.sim``        similarity search over embedding columns.
- ``hksketch.pipelines``  end-to-end pipelines + deterministic fixtures.
"""

__version__ = "0.1.0"

# Ray logs a benign "Failed to hash the schemas (for deduplication)" warning
# on blob-carrying blocks; importing hksketch (driver AND workers) silences
# that single logger so pipeline output stays readable.
import logging as _logging

_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(
    _logging.ERROR
)
# Ray also warns "new schema: ." whenever a map_groups operator emits the
# empty-schema bundle it generates itself for group-less sorted blocks —
# routine in the sharded run-scan pipelines here and benign (downstream
# consumers concat typed tables); silence that single logger too.
_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).setLevel(_logging.ERROR)
