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

# Ray logs two benign warnings on the pipelines here; drop ONLY those
# specific messages with logging.Filters (round-3 ADVICE: raising the whole
# logger's level to ERROR hid real executor warnings for downstream users).
import logging as _logging


class _DropKnownBenign(_logging.Filter):
    """Per-message filter for two known-benign Ray Data warnings:

    - "Failed to hash the schemas (for deduplication)" — raised for
      blob-carrying blocks whose binary columns aren't hashable; harmless.
    - the schema-divergence warning whose OLD or NEW schema is the EMPTY
      schema — map_groups emits an empty-schema bundle itself for
      group-less sorted blocks (routine in the sharded run-scans here).
      A real schema divergence (two non-empty schemas) still warns.
    """

    def filter(self, record: _logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:
            return True
        if "Failed to hash the schemas (for deduplication)" in msg:
            return False
        if "RefBundle with a different schema" in msg and (
            "new schema: ." in msg or "Previous schema: ," in msg
        ):
            return False
        return True


def _install_log_filters() -> None:
    for name in (
        "ray.data._internal.arrow_ops.transform_pyarrow",
        "ray.data._internal.execution.streaming_executor_state",
    ):
        lg = _logging.getLogger(name)
        if not any(isinstance(f, _DropKnownBenign) for f in lg.filters):
            lg.addFilter(_DropKnownBenign())


_install_log_filters()
