"""Exact deduplication: hash-partition + per-group first.

Scale shape: a vectorized content hash per batch (64-bit, seeded) →
``groupby(hash).min(id)`` — the shuffle carries (hash, id) pairs only,
never document bodies.  Collision probability 2^-64 per pair; the hash is
deterministic so reruns agree.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Min

from ..hashing import hash_array

DEDUP_SEED = 0xDED0


def exact_dedup(ds, text_col: str, id_col: str):
    """Returns Dataset[(id_col,)] — the minimum id per distinct text."""

    def h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_hash": pa.array(
                    hash_array(batch.column(text_col), DEDUP_SEED), type=pa.uint64()
                ),
                id_col: batch.column(id_col),
            }
        )

    hashed = ds.map_batches(h, batch_format="pyarrow", zero_copy_batch=True)
    kept = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return kept.select_columns([id_col])
