"""Resumable training-corpus materialization: filter → dedup → partitioned
Parquet sink.

The "resumable output" scale requirement (ray_guide Sources & sinks): one
output directory per INPUT shard, written atomically (tmp + rename) with a
run manifest — a rerun skips finished partitions, so a failed 100 TB job
resumes instead of restarting.

Stages per partition (one input parquet file → one output dir):
1. quality filter: keep docs with ``n_tokens`` and ``alpha_ratio`` in range
   (vectorized, `hksketch.text.analysis`);
2. exact dedup against a GLOBAL duplicate-id set: the set of non-keeper doc
   ids is computed once with the distributed hash-partition dedup and
   broadcast (``ray.put``) — a semi-join via broadcast filter, no shuffle of
   document bodies;
3. write the surviving rows as Parquet.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..hashing import hash_array
from ..text.analysis import quality_scores_batch


@ray.remote
def _clean_partition(
    in_file: str,
    out_dir: str,
    text_col: str,
    id_col: str,
    dup_ref,
    min_tokens: int,
    min_alpha: float,
) -> dict:
    # an ObjectRef argument is auto-dereferenced by Ray at task invocation
    drop_ids = ray.get(dup_ref) if isinstance(dup_ref, ray.ObjectRef) else dup_ref
    t = pq.read_table(in_file)
    q = quality_scores_batch(t, text_col, id_col)
    keep = (
        (q.column("n_tokens").to_numpy() >= min_tokens)
        & (q.column("alpha_ratio").to_numpy() >= min_alpha)
    )
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    keep &= ~np.isin(ids, drop_ids)
    out = t.filter(pa.array(keep))
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(out, os.path.join(tmp, "part.parquet"))
    with open(os.path.join(tmp, "_META.json"), "w") as f:
        json.dump({"input": in_file, "rows_in": t.num_rows, "rows_out": out.num_rows}, f)
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)  # atomic publish
    return {"rows_in": t.num_rows, "rows_out": out.num_rows}


def materialize_clean_corpus(
    input_files: list[str],
    out_root: str,
    text_col: str = "text",
    id_col: str = "url",
    min_tokens: int = 10,
    min_alpha: float = 0.5,
) -> dict:
    """Filter + dedup + write, one output dir per input file; resumable."""
    import ray.data as rd

    from ray.data.aggregate import Min

    os.makedirs(out_root, exist_ok=True)
    # global duplicate set: doc ids that are NOT the min-id of their
    # content-hash group (distributed; shuffle carries (hash, id) pairs)
    ds = rd.read_parquet(input_files, columns=[id_col, text_col])

    def h(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_hash": pa.array(
                    hash_array(batch.column(text_col), 0xDED0), type=pa.uint64()
                ),
                id_col: batch.column(id_col),
            }
        )

    hashed = ds.map_batches(h, batch_format="pyarrow", zero_copy_batch=True)
    keepers = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name="keep"))
    keep_ids = {r["keep"] for r in keepers.take_all()}
    all_ids = [r[id_col] for r in hashed.select_columns([id_col]).take_all()]
    dup_ids = np.array([i for i in all_ids if i not in keep_ids])
    dup_ref = ray.put(dup_ids)

    pending = []
    skipped = 0
    for f in sorted(input_files):
        name = os.path.splitext(os.path.basename(f))[0]
        out_dir = os.path.join(out_root, f"shard={name}")
        if os.path.exists(os.path.join(out_dir, "_META.json")):
            skipped += 1
            continue
        pending.append(
            _clean_partition.remote(
                f, out_dir, text_col, id_col, dup_ref, min_tokens, min_alpha
            )
        )
    results = ray.get(pending)
    return {
        "partitions": len(input_files),
        "skipped": skipped,
        "built": len(results),
        "rows_in": sum(r["rows_in"] for r in results),
        "rows_out": sum(r["rows_out"] for r in results),
        "duplicates_dropped_global": int(len(dup_ids)),
    }
