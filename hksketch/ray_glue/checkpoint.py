"""Checkpointed, resumable sketch builds with per-partition lineage.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  Layout (ray_guide "Sources & sinks" resumability
pattern)::

    <ckpt_dir>/
      part-00000.sketch      serialized partial sketch for partition 0
      part-00000.json        lineage: input files, row count, params hash,
                             wall seconds, engine version
      MANIFEST.json          run-level config (written first, validated on
                             resume)

A partition is a fixed set of input Parquet files, so partition ids are
stable across runs; a rerun skips any partition whose blob+lineage exist
and match the params hash.  Partition tasks are raw ``@ray.remote``
functions — one of the few places the Dataset API genuinely can't express
the semantics (stable partition→output mapping across runs; Ray Data block
splits are not stable).  Inside a partition the build still streams batches
through the vectorized kernel.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

import pyarrow.dataset as pads

import ray

from ..sketch import sketch_from_bytes
from .aggregate import make_sketch


def _params_hash(cfg: dict, key_col: str, weight_col, tokenize: bool) -> str:
    payload = json.dumps(
        {"cfg": cfg, "key": key_col, "w": weight_col, "tok": tokenize},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _env_lineage(cfg: dict) -> dict:
    """Environment fingerprint persisted with every checkpoint: library
    versions plus a FUNCTIONAL hash probe (the hash of MERGE_PROBE under the
    run's seed).  The probe catches cross-version hash drift in persisted
    blobs that a live MERGE_PROBE check between in-process sketches cannot —
    a resumed run whose hash backend drifted produces a different probe value
    and is refused instead of silently merging incompatible partials."""
    from .. import __version__
    from ..hashing import hash_scalar, resolve_hash_fn
    from ..sketch.base import DEFAULT_SEED, MERGE_PROBE

    params = cfg.get("params", {})
    seed = int(params.get("seed", DEFAULT_SEED))
    # probe with the backend THIS config's sketches hash with — probing
    # 'auto' would fingerprint a backend that never touched the blobs
    fn = resolve_hash_fn(params.get("hash_fn", "auto"))
    try:
        import polars as _pl

        polars_ver = _pl.__version__
    except Exception:  # pragma: no cover
        polars_ver = None
    return {
        "hksketch_version": __version__,
        "polars_version": polars_ver,
        "hash_backend": fn,
        "hash_probe": hash_scalar(MERGE_PROBE, seed, fn),
    }


def _build_partition(
    files: list[str],
    cfg: dict,
    key_col: str,
    weight_col: Optional[str],
    tokenize: bool,
    batch_size: int,
) -> tuple[bytes, int, float]:
    t0 = time.perf_counter()
    sk = make_sketch(cfg)
    cols = [key_col] + ([weight_col] if weight_col else [])
    dset = pads.dataset(files, format="parquet")
    n = 0
    for batch in dset.to_batches(columns=cols, batch_size=batch_size):
        if batch.num_rows == 0:
            continue
        if tokenize:
            from ..text.tokenize import tokenize_column

            toks = tokenize_column(batch.column(key_col)).column("token")
            sk.add_batch(toks)
            n += len(toks)
        else:
            w = (
                batch.column(weight_col).to_numpy(zero_copy_only=False)
                if weight_col
                else None
            )
            sk.add_batch(batch.column(key_col), w)
            n += batch.num_rows
    return sk.to_bytes(), n, time.perf_counter() - t0


_build_partition_remote = ray.remote(_build_partition) if hasattr(ray, "remote") else None


def run_checkpointed_sketch(
    input_files: list[str],
    ckpt_dir: str,
    cfg: dict,
    key_col: str,
    weight_col: Optional[str] = None,
    tokenize: bool = False,
    files_per_partition: int = 1,
    batch_size: int = 65536,
) -> tuple[bytes, dict]:
    """Build (or resume) a global sketch over ``input_files``.

    Returns (final_sketch_bytes, metrics).  Completed partitions are skipped
    on rerun; partial blobs merge via the canonical tree fold in partition-id
    order (deterministic, SURVEY.md §7.5.3).
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    phash = _params_hash(cfg, key_col, weight_col, tokenize)
    manifest_path = os.path.join(ckpt_dir, "MANIFEST.json")
    parts = [
        sorted(input_files)[i : i + files_per_partition]
        for i in range(0, len(input_files), files_per_partition)
    ]
    env = _env_lineage(cfg)
    manifest = {
        "params_hash": phash,
        "cfg": cfg,
        "key_col": key_col,
        "n_partitions": len(parts),
        **env,
    }
    if os.path.exists(manifest_path):
        old = json.load(open(manifest_path))
        if old.get("params_hash") != phash or old.get("n_partitions") != len(parts):
            raise ValueError(
                f"checkpoint dir {ckpt_dir} holds a different run "
                f"(params_hash {old.get('params_hash')} != {phash}); "
                "use a fresh directory"
            )
        if old.get("hash_probe") is not None and old.get("hash_probe") != env["hash_probe"]:
            raise ValueError(
                f"checkpoint dir {ckpt_dir} was written under a different hash "
                f"environment (probe {old.get('hash_probe')} != {env['hash_probe']}, "
                f"hksketch {old.get('hksketch_version')} / polars "
                f"{old.get('polars_version')}); persisted partials are not "
                "merge-compatible — rebuild in a fresh directory"
            )
    else:
        with open(manifest_path + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(manifest_path + ".tmp", manifest_path)

    pending: list[tuple[int, ray.ObjectRef]] = []
    skipped = 0
    for pid, files in enumerate(parts):
        blob_path = os.path.join(ckpt_dir, f"part-{pid:05d}.sketch")
        meta_path = os.path.join(ckpt_dir, f"part-{pid:05d}.json")
        if os.path.exists(blob_path) and os.path.exists(meta_path):
            meta = json.load(open(meta_path))
            if meta.get("params_hash") == phash and meta.get("files") == files:
                skipped += 1
                continue
        pending.append(
            (
                pid,
                _build_partition_remote.remote(
                    files, cfg, key_col, weight_col, tokenize, batch_size
                ),
            )
        )

    total_rows, total_wall = 0, 0.0
    for pid, ref in pending:
        blob, n, wall = ray.get(ref)
        blob_path = os.path.join(ckpt_dir, f"part-{pid:05d}.sketch")
        meta_path = os.path.join(ckpt_dir, f"part-{pid:05d}.json")
        tmp = blob_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, blob_path)  # atomic publish
        with open(meta_path + ".tmp", "w") as f:
            json.dump(
                {
                    "partition": pid,
                    "files": parts[pid],
                    "rows": n,
                    "wall_sec": wall,
                    "params_hash": phash,
                    **env,
                },
                f,
            )
        os.replace(meta_path + ".tmp", meta_path)
        total_rows += n
        total_wall += wall

    # deterministic fold in partition-id order
    acc = None
    rows_all = 0
    for pid in range(len(parts)):
        blob = open(os.path.join(ckpt_dir, f"part-{pid:05d}.sketch"), "rb").read()
        meta = json.load(open(os.path.join(ckpt_dir, f"part-{pid:05d}.json")))
        rows_all += meta["rows"]
        if acc is None:
            acc = sketch_from_bytes(blob)
        else:
            acc.merge(sketch_from_bytes(blob))
    metrics = {
        "partitions": len(parts),
        "resumed_skipped": skipped,
        "rows": rows_all,
        "built_rows": total_rows,
        "built_wall_sec": total_wall,
        "sketch_mem_bytes": acc.mem_bytes() if acc is not None else 0,
        "merge_fanin": len(parts),
    }
    return (acc.to_bytes() if acc is not None else b""), metrics
