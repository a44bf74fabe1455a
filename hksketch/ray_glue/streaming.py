"""Query-at-any-time distributed streaming sketches.

The reference is a streaming library: ``add`` events arrive continuously
and ``count``/``contains``/``list`` may be called at ANY point
(SURVEY.md §1.1).  The batch pipelines in this package answer queries at
the end of a dataset pass; this module provides the live equivalent — a
pool of Ray actors each holding one shard sketch (the reference's intended
"shard streams → per-shard sketch → merge()" scale-out, SURVEY.md §3.3,
kept permanently warm):

- ``add_batch`` routes batches round-robin to shard actors (any shard may
  hold any key: same-seed shards are merge-compatible by construction, so
  no key partitioning is required — C11 semantics do the rework);
- ``snapshot()`` merges all shard states into one sketch (deterministic
  shard-id order) without stopping ingestion;
- ``count``/``contains``/``list`` answer from a fresh snapshot.

This is the one place a long-lived mutable sketch lives in an actor: the
stream has no end, so the no-flush-hook objection to actor-held state in
``map_batches`` (see stages.py) does not apply — snapshots ARE the reads.
"""

from __future__ import annotations

from typing import Any, Optional

import ray

from ..sketch import sketch_from_bytes
from .aggregate import make_sketch


@ray.remote
class SketchShard:
    """One shard of a streaming sketch; holds mutable state for its slice
    of the stream."""

    def __init__(self, cfg: dict):
        self.sketch = make_sketch(cfg)
        self.n_rows = 0

    def add_batch(self, keys, weights=None) -> int:
        self.sketch.add_batch(keys, weights) if weights is not None else self.sketch.add_batch(keys)
        n = len(keys)
        self.n_rows += n
        return self.n_rows

    def snapshot(self) -> bytes:
        return self.sketch.to_bytes()

    def rows_seen(self) -> int:
        return self.n_rows


class StreamingSketch:
    """Driver-side facade over a pool of shard actors."""

    def __init__(self, cfg: dict, shards: int = 4):
        if shards < 1:
            raise ValueError("shards must be >= 1")
        self._cfg = dict(cfg)
        self._shards = [SketchShard.remote(cfg) for _ in range(shards)]
        self._next = 0
        self._pending: list = []

    def add_batch(self, keys, weights: Optional[Any] = None) -> None:
        """Non-blocking ingest: round-robin to the shard pool."""
        shard = self._shards[self._next % len(self._shards)]
        self._next += 1
        self._pending.append(shard.add_batch.remote(keys, weights))
        if len(self._pending) > 4 * len(self._shards):  # bounded in-flight
            # keep ray.wait's actual not-ready set — a positional slice would
            # drop tracking of still-in-flight tasks and void the bound
            _ready, not_ready = ray.wait(
                self._pending, num_returns=len(self._pending) // 2
            )
            self._pending = not_ready

    def flush(self) -> int:
        """Wait for all in-flight ingests; returns total rows seen."""
        if self._pending:
            ray.get(self._pending)
            self._pending = []
        return sum(ray.get([s.rows_seen.remote() for s in self._shards]))

    def snapshot(self):
        """Merged sketch of everything ingested so far (flushes first;
        deterministic shard-order fold)."""
        self.flush()
        blobs = ray.get([s.snapshot.remote() for s in self._shards])
        acc = sketch_from_bytes(blobs[0])
        for b in blobs[1:]:
            acc.merge(sketch_from_bytes(b))
        return acc

    # reference point-query surface (C7/C8/C10), live at any time
    def count(self, item) -> int:
        return self.snapshot().count(item)

    def contains(self, item) -> bool:
        return self.snapshot().contains(item)

    def list(self):
        return self.snapshot().list()

    def shutdown(self) -> None:
        self.flush()
        for s in self._shards:
            ray.kill(s)
        self._shards = []
