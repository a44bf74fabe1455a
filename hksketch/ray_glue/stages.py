"""Ray Data stages: pre-aggregated partial sketches, skew-safe grouped
sketches, and broadcast-sketch lookup.

Scale design (SURVEY.md §4.2, §7.4):

- **Partial-per-batch**: a stateless ``map_batches`` fn tokenizes/extracts
  keys and emits ONE serialized partial sketch row per (batch × group) —
  deterministic and retry-idempotent (re-running a batch rebuilds the same
  partial).  The shuffle that follows moves only ~width·depth·16B blobs,
  never raw rows.
- **Skewed group keys** (north rule: "repartition to absorb hostname
  skew"): the per-batch partial IS the salt — every batch contributes at
  most one row per group, so a hostname holding 50% of the corpus arrives
  at its reducer as #batches rows, not #documents rows.
- **Broadcast lookup** (C7/C8 as a stage): the built sketch blob is
  ``ray.put`` once; every actor deserializes it once in ``__init__`` and
  answers point queries vectorized per batch.

Why accumulation is stateless-per-batch rather than a stateful actor pool
holding one long-lived sketch per actor (SURVEY.md §7.2.4 weighed both):
``map_batches`` actors have no end-of-stream flush hook, so an actor-held
sketch's final residue (everything since its last emission) cannot be
surfaced reliably; per-batch partials are also retry-IDEMPOTENT (a re-run
batch rebuilds the identical partial, while replaying into mutable actor
state double-counts) and give deterministic lineage for checkpointing.
Actor pools are used where they are the right tool: broadcast lookups,
join probes, and decode-heavy multimodal stages (state built once per
actor in ``__init__``).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa

import ray

from ..sketch import sketch_from_bytes
from ..text.tokenize import tokenize_column
from .aggregate import SketchAggregate, make_sketch, _to_arrow

def _accepts_hashes_kwarg(fn) -> bool:
    """True iff ``fn`` has a real parameter named ``hashes`` (round-3
    ADVICE: ``co_varnames`` also lists LOCALS, so a kernel with a local
    named ``hashes`` but no such parameter would get a TypeError on the
    ``hashes=`` fast-path call)."""
    import inspect

    try:
        return "hashes" in inspect.signature(fn).parameters
    except (TypeError, ValueError):  # builtins / C callables
        return False


class MergeSketchBlobs(SketchAggregate):
    """UDAF over a column of serialized partial sketches: merge them.

    ``aggregate_block`` folds all blobs in a block; ``combine`` merges two
    accumulators — the canonical tree reduce of reference ``merge()``.
    """

    def __init__(self, on: str = "sketch", alias_name: Optional[str] = None):
        # cfg unused: partials carry their own params; zero stays None
        self._cfg = {"kind": "blob", "params": {}}
        super(SketchAggregate, self).__init__(
            alias_name or f"merged({on})",
            zero_factory=lambda: None,
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block) -> Optional[bytes]:
        t = _to_arrow(block)
        if t.num_rows == 0:
            return None
        blobs = t.column(self.get_target_column()).to_pylist()
        acc = None
        for b in blobs:
            if b is None:
                continue
            if acc is None:
                acc = sketch_from_bytes(b)
            else:
                acc.merge(sketch_from_bytes(b))
        return acc.to_bytes() if acc is not None else None


def _group_order(groups: "np.ndarray"):
    """One stable argsort + boundary scan shared by every per-batch
    grouped-partial builder: returns (order, uniq, starts, ends) where
    ``order`` gathers rows group-contiguously and group ``i`` spans
    ``order[starts[i]:ends[i]]``."""
    order = np.argsort(groups, kind="stable")
    sorted_g = groups[order]
    uniq, starts = np.unique(sorted_g, return_index=True)
    ends = np.append(starts[1:], len(sorted_g))
    return order, uniq, starts, ends


def make_partial_sketch_fn(
    cfg: dict,
    key_col: str,
    weight_col: Optional[str] = None,
    group_col: Optional[str] = None,
    tokenize: bool = False,
):
    """Build a stateless ``map_batches`` fn: batch → partial-sketch rows.

    With ``group_col``, emits one row per group value present in the batch
    (the skew-absorbing pre-aggregation); otherwise one row per batch.
    With ``tokenize=True``, ``key_col`` is a text column and keys are its
    tokens (the fused reference word-count path, S3+C5).
    """

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"sketch": pa.array([], type=pa.binary()),
                             "n_rows": pa.array([], type=pa.int64())})
        if group_col is None:
            sk = make_sketch(cfg)
            if tokenize:
                keys = tokenize_column(batch.column(key_col)).column("token")
                sk.add_batch(keys)
                n = len(keys)
            else:
                if weight_col:
                    w = batch.column(weight_col).to_numpy(zero_copy_only=False)
                    sk.add_batch(batch.column(key_col), w)
                else:  # distinct-style sketches (HLL/Bloom) take no weights
                    sk.add_batch(batch.column(key_col))
                n = batch.num_rows
            return pa.table(
                {"sketch": pa.array([sk.to_bytes()], type=pa.binary()),
                 "n_rows": pa.array([n], type=pa.int64())}
            )
        # grouped: one partial per group value in this batch.  Cardinality-
        # safe shape (round-2 VERDICT #4): tokenize/hash happen ONCE for the
        # whole batch, rows are gathered into group-contiguous order with a
        # single stable argsort, and each group's add is a zero-copy slice —
        # per-batch work is O(rows log rows) + O(groups) slices, never
        # O(groups × width).  Partial blob bytes are content-proportional
        # via the sparse serializer (sketch/base.py pack_sketch).  Groups
        # whose rows tokenize to zero tokens emit no partial (nothing to
        # merge), so key-less groups never appear in the output.
        groups = batch.column(group_col).to_numpy(zero_copy_only=False)
        w = None
        if tokenize:
            toks = tokenize_column(batch.column(key_col), with_doc_index=True)
            didx = toks.column("doc_idx").to_numpy()
            keyarr = toks.column("token").combine_chunks()
            kg = groups[didx]
        else:
            keyarr = batch.column(key_col).combine_chunks()
            kg = groups
            if weight_col:
                w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        if len(kg) == 0:
            return pa.table(
                {group_col: pa.array([], type=batch.column(group_col).type),
                 "sketch": pa.array([], type=pa.binary()),
                 "n_rows": pa.array([], type=pa.int64())}
            )
        order, uniq, starts, ends = _group_order(kg)
        keys_sorted = keyarr.take(pa.array(order))
        w_sorted = w[order] if w is not None else None
        probe = make_sketch(cfg)
        # one hash pass for the whole batch, via the sketch's OWN hasher
        # (respects with_hasher backends); only kernels exposing a hashes=
        # fast path get it
        pass_hashes = _accepts_hashes_kwarg(probe.add_batch) and hasattr(
            probe, "_hash"
        )
        hashes = probe._hash(keys_sorted) if pass_hashes else None
        out_blobs, out_n = [], []
        for i in range(len(uniq)):
            s, e = int(starts[i]), int(ends[i])
            sk = make_sketch(cfg) if i else probe
            sl = keys_sorted.slice(s, e - s)
            if pass_hashes:
                sk.add_batch(sl, w_sorted[s:e] if w_sorted is not None else None,
                             hashes=hashes[s:e])
            elif w_sorted is not None:
                sk.add_batch(sl, w_sorted[s:e])
            else:
                sk.add_batch(sl)
            out_blobs.append(sk.to_bytes())
            out_n.append(e - s)
        return pa.table(
            {
                group_col: pa.array(uniq),
                "sketch": pa.array(out_blobs, type=pa.binary()),
                "n_rows": pa.array(out_n, type=pa.int64()),
            }
        )

    return fn


@ray.remote
def _merge_blob_chunk(blobs: list) -> bytes:
    # elements may be raw bytes OR ObjectRefs of earlier chunk merges
    # (refs nested in a list are not auto-resolved by Ray)
    blobs = [ray.get(b) if isinstance(b, ray.ObjectRef) else b for b in blobs]
    acc = sketch_from_bytes(blobs[0])
    for b in blobs[1:]:
        acc.merge(sketch_from_bytes(b))
    return acc.to_bytes()


@ray.remote
def _merge_blob_args(*blobs) -> bytes:
    """Variadic twin of ``_merge_blob_chunk``: upstream chunk refs are
    passed as TOP-LEVEL arguments, so Ray defers scheduling until every
    input is materialized — a task never occupies a worker slot blocked
    in ``ray.get`` on a still-running parent (which would starve the map
    stage the streaming fold overlaps with)."""
    acc = sketch_from_bytes(blobs[0])
    for b in blobs[1:]:
        acc.merge(sketch_from_bytes(b))
    return acc.to_bytes()


def tree_merge_blobs(blobs: list[bytes], fanin: int = 8) -> bytes:
    """Deterministic parallel tree reduce of serialized partial sketches.
    Raw Ray tasks are justified here: Ray Data's Aggregate operator pays
    seconds of all-to-all fixed cost to merge a few dozen one-row blocks.

    Operand order is CANONICALIZED (bytes-lexicographic sort) before the
    fold: with ``preserve_order=False`` (Ray's default) blob lists
    collected via ``take_all``/``iter_batches`` arrive in COMPLETION
    order, which task retries and scheduler timing reshuffle — sorting
    makes the result a pure function of the partial MULTISET, so a rerun
    with injected task failures is bit-identical
    (``test_sketch_partials_retry_idempotent``).  The streaming variant
    below cannot sort without a full barrier; its chunk grouping follows
    arrival order, which changes only bounded-PQ TIE membership (counts
    merge order-independently), and every query-facing ranking re-sorts
    by (count, key) so oracle outputs never depend on it."""
    blobs = sorted(b for b in blobs if b is not None)
    if not blobs:
        return b""
    while len(blobs) > fanin:
        refs = [
            _merge_blob_chunk.remote(blobs[i : i + fanin])
            for i in range(0, len(blobs), fanin)
        ]
        blobs = ray.get(refs)
    acc = sketch_from_bytes(blobs[0])
    for b in blobs[1:]:
        acc.merge(sketch_from_bytes(b))
    return acc.to_bytes()


def tree_merge_many_streaming(batch_iter, cols: list[str], fanin: int = 8) -> list[bytes]:
    """Merge several partial-blob families WHILE the producing pipeline
    still runs: consume partial batches from ``batch_iter`` (an
    ``iter_batches`` stream — Ray Data executes lazily underneath, so
    merge chunk tasks overlap the map stage instead of waiting for a
    ``take_all`` barrier).  The fold is eager at EVERY level: whenever
    ``fanin`` items accumulate at level k (raw blobs at level 0, chunk
    refs above), their merge task launches immediately and its ref joins
    level k+1 — so by stream end only the short per-level tails remain
    and the post-stream critical path is one or two small merges instead
    of a full blocking level-by-level fold.  Grouping is EXACTLY the
    in-order fanin slicing the blocking fold would produce (consecutive
    slices, short last slice becomes its own chunk), so results are
    bit-identical to the previous blocking implementation.  Family
    finals launch before any ``ray.get`` so the per-family folds overlap.
    Returns one merged blob per name in ``cols``."""
    # levels[c][0] = pending raw blobs; levels[c][k>=1] = pending chunk
    # refs at level k.  launched[c][k] counts full fanin-slices already
    # folded out of level k (needed to tell a true final level from one
    # whose earlier items were consumed during the stream).
    levels: dict[str, list[list]] = {c: [[]] for c in cols}
    launched: dict[str, list[int]] = {c: [0] for c in cols}

    def _push(c, k, item):
        lv, ln = levels[c], launched[c]
        while len(lv) <= k:
            lv.append([])
            ln.append(0)
        lv[k].append(item)
        if len(lv[k]) == fanin:
            ref = _merge_blob_args.remote(*lv[k])
            lv[k].clear()
            ln[k] += 1
            _push(c, k + 1, ref)

    for batch in batch_iter:
        for c in cols:
            col = batch.column(c)
            for i in range(len(col)):
                v = col[i].as_py()
                if v is not None:
                    _push(c, 0, v)

    # End flush: per level in order, the leftover items are exactly the
    # blocking fold's short last slice — they become ONE chunk at the
    # next level (matching tree_merge_blobs' range(0, n, fanin) slicing);
    # a level nothing was folded out of is the final level.
    finals: list = []
    for c in cols:
        lv, ln = levels[c], launched[c]
        final: object = b""
        k = 0
        while k < len(lv):
            items = lv[k]
            if ln[k] == 0:
                if len(items) == 1:
                    final = items[0]
                elif items:
                    final = _merge_blob_args.remote(*items)
                break
            if items:
                ref = _merge_blob_args.remote(*items)
                lv[k] = []
                while len(lv) <= k + 1:
                    lv.append([])
                    ln.append(0)
                lv[k + 1].append(ref)
            k += 1
        finals.append(final)
    # resolve AFTER every family's final task is in flight
    return [ray.get(f) if isinstance(f, ray.ObjectRef) else f for f in finals]


def global_sketch(
    ds: "ray.data.Dataset",
    cfg: dict,
    key_col: str,
    weight_col: Optional[str] = None,
    tokenize: bool = False,
    batch_size: int = 8192,
    merge_via: str = "auto",
):
    """Dataset → ONE merged sketch (bytes).  No shuffle: per-batch partials
    tree-merge.

    ``merge_via``: ``"driver"`` streams the (one-row-per-batch) partials to
    the driver and tree-merges with Ray tasks — lowest constant cost, right
    when partial count is modest; ``"aggregate"`` keeps everything inside
    Ray Data's Aggregate operator (no driver materialization) — right at
    cluster scale where partial count is unbounded (10^12-doc inputs have
    ~millions of partials; 200 KB × 10^6 must never land on one driver).
    ``"auto"`` picks by the dataset's known block count (≤512 → driver).
    """
    fn = make_partial_sketch_fn(cfg, key_col, weight_col, tokenize=tokenize)
    partials = ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    if merge_via == "auto":
        # Driver load is the PARTIAL count (≈ rows / batch_size — one huge
        # file still yields millions of partials), not the file count.
        # Parquet-footer row estimates cost no execution; unknown inputs
        # take the aggregate path so partials never pile up on one driver.
        from .partitioning import estimate_rows

        est = estimate_rows(ds)
        nparts = None if est is None else -(-est // max(1, batch_size))
        merge_via = "driver" if (nparts is not None and nparts <= 512) else "aggregate"
    if merge_via == "driver":
        # streaming variant of the tree merge: in-order fanin-sized chunks,
        # launched while the map stage still produces.  Chunk grouping
        # follows ARRIVAL order (a full sort would reintroduce the barrier
        # streaming exists to avoid); see tree_merge_blobs' docstring for
        # why only bounded-PQ tie membership can vary with that order
        it = partials.iter_batches(batch_size=None, batch_format="pyarrow")
        (blob,) = tree_merge_many_streaming(it, ["sketch"])
        # zero partials (empty/filtered-away stream) → the sketch of the
        # EMPTY stream, not None/b"" (tree_merge_many_streaming signals an
        # empty stream with b""): callers deserialize unconditionally
        return blob if blob else make_sketch(cfg).to_bytes()
    out = partials.aggregate(MergeSketchBlobs(on="sketch", alias_name="sketch"))
    blob = None if out is None else out["sketch"]
    return blob if blob else make_sketch(cfg).to_bytes()


def grouped_sketch(
    ds: "ray.data.Dataset",
    cfg: dict,
    key_col: str,
    group_col: str,
    weight_col: Optional[str] = None,
    tokenize: bool = False,
    batch_size: int = 16384,
):
    """Dataset → Dataset[(group_col, sketch: binary, n_rows: int64)]; the
    shuffle carries only per-(batch, group) partial blobs (sparse-packed —
    bytes ∝ group content), plus each group's total key count."""
    from ray.data.aggregate import Sum

    fn = make_partial_sketch_fn(
        cfg, key_col, weight_col, group_col=group_col, tokenize=tokenize
    )
    partials = ds.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return partials.groupby(group_col).aggregate(
        MergeSketchBlobs(on="sketch", alias_name="sketch"),
        Sum("n_rows", alias_name="n_rows"),
    )


class SketchLookup:
    """Actor-pool ``map_batches`` stage answering point queries against a
    broadcast sketch (reference C7 ``count`` / C8 ``contains`` as a
    distributed stage).  The blob is ``ray.put`` once on the driver;
    each actor deserializes once in ``__init__``."""

    def __init__(self, blob_or_ref: Any, key_col: str, out_col: str = "est_count",
                 mode: str = "count"):
        blob = (
            ray.get(blob_or_ref)
            if isinstance(blob_or_ref, ray.ObjectRef)
            else blob_or_ref
        )
        self.sketch = sketch_from_bytes(blob)
        self.key_col = key_col
        self.out_col = out_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).combine_chunks()
        if self.mode == "contains":
            vals = self.sketch.contains_batch(keys)
            return batch.append_column(self.out_col, pa.array(vals, type=pa.bool_()))
        counts = self.sketch.count_batch(keys)
        return batch.append_column(
            self.out_col, pa.array(counts.astype(np.uint64), type=pa.uint64())
        )


def grouped_profile(
    ds: "ray.data.Dataset",
    group_col: str,
    specs: dict,
    batch_size: int = 16384,
):
    """ONE-SCAN multi-sketch table profile: for every group, an exact row
    count plus one mergeable sketch per entry of ``specs`` (name →
    ``(cfg, key_col)`` or ``(cfg, key_col, weight_col)``) — the "profile
    a table in a single pass" pattern (count + HLL distinct + t-digest
    quantiles + ... simultaneously), instead of N separate scans.

    Returns Dataset[(group_col, n_rows:int64, <name>:binary per spec)].
    The shuffle carries one row per (batch, group) with all partial blobs
    on it; every blob column merges through its own ``MergeSketchBlobs``
    in the same groupby.
    """
    from ray.data.aggregate import Sum

    names = list(specs)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {group_col: [], "n_rows": []}
        for nm in names:
            cols[nm] = []
        if batch.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], type=batch.schema.field(group_col).type),
                 "n_rows": pa.array([], type=pa.int64()),
                 **{nm: pa.array([], type=pa.binary()) for nm in names}}
            )
        gvals = batch.column(group_col).to_numpy(zero_copy_only=False)
        # same slicing idiom as make_partial_sketch_fn's grouped path (one
        # shared helper); the hashes= fast path is not applicable here —
        # each spec sketches a DIFFERENT key column
        order, uniq, starts, ends = _group_order(gvals)
        sorted_batch = batch.take(pa.array(order, type=pa.int64()))
        for i in range(len(uniq)):
            lo, hi = int(starts[i]), int(ends[i])
            cols[group_col].append(uniq[i])
            cols["n_rows"].append(hi - lo)
            for nm in names:
                spec = specs[nm]
                cfg, key_col = spec[0], spec[1]
                weight_col = spec[2] if len(spec) > 2 else None
                sk = make_sketch(cfg)
                keys = sorted_batch.column(key_col).slice(lo, hi - lo)
                if weight_col is not None:
                    sk.add_batch(
                        keys, sorted_batch.column(weight_col).slice(lo, hi - lo)
                    )
                else:
                    sk.add_batch(keys)
                cols[nm].append(sk.to_bytes())
        return pa.table(
            {group_col: pa.array(cols[group_col],
                                 type=batch.schema.field(group_col).type),
             "n_rows": pa.array(cols["n_rows"], type=pa.int64()),
             **{nm: pa.array(cols[nm], type=pa.binary()) for nm in names}}
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    aggs = [Sum("n_rows", alias_name="n_rows")]
    for nm in names:
        aggs.append(MergeSketchBlobs(on=nm, alias_name=nm))
    return partials.groupby(group_col).aggregate(*aggs)
