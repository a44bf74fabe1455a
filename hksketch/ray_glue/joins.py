"""Distributed big-big equi-join.

The broadcast / Bloom-semi joins in ``__ray_entry__`` cover the
small-side cases (dimension tables, filters); this operator covers the
remaining shape — BOTH sides too large to broadcast (fact ↔ fact, e.g.
documents ↔ embeddings at corpus scale).  Ray Data 2.49 has no native
join, so it is expressed with the primitives it does have:

- each side is normalized onto one shared wide schema (its own columns
  plus nulls for the other side's) and tagged with ``__side``;
- ONE hash-sharded shuffle co-locates both sides' rows for a key range
  (``groupby(shard)``, shard = splitmix64(key) & mask — NOT a groupby on
  the raw key, which would make one Python-level group per key);
- inside each shard the actual match is a single polars (Rust) hash
  join — vectorized, never a per-key Python loop.

Per-task memory is bounded by (rows of both sides) / shards; size
``shards`` from parquet footers (``auto_shards``).  Skewed hot keys
concentrate in one shard — the standard mitigations (salt the hot keys,
or pre-aggregate one side) apply and are the caller's choice, as in any
shuffle-join engine.  Null join keys never match (SQL semantics) and are
dropped at the shard stage.

Exchange-byte note (measured, BASELINE.md "as-of join" row): the
null padding is NOT free on the wire — ``pa.nulls(n, type)`` allocates
and IPC-serializes the full fixed-width data buffer, so every row ships
the WHOLE wide schema through the shuffle (~2× bytes for same-width
sides; more when one side is wide).  Mitigations: (a) caller column
projection — select only the columns the join must carry (every
registry caller does); (b) both ``asof_join`` and ``hash_join`` take
``exchange="refs"``, the side-separated per-shard-ref plan
(:func:`_refs_exchange`) that ships each row at its OWN width
(measured 3× faster at 8 cpus on 6-value-column sides; the wide union
stays the default — fully streaming, and better for 1-2-column sides,
where its single overlapped shuffle beats the refs plan's two
sequential exchanges; refs is left-driven, so full outer stays wide).
The wide exchange is bandwidth-bound, a per-NODE resource that a real
cluster multiplies with node count — on this single box it shows up as
the flat 2→8 cpu wall time of the join microbenches, with per-stage
compute scaling normally.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64

U64 = np.uint64


def _key_type(lschema, rschema, on: str, right_on: str) -> "pa.DataType":
    """The join-key carrier type: int64 for integer keys, large_string
    for string keys (URLs, hostnames, source names — corpora join on
    text as often as on ids).  Both sides must agree on the family."""
    def fam(t):
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "str"
        return None

    lt = dict(zip(lschema.names, lschema.types)).get(on)
    rt = dict(zip(rschema.names, rschema.types)).get(right_on)
    lf, rf = fam(lt), fam(rt)
    if lf is None or rf is None or lf != rf:
        raise TypeError(
            f"join keys must both be integer or both string; got "
            f"{on}:{lt} vs {right_on}:{rt}"
        )
    return pa.int64() if lf == "int" else pa.large_string()


def _key_shards(key: pa.Array, shards: int) -> np.ndarray:
    """Vectorized shard derivation for either key family (strings via
    the process-independent hk64 bytes hash)."""
    if pa.types.is_integer(key.type):
        kf = (
            pa.compute.fill_null(key, 0)
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return (splitmix64(kf.view(U64)) & U64(shards - 1)).astype(np.int32)
    from ..hashing import hash_array

    h = hash_array(pa.compute.fill_null(key, ""), 1, fn="hk64")
    return (h & U64(shards - 1)).astype(np.int32)


def _join_columns(lschema, rschema, on: str, right_on: str, suffix: str):
    """The ONE copy of the join output-column derivation shared by
    hash_join and broadcast_join (so skew_join's union of the two plans
    can never drift schema-wise): returns (ltypes, rtypes, lcols, rcols,
    rename, out_lcols, out_rcols, out_schema).  Key appears once, named
    ``on`` (int64 or large_string per :func:`_key_type`); right-side
    name clashes get ``suffix``."""
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)
    rcols = [n for n in rschema.names if n != right_on]
    rename = {c: (c + suffix if c in lcols else c) for c in rcols}
    out_lcols = [c for c in lcols if c != on]
    out_rcols = [rename[c] for c in rcols]
    ktype = _key_type(lschema, rschema, on, right_on)
    out_schema = pa.schema(
        [(on, ktype)]
        + [(c, ltypes[c]) for c in out_lcols]
        + [(rename[c], rtypes[c]) for c in rcols]
    )
    return ltypes, rtypes, lcols, rcols, rename, out_lcols, out_rcols, out_schema


def _require_schemas(name: str, lschema, rschema):
    if lschema is None or rschema is None:
        raise ValueError(
            "%s: %s side has no schema (empty mapped dataset) — supply a "
            "typed empty table or handle the empty case upstream"
            % (name, "left" if lschema is None else "right")
        )


def hash_join(
    left,
    right,
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    shards: int | str = "auto",
    suffix: str = "_r",
    lschema=None,
    rschema=None,
    exchange: str = "wide",
):
    """Equi-join two Datasets on an integer or string key; returns a
    Dataset.

    ``how``: ``"inner"``, ``"left"`` or ``"full"`` (full outer —
    unmatched rows of BOTH sides survive with nulls; only the sharded
    plan can express it, since a broadcast side cannot know globally
    which of its rows went unmatched).  Right-side columns whose names
    clash with left-side ones get ``suffix``.  The key appears once,
    named ``on``.

    ``lschema`` / ``rschema``: pass the side's known ``pa.Schema`` to skip
    the ``Dataset.schema()`` probe.  This matters when a side sits behind
    an all-to-all (e.g. the output of another ``hash_join``): Ray can only
    infer that schema by RUNNING the whole shuffle, so chained joins
    without an explicit schema execute the inner join twice.

    ``exchange``: ``"wide"`` (default — both sides union onto one
    null-padded wide schema, ONE fully-streaming shuffle) or ``"refs"``
    (side-separated per-shard-ref plan: each row ships at its OWN
    width; the right side materializes as per-shard blocks — see
    :func:`_refs_exchange` and the module docstring's exchange-byte
    note; measured ~3× faster for wide-payload sides).  ``"refs"`` is
    left-driven and rejects ``how="full"`` — a shard with only right
    rows would produce no group.
    """
    import ray.data as rd

    from .partitioning import auto_shards, estimate_rows

    right_on = right_on or on
    if how not in ("inner", "left", "full"):
        raise ValueError(
            f"how must be 'inner', 'left' or 'full', got {how!r}"
        )
    if exchange not in ("wide", "refs"):
        raise ValueError(f"exchange must be 'wide' or 'refs', got {exchange!r}")
    if exchange == "refs" and how == "full":
        raise ValueError(
            "exchange='refs' cannot express full outer (a shard with only "
            "right rows produces no left group) — use exchange='wide'"
        )

    if lschema is None:  # `or` would discard a zero-field schema (falsy)
        lschema = left.schema()
    if rschema is None:
        rschema = right.schema()
    # a fully-empty MAPPED dataset has no schema to join on; the caller
    # must materialize a typed empty table (rd.from_arrow(empty_table))
    # or skip the join for that base case
    _require_schemas("hash_join", lschema, rschema)
    ltypes, rtypes, lcols, rcols, rename, out_lcols, out_rcols, _ = (
        _join_columns(lschema, rschema, on, right_on, suffix)
    )
    ktype = _key_type(lschema, rschema, on, right_on)

    if shards == "auto":
        est = (estimate_rows(left) or 0) + (estimate_rows(right) or 0)
        shards = auto_shards(
            left, target_rows_per_shard=2_000_000, min_shards=32,
            rows_hint=est or None,
        )
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    # one wide schema: __key, __side, __shard, left cols (sans key),
    # right cols (renamed, sans key)
    lfields = [(c, ltypes[c]) for c in out_lcols]
    rfields = [(rename[c], rtypes[c]) for c in rcols]

    # source column on each side for every wide-schema column (None → the
    # other side owns it, pad with nulls)
    unrenamed = {v: k for k, v in rename.items()}

    def norm(side: int, key_col: str):
        # SQL semantics: null keys never match.  Inner (and the right side
        # of a left join) drops them at the map stage; sides whose
        # unmatched rows must SURVIVE (left side of a left join, both
        # sides of a full join) keep them — they ride to one shard and
        # surface unmatched (polars join_nulls=False never matches them).
        keep_nulls = (how == "left" and side == 0) or how == "full"

        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column(key_col)
            if not keep_nulls:
                batch = batch.filter(pa.compute.is_valid(key))
                key = batch.column(key_col)
            key = key.combine_chunks().cast(ktype)
            shard = _key_shards(key, shards)
            n = len(key)
            cols: dict = {
                "__key": key,
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "__shard": pa.array(shard, type=pa.int32()),
            }
            k = shard  # length source for the null pads below
            for name, typ in lfields:
                cols[name] = (
                    batch.column(name).cast(typ) if side == 0
                    else pa.nulls(len(k), type=typ)
                )
            for name, typ in rfields:
                cols[name] = (
                    batch.column(unrenamed[name]).cast(typ) if side == 1
                    else pa.nulls(len(k), type=typ)
                )
            return pa.table(cols)

        return fn

    out_schema = pa.schema(
        [("__key", ktype)]
        + [(n, t) for n, t in lfields]
        + [(n, t) for n, t in rfields]
    )

    def _equi_merge(lt_tab: pa.Table, rt_tab: pa.Table) -> pa.Table:
        """The ONE copy of the per-shard equi-join shared by both
        exchange modes: ``lt_tab`` carries ``__key`` + lfields,
        ``rt_tab`` carries ``__key`` + rfields; returns an
        ``out_schema`` table."""
        import polars as pl

        j = pl.from_arrow(lt_tab).join(
            pl.from_arrow(rt_tab), on="__key", how=how,
            maintain_order="left",
            coalesce=True if how == "full" else None,
        )
        t = j.to_arrow()
        cols = {}
        for f in out_schema:
            c = t.column(f.name)
            cols[f.name] = c.cast(f.type) if c.type != f.type else c
        return pa.table(cols)

    if exchange == "wide":
        lnorm = left.map_batches(
            norm(0, on), batch_format="pyarrow", zero_copy_batch=True
        )
        rnorm = right.map_batches(
            norm(1, right_on), batch_format="pyarrow", zero_copy_batch=True
        )
        both = lnorm.union(rnorm)

        def join_shard(grp: pa.Table) -> pa.Table:
            if grp.num_rows == 0:
                return out_schema.empty_table()
            side = grp.column("__side").to_numpy(zero_copy_only=False)
            lt_tab = grp.select(
                ["__key"] + [n for n, _ in lfields]
            ).filter(pa.array(side == 0))
            rt_tab = grp.select(
                ["__key"] + [n for n, _ in rfields]
            ).filter(pa.array(side == 1))
            return _equi_merge(lt_tab, rt_tab)

        out = both.groupby("__shard").map_groups(
            join_shard, batch_format="pyarrow"
        )
    else:
        def narrow(side: int, key_col: str, fields, srcs):
            # same null-key rules as `norm` (how='full' is rejected above,
            # so only the left side of a LEFT join keeps null keys)
            keep_nulls = how == "left" and side == 0

            def fn(batch: pa.Table) -> pa.Table:
                key = batch.column(key_col)
                if not keep_nulls:
                    batch = batch.filter(pa.compute.is_valid(key))
                    key = batch.column(key_col)
                key = key.combine_chunks().cast(ktype)
                shard = _key_shards(key, shards)
                cols: dict = {
                    "__key": key,
                    "__shard": pa.array(shard, type=pa.int32()),
                }
                for (name, typ), src in zip(fields, srcs):
                    cols[name] = batch.column(src).cast(typ)
                return pa.table(cols)

            return fn

        rnarrow_schema = pa.schema(
            [("__key", ktype)] + [(n, t) for n, t in rfields]
        )
        rnarrow = right.map_batches(
            narrow(1, right_on, rfields, [unrenamed[n] for n, _ in rfields]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        lnarrow = left.map_batches(
            narrow(0, on, lfields, [n for n, _ in lfields]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        out = _refs_exchange(
            lnarrow, rnarrow, rnarrow_schema, _equi_merge, out_schema
        )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {on: batch.column("__key")}
        for c in out_lcols:
            cols[c] = batch.column(c)
        for c in out_rcols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_join(
    left,
    right,
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    suffix: str = "_r",
    lschema=None,
    rschema=None,
):
    """Equi-join with a SMALL right side: the right table is collected
    once, ``ray.put`` into the object store, and every left batch runs a
    polars (Rust) join against it — ZERO shuffle, the left side streams.
    Output schema/semantics identical to :func:`hash_join` (key named
    ``on``, right clashes suffixed, SQL null-key semantics).  The caller
    asserts the right side fits driver+worker heaps; :func:`auto_join`
    makes that call from footer estimates."""
    import ray
    import ray.data as rd

    right_on = right_on or on
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if lschema is None:
        lschema = left.schema()
    if rschema is None:
        rschema = right.schema()
    _require_schemas("broadcast_join", lschema, rschema)
    _, _, lcols, rcols, rename, _, _, out_schema = _join_columns(
        lschema, rschema, on, right_on, suffix
    )

    ktype = _key_type(lschema, rschema, on, right_on)
    blocks = [t for t in ray.get(right.to_arrow_refs()) if t.num_rows > 0]
    if blocks:
        rt = pa.concat_tables(
            [b.select([right_on] + rcols) for b in blocks]
        ).combine_chunks()
    else:
        rt = rschema.empty_table().select([right_on] + rcols)
    cols = {on: rt.column(right_on).cast(ktype)}
    for c in rcols:
        cols[rename[c]] = rt.column(c)
    rt = pa.table(cols)
    rref = ray.put(rt)

    def join_batch(b: pa.Table) -> pa.Table:
        import polars as pl

        r = ray.get(rref)
        lt = pa.table(
            {on: b.column(on).cast(ktype),
             **{c: b.column(c) for c in lcols if c != on}}
        )
        j = pl.from_arrow(lt).join(
            pl.from_arrow(r), on=on, how=how, maintain_order="left"
        )
        t = j.to_arrow()
        return pa.table(
            {f.name: (t.column(f.name).cast(f.type)
                      if t.column(f.name).type != f.type else t.column(f.name))
             for f in out_schema}
        )

    return left.map_batches(
        join_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def auto_join(
    left,
    right,
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    suffix: str = "_r",
    lschema=None,
    rschema=None,
    shards: int | str = "auto",
    broadcast_threshold_rows: int = 1_000_000,
    explain: bool = False,
    exchange: str = "wide",
):
    """Join with the physical plan chosen from Parquet-footer row
    estimates (the planner decision every SQL engine makes): a right
    side estimated under ``broadcast_threshold_rows`` broadcasts —
    zero-shuffle, left streams — otherwise both sides take the sharded
    :func:`hash_join`.  An unknown estimate (non-file-backed side)
    conservatively hash-joins.  ``explain=True`` returns
    ``(dataset, "broadcast" | "hash")`` for plan assertions.
    ``exchange`` passes through to the sharded plan (ignored by the
    broadcast plan, which has no shuffle at all)."""
    from .partitioning import estimate_rows

    est = estimate_rows(right)
    # full outer is only expressible on the sharded plan (a broadcast
    # side cannot know globally which rows went unmatched)
    if (est is not None and est <= broadcast_threshold_rows
            and how != "full"):
        ds = broadcast_join(
            left, right, on, right_on=right_on, how=how, suffix=suffix,
            lschema=lschema, rschema=rschema,
        )
        plan = "broadcast"
    else:
        ds = hash_join(
            left, right, on, right_on=right_on, how=how, suffix=suffix,
            shards=shards, lschema=lschema, rschema=rschema,
            exchange=exchange,
        )
        plan = "hash"
    return (ds, plan) if explain else ds


def skew_join(
    left,
    right,
    on: str,
    right_on: Optional[str] = None,
    shards: int | str = "auto",
    suffix: str = "_r",
    lschema=None,
    rschema=None,
    hot_k: int = 64,
    hot_min_share_ppm: int = 10_000,
    max_hot_right_rows: int = 1_000_000,
    sketch_seed: int = 12345,
    explain: bool = False,
):
    """Skew-aware INNER equi-join — Spark-AQE-style hot-key handling with
    the library's own flagship sketch as the detector:

    1. ONE HeavyKeeper pass over the left key column (``global_sketch``:
       per-batch partials, tree merge, no shuffle) estimates the top
       ``hot_k`` keys; keys whose estimated count ≥ ``hot_min_share_ppm``
       parts-per-million of the left rows are declared HOT.
    2. The hot keys' RIGHT rows are collected and broadcast (validated
       ≤ ``max_hot_right_rows`` — raise, never thrash); the hot matches
       come from a zero-shuffle :func:`broadcast_join` of the full left
       against that slice.
    3. Cold keys take the ordinary sharded :func:`hash_join` against the
       right REMAINDER — the all-to-all never sees a hot key, so no
       reducer inherits the mega-group.

    The two plans partition the right side exactly (every right row goes
    to one plan), so ``union`` of their outputs is the exact inner join.
    Cost note: the left side streams twice (once per plan); that is the
    standard trade against a reducer holding share·|left| rows of one
    key.  Inner only — a LEFT join would emit unmatched left rows from
    both plans.  ``explain=True`` returns ``(dataset, hot_keys list)``.
    """
    import pyarrow.compute as pc

    from ..sketch import sketch_from_bytes
    from .aggregate import sketch_config
    from .partitioning import estimate_rows
    from .stages import global_sketch

    right_on = right_on or on
    if lschema is None:
        lschema = left.schema()
    if rschema is None:
        rschema = right.schema()
    ktype = _key_type(lschema, rschema, on, right_on)

    def key_only(b: pa.Table) -> pa.Table:
        key = b.column(on)
        # null keys never match in an inner join — they can't be hot
        return pa.table(
            {on: key.filter(pa.compute.is_valid(key)).cast(ktype)}
        )

    keys_ds = left.map_batches(
        key_only, batch_format="pyarrow", zero_copy_batch=True
    )
    total = estimate_rows(left)
    if total is None:
        total = keys_ds.count()
    cfg = sketch_config(
        "bucketed", k=int(hot_k), width=1 << 13, depth=4, decay=0.9,
        seed=sketch_seed,
    )
    blob = global_sketch(keys_ds, cfg, key_col=on)
    sk = sketch_from_bytes(blob)
    threshold = max(1, (int(total) * int(hot_min_share_ppm)) // 1_000_000)
    # sketch items round-trip in the key's own family (string hot keys
    # arrive back as str, int ones as int)
    hot = sorted(
        item for item, est in sk.list()[: int(hot_k)] if est >= threshold
    )
    hot_set = pa.array(hot, type=ktype)

    if not hot:
        ds = hash_join(
            left, right, on, right_on=right_on, how="inner", suffix=suffix,
            shards=shards, lschema=lschema, rschema=rschema,
        )
        return (ds, hot) if explain else ds

    right_hot = right.map_batches(
        lambda b: b.filter(
            pc.is_in(pc.cast(b.column(right_on), ktype), value_set=hot_set)
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    n_hot_right = right_hot.count()
    if n_hot_right > max_hot_right_rows:
        raise ValueError(
            f"skew_join: {n_hot_right} right rows match the {len(hot)} hot "
            f"keys > max_hot_right_rows={max_hot_right_rows}; the hot side "
            f"does not fit a broadcast — salt the composite key instead "
            f"(both sides heavy on the same key = an exploding join by "
            f"construction)"
        )
    right_cold = right.map_batches(
        lambda b: b.filter(
            pc.invert(
                pc.is_in(pc.cast(b.column(right_on), ktype),
                         value_set=hot_set)
            )
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    hot_out = broadcast_join(
        left, right_hot, on, right_on=right_on, how="inner", suffix=suffix,
        lschema=lschema, rschema=rschema,
    )
    cold_out = hash_join(
        left, right_cold, on, right_on=right_on, how="inner", suffix=suffix,
        shards=shards, lschema=lschema, rschema=rschema,
    )
    ds = cold_out.union(hot_out)
    return (ds, hot) if explain else ds


def _refs_exchange(lnarrow, rnarrow, rnarrow_schema, merge, empty_schema):
    """Side-separated shard exchange (``exchange="refs"`` of asof_join
    and hash_join): both inputs are ALREADY narrow-normalized with a
    ``__shard`` int32 column — each side ships ONLY its own columns, no
    null padding through the shuffle.  The right side is grouped by
    shard once and MATERIALIZED as per-shard object-store blocks; the
    left side takes its own shard exchange and every left group fetches
    exactly its shard's right blocks (the ``dedup/pairverify``
    per-shard-ref discipline — refs travel in the task closure, rows
    never transit the driver).  Per-task memory: one left shard + its
    right shard, the same bound as the wide path.  LEFT-DRIVEN only: a
    shard with right rows but no left rows produces no group, so
    full-outer semantics must stay on the wide plan."""
    import ray

    rparts = rnarrow.groupby("__shard").map_groups(
        lambda g: g, batch_format="pyarrow"
    ).materialize()
    refs = rparts.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def shards_of(tab: pa.Table):
        # blocks are one-group tables in the common case, but Ray may
        # coalesce or split outputs — list every shard a block carries
        if tab.num_rows == 0:
            return []
        u = np.unique(tab.column("__shard").to_numpy(zero_copy_only=False))
        return [int(s) for s in u]

    shard_refs: dict[int, list] = {}
    for sids, ref in zip(ray.get([shards_of.remote(r) for r in refs]), refs):
        for sid in sids:
            shard_refs.setdefault(sid, []).append(ref)

    def join_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if g.num_rows == 0:
            return empty_schema.empty_table()
        sid = g.column("__shard")[0].as_py()
        blocks = shard_refs.get(sid, ())
        if blocks:
            picked = [
                b.filter(
                    pc.equal(b.column("__shard"), pa.scalar(sid, pa.int32()))
                ).drop_columns(["__shard"])
                for b in ray.get(list(blocks))
            ]
            rt_tab = pa.concat_tables(picked).combine_chunks()
        else:
            rt_tab = rnarrow_schema.empty_table()
        return merge(g.drop_columns(["__shard"]), rt_tab)

    return lnarrow.groupby("__shard").map_groups(
        join_group, batch_format="pyarrow"
    )


def _asof_refs_exchange(left, right, on, t_on, right_on, right_t_on,
                        ktype, shards, lfields, rfields, unrenamed,
                        merge, wide_schema):
    """asof_join's ``exchange="refs"`` plan: build the two narrow sides
    (own columns + ``__key, __t, __shard``) and hand them to the shared
    :func:`_refs_exchange`."""

    def narrow(side: int, key_col: str, t_col: str, fields, srcs):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = batch.column(key_col)
            tv = batch.column(t_col)
            if side == 1:
                keep = pc.and_(pc.is_valid(key), pc.is_valid(tv))
                batch = batch.filter(keep)
                key = batch.column(key_col)
                tv = batch.column(t_col)
            key = key.combine_chunks().cast(ktype)
            shard = _key_shards(key, shards)
            cols: dict = {
                "__key": key,
                "__t": tv.combine_chunks().cast(pa.int64()),
                "__shard": pa.array(shard, type=pa.int32()),
            }
            for (name, typ), src in zip(fields, srcs):
                cols[name] = batch.column(src).cast(typ)
            return pa.table(cols)

        return fn

    rnarrow_schema = pa.schema(
        [("__key", ktype), ("__t", pa.int64())]
        + [(n, t) for n, t in rfields]
    )
    rnarrow = right.map_batches(
        narrow(1, right_on, right_t_on, rfields,
               [unrenamed[n] for n, _ in rfields]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    lnarrow = left.map_batches(
        narrow(0, on, t_on, lfields, [n for n, _ in lfields]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _refs_exchange(lnarrow, rnarrow, rnarrow_schema, merge, wide_schema)


def asof_join(
    left,
    right,
    on: str,
    t_on: str,
    right_on: Optional[str] = None,
    right_t_on: Optional[str] = None,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    how: str = "left",
    shards: int | str = "auto",
    suffix: str = "_r",
    right_tiebreak: Optional[str] = None,
    lschema=None,
    rschema=None,
    exchange: str = "wide",
):
    """Distributed AS-OF join: for every left row ``(key, t)`` attach the
    right row with the same key and the nearest time at-or-before it
    (``direction="backward"``, inclusive — the SQL ``ASOF JOIN ... ON
    l.k = r.k AND l.t >= r.t``), at-or-after it (``"forward"``), or
    closest in either direction (``"nearest"``).  The classic
    point-in-time lookup (latest price before a trade, last order before
    an event) that an equi-join cannot express and a range join answers
    with counts rather than THE matching row.

    Physical plan — the same ONE-shuffle discipline as :func:`hash_join`:
    both sides are normalized onto a shared wide schema with ``__key``
    (int64 / large_string per :func:`_key_type`) and ``__t`` (the time
    column cast to int64 — µs for timestamps), hash-sharded on the KEY
    ONLY (every row of one key lands in one shard, so the as-of scan
    never crosses shards), and each shard resolves matches with a single
    polars (Rust) ``join_asof`` over time-sorted frames — vectorized
    merge scan, never a per-key Python loop.  Per-task memory is bounded
    by (rows of both sides)/shards; hot keys concentrate as in any
    shuffle join (salt or pre-dedupe the right side if one key dominates).

    Semantics:

    - ``how="left"`` (the natural as-of shape): every left row survives;
      unmatched rows carry nulls in the right columns.  ``how="inner"``
      drops unmatched left rows.
    - Left rows with a NULL key or NULL time survive unmatched under
      ``"left"`` (SQL: null never equals/compares); right rows with a
      null key or time are dropped — they can never be anyone's match.
    - ``tolerance`` (optional, > 0, in ``__t`` units — µs for timestamp
      columns): a backward match must satisfy ``t_l − t_r ≤ tolerance``,
      a forward match ``t_r − t_l ≤ tolerance``.
    - Ties (several right rows at the exact same ``(key, t)``): pass
      ``right_tiebreak`` (a right column name, e.g. a unique id) to pin
      the winner — the MAX tiebreak for ``backward``, the MIN for
      ``forward``.  Without it the winner among exact-``t`` ties is
      unspecified (as in SQL ASOF), so project only tie-invariant
      columns (e.g. the matched time itself).
    - Output schema: key once (named ``on``), all other left columns
      (including ``t_on``, original type), then the right value columns
      (including ``right_t_on`` — the matched row's time, null when
      unmatched) with name clashes suffixed — exactly the
      :func:`hash_join` contract.

    ``exchange`` selects the physical shuffle:

    - ``"wide"`` (default): both sides union onto one null-padded wide
      schema and take ONE ``groupby(shard)`` exchange — fully streaming
      on both inputs, but every row ships at full output width
      (``pa.nulls`` padding serializes real bytes; see the module
      docstring's exchange-byte note).
    - ``"refs"``: side-separated exchange — each side ships ONLY its
      own columns.  The right side is grouped by shard once and
      MATERIALIZED as per-shard object-store blocks (the
      ``dedup/pairverify`` per-shard-ref discipline); the left side
      takes its own shard exchange and each left group fetches exactly
      its shard's right blocks.  ~2× less exchange traffic for
      same-width sides at the cost of right-side materialization —
      prefer it when the right side fits the object store (it usually
      does: the lookup side of a point-in-time join is the smaller
      one).  Results are identical between modes (tested).

    Reference scope note: the reference engine has no joins; this is
    part of the engine-extension surface (SURVEY.md §2 custom
    operators: "as-of join, range join" — the range half lives in
    ``pipelines/intervals.py``).
    """
    from .partitioning import auto_shards, estimate_rows

    right_on = right_on or on
    right_t_on = right_t_on or t_on
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )
    if tolerance is not None and tolerance <= 0:
        raise ValueError(f"tolerance must be > 0, got {tolerance}")
    if exchange not in ("wide", "refs"):
        raise ValueError(f"exchange must be 'wide' or 'refs', got {exchange!r}")

    if lschema is None:
        lschema = left.schema()
    if rschema is None:
        rschema = right.schema()
    _require_schemas("asof_join", lschema, rschema)

    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))

    def _t_ok(t):
        return t is not None and (
            pa.types.is_integer(t) or pa.types.is_timestamp(t)
        )

    if not _t_ok(ltypes.get(t_on)) or not _t_ok(rtypes.get(right_t_on)):
        raise TypeError(
            f"as-of time columns must be integer or timestamp; got "
            f"{t_on}:{ltypes.get(t_on)} vs {right_t_on}:{rtypes.get(right_t_on)}"
        )
    ktype = _key_type(lschema, rschema, on, right_on)
    if right_tiebreak is not None and right_tiebreak not in rtypes:
        raise KeyError(f"right_tiebreak {right_tiebreak!r} not a right column")

    # wide-schema columns: key appears once; BOTH time columns ride as
    # ordinary value columns (original types) so the output keeps them
    lcols = [c for c in lschema.names if c != on]
    rcols = [c for c in rschema.names if c != right_on]
    lset = set(lschema.names)
    rename = {c: (c + suffix if c in lset else c) for c in rcols}
    lfields = [(c, ltypes[c]) for c in lcols]
    rfields = [(rename[c], rtypes[c]) for c in rcols]
    unrenamed = {v: k for k, v in rename.items()}
    tb_col = rename[right_tiebreak] if right_tiebreak is not None else None

    if shards == "auto":
        est = (estimate_rows(left) or 0) + (estimate_rows(right) or 0)
        shards = auto_shards(
            left, target_rows_per_shard=2_000_000, min_shards=32,
            rows_hint=est or None,
        )
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    def norm(side: int, key_col: str, t_col: str):
        # left keeps null key/t rows (they survive unmatched); right
        # drops them (they can never be a match)
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = batch.column(key_col)
            tv = batch.column(t_col)
            if side == 1:
                keep = pc.and_(pc.is_valid(key), pc.is_valid(tv))
                batch = batch.filter(keep)
                key = batch.column(key_col)
                tv = batch.column(t_col)
            key = key.combine_chunks().cast(ktype)
            shard = _key_shards(key, shards)
            cols: dict = {
                "__key": key,
                "__t": tv.combine_chunks().cast(pa.int64()),
                "__side": pa.array(np.full(len(shard), side, dtype=np.int8)),
                "__shard": pa.array(shard, type=pa.int32()),
            }
            for name, typ in lfields:
                cols[name] = (
                    batch.column(name).cast(typ) if side == 0
                    else pa.nulls(len(shard), type=typ)
                )
            for name, typ in rfields:
                cols[name] = (
                    batch.column(unrenamed[name]).cast(typ) if side == 1
                    else pa.nulls(len(shard), type=typ)
                )
            return pa.table(cols)

        return fn

    wide_schema = pa.schema(
        [("__key", ktype), ("__t", pa.int64())]
        + [(n, t) for n, t in lfields]
        + [(n, t) for n, t in rfields]
    )

    def _merge(lt_tab: pa.Table, rt_tab: pa.Table) -> pa.Table:
        """The ONE copy of the per-shard as-of resolution shared by both
        exchange modes: ``lt_tab`` carries ``__key, __t`` + lfields,
        ``rt_tab`` carries ``__key, __t`` + rfields; returns a
        ``wide_schema`` table."""
        import warnings

        import polars as pl

        if lt_tab.num_rows == 0:
            return wide_schema.empty_table()
        lt = pl.from_arrow(lt_tab)
        rt = pl.from_arrow(rt_tab)
        # matched marker that survives even all-null right value columns
        rt = rt.with_columns(pl.col("__t").alias("__rt"))
        rsort = ["__t"] + ([tb_col] if tb_col is not None else [])
        with warnings.catch_warnings():
            # polars cannot verify per-`by`-group sortedness and warns;
            # both frames ARE time-sorted here
            warnings.simplefilter("ignore")
            j = lt.sort("__t").join_asof(
                rt.sort(rsort), on="__t", by="__key",
                strategy=direction, tolerance=tolerance,
            )
        if how == "inner":
            j = j.filter(pl.col("__rt").is_not_null())
        t = j.drop("__rt").to_arrow()
        cols = {}
        for f in wide_schema:
            c = t.column(f.name)
            cols[f.name] = c.cast(f.type) if c.type != f.type else c
        return pa.table(cols)

    if exchange == "wide":
        lnorm = left.map_batches(
            norm(0, on, t_on), batch_format="pyarrow", zero_copy_batch=True
        )
        rnorm = right.map_batches(
            norm(1, right_on, right_t_on), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        both = lnorm.union(rnorm)

        def asof_shard(grp: pa.Table) -> pa.Table:
            if grp.num_rows == 0:
                return wide_schema.empty_table()
            side = grp.column("__side").to_numpy(zero_copy_only=False)
            lt_tab = grp.select(
                ["__key", "__t"] + [n for n, _ in lfields]
            ).filter(pa.array(side == 0))
            rt_tab = grp.select(
                ["__key", "__t"] + [n for n, _ in rfields]
            ).filter(pa.array(side == 1))
            return _merge(lt_tab, rt_tab)

        out = both.groupby("__shard").map_groups(
            asof_shard, batch_format="pyarrow"
        )
    else:
        out = _asof_refs_exchange(
            left, right, on, t_on, right_on, right_t_on, ktype, shards,
            lfields, rfields, unrenamed, _merge, wide_schema,
        )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {on: batch.column("__key")}
        for c, _ in lfields:
            cols[c] = batch.column(c)
        for c, _ in rfields:
            cols[c] = batch.column(c)
        return pa.table(cols)

    res = out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    # all-empty map_groups output yields a SCHEMA-LESS dataset (zero
    # blocks); a typed zero-row seed block keeps the output schema stable
    # for downstream stages even when no row survives (q11 lesson)
    import ray.data as rd

    out_schema = pa.schema(
        [(on, ktype)] + [(n, t) for n, t in lfields]
        + [(n, t) for n, t in rfields]
    )
    return rd.from_arrow(out_schema.empty_table()).union(res)
