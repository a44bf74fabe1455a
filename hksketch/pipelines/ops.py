"""Exact distributed operators (the oracles of the reference's test harness,
expressed Ray-Data-first).

The reference validates sketches against exact ``HashMap`` counts and exact
sorted top-k (`/root/reference/tests/accuracy_compare.rs:43-63`,
`examples/ip_files.rs:56-113`).  Here the exact path is itself distributed:

- ``exact_counts``: per-batch vectorized pre-aggregation (one row per key
  per batch) → ``groupby(key).sum`` over the much smaller partials — the
  combiner pattern that keeps the shuffle proportional to #distinct keys,
  not #rows.
- ``exact_topk``: counts → ``sort([count desc, key asc]).limit(k)``
  (deterministic tie-break matches SQL ``ORDER BY count DESC, key ASC``).
- ``exact_distinct``: per-batch unique → global unique count.
- ``exact_quantiles``: distributed sort + streamed rank extraction.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

try:
    import polars as pl

    _HAVE_POLARS = True
except Exception:  # pragma: no cover
    _HAVE_POLARS = False

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def read_table(sf_dir: str, name: str, columns: Optional[list[str]] = None):
    """Column-pruned parquet read (prune at the read, never after)."""
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _batch_counts(key_col: str, weight_col: Optional[str], out: str):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key_col: batch.column(key_col),
                             out: pa.array([], type=pa.int64())})
        if _HAVE_POLARS:
            df = pl.from_arrow(batch)
            if weight_col:
                g = df.group_by(key_col).agg(pl.col(weight_col).sum().alias(out))
            else:
                g = df.group_by(key_col).agg(pl.len().cast(pl.Int64).alias(out))
            t = g.to_arrow()
            cols = {}
            for name in (key_col, out):
                c = t.column(name)
                f = batch.schema.field(key_col).type if name == key_col else pa.int64()
                cols[name] = c.cast(f) if c.type != f else c
            return pa.table(cols)
        # fallback
        keys = batch.column(key_col).to_pylist()
        from collections import Counter

        c = Counter(keys)
        return pa.table({key_col: pa.array(list(c)), out: pa.array(list(c.values()), type=pa.int64())})

    return fn


def collect_blocks(ds) -> list[pa.Table]:
    """``ray.get`` every block of a BOUNDED result, dropping the
    schema-less empty blocks that sort / limit / repartition emit (an
    empty block carries no columns, so ``pa.concat_tables`` over the raw
    refs raises ArrowInvalid).  Returns ``[]`` when nothing remains —
    callers supply their own typed empty table for that base case."""
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]


def exact_counts(
    ds,
    key_col: str,
    weight_col: Optional[str] = None,
    count_name: str = "count",
):
    """Exact per-key totals; shuffle carries per-(batch, key) partials."""
    pre = ds.map_batches(
        _batch_counts(key_col, weight_col, count_name),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return pre.groupby(key_col).aggregate(Sum(count_name, alias_name=count_name))


def exact_topk(
    ds,
    key_col: str,
    k: int,
    weight_col: Optional[str] = None,
    count_name: str = "count",
):
    """Top-k by exact count; ties key-ascending (A2 semantics,
    tests/accuracy_compare.rs:51-56)."""
    counts = exact_counts(ds, key_col, weight_col, count_name)
    return counts.sort([count_name, key_col], descending=[True, False]).limit(k)


def exact_distinct_count(ds, key_col: str) -> int:
    """Exact COUNT(DISTINCT key): per-batch unique (combiner) → distributed
    groupby → COUNT of groups.  The distinct keys themselves never land on
    the driver (``unique()`` would return the full key list — unbounded for
    e.g. distinct tokens at corpus scale); only the row count does."""
    import pyarrow.compute as pc

    def uniq(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: pc.unique(batch.column(key_col).combine_chunks())})

    pre = ds.map_batches(uniq, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby(key_col).aggregate(Count(alias_name="_n")).count()


def elements_at_ranks(ds, col: str, ranks: Iterable[int]) -> dict[int, float]:
    """Values at the given 0-based ranks of the sorted column via
    distributed sort + BLOCK-PRUNED rank extraction: block refs of the
    sorted dataset stay in the object store, tiny remote tasks report each
    block's row count, and the driver fetches ONLY the blocks containing a
    target rank — not the ~q·n rows a streamed scan would pull through the
    driver (a 0.95 quantile would stream 95% of the column)."""
    import ray

    ranks = sorted(set(int(r) for r in ranks))
    if not ranks:
        return {}
    refs = ds.sort(col).to_arrow_refs()  # sorted order preserved

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])

    @ray.remote
    def _pick(t: pa.Table, local_ranks: list[int]) -> list[float]:
        c = t.column(col)
        return [float(c[i].as_py()) for i in local_ranks]

    per_block: dict[int, list[int]] = {}
    for r in ranks:
        b = int(np.searchsorted(offsets, r, side="right") - 1)
        per_block.setdefault(b, []).append(r - int(offsets[b]))
    picked = ray.get(
        [_pick.remote(refs[b], lr) for b, lr in sorted(per_block.items())]
    )
    want: dict[int, float] = {}
    for (b, lr), vals in zip(sorted(per_block.items()), picked):
        for local, v in zip(lr, vals):
            want[int(offsets[b]) + local] = v
    return want


def exact_quantiles(ds, col: str, qs: Iterable[float]) -> list[float]:
    """Discrete quantiles (duckdb ``quantile_disc`` semantics: element at
    0-based rank ``ceil(q*n) - 1`` of the sorted column, 0 for q=0) via
    :func:`elements_at_ranks`."""
    n = ds.count()
    if n == 0:
        return [float("nan") for _ in qs]

    def _rank(q: float) -> int:
        return 0 if q <= 0 else min(n - 1, int(np.ceil(q * n)) - 1)

    want = elements_at_ranks(ds, col, [_rank(q) for q in qs])
    return [want[_rank(q)] for q in qs]


def rank_weighted_moments(ds, value_col: str, tie_col: str):
    """(n, total, S) with ``S = Σ rank_i · value_i`` over the dataset
    sorted ascending by ``(value_col, tie_col)`` (1-based global ranks) —
    the Gini/Lorenz building block, computed WITHOUT the values landing
    on the driver: the dataset sorts distributedly, each block's remote
    task reports (rows, Σv, Σ local_rank·v), and the driver folds the
    global rank offsets into S with pure integer arithmetic (one tiny
    tuple per block)."""
    import ray

    refs = ds.sort([value_col, tie_col]).to_arrow_refs()

    @ray.remote
    def _stats(t: pa.Table):
        if t.num_rows == 0:
            return (0, 0, 0)
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        local = np.arange(1, len(v) + 1, dtype=np.int64)
        return (int(len(v)), int(v.sum()), int((local * v).sum()))

    stats = ray.get([_stats.remote(r) for r in refs])
    n = total = S = 0
    offset = 0
    for rows, sv, srv in stats:
        # global rank = offset + local rank → Σ(rank·v) adds offset·Σv
        S += srv + offset * sv
        total += sv
        n += rows
        offset += rows
    return n, total, S


def fold_grouped_partials(pre, group_cols: list[str], sum_cols: list[str]) -> pa.Table:
    """Fold a Dataset of per-batch PARTIAL group rows into the final
    grouped sums on the DRIVER — no all-to-all.

    BOUNDED REGIME ONLY (the ``merge_via="driver"`` discipline of
    ``ray_glue.stages.global_sketch``): total driver traffic is
    ``group cardinality × upstream blocks`` rows, and the running
    accumulator is re-collapsed every 64 blocks so driver memory stays
    O(group cardinality).  Callers use this only where group count is
    STRUCTURALLY small — enum × enum keys (TPC-H Q1's 6 groups), hour
    buckets × event types — and keep ``groupby().aggregate()`` wherever
    cardinality grows with the data (tokens, users, content hashes).
    Skipping Ray Data's aggregate exchange saves its ~0.5-1 s fixed cost
    per query at any scale, because the partial rows it would shuffle
    are exactly what streams here.  int64 sums fold exactly and
    order-independently, so results are bit-identical to the shuffle
    path."""
    if not _HAVE_POLARS:
        from ray.data.aggregate import Sum as _Sum

        out = pre.groupby(group_cols).aggregate(
            *[_Sum(c, alias_name=c) for c in sum_cols]
        )
        blocks = collect_blocks(out)
        return pa.concat_tables(blocks) if blocks else None
    parts: list = []
    folds = [pl.col(c).sum() for c in sum_cols]
    part_schema: Optional[pa.Schema] = None

    def _collapse(chunks: list) -> list:
        return [pl.concat(chunks).group_by(group_cols).agg(folds)]

    for b in pre.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            sel = b.select([*group_cols, *sum_cols])
            if part_schema is None:
                part_schema = sel.schema
            parts.append(pl.from_arrow(sel))
        if len(parts) >= 64:
            parts = _collapse(parts)
    if not parts:
        return None
    out = _collapse(parts)[0].sort(group_cols).to_arrow()
    # restore the partials' arrow types (polars round-trips can widen,
    # e.g. string → large_string)
    return out.select(part_schema.names).cast(part_schema)


def grouped_count(
    ds, group_cols: list[str], count_name: str = "count", merge_via: str = "shuffle"
):
    """groupby(...).count() with the same pre-aggregation pattern: the
    shuffle carries one row per (batch, key-tuple), not one per input row.

    ``merge_via="driver"`` folds the per-batch partials on the driver via
    ``fold_grouped_partials`` (bounded-regime contract documented there) —
    for STRUCTURALLY small group cardinalities only; returns a pa.Table."""
    if merge_via == "driver" and _HAVE_POLARS:
        def pre_fn(batch: pa.Table) -> pa.Table:
            g = (
                pl.from_arrow(batch)
                .group_by(group_cols)
                .agg(pl.len().cast(pl.Int64).alias(count_name))
            )
            t = g.to_arrow()
            cols = {}
            for name in (*group_cols, count_name):
                c = t.column(name)
                f = (
                    batch.schema.field(name).type
                    if name in group_cols
                    else pa.int64()
                )
                cols[name] = c.cast(f) if c.type != f else c
            return pa.table(cols)

        pre = ds.map_batches(pre_fn, batch_format="pyarrow", zero_copy_batch=True)
        out = fold_grouped_partials(pre, group_cols, [count_name])
        if out is None:
            return pa.table(
                {**{c: pa.array([], type=pa.string()) for c in group_cols},
                 count_name: pa.array([], type=pa.int64())}
            )
        return out
    if len(group_cols) == 1:
        return exact_counts(ds, group_cols[0], count_name=count_name)
    if _HAVE_POLARS:
        def pre(batch: pa.Table) -> pa.Table:
            g = (
                pl.from_arrow(batch)
                .group_by(group_cols)
                .agg(pl.len().cast(pl.Int64).alias(count_name))
            )
            t = g.to_arrow()
            cols = {}
            for name in (*group_cols, count_name):
                c = t.column(name)
                f = (
                    batch.schema.field(name).type
                    if name in group_cols
                    else pa.int64()
                )
                cols[name] = c.cast(f) if c.type != f else c
            return pa.table(cols)

        ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        return ds.groupby(group_cols).aggregate(Sum(count_name, alias_name=count_name))
    return ds.groupby(group_cols).aggregate(Count(alias_name=count_name))


def distinct_counts(ds, key_col: str, value_col: str, count_name: str = "distinct_values"):
    """Exact COUNT(DISTINCT value) per key — the ground truth for
    "superspreader" detection (keys touching many distinct values, the
    heavy-DISTINCT-hitter problem of Venkataraman et al. NDSS'05; the
    reference's flow analysis counts weighted packets per flow
    (`/root/reference/src/bin/flows.rs`), this is its distinct-cardinality
    analogue).

    Distributed shape (two shuffles, both pre-combined):

    1. per-batch ``unique(key, value)`` — a combiner that collapses repeat
       pairs before anything moves;
    2. ``groupby([key, value])`` — the pair-dedup exchange; its output
       blocks hold each distinct pair once;
    3. per-block counts per key (one row per key per block);
    4. a tiny ``groupby(key).sum`` folds cross-block key spans.

    Neither shuffle carries more than the distinct-pair set, and the second
    carries ≤ #keys × #blocks rows.
    """
    from ray.data.aggregate import Count

    def uniq_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([key_col, value_col])
        return (
            pl.from_arrow(batch.select([key_col, value_col]))
            .unique()
            .to_arrow()
            .cast(pa.schema([batch.schema.field(key_col),
                             batch.schema.field(value_col)]))
        )

    pairs = ds.map_batches(uniq_pairs, batch_format="pyarrow", zero_copy_batch=True)
    deduped = pairs.groupby([key_col, value_col]).aggregate(Count(alias_name="_n"))

    def per_key(batch: pa.Table) -> pa.Table:
        g = (
            pl.from_arrow(batch.select([key_col]))
            .group_by(key_col)
            .agg(pl.len().cast(pl.Int64).alias(count_name))
        ).to_arrow()
        return pa.table(
            {key_col: g.column(key_col).cast(batch.schema.field(key_col).type),
             count_name: g.column(count_name).cast(pa.int64())}
        )

    partial = deduped.map_batches(per_key, batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby(key_col).aggregate(Sum(count_name, alias_name=count_name))


def distinct_count_topk(
    ds, key_col: str, value_col: str, k: int, count_name: str = "distinct_values"
):
    """Top-``k`` keys by exact distinct-value count; ties key-ascending
    (same tie rule as ``exact_topk`` / SQL ``ORDER BY n DESC, key ASC``)."""
    counts = distinct_counts(ds, key_col, value_col, count_name)
    return counts.sort([count_name, key_col], descending=[True, False]).limit(k)


def pivot_counts(ds, row_col: str, col_col: str, values: list[str]):
    """Crosstab: one row per ``row_col`` value, one ``n_<v>`` int64 count
    column per pivot value (SQL ``COUNT(*) FILTER (WHERE col = v)``).

    Distributed shape: the WIDE layout is built per batch (a polars
    group_by over the batch — one partial row per (batch, row-key)), so the
    shuffle carries partial crosstabs, never raw rows, and the pivot value
    set fixes the schema up front (no data-dependent schema discovery —
    the thing that makes naive pivots unshardable)."""
    if not values:
        raise ValueError("pivot_counts: values must be a non-empty list")
    out_names = [f"n_{v}" for v in values]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {row_col: batch.column(row_col),
                 **{o: pa.array([], type=pa.int64()) for o in out_names}}
            )
        df = pl.from_arrow(batch.select([row_col, col_col]))
        g = df.group_by(row_col).agg(
            [
                (pl.col(col_col) == v).sum().cast(pl.Int64).alias(o)
                for v, o in zip(values, out_names)
            ]
        )
        t = g.to_arrow()
        return pa.table(
            {row_col: t.column(row_col).cast(batch.schema.field(row_col).type),
             **{o: t.column(o).cast(pa.int64()) for o in out_names}}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby(row_col).aggregate(
        *[Sum(o, alias_name=o) for o in out_names]
    )


def rollup2_sums(ds, col_a: str, col_b: str, amount_col: str) -> pa.Table:
    """``GROUP BY ROLLUP(a, b)`` over an int64 amount: the finest (a, b)
    level plus per-``a`` subtotals (b NULL) plus the grand total (both
    NULL), with row counts — SQL ROLLUP semantics.

    Distributed shape: ONE pass computes per-batch (a, b) partials, one
    ``groupby`` folds them to the finest level; the coarser levels are
    DERIVED from the finest aggregate (the standard rollup-from-cube
    plan — no second scan of the data).  The finest level is bounded by
    |a|×|b| group cardinality, so the derivation step is
    cardinality-bounded, never data-bounded.

    Returns a pyarrow Table[(a, b, amount, n_rows)] with nullable group
    columns."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {col_a: batch.column(col_a), col_b: batch.column(col_b),
                 amount_col: pa.array([], type=pa.int64()),
                 "n_rows": pa.array([], type=pa.int64())}
            )
        g = (
            pl.from_arrow(batch.select([col_a, col_b, amount_col]))
            .group_by([col_a, col_b])
            .agg(pl.col(amount_col).sum(), pl.len().cast(pl.Int64).alias("n_rows"))
        ).to_arrow()
        return pa.table(
            {col_a: g.column(col_a).cast(batch.schema.field(col_a).type),
             col_b: g.column(col_b).cast(batch.schema.field(col_b).type),
             amount_col: g.column(amount_col).cast(pa.int64()),
             "n_rows": g.column("n_rows").cast(pa.int64())}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    finest_ds = pre.groupby([col_a, col_b]).aggregate(
        Sum(amount_col, alias_name=amount_col), Sum("n_rows", alias_name="n_rows")
    )
    blocks = collect_blocks(finest_ds)
    if not blocks:
        # grand-total-only base case: group columns must keep the INPUT
        # types (an int64/date group column typed string only in the empty
        # case breaks schema-sensitive callers)
        schema = ds.schema()
        ty = {
            name: t
            for name, t in zip(schema.names, schema.types)
        } if schema is not None else {}
        return pa.table(
            {col_a: pa.array([None], type=ty.get(col_a, pa.string())),
             col_b: pa.array([None], type=ty.get(col_b, pa.string())),
             amount_col: pa.array([None], type=pa.int64()),
             "n_rows": pa.array([0], type=pa.int64())}
        )
    finest = pa.concat_tables(blocks).combine_chunks()
    df = pl.from_arrow(finest)
    sub = df.group_by(col_a).agg(
        pl.col(amount_col).sum(), pl.col("n_rows").sum()
    ).with_columns(pl.lit(None, dtype=df.schema[col_b]).alias(col_b))
    tot = df.select(
        pl.lit(None, dtype=df.schema[col_a]).alias(col_a),
        pl.lit(None, dtype=df.schema[col_b]).alias(col_b),
        pl.col(amount_col).sum(),
        pl.col("n_rows").sum(),
    )
    cols = [col_a, col_b, amount_col, "n_rows"]
    out = pl.concat([df.select(cols), sub.select(cols), tot.select(cols)])
    return out.to_arrow().cast(
        pa.schema(
            [(col_a, finest.schema.field(col_a).type),
             (col_b, finest.schema.field(col_b).type),
             (amount_col, pa.int64()), ("n_rows", pa.int64())]
        )
    )


def tfidf_top_terms(ds, n_docs: int, k: int = 50, text_col: str = "text"):
    """Corpus-wide TF-IDF top-``k`` terms over a document table.

    Distributed shape (one shuffle): per-batch the tokenizer
    (``text/tokenize.py``, the reference's S3 alpha-run/64-byte/lowercase
    rule) explodes docs to tokens, then a two-level polars group_by folds
    them to one ``(token, tf, df)`` partial row per batch — ``df`` partials
    are exact because a document is a single row and therefore never spans
    batches.  A ``groupby(token).sum`` merges partials; the score pass is a
    scalar-broadcast map; ``sort + limit`` keeps only k rows.

    Scoring: ``tfidf = tf * ln(n_docs / df)``, published milli-rounded via
    ``floor(x*1000 + 0.5)/1000`` — IEEE-equal to DuckDB ``round(x, 3)``
    (half-away-from-zero; verified bitwise over 2M adversarial values)
    so the SQL oracle hash-matches despite libm/DuckDB ``ln`` differing by
    1 ulp on ~27% of inputs.  Ties order token-ascending.
    """
    from hksketch.text.tokenize import tokenize_column

    empty = pa.table(
        {"token": pa.array([], type=pa.string()),
         "tf": pa.array([], type=pa.int64()),
         "df": pa.array([], type=pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = tokenize_column(batch.column(text_col), with_doc_index=True)
        if t.num_rows == 0:
            return empty
        g = (
            pl.from_arrow(t)
            .group_by(["doc_idx", "token"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
            .group_by("token")
            .agg(
                pl.col("c").sum().alias("tf"),
                pl.len().cast(pl.Int64).alias("df"),
            )
        )
        a = g.to_arrow()
        return pa.table(
            {"token": a.column("token").cast(pa.string()),
             "tf": a.column("tf").cast(pa.int64()),
             "df": a.column("df").cast(pa.int64())}
        )

    stats = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    stats = stats.groupby("token").aggregate(
        Sum("tf", alias_name="tf"), Sum("df", alias_name="df")
    )

    nd = float(n_docs)

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy().astype(np.float64)
        df = batch.column("df").to_numpy().astype(np.float64)
        x = tf * np.log(nd / df)
        tfidf = np.floor(x * 1000.0 + 0.5) / 1000.0
        return batch.append_column("tfidf", pa.array(tfidf, type=pa.float64()))

    out = stats.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(["tfidf", "token"], descending=[True, False]).limit(k)
