"""Group-profile similarity: pairwise cosine between per-group token-count
vectors, computed as sparse dot products without ever materializing a
vector.

The "which sources/domains/languages look alike" question over a corpus
whose vocabulary is far too large for any worker to hold a dense profile:

- exact (group, token, count) triples come from one combiner-pre-aggregated
  ``groupby`` (the shuffle carries per-batch partials, not token rows);
- dot products are token-cogrouped: tokens are hash-folded to shards, each
  shard lexsorts its triples by token hash and emits per-token cross
  products with the SAME vectorized run-extraction + ``triu_indices``
  pair synthesis as the LSH bucket scan (`dedup/minhash.py`) — no Python
  loop over tokens or group pairs;
- per-shard polars partials fold the pair products, one final ``groupby``
  sums them; norms are an ordinary per-group Σc² aggregate.

Partitioning assumption: the pair-product stream is quadratic in the
number of groups SHARING a token (fine for dozens–thousands of groups —
sources, languages, hosts-of-interest; for 10⁶+ groups switch to sign-LSH
over the profile vectors, `sim/knn.py`).  Token hash aliasing merges two
tokens with probability ~n²·2⁻⁶⁴ — the same fingerprint-aliasing trade
the sketch kernels document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup.runs import cap_runs, runs_from_new_mask, triu_gather_indices
from ..hashing import hash_array, splitmix64

U64 = np.uint64
_HASH_SEED = 0x9E37


def profile_counts(ds, group_col: str, text_col: str = "text"):
    """Exact (group, token, c) triples for a document table: tokenize
    (S3 semantics) + per-batch polars combiner + one ``groupby`` fold."""
    import polars as pl

    from ray.data.aggregate import Sum

    from ..text.tokenize import tokenize_column

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {group_col: pa.array([], type=pa.string()),
             "token": pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64())}
        )
        if b.num_rows == 0:
            return empty
        t = tokenize_column(b.column(text_col), with_doc_index=True)
        if t.num_rows == 0:
            return empty
        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        g = (
            pl.DataFrame(
                {group_col: grp[t.column("doc_idx").to_numpy()],
                 "token": pl.from_arrow(t.column("token"))}
            )
            .group_by([group_col, "token"])
            .agg(pl.len().cast(pl.Int64).alias("c"))
        ).to_arrow()
        return pa.table(
            {group_col: g.column(group_col).cast(pa.string()),
             "token": g.column("token").cast(pa.string()),
             "c": g.column("c").cast(pa.int64())}
        )

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return pre.groupby([group_col, "token"]).aggregate(Sum("c", alias_name="c"))


def profile_cosine(triples, group_col: str, shards: int = 64) -> pa.Table:
    """Pairwise cosine between group profiles from EXACT (group, token, c)
    triples.  Returns a pyarrow Table[(``<group>_a``, ``<group>_b``,
    cosine:float64)] for every co-occurring pair (a < b lexicographically),
    cosine milli-rounded half-away-from-zero (DuckDB ``round(x, 3)``
    parity).  Driver holds one row per GROUP PAIR (G² bound) — the
    documented operating envelope."""
    import polars as pl

    from ray.data.aggregate import Sum

    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two, got {shards}")

    ga_col, gb_col = f"{group_col}_a", f"{group_col}_b"

    def shard(b: pa.Table) -> pa.Table:
        th = hash_array(b.column("token"), seed=_HASH_SEED, fn="auto")
        return pa.table(
            {"th": pa.array(th, type=pa.uint64()),
             "shard": pa.array(
                 (splitmix64(th) & U64(shards - 1)).astype(np.int32)),
             group_col: b.column(group_col),
             "c": b.column("c")}
        )

    sharded = triples.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)

    pair_schema = pa.schema(
        [(ga_col, pa.string()), (gb_col, pa.string()), ("dot", pa.int64())]
    )

    def cross(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pair_schema.empty_table()
        th = g.column("th").to_numpy(zero_copy_only=False)
        grp = g.column(group_col).to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False)
        # group codes → int gather targets; lexsort (token, group code)
        # makes within-token runs sorted-unique by group (triples are
        # exact, so (group, token) appears once)
        uniq_g, codes = np.unique(grp, return_inverse=True)
        order = np.lexsort((codes, th))
        th, codes, c = th[order], codes[order], c[order]
        # shared token-run → triu pair kernel (dedup/runs.py); no cap —
        # run length is bounded by the group count, not the corpus
        starts, sizes = runs_from_new_mask(
            np.concatenate(([True], th[1:] != th[:-1]))
        )
        use_starts, use_sizes, _, _ = cap_runs(starts, sizes, None)
        ia, ib = triu_gather_indices(use_starts, use_sizes)
        if len(ia) == 0:
            return pair_schema.empty_table()
        a = codes[ia]
        bb = codes[ib]
        d = c[ia] * c[ib]
        folded = (
            pl.DataFrame({"a": a, "b": bb, "d": d})
            .group_by(["a", "b"])
            .agg(pl.col("d").sum())
        )
        return pa.table(
            {ga_col: pa.array(uniq_g[folded["a"].to_numpy()], type=pa.string()),
             gb_col: pa.array(uniq_g[folded["b"].to_numpy()], type=pa.string()),
             "dot": pa.array(folded["d"].to_numpy(), type=pa.int64())}
        )

    dots = (
        sharded.groupby("shard")
        .map_groups(cross, batch_format="pyarrow")
        .groupby([ga_col, gb_col])
        .aggregate(Sum("dot", alias_name="dot"))
    )

    def norm_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {group_col: pa.array([], type=pa.string()),
                 "n2": pa.array([], type=pa.int64())}
            )
        c = b.column("c").to_numpy(zero_copy_only=False)
        g = (
            pl.DataFrame(
                {group_col: b.column(group_col).to_numpy(zero_copy_only=False),
                 "n2": c * c}
            )
            .group_by(group_col)
            .agg(pl.col("n2").sum())
        ).to_arrow()
        return pa.table(
            {group_col: g.column(group_col).cast(pa.string()),
             "n2": g.column("n2").cast(pa.int64())}
        )

    norms_ds = (
        triples.map_batches(norm_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .aggregate(Sum("n2", alias_name="n2"))
    )

    from ..pipelines.ops import collect_blocks

    empty = pa.table(
        {ga_col: pa.array([], type=pa.string()),
         gb_col: pa.array([], type=pa.string()),
         "cosine": pa.array([], type=pa.float64())}
    )
    dot_blocks = collect_blocks(dots)
    if not dot_blocks:
        return empty
    dot_t = pa.concat_tables(dot_blocks).combine_chunks()
    norm_t = pa.concat_tables(collect_blocks(norms_ds)).combine_chunks()
    n2 = dict(
        zip(norm_t.column(group_col).to_pylist(), norm_t.column("n2").to_pylist())
    )
    a = dot_t.column(ga_col).to_pylist()
    b = dot_t.column(gb_col).to_pylist()
    d = dot_t.column("dot").to_numpy().astype(np.float64)
    denom = np.sqrt(
        np.array([n2[x] for x in a], dtype=np.float64)
        * np.array([n2[x] for x in b], dtype=np.float64)
    )
    cos = np.floor(d / denom * 1000.0 + 0.5) / 1000.0  # == round(x, 3), x ≥ 0
    order = np.lexsort((np.asarray(b, dtype=object), np.asarray(a, dtype=object)))
    return pa.table(
        {ga_col: pa.array(np.asarray(a, dtype=object)[order], type=pa.string()),
         gb_col: pa.array(np.asarray(b, dtype=object)[order], type=pa.string()),
         "cosine": pa.array(cos[order], type=pa.float64())}
    )
