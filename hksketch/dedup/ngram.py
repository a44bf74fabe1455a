"""Exact word n-gram (shingle) Jaccard dedup.

Two surfaces:

* tiny per-pair helpers (``shingle_set`` / ``jaccard`` / ``ngram_jaccard``)
  used by the MinHash verifier and as a brute-force oracle in tests;
* :func:`ngram_jaccard_near_dupes` — the DISTRIBUTED exact variant: an
  inverted-index self-join on word n-grams expressed as two bounded
  sharded run-scans (the same scale shape as
  ``dedup.minhash.lsh_candidate_pairs``), returning every document pair
  whose exact shingle-set Jaccard clears a threshold.  Unlike MinHash/
  SimHash this is not an approximation, so it carries a hash-exact SQL
  oracle (`__ray_entry__.oracle_sql()['ngram_jaccard_near_dupes']`).

Reference parity: the reference verifies its sketch output against exact
recomputation (``src/accuracy.rs`` ground-truth pass); this module plays
the same role for the dedup family, as a first-class distributed operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..text.tokenize import tokenize_text
from .runs import (
    append_drop_sentinels,
    cap_runs,
    runs_from_new_mask,
    triu_gather_indices,
)

U64 = np.uint64
_MIX = U64(0x9E3779B97F4A7C15)


def shingle_set(text: str, n: int = 3) -> frozenset:
    toks = tokenize_text(text)
    if len(toks) < n:
        return frozenset()
    return frozenset(tuple(toks[i : i + n]) for i in range(len(toks) - n + 1))


def jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    return jaccard(shingle_set(text_a, n), shingle_set(text_b, n))


_EMPTY_PAIRS = pa.table(
    {
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "c": pa.array([], type=pa.int64()),
        "na": pa.array([], type=pa.int64()),
        "nb": pa.array([], type=pa.int64()),
    }
)

def _empty_out(score_col: str = "jaccard") -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            score_col: pa.array([], type=pa.float64()),
        }
    )


_EMPTY_OUT = _empty_out()


def ngram_jaccard_near_dupes(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    shards: int | str = "auto",
    max_bucket_size: int = 4096,
    metric: str = "jaccard",
) -> pa.Table:
    """All document pairs with exact word-``n``-gram similarity ≥ ``threshold``.

    ``metric`` picks the score: ``"jaccard"`` = |A∩B| / |A∪B| (symmetric
    near-duplication) or ``"containment"`` = |A∩B| / min(|A|, |B|)
    (one-sided: a short document quoted inside a long one scores 1.0 even
    though its Jaccard is tiny — the Broder '97 resemblance/containment
    split, the right notion for quote/excerpt detection in a training
    corpus).  Everything below the final score expression is shared.

    Scale shape (100-TB honest): this is an inverted-index self-join — the
    only exact formulation — so the candidate set is every pair sharing at
    least one shingle.  Three bounds keep it tractable:

    1. shingle rows shuffle ONCE, hash-sharded on the shingle (never a
       groupby over millions of size-1 shingle groups);
    2. a shingle occurring in more than ``max_bucket_size`` documents (a
       boilerplate phrase) is dropped from pair emission with a logged,
       surfaced count — identical policy to ``lsh_candidate_pairs``; at
       web scale you LOWER this cap and accept recall loss, or switch to
       the MinHash operator (the approximate member of this family);
    3. pair partial counts pre-aggregate inside each shard before the
       second (pair-keyed) shuffle, so the exchange carries one row per
       (pair, shard), not one per shared shingle.

    Shingle strings travel with their 64-bit hash and bucket boundaries
    compare BOTH, so a hash collision cannot merge two buckets — the
    result is exact, which is what lets the SQL oracle hash-match it.
    Documents with fewer than ``n`` tokens have no shingles and never
    pair (the SQL mirror drops them the same way).

    Returns a driver-side table of (id_a, id_b, jaccard) sorted by ids —
    bounded by the threshold filter, never the candidate count — with
    ``ngram_dropped_buckets`` / ``ngram_dropped_pairs`` totals in the
    schema metadata.
    """
    import pandas as pd
    import polars as pl

    from ..ray_glue.partitioning import auto_shards, estimate_rows

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"metric must be 'jaccard' or 'containment', got {metric!r}")
    score_col = metric
    from ..text.tokenize import tokenize_column

    if shards == "auto":
        est = estimate_rows(ds)
        # one shingle row per token (minus n-1 per doc): estimate from the
        # SOURCE row count with a conservative tokens-per-doc multiplier;
        # mapped datasets report no row count on this Ray version.
        # floor 64 (not the old 256): enough parallelism for a 32-cpu
        # node, and the count still grows with the data via the 2M-row
        # target — fixed high floors pay pure shuffle overhead at small
        # scale (see dedup/minhash.py measurement)
        shards = auto_shards(
            ds,
            target_rows_per_shard=2_000_000,
            min_shards=64,
            rows_hint=None if est is None else est * 64,
        )
    shards = int(shards)
    if shards & (shards - 1):
        raise ValueError(f"shards must be a power of two (got {shards})")

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        toks_t = tokenize_column(
            batch.column(text_col).combine_chunks(), with_doc_index=True
        )
        toks = toks_t.column("token").to_numpy(zero_copy_only=False)
        didx = toks_t.column("doc_idx").to_numpy(zero_copy_only=False)
        if len(toks) >= n:
            # shingle starts: token windows that stay inside one document
            valid = didx[: len(didx) - n + 1] == didx[n - 1 :]
            idx = np.flatnonzero(valid)
        else:
            idx = np.empty(0, dtype=np.int64)
        if len(idx) == 0:
            return pa.table(
                {
                    "shard": pa.array([], type=pa.int32()),
                    "key": pa.array([], type=pa.uint64()),
                    "g": pa.array([], type=pa.large_string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "nd": pa.array([], type=pa.int64()),
                }
            )
        g = toks[idx]
        for j in range(1, n):
            g = g + " "
            g = g + toks[idx + j]
        # per-document distinct shingles + per-doc set size, one polars pass
        df = (
            pl.DataFrame(
                {"d": didx[idx], "g": pl.Series(g, dtype=pl.String)}
            )
            .unique()
            .with_columns(pl.len().over("d").cast(pl.Int64).alias("nd"))
        )
        key = df["g"].hash(seed=1).to_numpy().astype(np.uint64)
        d = df["d"].to_numpy()
        return pa.table(
            {
                "shard": pa.array((key & U64(shards - 1)).astype(np.int32)),
                "key": pa.array(key, type=pa.uint64()),
                "g": pa.array(df["g"].to_arrow().cast(pa.large_string())),
                "doc_id": pa.array(ids[d], type=pa.int64()),
                "nd": pa.array(df["nd"].to_numpy(), type=pa.int64()),
            }
        )

    rows = ds.map_batches(shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(grp: "pd.DataFrame") -> pa.Table:
        grp = grp.sort_values(["key", "g", "doc_id"], kind="stable")
        k = grp["key"].to_numpy()
        gg = grp["g"].to_numpy()
        d = grp["doc_id"].to_numpy()
        nd = grp["nd"].to_numpy()
        if len(k) == 0:
            return _EMPTY_PAIRS
        # bucket boundary = hash OR string change (collision-proof);
        # shared bucket-run → triu pair kernel (dedup/runs.py)
        starts, sizes = runs_from_new_mask(
            np.concatenate(([True], (k[1:] != k[:-1]) | (gg[1:] != gg[:-1])))
        )
        use_starts, use_sizes, dropped_buckets, dropped_pairs = cap_runs(
            starts, sizes, max_bucket_size
        )
        if dropped_buckets:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard_near_dupes: dropping %d shingle bucket(s) "
                "larger than max_bucket_size=%d (%d pair "
                "contributions skipped) — intersection counts for the "
                "affected pairs are now LOWER bounds",
                dropped_buckets, max_bucket_size, dropped_pairs,
            )
        ia, ib = triu_gather_indices(use_starts, use_sizes)
        if len(ia) == 0:
            if not dropped_buckets:
                return _EMPTY_PAIRS
            a = np.empty(0, np.int64)
            b = c = na = nb = a
        else:
            a = d[ia]
            b = d[ib]
            na = nd[ia]
            nb = nd[ib]
            # pre-aggregate within the shard: one row per pair
            order = np.lexsort((b, a))
            a, b, na, nb = a[order], b[order], na[order], nb[order]
            newp = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
            )
            pstart = np.flatnonzero(newp)
            c = np.diff(np.concatenate((pstart, [len(a)])))
            a, b, na, nb = a[pstart], b[pstart], na[pstart], nb[pstart]
        t = pa.table(
            {
                "a": pa.array(a, type=pa.int64()),
                "b": pa.array(b, type=pa.int64()),
                "c": pa.array(c, type=pa.int64()),
                "na": pa.array(na, type=pa.int64()),
                "nb": pa.array(nb, type=pa.int64()),
            }
        )
        if dropped_buckets:
            # sentinel rows (a=-1 → pairs, a=-2 → buckets): aggregated and
            # stripped into schema metadata at the driver, same contract as
            # lsh_candidate_pairs
            t = append_drop_sentinels(t, "c", dropped_pairs, dropped_buckets)
        return t

    pair_partials = rows.groupby("shard").map_groups(
        bucket_pairs, batch_format="pandas"
    )

    PAIR_SHARDS = 256

    def shard_pairs(batch: pa.Table) -> pa.Table:
        from ..hashing import splitmix64

        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        key = splitmix64(
            a.astype(np.int64).view(np.uint64) * _MIX
            ^ b.astype(np.int64).view(np.uint64)
        )
        # sentinel rows (a<0) all land in shard 0 so exactly one reducer
        # folds them
        shard2 = np.where(
            a < 0, 0, (key & U64(PAIR_SHARDS - 1)).astype(np.int64)
        ).astype(np.int32)
        return batch.append_column("shard2", pa.array(shard2, type=pa.int32()))

    sharded_pairs = pair_partials.map_batches(
        shard_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    def reduce_pairs(grp: "pd.DataFrame") -> pa.Table:
        a = grp["a"].to_numpy()
        sent = a < 0
        drop_pairs = int(grp.loc[grp["a"] == -1, "c"].sum())
        drop_buckets = int(grp.loc[grp["a"] == -2, "c"].sum())
        grp = grp[~sent]
        a = grp["a"].to_numpy()
        b = grp["b"].to_numpy()
        c = grp["c"].to_numpy()
        na = grp["na"].to_numpy()
        nb = grp["nb"].to_numpy()
        out = _empty_out(score_col)
        if len(a):
            order = np.lexsort((b, a))
            a, b, c, na, nb = a[order], b[order], c[order], na[order], nb[order]
            newp = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            pstart = np.flatnonzero(newp)
            # segments are non-empty by construction (pstart indexes rows)
            csum = np.add.reduceat(c, pstart)
            a, b, na, nb = a[pstart], b[pstart], na[pstart], nb[pstart]
            if metric == "jaccard":
                jac = csum / (na + nb - csum)
            else:
                jac = csum / np.minimum(na, nb)
            keep = jac >= threshold
            if keep.any():
                out = pa.table(
                    {
                        "id_a": pa.array(a[keep], type=pa.int64()),
                        "id_b": pa.array(b[keep], type=pa.int64()),
                        score_col: pa.array(jac[keep], type=pa.float64()),
                    }
                )
        if drop_pairs or drop_buckets:
            out = pa.concat_tables(
                [out,
                 pa.table({"id_a": pa.array([-1, -2], type=pa.int64()),
                           "id_b": pa.array([0, 0], type=pa.int64()),
                           score_col: pa.array(
                               [float(drop_pairs), float(drop_buckets)],
                               type=pa.float64())})]
            )
        return out

    got = (
        sharded_pairs.groupby("shard2")
        .map_groups(reduce_pairs, batch_format="pandas")
        .to_pandas()
    )
    meta = {b"ngram_dropped_buckets": b"0", b"ngram_dropped_pairs": b"0"}
    if len(got) == 0 or "id_a" not in got.columns:
        return _empty_out(score_col).replace_schema_metadata(meta)
    sent = got["id_a"] < 0
    n_drop_pairs = int(got.loc[got["id_a"] == -1, score_col].sum())
    n_drop_buckets = int(got.loc[got["id_a"] == -2, score_col].sum())
    if n_drop_pairs or n_drop_buckets:
        import logging

        meta = {b"ngram_dropped_buckets": str(n_drop_buckets).encode(),
                b"ngram_dropped_pairs": str(n_drop_pairs).encode()}
        logging.getLogger(__name__).warning(
            "ngram_jaccard_near_dupes: %d pair contribution(s) dropped "
            "across %d oversized shingle bucket(s) (max_bucket_size=%d)",
            n_drop_pairs, n_drop_buckets, max_bucket_size,
        )
        got = got[~sent]
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(got, preserve_index=False).replace_schema_metadata(
        meta
    )
