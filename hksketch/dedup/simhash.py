"""SimHash near-duplicate detection (Charikar 2002; Manku et al. WWW'07
Hamming-distance blocking).

64-bit SimHash per document from token hashes (vectorized bit-vote
accumulation); candidate pairs found by the pigeonhole block trick: split
the 64 bits into ``hd + 1`` blocks — any pair within Hamming distance
``hd`` shares at least one exact block, so a groupby on (block_id,
block_value) surfaces every candidate without an all-pairs scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_array
from ..text.tokenize import tokenize_column

U64 = np.uint64


class SimHasher:
    def __init__(self, seed: int = 1):
        self.seed = int(seed)

    def signatures(
        self,
        texts: pa.Array | None = None,
        *,
        token_hashes: np.ndarray | None = None,
        doc_idx: np.ndarray | None = None,
        n_docs: int | None = None,
    ) -> np.ndarray:
        """(n_docs,) uint64 simhash: sign of per-bit weighted votes.
        Accepts precomputed token hashes (per-use stream derived) to share
        one tokenize+hash pass across operators."""
        from ..hashing import splitmix64

        if token_hashes is not None:
            h = splitmix64(
                token_hashes ^ splitmix64(np.array([self.seed], dtype=np.uint64))
            )
            didx = doc_idx
            n_docs = int(n_docs)
        else:
            toks = tokenize_column(texts, with_doc_index=True)
            h = hash_array(toks.column("token"), self.seed)
            didx = toks.column("doc_idx").to_numpy()
            n_docs = len(texts)
        sig = np.zeros(n_docs, dtype=np.uint64)
        if len(h):
            # didx nondecreasing → per-doc ±1 bit votes via segment sums,
            # TILED so all 64 bit passes run over L2-resident slices (the
            # untiled form streams the token-hash array from DRAM 64×,
            # which throttles the fused web-pass at high concurrency);
            # per-tile partial vote counts are additive, so tiling is exact
            ones_acc = np.zeros((n_docs, 64), dtype=np.int32)
            totals = np.zeros(n_docs, dtype=np.int64)
            tile = 1 << 16
            for s in range(0, len(h), tile):
                e = min(s + tile, len(h))
                sub, sdid = h[s:e], didx[s:e]
                docs_w = np.unique(sdid)
                starts = np.searchsorted(sdid, docs_w)
                totals[docs_w] += np.add.reduceat(
                    np.ones(len(sub), dtype=np.int64), starts
                )
                for b in range(64):
                    ones_acc[docs_w, b] += np.add.reduceat(
                        ((sub >> U64(b)) & U64(1)).astype(np.int32), starts
                    )
            wins = (2 * ones_acc) > totals[:, None]
            sig = (
                wins.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
        return sig


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # vectorized popcount via byte-view + lookup table
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash_near_dupes(
    ds, text_col: str, id_col: str, max_hamming: int = 3, seed: int = 1
) -> pa.Table:
    """Dataset → pa.Table(a, b, hamming) pairs with distance ≤ max_hamming."""
    sh = SimHasher(seed=seed)

    def sig_stage(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pa.array(
                batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64),
                type=pa.int64()),
             "sig": pa.array(
                 sh.signatures(batch.column(text_col).combine_chunks()),
                 type=pa.uint64())}
        )

    sigs = ds.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)
    return hamming_near_dupes(sigs, max_hamming=max_hamming)


def hamming_near_dupes(
    sig_ds, id_col: str = "doc_id", sig_col: str = "sig", max_hamming: int = 3
) -> pa.Table:
    """Generic pigeonhole near-dup over ANY 64-bit signature Dataset
    (text SimHash, image aHash, …): split the 64 bits into
    ``max_hamming + 1`` blocks — any pair within the Hamming budget shares
    at least one exact block — and surface candidates through the sharded
    run-scan, verifying distance with a vectorized popcount."""
    nblocks = max_hamming + 1
    shift = 64 // nblocks

    def stage(batch: pa.Table) -> pa.Table:
        sig = batch.column(sig_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        out_block, out_val, out_id, out_sig = [], [], [], []
        for b in range(nblocks):
            lo = b * shift
            hi = 64 if b == nblocks - 1 else (b + 1) * shift
            mask = (U64(1) << U64(hi - lo)) - U64(1)
            val = (sig >> U64(lo)) & mask
            out_block.append(np.full(len(sig), b, dtype=np.int32))
            out_val.append(val)
            out_id.append(ids)
            out_sig.append(sig)
        return pa.table(
            {
                "block_id": pa.array(np.concatenate(out_block), type=pa.int32()),
                "block_val": pa.array(np.concatenate(out_val), type=pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "sig": pa.array(np.concatenate(out_sig), type=pa.uint64()),
            }
        )

    rows = sig_ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    # fold (block_id, block_val) to one uint64 bucket key and shard it —
    # same scale shape as dedup.minhash.lsh_candidate_pairs (a raw groupby
    # would create one tiny group per distinct bucket)
    from ..hashing import splitmix64

    SHARDS = 256

    def shard(b: pa.Table) -> pa.Table:
        bkey = splitmix64(
            b.column("block_val").to_numpy(zero_copy_only=False)
            ^ (b.column("block_id").to_numpy(zero_copy_only=False).astype(np.uint64)
               * U64(0x9E3779B97F4A7C15))
        )
        return pa.table(
            {
                "bkey": pa.array(bkey, type=pa.uint64()),
                "shard": pa.array((bkey & U64(SHARDS - 1)).astype(np.int32)),
                "doc_id": b.column("doc_id"),
                "sig": b.column("sig"),
            }
        )

    sharded = rows.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(g):
        import pandas as pd

        k = g["bkey"].to_numpy()
        d = g["doc_id"].to_numpy()
        s = g["sig"].to_numpy()
        order = np.lexsort((d, k))
        k, d, s = k[order], d[order], s[order]
        dup = np.flatnonzero(k[1:] == k[:-1])
        if len(dup) == 0:
            return pa.table(
                {"a": pa.array([], type=pa.int64()),
                 "b": pa.array([], type=pa.int64()),
                 "hamming": pa.array([], type=pa.int64())}
            )
        runs, run_start, prev = [], dup[0], dup[0]
        for i in dup[1:]:
            if i != prev + 1:
                runs.append((run_start, prev + 2))
                run_start = i
            prev = i
        runs.append((run_start, prev + 2))
        out = []
        for st, e in runs:
            recs = sorted(set(zip(d[st:e].tolist(), s[st:e].tolist())))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    dist = int(
                        hamming64(
                            np.array([recs[i][1]], dtype=np.uint64),
                            np.array([recs[j][1]], dtype=np.uint64),
                        )[0]
                    )
                    if dist <= max_hamming:
                        out.append((recs[i][0], recs[j][0], dist))
        df = pd.DataFrame(out, columns=["a", "b", "hamming"])
        return pa.Table.from_pandas(df.astype("int64"), preserve_index=False)

    pairs = (
        sharded.groupby("shard")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
             "hamming": pa.array([], type=pa.int64())}
        )
    pairs = pairs.drop_duplicates(subset=["a", "b"]).astype(
        {"a": "int64", "b": "int64", "hamming": "int64"}
    )
    return pa.Table.from_pandas(
        pairs.sort_values(["a", "b"]).reset_index(drop=True), preserve_index=False
    )
