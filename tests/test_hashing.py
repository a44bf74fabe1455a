"""Hashing determinism + structure (SURVEY.md §1.2)."""

import numpy as np
import pyarrow as pa

from hksketch.hashing import (
    bucket_indices,
    derive_row_hashes,
    hash_array,
    hash_scalar,
    rotl64,
    splitmix64,
)


def test_deterministic_across_calls():
    a = hash_array(["x", "y", "z"], 42)
    b = hash_array(["x", "y", "z"], 42)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, hash_array(["x", "y", "z"], 43))


def test_str_bytes_agree():
    assert hash_scalar("hello", 7) == hash_scalar(b"hello", 7)


def test_arrow_inputs():
    arr = pa.array(["a", "b"])
    ch = pa.chunked_array([["a"], ["b"]])
    assert np.array_equal(hash_array(arr, 1), hash_array(ch, 1))


def test_derive_row_hashes_structure():
    # row 0 is the fingerprint itself; rows derived via rotl(h1+h2, 5)
    h1 = hash_array(["k"], 5)
    rows = derive_row_hashes(h1, 4)
    assert rows.shape == (4, 1)
    assert rows[0, 0] == h1[0]
    h2 = (h1 >> np.uint64(32)) * np.uint64(0x517CC1B727220A95)
    expect = rotl64(h1 + h2)
    assert rows[1, 0] == expect[0]
    assert len(np.unique(rows[:, 0])) == 4  # rows differ


def test_bucket_indices_pow2_mask_equals_mod():
    h = np.arange(1000, dtype=np.uint64) * np.uint64(2654435761)
    assert np.array_equal(bucket_indices(h, 256), (h % np.uint64(256)).astype(np.int64))
    idx = bucket_indices(h, 100)  # non-pow2 → mod
    assert idx.max() < 100 and idx.min() >= 0


def test_splitmix64_known_vector():
    # SplitMix64 with state 0 produces 0xE220A8397B1DCDAF as first output
    assert splitmix64(np.array([0], dtype=np.uint64))[0] == np.uint64(
        0xE220A8397B1DCDAF
    )
