"""Fixed-width binary flow-record source + formatter.

Mirrors the reference's trace reader/formatter
(`/root/reference/examples/ip_files.rs:53-105`): 13-byte records laid out
src_ip(4) + src_port(2) + dst_ip(4) + dst_port(2) + protocol(1), read from
``.dat`` files, rendered as ``"proto src:port -> dst:port"``.

Ray Data shape: ``read_binary_files`` (one file per block) → a vectorized
``map_batches`` slicer producing a ``binary`` key column — no Python loop
over records.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

KEY_SIZE = 13  # examples/ip_files.rs:6


def _slice_records(batch: pa.Table) -> pa.Table:
    out = []
    for blob in batch.column("bytes").to_pylist():
        n = len(blob) // KEY_SIZE
        a = np.frombuffer(blob[: n * KEY_SIZE], dtype=np.uint8).reshape(n, KEY_SIZE)
        # vectorized fixed-width binary column from the raw buffer
        flat = pa.py_buffer(a.tobytes())
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(KEY_SIZE), n, [None, flat]
        )
        out.append(pa.table({"flow": arr.cast(pa.binary())}))
    if not out:
        return pa.table({"flow": pa.array([], type=pa.binary())})
    return pa.concat_tables(out)


def read_flow_records(paths) -> "rd.Dataset":
    """Directory/file(s) of fixed-width 13-byte records → Dataset[flow:binary]."""
    raw = rd.read_binary_files(paths)
    return raw.map_batches(_slice_records, batch_format="pyarrow")


def format_flow_keys(flows: pa.Array | pa.ChunkedArray) -> pa.Array:
    """13-byte keys → ``"proto src_ip:port -> dst_ip:port"`` strings
    (semantics of examples/ip_files.rs:95-105), vectorized."""
    if isinstance(flows, pa.ChunkedArray):
        flows = flows.combine_chunks()
    blobs = flows.to_pylist()
    if not blobs:
        return pa.array([], type=pa.string())
    a = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(len(blobs), KEY_SIZE)
    s_port = (a[:, 4].astype(np.uint32) << 8) | a[:, 5]
    d_port = (a[:, 10].astype(np.uint32) << 8) | a[:, 11]
    proto = a[:, 12]
    out = [
        f"{int(proto[i])} "
        f"{a[i,0]}.{a[i,1]}.{a[i,2]}.{a[i,3]}:{int(s_port[i])} -> "
        f"{a[i,6]}.{a[i,7]}.{a[i,8]}.{a[i,9]}:{int(d_port[i])}"
        for i in range(len(blobs))
    ]
    return pa.array(out, type=pa.string())
