"""Robustness audit: run EVERY queries() entry against a minimal
single-row version of all ten tables (plus 3 contract-conforming
embeddings).  Degenerate states — single-type event streams, single
observed days, dup-free corpora, empty filtered sides, empty blocks from
repartition — are all reachable states of a real partition at 100-TB
scale; a query that crashes on them is a query that kills a job.

Usage: python scripts/degenerate_sweep.py   (exit 1 on any failure)
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_tiny(d: str) -> None:
    import datetime

    ts = pa.array([np.datetime64("2024-01-01T10:00:00", "us")])
    date = pa.array([datetime.date(2024, 1, 1)], type=pa.date32())
    rng = np.random.default_rng(0)

    def w(name, tbl):
        pq.write_table(tbl, f"{d}/{name}.parquet")

    w("region", pa.table({"r_regionkey": pa.array([0], pa.int64()),
                          "r_name": pa.array(["AFRICA"]),
                          "r_comment": pa.array(["x"])}))
    w("nation", pa.table({"n_nationkey": pa.array([0], pa.int64()),
                          "n_name": pa.array(["ALGERIA"]),
                          "n_regionkey": pa.array([0], pa.int64()),
                          "n_comment": pa.array(["x"])}))
    w("customer", pa.table({"c_custkey": pa.array([1], pa.int64()),
                            "c_name": pa.array(["a"]), "c_address": pa.array(["x"]),
                            "c_nationkey": pa.array([0], pa.int64()),
                            "c_phone": pa.array(["1"]), "c_acctbal": pa.array([1.0]),
                            "c_mktsegment": pa.array(["BUILDING"]),
                            "c_comment": pa.array(["x"])}))
    w("supplier", pa.table({"s_suppkey": pa.array([1], pa.int64()),
                            "s_name": pa.array(["s"]), "s_address": pa.array(["x"]),
                            "s_nationkey": pa.array([0], pa.int64()),
                            "s_phone": pa.array(["1"]), "s_acctbal": pa.array([1.0]),
                            "s_comment": pa.array(["x"])}))
    w("part", pa.table({"p_partkey": pa.array([1], pa.int64()),
                        "p_name": pa.array(["p"]), "p_mfgr": pa.array(["m"]),
                        "p_brand": pa.array(["b"]), "p_type": pa.array(["t"]),
                        "p_size": pa.array([1], pa.int64()),
                        "p_container": pa.array(["c"]),
                        "p_retailprice": pa.array([1.0]),
                        "p_comment": pa.array(["x"])}))
    w("orders", pa.table({"o_orderkey": pa.array([1], pa.int64()),
                          "o_custkey": pa.array([1], pa.int64()),
                          "o_orderstatus": pa.array(["F"]),
                          "o_totalprice": pa.array([10.0]),
                          "o_orderdate": date,
                          "o_orderpriority": pa.array(["1-URGENT"]),
                          "o_clerk": pa.array(["c"]),
                          "o_shippriority": pa.array([0], pa.int64()),
                          "o_comment": pa.array(["x"])}))
    w("lineitem", pa.table({"l_orderkey": pa.array([1], pa.int64()),
                            "l_partkey": pa.array([1], pa.int64()),
                            "l_suppkey": pa.array([1], pa.int64()),
                            "l_linenumber": pa.array([1], pa.int64()),
                            "l_quantity": pa.array([1.0]),
                            "l_extendedprice": pa.array([10.0]),
                            "l_discount": pa.array([0.0]),
                            "l_tax": pa.array([0.0]),
                            "l_returnflag": pa.array(["N"]),
                            "l_linestatus": pa.array(["O"]),
                            "l_shipdate": date, "l_commitdate": date,
                            "l_receiptdate": date,
                            "l_shipinstruct": pa.array(["x"]),
                            "l_shipmode": pa.array(["MAIL"]),
                            "l_comment": pa.array(["x"])}))
    w("events", pa.table({"event_id": pa.array([1], pa.int64()), "ts": ts,
                          "user_id": pa.array([7], pa.int64()),
                          "event_type": pa.array(["click"]),
                          "value": pa.array([1.5]),
                          "props": pa.array(["{}"])}))
    w("documents", pa.table({"doc_id": pa.array([1], pa.int64()),
                             "text": pa.array(["hello world text here"]),
                             "lang": pa.array(["en"]),
                             "source": pa.array(["src0"]),
                             "n_chars": pa.array([21], pa.int64())}))
    # embeddings honor the table contract: 64-dim vectors, query ids 0..2
    emb = [rng.random(64).astype(np.float32).tolist() for _ in range(3)]
    w("embeddings", pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                              "embedding": pa.array(emb, pa.list_(pa.float32())),
                              "label": pa.array([0, 1, 2], pa.int32())}))


def main() -> int:
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    fails = []
    with tempfile.TemporaryDirectory() as d:
        write_tiny(d)
        q = e.queries()
        for name in sorted(q):
            try:
                out = q[name](d)
                if not isinstance(out, (pa.Table, pd.DataFrame)):
                    out = out.to_pandas()
                print(f"OK   {name}")
            except Exception as ex:  # noqa: BLE001 — audit reports all
                fails.append(name)
                print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:140]}")
    print("fails:", fails)
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
