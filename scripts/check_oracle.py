"""Local replica of the driver's correctness gate: run every queries() entry
and compare to oracle_sql() via DuckDB (row-count + schema + order-insensitive
value comparison) at a given sf dir.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



# Ray logs a benign "Failed to hash the schemas" warning when deduplicating
# schemas of blob-carrying blocks; silence that one logger.
import logging

logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(
    logging.ERROR
)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    from hksketch.pipelines.ops import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(mine)}, {wall:.2f}s)")
            continue
        ref = normalize(con.sql(oracles[name]).df())
        status = "ok"
        if list(mine.columns) != list(ref.columns):
            status = f"COLUMNS {list(mine.columns)} vs {list(ref.columns)}"
        elif len(mine) != len(ref):
            status = f"ROWS {len(mine)} vs {len(ref)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    mine, ref, check_dtype=False, check_exact=False, rtol=1e-6
                )
            except AssertionError as ex:
                status = "VALUES " + str(ex).split("\n")[0]
        flag = "PASS" if status == "ok" else "FAIL"
        if flag == "FAIL":
            failures.append(name)
        print(f"{flag} {name}: {status} (rows={len(mine)}, {wall:.2f}s)")
    ray.shutdown()
    print("failures:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
