"""TPC-H-shaped query parity vs DuckDB at sf0.001.

The driver's correctness gate re-checks these at sf0.01; this suite pins
them at the smallest scale so a regression is caught by `pytest` before
the gate runs.  Comparison mirrors scripts/check_oracle.py (sorted
columns, order-insensitive, rtol 1e-6).
"""

from __future__ import annotations

import glob

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q22_waiting_customers",
    "q3_shipping_priority",
    "q4_order_priority",
    "q16_supplier_part_types",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q20_part_promotion",
    "q21_waiting_suppliers",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = f.rsplit("/", 1)[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_tpch_shape_matches_duckdb(ray_session, oracle_con, name):
    import __ray_entry__ as e

    res = e.queries()[name](SF_DIR)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    mine = _normalize(res)
    ref = _normalize(oracle_con.sql(e.oracle_sql()[name]).df())
    assert list(mine.columns) == list(ref.columns)
    assert len(mine) == len(ref)
    pd.testing.assert_frame_equal(
        mine, ref, check_dtype=False, check_exact=False, rtol=1e-6
    )
