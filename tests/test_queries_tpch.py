"""Subquery-shape TPC-H suite vs DuckDB at sf0.001.

The driver's own gate runs ALL ten `queries_tpch` entries against their
oracles at sf0.01; here we pin the four shapes with the trickiest
semantics (scalar-subquery max, correlated per-group AVG, sole-max
EXISTS, NOT-EXISTS anti join) so a refactor can't silently break them
between driver rounds.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kgraft.queries_tpch import TPCH_ORACLE_SQL, TPCH_QUERIES

SF_DIR = "/root/testdata/sf0.001"

CASES = [
    "q12_priority_class",
    "q15_top_supplier",
    "q17_small_quantity",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("nation", "region", "customer", "supplier", "part", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", CASES)
def test_tpch_query_matches_duckdb(ray_session, name):
    got = _norm(TPCH_QUERIES[name](SF_DIR))
    want = _norm(_oracle(TPCH_ORACLE_SQL[name]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
