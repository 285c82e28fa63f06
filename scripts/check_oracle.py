"""Local twin of the driver's correctness gate: run each QUERIES entry
and its ORACLE_SQL side-by-side (DuckDB) at a given sf dir and compare
row-count + schema + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # see bench.py

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver: sort columns by name, 6-dp float normalization
    # applied identically to BOTH sides, then EXACT compare (the r3
    # allclose(atol=1e-4) masked the assoc_rules_parts rounding bug).
    from kgraft.sqlround import sql_round

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = sql_round(df[c].astype("float64"), 6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def oracle_connection(sf_dir: str):
    """DuckDB connection with the driver's 10 table views registered."""
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare_one(name: str, sf_dir: str, con, queries=None, oracle_sql=None):
    """Run one Ray query and its DuckDB twin; return (ok, detail)."""
    if queries is None or oracle_sql is None:
        from kgraft.queries import ORACLE_SQL, QUERIES

        queries, oracle_sql = QUERIES, ORACLE_SQL
    mine = normalize(to_pandas(queries[name](sf_dir)))
    theirs = normalize(con.sql(oracle_sql[name]).df())
    ok_shape = mine.shape == theirs.shape and list(mine.columns) == list(theirs.columns)
    if not ok_shape:
        return False, (
            f"shape: mine {mine.shape} cols {list(mine.columns)} | "
            f"oracle {theirs.shape} cols {list(theirs.columns)}"
        )
    for c in mine.columns:
        a, b = mine[c], theirs[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            av = a.astype(float).to_numpy()
            bv = b.astype(float).to_numpy()
            same = bool(np.all((av == bv) | (np.isnan(av) & np.isnan(bv))))
        else:
            same = a.astype(str).equals(b.astype(str))
        if not same:
            return False, (
                f"col {c} mismatch\n mine: {a.head(5).tolist()}\n"
                f" orcl: {b.head(5).tolist()}"
            )
    return True, f"{mine.shape[0]} rows"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgraft.queries import ORACLE_SQL, QUERIES

    con = oracle_connection(sf_dir)

    failures = []
    for name, sql in ORACLE_SQL.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(QUERIES[name](sf_dir)))
            theirs = normalize(con.sql(sql).df())
            ok_shape = mine.shape == theirs.shape and list(mine.columns) == list(
                theirs.columns
            )
            ok_vals = False
            if ok_shape:
                ok_vals = True
                for c in mine.columns:
                    a, b = mine[c], theirs[c]
                    if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                        av = a.astype(float).to_numpy()
                        bv = b.astype(float).to_numpy()
                        # exact at driver precision (both sides already
                        # sql_round(…, 6)-normalized); NaN == NaN
                        same = bool(
                            np.all((av == bv) | (np.isnan(av) & np.isnan(bv)))
                        )
                    else:
                        same = a.astype(str).equals(b.astype(str))
                    if not same:
                        ok_vals = False
                        print(f"  [{name}] col {c} mismatch")
                        print("   mine:", a.head(5).tolist())
                        print("   orcl:", b.head(5).tolist())
            status = "OK" if (ok_shape and ok_vals) else "FAIL"
            if status == "FAIL":
                failures.append(name)
                print(
                    f"{status} {name}: mine {mine.shape} cols {list(mine.columns)} | "
                    f"oracle {theirs.shape} cols {list(theirs.columns)}"
                )
            else:
                print(f"{status} {name}: {mine.shape[0]} rows")
        except Exception as e:
            failures.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    print("\nFAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
