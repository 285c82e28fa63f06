"""TPC-H subquery-shape suite (round 2 coverage widening).

Ten more TPC-H-flavored pipelines, adapted to the driver tables'
columns (no partsupp / shipmode / commitdate / phone in the synthetic
schema — predicates are remapped onto p_brand/p_size/p_name/
o_orderpriority while keeping each query's OPERATOR SHAPE intact):

- q7  nation-pair volume (multi-fact join chain, cross-filter)
- q8  market share (CASE share-of-total over a 4-join star)
- q9  profit by nation/year (LIKE-filtered part semi join)
- q15 top supplier (scalar subquery: max over a derived aggregate)
- q16 supplier counts (grouped COUNT DISTINCT over a join)
- q17 small-quantity revenue (correlated per-group AVG subquery)
- q19 disjunctive predicate revenue (OR-of-conjunctions pushdown)
- q20 qualified suppliers (HAVING-filtered semi join chain)
- q21 waiting suppliers (multi-supplier EXISTS / sole-max pattern)
- q22 idle rich customers (scalar subquery + NOT EXISTS anti join)

Scale notes follow the r1 verdict: nation/region broadcast (25 rows by
spec); customer/supplier/orders/part/lineitem attach via bucketed
``hash_join`` / ``bloom_semi_join``; corpus-cardinality aggregates stay
Datasets (``pre_aggregate_ds``); only dimension-bounded finals collect.
Reference seed: the reference implements NO joins/aggregates at all
(SURVEY.md §2.1 "does NOT implement") — these exist for the engine
contract, not reference parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .sqlround import sql_round
from .relational import (
    bloom_semi_join,
    grouped_count_distinct,
    hash_join,
    pre_aggregate,
    pre_aggregate_ds,
    read_table,
)


def _ts(s: str) -> pa.Scalar:
    return pa.scalar(np.datetime64(s, "us"))


def _names_for(sf_dir: str, keys, table: str, key_col: str, name_col: str) -> pd.DataFrame:
    """Names for a tiny winner set: broadcast the key set, scan the table.

    The winner set is top-k-sized (driver-small by construction); the
    table is corpus-scale and never collects — same pattern as q10.
    """
    keys_ref = ray.put({int(k) for k in keys})
    return (
        read_table(sf_dir, table, columns=[key_col, name_col])
        .map_batches(
            lambda df: df[df[key_col].isin(ray.get(keys_ref))],
            batch_format="pandas",
        )
        .to_pandas()
    )


# ---------------------------------------------------------------------------
# q7: volume shipping between two nations


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """Revenue shipped between NATION_7 and NATION_8 by year (TPC-H Q7
    shape): supplier-nation x customer-nation cross filter over a
    lineitem-orders-customer-supplier join chain."""
    nation = read_table(sf_dir, "nation").to_pandas()
    pair = nation[nation["n_name"].isin(["NATION_7", "NATION_8"])]
    nkeys = frozenset(int(k) for k in pair["n_nationkey"])
    nk_ref = ray.put(nkeys)
    name_of = {int(k): v for k, v in zip(pair["n_nationkey"], pair["n_name"])}

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda df: df[df["s_nationkey"].isin(ray.get(nk_ref))].rename(
            columns={"s_suppkey": "l_suppkey", "s_nationkey": "supp_nkey"}
        ),
        batch_format="pandas",
    )
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: df[df["c_nationkey"].isin(ray.get(nk_ref))].rename(
            columns={"c_custkey": "o_custkey", "c_nationkey": "cust_nkey"}
        ),
        batch_format="pandas",
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    ords = hash_join(
        orders,
        cust,
        on="o_custkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()), ("cust_nkey", pa.int64())]),
    ).map_batches(lambda df: df[["l_orderkey", "cust_nkey"]], batch_format="pandas")

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "l_suppkey": df["l_suppkey"],
                "l_year": df["l_shipdate"].dt.year.astype("int64"),
                "volume": df["l_extendedprice"] * (1 - df["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    j1 = hash_join(
        li,
        supp,
        on="l_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_year", pa.int64()),
                ("volume", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_suppkey", pa.int64()), ("supp_nkey", pa.int64())]),
    ).map_batches(
        lambda df: df[["l_orderkey", "l_year", "volume", "supp_nkey"]],
        batch_format="pandas",
    )
    j2 = hash_join(
        j1,
        ords,
        on="l_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_year", pa.int64()),
                ("volume", pa.float64()),
                ("supp_nkey", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("cust_nkey", pa.int64())]),
    )
    name_ref = ray.put(name_of)
    flows = j2.map_batches(
        lambda df: df[df["supp_nkey"] != df["cust_nkey"]].assign(
            supp_nation=lambda d: d["supp_nkey"].map(ray.get(name_ref)),
            cust_nation=lambda d: d["cust_nkey"].map(ray.get(name_ref)),
        )[["supp_nation", "cust_nation", "l_year", "volume"]],
        batch_format="pandas",
    )
    out = pre_aggregate(
        flows, ["supp_nation", "cust_nation", "l_year"], {"revenue": ("volume", "sum")}
    )
    out["revenue"] = sql_round(out["revenue"], 4)
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(
        drop=True
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_8')
     OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_7')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q8: national market share


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """NATION_3's share of ECONOMY-part volume sold into EUROPE, by order
    year (TPC-H Q8 shape: CASE share-of-total over a star join)."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    euro_rk = set(region.loc[region["r_name"] == "EUROPE", "r_regionkey"])
    euro_nk = frozenset(
        int(k) for k in nation.loc[nation["n_regionkey"].isin(euro_rk), "n_nationkey"]
    )
    target_nk = int(nation.loc[nation["n_name"] == "NATION_3", "n_nationkey"].iloc[0])
    euro_ref = ray.put(euro_nk)

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: df[df["c_nationkey"].isin(ray.get(euro_ref))][["c_custkey"]].rename(
            columns={"c_custkey": "o_custkey"}
        ),
        batch_format="pandas",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"],
                "o_custkey": df["o_custkey"],
                "o_year": df["o_orderdate"].dt.year.astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    ords = hash_join(
        orders,
        cust,
        on="o_custkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_year", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    ).map_batches(lambda df: df[["l_orderkey", "o_year"]], batch_format="pandas")

    part_keys = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda df: df[df["p_type"] == "ECONOMY"][["p_partkey"]].rename(
            columns={"p_partkey": "l_partkey"}
        ),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "l_partkey": df["l_partkey"],
                "l_suppkey": df["l_suppkey"],
                "volume": df["l_extendedprice"] * (1 - df["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    li_p = bloom_semi_join(li, part_keys, on="l_partkey").map_batches(
        lambda df: df[["l_orderkey", "l_suppkey", "volume"]], batch_format="pandas"
    )
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda df: df.rename(
            columns={"s_suppkey": "l_suppkey", "s_nationkey": "supp_nkey"}
        ),
        batch_format="pandas",
    )
    j1 = hash_join(
        li_p,
        supp,
        on="l_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("volume", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_suppkey", pa.int64()), ("supp_nkey", pa.int64())]),
    ).map_batches(
        lambda df: df[["l_orderkey", "volume", "supp_nkey"]], batch_format="pandas"
    )
    j2 = hash_join(
        j1,
        ords,
        on="l_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("volume", pa.float64()),
                ("supp_nkey", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("o_year", pa.int64())]),
    )
    flows = j2.map_batches(
        lambda df: pd.DataFrame(
            {
                "o_year": df["o_year"],
                "volume": df["volume"],
                "vol_target": df["volume"] * (df["supp_nkey"] == target_nk),
            }
        ),
        batch_format="pandas",
    )
    out = pre_aggregate(
        flows,
        ["o_year"],
        {"total": ("volume", "sum"), "target": ("vol_target", "sum")},
    )
    out["mkt_share"] = sql_round((out["target"] / out["total"]), 6)
    return (
        out[["o_year", "mkt_share"]].sort_values("o_year").reset_index(drop=True)
    )


_Q8_SQL = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
)
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q9: profit by nation and year


def q9_profit_by_nation(sf_dir: str) -> pd.DataFrame:
    """Revenue on 'red' parts grouped by supplier nation and order year
    (TPC-H Q9 shape, minus partsupp supplycost — the synthetic schema
    has no partsupp table)."""
    nation = read_table(sf_dir, "nation").to_pandas()
    name_of = {int(k): v for k, v in zip(nation["n_nationkey"], nation["n_name"])}

    part_keys = read_table(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda df: df[df["p_name"].str.contains("red", regex=False)][
            ["p_partkey"]
        ].rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "l_partkey": df["l_partkey"],
                "l_suppkey": df["l_suppkey"],
                "amount": df["l_extendedprice"] * (1 - df["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    li_p = bloom_semi_join(li, part_keys, on="l_partkey").map_batches(
        lambda df: df[["l_orderkey", "l_suppkey", "amount"]], batch_format="pandas"
    )
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda df: df.rename(
            columns={"s_suppkey": "l_suppkey", "s_nationkey": "supp_nkey"}
        ),
        batch_format="pandas",
    )
    j1 = hash_join(
        li_p,
        supp,
        on="l_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("amount", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_suppkey", pa.int64()), ("supp_nkey", pa.int64())]),
    ).map_batches(
        lambda df: df[["l_orderkey", "amount", "supp_nkey"]], batch_format="pandas"
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"],
                "o_year": df["o_orderdate"].dt.year.astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    j2 = hash_join(
        j1,
        orders,
        on="l_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("amount", pa.float64()),
                ("supp_nkey", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", pa.int64()), ("o_year", pa.int64())]),
    )
    out = pre_aggregate(j2, ["supp_nkey", "o_year"], {"sum_profit": ("amount", "sum")})
    out["nation"] = out["supp_nkey"].map(name_of)
    out["sum_profit"] = sql_round(out["sum_profit"], 4)
    return (
        out[["nation", "o_year", "sum_profit"]]
        .sort_values(["nation", "o_year"])
        .reset_index(drop=True)
    )


_Q9_SQL = """
SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year
"""


# ---------------------------------------------------------------------------
# q15: top supplier (scalar subquery over a derived aggregate)


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """Supplier(s) with the maximum revenue in 1996Q1 (TPC-H Q15 shape:
    a derived per-supplier aggregate compared against its own max — the
    scalar is a driver-side O(1) reduce, the aggregate stays a Dataset)."""
    lo, hi = _ts("1996-01-01"), _ts("1996-04-01")
    li = read_table(
        sf_dir, "lineitem", columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
    )

    def prep(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        )
        rev = pc.multiply(f["l_extendedprice"], pc.subtract(pa.scalar(1.0), f["l_discount"]))
        return pa.table({"l_suppkey": f["l_suppkey"], "rev": rev})

    revenue = pre_aggregate_ds(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_suppkey"],
        {"total_revenue": ("rev", "sum")},
    ).map_batches(
        lambda df: df.assign(total_revenue=sql_round(df["total_revenue"], 4)),
        batch_format="pandas",
    )
    # rounding BEFORE the max comparison pins the equality semantics on
    # both sides (the oracle compares rounded values too)
    max_rev = revenue.max("total_revenue")
    winners = revenue.map_batches(
        lambda df: df[df["total_revenue"] == max_rev], batch_format="pandas"
    ).to_pandas()
    names = _names_for(sf_dir, winners["l_suppkey"], "supplier", "s_suppkey", "s_name")
    out = winners.rename(columns={"l_suppkey": "s_suppkey"}).merge(names, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return (
        out[["s_suppkey", "s_name", "total_revenue"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# q16: supplier counts by part attributes (grouped COUNT DISTINCT over a join)


def q16_supplier_counts(sf_dir: str) -> pd.DataFrame:
    """Distinct suppliers per (brand, type) for selected part sizes,
    excluding Brand#1 (TPC-H Q16 shape, partsupp replaced by the
    lineitem supplier relation)."""
    sizes = {1, 5, 9, 13, 17, 21, 25, 29}
    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(
        lambda df: df[(df["p_brand"] != "Brand#1") & (df["p_size"].isin(sizes))][
            ["p_partkey", "p_brand", "p_type"]
        ].rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas",
    )
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    joined = hash_join(
        li,
        part,
        on="l_partkey",
        left_schema=pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())]),
        right_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
            ]
        ),
    )
    counts = grouped_count_distinct(
        joined, ["p_brand", "p_type"], "l_suppkey", out_col="supplier_cnt"
    ).to_pandas()  # bounded key space: 24 brands x 6 types
    counts["supplier_cnt"] = counts["supplier_cnt"].astype("int64")
    return (
        counts.sort_values(
            ["supplier_cnt", "p_brand", "p_type"], ascending=[False, True, True]
        ).reset_index(drop=True)
    )


_Q16_SQL = """
SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type
"""


# ---------------------------------------------------------------------------
# q17: small-quantity revenue (correlated per-group AVG subquery)


def q17_small_quantity(sf_dir: str) -> pd.DataFrame:
    """Yearly-averaged revenue on Brand#3 lineitems whose quantity is
    below 20% of that part's average quantity (TPC-H Q17 shape: the
    correlated AVG subquery becomes a per-part aggregate joined back to
    the detail rows — the aggregate stays a Dataset end to end).

    The brand-filtered lineitem subset is consumed twice (once to build
    the per-part averages, once as the join probe); each consumption
    streams it independently — no mid-pipeline materialization."""
    part_keys = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda df: df[df["p_brand"] == "Brand#3"][["p_partkey"]].rename(
            columns={"p_partkey": "l_partkey"}
        ),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li_b = bloom_semi_join(li, part_keys, on="l_partkey")
    avg_ds = pre_aggregate_ds(li_b, ["l_partkey"], {"avg_qty": ("l_quantity", "mean")})
    joined = hash_join(
        li_b,
        avg_ds,
        on="l_partkey",
        left_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("l_partkey", pa.int64()), ("avg_qty", pa.float64())]),
    )
    small = joined.map_batches(
        lambda df: df[df["l_quantity"] < 0.2 * df["avg_qty"]][["l_extendedprice"]],
        batch_format="pandas",
    )
    total = small.sum("l_extendedprice")
    return pd.DataFrame({"avg_yearly": [sql_round((total or 0.0) / 7.0, 4)]})


_Q17_SQL = """
SELECT round(COALESCE(sum(l.l_extendedprice), 0) / 7.0, 4) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


# ---------------------------------------------------------------------------
# q19: disjunctive predicate revenue


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue under an OR-of-conjunctions over part and lineitem
    attributes (TPC-H Q19 shape: the part side is pre-pruned to the
    union of the disjuncts, the residual disjunction is one vectorized
    mask after the join)."""
    brands = {"Brand#1", "Brand#2", "Brand#3"}
    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(
        lambda df: df[(df["p_brand"].isin(brands)) & (df["p_size"] >= 1) & (df["p_size"] <= 35)][
            ["p_partkey", "p_brand", "p_size"]
        ].rename(columns={"p_partkey": "l_partkey"}),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = hash_join(
        li,
        part,
        on="l_partkey",
        left_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("l_partkey", pa.int64()),
                ("p_brand", pa.string()),
                ("p_size", pa.int32()),
            ]
        ),
    )

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        q, b, s = df["l_quantity"], df["p_brand"], df["p_size"]
        m = (
            ((b == "Brand#1") & (s <= 15) & (q >= 1) & (q <= 11))
            | ((b == "Brand#2") & (s <= 25) & (q >= 10) & (q <= 20))
            | ((b == "Brand#3") & (s <= 35) & (q >= 20) & (q <= 30))
        )
        f = df[m]
        return pd.DataFrame({"rev": f["l_extendedprice"] * (1 - f["l_discount"])})

    rev = joined.map_batches(residual, batch_format="pandas").sum("rev")
    return pd.DataFrame({"revenue": [sql_round(rev or 0.0, 4)]})


_Q19_SQL = """
SELECT round(COALESCE(sum(l.l_extendedprice * (1 - l.l_discount)), 0), 4) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# q20: qualified suppliers (HAVING-filtered semi join chain)


def q20_qualified_suppliers(sf_dir: str) -> pd.DataFrame:
    """NATION_5 suppliers who shipped more than 50 units of 'red ...'
    parts during 1996 (TPC-H Q20 shape: IN-subquery with HAVING becomes
    a thresholded per-supplier aggregate joined to the dimension)."""
    part_keys = read_table(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda df: df[df["p_name"].str.startswith("red ")][["p_partkey"]].rename(
            columns={"p_partkey": "l_partkey"}
        ),
        batch_format="pandas",
    )
    lo, hi = _ts("1996-01-01"), _ts("1997-01-01")
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        ).select(["l_partkey", "l_suppkey", "l_quantity"]),
        batch_format="pyarrow",
    )
    li_red = bloom_semi_join(li, part_keys, on="l_partkey")
    qualified = pre_aggregate_ds(
        li_red, ["l_suppkey"], {"qty": ("l_quantity", "sum")}
    ).map_batches(
        lambda df: df[df["qty"] > 50][["l_suppkey"]], batch_format="pandas"
    )
    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).map_batches(
        lambda df: df[df["s_nationkey"] == 5][["s_suppkey", "s_name"]].rename(
            columns={"s_suppkey": "l_suppkey"}
        ),
        batch_format="pandas",
    )
    out = hash_join(
        supp,
        qualified,
        on="l_suppkey",
        left_schema=pa.schema([("l_suppkey", pa.int64()), ("s_name", pa.string())]),
        right_schema=pa.schema([("l_suppkey", pa.int64())]),
    ).to_pandas()
    if "l_suppkey" not in out.columns:  # empty qualified set at tiny scale
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"), "s_name": pd.Series([], dtype=object)}
        )
    out = out.rename(columns={"l_suppkey": "s_suppkey"})
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["s_suppkey", "s_name"]].sort_values("s_suppkey").reset_index(drop=True)


_Q20_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_nationkey = 5
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red %'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(l.l_quantity) > 50
  )
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# q21: waiting suppliers (sole-latest-shipper on multi-supplier orders)


def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """Top 10 suppliers by the number of multi-supplier orders where they
    were the SOLE latest shipper (TPC-H Q21 shape: the EXISTS /
    NOT EXISTS pair over other suppliers' lineitems becomes per-order
    max + uniqueness tests, all as partial-combined aggregates).

    Ship timestamps ride as int64 epoch-us so min/max partials stay
    numeric through the shuffle."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "l_suppkey": df["l_suppkey"],
                "ship_ts": df["l_shipdate"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    # ONE order-keyed co-location computes the whole EXISTS/NOT-EXISTS
    # logic: the per-(order, supplier) max is combined map-side (the
    # partial), every order's rows then meet in one bucket where the
    # order max, supplier count, and sole-latest test are plain
    # vectorized transforms. Replaces a 4-exchange + 2-join plan — every
    # intermediate here was keyed by l_orderkey anyway.
    def local_max(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "ship_ts"
        ].max()

    def order_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "ship_ts"
        ].max()
        grp = per.groupby("l_orderkey", sort=False)
        mx = grp["ship_ts"].transform("max")
        nsupp = grp["l_suppkey"].transform("size")
        hit = per[(per["ship_ts"] == mx) & (nsupp >= 2)]
        nh = hit.groupby("l_orderkey", sort=False)["l_suppkey"].transform("size")
        return hit.loc[nh == 1, ["l_orderkey", "l_suppkey"]]

    from .relational import bucketed_groupby_apply

    blocked = bucketed_groupby_apply(
        li.map_batches(local_max, batch_format="pandas"),
        ["l_orderkey"],
        order_bucket,
    )
    waits = (
        pre_aggregate_ds(blocked, ["l_suppkey"], {"numwait": (None, "count")})
        .sort(["numwait", "l_suppkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    names = _names_for(sf_dir, waits["l_suppkey"], "supplier", "s_suppkey", "s_name")
    out = waits.rename(columns={"l_suppkey": "s_suppkey"}).merge(names, on="s_suppkey")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["numwait"] = out["numwait"].astype("int64")
    out = out.sort_values(["numwait", "s_suppkey"], ascending=[False, True])
    return out[["s_suppkey", "s_name", "numwait"]].reset_index(drop=True)


_Q21_SQL = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
ord AS (
  SELECT l_orderkey, max(last_ship) AS mx, count(*) AS nsupp
  FROM per GROUP BY l_orderkey
),
hit AS (
  SELECT p.l_orderkey, p.l_suppkey
  FROM per p JOIN ord o ON p.l_orderkey = o.l_orderkey
  WHERE p.last_ship = o.mx AND o.nsupp >= 2
),
sole AS (
  SELECT l_orderkey FROM hit GROUP BY l_orderkey HAVING count(*) = 1
)
SELECT s.s_suppkey, s.s_name, count(*) AS numwait
FROM hit h
JOIN sole u ON h.l_orderkey = u.l_orderkey
JOIN supplier s ON s.s_suppkey = h.l_suppkey
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q22: idle rich customers (scalar subquery + NOT EXISTS anti join)


def q22_idle_rich_customers(sf_dir: str) -> pd.DataFrame:
    """Per-nation count and balance of customers whose balance exceeds
    the positive-balance average and who never placed an URGENT order
    (TPC-H Q22 shape: scalar AVG subquery broadcast + NOT EXISTS as a
    left-outer hash join filtered to unmatched rows — exact, no
    key-set broadcast of the corpus-scale orders side)."""
    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    avg_bal = cust.map_batches(
        lambda df: df[df["c_acctbal"] > 0][["c_acctbal"]], batch_format="pandas"
    ).mean("c_acctbal")
    rich = cust.map_batches(
        lambda df: pd.DataFrame(
            {
                "c_custkey": df.loc[df["c_acctbal"] > avg_bal, "c_custkey"],
                "c_nationkey": df.loc[df["c_acctbal"] > avg_bal, "c_nationkey"].astype(
                    "int64"
                ),
                "c_acctbal": df.loc[df["c_acctbal"] > avg_bal, "c_acctbal"],
            }
        ),
        batch_format="pandas",
    )
    urgent = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda df: df[df["o_orderpriority"] == "1-URGENT"][["o_custkey"]].rename(
            columns={"o_custkey": "c_custkey"}
        ),
        batch_format="pandas",
    )
    # map-side dedup only: a NOT-EXISTS anti join is insensitive to
    # duplicate right-side keys (matched rows are dropped either way),
    # so the global-distinct shuffle would be pure cost
    urgent_keys = urgent.map_batches(
        lambda df: df.drop_duplicates().assign(__has=np.int64(1)),
        batch_format="pandas",
    )
    j = hash_join(
        rich,
        urgent_keys,
        on="c_custkey",
        how="left",
        left_schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_nationkey", pa.int64()),
                ("c_acctbal", pa.float64()),
            ]
        ),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("__has", pa.int64())]),
    )
    idle = j.map_batches(
        lambda df: df[df["__has"].isna()][["c_nationkey", "c_acctbal"]],
        batch_format="pandas",
    )
    out = pre_aggregate(
        idle,
        ["c_nationkey"],
        {"numcust": (None, "count"), "totacctbal": ("c_acctbal", "sum")},
    )
    out["totacctbal"] = sql_round(out["totacctbal"], 4)
    out["numcust"] = out["numcust"].astype("int64")
    return (
        out[["c_nationkey", "numcust", "totacctbal"]]
        .sort_values("c_nationkey")
        .reset_index(drop=True)
    )


_Q22_SQL = """
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       count(*) AS numcust,
       round(sum(c.c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
ORDER BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q12: priority split by line class (fact-fact join + conditional CASE agg)


def q12_priority_class(sf_dir: str) -> pd.DataFrame:
    """Line counts per return-flag class split on order priority (TPC-H
    Q12 shape). The synthetic schema has no ``l_shipmode`` /
    ``l_commitdate`` / ``l_receiptdate``, so ``l_returnflag`` stands in
    for the shipmode class filter and "shipped more than 60 days after
    the order was placed" stands in for the commit/receipt lateness
    chain — the OPERATOR SHAPE (selective fact filter -> fact-fact
    equi-join -> join-dependent predicate -> CASE split aggregation
    over a bounded key) is intact.

    Scale: both fact tables stream through one bucketed exchange on
    the order key; the CASE split happens as vectorized int partials
    inside ``map_batches`` and only per-(flag, batch) partial rows
    cross the final (2-key) reduce.
    """
    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(
        lambda df: df[
            df["l_returnflag"].isin(("R", "N"))
            & (df["l_shipdate"] >= lo)
            & (df["l_shipdate"] < hi)
        ],
        batch_format="pandas",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(
        li,
        orders,
        on="l_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_returnflag", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
        right_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].astype("datetime64[us]")
        placed = df["o_orderdate"].astype("datetime64[us]")
        late = (ship - placed).dt.days > 60
        f = df[late]
        high = f["o_orderpriority"].isin(("1-URGENT", "2-HIGH"))
        return pd.DataFrame(
            {
                "l_returnflag": f["l_returnflag"],
                "high": high.astype("int64"),
                "low": (~high).astype("int64"),
            }
        )

    out = pre_aggregate(
        joined.map_batches(classify, batch_format="pandas"),
        keys="l_returnflag",
        aggs={
            "high_line_count": ("high", "sum"),
            "low_line_count": ("low", "sum"),
        },
    )
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out.sort_values("l_returnflag", ignore_index=True)


_Q12_SQL = """
SELECT l.l_returnflag,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag IN ('R', 'N')
  AND l.l_shipdate >= DATE '1996-01-01'
  AND l.l_shipdate < DATE '1997-01-01'
  AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


# ---------------------------------------------------------------------------
# q2: minimum-cost supplier (correlated min subquery over the ps relation)


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """Lowest-cost supplier per qualifying part in EUROPE (TPC-H Q2
    shape). The synthetic schema has no partsupp; the part-supplier
    catalog derives from lineitem — ps_supplycost := min unit price a
    supplier ever charged for the part (deterministic, oracle derives
    identically). The correlated ``= (SELECT min(...))`` subquery
    becomes a per-part min aggregate joined back to the eligible rows
    (q17's shape); equality compares 4-dp-rounded values on both sides
    (q15's convention)."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    euro_keys = nation.merge(
        region[region["r_name"] == "EUROPE"],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )[["n_nationkey", "n_name"]]
    nk_ref = ray.put(euro_keys)

    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]
    ).map_batches(
        lambda df: df.merge(
            ray.get(nk_ref), left_on="s_nationkey", right_on="n_nationkey"
        )[["s_suppkey", "s_name", "s_acctbal", "n_name"]].rename(
            columns={"s_suppkey": "ps_suppkey"}
        ),
        batch_format="pandas",
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    )

    def unit(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ps_partkey": t["l_partkey"],
                "ps_suppkey": t["l_suppkey"],
                "unit_cost": pc.divide(t["l_extendedprice"], t["l_quantity"]),
            }
        )

    ps = pre_aggregate_ds(
        li.map_batches(unit, batch_format="pyarrow"),
        ["ps_partkey", "ps_suppkey"],
        {"ps_supplycost": ("unit_cost", "min")},
    ).map_batches(
        lambda df: df.assign(ps_supplycost=sql_round(df["ps_supplycost"], 4)),
        batch_format="pandas",
    )

    elig = hash_join(
        ps,
        supp,
        on="ps_suppkey",
        left_schema=pa.schema(
            [
                ("ps_partkey", pa.int64()),
                ("ps_suppkey", pa.int64()),
                ("ps_supplycost", pa.float64()),
            ]
        ),
        right_schema=pa.schema(
            [
                ("ps_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_acctbal", pa.float64()),
                ("n_name", pa.string()),
            ]
        ),
    )
    elig_schema = pa.schema(
        [
            ("ps_partkey", pa.int64()),
            ("ps_suppkey", pa.int64()),
            ("ps_supplycost", pa.float64()),
            ("s_name", pa.string()),
            ("s_acctbal", pa.float64()),
            ("n_name", pa.string()),
        ]
    )
    mins = pre_aggregate_ds(
        elig, ["ps_partkey"], {"min_cost": ("ps_supplycost", "min")}
    )
    winners = hash_join(
        elig,
        mins,
        on="ps_partkey",
        left_schema=elig_schema,
        right_schema=pa.schema([("ps_partkey", pa.int64()), ("min_cost", pa.float64())]),
    ).map_batches(
        lambda df: df[df["ps_supplycost"] == df["min_cost"]][
            ["ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name"]
        ],
        batch_format="pandas",
    )

    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(
        lambda df: df[
            (df["p_size"].between(10, 25)) & (df["p_type"] == "STANDARD")
        ][["p_partkey", "p_brand"]].rename(columns={"p_partkey": "ps_partkey"}),
        batch_format="pandas",
    )
    out = hash_join(
        winners,
        part,
        on="ps_partkey",
        left_schema=pa.schema(
            [
                ("ps_partkey", pa.int64()),
                ("ps_supplycost", pa.float64()),
                ("s_name", pa.string()),
                ("s_acctbal", pa.float64()),
                ("n_name", pa.string()),
            ]
        ),
        right_schema=pa.schema([("ps_partkey", pa.int64()), ("p_brand", pa.string())]),
    ).to_pandas()  # top-100 qualifying winners: driver-small by construction
    out = out.rename(columns={"ps_partkey": "p_partkey"})
    out = out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
    ).head(100)
    return out[
        ["s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost"]
    ].reset_index(drop=True)


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(min(l_extendedprice / l_quantity), 4) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
),
eu_supp AS (
  SELECT s_suppkey AS ps_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
elig AS (
  SELECT ps.ps_partkey, ps.ps_supplycost, s.s_name, s.s_acctbal, s.n_name
  FROM ps JOIN eu_supp s USING (ps_suppkey)
),
mins AS (SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM elig GROUP BY 1)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand, e.ps_supplycost
FROM elig e
JOIN mins m ON e.ps_partkey = m.ps_partkey AND e.ps_supplycost = m.min_cost
JOIN part p ON p.p_partkey = e.ps_partkey
WHERE p.p_size BETWEEN 10 AND 25 AND p.p_type = 'STANDARD'
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q11: important stock (grouped share-of-total HAVING)


def q11_important_stock(sf_dir: str) -> pd.DataFrame:
    """Parts whose NATION_3-supplied value exceeds 1.5x the average
    part's share (TPC-H Q11 shape: grouped aggregate filtered against a
    scalar derived from ITS OWN total — the aggregate stays a Dataset;
    only the O(1) scalars and the qualifying tail collect). partsupp
    value is replaced by lineitem revenue through the nation's
    suppliers; the cut is share-relative (TPC-H scales its fraction by
    1/SF for the same reason — a fixed fraction empties out as the part
    count grows)."""
    nation = read_table(sf_dir, "nation").to_pandas()
    nk = int(nation.loc[nation["n_name"] == "NATION_3", "n_nationkey"].iloc[0])

    supp_keys = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda df: df[df["s_nationkey"] == nk][["s_suppkey"]].rename(
            columns={"s_suppkey": "l_suppkey"}
        ),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    li_n = bloom_semi_join(li, supp_keys, on="l_suppkey")

    def rev(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ps_partkey": t["l_partkey"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
                ),
            }
        )

    v = pre_aggregate_ds(
        li_n.map_batches(rev, batch_format="pyarrow"),
        ["ps_partkey"],
        {"part_value": ("rev", "sum")},
    ).materialize()  # three consumers: total, count, HAVING filter
    total = float(v.sum("part_value") or 0.0)
    n_parts = int(v.count())
    cut = total * 1.5 / n_parts if n_parts else 0.0
    out = (
        v.map_batches(
            lambda df: df[df["part_value"] > cut].assign(
                part_value=sql_round(df.loc[df["part_value"] > cut, "part_value"], 4)
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if "ps_partkey" not in out.columns:  # all-empty blocks arrive column-less
        out = pd.DataFrame(
            {
                "ps_partkey": pd.Series([], dtype="int64"),
                "part_value": pd.Series([], dtype="float64"),
            }
        )
    out = out.sort_values(
        ["part_value", "ps_partkey"], ascending=[False, True]
    ).reset_index(drop=True)
    out["ps_partkey"] = out["ps_partkey"].astype("int64")
    return out


_Q11_SQL = """
WITH gs AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
v AS (
  SELECT l_partkey AS ps_partkey,
         sum(l_extendedprice * (1 - l_discount)) AS part_value
  FROM lineitem JOIN gs ON l_suppkey = gs.s_suppkey
  GROUP BY 1
)
SELECT ps_partkey, round(part_value, 4) AS part_value
FROM v
WHERE part_value > (SELECT sum(part_value) * 1.5 / count(*) FROM v)
ORDER BY part_value DESC, ps_partkey
"""


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """Distribution of customers by order count (TPC-H Q13: the
    filtered LEFT OUTER join + two-level aggregation shape — the last
    classic missing from the suite). The synthetic schema has no
    ``o_comment``, so the "not special requests" anti-predicate is
    remapped to ``o_orderpriority <> '4-NOT SPECIFIED'``; the shape
    (right side filtered BEFORE the outer join, zero-order customers
    kept and counted in the c_count=0 bin) is intact.

    Scale: orders collapse to per-customer counts map-side (the only
    corpus-scale exchange is customer-cardinality count partials), the
    LEFT join attaches counts to the customer spine through one
    bucketed exchange, and the final distribution is a tiny
    distinct-count-cardinality reduce."""
    counts = pre_aggregate_ds(
        read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
        .map_batches(
            lambda df: df.loc[
                df["o_orderpriority"] != "4-NOT SPECIFIED", ["o_custkey"]
            ].rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas",
        ),
        ["c_custkey"],
        {"c_count": (None, "count")},
    )
    spine = read_table(sf_dir, "customer", columns=["c_custkey"])
    j = hash_join(
        spine,
        counts,
        on="c_custkey",
        how="left",
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_count", pa.int64())]),
    )
    dist = pre_aggregate(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"c_count": df["c_count"].fillna(0).astype("int64")}
            ),
            batch_format="pandas",
        ),
        ["c_count"],
        {"custdist": (None, "count")},
    )
    dist["custdist"] = dist["custdist"].astype("int64")
    return dist.sort_values(
        ["custdist", "c_count"], ascending=[False, False], ignore_index=True
    )[["c_count", "custdist"]]


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


TPCH_QUERIES = {
    "q13_customer_distribution": q13_customer_distribution,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q12_priority_class": q12_priority_class,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_counts": q16_supplier_counts,
    "q17_small_quantity": q17_small_quantity,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_qualified_suppliers": q20_qualified_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

TPCH_ORACLE_SQL = {
    "q13_customer_distribution": _Q13_SQL,
    "q2_min_cost_supplier": _Q2_SQL,
    "q11_important_stock": _Q11_SQL,
    "q12_priority_class": _Q12_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "q8_market_share": _Q8_SQL,
    "q9_profit_by_nation": _Q9_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q16_supplier_counts": _Q16_SQL,
    "q17_small_quantity": _Q17_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q20_qualified_suppliers": _Q20_SQL,
    "q21_waiting_suppliers": _Q21_SQL,
    "q22_idle_rich_customers": _Q22_SQL,
}
