"""Named query suite: the ``__ray_entry__.py`` contract surface.

``QUERIES[name](sf_dir)`` runs the Ray-Data implementation;
``ORACLE_SQL[name]`` is the DuckDB-equivalent ANSI SQL over the same
parquet tables (views pre-registered by the driver). Column names and
float rounding match exactly on both sides (driver compares
order-insensitively by sorted column names + value hash).

Queries without an oracle entry are genuinely non-SQL-expressible
(MinHash-LSH, SimHash, IVF-ANN, the KG pipeline itself); those get
rows-only checks from the driver and full oracles in ``tests/``.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .util import pool_concurrency

from . import embedops, textops
from .sqlround import sql_round
from .relational import (
    broadcast_join,
    bucketed_groupby_apply,
    distinct,
    hash_join,
    pre_aggregate,
    pre_aggregate_ds,
    read_table,
    semi_anti_join,
)

def _scratch_layout(sf_dir: str, name: str) -> str:
    """Per-call scratch layout path, namespaced by (pid, sf tag): these
    layouts are rewritten on every query call (never a cross-run
    cache), so a fixed shared path only adds a concurrent-process
    clobber hazard — a second check_oracle/bench/pytest process
    overwriting `cms_sf0.001_even.parquet` mid-read flips the reader's
    result (same hazard class as the r4 ADVICE oracle-inputs item)."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/kgraft_layout/pid{os.getpid()}"
    os.makedirs(root, exist_ok=True)  # pandas to_parquet won't mkdir
    return f"{root}/{name}_{tag}"


# ---------------------------------------------------------------------------
# TPC-H-flavored relational pipelines


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("l_discprice", disc)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = pre_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("l_discprice", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "avg_price": ("l_extendedprice", "mean"),
            "count_order": (None, "count"),
        },
    )
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_price"]:
        out[c] = sql_round(out[c], 4)
    return out


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """Fully in-cluster: customer filter and order join are bucketed hash
    joins (customer grows with scale — no driver key set), the
    per-(order, date) aggregate stays a Dataset, and the final cut is a
    distributed top-k — only 10 rows ever reach the driver."""
    cutoff = pa.scalar(np.datetime64("1996-01-01", "us"))
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust_b = cust.map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.filter(
                    pc.equal(t["c_mktsegment"], pa.scalar("BUILDING"))
                )["c_custkey"]
            }
        ),
        batch_format="pyarrow",
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)), batch_format="pyarrow"
    )
    ords = hash_join(
        orders,
        cust_b,
        on="o_custkey",
        left_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
            ]
        ),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    )
    ords = ords.map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"],
                "o_orderdate": pd.to_datetime(df["o_orderdate"]).dt.strftime(
                    "%Y-%m-%d"
                ),
            }
        ),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def prep_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    li = li.map_batches(prep_li, batch_format="pyarrow")
    joined = hash_join(
        li,
        ords,
        on="l_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())]),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("o_orderdate", pa.string())]
        ),
    )
    agg = pre_aggregate_ds(
        joined, ["l_orderkey", "o_orderdate"], {"revenue": ("rev", "sum")}
    ).map_batches(
        lambda df: df.assign(revenue=sql_round(df["revenue"], 4)), batch_format="pandas"
    )
    out = (
        agg.sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return out[["l_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


_Q3_SQL = """
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-01-01'
  AND l.l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


def q5_local_supplier(sf_dir: str) -> pd.DataFrame:
    """Broadcast only the genuinely bounded tables (nation/region — 25
    rows by spec); customer and supplier GROW with the corpus, so they
    attach via bucketed hash joins (r1 verdict "what's wrong" #7)."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    asia = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    nations = nation[nation["n_regionkey"].isin(set(asia))]
    nkey_to_name = dict(zip(nations["n_nationkey"], nations["n_name"]))
    nk_ref = ray.put(frozenset(int(k) for k in nkey_to_name))

    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    def _ord_prep(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
            )
        )
        return pa.table(
            {"o_custkey": f["o_custkey"], "l_orderkey": f["o_orderkey"]}
        )

    orders = orders.map_batches(_ord_prep, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: df[df["c_nationkey"].isin(ray.get(nk_ref))].rename(
            columns={"c_custkey": "o_custkey", "c_nationkey": "cust_nation"}
        ),
        batch_format="pandas",
    )
    ords = hash_join(
        orders,
        cust,
        on="o_custkey",
        left_schema=pa.schema(
            [("o_custkey", pa.int64()), ("l_orderkey", pa.int64())]
        ),
        right_schema=pa.schema(
            [("o_custkey", pa.int64()), ("cust_nation", pa.int64())]
        ),
    ).map_batches(
        lambda df: df[["l_orderkey", "cust_nation"]], batch_format="pandas"
    )

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"],
                "l_suppkey": df["l_suppkey"],
                "rev": df["l_extendedprice"] * (1 - df["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda df: df.rename(
            columns={"s_suppkey": "l_suppkey", "s_nationkey": "supp_nation"}
        ),
        batch_format="pandas",
    )
    li_s = hash_join(
        li,
        supp,
        on="l_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("rev", pa.float64()),
            ]
        ),
        right_schema=pa.schema(
            [("l_suppkey", pa.int64()), ("supp_nation", pa.int64())]
        ),
    ).map_batches(
        lambda df: df[["l_orderkey", "supp_nation", "rev"]], batch_format="pandas"
    )
    joined = hash_join(
        li_s,
        ords,
        on="l_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("supp_nation", pa.int64()),
                ("rev", pa.float64()),
            ]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("cust_nation", pa.int64())]
        ),
    )
    nn_ref = ray.put({int(k): v for k, v in nkey_to_name.items()})
    joined = joined.map_batches(
        lambda df: df[df["cust_nation"] == df["supp_nation"]].assign(
            n_name=lambda d: d["cust_nation"].map(ray.get(nn_ref))
        )[["n_name", "rev"]],
        batch_format="pandas",
    )
    out = pre_aggregate(joined, ["n_name"], {"revenue": ("rev", "sum")})
    out["revenue"] = sql_round(out["revenue"], 4)
    return out


_Q5_SQL = """
SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    ds = read_table(
        sf_dir, "lineitem", columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"]
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev": rev})

    total = ds.map_batches(prep, batch_format="pyarrow").sum("rev")
    return pd.DataFrame({"revenue": [sql_round(float(total or 0.0), 4)]})


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q4_late_shipments(sf_dir: str) -> pd.DataFrame:
    """TPC-H q4 adapted to the trimmed schema: orders placed in 1996-Q3
    with at least one line shipped >60 days after the order date, counted
    per priority. The quarter's orders hash-join the lineitem fact table
    (orders scale with the corpus — no driver-side date dict, r1 verdict
    "what's wrong" #7); the EXISTS collapses to a distinct on
    (orderkey, priority) before a tiny per-priority aggregate."""
    lo = pa.scalar(np.datetime64("1996-07-01", "us"))
    hi = pa.scalar(np.datetime64("1996-10-01", "us"))
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ).rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    joined = hash_join(
        li,
        orders,
        on="l_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_shipdate", pa.timestamp("us"))]
        ),
        right_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    late = joined.map_batches(
        lambda df: df.loc[
            df["l_shipdate"] > df["o_orderdate"] + pd.Timedelta(days=60),
            ["l_orderkey", "o_orderpriority"],
        ].drop_duplicates(),
        batch_format="pandas",
    )
    from .relational import bucketed_groupby_apply

    late_orders = bucketed_groupby_apply(
        late, "l_orderkey", lambda g: g.drop_duplicates(["l_orderkey"])
    )
    out = pre_aggregate(
        late_orders, ["o_orderpriority"], {"order_count": (None, "count")}
    )
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """Top 20 customers by revenue on returned items ('R' flag)."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    li = li.map_batches(prep, batch_format="pyarrow")
    # orders is a fact table: hash join, never a driver-side broadcast
    # dict (r1 verdict "what's wrong" #1)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda df: df.rename(
            columns={"o_orderkey": "l_orderkey", "o_custkey": "c_custkey"}
        ),
        batch_format="pandas",
    )
    joined = hash_join(
        li,
        orders,
        on="l_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())]),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("c_custkey", pa.int64())]
        ),
    )
    agg = pre_aggregate_ds(joined, ["c_custkey"], {"revenue": ("rev", "sum")})
    top = (
        agg.map_batches(
            lambda df: df.assign(revenue=sql_round(df["revenue"], 4)),
            batch_format="pandas",
        )
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    # names only for the 20 winners: broadcast the tiny key set and scan
    keys_ref = ray.put(set(top["c_custkey"].astype(int)))
    names = (
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(
            lambda df: df[df["c_custkey"].isin(ray.get(keys_ref))],
            batch_format="pandas",
        )
        .to_pandas()
    )
    top = top.merge(names, on="c_custkey")
    top["c_custkey"] = top["c_custkey"].astype("int64")
    top = top.sort_values(["revenue", "c_custkey"], ascending=[False, True])
    return top[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


_Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
"""


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """Promo-type revenue share over a ship-month. part grows with scale
    factor, so the promo flag attaches via the bucketed hash join; only
    the two partial sums reach the driver."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_partkey": df["p_partkey"],
                "promo": df["p_type"].str.startswith("PROMO"),
            }
        ),
        batch_format="pandas",
    )
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "l_partkey": df["l_partkey"],
                "rev": df["l_extendedprice"] * (1 - df["l_discount"]),
            }
        )[
            (df["l_shipdate"] >= pd.Timestamp("1996-03-01")).values
            & (df["l_shipdate"] < pd.Timestamp("1996-04-01")).values
        ],
        batch_format="pandas",
    )
    joined = hash_join(
        li,
        part,
        on="l_partkey",
        left_schema=pa.schema([("l_partkey", pa.int64()), ("rev", pa.float64())]),
        right_schema=pa.schema([("l_partkey", pa.int64()), ("promo", pa.bool_())]),
    )
    parts = joined.map_batches(
        lambda df: pd.DataFrame(
            {
                "promo_rev": [float(df.loc[df["promo"], "rev"].sum())],
                "total_rev": [float(df["rev"].sum())],
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    promo_rev, total = parts["promo_rev"].sum(), parts["total_rev"].sum()
    return pd.DataFrame(
        {"promo_revenue_pct": [sql_round(100.0 * promo_rev / total, 4) if total else 0.0]}
    )


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """Orders whose total quantity exceeds 250. The per-order aggregate
    (corpus-cardinality) stays a Dataset, the HAVING filter runs
    map-side, and the orders fact table joins via the bucketed hash join
    — nothing corpus-sized touches the driver before the final result."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    per_order = pre_aggregate_ds(
        li, ["l_orderkey"], {"total_qty": ("l_quantity", "sum")}
    )
    big = per_order.map_batches(
        lambda df: df[df["total_qty"] > 250.0], batch_format="pandas"
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )
    joined = hash_join(
        big,
        orders,
        on="l_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("total_qty", pa.float64())]
        ),
        right_schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_totalprice", pa.float64()),
            ]
        ),
    ).map_batches(
        lambda df: df.assign(total_qty=sql_round(df["total_qty"], 4)),
        batch_format="pandas",
    )
    out = joined.sort(["total_qty", "l_orderkey"], descending=[True, False]).to_pandas()
    return out[["l_orderkey", "o_custkey", "o_totalprice", "total_qty"]].reset_index(
        drop=True
    )


_Q18_SQL = """
SELECT l.l_orderkey, o.o_custkey, o.o_totalprice,
       round(sum(l.l_quantity), 4) AS total_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_orderkey, o.o_custkey, o.o_totalprice
HAVING sum(l.l_quantity) > 250
ORDER BY total_qty DESC, l.l_orderkey
"""


def asof_last_order(sf_dir: str) -> pd.DataFrame:
    """As-of join (custom operator — Ray Data has no asof): each event is
    matched to the user's most recent order at or before the event time."""
    from .relational import asof_join

    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    # one row per (user, date): keep max orderkey so the match is unique —
    # the aggregate STAYS a Dataset feeding the asof join directly (no
    # driver round-trip, r1 verdict "what's wrong" #3)
    right = pre_aggregate_ds(
        orders.map_batches(
            lambda df: df.rename(columns={"o_custkey": "user_id"}),
            batch_format="pandas",
        ),
        ["user_id", "o_orderdate"],
        {"o_orderkey": ("o_orderkey", "max")},
    )
    joined = asof_join(
        events,
        right,
        by="user_id",
        left_on="ts",
        right_on="o_orderdate",
        right_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderkey", pa.float64()),
            ]
        ),
    )
    out = joined.map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "last_orderkey": df["o_orderkey"].fillna(-1).astype("int64"),
            }
        ),
        batch_format="pandas",
    ).sort("event_id").to_pandas()
    return out.reset_index(drop=True)


_ASOF_SQL = """
WITH o2 AS (
  SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, coalesce(o2.o_orderkey, -1) AS last_orderkey
FROM events e ASOF LEFT JOIN o2
  ON e.user_id = o2.user_id AND e.ts >= o2.o_orderdate
ORDER BY e.event_id
"""


def range_join_events(sf_dir: str) -> pd.DataFrame:
    """Range join (custom operator): per click event, how many purchases
    the same user made within the following hour."""
    from .relational import range_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    clicks = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], pa.scalar("click"))).drop_columns(
            ["event_type"]
        ),
        batch_format="pyarrow",
    )
    purchases = ev.map_batches(
        lambda df: df[df["event_type"] == "purchase"].rename(
            columns={"event_id": "p_event_id", "ts": "p_ts"}
        )[["p_event_id", "user_id", "p_ts"]],
        batch_format="pandas",
    )
    matched = range_join(
        clicks,
        purchases,
        by="user_id",
        left_on="ts",
        right_on="p_ts",
        lower=pd.Timedelta(seconds=0),
        upper=pd.Timedelta(hours=1),
    )
    # per-click counts stay a Dataset; the zero-purchase backfill is a
    # distributed LEFT hash join against the click ids (no driver-side
    # to_pandas of the fact table, r1 verdict "what's wrong" #3)
    counts = pre_aggregate_ds(matched, ["event_id"], {"n_purchases": (None, "count")})
    click_ids = clicks.map_batches(
        lambda t: pa.table({"event_id": t["event_id"]}), batch_format="pyarrow"
    )
    out = hash_join(
        click_ids,
        counts,
        on="event_id",
        how="left",
        left_schema=pa.schema([("event_id", pa.int64())]),
        right_schema=pa.schema(
            [("event_id", pa.int64()), ("n_purchases", pa.int64())]
        ),
    )
    out = out.map_batches(
        lambda df: pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "n_purchases": df["n_purchases"].fillna(0).astype("int64"),
            }
        ),
        batch_format="pandas",
    ).sort("event_id").to_pandas()
    return out.reset_index(drop=True)


_RANGE_JOIN_SQL = """
SELECT c.event_id, count(p.event_id) AS n_purchases
FROM events c LEFT JOIN events p
  ON p.user_id = c.user_id AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
WHERE c.event_type = 'click'
GROUP BY c.event_id
ORDER BY c.event_id
"""


def filter_project_events(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"])

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], pa.scalar("click")))
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value2": pa.array(
                    sql_round(
                        pc.multiply(t["value"], pa.scalar(2.0)).to_numpy(
                            zero_copy_only=False
                        ),
                        4,
                    ),
                    pa.float64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_FILTER_PROJECT_SQL = """
SELECT event_id, user_id, round(value * 2, 4) AS value2
FROM events WHERE event_type = 'click'
"""


def range_scan_events(sf_dir: str) -> pd.DataFrame:
    """Sort-clustered storage + zone-map range read: events are written
    ONCE as a value-sorted Parquet layout
    (:func:`kgraft.io.write_sorted` — Parquet footer stats are the zone
    maps), then the [50, 150] value window is answered by
    :func:`kgraft.io.range_scan`, which reads ONLY the overlapping
    files plus an exact map-side residual filter. The oracle proves the
    pruned read returns exactly the predicate's rows; the
    pruning-effectiveness pytest lives in tests/test_io.py. Per-type
    count/mean over the window."""
    from .io import range_scan, write_sorted

    layout = _scratch_layout(sf_dir, "events_value")
    write_sorted(
        read_table(sf_dir, "events", columns=["event_type", "value"]),
        layout,
        "value",
    )
    win = range_scan(layout, 50.0, 150.0)
    out = pre_aggregate(
        win, ["event_type"], {"n": (None, "count"), "mean_value": ("value", "mean")}
    )
    out["n"] = out["n"].astype("int64")
    out["mean_value"] = sql_round(out["mean_value"], 4)
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "n", "mean_value"]
    ]


_RANGE_SCAN_EVENTS_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 4) AS mean_value
FROM events WHERE value >= 50.0 AND value <= 150.0
GROUP BY event_type ORDER BY event_type
"""


def zorder_scan_events(sf_dir: str) -> pd.DataFrame:
    """Z-ORDER-clustered storage + 2-D zone-map read: events are written
    ONCE sorted by the Morton interleave of (user_id, value)
    (:func:`kgraft.io.write_zorder` — every file covers a small
    rectangle, so BOTH columns' footer stats prune), then the
    user_id in [2, 9] x value in [20, 80] box is answered by
    :func:`kgraft.io.zorder_scan` reading only the overlapping files
    plus an exact residual filter. The oracle proves the pruned 2-D
    read returns exactly the predicate's rows; pruning effectiveness
    is asserted in tests/test_io.py. Per-type count/mean over the box."""
    from .io import write_zorder, zorder_scan

    layout = (
        _scratch_layout(sf_dir, "events_zorder")
    )
    write_zorder(
        read_table(sf_dir, "events", columns=["event_type", "user_id", "value"]),
        layout,
        on=("user_id", "value"),
    )
    win, _kept, _total = zorder_scan(
        layout,
        {"user_id": (2, 9), "value": (20.0, 80.0)},
        columns=["event_type", "value"],
    )
    out = pre_aggregate(
        win, ["event_type"], {"n": (None, "count"), "mean_value": ("value", "mean")}
    )
    out["n"] = out["n"].astype("int64")
    out["mean_value"] = sql_round(out["mean_value"], 4)
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "n", "mean_value"]
    ]


_ZORDER_SCAN_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(avg(value), 4) AS mean_value
FROM events
WHERE user_id BETWEEN 2 AND 9 AND value >= 20.0 AND value <= 80.0
GROUP BY event_type ORDER BY event_type
"""


def ab_test_events(sf_dir: str) -> pd.DataFrame:
    """Welch two-sample t-test on the engine: does the 'click' cohort's
    value differ from the 'view' cohort's? t statistic +
    Welch-Satterthwaite dof from the SAME algebraic moment partials the
    var aggregate uses (sum, sum-of-squares, non-null count per
    cohort) — ONE map-side-combined grouped aggregate, two rows reach
    the driver, formula math at group scale. The experimentation-
    readout shape every event pipeline ends in."""
    ev = read_table(sf_dir, "events", columns=["event_type", "value"]).map_batches(
        lambda df: df[df["event_type"].isin(["view", "click"])],
        batch_format="pandas",
    )
    g = pre_aggregate(
        ev,
        ["event_type"],
        {"n": (None, "count"), "mean": ("value", "mean"), "var": ("value", "var")},
    ).set_index("event_type")
    n1, m1, v1 = (float(g.loc["view", c]) for c in ("n", "mean", "var"))
    n2, m2, v2 = (float(g.loc["click", c]) for c in ("n", "mean", "var"))
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / np.sqrt(se2)
    df_w = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    return pd.DataFrame(
        {
            "mean_view": [sql_round(m1, 4)],
            "mean_click": [sql_round(m2, 4)],
            "t_stat": [sql_round(float(t), 4)],
            "dof": [sql_round(float(df_w), 2)],
        }
    )


_AB_TEST_SQL = """
WITH s AS (
  SELECT event_type, count(value) AS n, avg(value) AS m, var_samp(value) AS v
  FROM events WHERE event_type IN ('view', 'click') GROUP BY event_type
),
a AS (SELECT n, m, v FROM s WHERE event_type = 'view'),
b AS (SELECT n, m, v FROM s WHERE event_type = 'click')
SELECT round(a.m, 4) AS mean_view,
       round(b.m, 4) AS mean_click,
       round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
       round(pow(a.v / a.n + b.v / b.n, 2)
             / (pow(a.v / a.n, 2) / (a.n - 1) + pow(b.v / b.n, 2) / (b.n - 1)),
             2) AS dof
FROM a, b
"""


def user_active_coverage(sf_dir: str) -> pd.DataFrame:
    """Interval-union sweep: each event opens a 5-minute activity
    window; a user's ACTIVE TIME is the union length of their
    (overlapping) windows — the classic gaps-and-islands shape that
    plain sums over-count. One user-keyed bucketed exchange; in-bucket
    the merge is vectorized (per-user cummax of window ends, island
    boundaries where a window starts past the running max, per-island
    span sum). INTEGER microsecond arithmetic end to end so the SQL
    islands twin matches bit-exactly. Top-10 users by covered
    seconds."""
    from .relational import bucketed_groupby_apply

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    win_us = 300_000_000  # 5 minutes

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "covered_sec": pd.Series([], dtype="int64"),
                }
            )
        d = pd.DataFrame(
            {
                "u": g["user_id"].to_numpy(dtype=np.int64),
                "s": g["ts"].to_numpy(dtype="datetime64[us]").view("int64"),
            }
        )
        d["e"] = d["s"] + win_us
        d = d.sort_values(["u", "s", "e"], kind="mergesort", ignore_index=True)
        gb = d.groupby("u", sort=False)
        prev_e = gb["e"].cummax().shift()
        first = gb.cumcount() == 0
        new_island = first | (d["s"] > prev_e)
        d["isl"] = new_island.cumsum()
        spans = d.groupby(["u", "isl"], sort=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        cov = (spans["e"] - spans["s"]).groupby(level=0).sum()
        return pd.DataFrame(
            {
                "user_id": cov.index.to_numpy(dtype=np.int64),
                "covered_sec": (cov.to_numpy(dtype=np.int64) // 1_000_000),
            }
        )

    out = bucketed_groupby_apply(ev, "user_id", cover, num_buckets=32).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["covered_sec"] = out["covered_sec"].astype("int64")
    return out.sort_values(
        ["covered_sec", "user_id"], ascending=[False, True], ignore_index=True
    ).head(10)


_USER_ACTIVE_COVERAGE_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e FROM events
),
o AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
  FROM iv
),
g AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_e IS NULL OR s > prev_e THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS isl
  FROM o
),
sp AS (
  SELECT user_id, isl, max(e) - min(s) AS span_us
  FROM g GROUP BY user_id, isl
)
SELECT user_id, CAST(sum(span_us) // 1000000 AS BIGINT) AS covered_sec
FROM sp GROUP BY user_id
ORDER BY covered_sec DESC, user_id LIMIT 10
"""


def psi_event_drift(sf_dir: str) -> pd.DataFrame:
    """Population-stability-index drift monitor: per event type, PSI of
    the value distribution between the first and second half of the
    month (fixed split 2024-01-16, 10 fixed-width buckets of 50,
    add-one smoothing) — the standard production check that a feature's
    distribution hasn't shifted between snapshots (PSI > 0.2 = alarm).
    Realization: ONE map-side-combined grouped count on
    (type, half, bucket) — the exchanged table is
    types x 2 x 10 rows — then group-scale PSI math on the driver.
    Types missing a half are dropped (inner semantics, same as the
    SQL twin)."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    split = pd.Timestamp("2024-01-16")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "half": (df["ts"] >= split).astype("int64"),
                "bucket": np.floor(
                    df["value"].to_numpy(dtype=np.float64) / 50.0
                ).astype("int64"),
            }
        )

    counts = pre_aggregate(
        ev.map_batches(bucketize, batch_format="pandas"),
        ["event_type", "half", "bucket"],
        {"n": (None, "count")},
    )
    out = []
    for et, g in counts.groupby("event_type"):
        halves = {}
        for h in (0, 1):
            gh = g[g["half"] == h]
            if gh.empty:
                break
            # total over ALL buckets, grid restricted to 0..9 — same
            # semantics as the SQL twin's tot/grid split, so an
            # out-of-grid value (>=500) shifts mass identically
            dense = np.zeros(10, dtype=np.float64)
            bk = gh["bucket"].to_numpy(dtype=np.int64)
            nn = gh["n"].to_numpy(dtype=np.float64)
            m = (bk >= 0) & (bk < 10)
            dense[bk[m]] = nn[m]
            halves[h] = (dense + 1.0) / (nn.sum() + 10.0)
        if len(halves) < 2:
            continue
        p, q = halves[0], halves[1]
        out.append(
            {"event_type": et, "psi": sql_round(float(np.sum((p - q) * np.log(p / q))), 6)}
        )
    return pd.DataFrame(out, columns=["event_type", "psi"]).sort_values(
        "event_type", ignore_index=True
    )


_PSI_EVENT_DRIFT_SQL = """
WITH b AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half,
         CAST(floor(value / 50.0) AS BIGINT) AS bucket
  FROM events
),
c AS (SELECT event_type, half, bucket, count(*) AS n FROM b GROUP BY 1, 2, 3),
tot AS (SELECT event_type, half, sum(n) AS tot FROM c GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT bucket FROM range(10) r(bucket)) g
),
pq AS (
  SELECT grid.event_type,
         (COALESCE(c0.n, 0) + 1.0) / (t0.tot + 10.0) AS p,
         (COALESCE(c1.n, 0) + 1.0) / (t1.tot + 10.0) AS q
  FROM grid
  LEFT JOIN c c0 ON c0.event_type = grid.event_type
                AND c0.bucket = grid.bucket AND c0.half = 0
  LEFT JOIN c c1 ON c1.event_type = grid.event_type
                AND c1.bucket = grid.bucket AND c1.half = 1
  JOIN tot t0 ON t0.event_type = grid.event_type AND t0.half = 0
  JOIN tot t1 ON t1.event_type = grid.event_type AND t1.half = 1
)
SELECT event_type, round(sum((p - q) * ln(p / q)), 6) AS psi
FROM pq GROUP BY event_type ORDER BY event_type
"""


def topk_users_by_value(sf_dir: str) -> pd.DataFrame:
    """Per-user aggregate stays a Dataset; distributed top-k cuts to 20."""
    ds = read_table(sf_dir, "events", columns=["user_id", "value"])
    agg = pre_aggregate_ds(ds, ["user_id"], {"total_value": ("value", "sum")})
    out = (
        agg.map_batches(
            lambda df: df.assign(total_value=sql_round(df["total_value"], 4)),
            batch_format="pandas",
        )
        .sort(["total_value", "user_id"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    return out[["user_id", "total_value"]].reset_index(drop=True)


_TOPK_USERS_SQL = """
SELECT user_id, round(sum(value), 4) AS total_value
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 20
"""


def distinct_mktsegment(sf_dir: str):
    return distinct(read_table(sf_dir, "customer", columns=["c_mktsegment"]), "c_mktsegment")


_DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def union_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
    hi = ds.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t.filter(pc.greater(t["o_totalprice"], pa.scalar(400000.0)))["o_orderkey"]}
        ),
        batch_format="pyarrow",
    )
    urgent = ds.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.filter(
                    pc.equal(t["o_orderpriority"], pa.scalar("1-URGENT"))
                )["o_orderkey"]
            }
        ),
        batch_format="pyarrow",
    )
    return hi.union(urgent)


_UNION_SQL = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
UNION ALL
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def join_customer_orders(sf_dir: str) -> pd.DataFrame:
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        lambda df: df.rename(columns={"o_custkey": "c_custkey"}), batch_format="pandas"
    )
    joined = hash_join(orders, cust, on="c_custkey")
    out = pre_aggregate(
        joined,
        ["c_custkey", "c_name"],
        {"n_orders": (None, "count"), "total_spent": ("o_totalprice", "sum")},
    )
    out["total_spent"] = sql_round(out["total_spent"], 4)
    return out


_JOIN_CUST_SQL = """
SELECT c.c_custkey, c.c_name, count(*) AS n_orders,
       round(sum(o.o_totalprice), 4) AS total_spent
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
"""


def customers_per_nation(sf_dir: str) -> pd.DataFrame:
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nation = nation.rename(columns={"n_nationkey": "c_nationkey"})
    cust = read_table(sf_dir, "customer", columns=["c_nationkey"])
    joined = broadcast_join(cust, nation, on="c_nationkey")
    return pre_aggregate(joined, ["n_name"], {"n_customers": (None, "count")})


_CUST_PER_NATION_SQL = """
SELECT n.n_name, count(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def customers_without_big_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join, distributed: customers with no order > 300k. The
    big-order key set scales with the corpus, so instead of a broadcast
    key set (the bounded-side-only pattern of :func:`semi_anti_join`)
    this uses a LEFT hash join against the distinct flagged keys and
    keeps the unmatched rows."""
    big = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big_keys = (
        big.map_batches(
            lambda t: pa.table(
                {
                    "c_custkey": t.filter(
                        pc.greater(t["o_totalprice"], pa.scalar(300000.0))
                    )["o_custkey"]
                }
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda df: df.drop_duplicates().assign(flag=np.int64(1)),
            batch_format="pandas",
        )
    )
    # no global distinct needed: duplicate flagged keys only duplicate
    # rows that the flag-isna filter drops anyway (map-side
    # drop_duplicates above bounds the inflation)
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    joined = hash_join(
        cust,
        big_keys,
        on="c_custkey",
        how="left",
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("flag", pa.int64())]),
    )
    out = (
        joined.map_batches(
            lambda df: df.loc[df["flag"].isna(), ["c_custkey"]],
            batch_format="pandas",
        )
        .to_pandas()
    )
    if "c_custkey" not in out.columns or not len(out):
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


_NO_BIG_ORDERS_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def hourly_event_stats(sf_dir: str) -> pd.DataFrame:
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].astype("int64") // 1_000_000
        df = df.copy()
        df["hour_epoch"] = (epoch // 3600) * 3600
        return df[["hour_epoch", "event_type", "value"]]

    ds = ds.map_batches(add_hour, batch_format="pandas")
    out = pre_aggregate(
        ds,
        ["hour_epoch", "event_type"],
        {"n_events": (None, "count"), "total_value": ("value", "sum")},
    )
    out["total_value"] = sql_round(out["total_value"], 4)
    return out


_HOURLY_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
"""


def hopping_event_stats(sf_dir: str) -> pd.DataFrame:
    """1-hour windows hopping every 30 min over the event stream
    (overlapping twin of ``hourly_event_stats``): each event counts in
    exactly two windows. See :func:`kgraft.streamops.hopping_window`
    for the scale shape."""
    from .streamops import hopping_window

    ds = read_table(sf_dir, "events", columns=["ts", "value"])
    out = hopping_window(
        ds,
        "ts",
        width_s=3600,
        hop_s=1800,
        aggs={"n_events": (None, "count"), "total_value": ("value", "sum")},
    ).to_pandas()
    out["total_value"] = sql_round(out["total_value"], 4)
    return out.sort_values("window_start", ignore_index=True)


_HOPPING_SQL = """
SELECT window_start, count(*) AS n_events, round(sum(value), 4) AS total_value
FROM (
  SELECT unnest([
           (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800,
           (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800
         ]) AS window_start,
         value
  FROM events
)
GROUP BY window_start
ORDER BY window_start
"""


def user_sessions(sf_dir: str) -> pd.DataFrame:
    """Sessionization: 30-min-gap sessions per user. One bucketed shuffle
    co-locates each user's events; inside a bucket the whole gap
    computation is vectorized (sort + groupby-diff — no per-user Python
    dispatch, which matters when users number in the millions)."""
    from .relational import bucketed_groupby_apply

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        starts = gaps.isna() | (gaps > 1800)
        out = (
            starts.groupby(g["user_id"], sort=False)
            .sum()
            .rename("n_sessions")
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    out = bucketed_groupby_apply(ds, "user_id", sessions_bucket).to_pandas()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out


_SESSIONS_SQL = """
SELECT user_id, count(*) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
) WHERE is_start = 1 GROUP BY user_id
"""


def session_stats(sf_dir: str) -> pd.DataFrame:
    """Per-session aggregate rows (30-min-gap sessionization, one row
    per session with span/size/value) — the materialized-session twin
    of ``user_sessions``'s count-only output. One bucketed shuffle
    co-locates each user's events; gap flags, session ids (cumsum) and
    the per-session aggregate are all vectorized in-bucket. Ties in
    ``ts`` break by ``event_id`` on both sides."""
    from .relational import bucketed_groupby_apply

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"]
    )

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        starts = gaps.isna() | (gaps > 1800)
        g = g.assign(__sid=starts.groupby(g["user_id"], sort=False).cumsum())
        out = g.groupby(["user_id", "__sid"], sort=False, as_index=False).agg(
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            n_events=("event_id", "count"),
            total_value=("value", "sum"),
        )
        out = out.rename(columns={"__sid": "session_idx"})
        out["session_idx"] = out["session_idx"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["total_value"] = sql_round(out["total_value"], 4)
        return out

    out = bucketed_groupby_apply(ds, "user_id", sessions_bucket).to_pandas()
    out["session_idx"] = out["session_idx"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(
        ["user_id", "session_idx"], ignore_index=True
    )[["user_id", "session_idx", "start_ts", "end_ts", "n_events", "total_value"]]


_SESSION_STATS_SQL = """
WITH s AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, ts, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
       min(ts) AS start_ts, max(ts) AS end_ts,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_idx
"""


def rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM customer segmentation: per user recency (last event time),
    frequency (event count) and monetary (value sum) each quartiled by
    the engine's ties-share-buckets quantile binning, then users counted
    per (r, f, m) cell — the classic marketing composition proving
    aggregate -> repeated quantile_bucketize chaining. Monetary rounds
    to 4 decimals BEFORE binning on both sides (float sum order must
    not flip a cut comparison)."""
    from .relational import pre_aggregate, pre_aggregate_ds, quantile_bucketize

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def to_epoch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "ts_epoch": df["ts"].astype("int64") // 1_000_000,
                "value": df["value"],
            }
        )

    pu = pre_aggregate_ds(
        ev.map_batches(to_epoch, batch_format="pandas"),
        ["user_id"],
        {
            "last_ts": ("ts_epoch", "max"),
            "freq": (None, "count"),
            "mon": ("value", "sum"),
        },
    ).map_batches(
        lambda df: df.assign(mon=sql_round(df["mon"], 4)), batch_format="pandas"
    )

    def renamed(ds, old: str, new: str):
        return ds.map_batches(
            lambda df: df.rename(columns={old: new}), batch_format="pandas"
        )

    b = renamed(
        quantile_bucketize(pu, "last_ts", 4, ["user_id", "freq", "mon"]),
        "bucket",
        "r_score",
    )
    b = renamed(
        quantile_bucketize(b, "freq", 4, ["user_id", "mon", "r_score"]),
        "bucket",
        "f_score",
    )
    b = renamed(
        quantile_bucketize(b, "mon", 4, ["user_id", "r_score", "f_score"]),
        "bucket",
        "m_score",
    )
    out = pre_aggregate(
        b, ["r_score", "f_score", "m_score"], {"n_users": (None, "count")}
    )
    for c in ("r_score", "f_score", "m_score", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["r_score", "f_score", "m_score"], ignore_index=True
    )


_RFM_SQL = """
WITH pu AS (
  SELECT user_id,
         CAST(epoch(max(ts)) AS BIGINT) AS last_ts,
         count(*) AS freq,
         round(sum(value), 4) AS mon
  FROM events GROUP BY 1
), c AS (
  SELECT quantile_disc(last_ts, [0.25, 0.5, 0.75]) AS cr,
         quantile_disc(freq, [0.25, 0.5, 0.75]) AS cf,
         quantile_disc(mon, [0.25, 0.5, 0.75]) AS cm
  FROM pu
)
SELECT CAST(1 + len(list_filter(cr, x -> last_ts > x)) AS BIGINT) AS r_score,
       CAST(1 + len(list_filter(cf, x -> freq > x)) AS BIGINT) AS f_score,
       CAST(1 + len(list_filter(cm, x -> mon > x)) AS BIGINT) AS m_score,
       CAST(count(*) AS BIGINT) AS n_users
FROM pu, c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def event_type_islands(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands: maximal runs of consecutive SAME-TYPE events
    per user -> one row per island with its span and length — the
    classic warehouse sequence shape (SQL solves it with the
    row_number-difference trick; see the oracle).

    Realization: ONE bucketed shuffle co-locates each user's events;
    inside a bucket the segmentation is a vectorized sort +
    change-flag cumsum + groupby — no per-user Python. Ties in ``ts``
    are broken by ``event_id`` on BOTH sides, so island boundaries are
    deterministic."""
    from .relational import bucketed_groupby_apply

    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def islands_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        change = g["user_id"].ne(g["user_id"].shift()) | g["event_type"].ne(
            g["event_type"].shift()
        )
        out = (
            g.groupby(change.cumsum(), sort=False)
            .agg(
                user_id=("user_id", "first"),
                event_type=("event_type", "first"),
                start_ts=("ts", "min"),
                end_ts=("ts", "max"),
                n_events=("event_id", "count"),
            )
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = bucketed_groupby_apply(ds, "user_id", islands_bucket).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(
        ["user_id", "start_ts", "event_type"], ignore_index=True
    )


_ISLANDS_SQL = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events
)
SELECT user_id, event_type, min(ts) AS start_ts, max(ts) AS end_ts,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, event_type, rn - rnt
ORDER BY user_id, start_ts, event_type
"""


def monthly_revenue_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue growth: the aggregate -> ordered-window
    composition (sum per month, then LAG percent change). The corpus
    aggregate is partial-combined and distributed; the LAG runs on the
    month-cardinality series (driver-bounded by the calendar, not the
    corpus)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def add_month(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "month_epoch": df["o_orderdate"]
                .dt.to_period("M")
                .dt.to_timestamp()
                .astype("int64")
                // 1_000_000_000,
                "o_totalprice": df["o_totalprice"],
            }
        )

    out = pre_aggregate(
        ds.map_batches(add_month, batch_format="pandas"),
        ["month_epoch"],
        {"revenue": ("o_totalprice", "sum")},
    ).sort_values("month_epoch", ignore_index=True)
    prev = out["revenue"].shift()
    out["growth_pct"] = (
        sql_round(((out["revenue"] - prev) / prev * 100), 4).fillna(0.0)
    )
    out["month_epoch"] = out["month_epoch"].astype("int64")
    out["revenue"] = sql_round(out["revenue"], 4)
    return out


_MONTHLY_GROWTH_SQL = """
WITH m AS (
  SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_epoch,
         sum(o_totalprice) AS raw_rev
  FROM orders GROUP BY 1
)
SELECT month_epoch, round(raw_rev, 4) AS revenue,
       coalesce(round((raw_rev - lag(raw_rev) OVER (ORDER BY month_epoch))
                      / lag(raw_rev) OVER (ORDER BY month_epoch) * 100, 4),
                0) AS growth_pct
FROM m ORDER BY month_epoch
"""


def pairwise_agreement_events(sf_dir: str) -> pd.DataFrame:
    """Pairwise clustering-agreement metrics (pair P/R/F1 + Adjusted
    Rand Index) between the event-type partition and the day-of-week
    partition of the events table — the entity-resolution eval shape
    (:func:`kgraft.relational.clustering_pairwise`) with a full DuckDB
    combinatorics twin; near-zero ARI expected (type is independent of
    weekday), which is exactly what the oracle certifies."""
    from .relational import clustering_pairwise

    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pred": df["event_type"],
                "gold": (df["ts"].dt.dayofweek.astype("int64") + 1),
            }
        )

    return clustering_pairwise(
        ds.map_batches(lab, batch_format="pandas"), "pred", "gold"
    )


_PAIRWISE_AGREEMENT_SQL = """
WITH base AS (
  SELECT event_type AS pred, CAST(isodow(ts) AS BIGINT) AS gold FROM events
), cells AS (
  SELECT pred, gold, count(*) AS c FROM base GROUP BY 1, 2
), tot AS (
  SELECT sum(c * (c - 1) / 2.0) AS tp, sum(c) AS n FROM cells
), pm AS (
  SELECT sum(s * (s - 1) / 2.0) AS pp
  FROM (SELECT sum(c) AS s FROM cells GROUP BY pred)
), gm AS (
  SELECT sum(s * (s - 1) / 2.0) AS gp
  FROM (SELECT sum(c) AS s FROM cells GROUP BY gold)
)
SELECT CAST(n AS BIGINT) AS n_items,
       round(tp / pp, 6) AS pair_precision,
       round(tp / gp, 6) AS pair_recall,
       round(2 * (tp / pp) * (tp / gp) / (tp / pp + tp / gp), 6) AS pair_f1,
       round((tp - pp * gp / (n * (n - 1) / 2.0))
             / ((pp + gp) / 2.0 - pp * gp / (n * (n - 1) / 2.0)), 6) AS ari
FROM tot, pm, gm
"""


def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Event-type transition matrix (sequence mining): per
    (prev_type, next_type), how many consecutive same-user event pairs
    — the Markov-chain input of funnel/recommendation analyses.

    One bucketed shuffle co-locates each user's events; inside a bucket
    the whole sequence step is a vectorized sort + groupby shift, and
    each bucket emits only type^2-bounded partial counts (users are
    hash-partitioned, so bucket counts are disjoint and sum exactly)."""
    from .relational import bucketed_groupby_apply, pre_aggregate_ds

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
        d = pd.DataFrame({"prev_type": prev, "next_type": g["event_type"]}).dropna()
        return (
            d.groupby(["prev_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    parts = bucketed_groupby_apply(ds, "user_id", per_bucket)
    out = (
        pre_aggregate_ds(parts, ["prev_type", "next_type"], {"n": ("n", "sum")})
        .to_pandas()  # type^2-bounded transition matrix
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def user_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Retention cohort matrix: users grouped by first-seen day
    (cohort), counted once per day they were active — the
    growth-analytics staple. Days are epoch-day ints (exact compare).

    One bucketed shuffle on user_id; per bucket the cohort assignment
    is a vectorized transform('min') and output is day^2-bounded
    partial counts (disjoint users per bucket — counts sum exactly)."""
    from .relational import bucketed_groupby_apply, pre_aggregate_ds

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("int64") // (86_400 * 1_000_000)
        return pd.DataFrame({"user_id": df["user_id"], "day": day})

    days = ds.map_batches(add_day, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id", sort=False)["day"].transform("min")
        d = pd.DataFrame({"cohort_day": first, "active_day": g["day"]})
        return (
            d.groupby(["cohort_day", "active_day"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )

    parts = bucketed_groupby_apply(days, "user_id", per_bucket)
    out = (
        pre_aggregate_ds(
            parts, ["cohort_day", "active_day"], {"n_users": ("n_users", "sum")}
        )
        .to_pandas()  # day^2-bounded cohort matrix
        .sort_values(["cohort_day", "active_day"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_RETENTION_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
  FROM events
),
firsts AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
SELECT f.cohort_day, d.day AS active_day, CAST(count(*) AS BIGINT) AS n_users
FROM days d JOIN firsts f ON d.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def event_value_time_window(sf_dir: str):
    """Trailing 30-minute time-RANGE window per user over the event
    stream: per event, the sum and count of ``value`` in the user's
    last half hour — the rate/velocity feature a fraud or engagement
    pipeline computes. See :func:`kgraft.relational.time_windowed` for
    the one-exchange vectorized realization."""
    from .relational import time_windowed

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = time_windowed(ds, "user_id", "ts", "value", "30min", ["sum", "count"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "w_sum": sql_round(df["w_sum"], 4),
                "w_cnt": df["w_count"].astype("int64"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


_TIME_WINDOW_SQL = """
SELECT event_id,
       round(sum(value) OVER w, 4) AS w_sum,
       CAST(count(value) OVER w AS BIGINT) AS w_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
"""


def user_event_windows(sf_dir: str):
    """Partitioned window functions over the click stream: per user,
    ordered by (ts, event_id) — row_number, lag(value), running sum,
    3-row rolling mean. One bucketed shuffle on user_id; everything
    inside a bucket is a vectorized pandas groupby transform."""
    from .relational import windowed

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    clicks = ds.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id", "value"]
    )
    win = windowed(
        clicks,
        part_keys="user_id",
        order_keys=["ts", "event_id"],
        specs={
            "rn": ("row_number", None),
            "prev_value": ("lag", "value", 1),
            "run_value": ("cumsum", "value"),
            "avg3": ("rolling_mean", "value", 3),
        },
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("prev_value", "run_value", "avg3"):
            df[c] = sql_round(df[c], 4)
        return df[["event_id", "user_id", "rn", "prev_value", "run_value", "avg3"]]

    return win.map_batches(fin, batch_format="pandas").sort("event_id").to_pandas()


_WINDOWS_SQL = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       round(coalesce(lag(value) OVER w, 0.0), 4) AS prev_value,
       round(sum(value) OVER (w ROWS UNBOUNDED PRECEDING), 4) AS run_value,
       round(avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
FROM events
WHERE event_type = 'click'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def user_value_extrema(sf_dir: str) -> pd.DataFrame:
    """FIRST_VALUE / LAST_VALUE / rolling-frame MIN-MAX window kinds:
    per user ordered by (ts, event_id) — session-start value, final
    value, and the 3-row running extremes of the click stream."""
    from .relational import windowed

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    win = windowed(
        ds,
        part_keys="user_id",
        order_keys=["ts", "event_id"],
        specs={
            "first_val": ("first_value", "value"),
            "last_val": ("last_value", "value"),
            "min3": ("rolling_min", "value", 3),
            "max3": ("rolling_max", "value", 3),
        },
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("first_val", "last_val", "min3", "max3"):
            df[c] = sql_round(df[c], 4)
        return df[["event_id", "user_id", "first_val", "last_val", "min3", "max3"]]

    return win.map_batches(fin, batch_format="pandas").sort("event_id").to_pandas()


_VALUE_EXTREMA_SQL = """
SELECT event_id, user_id,
       round(first_value(value) OVER w, 4) AS first_val,
       round(last_value(value) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
             4) AS last_val,
       round(min(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS min3,
       round(max(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS max3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def event_rank_ntile(sf_dir: str) -> pd.DataFrame:
    """RANK / DENSE_RANK / NTILE window kinds: per user, events ranked
    by event_type (heavy ties — rank leaves gaps, dense_rank doesn't)
    and quartiled with event_id as the deterministic tiebreak."""
    from .relational import windowed

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    win = windowed(
        ds,
        part_keys="user_id",
        order_keys=["event_type"],
        specs={
            "rnk": ("rank", None),
            "drnk": ("dense_rank", None),
            "tile": ("ntile", None, 4),
        },
        tiebreak=["event_id"],
    )
    return (
        win.map_batches(
            lambda df: df[["event_id", "user_id", "rnk", "drnk", "tile"]],
            batch_format="pandas",
        )
        .sort("event_id")
        .to_pandas()
    )


_RANK_NTILE_SQL = """
SELECT event_id, user_id,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type) AS BIGINT) AS drnk,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY event_type, event_id) AS BIGINT) AS tile
FROM events
ORDER BY event_id
"""


def quantity_percentiles(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK / CUME_DIST over lineitem quantity per returnflag
    (heavy ties — integer-valued quantities — pin the tie-group
    semantics of both)."""
    from .relational import windowed

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
    )
    win = windowed(
        li,
        part_keys="l_returnflag",
        order_keys=["l_quantity"],
        specs={"pr": ("percent_rank", None), "cd": ("cume_dist", None)},
        tiebreak=["l_orderkey", "l_linenumber"],
        num_buckets=8,
    )
    return (
        win.map_batches(
            lambda df: df.assign(pr=sql_round(df["pr"], 6), cd=sql_round(df["cd"], 6))[
                ["l_orderkey", "l_linenumber", "pr", "cd"]
            ],
            batch_format="pandas",
        )
        .sort(["l_orderkey", "l_linenumber"])
        .to_pandas()
    )


_PCT_RANK_SQL = """
SELECT l_orderkey, l_linenumber,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
ORDER BY l_orderkey, l_linenumber
"""


def event_prop_k_stats(sf_dir: str) -> pd.DataFrame:
    """Schema-on-read JSON: extract props->k (typed, malformed -> NULL),
    then grouped stats per event_type. One shuffle-free extract pass +
    partial-combined aggregate."""
    from . import streamops

    ds = read_table(sf_dir, "events", columns=["event_type", "props"])
    ex = streamops.json_extract(ds, "props", "k", "k", "float64")
    out = pre_aggregate(
        ex,
        ["event_type"],
        {"n": (None, "count"), "avg_k": ("k", "mean"), "max_k": ("k", "max")},
    )
    out["avg_k"] = sql_round(out["avg_k"], 4)
    out["max_k"] = out["max_k"].astype("float64")
    return out.sort_values("event_type").reset_index(drop=True)


_PROP_K_SQL = r"""
SELECT event_type, count(*) AS n,
       round(avg(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS DOUBLE)), 4) AS avg_k,
       max(TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS DOUBLE)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def late_events_flagged(sf_dir: str) -> pd.DataFrame:
    """Watermark / allowed-lateness semantics: per user, an event whose
    event time is >10 minutes behind the running max at its arrival
    (event_id order) is late — the dead-letter side of a streaming
    tumbling window."""
    from . import streamops

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = streamops.late_events(ds, 600 * 1_000_000)
    return (
        out.map_batches(
            lambda df: df[["event_id", "user_id", "is_late"]], batch_format="pandas"
        )
        .sort("event_id")
        .to_pandas()
    )


_LATE_EVENTS_SQL = """
SELECT event_id, user_id,
       CAST(max(ts) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS UNBOUNDED PRECEDING) - ts > INTERVAL '10 minutes'
            AS BIGINT) AS is_late
FROM events
ORDER BY event_id
"""


def hourly_ohlc(sf_dir: str) -> pd.DataFrame:
    """OHLC resampling of the event stream per (type, hour): open/close
    via grouped arg_min/arg_max on event time (one candidate per key per
    batch), high/low via partial-combined aggregates, assembled with two
    bucketed joins — the telemetry downsampling pass, composed entirely
    from algebraic operators."""
    from .relational import grouped_argmax, hash_join, pre_aggregate_ds

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        # pin to µs explicitly (parquet blocks arrive datetime64[us])
        epoch_s = df["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "hour_epoch": (epoch_s // 3600) * 3600,
                "ts_us": df["ts"].astype("datetime64[us]").astype("int64"),
                "value": df["value"],
            }
        )

    h = ds.map_batches(prep, batch_format="pandas")
    keys = ["event_type", "hour_epoch"]
    hl = pre_aggregate_ds(h, keys, {"high": ("value", "max"), "low": ("value", "min")})
    opens = grouped_argmax(h, keys, "ts_us", "value", minimize=True).map_batches(
        lambda df: df.rename(columns={"value": "open"})[keys + ["open"]],
        batch_format="pandas",
    )
    closes = grouped_argmax(h, keys, "ts_us", "value").map_batches(
        lambda df: df.rename(columns={"value": "close"})[keys + ["close"]],
        batch_format="pandas",
    )
    key_schema = [("event_type", pa.string()), ("hour_epoch", pa.int64())]
    j1 = hash_join(
        hl,
        opens,
        on=keys,
        left_schema=pa.schema(key_schema + [("high", pa.float64()), ("low", pa.float64())]),
        right_schema=pa.schema(key_schema + [("open", pa.float64())]),
    )
    j2 = hash_join(
        j1,
        closes,
        on=keys,
        left_schema=pa.schema(
            key_schema
            + [("high", pa.float64()), ("low", pa.float64()), ("open", pa.float64())]
        ),
        right_schema=pa.schema(key_schema + [("close", pa.float64())]),
    )
    out = j2.to_pandas()
    for c in ("open", "high", "low", "close"):
        out[c] = sql_round(out[c], 4)
    return (
        out[["event_type", "hour_epoch", "open", "high", "low", "close"]]
        .sort_values(keys)
        .reset_index(drop=True)
    )


_OHLC_SQL = """
SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       round(arg_min(value, ts), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(arg_max(value, ts), 4) AS close
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def users_per_hour(sf_dir: str) -> pd.DataFrame:
    """Grouped COUNT DISTINCT: unique active users per hour. Two
    partial-combined shuffles (distinct pairs, then grouped count) —
    raw events never shuffle."""
    from .relational import grouped_count_distinct

    ds = read_table(sf_dir, "events", columns=["ts", "user_id"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df["ts"].astype("int64") // 1_000_000
        out = pd.DataFrame(
            {"hour_epoch": (epoch // 3600) * 3600, "user_id": df["user_id"]}
        )
        return out

    hours = ds.map_batches(add_hour, batch_format="pandas")
    out = grouped_count_distinct(hours, "hour_epoch", "user_id", out_col="n_users")
    df = out.to_pandas()
    df["n_users"] = df["n_users"].astype("int64")
    return df


_USERS_PER_HOUR_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


def median_price_by_priority(sf_dir: str) -> pd.DataFrame:
    """Exact discrete median order price per priority class, computed
    from a partial-combined (priority, price) histogram — raw orders
    never shuffle, and the per-group walk touches distinct values only."""
    from .relational import grouped_quantile_disc

    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = grouped_quantile_disc(
        orders, "o_orderpriority", "o_totalprice", q=0.5, out_col="median_price"
    ).to_pandas()
    out["median_price"] = sql_round(out["median_price"], 2)
    return out


_MEDIAN_PRICE_SQL = """
SELECT o_orderpriority, round(quantile_disc(o_totalprice, 0.5), 2) AS median_price
FROM orders GROUP BY o_orderpriority
"""


def p90_event_value_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact INTERPOLATED p90 per event type (SQL percentile_cont),
    computed from the same partial-combined value histogram as the
    discrete median — raw events never shuffle."""
    from .relational import grouped_quantile_cont

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_quantile_cont(
        ev, "event_type", "value", q=0.9, out_col="p90_value"
    ).to_pandas()
    out["p90_value"] = sql_round(out["p90_value"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


_P90_EVENT_SQL = """
SELECT event_type, round(quantile_cont(value, 0.9), 6) AS p90_value
FROM events GROUP BY event_type
"""


def lineitem_moments(sf_dir: str) -> pd.DataFrame:
    """Second-moment aggregates (sample stddev/variance, correlation,
    covariance) per returnflag — all algebraic: five cross-moment sums
    per (key, batch) are the only thing that shuffles. Rounded to 6dp on
    BOTH sides (partial-sum order differs from DuckDB's single pass)."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    )
    out = pre_aggregate(
        li,
        ["l_returnflag"],
        {
            "n_items": (None, "count"),
            "std_qty": ("l_quantity", "std"),
            "var_qty": ("l_quantity", "var"),
            "corr_qty_price": (("l_quantity", "l_extendedprice"), "corr"),
            "covar_qty_disc": (("l_quantity", "l_discount"), "covar"),
        },
    )
    for c in ("std_qty", "var_qty", "corr_qty_price", "covar_qty_disc"):
        out[c] = sql_round(out[c], 6)
    return out


_LINEITEM_MOMENTS_SQL = """
SELECT l_returnflag,
       count(*) AS n_items,
       round(stddev_samp(l_quantity), 6) AS std_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
FROM lineitem GROUP BY l_returnflag
"""


def _doc_token_tf(docs):
    """Shared TF/DF builder for the TF-IDF and inverted-index queries:
    per-(doc, token) term frequencies form IN-BATCH (a document's text
    lives in one row), the vocab-scale document-frequency aggregate
    stays a Dataset. Returns ``(tf_ds, df_ds)``."""

    def tf_part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z0-9_]+")
        ex = toks.explode()
        f = pd.DataFrame(
            {
                "doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
                "token": ex.to_numpy(),
            }
        ).dropna(subset=["token"])
        g = f.groupby(["doc_id", "token"], sort=False).size().reset_index(name="tf")
        g["tf"] = g["tf"].astype("int64")
        return g

    tf_ds = docs.map_batches(tf_part, batch_format="pandas")
    df_ds = pre_aggregate_ds(tf_ds, "token", {"df": (None, "count")})
    return tf_ds, df_ds


def tfidf_top_terms_docs(sf_dir: str) -> pd.DataFrame:
    """Top-3 TF-IDF terms per document (score = tf · ln(N/df)) — the
    keyword-extraction pass of a search/labeling pipeline. Scale shape:
    per-(doc, token) TF partials form in-batch (a document's text lives
    in one row, so TF needs no exchange); document frequency is a
    vocab-scale map-side-combined aggregate that STAYS a Dataset; DF
    attaches back through the bucketed string-keyed :func:`hash_join`
    (never a broadcast — web-corpus vocabularies are unbounded); the
    per-doc top-3 cut runs in one doc-keyed bucket pass. Ties broken
    (score desc, token asc) identically to the SQL twin's row_number."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = float(docs.count())  # parquet metadata count, no scan
    tf_ds, df_ds = _doc_token_tf(docs)
    joined = hash_join(
        tf_ds,
        df_ds,
        on="token",
        # spelled schemas: df_ds sits downstream of a shuffle (schema
        # fetch would re-execute its prefix) and both sides are
        # pandas-block datasets (numpy dtypes, not Arrow types)
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )

    def head3(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["tfidf"] = g["tf"].astype("float64") * np.log(
            n_docs / g["df"].astype("float64")
        )
        g = g.sort_values(
            ["doc_id", "tfidf", "token"], ascending=[True, False, True]
        )
        out = g.groupby("doc_id", sort=False).head(3)
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype("int64"),
                "token": out["token"],
                "tfidf": sql_round(out["tfidf"], 6),
            }
        )

    out = bucketed_groupby_apply(joined, "doc_id", head3).to_pandas()
    return out.sort_values(
        ["doc_id", "tfidf", "token"], ascending=[True, False, True],
        ignore_index=True,
    )


_TFIDF_TOP_TERMS_SQL = """
WITH tf AS (
  SELECT doc_id, t AS token, count(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents)
  GROUP BY doc_id, t
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf * ln(nd.n / df.df) AS raw,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(nd.n / df.df) DESC, tf.token
         ) AS rn
  FROM tf JOIN df USING (token) CROSS JOIN nd
)
SELECT doc_id, token, round(raw, 6) AS tfidf
FROM scored WHERE rn <= 3 ORDER BY doc_id, raw DESC, token
"""


def doc_bigram_nll(sf_dir: str) -> pd.DataFrame:
    """Per-document average NLL under an add-one-smoothed corpus BIGRAM
    LM — the context-aware upgrade of ``doc_unigram_nll``:
    p(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V + 1) with c(w1·) the count
    of bigram positions opening with w1 and V the distinct-token count.
    Scale shape: the bigram count table is vocab²-scale so it can NEVER
    broadcast (the unigram scorer's top-V trick dies here) — counts
    attach back to the position rows through TWO bucketed string-keyed
    joins instead; position rows form in-batch, per-doc means reduce
    map-side."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bigrams(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z0-9_]+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "w1": pd.Series([], dtype=object),
                    "bigram": pd.Series([], dtype=object),
                }
            )
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        rows = np.repeat(df["doc_id"].to_numpy(), lens)
        # bigram positions: every token except each row's last
        ends = np.cumsum(lens) - 1
        keep = np.ones(len(flat), dtype=bool)
        keep[ends[lens > 0]] = False
        w1 = flat[keep]
        w2 = flat[1:][keep[:-1]] if len(flat) > 1 else flat[:0]
        return pd.DataFrame(
            {
                "doc_id": rows[keep].astype("int64"),
                "w1": w1,
                "bigram": w1 + " " + w2,
            }
        )

    bg = docs.map_batches(bigrams, batch_format="pandas").materialize()
    bgc = pre_aggregate_ds(bg, "bigram", {"cb": (None, "count")})
    c1 = pre_aggregate_ds(
        bg.map_batches(
            lambda d: d[["w1"]].rename(columns={"w1": "ctx"}),
            batch_format="pandas",
        ),
        "ctx",
        {"c1": (None, "count")},
    ).map_batches(
        lambda d: d.rename(columns={"ctx": "w1"}), batch_format="pandas"
    )

    def tokens(df: pd.DataFrame) -> pd.DataFrame:
        ex = df["text"].fillna("").str.lower().str.findall(r"[a-z0-9_]+").explode()
        return pd.DataFrame({"token": ex.dropna().to_numpy()})

    vocab_n = int(
        pre_aggregate_ds(
            docs.map_batches(tokens, batch_format="pandas"),
            "token",
            {"n": (None, "count")},
        ).count()
    )

    j1 = hash_join(
        bg,
        bgc,
        on="bigram",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("w1", pa.string()), ("bigram", pa.string())]
        ),
        right_schema=pa.schema([("bigram", pa.string()), ("cb", pa.int64())]),
    )
    j2 = hash_join(
        j1,
        c1,
        on="w1",
        left_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("w1", pa.string()),
                ("bigram", pa.string()),
                ("cb", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("w1", pa.string()), ("c1", pa.int64())]),
    )

    def nll(df: pd.DataFrame) -> pd.DataFrame:
        p = (df["cb"].to_numpy(dtype="float64") + 1.0) / (
            df["c1"].to_numpy(dtype="float64") + vocab_n + 1.0
        )
        return pd.DataFrame({"doc_id": df["doc_id"], "nll": -np.log(p)})

    out = pre_aggregate(
        j2.map_batches(nll, batch_format="pandas"),
        ["doc_id"],
        {"avg_nll": ("nll", "mean")},
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["avg_nll"] = sql_round(out["avg_nll"], 6)
    return out.sort_values("doc_id", ignore_index=True)


_DOC_BIGRAM_NLL_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
         unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]))
           AS bigram
  FROM toks
), bgc AS (
  SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
), v AS (
  SELECT count(DISTINCT t) AS vn
  FROM (SELECT unnest(ts) AS t FROM toks)
)
SELECT bg.doc_id,
       round(avg(-ln((bgc.cb + 1.0) / (c1.c1 + v.vn + 1.0))), 6) AS avg_nll
FROM bg JOIN bgc USING (bigram) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY bg.doc_id ORDER BY bg.doc_id
"""


def inverted_index_docs(sf_dir: str) -> pd.DataFrame:
    """Inverted-index materialization: posting rows (token, doc_id, tf)
    for mid-frequency terms (max(5, N/100) ≤ df ≤ N/12, N = corpus doc
    count — the discriminative band a search index actually serves,
    scale-relative so it stays non-degenerate at every corpus size;
    stopword-band and hapax tokens are pruned by the df filter). Scale
    shape: per-(doc, token) TF partials form in-batch, the vocab-scale
    DF aggregate STAYS a Dataset and its band filter runs vectorized on
    it, postings attach through the bucketed string-keyed join. The
    posting table is then WRITTEN as a token-hash-bucketed Parquet
    layout (:func:`kgraft.io.write_bucketed` — the operational sink;
    at 100 TB the layout IS the index and nothing is collected; r4
    VERDICT next #2). The driver-facing return reads the layout back
    only because the oracle compare needs a frame — bounded by the df
    band. Layout/pruning pytest: tests/test_io.py."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = int(docs.count())  # parquet metadata count
    lo, hi = max(5, n_docs // 100), max(6, n_docs // 12)
    tf_ds, df_ds = _doc_token_tf(docs)
    band = df_ds.map_batches(
        lambda d: d[(d["df"] >= lo) & (d["df"] <= hi)], batch_format="pandas"
    )
    postings = hash_join(
        tf_ds,
        band,
        on="token",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )
    from .io import write_bucketed

    layout = _scratch_layout(sf_dir, "inverted_index")
    write_bucketed(
        postings.map_batches(
            lambda df: df[["token", "doc_id", "tf"]], batch_format="pandas"
        ),
        layout,
        on="token",
        num_buckets=32,
    )
    import glob

    files = glob.glob(os.path.join(layout, "**", "*.parquet"), recursive=True)
    out = ray.data.read_parquet(files).to_pandas() if files else pd.DataFrame()
    if "__bucket" in out.columns:
        out = out.drop(columns=["__bucket"])
    if out.empty:  # degenerate band: typed empty frame, schema stable
        return pd.DataFrame(
            {
                "token": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
                "tf": pd.Series([], dtype="int64"),
            }
        )
    out["doc_id"] = out["doc_id"].astype("int64")
    out["tf"] = out["tf"].astype("int64")
    return out.sort_values(["token", "doc_id"], ignore_index=True)[
        ["token", "doc_id", "tf"]
    ]


_INVERTED_INDEX_SQL = """
WITH tf AS (
  SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents)
  GROUP BY doc_id, t
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), band AS (
  SELECT greatest(5, CAST(count(*) // 100 AS BIGINT)) AS lo,
         greatest(6, CAST(count(*) // 12 AS BIGINT)) AS hi
  FROM documents
)
SELECT tf.token, tf.doc_id, tf.tf
FROM tf JOIN df USING (token) CROSS JOIN band
WHERE df.df BETWEEN band.lo AND band.hi
ORDER BY token, doc_id
"""


def shape_stats_by_flag(sf_dir: str) -> pd.DataFrame:
    """Distribution-shape aggregates — sample skewness (adjusted
    Fisher-Pearson G1) and excess kurtosis (G2) per returnflag, DuckDB
    ``skewness()``/``kurtosis()`` semantics. Algebraic like var/corr:
    four power sums per (key, batch) are all that shuffles. 6dp rounding
    on both sides (partial-sum order differs from DuckDB's one pass)."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    out = pre_aggregate(
        li,
        ["l_returnflag"],
        {
            "n_items": (None, "count"),
            "skew_qty": ("l_quantity", "skew"),
            "kurt_qty": ("l_quantity", "kurt"),
            "skew_price": ("l_extendedprice", "skew"),
            "kurt_price": ("l_extendedprice", "kurt"),
        },
    )
    for c in ("skew_qty", "kurt_qty", "skew_price", "kurt_price"):
        out[c] = sql_round(out[c], 6)
    return out.sort_values("l_returnflag", ignore_index=True)


_SHAPE_STATS_SQL = """
SELECT l_returnflag,
       count(*) AS n_items,
       round(skewness(l_quantity), 6) AS skew_qty,
       round(kurtosis(l_quantity), 6) AS kurt_qty,
       round(skewness(l_extendedprice), 6) AS skew_price,
       round(kurtosis(l_extendedprice), 6) AS kurt_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot: per user, total value per event type as columns. The
    category set is the generator's fixed enum (discoverable at runtime
    with ``Dataset.unique`` — pinned here because the SQL oracle needs
    static column names)."""
    from .relational import pivot_sum

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])
    out = pivot_sum(ev, "user_id", "event_type", "value", _EVENT_TYPES).to_pandas()
    for c in _EVENT_TYPES:
        out[c] = sql_round(out[c], 4)
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


_EVENT_PIVOT_SQL = "SELECT user_id, " + ", ".join(
    f"round(sum(CASE WHEN event_type = '{c}' THEN value ELSE 0 END), 4) AS {c}"
    for c in _EVENT_TYPES
) + " FROM events GROUP BY user_id"


def order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    counting only non-urgent orders, INCLUDING customers with none —
    the left-outer bucketed hash join keeps unmatched customers, and
    both aggregates (per-customer, then per-count) are partial-combined
    Datasets; nothing corpus-sized reaches the driver before the final
    distribution (count-cardinality rows)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda df: df.loc[
            df["o_orderpriority"] != "1-URGENT", ["o_custkey", "o_orderkey"]
        ].rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    joined = hash_join(
        cust,
        orders,
        on="c_custkey",
        how="left",
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=pa.schema(
            [("c_custkey", pa.int64()), ("o_orderkey", pa.int64())]
        ),
    )

    def ind(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"],
                "has": df["o_orderkey"].notna().astype("int64"),
            }
        )

    per_cust = pre_aggregate_ds(
        joined.map_batches(ind, batch_format="pandas"),
        "c_custkey",
        {"c_count": ("has", "sum")},
    )
    dist = pre_aggregate(per_cust, "c_count", {"custdist": (None, "count")})
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["custdist"] = dist["custdist"].astype("int64")
    return dist.sort_values(
        ["custdist", "c_count"], ascending=False
    ).reset_index(drop=True)


_ORDER_COUNT_DIST_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def _hi_and_urgent_orderkeys(sf_dir: str):
    """Shared branches for the set-op queries: (high-value keys,
    urgent keys) as single-column Datasets."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderpriority"]
    )
    hi = ds.map_batches(
        lambda df: df.loc[df["o_totalprice"] > 400000.0, ["o_orderkey"]],
        batch_format="pandas",
    )
    urgent = ds.map_batches(
        lambda df: df.loc[df["o_orderpriority"] == "1-URGENT", ["o_orderkey"]],
        batch_format="pandas",
    )
    return hi, urgent


def intersect_orders(sf_dir: str):
    """Set intersection (SQL INTERSECT): order keys that are BOTH
    high-value AND urgent — one bucketed shuffle of map-side-distinct
    tagged rows."""
    from .relational import set_op

    hi, urgent = _hi_and_urgent_orderkeys(sf_dir)
    return set_op(hi, urgent, "o_orderkey", "intersect")


_INTERSECT_SQL = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
INTERSECT
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def intersect_all_parts(sf_dir: str):
    """BAG intersection (SQL INTERSECT ALL — multiplicities survive):
    for each part key, min(copies in low-quantity lineitems, copies in
    high-quantity lineitems) rows. Map-side value_counts partials cross
    ONE bucketed exchange; per group the multiplicity arithmetic +
    np.repeat re-emit (:func:`kgraft.relational.set_op_all`)."""
    from .relational import set_op_all

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    lo = li.map_batches(
        lambda df: df[df["l_quantity"] <= 25][["l_partkey"]],
        batch_format="pandas",
    )
    hi = li.map_batches(
        lambda df: df[df["l_quantity"] > 25][["l_partkey"]],
        batch_format="pandas",
    )
    out = set_op_all(lo, hi, "l_partkey", "intersect_all").to_pandas()
    return out.sort_values("l_partkey", ignore_index=True).astype(
        {"l_partkey": "int64"}
    )


_INTERSECT_ALL_SQL = """
SELECT l_partkey FROM lineitem WHERE l_quantity <= 25
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_quantity > 25
ORDER BY l_partkey
"""


def except_all_parts(sf_dir: str):
    """BAG difference (SQL EXCEPT ALL): low-quantity part-key copies
    minus high-quantity copies, clamped at zero — same one-exchange
    multiplicity arithmetic as `intersect_all_parts`."""
    from .relational import set_op_all

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    lo = li.map_batches(
        lambda df: df[df["l_quantity"] <= 25][["l_partkey"]],
        batch_format="pandas",
    )
    hi = li.map_batches(
        lambda df: df[df["l_quantity"] > 25][["l_partkey"]],
        batch_format="pandas",
    )
    out = set_op_all(lo, hi, "l_partkey", "except_all").to_pandas()
    return out.sort_values("l_partkey", ignore_index=True).astype(
        {"l_partkey": "int64"}
    )


_EXCEPT_ALL_SQL = """
SELECT l_partkey FROM lineitem WHERE l_quantity <= 25
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_quantity > 25
ORDER BY l_partkey
"""


def except_orders(sf_dir: str):
    """Set difference (SQL EXCEPT): high-value order keys that are NOT
    urgent."""
    from .relational import set_op

    hi, urgent = _hi_and_urgent_orderkeys(sf_dir)
    return set_op(hi, urgent, "o_orderkey", "except")


_EXCEPT_SQL = """
SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
EXCEPT
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def sample_events_per_user(sf_dir: str):
    """Deterministic 3-per-user event sample (per-class subsampling for
    corpus shaping), exactly replayable by the SQL oracle's row_number-
    over-Knuth-hash idiom."""
    from .relational import sample_k_per_group

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    return sample_k_per_group(ev, "user_id", "event_id", k=3).to_pandas().sort_values(
        "event_id", ignore_index=True
    )


_SAMPLE_PER_USER_SQL = """
SELECT event_id, user_id, event_type FROM (
    SELECT event_id, user_id, event_type,
           row_number() OVER (
               PARTITION BY user_id
               ORDER BY (event_id::HUGEINT * 2654435761) % 4294967296, event_id
           ) AS rn
    FROM events
) WHERE rn <= 3 ORDER BY event_id
"""


def urgent_customers_bloom(sf_dir: str):
    """Customers with at least one urgent order — EXACT semi join via
    the Bloom-prefilter scale pattern (bitmap OR-reduce + shuffle-free
    probe scan + exact tier on survivors only)."""
    from .relational import bloom_semi_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    urgent = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda df: df.loc[
            df["o_orderpriority"] == "1-URGENT", ["o_custkey"]
        ].rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    return bloom_semi_join(cust, urgent, on="c_custkey")


_URGENT_CUST_BLOOM_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


def rollup_order_totals(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP (status, priority): per-(status, priority),
    per-status subtotals, and the grand total — one corpus scan at the
    finest level, coarser levels re-aggregated from it."""
    from .relational import rollup_aggregate

    orders = read_table(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )
    out = rollup_aggregate(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        {"total_price": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    )
    out["total_price"] = sql_round(out["total_price"], 4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 4) AS total_price,
       count(*) AS n_orders
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def price_means_by_priority(sf_dir: str):
    """Geometric + harmonic mean order price per priority — the two
    non-arithmetic Pythagorean means, both riding the same algebraic
    mean partials behind a shuffle-free transform
    (relational.grouped_gmean / grouped_hmean)."""
    from .relational import grouped_gmean, grouped_hmean

    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    g = grouped_gmean(orders, "o_orderpriority", "o_totalprice")
    h = grouped_hmean(orders, "o_orderpriority", "o_totalprice")
    out = g.merge(h, on="o_orderpriority")
    out["gmean"] = sql_round(out["gmean"], 4)
    out["hmean"] = sql_round(out["hmean"], 4)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


_PRICE_MEANS_SQL = """
SELECT o_orderpriority,
       round(exp(avg(ln(o_totalprice))), 4) AS gmean,
       round(1.0 / avg(1.0 / o_totalprice), 4) AS hmean
FROM orders GROUP BY o_orderpriority
"""


def mad_quantity_by_flag(sf_dir: str):
    """Robust spread per group: median absolute deviation of lineitem
    quantity per return flag (DuckDB ``mad`` semantics — continuous
    median of |x - median|), from ONE distinct-value histogram exchange
    (relational.grouped_mad)."""
    from .relational import grouped_mad

    li = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    out = grouped_mad(li, "l_returnflag", "l_quantity").to_pandas()
    out["mad"] = sql_round(out["mad"], 6)
    return out.sort_values("l_returnflag").reset_index(drop=True)


_MAD_SQL = """
SELECT l_returnflag, round(mad(l_quantity), 6) AS mad
FROM lineitem GROUP BY l_returnflag
"""


def quantity_buckets(sf_dir: str):
    """Global quantile binning of lineitem quantities into quartiles —
    exact quantile_disc cuts from a distinct-value-scale histogram,
    broadcast, shuffle-free searchsorted assignment
    (relational.quantile_bucketize)."""
    from .relational import quantile_bucketize

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )
    return quantile_bucketize(
        li, "l_quantity", 4, ["l_orderkey", "l_linenumber", "l_quantity"]
    )


_QUANTITY_BUCKETS_SQL = """
WITH cuts AS (
  SELECT quantile_disc(l_quantity, [0.25, 0.5, 0.75]) AS q FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(1 + len(list_filter(q, c -> l_quantity > c)) AS BIGINT) AS bucket
FROM lineitem, cuts
"""


def upsert_orders(sf_dir: str):
    """Lakehouse MERGE / latest-wins upsert: a derived update set
    (price bumps on o_orderkey%7, inserts at o_orderkey+6e6 from %97)
    merged into the orders snapshot — one tagged union + one bucketed
    key exchange, payload carried (relational.upsert)."""
    from .relational import upsert

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def mk_base(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["v"] = np.int64(1)
        return out

    def mk_updates(df: pd.DataFrame) -> pd.DataFrame:
        mod = df[df["o_orderkey"] % 7 == 0].copy()
        mod["o_totalprice"] = sql_round((mod["o_totalprice"] + 100), 2)
        ins = df[df["o_orderkey"] % 97 == 0].copy()
        ins["o_orderkey"] = ins["o_orderkey"] + 6_000_000
        out = pd.concat([mod, ins], ignore_index=True)
        out["v"] = np.int64(2)
        return out

    import pyarrow as _pa

    schema = _pa.schema(
        [("o_orderkey", _pa.int64()), ("o_totalprice", _pa.float64()), ("v", _pa.int64())]
    )
    base = orders.map_batches(mk_base, batch_format="pandas")
    updates = orders.map_batches(mk_updates, batch_format="pandas")
    merged = upsert(base, updates, "o_orderkey", "v", base_schema=schema)
    return merged.map_batches(
        lambda df: df.assign(o_totalprice=sql_round(df["o_totalprice"], 2)),
        batch_format="pandas",
    )


_UPSERT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, 1 AS v FROM orders
), updates AS (
  SELECT o_orderkey, round(o_totalprice + 100, 2) AS o_totalprice, 2 AS v
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey + 6000000, o_totalprice, 2
  FROM orders WHERE o_orderkey % 97 = 0
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM updates
)
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, v FROM u
QUALIFY row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) = 1
"""


def diff_order_snapshots(sf_dir: str):
    """Change-data-capture between two order snapshots (drops on %11,
    price changes on %7, inserts at +6e6 from %97): per key added /
    removed / changed, NULL-safe compare, one bucketed key exchange
    (relational.snapshot_diff)."""
    from .relational import snapshot_diff

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def mk_b(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["o_orderkey"] % 11 != 0].copy()
        bump = kept["o_orderkey"] % 7 == 0
        kept.loc[bump, "o_totalprice"] = sql_round((kept.loc[bump, "o_totalprice"] + 100), 2)
        ins = df[df["o_orderkey"] % 97 == 0].copy()
        ins["o_orderkey"] = ins["o_orderkey"] + 6_000_000
        return pd.concat([kept, ins], ignore_index=True)

    b = orders.map_batches(mk_b, batch_format="pandas")
    return snapshot_diff(orders, b, "o_orderkey", ["o_totalprice"])


_DIFF_SQL = """
WITH a AS (SELECT o_orderkey, o_totalprice FROM orders),
b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 100, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey + 6000000, o_totalprice FROM orders WHERE o_orderkey % 97 = 0
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'added'
            WHEN b.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
"""


def grouping_sets_orders(sf_dir: str) -> pd.DataFrame:
    """GROUP BY GROUPING SETS ((status, priority), (status), (priority)):
    the general form ROLLUP/CUBE are sugar for — exactly the requested
    levels, one corpus scan at the finest level."""
    from .relational import grouping_sets_aggregate

    orders = read_table(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )
    out = grouping_sets_aggregate(
        orders,
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], ["o_orderpriority"]],
        {"total_price": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    )
    out["total_price"] = sql_round(out["total_price"], 4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 4) AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority))
"""


def top_order_per_customer(sf_dir: str):
    """arg_max per group: each customer's highest-value order (one
    candidate row per key per batch crosses the shuffle — never the
    raw orders). Dataset out; corpus-cardinality keys stay in-cluster."""
    from .relational import grouped_argmax

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )
    out = grouped_argmax(orders, "o_custkey", "o_totalprice", "o_orderkey")
    return out.map_batches(
        lambda df: df.assign(o_totalprice=sql_round(df["o_totalprice"], 4))[
            ["o_custkey", "o_orderkey", "o_totalprice"]
        ],
        batch_format="pandas",
    )


_ARGMAX_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
ORDER BY o_custkey
"""


def cube_order_totals(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE (status, priority): all four aggregation levels
    (both keys, each key alone, grand total) from one corpus scan."""
    from .relational import cube_aggregate

    orders = read_table(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    )
    out = cube_aggregate(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        {"total_price": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    )
    out["total_price"] = sql_round(out["total_price"], 4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 4) AS total_price,
       count(*) AS n_orders
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def funnel_view_click_purchase(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel over the event stream: users who
    viewed, then clicked at-or-after their first view, then purchased
    at-or-after that click."""
    from .relational import funnel

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


_FUNNEL_SQL = """
WITH s1 AS (
    SELECT user_id, min(ts) AS t FROM events
    WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
    WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, min(e.ts) AS t FROM events e
    JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click,
       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase
"""


def mode_priority_by_status(sf_dir: str) -> pd.DataFrame:
    """Most frequent order priority per status — histogram shuffle only,
    deterministic tie-break (count DESC, value ASC) mirrored in the SQL
    oracle's row_number idiom."""
    from .relational import grouped_mode

    orders = read_table(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    out = grouped_mode(
        orders, "o_orderstatus", "o_orderpriority", out_col="mode_priority"
    ).to_pandas()
    return out.sort_values("o_orderstatus").reset_index(drop=True)


_MODE_PRIORITY_SQL = """
SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
    SELECT o_orderstatus, o_orderpriority,
           row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority
           ) AS rn
    FROM orders GROUP BY o_orderstatus, o_orderpriority
) WHERE rn = 1
"""


def priorities_per_status(sf_dir: str) -> pd.DataFrame:
    """Grouped string aggregation: the sorted distinct priorities seen
    per order status, comma-joined (deterministic ORDER BY form)."""
    from .relational import distinct, grouped_string_agg

    pairs = distinct(
        read_table(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"]),
        ["o_orderstatus", "o_orderpriority"],
    )
    out = grouped_string_agg(
        pairs, "o_orderstatus", "o_orderpriority", out_col="priorities"
    ).to_pandas()
    return out.sort_values("o_orderstatus").reset_index(drop=True)


_PRIORITIES_PER_STATUS_SQL = """
SELECT o_orderstatus, string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders)
GROUP BY o_orderstatus
"""


def approx_median_price(sf_dir: str) -> pd.DataFrame:
    """DDSketch approximate grouped median (relative error <= 1%): the
    sketch path where the exact quantile's per-distinct-value histogram
    is corpus-sized. Rows-only driver check; the error-bound oracle
    lives in tests/test_relational.py."""
    from .relational import grouped_approx_quantile

    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = grouped_approx_quantile(
        orders, "o_orderpriority", "o_totalprice", 0.5, alpha=0.01, out_col="approx_median"
    ).to_pandas()
    out["approx_median"] = sql_round(out["approx_median"], 4)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def approx_users_per_type(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog distinct users per event type (p=12, ~1.6% s.e.) —
    the sketch path for web-scale COUNT DISTINCT where the exact
    operator's (key, value) pair shuffle IS the corpus. DuckDB twin
    replays the full register math (_APPROX_USERS_SQL) — approximate
    by design but deterministic, so the estimate value-hash-checks;
    the error-bound test vs exact lives in tests/test_relational.py."""
    from .relational import grouped_approx_count_distinct

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    out = grouped_approx_count_distinct(
        ev, "event_type", "user_id", out_col="approx_users"
    ).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def top_tokens_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide top-20 tokens (lowercased ``[a-z0-9_]+`` runs) by
    frequency — the vocabulary-statistics pass of a training-data
    pipeline. Raw tokens never shuffle: each batch emits its local
    (token, count) value_counts partial, the grouped sum reduces them,
    and only the vocab-scale aggregate is sorted for the cut."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9_]+").explode()
        vc = toks.value_counts()
        return pd.DataFrame({"token": vc.index.astype(str), "n": vc.to_numpy(dtype="int64")})

    partials = docs.map_batches(counts, batch_format="pandas")
    agg = pre_aggregate_ds(partials, "token", {"n": ("n", "sum")})
    out = agg.sort(["n", "token"], descending=[True, False]).limit(20).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


_TOP_TOKENS_SQL = """
SELECT t AS token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
      FROM documents)
GROUP BY t ORDER BY n DESC, t LIMIT 20
"""


def top_bigrams_docs(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide top-20 word BIGRAMS — the co-occurrence statistics
    pass (collocation mining / LM diagnostics). Same scale shape as
    top_tokens_docs: each batch emits (bigram, count) partials built
    from a shifted exploded frame (raw text never shuffles), the
    grouped sum reduces, the vocab-scale aggregate takes the cut."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9_]+")
        idx = pd.RangeIndex(len(df)).repeat(toks.str.len())
        # object-dtype pin: all-empty token lists concatenate to float64,
        # which breaks the string concat below (same guard as
        # textops.repetition_signals / tokenize_docs)
        ex = pd.Series(
            np.concatenate(toks.to_numpy())
            if len(df) and int(toks.str.len().sum())
            else np.empty(0, dtype=object),
            index=idx,
        )
        nxt = ex.shift(-1)
        same = pd.Series(idx, index=idx).shift(-1) == idx
        g = (ex + " " + nxt.fillna(""))[same.fillna(False)]
        vc = g.value_counts()
        return pd.DataFrame(
            {"bigram": vc.index.astype(str), "n": vc.to_numpy(dtype="int64")}
        )

    partials = docs.map_batches(counts, batch_format="pandas")
    agg = pre_aggregate_ds(partials, "bigram", {"n": ("n", "sum")})
    out = agg.sort(["n", "bigram"], descending=[True, False]).limit(20).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


_TOP_BIGRAMS_SQL = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]))
         AS bigram
  FROM toks
)
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""


def cms_token_estimates(sf_dir: str) -> pd.DataFrame:
    """Count-min-sketch frequency estimates for a probe token set —
    the fixed-memory counting tier below Misra-Gries (which keeps the
    head) and the exact vocab table (which is corpus-vocabulary-wide).
    DuckDB twin replays the grid math token-for-token
    (_CMS_TOKEN_ESTIMATES_SQL); the ε·N over-count bound and layout
    invariance are pytest-verified. See
    :func:`kgraft.textops.cms_token_counts`."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    return textops.cms_token_counts(
        docs, ["data", "sort", "merge", "stream", "zzz_absent"],
        width=4096, depth=4,
    )


def balanced_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Source-balanced corpus resampling: every source is deterministic-
    hash-downsampled toward HALF the smallest source's size, flattening
    domain dominance before training. The per-source rate derives from
    the corpus itself (bps = min_count·5000 // count, INTEGER arithmetic
    so the SQL twin reproduces the cut exactly), applied through the
    shuffle-free :func:`kgraft.relational.stratified_sample` hash draw.
    Output: per-source original vs kept counts."""
    from .relational import stratified_sample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    counts = pre_aggregate(docs, ["source"], {"n": (None, "count")})
    mn = int(counts["n"].min())
    bps = {
        row["source"]: int(mn * 5000) // int(row["n"])
        for _, row in counts.iterrows()
    }
    kept = stratified_sample(
        docs, "source", "doc_id", {s: b / 10000.0 for s, b in bps.items()}
    )
    kc = pre_aggregate(kept, ["source"], {"n_kept": (None, "count")})
    out = counts.rename(columns={"n": "n_orig"}).merge(kc, on="source", how="left")
    out["n_orig"] = out["n_orig"].astype("int64")
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    return out.sort_values("source", ignore_index=True)[
        ["source", "n_orig", "n_kept"]
    ]


def token_budget_mixture_docs(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled data-mixing under a hard char budget: each
    source gets ``budget_s = (B * sqrt(c_s)) // sum(sqrt(c))`` of the
    half-corpus budget B (alpha=0.5 source upsampling, the multilingual
    sampling temperature idiom — sqrt flattens head sources), then docs
    are admitted in deterministic hash-priority order until the
    source's cumulative chars exceed its budget — exact budget
    satisfaction, unlike a rate-based downsample (contrast
    :func:`balanced_sample_docs`).

    Realization (de-skewed, r4): per-source char totals via map-side
    partials (the weight/budget table is source-scale, driver-held
    like stratified rates); then ONE distributed
    ``sort([source, priority, doc_id])`` — range-partitioned on the
    high-cardinality tuple, so a Zipf-head source spreads over many
    blocks instead of serializing one reducer — and the global
    cumulative-chars cut closes from metadata-scale per-block partials
    exactly like :func:`kgraft.relational.ranked`: pass 1 emits
    (source, first doc_id, rows, chars) per block slice, the driver
    computes per-source char offsets in block order, pass 2 keeps rows
    while ``offset + in-block cumsum <= budget`` and reduces to
    per-(block, source) partials that a map-side-combined aggregate
    finishes. INTEGER arithmetic end to end (floor-sqrt weights,
    floor-divide budgets, int64 cumsum) so the DuckDB twin reproduces
    the cut bit-exactly. Output: per-source kept docs/chars vs budget."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    totals = pre_aggregate(docs, ["source"], {"c": ("n_chars", "sum")})
    budget_total = int(totals["c"].sum()) // 2
    w = {
        r["source"]: int(np.floor(np.sqrt(float(r["c"]))))
        for _, r in totals.iterrows()
    }
    wsum = sum(w.values())
    budgets = {s: (budget_total * wv) // wsum for s, wv in w.items()}

    def add_priority(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        df = df.copy()
        df["__p"] = (ids * 2654435761) % 4294967296
        return df

    sorted_ds = (
        docs.map_batches(add_priority, batch_format="pandas")
        .sort(["source", "__p", "doc_id"])
        .materialize()  # consumed twice: offset partials + the cut pass
    )
    parts = sorted_ds.map_batches(
        lambda df: df.groupby("source", sort=False, as_index=False).agg(
            __c=("n_chars", "sum"), __tb=("doc_id", "first"), __p0=("__p", "first")
        ),
        batch_format="pandas",
        batch_size=None,  # batch == block in BOTH passes
    ).to_pandas()  # blocks x sources-per-block rows: metadata-scale
    # Partials arrive in task-completion order (preserve_order=False is
    # Ray's default) — recover global block order by each slice's first
    # (__p, doc_id) tuple under the distributed sort's own comparator
    # (sort key is (source, __p, doc_id); doc_id is globally unique so
    # first tuples are distinct). r4 ADVICE medium.
    parts = parts.sort_values(
        ["source", "__p0", "__tb"], kind="mergesort", ignore_index=True
    )
    grp = parts.groupby("source", sort=False)
    parts["__coff"] = grp["__c"].cumsum() - parts["__c"]
    offs = {
        (s, int(tb)): int(off)
        for s, tb, off in zip(parts["source"], parts["__tb"], parts["__coff"])
    }
    bref = ray.put((offs, budgets))

    def cut_block(df: pd.DataFrame) -> pd.DataFrame:
        offs, budgets = ray.get(bref)  # source/block-scale, not corpus
        grp = df.groupby("source", sort=False)
        first_tb = grp["doc_id"].transform("first")
        base = np.fromiter(
            (offs[k] for k in zip(df["source"], first_tb.astype(int))),
            dtype=np.int64,
            count=len(df),
        )
        local = grp["n_chars"].cumsum().to_numpy(np.int64)
        b = df["source"].map(budgets).to_numpy(np.int64)
        keep = base + local <= b
        kept = pd.DataFrame(
            {
                "source": df["source"],
                "k": keep.astype(np.int64),
                "ck": np.where(keep, df["n_chars"].to_numpy(np.int64), 0),
            }
        )
        return kept.groupby("source", as_index=False).agg(
            n_docs=("k", "sum"), chars_kept=("ck", "sum")
        )

    partial = sorted_ds.map_batches(
        cut_block, batch_format="pandas", batch_size=None
    )
    out = pre_aggregate(
        partial,
        ["source"],
        {"n_docs": ("n_docs", "sum"), "chars_kept": ("chars_kept", "sum")},
    )
    out["budget"] = out["source"].map(budgets)
    for c in ("n_docs", "chars_kept", "budget"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source", ignore_index=True)[
        ["source", "n_docs", "chars_kept", "budget"]
    ]


_TOKEN_BUDGET_MIXTURE_SQL = """
WITH c AS (SELECT source, sum(n_chars) AS c FROM documents GROUP BY source),
w AS (SELECT source, CAST(floor(sqrt(c)) AS BIGINT) AS w FROM c),
b AS (
  SELECT w.source,
         ((SELECT sum(c) FROM c) // 2) * w.w // (SELECT sum(w) FROM w) AS budget
  FROM w
),
s AS (
  SELECT d.source, d.n_chars,
         sum(d.n_chars) OVER (
           PARTITION BY d.source
           ORDER BY (d.doc_id::HUGEINT * 2654435761) % 4294967296, d.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM documents d
)
SELECT b.source,
       CAST(count(s.source) FILTER (WHERE s.cum <= b.budget) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(s.n_chars) FILTER (WHERE s.cum <= b.budget), 0) AS BIGINT)
         AS chars_kept,
       CAST(b.budget AS BIGINT) AS budget
FROM b LEFT JOIN s ON s.source = b.source
GROUP BY b.source, b.budget
ORDER BY b.source
"""


_BALANCED_SAMPLE_SQL = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
m AS (SELECT min(n) AS mn FROM c),
r AS (SELECT c.source, (m.mn * 5000) // c.n AS bps FROM c CROSS JOIN m),
k AS (
  SELECT d.source
  FROM documents d JOIN r USING (source)
  WHERE (d.doc_id::HUGEINT * 2654435761) % 4294967296 % 10000 < r.bps
)
SELECT c.source, c.n AS n_orig,
       CAST(COALESCE((SELECT count(*) FROM k WHERE k.source = c.source), 0)
            AS BIGINT) AS n_kept
FROM c ORDER BY c.source
"""


def dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Curation dashboard view: per-source near-duplication rate —
    fraction of each source's documents whose near-dup group
    representative is a different doc. Composes
    :func:`kgraft.textops.near_dup_groups` with the payload-carrying
    labeling scan (source rides along, no corpus re-join). DuckDB twin:
    exact all-pairs 4-gram Jaccard + transitive closure over the
    documents view (_DUP_RATE_BY_SOURCE_SQL) — a full independent
    recomputation of the near-dup groups."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    groups = textops.near_dup_groups(docs, threshold=0.7, keep_cols=["source"])
    flags = groups.map_batches(
        lambda df: pd.DataFrame(
            {
                "source": df["source"],
                "is_dup": (df["doc_id"] != df["dup_group"]).astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    out = pre_aggregate(
        flags, ["source"], {"n_docs": (None, "count"), "n_dups": ("is_dup", "sum")}
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_dups"] = out["n_dups"].astype("int64")
    out["dup_rate"] = sql_round((out["n_dups"] / out["n_docs"]), 6)
    return out.sort_values("source", ignore_index=True)[
        ["source", "n_docs", "n_dups", "dup_rate"]
    ]


def lexical_diversity_docs(sf_dir: str) -> pd.DataFrame:
    """Per-source lexical diversity: mean type-token ratio (distinct
    tokens / tokens per document) — the vocabulary-richness quality
    signal (template spam scores low, natural prose high). Entirely
    in-batch per document (a doc's text lives in one row), per-source
    means reduce map-side; zero-token docs are excluded like SQL's
    NULL-skipping AVG."""
    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def ttr(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.findall(r"[a-z0-9_]+")
        n = toks.str.len().to_numpy(dtype="float64")
        nd = toks.map(lambda t: len(set(t))).to_numpy(dtype="float64")
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(n > 0, nd / n, np.nan)
        return pd.DataFrame({"source": df["source"], "ttr": r})

    out = pre_aggregate(
        docs.map_batches(ttr, batch_format="pandas"),
        ["source"],
        {"n_docs": (None, "count"), "mean_ttr": ("ttr", "mean")},
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["mean_ttr"] = sql_round(out["mean_ttr"], 6)
    return out.sort_values("source", ignore_index=True)[
        ["source", "n_docs", "mean_ttr"]
    ]


_LEXICAL_DIVERSITY_SQL = """
WITH t AS (
  SELECT source,
         regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(avg(CASE WHEN len(ts) > 0
                      THEN len(list_distinct(ts)) * 1.0 / len(ts) END), 6)
         AS mean_ttr
FROM t GROUP BY source ORDER BY source
"""


def readability_docs(sf_dir: str) -> pd.DataFrame:
    """Per-source readability proxies: mean words-per-sentence and
    chars-per-word (the syllable-free terms of Flesch-style scores —
    long sentences of long words read hard; token-soup spam shows
    degenerate values). One shuffle-free vectorized pass; sentence =
    a run of [.!?], floored at 1 per non-empty doc on both sides."""
    docs = read_table(sf_dir, "documents", columns=["source", "text"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        toks = txt.str.lower().str.findall(r"[a-z0-9_]+")
        n_words = toks.str.len().to_numpy(dtype="float64")
        n_chars = toks.map(lambda t: sum(len(w) for w in t)).to_numpy(
            dtype="float64"
        )
        n_sent = txt.str.count(r"[.!?]+").to_numpy(dtype="float64")
        n_sent = np.maximum(n_sent, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            wps = np.where(n_words > 0, n_words / n_sent, np.nan)
            cpw = np.where(n_words > 0, n_chars / n_words, np.nan)
        return pd.DataFrame(
            {"source": df["source"], "wps": wps, "cpw": cpw}
        )

    out = pre_aggregate(
        docs.map_batches(feats, batch_format="pandas"),
        ["source"],
        {
            "n_docs": (None, "count"),
            "words_per_sentence": ("wps", "mean"),
            "chars_per_word": ("cpw", "mean"),
        },
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["words_per_sentence"] = sql_round(out["words_per_sentence"], 6)
    out["chars_per_word"] = sql_round(out["chars_per_word"], 6)
    return out.sort_values("source", ignore_index=True)[
        ["source", "n_docs", "words_per_sentence", "chars_per_word"]
    ]


_READABILITY_SQL = """
WITH t AS (
  SELECT source,
         regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sent
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(avg(CASE WHEN len(ts) > 0
                      THEN len(ts) * 1.0 / n_sent END), 6)
         AS words_per_sentence,
       round(avg(CASE WHEN len(ts) > 0
                      THEN list_sum(list_transform(ts, w -> length(w))) * 1.0
                           / len(ts) END), 6)
         AS chars_per_word
FROM t GROUP BY source ORDER BY source
"""


def zipf_alpha_docs(sf_dir: str) -> pd.DataFrame:
    """Zipf-law fit of the corpus vocabulary: OLS slope of ln(freq) on
    ln(rank) over the top-200 tokens (natural text ≈ −1; synthetic or
    boilerplate-heavy corpora drift) — a one-number corpus-health
    diagnostic. The vocab counts reduce map-side, the top-200 cut is
    distributed, and the regression runs on the 200-row head."""
    docs = read_table(sf_dir, "documents", columns=["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9_]+").explode()
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(str), "n": vc.to_numpy(dtype="int64")}
        )

    agg = pre_aggregate_ds(
        docs.map_batches(counts, batch_format="pandas"), "token", {"n": ("n", "sum")}
    )
    head = (
        agg.sort(["n", "token"], descending=[True, False]).limit(200).to_pandas()
    )
    rank = np.arange(1, len(head) + 1, dtype="float64")
    x = np.log(rank)
    y = np.log(head["n"].to_numpy(dtype="float64"))
    n = float(len(x))
    sx, sy, sxx, sxy = x.sum(), y.sum(), (x * x).sum(), (x * y).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "n_tokens_fit": [np.int64(n)],
            "zipf_alpha": [sql_round(-slope, 6)],
            "log_intercept": [sql_round(intercept, 6)],
        }
    )


_ZIPF_ALPHA_SQL = """
WITH tok AS (
  SELECT t AS token, count(*)::DOUBLE AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents)
  GROUP BY t
), head AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank
  FROM tok ORDER BY n DESC, token LIMIT 200
)
SELECT CAST(count(*) AS BIGINT) AS n_tokens_fit,
       round(-regr_slope(ln(n), ln(rank)), 6) AS zipf_alpha,
       round(regr_intercept(ln(n), ln(rank)), 6) AS log_intercept
FROM head
"""


def pmi_collocations_docs(sf_dir: str) -> pd.DataFrame:
    """Top-20 collocations by pointwise mutual information (Church &
    Hanks 1990): PMI = ln(p(w1 w2) / (p(w1) p(w2))), bigram probability
    over adjacent-pair count, unigram probabilities over token counts,
    minimum bigram count 5 (the published guard against PMI's
    rare-pair bias). Scale shape: the SAME shifted-explode pass emits
    (w1, w2, n) bigram partials and (t, n) unigram partials; marginals
    attach through two bucketed string-keyed joins (vocab-scale sides,
    never broadcast); the top-k is a distributed sort-limit."""
    from .relational import hash_join

    docs = read_table(sf_dir, "documents", columns=["text"])

    def bigram_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9_]+")
        idx = pd.RangeIndex(len(df)).repeat(toks.str.len())
        ex = pd.Series(
            np.concatenate(toks.to_numpy())
            if len(df) and int(toks.str.len().sum())
            else np.empty(0, dtype=object),
            index=idx,
        )
        nxt = ex.shift(-1)
        same = (pd.Series(idx, index=idx).shift(-1) == idx).fillna(False)
        g = pd.DataFrame({"w1": ex[same], "w2": nxt[same]})
        vc = g.groupby(["w1", "w2"], sort=False).size().rename("n").reset_index()
        return vc

    def unigram_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9_]+")
        arrs = toks.to_numpy()
        if not len(arrs) or not int(toks.str.len().sum()):
            return pd.DataFrame(
                {"t": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(np.concatenate(arrs), dtype=object).value_counts()
        return pd.DataFrame({"t": vc.index.to_numpy(), "n": vc.to_numpy()})

    bi = pre_aggregate_ds(
        docs.map_batches(bigram_counts, batch_format="pandas"),
        ["w1", "w2"],
        {"n_ab": ("n", "sum")},
    ).materialize()
    uni = pre_aggregate_ds(
        docs.map_batches(unigram_counts, batch_format="pandas"),
        ["t"],
        {"n_t": ("n", "sum")},
    ).materialize()
    n_bi = float(bi.sum("n_ab"))
    n_uni = float(uni.sum("n_t"))

    cand = bi.map_batches(
        lambda df: df[df["n_ab"] >= 5], batch_format="pandas"
    )
    bi_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("n_ab", pa.int64())]
    )
    j1 = hash_join(
        cand.map_batches(
            lambda df: df.rename(columns={"w1": "t"}), batch_format="pandas"
        ),
        uni.map_batches(
            lambda df: df.rename(columns={"n_t": "n_a"}), batch_format="pandas"
        ),
        on="t",
        left_schema=pa.schema(
            [("t", pa.string()), ("w2", pa.string()), ("n_ab", pa.int64())]
        ),
        right_schema=pa.schema([("t", pa.string()), ("n_a", pa.int64())]),
    ).map_batches(
        lambda df: df.rename(columns={"t": "w1", "w2": "t"}),
        batch_format="pandas",
    )
    j2 = hash_join(
        j1,
        uni.map_batches(
            lambda df: df.rename(columns={"n_t": "n_b"}), batch_format="pandas"
        ),
        on="t",
        left_schema=pa.schema(
            [
                ("w1", pa.string()),
                ("t", pa.string()),
                ("n_ab", pa.int64()),
                ("n_a", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("t", pa.string()), ("n_b", pa.int64())]),
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        p_ab = df["n_ab"].to_numpy(dtype="float64") / n_bi
        p_a = df["n_a"].to_numpy(dtype="float64") / n_uni
        p_b = df["n_b"].to_numpy(dtype="float64") / n_uni
        return pd.DataFrame(
            {
                "w1": df["w1"],
                "w2": df["t"],
                "n_ab": df["n_ab"].astype("int64"),
                "pmi": sql_round(np.log(p_ab / (p_a * p_b)), 6),
            }
        )

    out = (
        j2.map_batches(score, batch_format="pandas")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(20)
        .to_pandas()
    )
    return out[["w1", "w2", "n_ab", "pmi"]].reset_index(drop=True)


_PMI_SQL = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents
), bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab FROM (
    SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
           unnest(list_transform(range(1, len(ts)), i -> ts[i + 1])) AS w2
    FROM toks)
  GROUP BY w1, w2
), uni AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n_t
  FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY t
), tot AS (
  SELECT (SELECT sum(n_ab) FROM bi)::DOUBLE AS n_bi,
         (SELECT sum(n_t) FROM uni)::DOUBLE AS n_uni
)
SELECT bi.w1, bi.w2, bi.n_ab,
       round(ln((bi.n_ab / tot.n_bi)
                / ((a.n_t / tot.n_uni) * (b.n_t / tot.n_uni))), 6) AS pmi
FROM bi, tot
JOIN uni a ON a.t = bi.w1
JOIN uni b ON b.t = bi.w2
WHERE bi.n_ab >= 5
ORDER BY pmi DESC, bi.w1, bi.w2 LIMIT 20
"""


def event_value_histogram(sf_dir: str) -> pd.DataFrame:
    """20-bin equi-width histogram of event values over [0, 500) —
    see :func:`kgraft.relational.histogram`."""
    from .relational import histogram

    ds = read_table(sf_dir, "events", columns=["value"])
    out = histogram(ds, "value", lo=0.0, hi=500.0, n_bins=20).to_pandas()
    out["bin"] = out["bin"].astype("int64")
    return out.sort_values("bin", ignore_index=True)


_EVENT_HIST_SQL = """
SELECT bin, round(bin * 25.0, 6) AS bin_lo, count(*) AS n
FROM (
  SELECT least(CAST(floor((value - 0.0) / 25.0) AS BIGINT), 19) AS bin
  FROM events WHERE value >= 0.0 AND value < 500.0
)
GROUP BY bin ORDER BY bin
"""


def orders_by_dow(sf_dir: str) -> pd.DataFrame:
    """Order volume by ISO day-of-week (date scalar-function coverage:
    dow extraction is one vectorized ``dt`` accessor per batch; the
    7-key aggregate is partial-combined)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def add_dow(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                # ISO: Monday=1..Sunday=7 (pandas dayofweek is Monday=0)
                "isodow": (
                    df["o_orderdate"].dt.dayofweek.astype("int64") + 1
                ),
                "o_totalprice": df["o_totalprice"],
            }
        )
        return out

    out = pre_aggregate(
        ds.map_batches(add_dow, batch_format="pandas"),
        ["isodow"],
        {"n_orders": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    out["isodow"] = out["isodow"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total"] = sql_round(out["total"], 4)
    return out.sort_values("isodow", ignore_index=True)


_ORDERS_DOW_SQL = """
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
       count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
FROM orders GROUP BY 1 ORDER BY 1
"""


def wavg_price_by_flag(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted average extended price per return flag —
    the `wavg` algebraic aggregate kind of ``pre_aggregate``."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"]
    )
    out = pre_aggregate(
        li,
        ["l_returnflag"],
        {"wavg_price": (("l_extendedprice", "l_quantity"), "wavg")},
    )
    out["wavg_price"] = sql_round(out["wavg_price"], 4)
    return out.sort_values("l_returnflag", ignore_index=True)


_WAVG_SQL = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) /
             sum(CASE WHEN l_extendedprice IS NOT NULL THEN l_quantity END), 4)
           AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def regr_price_by_flag(sf_dir: str) -> pd.DataFrame:
    """Per-group least-squares line price = slope*quantity + intercept —
    the ``regr_slope``/``regr_intercept`` algebraic kinds of
    ``pre_aggregate``: the five cross-moment sums combine map-side, one
    partial row per (flag, batch) crosses the exchange."""
    li = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"]
    )
    out = pre_aggregate(
        li,
        ["l_returnflag"],
        {
            "slope": (("l_extendedprice", "l_quantity"), "regr_slope"),
            "icept": (("l_extendedprice", "l_quantity"), "regr_intercept"),
        },
    )
    out["slope"] = sql_round(out["slope"], 6)
    out["icept"] = sql_round(out["icept"], 4)
    return out.sort_values("l_returnflag", ignore_index=True)


def corr_matrix_lineitem(sf_dir: str) -> pd.DataFrame:
    """Per-group Pearson correlation MATRIX (all 6 pairs of 4 numeric
    columns) in ONE distributed pass: every pairwise ``corr`` kind of
    ``pre_aggregate`` shares the same map-side cross-moment partials,
    so the exchange still moves one partial row per (flag, batch) —
    k^2 statistics for the price of one shuffle, the shape a feature-
    engineering profiler runs over a 100 TB table."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax"],
    )
    pairs = {
        "qty_price": ("l_quantity", "l_extendedprice"),
        "qty_disc": ("l_quantity", "l_discount"),
        "qty_tax": ("l_quantity", "l_tax"),
        "price_disc": ("l_extendedprice", "l_discount"),
        "price_tax": ("l_extendedprice", "l_tax"),
        "disc_tax": ("l_discount", "l_tax"),
    }
    out = pre_aggregate(
        li, ["l_returnflag"], {k: (v, "corr") for k, v in pairs.items()}
    )
    for k in pairs:
        out[k] = sql_round(out[k], 6)
    return out.sort_values("l_returnflag", ignore_index=True)


def ols_price_by_flag(sf_dir: str) -> pd.DataFrame:
    """Grouped MULTIVARIATE least-squares: fit price = b0 +
    b1*quantity + b2*discount per returnflag with
    :func:`kgraft.relational.ols_fit` — map-side X'X / X'y moment
    partials over one exchange, (k+1)-dim solve per group on the
    driver. The DuckDB twin is the closed-form 2-feature normal-
    equation solution written in var_pop/covar_pop algebra."""
    from .relational import ols_fit

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity", "l_discount"],
    )
    out = ols_fit(
        li, ["l_returnflag"], "l_extendedprice", ["l_quantity", "l_discount"]
    )
    out["icept"] = sql_round(out["icept"], 4)
    out["coef_l_quantity"] = sql_round(out["coef_l_quantity"], 4)
    out["coef_l_discount"] = sql_round(out["coef_l_discount"], 4)
    out["r2"] = sql_round(out["r2"], 6)
    return out.sort_values("l_returnflag", ignore_index=True)


def skyline_parts(sf_dir: str) -> pd.DataFrame:
    """Pareto frontier of the part catalog — the distinct
    (retailprice, size) points where no other part is both cheaper-or-
    equal AND bigger-or-equal with one strict: the classic SKYLINE
    operator. Distributed as a pure map pass: skyline is an exact
    combiner, so each batch emits only its local frontier (vectorized
    sort-sweep) and the driver sweeps the tiny union once
    (:func:`kgraft.relational.skyline2d`). The DuckDB twin is the
    NOT EXISTS dominance anti-join."""
    from .relational import skyline2d

    part = read_table(sf_dir, "part", columns=["p_retailprice", "p_size"])
    out = skyline2d(part, "p_retailprice", "p_size",
                    minimize_x=True, maximize_y=True)
    out["p_retailprice"] = sql_round(out["p_retailprice"], 2)
    out["p_size"] = out["p_size"].astype("int64")
    return out


_SKYLINE_SQL = """
WITH d AS (SELECT DISTINCT p_retailprice, p_size FROM part)
SELECT round(p.p_retailprice, 2) AS p_retailprice,
       CAST(p.p_size AS BIGINT) AS p_size
FROM d p
WHERE NOT EXISTS (
  SELECT 1 FROM d q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p_retailprice, p_size
"""


_OLS_SQL = """
WITH m AS (
  SELECT l_returnflag,
         avg(l_extendedprice) AS my, avg(l_quantity) AS m1, avg(l_discount) AS m2,
         var_pop(l_quantity) AS v1, var_pop(l_discount) AS v2,
         var_pop(l_extendedprice) AS vy,
         covar_pop(l_quantity, l_discount) AS c12,
         covar_pop(l_quantity, l_extendedprice) AS c1y,
         covar_pop(l_discount, l_extendedprice) AS c2y
  FROM lineitem GROUP BY l_returnflag
), s AS (
  SELECT l_returnflag, my, m1, m2, vy, c1y, c2y,
         (c1y * v2 - c2y * c12) / (v1 * v2 - c12 * c12) AS b1,
         (c2y * v1 - c1y * c12) / (v1 * v2 - c12 * c12) AS b2
  FROM m
)
SELECT l_returnflag,
       round(my - b1 * m1 - b2 * m2, 4) AS icept,
       round(b1, 4) AS coef_l_quantity,
       round(b2, 4) AS coef_l_discount,
       round((b1 * c1y + b2 * c2y) / vy, 6) AS r2
FROM s ORDER BY l_returnflag
"""


def benford_order_totals(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of order totals — the forensic
    data-quality check (fabricated or unit-mixed monetary columns break
    the log-uniform leading-digit law). One map-side (digit, count)
    partial per batch (leading digit by exact integer halving, no
    string round-trip), a 9-row reduce, then the chi-square divergence
    statistic against log10(1 + 1/d) on the driver. DuckDB twin takes
    the digit via substr of the BIGINT cast — identical by
    construction."""
    orders = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def digits(df: pd.DataFrame) -> pd.DataFrame:
        x = df["o_totalprice"].to_numpy(np.float64)
        d = x[x >= 1.0].astype(np.int64)
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        return pd.DataFrame({"digit": d, "n": np.ones(len(d), dtype=np.int64)})

    out = pre_aggregate(
        orders.map_batches(digits, batch_format="pandas"),
        ["digit"],
        {"n": ("n", "sum")},
    ).sort_values("digit", ignore_index=True)
    out["n"] = out["n"].astype("int64")
    total = float(out["n"].sum())
    exp = np.log10(1.0 + 1.0 / out["digit"].to_numpy(np.float64))
    out["observed"] = sql_round((out["n"] / total), 6)
    out["expected"] = sql_round(exp, 6)
    chi2 = float((((out["n"] - total * exp) ** 2) / (total * exp)).sum())
    out["chi2"] = sql_round(chi2, 4)
    out["digit"] = out["digit"].astype("int64")
    return out[["digit", "n", "observed", "expected", "chi2"]]


_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
              1, 1) AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
cnt AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
tot AS (SELECT sum(n) AS total FROM cnt),
st AS (
  SELECT sum(pow(n - total * log10(1 + 1.0 / digit), 2)
             / (total * log10(1 + 1.0 / digit))) AS chi2
  FROM cnt CROSS JOIN tot
)
SELECT CAST(cnt.digit AS BIGINT) AS digit, CAST(cnt.n AS BIGINT) AS n,
       round(cnt.n / tot.total, 6) AS observed,
       round(log10(1 + 1.0 / cnt.digit), 6) AS expected,
       round(st.chi2, 4) AS chi2
FROM cnt CROSS JOIN tot CROSS JOIN st ORDER BY digit
"""


def keyword_assoc_docs(sf_dir: str) -> pd.DataFrame:
    """Dunning log-likelihood (G^2, 1993) keyword association with the
    even-suffix source label — the feature-selection pass that ranks
    which tokens most separate two corpora. Presence/absence doc counts
    per token reduce map-side through one token exchange (a doc
    counts once per distinct token), label doc totals are a bounded
    2-row aggregate, and G^2 is computed vectorized over the
    vocab-scale count table; top-20 by G^2. Full DuckDB twin."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def presence(df: pd.DataFrame) -> pd.DataFrame:
        suffix = df["source"].str.extract(r"(\d+)$", expand=False).fillna("1")
        lab = (suffix.astype("int64") % 2 == 0).astype("int64")
        ex = pd.DataFrame(
            {
                "label": lab,
                "t": df["text"].str.lower().str.findall(r"[a-z0-9_]+").map(
                    lambda ts: list(set(ts))
                ),
            }
        ).explode("t")
        ex = ex.dropna(subset=["t"])
        g = ex.groupby(["t", "label"], sort=False).size().reset_index(name="c")
        p = g.pivot_table(index="t", columns="label", values="c",
                          aggfunc="sum", fill_value=0).reset_index()
        for col in (0, 1):
            if col not in p.columns:
                p[col] = 0
        return pd.DataFrame(
            {"t": p["t"].astype(str), "a1": p[1].astype("int64"),
             "a0": p[0].astype("int64")}
        )

    vocab = pre_aggregate_ds(
        docs.map_batches(presence, batch_format="pandas"),
        "t",
        {"a1": ("a1", "sum"), "a0": ("a0", "sum")},
    )
    lab_counts = pre_aggregate(
        docs.map_batches(
            lambda df: pd.DataFrame(
                {
                    "label": (
                        df["source"]
                        .str.extract(r"(\d+)$", expand=False)
                        .fillna("1")
                        .astype("int64")
                        % 2
                        == 0
                    ).astype("int64")
                }
            ),
            batch_format="pandas",
        ),
        ["label"],
        {"n": (None, "count")},
    ).set_index("label")["n"]
    n1, n0 = float(lab_counts.get(1, 0)), float(lab_counts.get(0, 0))

    def g2(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a1"].to_numpy(np.float64)  # docs with t, label 1
        b = df["a0"].to_numpy(np.float64)  # docs with t, label 0
        c = n1 - a
        d = n0 - b
        n = n1 + n0

        def xlx(x):
            return np.where(x > 0, x * np.log(np.maximum(x, 1e-300)), 0.0)

        ll = 2.0 * (
            xlx(a) + xlx(b) + xlx(c) + xlx(d) + xlx(n)
            - xlx(a + b) - xlx(c + d) - xlx(a + c) - xlx(b + d)
        )
        return pd.DataFrame(
            {
                "token": df["t"].astype(str),
                "n_docs_even": df["a1"].astype("int64"),
                "n_docs_odd": df["a0"].astype("int64"),
                "g2": sql_round(ll, 6),
            }
        )

    out = (
        vocab.map_batches(g2, batch_format="pandas")
        .sort(["g2", "token"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    return out.reset_index(drop=True)


_KEYWORD_ASSOC_SQL = """
WITH lab AS (
  SELECT doc_id,
         CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) % 2 = 0
              THEN 1 ELSE 0 END AS label,
         lower(text) AS lt
  FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, label,
         unnest(regexp_extract_all(lt, '[a-z0-9_]+')) AS t
  FROM lab
),
tots AS (
  SELECT sum(CASE WHEN label = 1 THEN 1.0 ELSE 0 END) AS n1,
         sum(CASE WHEN label = 0 THEN 1.0 ELSE 0 END) AS n0
  FROM lab
),
cnt AS (
  SELECT t,
         sum(CASE WHEN label = 1 THEN 1.0 ELSE 0 END) AS a,
         sum(CASE WHEN label = 0 THEN 1.0 ELSE 0 END) AS b
  FROM tok GROUP BY t
),
g AS (
  SELECT t, CAST(a AS BIGINT) AS n_docs_even, CAST(b AS BIGINT) AS n_docs_odd,
         2.0 * (
           (CASE WHEN a > 0 THEN a * ln(a) ELSE 0 END)
           + (CASE WHEN b > 0 THEN b * ln(b) ELSE 0 END)
           + (CASE WHEN n1 - a > 0 THEN (n1 - a) * ln(n1 - a) ELSE 0 END)
           + (CASE WHEN n0 - b > 0 THEN (n0 - b) * ln(n0 - b) ELSE 0 END)
           + (n1 + n0) * ln(n1 + n0)
           - (CASE WHEN a + b > 0 THEN (a + b) * ln(a + b) ELSE 0 END)
           - (CASE WHEN n1 + n0 - a - b > 0
                   THEN (n1 + n0 - a - b) * ln(n1 + n0 - a - b) ELSE 0 END)
           - (CASE WHEN n1 > 0 THEN n1 * ln(n1) ELSE 0 END)
           - (CASE WHEN n0 > 0 THEN n0 * ln(n0) ELSE 0 END)
         ) AS g2
  FROM cnt CROSS JOIN tots
)
SELECT t AS token, n_docs_even, n_docs_odd, round(g2, 6) AS g2
FROM g ORDER BY round(g2, 6) DESC, token LIMIT 20
"""


def nb_source_logodds(sf_dir: str) -> pd.DataFrame:
    """Multinomial Naive Bayes trained AND scored distributed, with a
    full DuckDB twin — the count-based sibling of the GD-trained
    logistic filter (`quality_classifier_docs`, which is rows-only):
    labels are the deterministic even-suffix source split, per-(label,
    token) counts reduce map-side through one token exchange, Laplace
    log-odds weights attach back to per-doc token counts via the
    bucketed STRING-key join (web vocab never broadcasts), per-doc
    scores reduce on the doc key, and the bounded source rollup reports
    mean posterior log-odds. Every arithmetic step is SQL-replayable."""
    from .relational import hash_join

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def label_of(src: pd.Series) -> pd.Series:
        suffix = src.str.extract(r"(\d+)$", expand=False).fillna("1")
        return (suffix.astype("int64") % 2 == 0).astype("int64")

    def tok_counts(df: pd.DataFrame) -> pd.DataFrame:
        lab = label_of(df["source"])
        ex = pd.DataFrame(
            {
                "label": lab,
                "t": df["text"].str.lower().str.findall(r"[a-z0-9_]+"),
            }
        ).explode("t")
        ex = ex.dropna(subset=["t"])
        g = ex.groupby(["t", "label"], sort=False).size().reset_index(name="c")
        p = g.pivot_table(index="t", columns="label", values="c",
                          aggfunc="sum", fill_value=0).reset_index()
        for col in (0, 1):
            if col not in p.columns:
                p[col] = 0
        return pd.DataFrame(
            {"t": p["t"].astype(str), "n0": p[0].astype("int64"),
             "n1": p[1].astype("int64")}
        )

    vocab = pre_aggregate_ds(
        docs.map_batches(tok_counts, batch_format="pandas"),
        "t",
        {"n0": ("n0", "sum"), "n1": ("n1", "sum")},
    ).materialize()  # two consumers: totals pass + weight join
    tots = pre_aggregate(
        vocab.map_batches(
            lambda df: pd.DataFrame(
                {"k": np.zeros(len(df), dtype=np.int64),
                 "n0": df["n0"], "n1": df["n1"]}
            ),
            batch_format="pandas",
        ),
        ["k"],
        {"N0": ("n0", "sum"), "N1": ("n1", "sum"), "V": (None, "count")},
    )
    n0_tot, n1_tot, v = (float(tots["N0"][0]), float(tots["N1"][0]),
                         float(tots["V"][0]))

    weights = vocab.map_batches(
        lambda df: pd.DataFrame(
            {
                "t": df["t"].astype(str),
                "w": np.log((df["n1"].to_numpy(np.float64) + 1.0) / (n1_tot + v))
                - np.log((df["n0"].to_numpy(np.float64) + 1.0) / (n0_tot + v)),
            }
        ),
        batch_format="pandas",
    )

    # prior log-odds from per-label doc counts (bounded: 2 rows)
    lab_counts = pre_aggregate(
        docs.map_batches(
            lambda df: pd.DataFrame({"label": label_of(df["source"])}),
            batch_format="pandas",
        ),
        ["label"],
        {"n": (None, "count")},
    ).set_index("label")["n"]
    prior = float(np.log(lab_counts.get(1, 1) / lab_counts.get(0, 1)))

    def doc_tokens(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "t": df["text"].str.lower().str.findall(r"[a-z0-9_]+"),
            }
        ).explode("t")
        ex = ex.dropna(subset=["t"])
        g = ex.groupby(["doc_id", "t"], sort=False).size().reset_index(name="c")
        return pd.DataFrame(
            {"doc_id": g["doc_id"].astype("int64"), "t": g["t"].astype(str),
             "c": g["c"].astype("int64")}
        )

    scored = hash_join(
        docs.map_batches(doc_tokens, batch_format="pandas"),
        weights,
        on="t",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("t", pa.string()), ("c", pa.int64())]
        ),
        right_schema=pa.schema([("t", pa.string()), ("w", pa.float64())]),
    ).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"],
             "s": df["c"].to_numpy(np.float64) * df["w"].to_numpy(np.float64)}
        ),
        batch_format="pandas",
    )
    doc_scores = pre_aggregate_ds(scored, "doc_id", {"s": ("s", "sum")})

    spine = docs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "source": df["source"].astype(str)}
        ),
        batch_format="pandas",
    )
    both = hash_join(
        spine,
        doc_scores,
        on="doc_id",
        how="left",
        left_schema=pa.schema([("doc_id", pa.int64()), ("source", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("s", pa.float64())]),
    )
    out = pre_aggregate(
        both.map_batches(
            lambda df: pd.DataFrame(
                {"source": df["source"],
                 "lo": prior + df["s"].fillna(0.0).to_numpy(np.float64)}
            ),
            batch_format="pandas",
        ),
        ["source"],
        {"mean_logodds": ("lo", "mean"), "n_docs": (None, "count")},
    )
    out["mean_logodds"] = sql_round(out["mean_logodds"], 6)
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("source", ignore_index=True)


_NB_SQL = """
WITH lab AS (
  SELECT doc_id, source,
         CASE WHEN CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) % 2 = 0
              THEN 1 ELSE 0 END AS label,
         lower(text) AS lt
  FROM documents
),
tok AS (
  SELECT doc_id, label, unnest(regexp_extract_all(lt, '[a-z0-9_]+')) AS t
  FROM lab
),
cnt AS (
  SELECT t,
         sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS n0
  FROM tok GROUP BY t
),
tot AS (SELECT sum(n1) AS big_n1, sum(n0) AS big_n0, count(*) AS v FROM cnt),
w AS (
  SELECT t, ln((n1 + 1.0) / (big_n1 + v)) - ln((n0 + 1.0) / (big_n0 + v)) AS w
  FROM cnt CROSS JOIN tot
),
prior AS (
  SELECT ln(sum(CASE WHEN label = 1 THEN 1.0 ELSE 0 END)
            / sum(CASE WHEN label = 0 THEN 1.0 ELSE 0 END)) AS pd
  FROM lab
),
docsum AS (
  SELECT tok.doc_id, sum(w.w) AS s FROM tok JOIN w ON tok.t = w.t
  GROUP BY tok.doc_id
)
SELECT lab.source,
       round(avg(prior.pd + coalesce(docsum.s, 0.0)), 6) AS mean_logodds,
       CAST(count(*) AS BIGINT) AS n_docs
FROM lab CROSS JOIN prior LEFT JOIN docsum ON lab.doc_id = docsum.doc_id
GROUP BY lab.source ORDER BY lab.source
"""


_CORR_MATRIX_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price,
       round(corr(l_quantity, l_discount), 6) AS qty_disc,
       round(corr(l_quantity, l_tax), 6) AS qty_tax,
       round(corr(l_extendedprice, l_discount), 6) AS price_disc,
       round(corr(l_extendedprice, l_tax), 6) AS price_tax,
       round(corr(l_discount, l_tax), 6) AS disc_tax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


_REGR_SQL = """
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def event_user_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy (nats) of the per-event-type user distribution —
    how concentrated each event type is on few users. Map side collapses
    raw rows to (type, user, count) partials, so the exchange carries
    distinct-pair-scale rows (relational.grouped_entropy)."""
    from .relational import grouped_entropy

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    out = grouped_entropy(ev, "event_type", "user_id").to_pandas()
    out["entropy"] = sql_round(out["entropy"], 6)
    return out.sort_values("event_type", ignore_index=True)


_EVENT_ENTROPY_SQL = """
WITH c AS (
  SELECT event_type, user_id, count(*)::DOUBLE AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
), t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.event_type, round(-sum((n / tot) * ln(n / tot)), 6) AS entropy
FROM c JOIN t USING (event_type) GROUP BY c.event_type ORDER BY 1
"""


def robust_zscore_events(sf_dir: str) -> pd.DataFrame:
    """Outlier-resistant per-type standardization of event values:
    (x - median) / (1.4826 * MAD). One distinct-value histogram exchange
    computes both statistics; the per-row transform is shuffle-free
    (relational.robust_standardize)."""
    from .relational import robust_standardize

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = robust_standardize(ev, "event_type", "value").to_pandas()
    out["rz"] = sql_round(out["rz"], 6)
    return out[["event_id", "rz"]].sort_values("event_id", ignore_index=True)


_ROBUST_Z_SQL = """
WITH s AS (
  SELECT event_type, median(value) AS med, mad(value) AS mad
  FROM events GROUP BY 1
)
SELECT e.event_id,
       round(CASE WHEN 1.4826 * mad = 0 THEN NULL
                  ELSE (value - med) / (1.4826 * mad) END, 6) AS rz
FROM events e JOIN s USING (event_type) ORDER BY event_id
"""


def dedup_segments_docs(sf_dir: str):
    """Within-document duplicate-segment removal (MassiveText repeated-
    line dedup; the synthetic docs are newline-less so the segment
    separator is the space token) — shuffle-free single pass
    (textops.remove_duplicate_segments)."""
    from .textops import remove_duplicate_segments

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return remove_duplicate_segments(docs, sep=" ")


_DEDUP_SEGMENTS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
), firsts AS (SELECT doc_id, tok, min(i) AS i FROM toks GROUP BY doc_id, tok)
SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
FROM firsts GROUP BY doc_id
"""


def strip_boilerplate_docs(sf_dir: str):
    """Cross-document boilerplate removal: segments present in >= 60 %
    of all documents stripped everywhere. Pass 1 is a vocab-scale
    distinct-doc frequency exchange; pass 2 broadcasts the small
    frequent set and rewrites shuffle-free
    (textops.remove_frequent_segments)."""
    from .textops import remove_frequent_segments

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return remove_frequent_segments(docs, sep=" ", min_frac=0.6)


_STRIP_BOILERPLATE_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
), freq AS (
  SELECT tok FROM toks GROUP BY tok
  HAVING count(DISTINCT doc_id) >= 0.6 * (SELECT count(*) FROM documents)
)
SELECT doc_id,
       coalesce(string_agg(tok, ' ' ORDER BY i)
                FILTER (WHERE tok NOT IN (SELECT tok FROM freq)), '') AS text
FROM toks GROUP BY doc_id
"""


def global_dedup_segments_docs(sf_dir: str):
    """Corpus-wide segment dedup with document reassembly (CCNet
    paragraph dedup): each segment survives once, in its lowest-
    (doc_id, position) occurrence; docs rebuild from survivors. Two
    map-side-reduced exchanges, survivor set never leaves the cluster
    (textops.dedup_segments_global)."""
    from .textops import dedup_segments_global

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_segments_global(docs, sep=" ").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


_GLOBAL_DEDUP_SEGMENTS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
), keep AS (
  SELECT tok, doc_id, i FROM (
    SELECT tok, doc_id, i,
           row_number() OVER (PARTITION BY tok ORDER BY doc_id, i) AS rn
    FROM toks) WHERE rn = 1
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
  FROM keep GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.text, '') AS text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def dedup_spans_docs(sf_dir: str):
    """Corpus-wide duplicated-span removal at 5-token granularity
    (Lee-et-al-style exact-substring dedup on k-gram keys) — see
    :func:`kgraft.textops.dedup_spans_global`."""
    from .textops import dedup_spans_global

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup_spans_global(docs, k=5, sep=" ").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


_DEDUP_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
), kg AS (
  SELECT a.doc_id, a.i, string_agg(b.tok, ' ' ORDER BY b.i) AS kgram
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.i BETWEEN a.i AND a.i + 4
  GROUP BY a.doc_id, a.i
  HAVING count(*) = 5
), rem AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           row_number() OVER (PARTITION BY kgram ORDER BY doc_id, i) AS rn,
           count(*) OVER (PARTITION BY kgram) AS cnt
    FROM kg) WHERE cnt > 1 AND rn > 1
), cov AS (
  SELECT DISTINCT t.doc_id, t.i
  FROM toks t JOIN rem r
    ON t.doc_id = r.doc_id AND t.i BETWEEN r.i AND r.i + 4
), kept AS (
  SELECT t.doc_id, t.i, t.tok FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id AND c.i = t.i
  )
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.text, '') AS text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def co_ordered_parts(sf_dir: str) -> pd.DataFrame:
    """Market-basket co-occurrence: top-20 part PAIRS by number of
    orders containing both. One global distinct over (order, part),
    then ONE bucketed exchange on the order key generates within-order
    pairs via an in-bucket vectorized self-merge (no corpus self-join
    shuffle), pair counts pre-aggregate map-side."""
    from .relational import bucketed_groupby_apply

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    op = distinct(li, ["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame(
            {"part_a": m["l_partkey_x"], "part_b": m["l_partkey_y"]}
        )

    pr = bucketed_groupby_apply(op, ["l_orderkey"], pairs, num_buckets=32)
    counts = pre_aggregate_ds(pr, ["part_a", "part_b"], {"n_orders": (None, "count")})
    out = (
        counts.sort(["n_orders", "part_a", "part_b"], descending=[True, False, False])
        .limit(20)
        .to_pandas()
    )
    return out[["part_a", "part_b", "n_orders"]].reset_index(drop=True)


_CO_ORDERED_PARTS_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 20
"""


def cc_co_ordered_parts(sf_dir: str) -> pd.DataFrame:
    """Connected components over the co-order graph (parts linked when
    >= 3 orders contain both): per component (labelled by its MIN part
    id, the engine's component convention) how many parts — the first
    SQL-ORACLED exercise of the engine's contracted Dataset union-find
    (:func:`kgraft.graph.components.connected_components`; everywhere
    else it is pytest-checked). The DuckDB twin computes the same
    components via a WITH RECURSIVE transitive closure — the recursive
    CTE shape — which is exactly why the edge set is thresholded to
    stay closure-bounded."""
    from .graph.components import connected_components
    from .relational import bucketed_groupby_apply

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    op = distinct(li, ["l_orderkey", "l_partkey"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame(
            {"part_a": m["l_partkey_x"], "part_b": m["l_partkey_y"]}
        )

    pr = bucketed_groupby_apply(op, ["l_orderkey"], pairs, num_buckets=32)
    counts = pre_aggregate_ds(
        pr, ["part_a", "part_b"], {"n_orders": (None, "count")}
    )

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["n_orders"] >= 3]
        return pd.DataFrame(
            {
                "src": keep["part_a"].astype("int64"),
                "dst": keep["part_b"].astype("int64"),
            }
        )

    comp = connected_components(
        counts.map_batches(to_edges, batch_format="pandas")
    )
    out = (
        comp.groupby("component_id", as_index=False)
        .size()
        .rename(columns={"size": "n_parts"})
    )
    out["component_id"] = out["component_id"].astype("int64")
    out["n_parts"] = out["n_parts"].astype("int64")
    return out.sort_values(
        ["n_parts", "component_id"], ascending=[False, True], ignore_index=True
    )


_CC_CO_ORDERED_SQL = """
WITH RECURSIVE
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
und AS (SELECT pa AS s, pb AS d FROM e0 UNION ALL SELECT pb, pa FROM e0),
reach(a, b) AS (
  SELECT s, d FROM und
  UNION
  SELECT r.a, u.d FROM reach r JOIN und u ON u.s = r.b
)
SELECT component_id, CAST(count(*) AS BIGINT) AS n_parts FROM (
  SELECT a, least(a, min(b)) AS component_id FROM reach GROUP BY a
) GROUP BY 1 ORDER BY n_parts DESC, component_id
"""


def assoc_rules_parts(sf_dir: str) -> pd.DataFrame:
    """Association-rule mining over order baskets (top-20 rules A -> B
    by lift, min pair support 3 orders): support / confidence / lift
    computed distributed — pair counts ride ONE bucketed exchange on
    the order key (in-bucket vectorized self-merge, map-side combine),
    single-item counts pre-aggregate to a vocab-bounded table that
    attaches to the thresholded pairs via a sorted-id searchsorted LUT
    (broadcast once; no second shuffle). The frequent-pair tier of
    Apriori/FP-growth re-expressed as Dataset exchanges."""
    from .relational import bucketed_groupby_apply

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    op = distinct(li, ["l_orderkey", "l_partkey"])
    n_total = distinct(op, ["l_orderkey"]).count()
    item = pre_aggregate_ds(
        op, ["l_partkey"], {"n_i": (None, "count")}
    ).to_pandas()  # vocab-bounded: one row per distinct part
    ids = np.sort(item["l_partkey"].to_numpy(np.int64))
    n_i = item.set_index("l_partkey").loc[ids, "n_i"].to_numpy(np.int64)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame(
            {"part_a": m["l_partkey_x"], "part_b": m["l_partkey_y"]}
        )

    pr = bucketed_groupby_apply(op, ["l_orderkey"], pairs, num_buckets=32)
    counts = pre_aggregate_ds(pr, ["part_a", "part_b"], {"n_both": (None, "count")})

    def to_rules(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_both"] >= 3]
        if not len(df):
            return pd.DataFrame(
                {
                    "antecedent": pd.Series(dtype="int64"),
                    "consequent": pd.Series(dtype="int64"),
                    "n_both": pd.Series(dtype="int64"),
                    "support": pd.Series(dtype="float64"),
                    "confidence": pd.Series(dtype="float64"),
                    "lift": pd.Series(dtype="float64"),
                }
            )
        # each unordered frequent pair yields both directed rules
        ante = np.concatenate([df["part_a"].to_numpy(np.int64),
                               df["part_b"].to_numpy(np.int64)])
        cons = np.concatenate([df["part_b"].to_numpy(np.int64),
                               df["part_a"].to_numpy(np.int64)])
        nb = np.concatenate([df["n_both"].to_numpy(np.int64)] * 2)
        na = n_i[np.searchsorted(ids, ante)]
        nc = n_i[np.searchsorted(ids, cons)]
        return pd.DataFrame(
            {
                "antecedent": ante,
                "consequent": cons,
                "n_both": nb,
                "support": sql_round(nb / float(n_total), 6),
                "confidence": sql_round(nb / na.astype(np.float64), 6),
                "lift": sql_round(nb * float(n_total) / (na * nc.astype(np.float64)), 4),
            }
        )

    rules = counts.map_batches(to_rules, batch_format="pandas")
    out = (
        rules.sort(
            ["lift", "antecedent", "consequent"], descending=[True, False, False]
        )
        .limit(20)
        .to_pandas()
    )
    return out.reset_index(drop=True)


_ASSOC_RULES_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM op),
item AS (SELECT l_partkey, count(*) AS n_i FROM op GROUP BY 1),
pr AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 3
),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, n_ab FROM pr
  UNION ALL
  SELECT pb, pa, n_ab FROM pr
)
SELECT r.antecedent, r.consequent, CAST(r.n_ab AS BIGINT) AS n_both,
       round(r.n_ab / CAST(t.n AS DOUBLE), 6) AS support,
       round(r.n_ab / CAST(ia.n_i AS DOUBLE), 6) AS confidence,
       round(r.n_ab * CAST(t.n AS DOUBLE) / (ia.n_i * CAST(ib.n_i AS DOUBLE)), 4) AS lift
FROM rules r
CROSS JOIN tot t
JOIN item ia ON ia.l_partkey = r.antecedent
JOIN item ib ON ib.l_partkey = r.consequent
ORDER BY lift DESC, antecedent, consequent LIMIT 20
"""


def bucketed_join_revenue(sf_dir: str) -> pd.DataFrame:
    """Customer-order revenue per nation through the HASH-BUCKETED
    STORAGE LAYOUT: both tables are written once as co-partitioned
    ``write_bucketed`` layouts (cached under /tmp keyed by sf_dir), then
    :func:`kgraft.io.copartitioned_join` joins them bucket-by-bucket
    with NO shuffle — the storage layout is the exchange, paid at write
    time (the Hive/Iceberg bucketing trade, the right shape when a fact
    table is joined on the same key by many downstream pipelines)."""
    import hashlib
    import os

    from .io import copartitioned_join, write_bucketed

    base = os.path.join(
        "/tmp/kgraft_bucketed", hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    cd, od = os.path.join(base, "customer"), os.path.join(base, "orders")
    if not os.path.exists(os.path.join(cd, "_buckets.json")):
        cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        write_bucketed(
            cust.map_batches(
                lambda t: t.rename_columns(["custkey", "c_nationkey"]),
                batch_format="pyarrow",
            ),
            cd,
            "custkey",
            num_buckets=16,
        )
    if not os.path.exists(os.path.join(od, "_buckets.json")):
        ords = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        write_bucketed(
            ords.map_batches(
                lambda t: t.rename_columns(["custkey", "o_totalprice"]),
                batch_format="pyarrow",
            ),
            od,
            "custkey",
            num_buckets=16,
        )
    joined = copartitioned_join(cd, od, "custkey")
    out = pre_aggregate(
        joined,
        ["c_nationkey"],
        {"n_orders": (None, "count"), "total_price": ("o_totalprice", "sum")},
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total_price"] = sql_round(out["total_price"], 2)
    return out.sort_values("c_nationkey", ignore_index=True)[
        ["c_nationkey", "n_orders", "total_price"]
    ]


_BUCKETED_JOIN_REVENUE_SQL = """
SELECT c_nationkey, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def quality_classifier_docs(sf_dir: str) -> pd.DataFrame:
    """Trainable quality filter end-to-end: fit the fastText-style
    hashed-bag-of-words logistic classifier
    (:func:`kgraft.models.classifier.train_text_classifier`) to
    separate a deterministic source split (sources whose numeric suffix
    is even = "good"), score the corpus shuffle-free, report per-source
    mean keep-probability. Rows-only (iterative GD is not
    SQL-expressible); gradient-exactness + accuracy oracles live in
    tests/test_models.py."""
    from .models.classifier import score_text, train_text_classifier

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        suffix = df["source"].str.extract(r"(\d+)$", expand=False).fillna("1")
        df["label"] = (suffix.astype("int64") % 2 == 0).astype("int64")
        return df

    labeled = docs.map_batches(label, batch_format="pandas")
    model = train_text_classifier(
        labeled, "text", "label", hash_bits=14, n_iter=8
    )
    scored = score_text(labeled, model, "text")
    out = pre_aggregate(
        scored,
        ["source"],
        {"n_docs": (None, "count"), "mean_p_good": ("p_good", "mean")},
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["mean_p_good"] = sql_round(out["mean_p_good"], 4)
    out["final_loss"] = sql_round(model["losses"][-1], 4)
    return out.sort_values("source", ignore_index=True)[
        ["source", "n_docs", "mean_p_good", "final_loss"]
    ]


def bcubed_docs(sf_dir: str) -> pd.DataFrame:
    """B-cubed clustering-agreement metrics (Bagga & Baldwin 1998)
    between a deterministic hash-bucketing of documents and their
    source labels — exercises the entity-resolution / dedup-quality
    metric operator :func:`kgraft.relational.clustering_agreement`
    end-to-end with a SQL twin (real uses feed it predicted dup groups
    or KG component ids, which have no SQL twin)."""
    from .relational import clustering_agreement

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def label(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pred": (df["doc_id"] % 50).astype("int64"), "gold": df["source"]}
        )

    return clustering_agreement(
        docs.map_batches(label, batch_format="pandas"), "pred", "gold"
    )


_BCUBED_DOCS_SQL = """
WITH t AS (SELECT doc_id % 50 AS pred, source AS gold FROM documents),
cells AS (SELECT pred, gold, count(*)::DOUBLE AS c FROM t GROUP BY pred, gold),
pn AS (SELECT pred, sum(c) AS s FROM cells GROUP BY pred),
gn AS (SELECT gold, sum(c) AS s FROM cells GROUP BY gold),
n AS (SELECT sum(c) AS n FROM cells),
p AS (SELECT sum(cells.c * cells.c / pn.s) AS v FROM cells JOIN pn USING (pred)),
r AS (SELECT sum(cells.c * cells.c / gn.s) AS v FROM cells JOIN gn USING (gold))
SELECT CAST(n.n AS BIGINT) AS n_items,
       round(p.v / n.n, 6) AS bcubed_precision,
       round(r.v / n.n, 6) AS bcubed_recall,
       round(2 * (p.v / n.n) * (r.v / n.n) / ((p.v / n.n) + (r.v / n.n)), 6)
         AS bcubed_f1
FROM n, p, r
"""


def event_trigram_sequences(sf_dir: str) -> pd.DataFrame:
    """Top-20 three-step behavior sequences (a → b → c over consecutive
    same-user events) — the order-3 extension of the transition matrix
    for funnel/recommendation mining. Same scale shape as
    :func:`event_transitions`: one user-keyed exchange, in-bucket
    double shift, |types|³-bounded count partials."""
    from .relational import bucketed_groupby_apply, pre_aggregate_ds

    ds = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)["event_type"]
        d = pd.DataFrame(
            {
                "t1": grp.shift(2),
                "t2": grp.shift(1),
                "t3": g["event_type"],
            }
        ).dropna()
        return (
            d.groupby(["t1", "t2", "t3"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    parts = bucketed_groupby_apply(ds, "user_id", per_bucket)
    agg = pre_aggregate_ds(parts, ["t1", "t2", "t3"], {"n": ("n", "sum")})
    out = (
        agg.sort(["n", "t1", "t2", "t3"], descending=[True, False, False, False])
        .limit(20)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out[["t1", "t2", "t3", "n"]].reset_index(drop=True)


_EVENT_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS t3,
         lag(event_type, 1) OVER w AS t2,
         lag(event_type, 2) OVER w AS t1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n DESC, t1, t2, t3 LIMIT 20
"""


def rolling_median_value(sf_dir: str) -> pd.DataFrame:
    """Trailing 5-row median of event value per user (ROWS BETWEEN 4
    PRECEDING AND CURRENT ROW) — the robust smoothing window the
    rolling MEAN family can't give you under spikes; linear
    interpolation pinned to SQL ``quantile_cont``. Sampled users keep
    the row-scale output bounded; one user-keyed bucket exchange."""
    from .relational import windowed

    ev = read_table(
        sf_dir, "events", columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(lambda df: df[df["user_id"] % 97 == 0], batch_format="pandas")
    win = windowed(
        ev,
        part_keys="user_id",
        order_keys=["ts", "event_id"],
        specs={"med5": ("rolling_median", "value", 5)},
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "event_id"]].copy()
        out["user_id"] = out["user_id"].astype("int64")
        out["event_id"] = out["event_id"].astype("int64")
        out["med5"] = sql_round(df["med5"], 6)
        return out

    return (
        win.map_batches(fin, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )


_ROLLING_MEDIAN_SQL = """
SELECT user_id, event_id,
       round(quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ), 6) AS med5
FROM events WHERE user_id % 97 = 0
ORDER BY user_id, event_id
"""


def cdc_orders_state(sf_dir: str) -> pd.DataFrame:
    """MERGE-with-deletes end-to-end: a deterministic synthetic CDC
    stream (keys %10==0 deleted, %10==1 repriced, %10==2 inserted as
    new status-'N' orders) applies onto the orders snapshot through
    :func:`kgraft.relational.apply_cdc`; the final state rolls up per
    status. One tagged union + one key exchange — payload rides once."""
    from .relational import apply_cdc

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = read_table(sf_dir, "orders", columns=cols)

    def make_changes(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"]
        d = df[k % 10 == 0].copy()
        d["op"] = "D"
        u = df[k % 10 == 1].copy()
        u["o_totalprice"] = u["o_totalprice"] + 1000.0
        u["op"] = "U"
        i = df[k % 10 == 2].copy()
        i["o_orderkey"] = i["o_orderkey"] + 10_000_000
        i["o_orderstatus"] = "N"
        i["o_totalprice"] = 42.0
        i["op"] = "I"
        out = pd.concat([d, u, i], ignore_index=True)
        out["version"] = np.int64(1)
        return out

    changes = base.map_batches(make_changes, batch_format="pandas")
    final = apply_cdc(base, changes, "o_orderkey", "version", "op")
    out = pre_aggregate(
        final,
        ["o_orderstatus"],
        {"n_orders": (None, "count"), "total": ("o_totalprice", "sum")},
    )
    out["n_orders"] = out["n_orders"].astype("int64")
    out["total"] = sql_round(out["total"], 2)
    return out.sort_values("o_orderstatus", ignore_index=True)[
        ["o_orderstatus", "n_orders", "total"]
    ]


_CDC_ORDERS_STATE_SQL = """
WITH ch AS (
  SELECT o_orderkey AS k, 'D' AS op, o_orderstatus AS st, o_totalprice AS tp
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'U', o_orderstatus, o_totalprice + 1000
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, 'I', 'N', 42.0
  FROM orders WHERE o_orderkey % 10 = 2
), final AS (
  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
  FROM orders WHERE o_orderkey NOT IN (SELECT k FROM ch)
  UNION ALL
  SELECT k, st, tp FROM ch WHERE op <> 'D'
)
SELECT st AS o_orderstatus, count(*) AS n_orders, round(sum(tp), 2) AS total
FROM final GROUP BY st ORDER BY st
"""


def user_feature_snapshot(sf_dir: str) -> pd.DataFrame:
    """ML feature-store build: per-user churn/engagement features —
    event count, total value, recency in days vs the corpus watermark,
    and the user's dominant event type (deterministic-tie mode). All
    algebraic/histogram shapes: two map-side-combined aggregates + the
    (user, type) count-histogram exchange; output is user-scale (the
    feature table a trainer consumes — at 100 TB it writes partitioned,
    never collected; driver-scale corpora compare whole)."""
    from .relational import grouped_mode

    ev = read_table(
        sf_dir, "events", columns=["user_id", "event_type", "ts", "value"]
    ).materialize()  # three consumers below
    ref_us = int(
        ev.map_batches(
            lambda df: pd.DataFrame(
                {"m": [df["ts"].astype("datetime64[us]").astype("int64").max()]}
            ),
            batch_format="pandas",
        ).max("m")
    )
    base = pre_aggregate(
        ev,
        ["user_id"],
        {
            "n_events": (None, "count"),
            "total_value": ("value", "sum"),
            "last_us": ("ts", "max"),
        },
    )
    mode = grouped_mode(ev, "user_id", "event_type", out_col="top_type")
    mode = mode.to_pandas() if not isinstance(mode, pd.DataFrame) else mode
    out = base.merge(mode, on="user_id")
    last_us = out["last_us"].astype("datetime64[us]").astype("int64")
    out["recency_days"] = sql_round(((ref_us - last_us) / 86400e6), 6)
    out["n_events"] = out["n_events"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    out["total_value"] = sql_round(out["total_value"], 6)
    return out.sort_values("user_id", ignore_index=True)[
        ["user_id", "n_events", "total_value", "recency_days", "top_type"]
    ]


_USER_FEATURE_SNAPSHOT_SQL = """
WITH e AS (SELECT * FROM events),
w AS (SELECT max(epoch_us(ts)) AS ref FROM e),
base AS (
  SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value,
         max(epoch_us(ts)) AS last_us
  FROM e GROUP BY user_id
), m AS (
  SELECT user_id, event_type AS top_type FROM (
    SELECT user_id, event_type,
           row_number() OVER (
             PARTITION BY user_id ORDER BY count(*) DESC, event_type
           ) AS rn
    FROM e GROUP BY user_id, event_type
  ) WHERE rn = 1
)
SELECT base.user_id, base.n_events, base.total_value,
       round((w.ref - base.last_us) / 86400e6, 6) AS recency_days,
       m.top_type
FROM base JOIN m USING (user_id) CROSS JOIN w
ORDER BY base.user_id
"""


def incremental_event_stats(sf_dir: str) -> pd.DataFrame:
    """Incremental-model maintenance end-to-end: per-type event stats
    built by folding the corpus in as TWO partitions (first half by
    event_id, then the rest) through
    :func:`kgraft.relational.incremental_aggregate` — the history is
    never rescanned on the second fold, and the result must equal the
    one-shot GROUP BY the SQL twin computes."""
    from .relational import incremental_aggregate

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"])
    mid = int(ev.count()) // 2
    first = ev.map_batches(
        lambda df: df[df["event_id"] <= mid], batch_format="pandas"
    )
    rest = ev.map_batches(
        lambda df: df[df["event_id"] > mid], batch_format="pandas"
    )
    aggs = {
        "n_events": (None, "count"),
        "total_value": ("value", "sum"),
        "avg_value": ("value", "mean"),
        "min_value": ("value", "min"),
        "max_value": ("value", "max"),
    }
    _, state = incremental_aggregate(None, first, ["event_type"], aggs)
    out, _ = incremental_aggregate(state, rest, ["event_type"], aggs)
    out["n_events"] = out["n_events"].astype("int64")
    for c in ("total_value", "avg_value", "min_value", "max_value"):
        out[c] = sql_round(out[c], 6)
    return out.sort_values("event_type", ignore_index=True)


_INCREMENTAL_EVENT_STATS_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value,
       round(avg(value), 6) AS avg_value,
       round(min(value), 6) AS min_value,
       round(max(value), 6) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def k_anonymous_events(sf_dir: str) -> pd.DataFrame:
    """k-anonymity release gate: suppress events whose (type, day)
    quasi-identifier group has fewer than 25 rows, report per-type
    kept/suppressed counts — the privacy pass before publishing
    event-level data. See :func:`kgraft.relational.k_anonymize`."""
    from .relational import k_anonymize

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = df["ts"].dt.floor("D")
        return df[["event_id", "event_type", "day"]]

    days = ev.map_batches(add_day, batch_format="pandas")
    kept = k_anonymize(days, ["event_type", "day"], 25)
    kc = pre_aggregate(kept, ["event_type"], {"n_kept": (None, "count")})
    tot = pre_aggregate(days, ["event_type"], {"n_orig": (None, "count")})
    out = tot.merge(kc, on="event_type", how="left")
    out["n_orig"] = out["n_orig"].astype("int64")
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    out["n_suppressed"] = out["n_orig"] - out["n_kept"]
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "n_orig", "n_kept", "n_suppressed"]
    ]


_K_ANONYMOUS_SQL = """
WITH e AS (
  SELECT event_id, event_type, date_trunc('day', ts) AS day FROM events
), sz AS (
  SELECT event_type, day, count(*) AS c FROM e GROUP BY event_type, day
), kept AS (
  SELECT e.event_type FROM e JOIN sz USING (event_type, day) WHERE sz.c >= 25
), t AS (SELECT event_type, count(*) AS n FROM e GROUP BY event_type),
kk AS (SELECT event_type, count(*) AS n FROM kept GROUP BY event_type)
SELECT t.event_type, t.n AS n_orig,
       CAST(COALESCE(kk.n, 0) AS BIGINT) AS n_kept,
       CAST(t.n - COALESCE(kk.n, 0) AS BIGINT) AS n_suppressed
FROM t LEFT JOIN kk USING (event_type)
ORDER BY t.event_type
"""


def validate_lineitem_fk(sf_dir: str) -> pd.DataFrame:
    """Cross-table referential-integrity expectations: every lineitem
    order key must exist in orders (clean corpus → 0 orphans), and —
    the planted-violation twin — against only the 'F'-status orders
    (→ many orphans). Distinct child keys meet distinct parent keys in
    ONE bucketed LEFT join per rule; only orphan counts reach the
    driver. See the ``fk`` rule kind of :func:`kgraft.relational.validate`."""
    from .relational import validate

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    f_orders = orders.map_batches(
        lambda df: df[df["o_orderstatus"] == "F"][["o_orderkey"]],
        batch_format="pandas",
    )
    return validate(
        li,
        [
            {"kind": "fk", "col": "l_orderkey", "ref": orders,
             "ref_col": "o_orderkey"},
        ],
    ).assign(
        n_orphans_vs_f_only=validate(
            li,
            [{"kind": "fk", "col": "l_orderkey", "ref": f_orders,
              "ref_col": "o_orderkey"}],
        )["n_violations"].to_numpy()
    )


_VALIDATE_LINEITEM_FK_SQL = """
WITH c AS (SELECT count(*) AS n_rows FROM lineitem),
all_orphans AS (
  SELECT count(*) AS v FROM (
    SELECT DISTINCT l_orderkey FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
  )
), f_orphans AS (
  SELECT count(*) AS v FROM (
    SELECT DISTINCT l_orderkey FROM lineitem
    WHERE l_orderkey NOT IN
      (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  )
)
SELECT 'fk(l_orderkey->o_orderkey)' AS rule, 'fk' AS kind,
       'l_orderkey' AS col, c.n_rows,
       CAST(all_orphans.v AS BIGINT) AS n_violations,
       CAST(all_orphans.v = 0 AS BIGINT) AS passed,
       CAST(f_orphans.v AS BIGINT) AS n_orphans_vs_f_only
FROM c, all_orphans, f_orphans
"""


def profile_events(sf_dir: str) -> pd.DataFrame:
    """Column-profile report over the events table (row/null counts,
    exact distinct cardinality, numeric min/max/mean) — the catalog
    statistics a pipeline publishes with every table. See
    :func:`kgraft.relational.profile`."""
    from .relational import profile

    ev = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "value"]
    )
    return profile(ev, ["event_id", "user_id", "event_type", "value"])


_PROFILE_EVENTS_SQL = """
WITH s AS (SELECT count(*) AS n FROM events)
SELECT * FROM (
  SELECT 'event_id' AS "column", s.n AS n_rows,
         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nulls,
         round(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) * 1.0 / s.n, 6)
           AS null_frac,
         count(DISTINCT event_id) AS n_distinct,
         round(min(event_id), 6) AS min_val, round(max(event_id), 6) AS max_val,
         round(avg(event_id), 6) AS mean_val
  FROM events CROSS JOIN s GROUP BY s.n
  UNION ALL
  SELECT 'event_type', s.n,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         round(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) * 1.0 / s.n, 6),
         count(DISTINCT event_type), NULL, NULL, NULL
  FROM events CROSS JOIN s GROUP BY s.n
  UNION ALL
  SELECT 'user_id', s.n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         round(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) * 1.0 / s.n, 6),
         count(DISTINCT user_id),
         round(min(user_id), 6), round(max(user_id), 6), round(avg(user_id), 6)
  FROM events CROSS JOIN s GROUP BY s.n
  UNION ALL
  SELECT 'value', s.n,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) * 1.0 / s.n, 6),
         count(DISTINCT value),
         round(min(value), 6), round(max(value), 6), round(avg(value), 6)
  FROM events CROSS JOIN s GROUP BY s.n
) ORDER BY "column"
"""


def validate_orders(sf_dir: str) -> pd.DataFrame:
    """Data-quality expectation report over the orders table — the
    publish gate a production pipeline runs: null checks, range checks,
    a format regex, an accepted-value set, and a distributed uniqueness
    check (duplicate-key count reduces map-side, never collected). See
    :func:`kgraft.relational.validate`."""
    from .relational import validate

    orders = read_table(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
                 "o_orderpriority"],
    )
    return validate(
        orders,
        [
            {"kind": "not_null", "col": "o_custkey"},
            {"kind": "in_range", "col": "o_totalprice", "lo": 0.0, "hi": 1e6},
            {"kind": "regex", "col": "o_orderpriority", "pattern": r"\d-[A-Z ]+"},
            {"kind": "accepted_values", "col": "o_orderstatus",
             "values": ["O", "F", "P"]},
            {"kind": "unique", "col": "o_orderkey"},
        ],
    )


_VALIDATE_ORDERS_SQL = """
WITH n AS (SELECT count(*) AS n_rows FROM orders),
u AS (
  SELECT 'accepted_values(o_orderstatus)' AS rule, 'accepted_values' AS kind,
         'o_orderstatus' AS col, n.n_rows,
         CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('O','F','P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM orders CROSS JOIN n GROUP BY n.n_rows
  UNION ALL
  SELECT 'in_range(o_totalprice)', 'in_range', 'o_totalprice', n.n_rows,
         CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                        AND (o_totalprice < 0 OR o_totalprice > 1e6)
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders CROSS JOIN n GROUP BY n.n_rows
  UNION ALL
  SELECT 'not_null(o_custkey)', 'not_null', 'o_custkey', n.n_rows,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders CROSS JOIN n GROUP BY n.n_rows
  UNION ALL
  SELECT 'regex(o_orderpriority)', 'regex', 'o_orderpriority', n.n_rows,
         CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                        AND NOT regexp_full_match(o_orderpriority, '\\d-[A-Z ]+')
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders CROSS JOIN n GROUP BY n.n_rows
  UNION ALL
  SELECT 'unique(o_orderkey)', 'unique', 'o_orderkey', n.n_rows,
         CAST(COALESCE((SELECT sum(c - 1) FROM
               (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
               WHERE c > 1), 0) AS BIGINT)
  FROM n
)
SELECT rule, kind, col, n_rows, n_violations,
       CAST(n_violations = 0 AS BIGINT) AS passed
FROM u ORDER BY rule
"""


def debounced_events(sf_dir: str) -> pd.DataFrame:
    """Duplicate-burst suppression: drop events repeating the same
    (user, type) within 10 minutes of the previous one — summarize
    kept-row counts per type (raw kept rows are corpus-scale; the
    per-type rollup is the dashboard view). See
    :func:`kgraft.streamops.debounce`."""
    from . import streamops

    ev = read_table(
        sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"]
    )
    kept = streamops.debounce(
        ev, ["user_id", "event_type"], "ts", 600.0, tiebreak="event_id"
    )
    out = pre_aggregate(kept, ["event_type"], {"n_kept": (None, "count")})
    tot = pre_aggregate(ev, ["event_type"], {"n_total": (None, "count")})
    out = out.merge(tot, on="event_type")
    out["n_kept"] = out["n_kept"].astype("int64")
    out["n_total"] = out["n_total"].astype("int64")
    out["kept_frac"] = sql_round((out["n_kept"] / out["n_total"]), 6)
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "n_total", "n_kept", "kept_frac"]
    ]


_DEBOUNCED_EVENTS_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
          )) / 1e6 AS gap_s
  FROM events
)
SELECT event_type,
       count(*) AS n_total,
       CAST(sum(CASE WHEN gap_s IS NULL OR gap_s >= 600 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       round(sum(CASE WHEN gap_s IS NULL OR gap_s >= 600 THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS kept_frac
FROM g GROUP BY event_type ORDER BY event_type
"""


def mi_type_dow_events(sf_dir: str) -> pd.DataFrame:
    """Mutual information (nats) between event type and ISO day-of-week
    — the categorical feature-relevance score (is traffic mix
    day-dependent?), with normalized MI = I/√(H(x)·H(y)). One map-side-
    combined (type, dow) cell aggregate; both variables are bounded-
    cardinality so the |types|×7 cell table is driver-safe (the
    unbounded-key variant is `relational.grouped_entropy`'s shape)."""
    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "dow": df["ts"].dt.dayofweek.astype("int64") + 1,  # ISO 1-7
            }
        )

    ct = pre_aggregate(
        ev.map_batches(cells, batch_format="pandas"),
        ["event_type", "dow"],
        {"n": (None, "count")},
    )
    n = float(ct["n"].sum())
    pxy = ct["n"].astype("float64") / n
    px = (ct.groupby("event_type")["n"].transform("sum").astype("float64") / n)
    py = ct.groupby("dow")["n"].transform("sum").astype("float64") / n
    mi = float((pxy * np.log(pxy / (px * py))).sum())
    hx = float(-(pxy.groupby(ct["event_type"]).sum().pipe(lambda s: s * np.log(s))).sum())
    hy = float(-(pxy.groupby(ct["dow"]).sum().pipe(lambda s: s * np.log(s))).sum())
    return pd.DataFrame(
        {
            "n_events": [int(n)],
            "mi_nats": [sql_round(mi, 6)],
            "nmi": [sql_round(mi / np.sqrt(hx * hy), 6) if hx > 0 and hy > 0 else 0.0],
        }
    )


_MI_TYPE_DOW_SQL = """
WITH c AS (
  SELECT event_type, isodow(ts) AS dow, count(*)::DOUBLE AS n
  FROM events GROUP BY event_type, isodow(ts)
), t AS (SELECT sum(n) AS total FROM c),
j AS (
  SELECT c.n / t.total AS pxy,
         sum(c.n) OVER (PARTITION BY c.event_type) / t.total AS px,
         sum(c.n) OVER (PARTITION BY c.dow) / t.total AS py
  FROM c CROSS JOIN t
), hx AS (
  SELECT -sum(p * ln(p)) AS h FROM (
    SELECT sum(n) / (SELECT total FROM t) AS p FROM c GROUP BY event_type)
), hy AS (
  SELECT -sum(p * ln(p)) AS h FROM (
    SELECT sum(n) / (SELECT total FROM t) AS p FROM c GROUP BY dow)
)
SELECT CAST(t.total AS BIGINT) AS n_events,
       round(sum(j.pxy * ln(j.pxy / (j.px * j.py))), 6) AS mi_nats,
       round(sum(j.pxy * ln(j.pxy / (j.px * j.py))) / sqrt(hx.h * hy.h), 6)
         AS nmi
FROM j CROSS JOIN t CROSS JOIN hx CROSS JOIN hy
GROUP BY t.total, hx.h, hy.h
"""


def events_point_in_time(sf_dir: str) -> pd.DataFrame:
    """Point-in-time dimension lookup end-to-end: each sampled user's
    events probe their own SCD2 type history at (ts − 1 µs), returning
    the state BEFORE the event — the AS-OF enrichment every warehouse
    fact pipeline runs against an SCD2 dimension. Composes
    :func:`kgraft.relational.scd2_compress` +
    :func:`kgraft.relational.temporal_join` (one co-locating exchange
    each; the change-compressed dim broadcasts)."""
    from .relational import scd2_compress, temporal_join

    ev = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    ).map_batches(
        lambda df: df[df["user_id"] % 97 == 0], batch_format="pandas"
    ).materialize()  # two consumers: dim build + fact probe
    dim = (
        scd2_compress(ev, "user_id", ["ts", "event_id"], "event_type")
        .to_pandas()
        .rename(columns={"event_type": "prev_state"})
    )

    def probe_ts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["ts_probe"] = df["ts"] - pd.Timedelta(microseconds=1)
        return df[["user_id", "event_id", "event_type", "ts_probe"]]

    facts = ev.map_batches(probe_ts, batch_format="pandas")
    out = temporal_join(facts, dim, "user_id", "ts_probe").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["event_id"] = out["event_id"].astype("int64")
    out["prev_state"] = out["prev_state"].where(out["prev_state"].notna(), None)
    return out.sort_values(["user_id", "event_id"], ignore_index=True)[
        ["user_id", "event_id", "event_type", "prev_state"]
    ]


_EVENTS_POINT_IN_TIME_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events WHERE user_id % 97 = 0
), s AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM e
), c AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM s WHERE p IS NULL OR p <> event_type
), h AS (
  SELECT user_id, event_type AS prev_state, valid_from,
         lead(valid_from) OVER (
           PARTITION BY user_id ORDER BY valid_from, event_id
         ) AS valid_to
  FROM c
)
SELECT e.user_id, e.event_id, e.event_type, h.prev_state
FROM e LEFT JOIN h
  ON h.user_id = e.user_id
 AND h.valid_from <= e.ts - INTERVAL 1 MICROSECOND
 AND (h.valid_to IS NULL OR e.ts - INTERVAL 1 MICROSECOND < h.valid_to)
ORDER BY e.user_id, e.event_id
"""


def event_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Inter-event timing profile: per event TYPE, the mean/stddev and
    burstiness coefficient (Goh & Barabási 2008: (σ−μ)/(σ+μ)) of the
    gaps between each user's consecutive events of that type — the
    traffic-shape diagnostic behind rate-limit and anomaly baselines.
    One user-keyed co-locating exchange; gaps form in-bucket via
    vectorized shift, the per-type reduction is map-side partials.
    Gap unit: seconds as epoch-µs difference / 1e6, computed with the
    identical expression in the SQL twin."""
    from .relational import bucketed_groupby_apply

    ev = read_table(
        sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"]
    )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        us = g["ts"].astype("datetime64[us]").astype("int64")
        same = (
            g["user_id"].eq(g["user_id"].shift())
            & g["event_type"].eq(g["event_type"].shift())
        ).to_numpy()
        gap_s = (us - us.shift()).to_numpy(dtype="float64") / 1e6
        return pd.DataFrame(
            {"event_type": g["event_type"].to_numpy()[same], "gap_s": gap_s[same]}
        )

    gap_ds = bucketed_groupby_apply(ev, ["user_id"], gaps)
    out = pre_aggregate(
        gap_ds,
        ["event_type"],
        {
            "n_gaps": (None, "count"),
            "avg_gap_s": ("gap_s", "mean"),
            "std_gap_s": ("gap_s", "std"),
        },
    )
    out["n_gaps"] = out["n_gaps"].astype("int64")
    out["burstiness"] = sql_round((
        (out["std_gap_s"] - out["avg_gap_s"])
        / (out["std_gap_s"] + out["avg_gap_s"])
    ), 6)
    out["avg_gap_s"] = sql_round(out["avg_gap_s"], 4)
    out["std_gap_s"] = sql_round(out["std_gap_s"], 4)
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "n_gaps", "avg_gap_s", "std_gap_s", "burstiness"]
    ]


_EVENT_GAP_STATS_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id
          )) / 1e6 AS gap_s
  FROM events
)
SELECT event_type,
       count(gap_s) AS n_gaps,
       round(avg(gap_s), 4) AS avg_gap_s,
       round(stddev_samp(gap_s), 4) AS std_gap_s,
       round((stddev_samp(gap_s) - avg(gap_s))
             / (stddev_samp(gap_s) + avg(gap_s)), 6) AS burstiness
FROM g WHERE gap_s IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def user_state_history(sf_dir: str) -> pd.DataFrame:
    """SCD-type-2 dimension history: each sampled user's event-type
    stream compressed into change intervals (valid_from / valid_to,
    NULL-open current row) — see :func:`kgraft.relational.scd2_compress`.
    The user sample (``user_id % 97 = 0``) filters at the scan, BEFORE
    the one co-locating exchange; (ts, event_id) is the deterministic
    per-user total order on both sides."""
    from .relational import scd2_compress

    ev = read_table(
        sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"]
    ).map_batches(
        lambda df: df[df["user_id"] % 97 == 0], batch_format="pandas"
    )
    out = scd2_compress(
        ev, "user_id", ["ts", "event_id"], "event_type"
    ).to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(
        ["user_id", "valid_from", "event_type"], ignore_index=True
    )[["user_id", "event_type", "valid_from", "valid_to"]]


_USER_STATE_HISTORY_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events WHERE user_id % 97 = 0
), s AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
  FROM e
), c AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM s WHERE p IS NULL OR p <> event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from, event_id
       ) AS valid_to
FROM c ORDER BY user_id, valid_from, event_type
"""


def iqr_outliers_by_type(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier report per event type: exact q1/q3
    (``quantile_disc`` — bit-identical order statistics on both sides,
    so the fence comparison can't drift at 1 ulp like interpolated
    quantiles can), fences at ±1.5·IQR, and the count of rows outside
    them. Scale shape: the quantile histogram is distinct-value-scale
    (raw rows never shuffle), the |types|-scale fence table broadcasts
    into one shuffle-free counting scan."""
    from .relational import grouped_quantiles_disc

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    # one histogram exchange serves both fences (review: the two
    # separate grouped_quantile_disc passes doubled the dominant cost)
    fences = grouped_quantiles_disc(
        ev, "event_type", "value", {"q1": 0.25, "q3": 0.75}
    ).to_pandas()
    fences["iqr"] = fences["q3"] - fences["q1"]
    fences["lo"] = fences["q1"] - 1.5 * fences["iqr"]
    fences["hi"] = fences["q3"] + 1.5 * fences["iqr"]
    lo = fences.set_index("event_type")["lo"]
    hi = fences.set_index("event_type")["hi"]

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype="float64")
        l = lo.reindex(df["event_type"]).to_numpy(dtype="float64")
        h = hi.reindex(df["event_type"]).to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "is_out": ((v < l) | (v > h)).astype("int64"),
            }
        )

    counts = pre_aggregate(
        ev.map_batches(flag, batch_format="pandas"),
        ["event_type"],
        {"n_events": (None, "count"), "n_outliers": ("is_out", "sum")},
    )
    out = fences.merge(counts, on="event_type")
    out["n_events"] = out["n_events"].astype("int64")
    out["n_outliers"] = out["n_outliers"].astype("int64")
    for c in ("q1", "q3", "iqr", "lo", "hi"):
        out[c] = sql_round(out[c], 6)
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "q1", "q3", "iqr", "lo", "hi", "n_events", "n_outliers"]
    ]


_IQR_OUTLIERS_SQL = """
WITH f AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,
       round(f.q3 - f.q1, 6) AS iqr,
       round(f.q1 - 1.5 * (f.q3 - f.q1), 6) AS lo,
       round(f.q3 + 1.5 * (f.q3 - f.q1), 6) AS hi,
       count(*) AS n_events,
       CAST(sum(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                       OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN f USING (event_type)
GROUP BY e.event_type, f.q1, f.q3
ORDER BY e.event_type
"""


def audience_overlap_events(sf_dir: str) -> pd.DataFrame:
    """Audience-overlap matrix: Jaccard similarity of the USER SETS of
    every event-type pair — the segment-overlap report of a product
    analytics stack. Scale shape: one global distinct over
    (type, user), per-type set sizes from a map-side-combined count,
    within-user type pairs via ONE bucketed exchange on the user key
    (in-bucket vectorized self-merge — type-pair count is bounded at
    |types|², so the pair partials are tiny regardless of corpus size);
    the |types|²-scale finalize joins sizes on the driver."""
    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    tu = distinct(ev, ["event_type", "user_id"])
    sizes = pre_aggregate(tu, ["event_type"], {"n_users": (None, "count")})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return pd.DataFrame(
            {"type_a": m["event_type_x"], "type_b": m["event_type_y"]}
        )

    pr = bucketed_groupby_apply(tu, ["user_id"], pairs, num_buckets=32)
    inter = pre_aggregate(pr, ["type_a", "type_b"], {"n_common": (None, "count")})
    sz = sizes.set_index("event_type")["n_users"]
    inter["n_common"] = inter["n_common"].astype("int64")
    na = sz.reindex(inter["type_a"]).to_numpy(dtype="float64")
    nb = sz.reindex(inter["type_b"]).to_numpy(dtype="float64")
    inter["jaccard"] = sql_round((
        inter["n_common"] / (na + nb - inter["n_common"])
    ), 6)
    return inter.sort_values(["type_a", "type_b"], ignore_index=True)[
        ["type_a", "type_b", "n_common", "jaccard"]
    ]


_AUDIENCE_OVERLAP_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sz AS (SELECT event_type, count(*) AS n FROM tu GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, n_common,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.event_type = type_a
JOIN sz sb ON sb.event_type = type_b
ORDER BY type_a, type_b
"""


def source_token_kl(sf_dir: str) -> pd.DataFrame:
    """Corpus-drift diagnostic: KL divergence (nats) of each source's
    token distribution from the whole-corpus distribution. One
    vocab-scale (source, token, count) pre-aggregate exchange; global
    token marginals derive from it (second vocab-scale aggregate), the
    KL sum is a bucketed join on token + a per-source pre-aggregate —
    raw text crosses no exchange."""
    from .relational import bucketed_groupby_apply, hash_join, pre_aggregate_ds

    docs = read_table(sf_dir, "documents", columns=["source", "text"])
    pat = re.compile(r"[a-z0-9_]+")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(pat)
        n = toks.str.len().to_numpy()
        return (
            pd.DataFrame(
                {
                    "source": np.repeat(df["source"].to_numpy(), n),
                    "t": np.concatenate(toks.to_numpy()) if len(df) else [],
                }
            )
            .groupby(["source", "t"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    st = pre_aggregate_ds(
        docs.map_batches(explode, batch_format="pandas"),
        ["source", "t"],
        {"n": ("n", "sum")},
    )
    tot_s = st.map_batches(
        lambda df: df.groupby("source", as_index=False, sort=False)["n"]
        .sum()
        .rename(columns={"n": "tot_s"}),
        batch_format="pandas",
    )
    tot_s = pre_aggregate_ds(tot_s, ["source"], {"tot_s": ("tot_s", "sum")}).to_pandas()
    tot_all = float(tot_s["tot_s"].sum())
    q = pre_aggregate_ds(st, ["t"], {"nq": ("n", "sum")})
    j = hash_join(
        st,
        q,
        on="t",
        num_buckets=32,
        left_schema=pa.schema(
            [("source", pa.string()), ("t", pa.string()), ("n", pa.int64())]
        ),
        right_schema=pa.schema([("t", pa.string()), ("nq", pa.int64())]),
    )
    ref = ray.put(dict(zip(tot_s["source"], tot_s["tot_s"].astype("float64"))))

    def term(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["source"].map(ray.get(ref)).to_numpy(dtype="float64")
        p = df["n"].to_numpy(dtype="float64") / ts
        qq = df["nq"].to_numpy(dtype="float64") / tot_all
        return pd.DataFrame({"source": df["source"], "term": p * np.log(p / qq)})

    out = pre_aggregate_ds(
        j.map_batches(term, batch_format="pandas"), ["source"], {"kl": ("term", "sum")}
    ).to_pandas()
    out["kl"] = sql_round(out["kl"], 6)
    return out.sort_values("source", ignore_index=True)


_SOURCE_TOKEN_KL_SQL = """
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
), p AS (SELECT source, t, count(*)::DOUBLE AS n FROM toks GROUP BY 1, 2),
ps AS (SELECT source, sum(n) AS tot FROM p GROUP BY 1),
q AS (SELECT t, sum(n) AS nq FROM p GROUP BY 1),
qs AS (SELECT sum(nq) AS tot FROM q)
SELECT p.source,
       round(sum((p.n / ps.tot) * ln((p.n / ps.tot) / (q.nq / qs.tot))), 6) AS kl
FROM p JOIN ps USING (source) JOIN q USING (t), qs
GROUP BY p.source ORDER BY p.source
"""


def dsir_select_docs(sf_dir: str) -> pd.DataFrame:
    """Top-50 documents by DSIR importance weight toward the 'src0'
    domain — see :func:`kgraft.curation.importance_weights`."""
    from .curation import importance_weights

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"]).map_batches(
        lambda df: df.assign(is_tgt=(df["source"] == "src0").astype("int64"))[
            ["doc_id", "text", "is_tgt"]
        ],
        batch_format="pandas",
    )
    out = importance_weights(docs, "is_tgt").to_pandas()
    out["weight"] = sql_round(out["weight"], 6)
    out = out.sort_values(
        ["weight", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(50)
    return out[["doc_id", "weight"]]


_DSIR_SELECT_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
), tok AS (
  SELECT t, count(*)::DOUBLE AS raw_n,
         sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::DOUBLE AS tgt_n
  FROM toks GROUP BY t
), tot AS (
  SELECT sum(raw_n) AS n_raw, sum(tgt_n) AS n_tgt, count(*)::DOUBLE AS v
  FROM tok
), dt AS (
  SELECT doc_id, t, count(*)::DOUBLE AS n FROM toks GROUP BY 1, 2
)
SELECT dt.doc_id,
       round(sum(dt.n * (ln((tok.tgt_n + 1) / (tot.n_tgt + tot.v))
                       - ln((tok.raw_n + 1) / (tot.n_raw + tot.v)))), 6) AS weight
FROM dt JOIN tok USING (t), tot
GROUP BY dt.doc_id
ORDER BY weight DESC, doc_id
LIMIT 50
"""


def near_dup_against_docs(sf_dir: str) -> pd.DataFrame:
    """Incremental near-dup: flag 'src0' documents that transitively
    near-duplicate the rest-of-corpus snapshot — see
    :func:`kgraft.textops.near_dup_against`. DuckDB twin: exact
    all-pairs Jaccard + transitive closure with a per-component
    has-ref flag (_NEAR_DUP_AGAINST_SQL); pytest plants cross-snapshot
    dups."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    new = docs.map_batches(
        lambda df: df.loc[df["source"] == "src0", ["doc_id", "text"]],
        batch_format="pandas",
    )
    ref = docs.map_batches(
        lambda df: df.loc[df["source"] != "src0", ["doc_id", "text"]],
        batch_format="pandas",
    )
    out = textops.near_dup_against(new, ref, threshold=0.7).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def bpe_merges_docs(sf_dir: str) -> pd.DataFrame:
    """First 8 BPE merges learned over the documents corpus — see
    :func:`kgraft.textops.bpe_train` (iterative, no SQL oracle; pytest
    checks equality with a serial reference implementation)."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    return textops.bpe_train(docs, n_merges=8)


def ewma_user_value(sf_dir: str) -> pd.DataFrame:
    """Each user's final EWMA of event values in event order — see
    :func:`kgraft.streamops.ewma`. DuckDB twin (_EWMA_USER_VALUE_SQL):
    the e_t = (1-a)e_{t-1} + a*x_t recursion replayed one event rank
    per recursion level, bit-identical to pandas ewm(adjust=False);
    pytest checks the pandas recursion."""
    from .relational import bucketed_groupby_apply
    from .streamops import ewma

    ev = read_table(sf_dir, "events", columns=["user_id", "event_id", "value"])
    e = ewma(ev, "user_id", "event_id", "value", alpha=0.3)
    last = bucketed_groupby_apply(
        e,
        ["user_id"],
        lambda g: g.sort_values(["user_id", "event_id"])
        .groupby("user_id", sort=False)
        .tail(1)[["user_id", "ewma"]],
        num_buckets=32,
    )
    return last.to_pandas().sort_values("user_id", ignore_index=True)


def cusum_event_alarms(sf_dir: str) -> pd.DataFrame:
    """Per-type CUSUM upward-shift alarm counts over event values in
    arrival order — see :func:`kgraft.streamops.cusum_alarms`.

    The monitor runs in integer CENTS (values are exactly 2dp in this
    corpus): every cumsum term is an integer-valued float64, so the
    running statistic is EXACT in any summation order — which is what
    makes the DuckDB window-sum twin (_CUSUM_ALARMS_SQL) safe. A float
    monitor would differ between numpy's sequential cumsum and
    DuckDB's segment-tree windowed sum by ~n*eps near the threshold;
    the planted-shift float-path pytest still covers
    streamops.cusum_alarms itself."""
    from .streamops import cusum_alarms

    ev = read_table(sf_dir, "events", columns=["event_type", "event_id", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "event_id": df["event_id"],
                "value_c": sql_round(df["value"].to_numpy(np.float64) * 100.0, 0),
            }
        )

    # value ~ mean 50, sd 48: monitor drift above the mean, zero slack
    # so random excursions exercise the alarm path (values are i.i.d.
    # in the synthetic corpus — a real deployment sets slack ~ sd/2)
    c = cusum_alarms(
        ev.map_batches(to_cents, batch_format="pandas"),
        "event_type", "event_id", "value_c",
        target=5000.0, slack=0.0, threshold=15000.0,
    )
    out = pre_aggregate(
        c, ["event_type"], {"n_alarms": ("alarm", "sum"), "n": (None, "count")}
    )
    out["n_alarms"] = out["n_alarms"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type", ignore_index=True)


# The EWMA recursion e_t = (1-a)*e_{t-1} + a*x_t replayed as a DuckDB
# recursive CTE stepping one event rank per iteration (depth = max
# events per user, ~86 at sf0.01). Each step is fl(fl((1-a)*prev) +
# fl(a*cur)) on both sides: pandas ewm(adjust=False)'s kernel divides
# by (1-a)+a which is exactly 1.0 for a=0.3 (tie-to-even), verified
# bit-identical to the plain recursion — so the twin matches
# bit-for-bit before the final round(…, 6).
_EWMA_USER_VALUE_SQL = """
WITH RECURSIVE s AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), r AS (
  SELECT user_id, rn, n, value AS e FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.n, (1.0 - 0.3) * r.e + 0.3 * s.value
  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, round(e, 6) AS ewma FROM r WHERE rn = n ORDER BY user_id
"""


# CUSUM via the running-minimum identity s_t = y_t - min(0, min y_j),
# y = cumsum(x - k) — in integer cents, so the windowed sum is exact
# in DuckDB's segment-tree order exactly as in numpy's sequential
# cumsum (every partial is an integer-valued double < 2^53).
_CUSUM_ALARMS_SQL = """
WITH s AS (
  SELECT event_type, event_id, round(value * 100) AS xc FROM events
), y AS (
  SELECT event_type, event_id,
         sum(xc - 5000) OVER (PARTITION BY event_type ORDER BY event_id) AS y
  FROM s
), c AS (
  SELECT event_type,
         y - min(least(y, 0)) OVER (PARTITION BY event_type ORDER BY event_id)
           AS cus
  FROM y
)
SELECT event_type,
       CAST(count(*) FILTER (WHERE cus > 15000) AS BIGINT) AS n_alarms,
       CAST(count(*) AS BIGINT) AS n
FROM c GROUP BY event_type ORDER BY event_type
"""


def gopher_rules_docs(sf_dir: str) -> pd.DataFrame:
    """Gopher quality-rule signals + verdict per document — see
    :func:`kgraft.textops.gopher_rules`."""
    from .textops import gopher_rules

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return gopher_rules(docs).to_pandas().sort_values("doc_id", ignore_index=True)


_GOPHER_RULES_SQL = """
WITH base AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS words,
         string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         len(words) AS n_words,
         round(list_aggregate(
           list_transform(words, x -> CAST(len(x) AS DOUBLE)), 'avg'), 6)
             AS mean_wl,
         round(len(regexp_extract_all(text, '#|\\.\\.\\.'))
               / CAST(len(words) AS DOUBLE), 6) AS sym_ratio,
         round(len(list_filter(lines,
           l -> l LIKE '•%' OR l LIKE '-%' OR l LIKE '*%'))
               / CAST(len(lines) AS DOUBLE), 6) AS bullet_frac,
         round(len(list_filter(lines, l -> l LIKE '%...'))
               / CAST(len(lines) AS DOUBLE), 6) AS ellipsis_frac,
         round(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
               / CAST(len(words) AS DOUBLE), 6) AS alpha_frac,
         (CAST(list_contains(words, 'the') AS INT)
          + CAST(list_contains(words, 'be') AS INT)
          + CAST(list_contains(words, 'to') AS INT)
          + CAST(list_contains(words, 'of') AS INT)
          + CAST(list_contains(words, 'and') AS INT)
          + CAST(list_contains(words, 'that') AS INT)
          + CAST(list_contains(words, 'have') AS INT)
          + CAST(list_contains(words, 'with') AS INT)) AS n_stop
  FROM base
)
SELECT doc_id, n_words, mean_wl, sym_ratio, bullet_frac, ellipsis_frac,
       alpha_frac, CAST(n_stop AS BIGINT) AS n_stop,
       (n_words BETWEEN 50 AND 100000
        AND mean_wl BETWEEN 3.0 AND 10.0
        AND sym_ratio <= 0.1
        AND bullet_frac <= 0.9
        AND ellipsis_frac <= 0.3
        AND alpha_frac >= 0.8
        AND n_stop >= 2) AS kept
FROM m ORDER BY doc_id
"""


def winsorized_event_stats(sf_dir: str) -> pd.DataFrame:
    """Per-type mean of 5%/95%-winsorized event values — see
    :func:`kgraft.relational.winsorize` (quantile_disc cuts from one
    histogram exchange, shuffle-free clip)."""
    from .relational import winsorize

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    w = winsorize(ev, "value", 0.05, 0.95)
    out = pre_aggregate(
        w, ["event_type"], {"wmean": ("value", "mean"), "n": (None, "count")}
    )
    out["wmean"] = sql_round(out["wmean"], 6)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type", ignore_index=True)[
        ["event_type", "wmean", "n"]
    ]


_WINSORIZE_SQL = """
WITH cuts AS (
  SELECT quantile_disc(value, 0.05) AS lo,
         quantile_disc(value, 0.95) AS hi
  FROM events
)
SELECT event_type,
       round(avg(least(greatest(value, lo), hi)), 6) AS wmean,
       count(*) AS n
FROM events, cuts GROUP BY event_type ORDER BY event_type
"""


def fuzzy_name_pairs(sf_dir: str) -> pd.DataFrame:
    """First 100 customer-key pairs whose names sit at edit distance
    <= 1 — FastSS deletion-neighborhood blocking, see
    :func:`kgraft.textops.fuzzy_pairs_ed1`."""
    from .textops import fuzzy_pairs_ed1

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    out = fuzzy_pairs_ed1(cust, "c_custkey", "c_name").to_pandas()
    return out.sort_values(["key_a", "key_b"], ignore_index=True).head(100)


_FUZZY_PAIRS_SQL = """
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY key_a, key_b LIMIT 100
"""


def ccnet_bucket_sample_docs(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity-bucket sampling (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC): per language, documents split into head/middle/tail
    NLL terciles under the corpus unigram LM; the head keeps all docs,
    the middle 50 %, the tail 10 % — selection by the deterministic
    SQL-replayable draw (same Knuth map as weighted_sample). Output:
    (lang, bucket, n_docs, n_kept). Composite of the already-oracled
    pieces: unigram_nll -> bucketed doc_id join -> windowed NTILE ->
    shuffle-free draw -> pre-aggregated counts."""
    from .relational import hash_join, pre_aggregate, windowed

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    nll = textops.unigram_nll(docs, vocab_size=1000)
    lang = docs.map_batches(
        lambda df: df[["doc_id", "lang"]], batch_format="pandas"
    )
    j = hash_join(
        nll,
        lang,
        on="doc_id",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("avg_nll", pa.float64())]
        ),
        right_schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
    )
    win = windowed(
        j,
        part_keys="lang",
        order_keys=["avg_nll"],
        specs={"bucket": ("ntile", None, 3)},
        tiebreak=["doc_id"],
    )

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.uint64)
        u = (
            ((ids * np.uint64(2654435761)) % np.uint64(2**32)).astype(
                np.float64
            )
            + 1.0
        ) / float(2**32 + 2)
        b = df["bucket"].to_numpy().astype(np.int64)
        rate = np.where(b == 1, 1.0, np.where(b == 2, 0.5, 0.1))
        return pd.DataFrame(
            {
                "lang": df["lang"],
                "bucket": b,
                "kept": (u < rate).astype("int64"),
            }
        )

    out = pre_aggregate(
        win.map_batches(decide, batch_format="pandas"),
        ["lang", "bucket"],
        {"n_docs": (None, "count"), "n_kept": ("kept", "sum")},
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_kept"] = out["n_kept"].astype("int64")
    return out.sort_values(["lang", "bucket"], ignore_index=True)[
        ["lang", "bucket", "n_docs", "n_kept"]
    ]


_CCNET_BUCKET_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
),
tot AS (SELECT count(*) AS n FROM toks),
vocab AS (
  SELECT t, count(*) AS c FROM toks GROUP BY t
  ORDER BY c DESC, t LIMIT 1000
),
nll AS (
  SELECT toks.doc_id,
         round(avg(-ln((coalesce(vocab.c, 0) + 1.0) / (tot.n + 1001.0))), 6)
             AS avg_nll
  FROM toks CROSS JOIN tot LEFT JOIN vocab ON toks.t = vocab.t
  GROUP BY toks.doc_id
),
b AS (
  SELECT d.doc_id, d.lang,
         CAST(ntile(3) OVER (
           PARTITION BY d.lang ORDER BY nll.avg_nll, d.doc_id
         ) AS BIGINT) AS bucket
  FROM documents d JOIN nll ON d.doc_id = nll.doc_id
),
s AS (
  SELECT lang, bucket,
         CASE bucket WHEN 1 THEN 1.0 WHEN 2 THEN 0.5 ELSE 0.1 END AS rate,
         ((((doc_id * 2654435761) % 4294967296)) + 1) / 4294967298.0 AS u
  FROM b
)
SELECT lang, bucket, count(*) AS n_docs,
       sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS n_kept
FROM s GROUP BY lang, bucket ORDER BY lang, bucket
"""


def c4_clean_docs(sf_dir: str) -> pd.DataFrame:
    """C4 line+page cleaning over the documents table — see
    :func:`kgraft.textops.c4_clean`. (The synthetic corpus carries no
    punctuation, so every page fails the sentence rule — the oracle
    still checks the full rule pipeline byte-for-byte; realistic-text
    behavior is pytest-planted.)"""
    from .textops import c4_clean

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = c4_clean(docs).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


_C4_CLEAN_SQL = """
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS i
  FROM documents
), kept_lines AS (
  SELECT doc_id, line, i FROM lines
  WHERE regexp_matches(line, '[.!?"]\\s*$')
    AND len(string_split(trim(line), ' ')) >= 5
    AND NOT contains(lower(line), 'javascript')
), agg AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS ctext
  FROM kept_lines GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.ctext, '') AS text,
       (coalesce(len(regexp_extract_all(a.ctext, '[.!?]')), 0) >= 3
        AND NOT contains(lower(d.text), 'lorem ipsum')
        AND NOT contains(d.text, '{')) AS kept
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def scenario_revenue(sf_dir: str) -> pd.DataFrame:
    """Per-scenario discounted revenue: lineitem CROSS JOIN a 3-row
    scenario grid — see :func:`kgraft.relational.cross_join_small`
    (broadcast parameter table, shuffle-free replicate, partial-summed
    per scenario)."""
    from .relational import cross_join_small

    grid = pd.DataFrame(
        {"scenario": ["base", "bear", "bull"], "mult": [1.0, 0.9, 1.1]}
    )
    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice", "l_discount"])
    x = cross_join_small(li, grid)
    terms = x.map_batches(
        lambda df: pd.DataFrame(
            {
                "scenario": df["scenario"],
                "rev": df["l_extendedprice"]
                * (1.0 - df["l_discount"])
                * df["mult"],
            }
        ),
        batch_format="pandas",
    )
    out = pre_aggregate(terms, ["scenario"], {"revenue": ("rev", "sum")})
    out["revenue"] = sql_round(out["revenue"], 2)
    return out.sort_values("scenario", ignore_index=True)


_SCENARIO_REVENUE_SQL = """
WITH grid AS (
  SELECT * FROM (VALUES ('base', 1.0), ('bear', 0.9), ('bull', 1.1))
    AS t(scenario, mult)
)
SELECT scenario,
       round(sum(l_extendedprice * (1.0 - l_discount) * mult), 2) AS revenue
FROM lineitem CROSS JOIN grid
GROUP BY scenario ORDER BY scenario
"""


def gap_fill_hourly_events(sf_dir: str) -> pd.DataFrame:
    """Hourly per-type value series with gaps forward-filled — see
    :func:`kgraft.relational.gap_fill` (resample + ffill over a
    generate_series grid)."""
    from .relational import gap_fill

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    hourly = ev.map_batches(
        lambda df: pd.DataFrame(
            {
                "event_type": df["event_type"],
                "h": df["ts"].dt.floor("h"),
                "value": df["value"],
            }
        ),
        batch_format="pandas",
    )
    agg = pre_aggregate_ds(hourly, ["event_type", "h"], {"v": ("value", "sum")})
    out = gap_fill(agg, "event_type", "h", "v", freq="h").to_pandas()
    out["v"] = sql_round(out["v"], 4)
    return out.sort_values(["event_type", "h"], ignore_index=True)


_GAP_FILL_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h, sum(value) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(h) AS lo, max(h) AS hi FROM agg GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
), j AS (
  SELECT g.event_type, g.h, a.v
  FROM grid g LEFT JOIN agg a USING (event_type, h)
)
SELECT event_type, h,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS v
FROM j ORDER BY event_type, h
"""


def unpivot_lineitem_stats(sf_dir: str) -> pd.DataFrame:
    """Per-measure totals over an UNPIVOT of the four lineitem measures
    — see :func:`kgraft.relational.unpivot` (shuffle-free melt; only
    (variable, partial) rows cross the final 4-key reduce)."""
    from .relational import unpivot

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    u = unpivot(
        li, [], ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    out = pre_aggregate(
        u,
        ["variable"],
        {
            "total": ("value", "sum"),
            "avg_value": ("value", "mean"),
            "n": (None, "count"),
        },
    )
    out["total"] = sql_round(out["total"], 4)
    out["avg_value"] = sql_round(out["avg_value"], 6)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("variable", ignore_index=True)[
        ["variable", "total", "avg_value", "n"]
    ]


_UNPIVOT_SQL = """
WITH u AS (
  SELECT 'l_quantity' AS variable, l_quantity::DOUBLE AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT variable, round(sum(value), 4) AS total,
       round(avg(value), 6) AS avg_value, count(*) AS n
FROM u GROUP BY variable ORDER BY variable
"""


def weighted_sample_events(sf_dir: str) -> pd.DataFrame:
    """Top-20 weighted sample (without replacement) of events by value
    — see :func:`kgraft.relational.weighted_sample` (Efraimidis-
    Spirakis exponential keys, deterministic SQL-replayable draws)."""
    from .relational import weighted_sample

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])
    out = weighted_sample(
        ev, "value", 20, "event_id", keep_cols=["value"]
    ).to_pandas()
    out["score"] = sql_round(out["score"], 6)
    return out[["event_id", "score", "value"]].reset_index(drop=True)


_WEIGHTED_SAMPLE_SQL = """
SELECT event_id,
       round(ln((((event_id * 2654435761) % 4294967296) + 1)
                / 4294967298.0) / value, 6) AS score,
       value
FROM events WHERE value > 0
ORDER BY ln((((event_id * 2654435761) % 4294967296) + 1)
            / 4294967298.0) / value DESC, event_id
LIMIT 20
"""


def zscore_event_values(sf_dir: str):
    """Global z-score of event values (two-pass standardization) —
    see :func:`kgraft.relational.standardize`."""
    from .relational import standardize

    ds = read_table(sf_dir, "events", columns=["event_id", "value"])
    return standardize(ds, "value", out_col="z").map_batches(
        lambda df: df[["event_id", "z"]], batch_format="pandas"
    )


_ZSCORE_SQL = """
SELECT event_id,
       round((value - avg(value) OVER ()) / stddev_samp(value) OVER (), 6) AS z
FROM events
"""


def hot_users_events(sf_dir: str) -> pd.DataFrame:
    """Skew diagnostics: the 10 hottest user_ids in the event stream
    with their share of all rows — the pre-pass that decides
    ``num_salts`` for a user-keyed join/groupby. See
    :func:`kgraft.relational.hot_keys`."""
    from .relational import hot_keys

    return hot_keys(read_table(sf_dir, "events", columns=["user_id"]), "user_id", k=10)


_HOT_USERS_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       round(count(*) / (SELECT count(*)::DOUBLE FROM events), 6) AS share
FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
"""


def skew_salted_join_events(sf_dir: str) -> pd.DataFrame:
    """Planted-skew fact-fact join through the full skew playbook:
    derive a Zipf-headed key (every user_id divisible by 3 collapses to
    key 0 — ~1/3 of all rows on ONE key), run :func:`relational.hot_keys`
    to measure the head, and push the join through the salted
    :func:`relational.hash_join` with ``num_salts`` chosen from the
    measured share. Without salting, the hot key's rows serialize on one
    reducer; with salts, its left rows spread over ``num_salts`` buckets
    while each still meets exactly one copy of its match
    (SURVEY.md §4 skew row; relational.py:542 documents the mechanics).

    Output is all-integer (exact under any partial-sum order): per
    event_type, row count and sum of the joined per-key count — each
    left row must have met exactly one right row for the totals to
    match the oracle."""
    from .relational import hash_join, hot_keys, pre_aggregate_ds

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = np.where(uid % 3 == 0, 0, uid)
        return pa.table(
            {
                "skew_uid": pa.array(sk, pa.int64()),
                "event_type": t["event_type"],
            }
        )

    left = ev.map_batches(derive, batch_format="pyarrow")
    # the diagnostic pre-pass: measure the head, size the salts from it
    head = hot_keys(left.select_columns(["skew_uid"]), "skew_uid", k=1)
    top_share = float(head["share"].iloc[0]) if len(head) else 0.0
    num_salts = 8 if top_share >= 0.2 else 1

    side = pre_aggregate_ds(
        left.select_columns(["skew_uid"]), "skew_uid", {"cnt": (None, "count")}
    )
    joined = hash_join(
        left,
        side,
        on="skew_uid",
        num_salts=num_salts,
        left_schema=pa.schema(
            [("skew_uid", pa.int64()), ("event_type", pa.string())]
        ),
        right_schema=pa.schema([("skew_uid", pa.int64()), ("cnt", pa.int64())]),
    )
    out = (
        pre_aggregate_ds(
            joined,
            "event_type",
            {"n_rows": (None, "count"), "sum_cnt": ("cnt", "sum")},
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_cnt"] = out["sum_cnt"].astype("int64")
    return out


_SKEW_SALTED_JOIN_SQL = """
WITH ev AS (
  SELECT event_type,
         CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS skew_uid
  FROM events
),
side AS (
  SELECT skew_uid, CAST(count(*) AS BIGINT) AS cnt FROM ev GROUP BY skew_uid
)
SELECT ev.event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(side.cnt) AS BIGINT) AS sum_cnt
FROM ev JOIN side ON ev.skew_uid = side.skew_uid
GROUP BY ev.event_type
ORDER BY ev.event_type
"""


def auto_skew_join_events(sf_dir: str) -> pd.DataFrame:
    """The same planted-Zipf fact-fact join as
    :func:`skew_salted_join_events`, but through
    :func:`kgraft.relational.auto_hash_join` — the engine measures the
    head share itself and sizes the salts (here share ~1/3 ->
    num_salts=4 at hot_share=0.1). Same all-integer oracle: exactness
    under auto-salting is the point."""
    from .relational import auto_hash_join, pre_aggregate_ds

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = np.where(uid % 3 == 0, 0, uid)
        return pa.table(
            {"skew_uid": pa.array(sk, pa.int64()), "event_type": t["event_type"]}
        )

    left = ev.map_batches(derive, batch_format="pyarrow").materialize()
    side = pre_aggregate_ds(
        left.select_columns(["skew_uid"]), "skew_uid", {"cnt": (None, "count")}
    )
    joined = auto_hash_join(
        left,
        side,
        on="skew_uid",
        left_schema=pa.schema(
            [("skew_uid", pa.int64()), ("event_type", pa.string())]
        ),
        right_schema=pa.schema([("skew_uid", pa.int64()), ("cnt", pa.int64())]),
    )
    out = (
        pre_aggregate_ds(
            joined,
            "event_type",
            {"n_rows": (None, "count"), "sum_cnt": ("cnt", "sum")},
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    out["n_rows"] = out["n_rows"].astype("int64")
    out["sum_cnt"] = out["sum_cnt"].astype("int64")
    return out


def doc_unigram_nll(sf_dir: str):
    """Per-doc avg negative log-likelihood under the corpus unigram LM
    (CCNet-style perplexity quality signal) — see
    :func:`kgraft.textops.unigram_nll`."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textops.unigram_nll(docs, vocab_size=1000)


_UNIGRAM_NLL_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
  FROM documents
),
tot AS (SELECT count(*) AS n FROM toks),
vocab AS (
  SELECT t, count(*) AS c FROM toks GROUP BY t
  ORDER BY c DESC, t LIMIT 1000
)
SELECT toks.doc_id,
       round(avg(-ln((coalesce(vocab.c, 0) + 1.0) / (tot.n + 1001.0))), 6)
           AS avg_nll
FROM toks CROSS JOIN tot LEFT JOIN vocab ON toks.t = vocab.t
GROUP BY toks.doc_id
"""


def approx_top_tokens_docs(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries sketch + exact-rescore top-20 tokens. Same answer as
    ``top_tokens_docs`` (hence the shared oracle) via the sketch path
    whose exchange is O(m) rows per batch instead of batch-vocab-sized —
    see :func:`kgraft.textops.approx_top_tokens`."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    return textops.approx_top_tokens(docs, k=20)


# ---------------------------------------------------------------------------
# documents: dedup + text analysis


def dedup_exact_docs(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textops.exact_dedup(docs)


_DEDUP_EXACT_SQL = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"


def token_count_docs(sf_dir: str):
    return textops.token_counts(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_tokens
FROM documents
"""


def doc_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    docs = read_table(sf_dir, "documents", columns=["lang", "n_chars"])
    out = pre_aggregate(
        docs,
        ["lang"],
        {
            "n_docs": (None, "count"),
            "avg_chars": ("n_chars", "mean"),
            "max_chars": ("n_chars", "max"),
        },
    )
    out["avg_chars"] = sql_round(out["avg_chars"], 4)
    out["max_chars"] = out["max_chars"].astype("int64")
    return out


_DOC_STATS_SQL = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


def near_dup_docs(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textops.near_dup_groups(docs, threshold=0.7)


def ngram_jaccard_dup(sf_dir: str):
    """Pure n-gram-Jaccard near-dup labels (LSH blocking, exact verify)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textops.ngram_jaccard_groups(docs, threshold=0.7, shingle_k=4)


def simhash_docs_q(sf_dir: str):
    return textops.simhash_docs(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def simhash_near_dup_q(sf_dir: str):
    return textops.simhash_near_dup(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), max_hamming=3
    )


def langid_docs_q(sf_dir: str):
    return textops.langid_docs(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def quality_docs_q(sf_dir: str):
    return textops.quality_scores(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def fingerprint_docs_q(sf_dir: str):
    return textops.fingerprint_docs(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def normalize_docs(sf_dir: str):
    """NFC + lowercase + whitespace-collapse text normalization (the
    pre-tokenization cleanup pass), SQL-twinned via nfc_normalize/
    regexp_replace."""
    return textops.normalize_text(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


def chunk_docs(sf_dir: str):
    """Fixed-window 500-char chunks at 400-char stride (100-char
    overlap) over the documents table — RAG/long-doc splitting as a
    shuffle-free vectorized explode; see
    :func:`kgraft.textops.chunk_documents`."""
    out = textops.chunk_documents(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        size=500,
        stride=400,
    ).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"], ignore_index=True)


_CHUNK_DOCS_SQL = """
WITH k AS (
  SELECT doc_id, text,
         unnest(generate_series(
             0, CAST(ceil(length(text) / 400.0) AS BIGINT) - 1)) AS chunk_idx
  FROM documents
)
SELECT doc_id, chunk_idx,
       substr(text, CAST(chunk_idx * 400 + 1 AS BIGINT), 500) AS chunk_text,
       CAST(length(substr(text, CAST(chunk_idx * 400 + 1 AS BIGINT), 500))
            AS BIGINT) AS n_chars
FROM k ORDER BY doc_id, chunk_idx
"""


def repetition_docs(sf_dir: str):
    """Gopher-style repetition quality signals (dup-line fraction,
    dup-line char fraction, top-2-gram char fraction, dup-3-gram char
    fraction) — shuffle-free per-document curation pass."""
    return textops.repetition_signals(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )


_REPETITION_SQL = r"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
), per_line AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS l FROM lines GROUP BY doc_id, line
), line_agg AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         sum(c) - count(*) AS dup_lines,
         sum(c * l) AS line_chars,
         sum((c - 1) * l) AS dup_line_chars
  FROM per_line GROUP BY doc_id
), toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents
), tok_chars AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(ts, t -> length(t))), 0) AS tchars
  FROM toks
), bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS g
  FROM toks
), bi_cnt AS (
  SELECT doc_id, g, length(g) - 1 AS gl, count(*) AS c FROM bi GROUP BY doc_id, g
), bi_top AS (
  SELECT doc_id, max(c * gl) AS top2_chars FROM bi_cnt GROUP BY doc_id
), tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS g
  FROM toks
), tri_cnt AS (
  SELECT doc_id, g, length(g) - 2 AS gl, count(*) AS c FROM tri GROUP BY doc_id, g
), tri_dup AS (
  SELECT doc_id, sum(CASE WHEN c > 1 THEN c * gl ELSE 0 END) AS dup3_chars
  FROM tri_cnt GROUP BY doc_id
)
SELECT d.doc_id,
       round(la.dup_lines / la.n_lines, 6) AS dup_line_frac,
       round(coalesce(la.dup_line_chars / nullif(la.line_chars, 0), 0), 6)
           AS dup_line_char_frac,
       round(coalesce(bt.top2_chars / nullif(tc.tchars, 0), 0), 6)
           AS top_2gram_char_frac,
       round(coalesce(td.dup3_chars / nullif(tc.tchars, 0), 0), 6)
           AS dup_3gram_char_frac
FROM documents d
JOIN line_agg la USING (doc_id)
JOIN tok_chars tc USING (doc_id)
LEFT JOIN bi_top bt USING (doc_id)
LEFT JOIN tri_dup td USING (doc_id)
"""


_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS norm_text
FROM documents
"""


def redact_pii_docs(sf_dir: str):
    """PII scrubbing (emails/IPv4/phones -> typed placeholders); the
    synthetic corpus is PII-free so this is a byte-identity pass here —
    the planted-PII equivalence oracle lives in tests/test_textops.py."""
    return textops.redact_pii(
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ).select_columns(["doc_id", "text_clean"])


_REDACT_PII_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
         '(\+\d{1,2}[-. ]?)?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '[PHONE]', 'g')
       AS text_clean
FROM documents
"""


def dedup_incremental_docs(sf_dir: str):
    """Incremental-crawl dedup: docs from source 'src0' stand in for the
    previous snapshot; every other doc whose exact text already exists
    there is dropped (128-bit content-key anti join — the exchange moves
    hashes, never documents)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    corpus = docs.map_batches(
        lambda df: df[df["source"] != "src0"][["doc_id", "text"]],
        batch_format="pandas",
    )
    ref = docs.map_batches(
        lambda df: df[df["source"] == "src0"][["text"]], batch_format="pandas"
    )
    return textops.dedup_against(corpus, ref).select_columns(["doc_id"])


_DEDUP_INCREMENTAL_SQL = """
SELECT d.doc_id
FROM documents d
WHERE d.source <> 'src0'
  AND NOT EXISTS (
    SELECT 1 FROM documents r WHERE r.source = 'src0' AND r.text = d.text
  )
"""


def tokenize_docs_q(sf_dir: str):
    """Vocab-broadcast tokenization (id 0 = UNK, ids 1..512 by count
    desc / token asc) — the encode step before sequence packing,
    surfaced FLAT as (doc_id, pos, token_id) so the driver's
    value-hash covers every id (a nested list<int32> column hashes
    through its string repr, which differs between Arrow and DuckDB;
    r4 VERDICT next #1). The nested-sequence form stays on
    :func:`kgraft.textops.tokenize_docs` with its brute-force pytest
    in tests/test_textops.py; integer arithmetic end to end makes the
    DuckDB twin (_TOKENIZE_DOCS_SQL) exact."""
    t = textops.tokenize_docs(
        read_table(sf_dir, "documents", columns=["doc_id", "text"]), vocab_size=512
    )

    def explode(tab: pa.Table) -> pa.Table:
        col = tab.column("input_ids").combine_chunks()
        offs = col.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        doc = np.repeat(tab.column("doc_id").to_numpy(), lens)
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            offs[:-1], lens
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "token_id": pa.array(
                    col.flatten().to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return t.map_batches(explode, batch_format="pyarrow")


# Exact integer twin: same token regex, same top-512 cut (count desc,
# token asc), UNK = 0; positions from per-doc list ordinals.
_TOKENIZE_DOCS_SQL = """
WITH x AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
  FROM documents
),
toks AS (
  SELECT doc_id, ts[CAST(i AS INT)] AS token, CAST(i - 1 AS BIGINT) AS pos
  FROM x, LATERAL unnest(range(1, len(ts) + 1)) u(i)
),
vc AS (SELECT token AS t, count(*) AS n FROM toks GROUP BY 1),
vocab AS (
  SELECT t, row_number() OVER (ORDER BY n DESC, t ASC) AS token_id
  FROM vc QUALIFY token_id <= 512
)
SELECT toks.doc_id, toks.pos,
       CAST(coalesce(vocab.token_id, 0) AS BIGINT) AS token_id
FROM toks LEFT JOIN vocab ON vocab.t = toks.token
ORDER BY doc_id, pos
"""


def pack_docs(sf_dir: str):
    """Sequence packing for training: greedy next-fit of documents into
    256-token packs, deterministic in doc-id order within fixed id
    ranges (kgraft/curation.py pack_sequences). The sequential greedy
    is replayed in the DuckDB twin (_PACK_DOCS_SQL) as a recursive CTE
    stepping one PACK per iteration over the (range, doc_id)-ordered
    token cumsum — integer arithmetic end to end, so the twin is
    exact; the straight-line oracle + parallelism-invariance tests
    live in tests/test_curation.py."""
    from .curation import pack_sequences

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(docs, budget=256)


# Greedy next-fit replay: rn/csum over (rng, doc_id) order; each
# recursion step closes one pack — the next start is the first rn
# whose cumsum exceeds base+budget (searchsorted right), clamped to
# the range end, min one doc per pack (oversize docs pack alone).
_PACK_DOCS_SQL = """
WITH RECURSIVE d AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS tok,
         doc_id // 4096 AS rng
  FROM documents
),
o AS (
  SELECT doc_id, tok, rng,
         row_number() OVER (ORDER BY rng, doc_id) AS rn,
         sum(tok) OVER (ORDER BY rng, doc_id) AS csum
  FROM d
),
re AS (SELECT o.*, max(rn) OVER (PARTITION BY rng) AS row_end FROM o),
packs AS (
  SELECT CAST(1 AS BIGINT) AS s
  UNION ALL
  SELECT (
    SELECT CASE WHEN e0 = p.s THEN p.s + 1 ELSE e0 END FROM (
      SELECT least(
        coalesce((SELECT min(rn) FROM re WHERE csum >
                    coalesce((SELECT csum FROM re WHERE rn = p.s - 1), 0)
                    + 256),
                 (SELECT max(rn) FROM re) + 1),
        (SELECT row_end FROM re WHERE rn = p.s) + 1
      ) AS e0
    ) q
  )
  FROM packs p
  WHERE p.s <= (SELECT max(rn) FROM re)
),
asg AS (
  SELECT re.*, (SELECT max(s) FROM packs WHERE s <= re.rn) AS ps FROM re
),
pt AS (SELECT ps, sum(tok) AS ptok FROM asg GROUP BY ps)
SELECT asg.doc_id,
       (SELECT doc_id FROM re WHERE rn = asg.ps) AS pack_id,
       CAST(asg.rn - asg.ps AS BIGINT) AS seq_pos,
       asg.tok AS n_tokens,
       CAST(pt.ptok AS BIGINT) AS pack_tokens,
       asg.tok > 256 AS oversize
FROM asg JOIN pt ON pt.ps = asg.ps
ORDER BY doc_id
"""


def split_docs(sf_dir: str):
    """Leakage-free train/val/test assignment: split = content hash, so
    exact duplicates always share a split (curation.assign_splits).
    DuckDB twin (_SPLIT_DOCS_SQL) replays the exact FNV-1a-over-bytes →
    xor seed 11 → splitmix64 chain per document with uint64 arithmetic
    (same split-multiply idiom as the SimHash twin) and the 98/1/1
    slot cuts; the duplicate-invariant + fraction tests live in
    tests/test_curation.py."""
    from .curation import assign_splits

    return assign_splits(read_table(sf_dir, "documents", columns=["doc_id", "text"]))


# hash_strings(text, seed=11) replayed in SQL: recursive per-byte
# FNV-1a (exact uint64 split-multiplies, ASCII corpus so ascii() ==
# byte), xor the seed, splitmix64-finalize; slot = h % 1e6 against the
# cumulative-fraction cuts (980000/990000 exactly — np.cumsum of
# (.98,.01,.01) * 1e6 lands on integral doubles).
_SPLIT_DOCS_SQL = """
WITH fnv AS (
  SELECT doc_id, h FROM (
    WITH RECURSIVE f(doc_id, pos, h) AS (
      SELECT doc_id, 1, CAST(14695981039346656037 AS UBIGINT) FROM documents
      UNION ALL
      SELECT f.doc_id, f.pos + 1,
        CAST((
          (CAST(xor(f.h, CAST(ascii(substr(d.text, f.pos, 1)) AS UBIGINT))
                % 4294967296 AS HUGEINT) * 1099511628211
           + ((CAST(xor(f.h, CAST(ascii(substr(d.text, f.pos, 1)) AS UBIGINT))
                // 4294967296 AS HUGEINT) * 1099511628211)
              % 4294967296) * 4294967296)
        ) % 18446744073709551616 AS UBIGINT)
      FROM f JOIN documents d ON d.doc_id = f.doc_id
      WHERE f.pos <= length(d.text)
    ) SELECT f.doc_id, f.h
      FROM f JOIN documents d ON d.doc_id = f.doc_id
      WHERE f.pos = length(d.text) + 1
  )
),
z0 AS (SELECT doc_id, xor(h, CAST(11 AS UBIGINT)) AS z FROM fnv),
m1 AS (SELECT doc_id, CAST((CAST(z AS HUGEINT) + 11400714819323198485)
                           % 18446744073709551616 AS UBIGINT) AS z FROM z0),
m1x AS (SELECT doc_id, xor(z, z >> 30) AS z FROM m1),
m2 AS (SELECT doc_id, CAST(((CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
        + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z
       FROM m1x),
m2x AS (SELECT doc_id, xor(z, z >> 27) AS z FROM m2),
m3 AS (SELECT doc_id, CAST(((CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
        + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z
       FROM m2x),
hfin AS (SELECT doc_id, xor(z, z >> 31) AS h FROM m3)
SELECT doc_id,
       CASE WHEN h % 1000000 <= 979999 THEN 'train'
            WHEN h % 1000000 <= 989999 THEN 'val'
            ELSE 'test' END AS split
FROM hfin ORDER BY doc_id
"""


def curate_documents(sf_dir: str):
    """The composite training-corpus curation pipeline: quality/length
    filter -> exact dedup -> near-dup representative selection ->
    benchmark decontamination, in one streaming DAG
    (kgraft/curation.py). Every 29th document stands in for the eval
    suite. Rows-only driver check; the per-rule planted-fixture oracle
    lives in tests/test_curation.py."""
    from .curation import prepare_training_corpus

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda df: df[df["doc_id"] % 29 == 0], batch_format="pandas"
    )
    return prepare_training_corpus(
        docs, bench, min_quality=0.2, min_tokens=10, near_dup_threshold=0.9
    )


def decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: every 29th document stands in for an
    eval suite; every corpus doc sharing any 32-char shingle with it is
    flagged. DuckDB twin: distinct 32-char windows semi-joined on exact
    substring equality (_DECONTAMINATE_SQL); the brute-force pytest
    oracle lives in tests/test_textops.py."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        lambda df: df[df["doc_id"] % 29 == 0], batch_format="pandas"
    )
    return textops.decontaminate(docs, bench)


# ---------------------------------------------------------------------------
# embeddings: similarity search


def cluster_embeddings(sf_dir: str):
    """K-means corpus clustering (diversity bucketing / domain
    discovery): every vector -> nearest coarse cell. Rows-only driver
    check (centroid training is iterative, not SQL); the nearest-
    centroid brute-force oracle and repartition-invariance test live in
    tests/test_embedops.py."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedops.kmeans_assign(emb, n_cells=16)


def cluster_quality_embeddings(sf_dir: str) -> pd.DataFrame:
    """Clustering-quality readout over the k-means cells (per-cluster
    size/inertia/scatter + Davies-Bouldin index as a constant column) —
    the monitoring pass run after every corpus clustering; see
    :func:`kgraft.embedops.cluster_quality`. Rows-only; the serial
    oracle lives in tests/test_embedops.py."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    per, db = embedops.cluster_quality(emb, n_cells=16)
    per["inertia"] = sql_round(per["inertia"], 4)
    per["scatter"] = sql_round(per["scatter"], 4)
    per["db_index"] = sql_round(db, 4)
    return per


def knn_cosine_topk(sf_dir: str) -> pd.DataFrame:
    emb = read_table(sf_dir, "embeddings")
    q = embedops.get_query_vector(emb, vec_id=0)
    return embedops.knn_topk(emb, q, k=10).to_pandas()


_KNN_SQL = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding, q.qe), 4) AS score
FROM embeddings e, q
ORDER BY score DESC, e.vec_id LIMIT 10
"""


def hard_negatives_embeddings(sf_dir: str) -> pd.DataFrame:
    """Contrastive hard-negative pairs over the embeddings table: each
    vector's most-similar DIFFERENT-label neighbor within its k-means
    cell (metric-learning pair mining; cluster-local by design). See
    :func:`kgraft.embedops.hard_negatives`. Rows-only; the same-
    assignment brute-force oracle lives in tests/test_embedops.py."""
    emb = read_table(sf_dir, "embeddings")
    out = embedops.hard_negatives(emb, n_cells=8).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["neg_id"] = out["neg_id"].astype("int64")
    return out.sort_values("vec_id", ignore_index=True).head(200)


def pca_embeddings(sf_dir: str) -> pd.DataFrame:
    """PCA spectrum of the embedding corpus: per-component explained
    variance/ratio from ONE streaming moment pass (d + d² floats per
    block, driver-side eigh at model-dimension scale, deterministic
    sign convention). See :func:`kgraft.embedops.pca_fit`. Rows-only;
    the numpy-eigendecomposition oracle lives in tests/test_embedops.py."""
    emb = read_table(sf_dir, "embeddings")
    model = embedops.pca_fit(emb, n_components=8)
    return pd.DataFrame(
        {
            "component": np.arange(1, len(model["explained_var"]) + 1, dtype="int64"),
            "explained_var": sql_round(model["explained_var"], 6),
            "explained_ratio": sql_round(model["explained_ratio"], 6),
        }
    )


def mmr_diverse_neighbors(sf_dir: str) -> pd.DataFrame:
    """MMR-diversified top-10 neighbors of vec_id 0 (λ = 0.7, shortlist
    100) — the redundancy-suppressing re-rank retrieval stacks run after
    ANN. See :func:`kgraft.embedops.mmr_rerank`. Rows-only driver check
    (the greedy selection is not SQL-expressible); the serial-greedy
    oracle lives in tests/test_embedops.py."""
    emb = read_table(sf_dir, "embeddings")
    q = embedops.get_query_vector(emb, vec_id=0)
    return embedops.mmr_rerank(emb, q, k=10, shortlist=100, lam=0.7)


def ivf_ann_topk(sf_dir: str) -> pd.DataFrame:
    emb = read_table(sf_dir, "embeddings")
    q = embedops.get_query_vector(emb, vec_id=0)
    return embedops.ivf_topk(emb, q, k=10).to_pandas()


def pq_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN (ADC shortlist + exact rerank) — the
    memory-compression similarity tier. See
    :func:`kgraft.embedops.pq_topk`."""
    emb = read_table(sf_dir, "embeddings")
    q = embedops.get_query_vector(emb, vec_id=0)
    return embedops.pq_topk(emb, q, k=10).to_pandas()


def unnest_embeddings(sf_dir: str) -> pd.DataFrame:
    """UNNEST WITH ORDINALITY over the embedding list column: one row
    per vector element (vectorized Arrow explode, shuffle-free)."""
    from .relational import unnest

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = unnest(emb, "embedding", out_col="val", ord_col="ord")
    return (
        out.map_batches(
            lambda df: df.assign(val=sql_round(df["val"], 6)), batch_format="pandas"
        )
        .sort(["vec_id", "ord"])
        .to_pandas()
    )


_UNNEST_SQL = """
SELECT vec_id, generate_subscripts(embedding, 1) AS ord,
       round(UNNEST(embedding), 6) AS val
FROM embeddings
ORDER BY vec_id, ord
"""


def label_norms(sf_dir: str) -> pd.DataFrame:
    emb = read_table(sf_dir, "embeddings")
    return embedops.label_norm_stats(emb)


def embed_near_dup_q(sf_dir: str):
    emb = read_table(sf_dir, "embeddings")
    return embedops.embed_near_dup(emb, threshold=0.95)


def knn_multi_q(sf_dir: str) -> pd.DataFrame:
    """Top-5 cosine neighbors for a 5-vector query batch in one corpus
    pass — see :func:`kgraft.embedops.knn_topk_multi`."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = embedops.knn_topk_multi(emb, [0, 1, 2, 3, 4], k=5).to_pandas()
    return out.sort_values(
        ["query_id", "score", "vec_id"],
        ascending=[True, False, True],
        ignore_index=True,
    )


_KNN_MULTI_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
), s AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding, q.qe), 4) AS score
  FROM embeddings e, q
)
SELECT query_id, vec_id, score FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
  FROM s
) WHERE rn <= 5
ORDER BY query_id, score DESC, vec_id
"""


def semdedup_embeddings_q(sf_dir: str):
    """SemDeDup groups over the embeddings table — see
    :func:`kgraft.embedops.semdedup` (k-means + within-cluster cosine;
    no SQL oracle: clustering is iterative, pytest-checked against a
    same-assignment brute-force oracle instead)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedops.semdedup(emb, n_cells=8, threshold=0.95)


_LABEL_NORMS_SQL = """
SELECT label, count(*) AS n_vecs,
       round(avg(sqrt(list_inner_product(embedding, embedding))), 4) AS avg_norm
FROM embeddings GROUP BY label
"""


def label_centroids_q(sf_dir: str) -> pd.DataFrame:
    """Per-label mean embedding, exploded to (label, pos, centroid) —
    the class-centroid table a diversity/balance pass scores against.
    See :func:`kgraft.embedops.label_centroids`."""
    emb = read_table(sf_dir, "embeddings")
    return embedops.label_centroids(emb)


_LABEL_CENTROIDS_SQL = """
SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       round(avg(x), 6) AS centroid
FROM (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         UNNEST(embedding) AS x
  FROM embeddings
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# flagship KG pipeline over the synthetic pages corpus (non-SQL)


_SF_TO_PAGES = {"0.001": 200, "0.01": 2000, "0.1": 20000}


def _pages_for(sf_dir: str) -> int:
    tag = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    return _SF_TO_PAGES.get(tag, 200)


# Namespaced per-process: concurrent runs (driver at sf0.01 while a
# pytest/tie-fuzz process runs sf0.001, or two check_oracle invocations)
# each get their own export tree and cannot clobber each other mid-read
# (r4 ADVICE low). The ORACLE_SQL f-strings interpolate this at import
# time, so query-export and SQL-read always agree within one process —
# the harness contract (Ray query runs immediately before its twin, in
# the same process) covers within-process freshness.
_ORACLE_INPUT_ROOT = f"/tmp/kgraft_oracle_inputs/pid{os.getpid()}"


def _export_oracle_input(name: str, ds) -> str:
    """Write a query's raw engine-derived INPUT columns to a stable path
    so its DuckDB twin can recompute the result independently.

    The driver registers only the 10 base tables as views; queries over
    the synthesized pages corpus or the materialized KG edge table
    (whose cache paths embed the scale factor, so a static SQL string
    cannot name them) would otherwise be stuck with rows-only checks.
    The gate always runs the Ray query before its SQL twin
    (scripts/check_oracle.py, same order as the driver), so the export
    is on disk when DuckDB reads it. Inputs only — never results — the
    twin performs the full computation itself."""
    import shutil

    out = os.path.join(_ORACLE_INPUT_ROOT, name)
    shutil.rmtree(out, ignore_errors=True)
    ds.write_parquet(out)
    return out


_KG_CACHE: dict = {}


def _kg_outputs(sf_dir: str) -> dict:
    """Run (or reuse) the flagship pipeline for this scale. Memoized so the
    kg_triples/kg_nodes/kg_edges queries share one run per process."""
    from .pipeline import PipelineConfig, run_kg_pipeline
    from .synth import SYNTH_VERSION, corpus_dir, sharded_pages

    n = _pages_for(sf_dir)
    if n in _KG_CACHE:
        return _KG_CACHE[n]
    d = corpus_dir(n)
    # output dir keyed by (synth version, n, seed) — a bare n{N} key would
    # let a resumed run serve checkpoints cut from a PREVIOUS corpus
    # version after a SYNTH_VERSION bump (ADVICE r1)
    out = f"/tmp/kgraft_out/v{SYNTH_VERSION}_n{n}_s42"
    res = run_kg_pipeline(
        sharded_pages(d),
        os.path.join(d, "alias_dict.parquet"),
        out,
        PipelineConfig(),
    )
    _KG_CACHE[n] = res
    return res


def kg_triples(sf_dir: str):
    m = _kg_outputs(sf_dir)
    return ray.data.read_parquet(m["triples_paths"]).select_columns(
        ["url", "seg_idx", "subj", "pred", "obj", "conf"]
    )


def kg_nodes(sf_dir: str):
    m = _kg_outputs(sf_dir)
    return ray.data.read_parquet(m["nodes_dir"])


def kg_edges(sf_dir: str):
    m = _kg_outputs(sf_dir)
    return ray.data.read_parquet(m["edges_dir"])


def _read_kg_edges(m: dict, columns):
    """Edge-table read with size-based block sizing: the checkpoint
    writer emits one small fragment per partition, and Ray's default
    split then shreds a vocab-scale edge table into ~64 tiny blocks —
    every downstream exchange pays a per-block task cost, and the
    triangle canon pass ships each block's copy of the popular edges
    (measured: kg_triangles 10.5 s at 64 blocks vs 4.5 s at 8 on the
    same input). Target ~8 MB compressed per block, floor 8; at corpus
    scale block count grows with the data."""
    import glob as _glob

    # RECURSIVE: the edge table is the per-partition frag-*.parquet
    # checkpoint fragments under part-*/ PLUS the top-level
    # delta-recovered.parquet — a top-level-only glob sees just the
    # recovery delta (the r5 kg_pagerank bug, caught by its new twin)
    files = sorted(
        _glob.glob(os.path.join(m["edges_dir"], "**", "*.parquet"), recursive=True)
    )
    total = sum(os.path.getsize(f) for f in files)
    blocks = max(8, total // (8 << 20) + 1)
    return ray.data.read_parquet(
        m["edges_dir"], columns=columns, override_num_blocks=blocks
    )


def kg_ppr(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank around the three lowest entity ids: top-20
    related entities — see
    :func:`kgraft.graph.pagerank.personalized_pagerank`. DuckDB twin
    (_KG_PPR_SQL): the seeded-teleport power iteration replayed as a
    recursive CTE (teleport vector 1/3 on the three lowest ids,
    dangling mass returned to the seeds), 8dp grid; the dense-oracle
    pytest lives in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.pagerank import personalized_pagerank

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    seeds = np.sort(np.unique(node_ids))[:3]
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"]).materialize()
    _export_oracle_input("kg_ppr", edges)
    _export_oracle_input("kg_ppr_nodes", ray.data.from_arrow(nodes_t))
    pr = personalized_pagerank(edges, node_ids, seeds, n_iter=15)
    pr["rank"] = sql_round(pr["rank"], 8)
    return pr.sort_values(
        ["rank", "node_id"], ascending=[False, True], ignore_index=True
    ).head(20)


def kg_khop(sf_dir: str) -> pd.DataFrame:
    """Nodes reachable within 3 hops of the three lowest entity ids:
    count per hop — see :func:`kgraft.graph.khop.k_hop_reach`.
    DuckDB twin: bounded recursive BFS over the exported edge/node
    tables (_KG_KHOP_SQL); the BFS-oracle pytest lives in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.khop import k_hop_reach

    m = _kg_outputs(sf_dir)
    node_ids = pq.read_table(m["nodes_dir"], columns=["entity_id"])[
        "entity_id"
    ].to_numpy()
    seeds = np.sort(np.unique(node_ids))[:3]
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"]).materialize()
    _export_oracle_input("kg_khop", edges)
    _export_oracle_input(
        "kg_khop_nodes",
        ray.data.from_arrow(
            pa.table({"entity_id": pa.array(np.sort(np.unique(node_ids)))})
        ),
    )
    reach = k_hop_reach(
        edges, node_ids, seeds, k=3, src_col="subj_id", dst_col="obj_id"
    )
    out = (
        reach.groupby("hop", as_index=False)
        .size()
        .rename(columns={"size": "n_nodes"})
    )
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out.sort_values("hop", ignore_index=True)


def canonical_url_dedup(sf_dir: str) -> pd.DataFrame:
    """Crawl-level URL canonicalization rollup: total pages, distinct
    canonical URLs, and the largest duplicate group — see
    :func:`kgraft.textops.canonicalize_urls`. DuckDB twin recomputes the
    fast-path canonicalization from the exported url column
    (_CANONICAL_URL_DEDUP_SQL); the urlsplit slow path is pytest-planted."""
    from .relational import pre_aggregate_ds
    from .synth import corpus_dir, sharded_pages
    from .textops import canonicalize_urls

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(sharded_pages(d), columns=["url"])
    _export_oracle_input("canonical_url_dedup", pages)
    canon = canonicalize_urls(pages)
    counts = pre_aggregate_ds(
        canon.select_columns(["canon_url"]), ["canon_url"], {"n": (None, "count")}
    ).materialize()
    n_canon = int(counts.count())
    n_pages = int(counts.sum("n"))
    max_dup = int(counts.max("n"))
    return pd.DataFrame(
        {"n_pages": [n_pages], "n_canonical": [n_canon], "max_dup": [max_dup]}
    )


def kg_communities(sf_dir: str) -> pd.DataFrame:
    """Top-20 label-propagation communities by size over the engine's
    materialized KG edges — see
    :func:`kgraft.graph.communities.label_propagation_communities`.
    DuckDB twin (_KG_COMMUNITIES_SQL): the 5 synchronous LPA rounds
    replayed one per recursion level with the engine's deterministic
    (count desc, label asc) argmax over undirected multiplicity-
    counted neighbor labels — integer-exact (the engine's early
    fixpoint break is label-invariant, so running all rounds matches);
    the serial-reference oracle lives in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.communities import label_propagation_communities

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"])
    _export_oracle_input("kg_communities", edges)
    _export_oracle_input("kg_communities_nodes", ray.data.from_arrow(nodes_t))
    comm = label_propagation_communities(
        edges, node_ids, n_iter=5, src_col="subj_id", dst_col="obj_id"
    )
    sizes = (
        comm.groupby("community", as_index=False)
        .size()
        .rename(columns={"size": "n_nodes"})
    )
    sizes["n_nodes"] = sizes["n_nodes"].astype("int64")
    return sizes.sort_values(
        ["n_nodes", "community"], ascending=[False, True], ignore_index=True
    ).head(20)


def kg_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the constructed KG (Newman 2002): do
    hubs link to hubs? One row — the fourth graph-quality scalar next
    to clustering/coreness/modularity. See
    :func:`kgraft.graph.metrics.degree_assortativity`. DuckDB twin
    recomputes the moment formula over exported edges — degree sums
    are integer-exact in float64, so the scalar matches bit-for-bit
    (_KG_ASSORT_SQL); serial-oracle pytest in tests/test_graph.py."""
    from .graph.metrics import degree_assortativity

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_assortativity", edges)
    return degree_assortativity(edges, src="subj_id", dst="obj_id")


def kg_modularity(sf_dir: str) -> pd.DataFrame:
    """Newman-Girvan modularity of the label-propagation communities
    over the constructed KG — the one-number answer to "did LPA find
    real structure?". See :func:`kgraft.graph.metrics.modularity`.
    DuckDB twin (_KG_MODULARITY_SQL): LPA replayed, then Q recomputed
    over the distinct undirected edges with the engine's per-term fp
    op order; serial-oracle pytest in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.communities import label_propagation_communities
    from .graph.metrics import modularity

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_modularity", edges)
    _export_oracle_input("kg_modularity_nodes", ray.data.from_arrow(nodes_t))
    comm = label_propagation_communities(
        edges, node_ids, n_iter=5, src_col="subj_id", dst_col="obj_id"
    )
    return modularity(edges, comm, src="subj_id", dst="obj_id")


def kg_betweenness(sf_dir: str) -> pd.DataFrame:
    """Approximate betweenness centrality over the constructed KG
    (Brandes-Pich sampled sources, 64 deterministic sources): top-20
    bridge entities — see
    :func:`kgraft.graph.betweenness.approx_betweenness`. DuckDB twin
    (_KG_BETWEENNESS_SQL): the splitmix64 bottom-64 source sample,
    level-synchronous BFS (exact-length frontier recursion -> min
    distance), integer-exact path counts, and the backward per-level
    dependency accumulation all replayed as chained recursive CTEs;
    the top-20 cut happens on the 4dp grid on BOTH sides (raw-float
    ordering would let cross-engine ulp drift flip structural ties).
    The exact-Brandes-equivalence pytests live in tests/test_graph.py."""
    from .graph.betweenness import approx_betweenness

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_betweenness", edges)
    out = approx_betweenness(
        edges, n_sources=64, src="subj_id", dst="obj_id", top_k=None
    )
    out["betweenness"] = sql_round(out["betweenness"], 4)
    return out.sort_values(
        ["betweenness", "node_id"], ascending=[False, True], ignore_index=True
    ).head(20)


def kg_pagerank_weighted(sf_dir: str) -> pd.DataFrame:
    """Confidence-weighted PageRank over the KG: transition mass
    proportional to the edge's extraction-confidence column, so
    low-confidence links leak less importance — top-20. See
    :func:`kgraft.graph.pagerank.pagerank_weighted`. DuckDB twin
    (_KG_PAGERANK_WEIGHTED_SQL): the weighted power iteration replayed
    as a recursive CTE (weights clamped to >= 0 exactly like the
    engine, per-edge term w * (r/wout), 6dp compare grid); the dense
    weighted-power-iteration oracle lives in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.pagerank import pagerank_weighted

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id", "conf"]).materialize()
    _export_oracle_input("kg_pagerank_weighted", edges)
    _export_oracle_input("kg_pagerank_weighted_nodes", ray.data.from_arrow(nodes_t))
    pr = pagerank_weighted(edges, node_ids, "conf", n_iter=15)
    pr["rank"] = sql_round(pr["rank"], 6)  # driver compare grid (see kg_pagerank)
    return pr.sort_values(
        ["rank", "node_id"], ascending=[False, True], ignore_index=True
    ).head(20)


def kg_smoothed_importance(sf_dir: str) -> pd.DataFrame:
    """GNN-style feature prep on the KG: PageRank scores smoothed by a
    1-hop undirected neighborhood mean (GraphSAGE pooling with self-
    loop) — "importance of the company you keep", top-20. DuckDB twin
    (_KG_SMOOTHED_SQL): the PageRank recursion plus the undirected
    multiplicity-counting neighborhood mean replayed over the exported
    edges, 6dp grid; the dense adjacency oracle lives in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.neighborhood import neighbor_aggregate
    from .graph.pagerank import pagerank

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = np.sort(nodes_t["entity_id"].to_numpy())
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"]).materialize()
    _export_oracle_input("kg_smoothed", edges)
    _export_oracle_input("kg_smoothed_nodes", ray.data.from_arrow(nodes_t))
    pr = pagerank(edges, node_ids, n_iter=15)
    ranks = (
        pr.sort_values("node_id")["rank"].to_numpy(dtype="float64").reshape(-1, 1)
    )
    smoothed = neighbor_aggregate(
        edges, node_ids, ranks, direction="both", include_self=True,
        src_col="subj_id", dst_col="obj_id",
    )
    out = pd.DataFrame(
        {
            "node_id": node_ids,
            "rank": sql_round(ranks[:, 0], 6),
            "smoothed_rank": sql_round(smoothed[:, 0], 6),
        }
    )
    return out.sort_values(
        ["smoothed_rank", "node_id"], ascending=[False, True], ignore_index=True
    ).head(20)


def kg_pred_stats(sf_dir: str) -> pd.DataFrame:
    """KG schema profile: per predicate — edge count, distinct
    subjects/objects, mean confidence — the relation-level health
    report (a predicate whose object cardinality collapses signals an
    extraction bug). Predicate vocabulary is bounded, so the grouped
    partials and two distinct-count exchanges are tiny. DuckDB twin
    recomputes the profile from the exported edge columns
    (_KG_PRED_STATS_SQL)."""
    from .relational import grouped_count_distinct, pre_aggregate

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(
        m, columns=["pred", "subj_id", "obj_id", "conf"]
    ).materialize()
    _export_oracle_input("kg_pred_stats", edges)
    base = pre_aggregate(
        edges, ["pred"], {"n_edges": (None, "count"), "mean_conf": ("conf", "mean")}
    )
    ns = grouped_count_distinct(edges, ["pred"], "subj_id", out_col="n_subjects")
    no = grouped_count_distinct(edges, ["pred"], "obj_id", out_col="n_objects")
    ns = ns.to_pandas() if not isinstance(ns, pd.DataFrame) else ns
    no = no.to_pandas() if not isinstance(no, pd.DataFrame) else no
    out = base.merge(ns, on="pred").merge(no, on="pred")
    out["n_edges"] = out["n_edges"].astype("int64")
    out["n_subjects"] = out["n_subjects"].astype("int64")
    out["n_objects"] = out["n_objects"].astype("int64")
    out["mean_conf"] = sql_round(out["mean_conf"], 6)
    return out.sort_values("pred", ignore_index=True)[
        ["pred", "n_edges", "n_subjects", "n_objects", "mean_conf"]
    ]


def kg_functional_violations(sf_dir: str) -> pd.DataFrame:
    """Functional-predicate constraint check: per predicate, how many
    subjects assert MORE than one distinct object — the KG-quality
    pass that catches both extraction bugs (a functional relation like
    "capital_of" fanning out) and genuinely multi-valued predicates
    (so downstream consumers know which is which). Per predicate:
    n_subjects, n_multi_subjects, violation_rate, max_fanout.

    Scale shape: edges collapse map-side to distinct (pred, subj, obj)
    and ONE bucketed exchange on (pred, subj) computes per-subject
    object fanout; the per-predicate fold is predicate-vocabulary
    scale. DuckDB twin recomputes fanouts from the exported edge
    columns (_KG_FUNCTIONAL_VIOLATIONS_SQL)."""
    from .relational import bucketed_groupby_apply, pre_aggregate

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, columns=["pred", "subj_id", "obj_id"])
    _export_oracle_input("kg_functional_violations", edges)

    def fanout_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["pred", "subj_id", "obj_id"])
        f = (
            d.groupby(["pred", "subj_id"], sort=False, as_index=False)["obj_id"]
            .count()
            .rename(columns={"obj_id": "fanout"})
        )
        return f

    fan = bucketed_groupby_apply(
        edges, ["pred", "subj_id"], fanout_bucket
    ).to_pandas()
    fan["is_multi"] = (fan["fanout"] > 1).astype("int64")
    out = (
        fan.groupby("pred", as_index=False)
        .agg(
            n_subjects=("subj_id", "count"),
            n_multi_subjects=("is_multi", "sum"),
            max_fanout=("fanout", "max"),
        )
        .astype(
            {
                "n_subjects": "int64",
                "n_multi_subjects": "int64",
                "max_fanout": "int64",
            }
        )
    )
    out["violation_rate"] = sql_round((
        out["n_multi_subjects"] / out["n_subjects"]
    ), 4)
    return out.sort_values("pred", ignore_index=True)


_WALKS_CACHE: dict = {}


def _kg_walks(sf_dir: str):
    """Walk corpus for this scale (2 walks x 8 steps from every
    entity), memoized per process so kg_random_walks / kg_walk_pairs
    share one generation — the corpus is an input both consume, like
    ``_kg_outputs`` itself."""
    import pyarrow.parquet as pq

    from .graph.walks import random_walks

    n = _pages_for(sf_dir)
    if n in _WALKS_CACHE:
        return _WALKS_CACHE[n]
    m = _kg_outputs(sf_dir)
    node_ids = pq.read_table(m["nodes_dir"], columns=["entity_id"])[
        "entity_id"
    ].to_numpy()
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"])
    walks = random_walks(
        edges, node_ids, walk_length=8, walks_per_node=2, seed=42
    ).materialize()
    _WALKS_CACHE[n] = walks
    return walks


def kg_random_walks(sf_dir: str) -> pd.DataFrame:
    """DeepWalk-style walk-corpus generation over the materialized KG
    (2 walks x 8 steps from every entity): per-position walk survival
    and node coverage — the graph-embedding training-data prep — see
    :func:`kgraft.graph.walks.random_walks`. Deterministic (seeded
    splitmix64 choice streams) — which makes it SQL-replayable: the
    DuckDB twin (_KG_RANDOM_WALKS_SQL) precomputes every (walk, pos)
    splitmix64 draw with exact uint64 arithmetic, then advances walks
    one step per recursion level over the ranked deduped undirected
    adjacency. The serial-oracle, bucket-invariance and
    tier-equivalence pytests live in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .relational import grouped_count_distinct, pre_aggregate_ds

    m = _kg_outputs(sf_dir)
    _export_oracle_input("kg_walks", _read_kg_edges(m, ["subj_id", "obj_id"]))
    _export_oracle_input(
        "kg_walks_nodes",
        ray.data.from_arrow(pq.read_table(m["nodes_dir"], columns=["entity_id"])),
    )
    walks = _kg_walks(sf_dir)
    n_walks = pre_aggregate_ds(
        walks.select_columns(["pos"]), ["pos"], {"n_walks": (None, "count")}
    ).to_pandas()
    cov = grouped_count_distinct(walks, ["pos"], "node", out_col="n_nodes")
    cov = cov.to_pandas() if not isinstance(cov, pd.DataFrame) else cov
    out = n_walks.merge(cov, on="pos")
    out["n_walks"] = out["n_walks"].astype("int64")
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return out.sort_values("pos", ignore_index=True)[
        ["pos", "n_walks", "n_nodes"]
    ]


def kg_triple_pr(sf_dir: str) -> pd.DataFrame:
    """THE north-star correctness metric as a driver query: precision /
    recall of the engine's extracted triples against the corpus's
    golden triple set, on the normalized (url, seg_idx, subj, pred,
    obj) key — the BASELINE.json bar is P/R >= 0.95 (pytest enforces
    it; this surfaces the number in the driver artifacts every round).
    Realization: both sides collapse to distinct 64-bit triple-key
    hash pairs map-side (raw surfaces never shuffle), the intersection
    is one bucketed inner join on the key — the dedup_against shape."""
    from .hashing import hash_strings
    from .relational import hash_join, pre_aggregate_ds
    from .synth import corpus_dir

    m = _kg_outputs(sf_dir)
    golden_path = os.path.join(corpus_dir(_pages_for(sf_dir)), "golden_triples.parquet")

    def norm_col(s: pd.Series) -> pd.Series:
        # vectorized norm_surface (lower + whitespace collapse): both
        # sides key through THIS function, so the normalization only
        # has to be self-consistent — a per-row .map(norm_surface) here
        # was the query's hot cost (~2.6 s/side at sf0.1)
        return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()

    def keyed(df: pd.DataFrame, col: str) -> pd.DataFrame:
        k = (
            df["url"].astype(str)
            + "\x1f"
            + df["seg_idx"].astype(str)
            + "\x1f"
            + norm_col(df["subj"])
            + "\x1f"
            + df["pred"].astype(str)
            + "\x1f"
            + norm_col(df["obj"])
        )
        klist = k.tolist()  # one materialization feeds both seeds
        h1 = hash_strings(klist, seed=5)
        h2 = hash_strings(klist, seed=9)  # 128-bit: collision-safe key
        return pd.DataFrame(
            {
                "k1": h1.astype(np.int64),
                "k2": h2.astype(np.int64),
                col: np.ones(len(df), dtype=np.int64),
            }
        )

    # pinned: each side has two consumers (count + join probe) and a lazy
    # Dataset would re-run the hash+aggregate DAG for each — distinct
    # triple-key scale, the same residency trade the graph passes make
    mine = pre_aggregate_ds(
        ray.data.read_parquet(
            m["triples_paths"], columns=["url", "seg_idx", "subj", "pred", "obj"]
        ).map_batches(lambda df: keyed(df, "m"), batch_format="pandas"),
        ["k1", "k2"],
        {"m": (None, "count")},
    ).materialize()
    gold = pre_aggregate_ds(
        ray.data.read_parquet(golden_path).map_batches(
            lambda df: keyed(df, "g"), batch_format="pandas"
        ),
        ["k1", "k2"],
        {"g": (None, "count")},
    ).materialize()
    n_mine = int(mine.count())
    n_gold = int(gold.count())
    inter = int(
        hash_join(mine, gold, on=["k1", "k2"], num_buckets=16).count()
    )
    return pd.DataFrame(
        {
            "n_extracted": [np.int64(n_mine)],
            "n_golden": [np.int64(n_gold)],
            "n_matched": [np.int64(inter)],
            "precision": [sql_round(inter / max(n_mine, 1), 4)],
            "recall": [sql_round(inter / max(n_gold, 1), 4)],
        }
    )


def kg_incremental_merge(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingestion demo on a fixed 400-page corpus: the KG
    merged from two half-corpus snapshots
    (:func:`kgraft.pipeline.merge_kg_snapshots` — extraction reused
    from checkpoints, link/canonicalize/components re-derived over the
    union) vs the single full-corpus run. ``identical`` asserts the
    node and edge TABLES match row-for-row — the bit-identity the
    pytest enforces, surfaced in the driver artifacts. Corpus size is
    fixed (not sf-scaled): the demo proves a semantics, not a
    throughput."""
    import glob as _glob

    import pyarrow.parquet as pq

    from .pipeline import PipelineConfig, merge_kg_snapshots, run_kg_pipeline
    from .synth import SYNTH_VERSION, corpus_dir, sharded_pages

    d = corpus_dir(400)
    files = sorted(_glob.glob(os.path.join(sharded_pages(d), "*.parquet")))
    alias = os.path.join(d, "alias_dict.parquet")
    cfg = PipelineConfig()
    root = f"/tmp/kgraft_out/incr_v{SYNTH_VERSION}_n400"
    full = run_kg_pipeline(files, alias, os.path.join(root, "full"), cfg)
    half = len(files) // 2
    run_kg_pipeline(files[:half], alias, os.path.join(root, "a"), cfg)
    run_kg_pipeline(files[half:], alias, os.path.join(root, "b"), cfg)
    import shutil

    # the merge target is not a resumable checkpoint dir — a stale one
    # would accumulate parquet fragments across invocations
    shutil.rmtree(os.path.join(root, "merged"), ignore_errors=True)
    merged = merge_kg_snapshots(
        [os.path.join(root, "a"), os.path.join(root, "b")],
        alias,
        os.path.join(root, "merged"),
        cfg,
    )

    def tbl(o, what):
        t = pq.read_table(os.path.join(root, o, what)).to_pandas()
        for c in t.columns:
            if t[c].dtype == object:
                t[c] = t[c].map(
                    lambda x: tuple(x)
                    if hasattr(x, "__iter__") and not isinstance(x, str)
                    else x
                )
        return t.sort_values(list(t.columns), ignore_index=True)

    identical = all(
        tbl("full", w).equals(tbl("merged", w)) for w in ("nodes", "edges")
    )
    return pd.DataFrame(
        {
            "full_nodes": [np.int64(full["n_nodes"])],
            "merged_nodes": [np.int64(merged["n_nodes"])],
            "full_edges": [np.int64(full["n_edges"])],
            "merged_edges": [np.int64(merged["n_edges"])],
            "identical": [bool(identical)],
        }
    )


def kg_walk_pairs(sf_dir: str) -> pd.DataFrame:
    """Skip-gram training pairs from the KG walk corpus (window 2 over
    the :func:`kg_random_walks` corpus): top-20 co-occurring entity
    pairs — the examples a DeepWalk/node2vec embedder trains on. See
    :func:`kgraft.graph.walks.walk_skipgram_pairs`. DuckDB twin
    (_KG_WALK_PAIRS_SQL): the walk recursion of the kg_random_walks
    twin plus a distance-1/2 self-join window sweep — integer-exact;
    the brute-force window-scan oracle lives in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.walks import walk_skipgram_pairs

    m = _kg_outputs(sf_dir)
    _export_oracle_input("kg_walk_pairs", _read_kg_edges(m, ["subj_id", "obj_id"]))
    _export_oracle_input(
        "kg_walk_pairs_nodes",
        ray.data.from_arrow(pq.read_table(m["nodes_dir"], columns=["entity_id"])),
    )
    out = walk_skipgram_pairs(_kg_walks(sf_dir), window=2).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(
        ["n", "u", "v"], ascending=[False, True, True], ignore_index=True
    ).head(20)


def kg_scc(sf_dir: str) -> pd.DataFrame:
    """Directed-cycle structure of the KG: SCC size histogram
    (scc_size, n_sccs). Non-trivial SCCs flag extraction
    contradictions (mutual ``acquired``, ``subsidiary_of`` cycles) that
    the undirected components pass cannot see — see
    :func:`kgraft.graph.scc.strongly_connected_components`. DuckDB
    twin (_KG_SCC_SQL): directed transitive closure via UNION
    recursion over the exported edges, mutual-pair grouping, size
    histogram — integer-exact; the Tarjan oracle lives in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.scc import strongly_connected_components

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"]).materialize()
    _export_oracle_input("kg_scc", edges)
    _export_oracle_input("kg_scc_nodes", ray.data.from_arrow(nodes_t))
    lab = strongly_connected_components(edges, node_ids)
    sizes = lab.groupby("scc_id").size().rename("scc_size").reset_index()
    out = (
        sizes.groupby("scc_size").size().rename("n_sccs").reset_index()
    )
    out["scc_size"] = out["scc_size"].astype("int64")
    out["n_sccs"] = out["n_sccs"].astype("int64")
    return out.sort_values("scc_size", ignore_index=True)


def kg_node_embeddings(sf_dir: str) -> pd.DataFrame:
    """End-to-end graph representation learning on the engine: SGNS
    node embeddings trained over the walk-corpus skip-gram pairs
    (walks -> pairs -> distributed full-batch AdaGrad — see
    :func:`kgraft.graph.embed_train.train_node_embeddings`), evaluated
    by score separation: weighted mean sigmoid(w_u . c_v) on observed
    pairs vs on deterministic random entity pairs. One summary row.
    Rows-only; the planted-communities pytest lives in
    tests/test_graph.py."""
    from .graph.embed_train import _sigmoid, train_node_embeddings
    from .graph.walks import walk_skipgram_pairs
    from .hashing import splitmix64 as _sm

    pairs = walk_skipgram_pairs(_kg_walks(sf_dir), window=2).materialize()
    ids = np.unique(
        np.concatenate(
            [
                pairs.select_columns(["u"]).to_pandas()["u"].to_numpy(np.int64),
                pairs.select_columns(["v"]).to_pandas()["v"].to_numpy(np.int64),
            ]
        )
    )
    model = train_node_embeddings(
        pairs, ids, dim=16, n_iter=25, lr=0.2, negatives=5, seed=7
    )
    W, C = model["W"], model["C"]
    mids = model["ids"]

    def fold_scores(df: pd.DataFrame) -> pd.DataFrame:
        iu = np.searchsorted(mids, df["u"].to_numpy(np.int64))
        iv = np.searchsorted(mids, df["v"].to_numpy(np.int64))
        wt = df["n"].to_numpy(np.float64)
        sc = _sigmoid(np.einsum("ij,ij->i", W[iu], C[iv]))
        return pd.DataFrame({"s": [float((wt * sc).sum())], "w": [float(wt.sum())]})

    part = pairs.map_batches(fold_scores, batch_format="pandas").to_pandas()
    pos_score = part["s"].sum() / part["w"].sum()
    n = len(mids)
    ru = (_sm(np.arange(4096, dtype=np.uint64)) % np.uint64(n)).astype(np.int64)
    rv = (
        _sm(np.arange(4096, dtype=np.uint64) + np.uint64(13)) % np.uint64(n)
    ).astype(np.int64)
    rand_score = float(
        _sigmoid(np.einsum("ij,ij->i", W[ru], C[rv])).mean()
    )
    return pd.DataFrame(
        {
            "n_nodes": [np.int64(n)],
            "final_loss": [sql_round(model["losses"][-1], 3)],
            "pos_score": [sql_round(float(pos_score), 3)],
            "rand_score": [sql_round(rand_score, 3)],
        }
    )


def kg_hits(sf_dir: str) -> pd.DataFrame:
    """Top-20 entities by HITS authority over the materialized KG (hub
    score alongside) — separates well-referenced canonical entities from
    aggregator hubs, a signal PageRank conflates. See
    :func:`kgraft.graph.hits.hits`. DuckDB twin (_KG_HITS_SQL): the
    30 half-steps (authority / hub alternating, L2-normalized each)
    replayed one per recursion level, 8dp grid; the dense
    power-iteration oracle lives in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.hits import hits

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    # pinned: HITS re-scans edges 2×n_iter times
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"]).materialize()
    _export_oracle_input("kg_hits", edges)
    _export_oracle_input("kg_hits_nodes", ray.data.from_arrow(nodes_t))
    out = hits(edges, node_ids, n_iter=15, src_col="subj_id", dst_col="obj_id")
    out["authority"] = sql_round(out["authority"], 8)
    out["hub"] = sql_round(out["hub"], 8)
    return out.sort_values(
        ["authority", "node"], ascending=[False, True], ignore_index=True
    ).head(20)


def kg_link_prediction(sf_dir: str) -> pd.DataFrame:
    """Top-20 UNLINKED entity pairs by Adamic-Adar score over the
    materialized KG — "entities that should probably be linked", the
    graph-completion candidate feed. See
    :func:`kgraft.graph.linkpred.adamic_adar_topk` for the wedge-pass
    algorithm and the loud hub cap. DuckDB twin (_KG_LINKPRED_SQL)
    recomputes wedges/weights/anti-join from the exported edges; the
    top-20 cut happens on the 6dp score grid (raw-float ordering would
    let cross-engine ulp drift flip boundary ties) — the engine
    fetches a deep candidate list and re-cuts on the rounded score
    with the (score desc, a, b) tie-break. The serial brute-force
    oracle lives in tests/test_graph.py."""
    from .graph.linkpred import adamic_adar_topk

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, columns=["subj_id", "obj_id"])
    _export_oracle_input("kg_link_prediction", edges)
    out = adamic_adar_topk(edges, src="subj_id", dst="obj_id", k=256)
    out["adamic_adar"] = sql_round(out["adamic_adar"], 6)
    return out.sort_values(
        ["adamic_adar", "node_a", "node_b"],
        ascending=[False, True, True],
        ignore_index=True,
    ).head(20)


def kg_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the engine's own materialized KG edges (graph
    analytics on the construction output): top-20 entities by rank.
    Node vector is vocab-scale (broadcast); edges stream through
    shuffle-free bincount passes. DuckDB twin (_KG_PAGERANK_SQL)
    replays the 15 power iterations as a recursive CTE over the
    exported edge/node tables — same op order per step, ranks
    compared at 6dp; the serial power-iteration oracle lives in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.pagerank import pagerank

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    _export_oracle_input("kg_pagerank", _read_kg_edges(m, ["subj_id", "obj_id"]))
    _export_oracle_input("kg_pagerank_nodes", ray.data.from_arrow(nodes_t))
    # edge table fits memory here -> Pregel path (shards pinned in
    # actors, one remote round per superstep instead of a full Dataset
    # job + parquet re-read); the streaming pass remains the path for
    # corpus-scale edge tables
    import glob as _glob

    from .graph.pagerank import pagerank_pregel

    # recursive glob: the edge table = checkpoint fragments + recovery
    # delta; the old top-level-only glob fed pregel JUST the 133-row
    # delta file (wrong ranks — caught by the r5 SQL twin, invisible
    # to the previous rows-only check)
    files = sorted(
        _glob.glob(os.path.join(m["edges_dir"], "**", "*.parquet"), recursive=True)
    )
    total_bytes = sum(os.path.getsize(f) for f in files)
    if files and total_bytes < 4 * (1 << 30):
        pr = pagerank_pregel(files, node_ids, n_iter=15)
    else:
        edges = _read_kg_edges(m, ["subj_id", "obj_id"])
        pr = pagerank(edges, node_ids, n_iter=15)
    # 6dp: ranks are compared/sorted on the SAME grid the driver's
    # value-hash uses, so the cross-engine +-ulp drift of per-iteration
    # sum order (bincount vs DuckDB aggregation) cannot flip the top-20
    # selection except within ~1e-8 of a grid boundary
    pr["rank"] = sql_round(pr["rank"], 6)
    top = pr.sort_values(["rank", "node_id"], ascending=[False, True]).head(20)
    return top.reset_index(drop=True)


def kg_degree_stats(sf_dir: str) -> pd.DataFrame:
    """Degree distribution of the constructed KG: per out-degree bucket
    (log2), how many entities — the graph-quality monitoring pass run
    after every build (hub explosion / disconnection shows up here
    first). One partial-combined aggregate over the edge table, then a
    tiny histogram. DuckDB twin recomputes degrees + log2 buckets from
    the exported subj_id column (_KG_DEGREE_STATS_SQL)."""
    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, ["subj_id"])
    _export_oracle_input("kg_degree_stats", edges)
    per_node = pre_aggregate_ds(edges, "subj_id", {"deg": (None, "count")})

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = np.floor(np.log2(df["deg"].to_numpy(dtype="float64"))).astype("int64")
        return pd.DataFrame({"log2_degree": b})

    out = pre_aggregate(
        per_node.map_batches(bucketize, batch_format="pandas"),
        "log2_degree",
        {"n_entities": (None, "count")},
    )
    out["log2_degree"] = out["log2_degree"].astype("int64")
    out["n_entities"] = out["n_entities"].astype("int64")
    return out.sort_values("log2_degree").reset_index(drop=True)


def kg_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count + global clustering coefficient of the constructed
    KG — the second graph-quality signal next to ``kg_degree_stats``
    (hub-explosion artifacts show up as clustering collapse). See
    :func:`kgraft.graph.triangles.count_triangles` for the
    degree-ordered distributed algorithm. DuckDB twin: three-way
    self-join over the exported distinct undirected edges
    (_KG_TRIANGLES_SQL)."""
    from .graph.triangles import count_triangles

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_triangles", edges)
    return count_triangles(edges, src="subj_id", dst="obj_id")


def kg_kcore(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition of the constructed KG: how many entities at
    each coreness level — the third graph-quality signal (a hub
    explosion inflates degrees but not coreness; density collapse shows
    up as the high-core tail vanishing). BSP peeling with the
    vocab-scale alive vector broadcast per round; edges stream through
    bincount passes (kgraft/graph/kcore.py). DuckDB twin
    (_KG_KCORE_SQL): the peel replayed one round per recursion level
    over the exported raw edges (simplification re-done in SQL) —
    integer state, exact."""
    import pyarrow.parquet as pq

    from .graph.kcore import core_numbers

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_kcore", edges)
    _export_oracle_input("kg_kcore_nodes", ray.data.from_arrow(nodes_t))
    cn = core_numbers(edges, node_ids)
    out = (
        cn.groupby("coreness", as_index=False)
        .agg(n_entities=("node_id", "size"))
        .sort_values("coreness")
        .reset_index(drop=True)
    )
    out["coreness"] = out["coreness"].astype("int64")
    out["n_entities"] = out["n_entities"].astype("int64")
    return out


def kg_truss(sf_dir: str) -> pd.DataFrame:
    """4-truss of the constructed KG: the maximal subgraph where every
    edge closes >= 2 triangles — a strictly stronger cohesion filter
    than coreness (hub-and-spoke regions dissolve). BSP support
    peeling: each round recounts per-edge triangle support over the
    survivor Dataset via the oriented-wedge join and drops edges below
    k-2; edge state never lands on the driver
    (kgraft/graph/truss.py). DuckDB twin (_KG_TRUSS_SQL): the peel
    replayed one round per recursion level with a done-flag carrying
    the engine's fixpoint/empty stop rule — integer-exact incl. the
    rounds counter; brute-force equivalence lives in
    tests/test_graph.py."""
    from .graph.truss import k_truss

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_truss", edges)
    _, info = k_truss(edges, 4, src="subj_id", dst="obj_id")
    return pd.DataFrame(
        {
            "k": [np.int64(4)],
            "n_edges_in": [np.int64(info["n_edges_in"])],
            "n_edges_truss": [np.int64(info["n_edges_truss"])],
            "rounds": [np.int64(info["rounds"])],
        }
    )


def kg_densest(sf_dir: str) -> pd.DataFrame:
    """Densest subgraph of the constructed KG (Bahmani et al.'s
    (2+2eps) greedy peel, eps=0.05): the topical core of the entity
    co-mention graph — density, size and peel rounds. Per-node alive
    state broadcast per round; edges stay pinned in the k-core shard
    pool (kgraft/graph/densest.py). DuckDB twin (_KG_DENSEST_SQL):
    the greedy peel replayed one round per recursion level — the
    drop threshold 2*(1+eps)*(m/n) is an exact-operand fp product on
    both sides, so the peel sequence is bit-identical; best level =
    highest density, earliest round. The published approximation
    guarantee and a planted-clique recovery test live in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.densest import densest_subgraph

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_densest", edges)
    _export_oracle_input("kg_densest_nodes", ray.data.from_arrow(nodes_t))
    _, info = densest_subgraph(edges, node_ids)
    return pd.DataFrame(
        {
            "density": [sql_round(float(info["density"]), 6)],
            "n_nodes": [np.int64(info["n_nodes"])],
            "n_edges": [np.int64(info["n_edges"])],
            "rounds": [np.int64(info["rounds"])],
        }
    )


def kg_diameter(sf_dir: str) -> pd.DataFrame:
    """Neighborhood function + effective diameter of the constructed KG
    via HyperBall (per-node HLL counters unioned along edges each BSP
    round; kgraft/graph/anf.py): one row per radius t with the
    estimated reachable-pair count N(t), plus the interpolated
    90%-effective diameter on every row. The counters are DETERMINISTIC
    (splitmix64-seeded registers, max-merge), so even this is
    SQL-replayable: the DuckDB twin (_KG_DIAMETER_SQL) seeds the exact
    p=8 registers (bin()-derived rho), max-propagates them one round
    per recursion level until the register mass stops growing, and
    recomputes the HLL estimates + interpolation; N(t) compares on a
    1dp grid so the tiny cross-engine summation-order drift of the
    2^-rho sums cannot flip it. The estimator is also validated
    against the exact-bitset twin and per-node BFS in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.anf import effective_diameter, neighborhood_function

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_diameter", edges)
    _export_oracle_input("kg_diameter_nodes", ray.data.from_arrow(nodes_t))
    nf, _ = neighborhood_function(edges, node_ids)
    ed = effective_diameter(nf)
    return pd.DataFrame(
        {
            "t": np.arange(len(nf), dtype=np.int64),
            "n_reachable_pairs": sql_round(np.asarray(nf), 1),
            "effective_diameter": np.full(len(nf), ed),
        }
    )


def kg_mis(sf_dir: str) -> pd.DataFrame:
    """Maximal independent set of the constructed KG via Luby's
    algorithm (deterministic splitmix64 priorities, BSP rounds with the
    vocab-scale alive vector broadcast and one shuffle-free scatter-max
    edge pass per round; kgraft/graph/mis.py) — a spread-out,
    pairwise-non-adjacent entity seed set. One summary row: MIS size,
    graph size. The deterministic priorities make it SQL-replayable
    after all: the DuckDB twin (_KG_MIS_SQL) precomputes every
    (node, round) splitmix64 draw and runs each Luby round as two
    recursion half-steps (win election, then winner+neighbor removal)
    — integer-exact. Independence/maximality/determinism proofs live
    in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.mis import maximal_independent_set

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_mis", edges)
    _export_oracle_input("kg_mis_nodes", ray.data.from_arrow(nodes_t))
    out = maximal_independent_set(edges, node_ids)
    return pd.DataFrame(
        {
            "n_nodes": [np.int64(len(out))],
            "mis_size": [np.int64(int(out["in_mis"].sum()))],
        }
    )


def kg_local_clustering(sf_dir: str) -> pd.DataFrame:
    """Per-entity local clustering coefficient distribution over the
    constructed KG: per-node triangle counts fall out of the edge-
    support pass (each triangle feeds exactly two incident edges), one
    explode+count exchange and a bucketed degree join finish it
    (kgraft/graph/truss.py local_clustering). Output: coefficient
    histogram (10 fixed bins over deg>=2 nodes) — stable across
    partitionings. DuckDB twin: per-node triangle counts from the
    three-way self-join over exported edges (_KG_LCC_SQL); brute-force
    equivalence in tests/test_graph.py."""
    from .graph.kcore import simple_pairs
    from .graph.truss import local_clustering

    m = _kg_outputs(sf_dir)
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_local_clustering", edges)
    pairs = simple_pairs(edges).map_batches(
        lambda df: pd.DataFrame(
            {"lo": df["lo"].astype("int64"), "hi": df["hi"].astype("int64")}
        ),
        batch_format="pandas",
    )
    lcc = local_clustering(pairs)

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["deg"] >= 2]
        b = np.clip((df["lcc"].to_numpy() * 10).astype(np.int64), 0, 9)
        return pd.DataFrame({"bin": b, "n": np.ones(len(b), dtype=np.int64)})

    out = pre_aggregate(
        lcc.map_batches(binify, batch_format="pandas"), ["bin"], {"n_nodes": ("n", "sum")}
    )
    out["bin_lo"] = sql_round((out["bin"] / 10.0), 1)
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return (
        out[["bin", "bin_lo", "n_nodes"]]
        .sort_values("bin", ignore_index=True)
        .astype({"bin": "int64"})
    )


def kg_centralities(sf_dir: str) -> pd.DataFrame:
    """Top-10 KG entities by HARMONIC centrality (with closeness
    alongside) via HyperBall's per-round ball increments
    (kgraft/graph/anf.py geometric_centralities) — the geometric
    centralities that, unlike degree or PageRank, reward being CLOSE to
    everything rather than being pointed at. Deterministic (splitmix64
    registers) — and therefore SQL-replayable: the DuckDB twin
    (_KG_CENTRALITIES_SQL) runs the same register recursion as the
    kg_diameter twin, derives per-(node, round) ball estimates, and
    folds the clamped increments through a running-max window exactly
    as the engine's sequential loop; harmonic/closeness compare (and
    the top-10 cut happens) on the 6dp grid. The exact-bitset twin is
    BFS-verified in tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.anf import geometric_centralities

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_centralities", edges)
    _export_oracle_input("kg_centralities_nodes", ray.data.from_arrow(nodes_t))
    out = geometric_centralities(edges, node_ids)
    return (
        out.sort_values(
            ["harmonic", "node_id"], ascending=[False, True], ignore_index=True
        )
        .head(10)
        .astype({"node_id": "int64"})
    )


def sketch_union_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Mergeable-summaries incremental analytics: the event stream is
    split into two time snapshots, each reduced to a PERSISTED HLL
    sketch table (:func:`kgraft.relational.hll_sketch_table` — at most
    2^p register rows per key, written as Parquet), then the UNION of
    the two sketch files answers distinct-users-per-type over the whole
    stream WITHOUT rescanning raw events — register-identical to
    sketching everything directly (merge = max). Output carries both
    numbers; `merged_equals_direct` must be true on every row. DuckDB
    twin recomputes the estimate from the raw events view
    (_SKETCH_UNION_USERS_SQL) — a broken merge path would drift from
    it and fail the hash compare; the register-exact merge invariant
    and the error bound live in tests/test_relational.py."""
    from .relational import (
        grouped_approx_count_distinct,
        hll_estimate_sketches,
        hll_sketch_table,
    )

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id", "ts"])
    cut = pd.Timestamp("2024-01-15")
    early = ev.map_batches(
        lambda df: df[df["ts"] < cut][["event_type", "user_id"]],
        batch_format="pandas",
    )
    late = ev.map_batches(
        lambda df: df[df["ts"] >= cut][["event_type", "user_id"]],
        batch_format="pandas",
    )
    base = _scratch_layout(sf_dir, "sketches")
    for name, part in (("early", early), ("late", late)):
        hll_sketch_table(part, "event_type", "user_id").write_parquet(
            f"{base}/{name}", mode="overwrite"
        )
    stored = ray.data.read_parquet(f"{base}/early").union(
        ray.data.read_parquet(f"{base}/late")
    )
    merged = (
        hll_estimate_sketches(stored, "event_type", out_col="approx_users")
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    direct = (
        grouped_approx_count_distinct(
            ev.select_columns(["event_type", "user_id"]),
            "event_type",
            "user_id",
            out_col="direct_users",
        )
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    out = merged.merge(direct, on="event_type")
    out["merged_equals_direct"] = out["approx_users"] == out["direct_users"]
    out["approx_users"] = out["approx_users"].astype("int64")
    out["direct_users"] = out["direct_users"].astype("int64")
    return out


def sketch_union_p90_value(sf_dir: str) -> pd.DataFrame:
    """Quantile sibling of `sketch_union_users_by_type`: two time
    snapshots of the event stream reduce to persisted DDSketch
    log-histograms (:func:`kgraft.relational.dd_sketch_table`, Parquet
    on disk), and the UNION of the two sketch files answers
    p90(value)-per-type over the whole stream without rescanning —
    bucket-identical to sketching everything directly (bucket merge is
    sum). `merged_equals_direct` must be true on every row. DuckDB
    twin recomputes the DDSketch p90 from the raw events view
    (_SKETCH_UNION_P90_SQL); merge exactness + the error bound live in
    tests/test_relational.py."""
    from .relational import (
        dd_quantile_sketches,
        dd_sketch_table,
        grouped_approx_quantile,
    )

    ev = read_table(sf_dir, "events", columns=["event_type", "value", "ts"])
    cut = pd.Timestamp("2024-01-15")
    base = _scratch_layout(sf_dir, "ddsketches")
    for name, pred in (("early", "<"), ("late", ">=")):
        part = ev.map_batches(
            (lambda df: df[df["ts"] < cut][["event_type", "value"]])
            if pred == "<"
            else (lambda df: df[df["ts"] >= cut][["event_type", "value"]]),
            batch_format="pandas",
        )
        dd_sketch_table(part, "event_type", "value").write_parquet(
            f"{base}/{name}", mode="overwrite"
        )
    stored = ray.data.read_parquet(f"{base}/early").union(
        ray.data.read_parquet(f"{base}/late")
    )
    merged = (
        dd_quantile_sketches(stored, "event_type", 0.9, out_col="p90_merged")
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    direct = (
        grouped_approx_quantile(
            ev.select_columns(["event_type", "value"]),
            "event_type", "value", 0.9, out_col="p90_direct",
        )
        .to_pandas()
        .sort_values("event_type", ignore_index=True)
    )
    out = merged.merge(direct, on="event_type")
    out["merged_equals_direct"] = out["p90_merged"] == out["p90_direct"]
    out["p90_merged"] = sql_round(out["p90_merged"], 4)
    out["p90_direct"] = sql_round(out["p90_direct"], 4)
    return out


def sketch_union_token_counts(sf_dir: str) -> pd.DataFrame:
    """Frequency member of the mergeable-summaries trio: the documents
    corpus splits into two snapshots by doc-id parity, each reduces to
    a persisted Count-Min grid (:func:`kgraft.textops.cms_sketch_table`,
    Parquet on disk), and the UNION of the two stored rows answers
    token-frequency queries over the whole corpus — grid-identical to
    sketching everything directly (grid merge is elementwise sum).
    `merged_equals_direct` must be true on every row. DuckDB twin
    recomputes the estimates from the raw documents view
    (_SKETCH_UNION_TOKENS_SQL); the CMS bound is pytest-pinned on
    `cms_token_estimates`."""
    from .textops import cms_estimate_from_sketches, cms_sketch_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    base = _scratch_layout(sf_dir, "cms")
    for name, par in (("even", 0), ("odd", 1)):
        part = docs.map_batches(
            lambda df, par=par: df[df["doc_id"] % 2 == par][["text"]],
            batch_format="pandas",
        )
        sk = cms_sketch_table(part)
        pd.DataFrame(sk).to_parquet(f"{base}_{name}.parquet")
    stored = pd.concat(
        [pd.read_parquet(f"{base}_even.parquet"),
         pd.read_parquet(f"{base}_odd.parquet")],
        ignore_index=True,
    )
    terms = ["the", "data", "model", "graph", "language"]
    merged = cms_estimate_from_sketches(stored, terms).rename(
        columns={"est_count": "merged_est"}
    )
    direct = cms_estimate_from_sketches(
        cms_sketch_table(docs.select_columns(["text"])), terms
    ).rename(columns={"est_count": "direct_est"})
    out = merged.merge(direct[["token", "direct_est"]], on="token")
    out["merged_equals_direct"] = out["merged_est"] == out["direct_est"]
    return out[["token", "merged_est", "direct_est", "n_total",
                "merged_equals_direct"]]


def gini_order_value(sf_dir: str) -> pd.DataFrame:
    """Gini inequality coefficient of order value per priority class —
    the revenue-concentration audit (how top-heavy is spend within each
    class). Scale shape (r3 VERDICT task 2): a DISTRIBUTED
    ``ds.sort([group, value])`` — range-partitioned on the
    high-cardinality (group, value) pair, so no reducer ever holds more
    than a block regardless of group cardinality — then one pass of
    per-batch algebraic partials. Within a sorted batch the group-local
    contribution is ``sum((2i - n - 1) x_(i))`` with global rank
    ``i = off + j``; expanding gives ``2*sum(j x) + (2 off - n - 1) *
    sum(x)`` per batch, so each batch emits only ``(group, m, A=sum x,
    B=sum j x, lo, hi)``. The driver orders these metadata-scale
    partials (blocks x groups rows) by (group, lo, hi) to recover block
    order and closes the formula with cumulative offsets. Equal
    boundary values across batches can only permute tied ranks, which
    cannot change the sum (tied x share the coefficient block), so the
    result is deterministic. DuckDB twin is the row_number window
    formula."""
    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def batch_partials(df: pd.DataFrame) -> pd.DataFrame:
        # batch arrives globally sorted by (group, value): groups are
        # contiguous and values ascend within each group slice
        grp = df.groupby("o_orderpriority", sort=False)
        j = grp.cumcount().to_numpy(np.float64) + 1.0
        x = df["o_totalprice"].to_numpy(np.float64)
        tmp = pd.DataFrame(
            {"o_orderpriority": df["o_orderpriority"], "x": x, "jx": j * x}
        )
        return tmp.groupby("o_orderpriority", sort=False, as_index=False).agg(
            m=("x", "size"),
            A=("x", "sum"),
            B=("jx", "sum"),
            lo=("x", "min"),
            hi=("x", "max"),
        )

    parts = (
        orders.sort(["o_orderpriority", "o_totalprice"])
        .map_batches(batch_partials, batch_format="pandas")
        .to_pandas()  # blocks x groups rows: metadata-scale, not corpus-scale
    )
    parts = parts.sort_values(
        ["o_orderpriority", "lo", "hi"], kind="mergesort", ignore_index=True
    )
    g = parts.groupby("o_orderpriority", sort=False)
    off = (g["m"].cumsum() - parts["m"]).to_numpy(np.float64)
    n = g["m"].transform("sum").to_numpy(np.float64)
    tot = g["A"].transform("sum").to_numpy(np.float64)
    contrib = (
        2.0 * parts["B"].to_numpy(np.float64)
        + (2.0 * off - n - 1.0) * parts["A"].to_numpy(np.float64)
    ) / (n * tot)
    out = (
        parts.assign(c=contrib)
        .groupby("o_orderpriority", as_index=False)
        .agg(gini=("c", "sum"), n_orders=("m", "sum"))
    )
    out["gini"] = sql_round(out["gini"], 6)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority", ignore_index=True)


_GINI_SQL = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS x,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS i,
         count(*) OVER (PARTITION BY o_orderpriority) AS n,
         sum(o_totalprice) OVER (PARTITION BY o_orderpriority) AS tot
  FROM orders
)
SELECT o_orderpriority,
       round(sum((2.0 * i - n - 1.0) * x / (n * tot)), 6) AS gini,
       CAST(count(*) AS BIGINT) AS n_orders
FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def median_order_value_by_priority(sf_dir: str) -> pd.DataFrame:
    """Exact (lower-median) order value per priority class via GLOBAL
    per-partition ranks — the distributed order statistic the r3
    verdict flagged as missing (#3): :func:`kgraft.relational.ranked`
    computes row_number over the 5-value partition key with NO per-key
    co-location (one distributed sort on the high-cardinality
    (priority, price, orderkey) tuple + metadata-scale offset
    partials), so the same plan holds when a single group is the whole
    corpus. Median = the row at rank (n+1)//2 in (price, orderkey)
    order."""
    from .relational import ranked

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    r = ranked(orders, ["o_orderpriority"], ["o_totalprice"], "o_orderkey")
    n = pre_aggregate(orders, ["o_orderpriority"], {"n_orders": (None, "count")})
    meta = {
        p: ((int(c) + 1) // 2, int(c))
        for p, c in zip(n["o_orderpriority"], n["n_orders"])
    }
    mref = ray.put(meta)  # 5 entries — group-cardinality, not corpus

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mref)
        tgt = df["o_orderpriority"].map(lambda p: m[p][0])
        keep = df[df["row_number"] == tgt]
        return pd.DataFrame(
            {
                "o_orderpriority": keep["o_orderpriority"],
                "median_price": keep["o_totalprice"],
                "n_orders": keep["o_orderpriority"]
                .map(lambda p: m[p][1])
                .astype("int64"),
            }
        )

    out = r.map_batches(pick, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderpriority", ignore_index=True)


_MEDIAN_RANKED_SQL = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, o_totalprice AS median_price,
       CAST(n AS BIGINT) AS n_orders
FROM r WHERE rn = (n + 1) // 2 ORDER BY o_orderpriority
"""


def rank_top_orders_by_priority(sf_dir: str) -> pd.DataFrame:
    """Top-3 orders per priority WITH their global descending ranks —
    exercises :func:`kgraft.relational.ranked` end-to-end (descending
    order keys, unique-id tiebreak, rank values surfaced in the
    output so a single off-by-one offset fails the hash compare)."""
    from .relational import ranked

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    r = ranked(
        orders, ["o_orderpriority"], ["o_totalprice"], "o_orderkey", descending=True
    )
    out = r.filter(expr="row_number <= 3").to_pandas()
    out["row_number"] = out["row_number"].astype("int64")
    return out.sort_values(
        ["o_orderpriority", "row_number"], ignore_index=True
    )[["o_orderpriority", "row_number", "o_orderkey", "o_totalprice"]]


_RANK_TOP_ORDERS_SQL = """
WITH r AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS row_number
  FROM orders
)
SELECT o_orderpriority, row_number, o_orderkey, o_totalprice
FROM r WHERE row_number <= 3 ORDER BY o_orderpriority, row_number
"""


def shuffle_docs_epoch(sf_dir: str) -> pd.DataFrame:
    """Reproducible global training shuffle: epoch order =
    splitmix64(doc_id XOR epoch_salt), realized as ONE distributed sort
    on the hash key — the seeded shuffle a training loader runs per
    epoch. The order is a pure function of ids, so a restarted or
    re-partitioned run reproduces it exactly (unlike
    ``Dataset.random_shuffle``, whose layout depends on block
    boundaries). Returns the first 100 (doc_id, shuffle_key) of epoch
    0; keys surface as two's-complement int64 so the DuckDB twin (the
    same exact-uint64 splitmix64 chain as the SimHash oracle) orders
    identically."""
    from .hashing import splitmix64

    salt = np.uint64(16294208416658607535)  # splitmix64(0): epoch-0 salt
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = splitmix64(ids.astype(np.uint64) ^ salt)
        return pd.DataFrame(
            {"doc_id": ids, "shuffle_key": h.astype(np.int64)}
        )

    return (
        docs.map_batches(add_key, batch_format="pandas")
        .sort("shuffle_key")
        .limit(100)
        .to_pandas()
    )


_SHUFFLE_EPOCH_SQL = """
WITH h0 AS (
  SELECT doc_id,
         xor(CAST(doc_id AS UBIGINT),
             CAST(16294208416658607535 AS UBIGINT)) AS z0
  FROM documents
),
s1 AS (SELECT doc_id, CAST((CAST(z0 AS HUGEINT) + 11400714819323198485)
                           % 18446744073709551616 AS UBIGINT) AS z FROM h0),
s1x AS (SELECT doc_id, xor(z, z >> 30) AS z FROM s1),
s2 AS (SELECT doc_id, CAST((
        (CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
         + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
            % 4294967296) * 4294967296)
       ) % 18446744073709551616 AS UBIGINT) AS z FROM s1x),
s2x AS (SELECT doc_id, xor(z, z >> 27) AS z FROM s2),
s3 AS (SELECT doc_id, CAST((
        (CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
         + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
            % 4294967296) * 4294967296)
       ) % 18446744073709551616 AS UBIGINT) AS z FROM s2x),
fin AS (
  SELECT doc_id,
         CAST(CASE WHEN xor(z, z >> 31) >= 9223372036854775808
              THEN CAST(xor(z, z >> 31) AS HUGEINT) - 18446744073709551616
              ELSE CAST(xor(z, z >> 31) AS HUGEINT) END AS BIGINT)
             AS shuffle_key
  FROM s3
)
SELECT doc_id, shuffle_key FROM fin ORDER BY shuffle_key LIMIT 100
"""


def p90_price_by_status_exact(sf_dir: str) -> pd.DataFrame:
    """Exact p90 order value per order STATUS (3 distinct values — the
    group cardinality :func:`kgraft.relational.windowed` cannot scale
    to) via :func:`kgraft.relational.grouped_quantile_by_sort`: global
    ranks from the distributed sort, selected row at
    clamp(ceil(0.9 n), 1, n) under (price, orderkey) order. The SQL
    twin uses the identical row_number formula, so the fp product
    0.9 * n is bit-identical on both sides."""
    from .relational import grouped_quantile_by_sort

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    out = grouped_quantile_by_sort(
        orders, ["o_orderstatus"], "o_totalprice", 0.9, "o_orderkey",
        out_col="p90_price",
    )
    return out[["o_orderstatus", "p90_price", "n_rows"]]


_P90_BY_STATUS_SQL = """
WITH r AS (
  SELECT o_orderstatus, o_totalprice,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus, o_totalprice AS p90_price, CAST(n AS BIGINT) AS n_rows
FROM r
WHERE rn = least(n, greatest(1, CAST(ceil(0.9 * n) AS BIGINT)))
ORDER BY o_orderstatus
"""


def theil_index_order_value(sf_dir: str) -> pd.DataFrame:
    """Theil T inequality index of order value per priority class —
    Gini's decomposable sibling (T = mean((x/mu) * ln(x/mu)))), and
    unlike Gini it needs NO sort: two algebraic partials (sum, sum of
    x*ln x) per (group, batch) ride the same map-side-combined exchange
    as every mean, since T = (sum(x ln x) / sum(x)) - ln(sum(x)/n).
    The shuffle-free-est inequality statistic at 100 TB."""
    orders = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def parts(df: pd.DataFrame) -> pd.DataFrame:
        x = df["o_totalprice"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "x": x,
                "xlx": x * np.log(x),
            }
        )

    agg = pre_aggregate(
        orders.map_batches(parts, batch_format="pandas"),
        ["o_orderpriority"],
        {"s": ("x", "sum"), "sl": ("xlx", "sum"), "n": (None, "count")},
    )
    s = agg["s"].to_numpy(np.float64)
    sl = agg["sl"].to_numpy(np.float64)
    n = agg["n"].to_numpy(np.float64)
    agg["theil"] = sql_round(sl / s - np.log(s / n), 6)
    agg["n_orders"] = agg["n"].astype("int64")
    return agg[["o_orderpriority", "theil", "n_orders"]].sort_values(
        "o_orderpriority", ignore_index=True
    )


_THEIL_SQL = """
SELECT o_orderpriority,
       round(sum(o_totalprice * ln(o_totalprice)) / sum(o_totalprice)
             - ln(sum(o_totalprice) / count(*)), 6) AS theil,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def bootstrap_mean_event_value(sf_dir: str) -> pd.DataFrame:
    """95% bootstrap confidence interval for the mean event value via
    the POISSON bootstrap (:func:`kgraft.relational.
    poisson_bootstrap_mean`) — the web-scale resampling trick: at large
    n multinomial resample weights converge to iid Poisson(1), so every
    block weights its own rows with deterministic splitmix64(id,
    replicate) draws and ships one (B x 2) partial; no global resample
    pass ever happens. Deterministic and partition-invariant — and
    SQL-expressible after all: the weights come from a splitmix64
    chain the DuckDB twin replays with exact uint64 arithmetic, and
    the bootstrap runs in integer CENTS (values are exactly 2dp here)
    so every replicate's weighted sum is an integer-valued double —
    exact in ANY summation order, which is what makes the twin's
    aggregation safe. The twin also replays numpy's linear-quantile
    lerp ((n-1)*q virtual index, b-form when gamma >= 0.5)
    bit-for-bit with module-computed constants. Coverage/width/
    determinism pytest in tests/test_relational.py."""
    from .relational import poisson_bootstrap_mean

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "value_c": sql_round(df["value"].to_numpy(np.float64) * 100.0, 0),
            }
        )

    r = poisson_bootstrap_mean(
        ev.map_batches(to_cents, batch_format="pandas"),
        "value_c", "event_id", n_boot=200,
    )
    for c in ("mean", "ci_lo", "ci_hi"):
        r[c] = sql_round(r[c] / 100.0, 6)
    return r


def _sm64_chain_sql(tag: str, carry: str, src: str) -> str:
    """CTE stages replaying kgraft.hashing.splitmix64 on column ``z``
    of CTE ``src`` (exact uint64 split-multiplies, same idiom as the
    SimHash twin); emits stages ``{tag}1..{tag}f``, final hash column
    ``h`` alongside the ``carry`` columns."""
    return f"""
{tag}1 AS (SELECT {carry}, CAST((CAST(z AS HUGEINT) + 11400714819323198485)
           % 18446744073709551616 AS UBIGINT) AS z FROM {src}),
{tag}1x AS (SELECT {carry}, xor(z, z >> 30) AS z FROM {tag}1),
{tag}2 AS (SELECT {carry}, CAST(((CAST(z % 4294967296 AS HUGEINT)
        * 13787848793156543929
        + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT)
        AS z FROM {tag}1x),
{tag}2x AS (SELECT {carry}, xor(z, z >> 27) AS z FROM {tag}2),
{tag}3 AS (SELECT {carry}, CAST(((CAST(z % 4294967296 AS HUGEINT)
        * 10723151780598845931
        + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT)
        AS z FROM {tag}2x),
{tag}f AS (SELECT {carry}, xor(z, z >> 31) AS h FROM {tag}3)"""


def _boot_consts():
    """Module-computed literals for the bootstrap twin: the Poisson(1)
    inverse-CDF thresholds (same numpy expression as
    relational.poisson_bootstrap_mean, so the repr round-trip is
    bit-exact) and numpy's linear-quantile virtual-index constants at
    n=200, q=(0.025, 0.975)."""
    import math

    pk = np.cumsum(np.exp(-1.0) / np.array(
        [math.factorial(k) for k in range(12)], dtype=np.float64
    ))
    pk_rows = ", ".join(f"({float(v)!r})" for v in pk)
    v_lo = (200 - 1) * np.float64(0.025)   # gamma >= 0.5 -> b-form lerp
    v_hi = (200 - 1) * np.float64(0.975)   # gamma < 0.5 -> a-form lerp
    i_lo = int(np.floor(v_lo))
    i_hi = int(np.floor(v_hi))
    one_minus_g_lo = float(np.float64(1.0) - (v_lo - np.floor(v_lo)))
    g_hi = float(v_hi - np.floor(v_hi))
    return pk_rows, i_lo, one_minus_g_lo, i_hi, g_hi


_BOOT_PK_ROWS, _BOOT_ILO, _BOOT_1MGLO, _BOOT_IHI, _BOOT_GHI = _boot_consts()

_BOOTSTRAP_MEAN_SQL = f"""
WITH ev AS (SELECT event_id, round(value * 100) AS xc FROM events),
pk(p) AS (VALUES {_BOOT_PK_ROWS}),
b0 AS (SELECT CAST(b AS UBIGINT) AS z, b
       FROM (SELECT unnest(range(1, 201)) AS b)),
{_sm64_chain_sql('bh', 'b', 'b0')},
h0 AS (SELECT event_id, xc, CAST(event_id AS UBIGINT) AS z FROM ev),
{_sm64_chain_sql('eh', 'event_id, xc', 'h0')},
u0 AS (SELECT e.event_id, e.xc, k.b, xor(e.h, k.h) AS z
       FROM ehf e, bhf k),
{_sm64_chain_sql('uh', 'event_id, xc, b', 'u0')},
uu AS (SELECT event_id, xc, b,
              CAST(h AS DOUBLE) * 5.421010862427522e-20 AS u FROM uhf),
w AS (SELECT event_id, b, xc,
             sum(CASE WHEN u > p THEN 1 ELSE 0 END) AS w
      FROM uu, pk GROUP BY event_id, b, xc),
rep AS (SELECT b, CAST(sum(w) AS DOUBLE) AS n,
               CAST(sum(w * xc) AS DOUBLE) AS s FROM w GROUP BY b),
means AS (SELECT s / greatest(n, 1.0) AS m FROM rep),
ord AS (SELECT m, row_number() OVER (ORDER BY m) AS rn FROM means),
qv AS (SELECT
        max(CASE WHEN rn = {_BOOT_ILO + 1} THEN m END) AS alo,
        max(CASE WHEN rn = {_BOOT_ILO + 2} THEN m END) AS blo,
        max(CASE WHEN rn = {_BOOT_IHI + 1} THEN m END) AS ahi,
        max(CASE WHEN rn = {_BOOT_IHI + 2} THEN m END) AS bhi
       FROM ord),
tot AS (SELECT CAST(sum(xc) AS DOUBLE) AS s, count(*) AS n FROM ev)
SELECT round(round(tot.s / tot.n, 6) / 100.0, 6) AS mean,
       round(round(blo - (blo - alo) * {_BOOT_1MGLO!r}, 6) / 100.0, 6) AS ci_lo,
       round(round(ahi + (bhi - ahi) * {_BOOT_GHI!r}, 6) / 100.0, 6) AS ci_hi,
       CAST(tot.n AS BIGINT) AS n,
       CAST(200 AS BIGINT) AS n_boot
FROM qv, tot
"""


def twap_user_value(sf_dir: str) -> pd.DataFrame:
    """Time-weighted average value per user (the TWAP shape: each
    observation holds until the next one, so its weight is the interval
    length) — ONE bucketed shuffle on the user key, in-bucket
    vectorized sort + shift (no per-user Python), last events (no next
    interval) drop exactly like SQL's NULL lead. Zero-total-duration
    users are excluded on both sides."""
    from .relational import bucketed_groupby_apply

    ev = read_table(sf_dir, "events", columns=["user_id", "ts", "value",
                                               "event_id"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = g.groupby("user_id", sort=False)["ts"].shift(-1)
        dt = (nxt - g["ts"]).dt.total_seconds()
        keep = dt.notna()
        num = (g.loc[keep, "value"] * dt[keep]).groupby(
            g.loc[keep, "user_id"], sort=False
        ).sum()
        den = dt[keep].groupby(g.loc[keep, "user_id"], sort=False).sum()
        cnt = dt[keep].groupby(g.loc[keep, "user_id"], sort=False).size()
        out = pd.DataFrame(
            {"user_id": num.index.to_numpy(np.int64),
             "twap": (num / den).to_numpy(),
             "n_intervals": cnt.to_numpy(np.int64)}
        )
        return out[den.to_numpy() > 0]

    out = bucketed_groupby_apply(ev, ["user_id"], per_bucket, num_buckets=32)
    df = out.to_pandas()
    df["twap"] = sql_round(df["twap"], 6)
    df["n_intervals"] = df["n_intervals"].astype("int64")
    return df.sort_values("user_id", ignore_index=True)


_TWAP_SQL = """
WITH w AS (
  SELECT user_id, value, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
  FROM events
)
SELECT user_id,
       round(sum(value * epoch(nts - ts)) / sum(epoch(nts - ts)), 6) AS twap,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM w WHERE nts IS NOT NULL
GROUP BY user_id HAVING sum(epoch(nts - ts)) > 0
ORDER BY user_id
"""


def blocking_quality_aliases(sf_dir: str) -> pd.DataFrame:
    """Entity-resolution BLOCKING-QUALITY evaluation of the MinHash-LSH
    candidate stage over the alias universe: pair completeness (share
    of true same-entity alias pairs that the blocker co-blocks) and
    reduction ratio (1 - candidates / all-pairs) — the two standard ER
    blocking metrics. Candidates come from the same band-shuffle path
    the linker uses (`textops.minhash_candidate_pairs`); truth pairs
    need no materialization (sum of C(k_e, 2) over the vocab-bounded
    entity sizes), and candidate truthfulness is a broadcast
    entity-label lookup inside the pair stream. The banding IS
    SQL-expressible after all — every stage is exact integer
    arithmetic: the DuckDB twin (_BLOCKING_QUALITY_SQL) replays the
    4-gram shingle hash, the 64 uint32 multiply-permutations
    (RandomState(1001) constants embedded via the engine's own
    MinHasher), the 16 golden-ratio-weighted band hashes, the
    identical-signature star reduction (band 0), the 64-distinct-
    signature bucket guard, and the per-band rep-pair emission, then
    recomputes both ER metrics. The recall bar stays pinned by pytest
    on the linker itself (tests/test_linking.py)."""
    from .synth import corpus_dir
    from .textops import minhash_candidate_pairs

    alias_path = os.path.join(
        corpus_dir(_pages_for(sf_dir)), "alias_dict.parquet"
    )
    al = (
        pd.read_parquet(alias_path)[["alias", "entity_id"]]
        .drop_duplicates("alias")
        .sort_values("alias", ignore_index=True)
    )  # alias dict is vocab-bounded by construction
    n = len(al)
    ent = al["entity_id"].to_numpy(np.int64)
    sizes = pd.Series(ent).value_counts().to_numpy(np.int64)
    n_truth = int((sizes * (sizes - 1) // 2).sum())

    docs_df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                            "text": al["alias"].astype(str)})
    _export_oracle_input(
        "blocking_quality_aliases",
        ray.data.from_pandas(docs_df.assign(entity_id=ent)),
    )
    docs = ray.data.from_pandas(docs_df).repartition(8)
    cand = minhash_candidate_pairs(docs, num_perm=64, num_bands=16)
    ent_ref = ray.put(ent)

    def judge(df: pd.DataFrame) -> pd.DataFrame:
        e = ray.get(ent_ref)
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": np.zeros(len(df), dtype=np.int64),
                "hit": (e[a] == e[b]).astype("int64"),
            }
        )

    agg = pre_aggregate(
        cand.map_batches(judge, batch_format="pandas"),
        ["k"],
        {"n_candidates": (None, "count"), "n_true": ("hit", "sum")},
    )
    n_cand = int(agg["n_candidates"][0]) if len(agg) else 0
    n_true = int(agg["n_true"][0]) if len(agg) else 0
    all_pairs = n * (n - 1) // 2
    return pd.DataFrame(
        {
            "n_aliases": [np.int64(n)],
            "n_truth_pairs": [np.int64(n_truth)],
            "n_candidates": [np.int64(n_cand)],
            "n_true_candidates": [np.int64(n_true)],
            "pair_completeness": [
                sql_round(n_true / n_truth, 6) if n_truth else 1.0
            ],
            "reduction_ratio": [
                sql_round(1.0 - n_cand / all_pairs, 6) if all_pairs else 1.0
            ],
        }
    )


def url_blocklist_pages(sf_dir: str) -> pd.DataFrame:
    """Crawl blocklist pass over the pages corpus: block every
    site{k}.example domain with k % 10 == 7 (a deterministic stand-in
    for a UT1-style adult/malware domain list) via the broadcast
    per-depth searchsorted suffix match
    (:func:`kgraft.textops.filter_blocked_hosts`) and report kept vs
    blocked page/char counts per language. DuckDB twin: parsed host IN
    the literal blocklist over the exported pages (_URL_BLOCKLIST_SQL);
    exact suffix-vs-substring semantics are pinned in
    tests/test_textops.py."""
    from .synth import corpus_dir, sharded_pages
    from .textops import filter_blocked_hosts

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(sharded_pages(d), columns=["url", "text", "lang"])
    _export_oracle_input("url_blocklist_pages", pages)
    blocked_domains = [f"site{k}.example" for k in range(7, 5000, 10)]

    rows = []
    for tag, keep_blocked in (("kept", False), ("blocked", True)):
        sub = filter_blocked_hosts(pages, blocked_domains,
                                   keep_blocked=keep_blocked)
        agg = pre_aggregate(
            sub.map_batches(
                lambda df: pd.DataFrame(
                    {"lang": df["lang"],
                     "n_chars": df["text"].str.len().astype("int64")}
                ),
                batch_format="pandas",
            ),
            ["lang"],
            {"n_pages": (None, "count"), "n_chars": ("n_chars", "sum")},
        )
        agg["verdict"] = tag
        rows.append(agg)
    out = pd.concat(rows, ignore_index=True)
    out["n_pages"] = out["n_pages"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out[["verdict", "lang", "n_pages", "n_chars"]].sort_values(
        ["verdict", "lang"], ignore_index=True
    )


def kg_sweep_community(sf_dir: str) -> pd.DataFrame:
    """Local community around the KG's top-PageRank entity via the
    Andersen-Chung-Lang PPR sweep cut (kgraft/graph/sweepcut.py):
    personalized PageRank from the seed, nodes ranked by mass/degree,
    the whole conductance curve from ONE extra edge pass (bincount
    deltas at each endpoint's rank cumulative-sum into cut(S_k) for
    every prefix), min-conductance prefix returned. One summary row.
    DuckDB twin (_KG_SWEEP_SQL): the PageRank-20 seed pick, PPR-20
    recursion over the symmetrized pairs, and the whole conductance
    sweep replayed; the seed argmax runs on the 6dp grid and the sweep
    rank order on the 9dp score grid on BOTH sides (raw-float
    orderings would let cross-engine ulp drift reorder structural
    near-ties; the conductance ratios themselves are exact-operand
    integer divisions, bit-identical). Planted two-clique recovery in
    tests/test_graph.py."""
    import pyarrow.parquet as pq

    from .graph.pagerank import pagerank
    from .graph.sweepcut import ppr_sweep_cut

    m = _kg_outputs(sf_dir)
    nodes_t = pq.read_table(m["nodes_dir"], columns=["entity_id"])
    node_ids = nodes_t["entity_id"].to_numpy()
    edges = _read_kg_edges(m, ["subj_id", "obj_id"])
    _export_oracle_input("kg_sweep_community", edges)
    _export_oracle_input("kg_sweep_community_nodes", ray.data.from_arrow(nodes_t))
    pr = pagerank(edges, node_ids)
    pr["rank"] = sql_round(pr["rank"], 6)  # grid-stable seed argmax
    seed = int(
        pr.sort_values(["rank", "node_id"], ascending=[False, True]).iloc[0][
            "node_id"
        ]
    )
    members, info = ppr_sweep_cut(edges, node_ids, seeds=[seed])
    return pd.DataFrame(
        {
            "seed": [np.int64(seed)],
            "community_size": [np.int64(info["size"])],
            "conductance": [float(info["conductance"])],
            "cut": [np.int64(info["cut"])],
            "volume": [np.int64(info["volume"])],
        }
    )


def page_domain_stats(sf_dir: str) -> pd.DataFrame:
    """Per-domain rollup over the pages corpus (the Common-Crawl
    curation view: which hosts dominate the crawl and how much text
    they carry): host parsed with one vectorized str.extract, stats via
    the partial-combined aggregate — html column never read. DuckDB twin
    recomputes host parse + rollup from the exported (url, text, lang)
    columns (_PAGE_DOMAIN_STATS_SQL)."""
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(sharded_pages(d), columns=["url", "text", "lang"])
    _export_oracle_input("page_domain_stats", pages)

    def host_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                # no trailing-slash requirement: bare-host URLs (no path)
                # must not fall out of the rollup as NaN
                "host": df["url"].str.extract(r"^https?://([^/]+)", expand=False),
                "n_chars": df["text"].str.len().astype("int64"),
                "is_en": (df["lang"] == "en").astype("int64"),
            }
        )

    slim = pages.map_batches(host_rows, batch_format="pandas")
    out = pre_aggregate(
        slim,
        "host",
        {
            "n_pages": (None, "count"),
            "total_chars": ("n_chars", "sum"),
            "en_share": ("is_en", "mean"),
        },
    )
    out["n_pages"] = out["n_pages"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    out["en_share"] = sql_round(out["en_share"], 6)
    return out.sort_values("host").reset_index(drop=True)


def kg_mentions(sf_dir: str):
    """Stage 4 as a standalone query: gazetteer mention detection over the
    synthetic corpus segments (actor pool, broadcast alias dict)."""
    from .extract.segment import html_to_text_batch, segment_batch
    from .models.ner import MentionDetector
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(
        sharded_pages(d), columns=["url", "warc_ts", "html", "lang"]
    )
    segs = pages.map_batches(html_to_text_batch, batch_format="pyarrow").map_batches(
        segment_batch, batch_format="pyarrow"
    )
    alias_df = pd.read_parquet(os.path.join(d, "alias_dict.parquet"))
    ref = ray.put(dict(zip(alias_df["alias"], alias_df["entity_id"].astype(int))))
    return segs.map_batches(
        MentionDetector,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=pool_concurrency(),
        batch_size=512,
    )


def kg_triples_llm(sf_dir: str):
    """Stage 4-5 through the LLM seam (offline FakeLLMClient): segments
    flow through the actor-pool LLMTripleExtractor (3-role prompt ->
    JSON-mode chat -> Arrow decode); dead-letter rows are split off and
    the clean triples returned."""
    from .extract.segment import html_to_text_batch, segment_batch
    from .models.llm import LLMTripleExtractor, split_dead_letters
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(
        sharded_pages(d), columns=["url", "warc_ts", "html", "lang"]
    )
    segs = pages.map_batches(html_to_text_batch, batch_format="pyarrow").map_batches(
        segment_batch, batch_format="pyarrow"
    )
    with_err = segs.map_batches(
        LLMTripleExtractor,
        batch_format="pyarrow",
        concurrency=pool_concurrency(),
        batch_size=256,
    )
    ok, _dead = split_dead_letters(with_err)
    return ok.select_columns(["url", "seg_idx", "subj", "pred", "obj", "conf"])


def page_meta(sf_dir: str):
    """Reference get_Meta as data: (url, title, h1, meta_description)
    projected from the raw HTML (gondar/tools/entrez.py:21-33)."""
    from .extract.meta import page_meta_batch
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(
        sharded_pages(d), columns=["url", "html"]
    )
    return pages.map_batches(page_meta_batch, batch_format="pyarrow")


def page_tables(sf_dir: str):
    """Reference get_Tables as data: attr-stripped table subtrees per
    page (gondar/tools/entrez.py:71-85) as a list<string> column."""
    from .extract.meta import page_tables_batch
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(
        sharded_pages(d), columns=["url", "html"]
    )
    return pages.map_batches(page_tables_batch, batch_format="pyarrow")


def kg_extract_text(sf_dir: str):
    """Byte-identity invariant as a query: re-extract text from html and
    return (url, text_hash) for every page."""
    from .extract.segment import html_to_text_batch
    from .hashing import hash_strings
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(
        sharded_pages(d), columns=["url", "warc_ts", "html", "lang"]
    )

    def fn(t: pa.Table) -> pa.Table:
        t = html_to_text_batch(t)
        h = hash_strings(t["text"].to_pylist()).astype(np.int64)
        return pa.table({"url": t["url"], "text_hash": pa.array(h, pa.int64())})

    return pages.map_batches(fn, batch_format="pyarrow")


def image_features_q(sf_dir: str):
    """Multimodal plumbing demo: fake-decode features over the pages'
    binary column (actor pool, small batches)."""
    from .multimodal import extract_image_features
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(
        sharded_pages(d), columns=["url", "html"]
    )
    return extract_image_features(pages)


def image_resize_q(sf_dir: str):
    """Multimodal image resize over the binary column (actor pool,
    payload-aware batches; deterministic fake backend resizes metadata
    + payload stub — the seam a PIL thumbnailer drops into). Completes
    the image family next to ``image_features``."""
    from .multimodal import resize_images
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(sharded_pages(d), columns=["url", "html"])
    return resize_images(pages)


def video_frames_q(sf_dir: str):
    """Multimodal frame sampling: one exploded row per sampled frame
    (actor pool; the explode happens inside the actor — a video is one
    input row, many output rows). Fake deterministic sampler."""
    from .multimodal import sample_video_frames
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(sharded_pages(d), columns=["url", "html"])
    return sample_video_frames(pages)


def audio_features_q(sf_dir: str):
    """Multimodal audio summary features (duration/channels/MFCC-ish
    vector) over the binary column. Fake deterministic backend."""
    from .multimodal import extract_audio_features
    from .synth import corpus_dir, sharded_pages

    d = corpus_dir(_pages_for(sf_dir))
    pages = ray.data.read_parquet(sharded_pages(d), columns=["url", "html"])
    return extract_audio_features(pages)


def _synth_bmp_payloads(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic BMP payloads from doc ids (splitmix64 pixel
    stream, 16x24 RGB) — the in-batch synthesis step for the
    real-decode multimodal queries (no external data; the driver's
    corpus has no true image bytes)."""
    from .codecs import encode_bmp
    from .hashing import splitmix64

    ids = df["doc_id"].to_numpy(np.int64)
    payloads = []
    for i in ids:
        words = splitmix64(
            np.uint64(i) * np.uint64(2654435761)
            + np.arange(16 * 24 * 3 // 8 + 1, dtype=np.uint64)
        )
        px = words.view(np.uint8)[: 16 * 24 * 3].reshape(16, 24, 3)
        payloads.append(encode_bmp(px))
    return pd.DataFrame({"doc_id": ids, "payload": payloads})


def image_features_real(sf_dir: str):
    """REAL image decode through the actor pool (r4 VERDICT next #4):
    deterministic BMP payloads synthesized per doc id, decoded by the
    vendored pure-numpy BMP codec (`kgraft.codecs`) — actual byte
    parsing -> pixels -> grayscale block-mean features, same actor
    signature/schema as the fake and PIL backends. Rows-only driver
    check (FFT/pixel features are not SQL-shaped); the straight-line
    numpy oracle lives in tests/test_multimodal.py."""
    from .multimodal import extract_image_features

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    payloads = docs.map_batches(_synth_bmp_payloads, batch_format="pandas")
    return extract_image_features(
        payloads, id_col="doc_id", payload_col="payload", backend="bmp"
    )


def audio_features_real(sf_dir: str):
    """REAL audio decode through the actor pool: per-doc PCM WAV
    payloads (two deterministic sine tones keyed on doc id), decoded
    by the stdlib-wave codec, 13 FFT log-band energies — same schema
    as the fake/soundfile backends. Rows-only; straight-line oracle in
    tests/test_multimodal.py."""
    from .codecs import encode_wav
    from .multimodal import extract_audio_features

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        sr = 4000
        t = np.arange(sr // 2)  # 0.5 s per clip
        out = []
        for i in ids:
            f0 = 200.0 + (int(i) % 17) * 40.0
            x = (np.sin(2 * np.pi * f0 * t / sr) * 11000).astype(np.int16)
            out.append(encode_wav(x, sr))
        return pd.DataFrame({"doc_id": ids, "payload": out})

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    payloads = docs.map_batches(synth, batch_format="pandas")
    return extract_audio_features(
        payloads, id_col="doc_id", payload_col="payload", backend="wav"
    )


# ---------------------------------------------------------------------------
# registry


def search_docs(sf_dir: str) -> pd.DataFrame:
    """Reference-S1 twin (query -> ranked document ids): top-20 documents
    by total occurrence count of the query terms, vectorized scan +
    per-block top-k (textops.keyword_search)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textops.keyword_search(docs, ["sort", "merge"], k=20)


_SEARCH_SQL = """
SELECT doc_id, score
FROM (
    SELECT doc_id,
           CAST((length(text) - length(replace(text, 'sort', ''))) / 4
              + (length(text) - length(replace(text, 'merge', ''))) / 5
              AS BIGINT) AS score
    FROM documents
)
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 20
"""


def bm25_search_docs(sf_dir: str) -> pd.DataFrame:
    """Relevance-ranked corpus search: top-20 documents for the query
    terms under Okapi BM25 (k1=1.2, b=0.75, char-length dl) — the
    scored upgrade of ``search_docs``. Two shuffle-free scans: a tiny
    per-block stats partial (N, Σdl, per-term df), then vectorized
    scoring with per-block top-k. See :func:`kgraft.textops.bm25_search`."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return textops.bm25_search(docs, ["sort", "merge", "stream"], k=20)


_BM25_SQL = """
WITH t(term) AS (SELECT unnest(['sort', 'merge', 'stream'])),
stats AS (
  SELECT count(*) AS n, avg(length(text)) AS avgdl FROM documents
),
tf AS (
  SELECT d.doc_id, t.term, length(d.text) AS dl,
         CAST((length(lower(d.text)) - length(replace(lower(d.text), t.term, '')))
              / length(t.term) AS BIGINT) AS tf
  FROM documents d CROSS JOIN t
),
df AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         round(sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
         ), 4) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  WHERE tf.tf > 0
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scores
WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 20
"""


def rrf_hybrid_search_docs(sf_dir: str) -> pd.DataFrame:
    """Hybrid search via reciprocal-rank fusion (Cormack et al., SIGIR
    2009): fuse the keyword-count ranking and the BM25 ranking with
    score = Σ 1/(60 + rank) over the lists a doc appears in — the
    rank-based combiner retrieval stacks use because it needs no score
    calibration. The two corpus scans are the existing distributed
    search ops; fusion itself touches only the two top-50 lists
    (bounded, driver-side by design)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    kw = textops.keyword_search(docs, ["sort", "merge"], k=50)
    bm = textops.bm25_search(docs, ["sort", "merge", "stream"], k=50)
    kw = kw.to_pandas() if not isinstance(kw, pd.DataFrame) else kw
    bm = bm.to_pandas() if not isinstance(bm, pd.DataFrame) else bm

    def ranked(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["score", "doc_id"], ascending=[False, True], ignore_index=True
        )
        df["rank"] = np.arange(1, len(df) + 1, dtype="int64")
        return df[["doc_id", "rank"]]

    fused = ranked(kw).merge(
        ranked(bm), on="doc_id", how="outer", suffixes=("_kw", "_bm25")
    )
    fused["rrf"] = sql_round((
        (1.0 / (60.0 + fused["rank_kw"])).fillna(0.0)
        + (1.0 / (60.0 + fused["rank_bm25"])).fillna(0.0)
    ), 6)
    out = fused.sort_values(
        ["rrf", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(10)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "rrf"]]


_RRF_HYBRID_SQL = """
WITH kw AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM (
    SELECT doc_id,
           CAST((length(text) - length(replace(text, 'sort', ''))) / 4
              + (length(text) - length(replace(text, 'merge', ''))) / 5
              AS BIGINT) AS score
    FROM documents
  ) WHERE score > 0
  ORDER BY score DESC, doc_id LIMIT 50
),
t(term) AS (SELECT unnest(['sort', 'merge', 'stream'])),
stats AS (SELECT count(*) AS n, avg(length(text)) AS avgdl FROM documents),
tf AS (
  SELECT d.doc_id, t.term, length(d.text) AS dl,
         CAST((length(lower(d.text)) - length(replace(lower(d.text), t.term, '')))
              / length(t.term) AS BIGINT) AS tf
  FROM documents d CROSS JOIN t
),
df AS (SELECT term, count(*) AS df FROM tf WHERE tf > 0 GROUP BY term),
bms AS (
  SELECT tf.doc_id,
         round(sum(
           ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
         ), 4) AS score
  FROM tf JOIN df USING (term) CROSS JOIN stats
  WHERE tf.tf > 0 GROUP BY tf.doc_id
),
bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM bms WHERE score > 0
  ORDER BY score DESC, doc_id LIMIT 50
)
SELECT COALESCE(kw.doc_id, bm.doc_id) AS doc_id,
       round(COALESCE(1.0 / (60 + kw.r), 0) + COALESCE(1.0 / (60 + bm.r), 0), 6)
         AS rrf
FROM kw FULL OUTER JOIN bm ON kw.doc_id = bm.doc_id
ORDER BY rrf DESC, doc_id LIMIT 10
"""


def stratified_sample_events(sf_dir: str):
    """Deterministic stratified sampling of the event stream — keep 20%
    of clicks, 10% of views, 50% of purchases, 2% of everything else,
    decided by a stable per-id hash (relational.stratified_sample) so
    the sample is reproducible under repartitioning/resume and exactly
    replayable by the SQL oracle."""
    from .relational import stratified_sample

    ds = read_table(
        sf_dir, "events", columns=["event_id", "event_type", "user_id", "value"]
    )
    out = stratified_sample(
        ds,
        "event_type",
        "event_id",
        {"click": 0.20, "view": 0.10, "purchase": 0.50},
        default_rate=0.02,
    )
    return out.sort("event_id")


_STRATIFIED_SQL = """
SELECT event_id, event_type, user_id, value
FROM events
WHERE (event_id::HUGEINT * 2654435761) % 4294967296 % 10000 <
      CASE event_type
          WHEN 'click' THEN 2000
          WHEN 'view' THEN 1000
          WHEN 'purchase' THEN 5000
          ELSE 200
      END
ORDER BY event_id
"""


def top_events_per_user(sf_dir: str) -> pd.DataFrame:
    """Top-3 events per user by value (ties -> earliest ts, then lowest
    event_id): the 'keep the best k documents per key' pattern, realized
    as a partitioned row_number window over a DESC ordering + filter.
    One bucketed shuffle on user_id; no per-group Python."""
    from .relational import windowed

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def neg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["neg_value"] = -df["value"]
        return df

    win = windowed(
        ds.map_batches(neg, batch_format="pandas"),
        part_keys="user_id",
        order_keys=["neg_value", "ts", "event_id"],
        specs={"rn": ("row_number", None)},
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["rn"] <= 3]
        return df[["user_id", "event_id", "value", "rn"]]

    out = win.map_batches(fin, batch_format="pandas").to_pandas()
    return out.sort_values(["user_id", "rn"], ignore_index=True)


_TOP_PER_USER_SQL = """
SELECT user_id, event_id, value, rn
FROM (
    SELECT user_id, event_id, value,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, ts, event_id
           ) AS BIGINT) AS rn
    FROM events
)
WHERE rn <= 3
ORDER BY user_id, rn
"""


from .queries_tpch import TPCH_ORACLE_SQL, TPCH_QUERIES  # noqa: E402

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q4_late_shipments": q4_late_shipments,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "asof_last_order": asof_last_order,
    "range_join_events": range_join_events,
    "filter_project_events": filter_project_events,
    "range_scan_events": range_scan_events,
    "zorder_scan_events": zorder_scan_events,
    "psi_event_drift": psi_event_drift,
    "ab_test_events": ab_test_events,
    "user_active_coverage": user_active_coverage,
    "topk_users_by_value": topk_users_by_value,
    "distinct_mktsegment": distinct_mktsegment,
    "union_orders": union_orders,
    "join_customer_orders": join_customer_orders,
    "customers_per_nation": customers_per_nation,
    "customers_without_big_orders": customers_without_big_orders,
    "hourly_event_stats": hourly_event_stats,
    "hopping_event_stats": hopping_event_stats,
    "user_sessions": user_sessions,
    "event_type_islands": event_type_islands,
    "session_stats": session_stats,
    "rfm_segments": rfm_segments,
    "cc_co_ordered_parts": cc_co_ordered_parts,
    "assoc_rules_parts": assoc_rules_parts,
    "corr_matrix_lineitem": corr_matrix_lineitem,
    "ols_price_by_flag": ols_price_by_flag,
    "skyline_parts": skyline_parts,
    "nb_source_logodds": nb_source_logodds,
    "benford_order_totals": benford_order_totals,
    "keyword_assoc_docs": keyword_assoc_docs,
    "monthly_revenue_growth": monthly_revenue_growth,
    "pairwise_agreement_events": pairwise_agreement_events,
    "user_event_windows": user_event_windows,
    "user_value_extrema": user_value_extrema,
    "event_rank_ntile": event_rank_ntile,
    "event_prop_k_stats": event_prop_k_stats,
    "quantity_percentiles": quantity_percentiles,
    "late_events_flagged": late_events_flagged,
    "users_per_hour": users_per_hour,
    "hourly_ohlc": hourly_ohlc,
    "stratified_sample_events": stratified_sample_events,
    "top_events_per_user": top_events_per_user,
    "search_docs": search_docs,
    "bm25_search_docs": bm25_search_docs,
    "rrf_hybrid_search_docs": rrf_hybrid_search_docs,
    "median_price_by_priority": median_price_by_priority,
    "p90_event_value_by_type": p90_event_value_by_type,
    "lineitem_moments": lineitem_moments,
    "shape_stats_by_flag": shape_stats_by_flag,
    "tfidf_top_terms_docs": tfidf_top_terms_docs,
    "inverted_index_docs": inverted_index_docs,
    "doc_bigram_nll": doc_bigram_nll,
    "event_type_pivot": event_type_pivot,
    "order_count_distribution": order_count_distribution,
    "mode_priority_by_status": mode_priority_by_status,
    "priorities_per_status": priorities_per_status,
    "approx_users_per_type": approx_users_per_type,
    "approx_median_price": approx_median_price,
    "top_tokens_docs": top_tokens_docs,
    "top_bigrams_docs": top_bigrams_docs,
    "approx_top_tokens_docs": approx_top_tokens_docs,
    "doc_unigram_nll": doc_unigram_nll,
    "hot_users_events": hot_users_events,
    "skew_salted_join_events": skew_salted_join_events,
    "auto_skew_join_events": auto_skew_join_events,
    "event_transitions": event_transitions,
    "user_retention_cohorts": user_retention_cohorts,
    "event_value_time_window": event_value_time_window,
    "zscore_event_values": zscore_event_values,
    "wavg_price_by_flag": wavg_price_by_flag,
    "regr_price_by_flag": regr_price_by_flag,
    "event_user_entropy": event_user_entropy,
    "robust_zscore_events": robust_zscore_events,
    "dedup_segments_docs": dedup_segments_docs,
    "strip_boilerplate_docs": strip_boilerplate_docs,
    "global_dedup_segments_docs": global_dedup_segments_docs,
    "dedup_spans_docs": dedup_spans_docs,
    "co_ordered_parts": co_ordered_parts,
    "audience_overlap_events": audience_overlap_events,
    "iqr_outliers_by_type": iqr_outliers_by_type,
    "user_state_history": user_state_history,
    "event_gap_stats": event_gap_stats,
    "events_point_in_time": events_point_in_time,
    "mi_type_dow_events": mi_type_dow_events,
    "debounced_events": debounced_events,
    "validate_orders": validate_orders,
    "profile_events": profile_events,
    "validate_lineitem_fk": validate_lineitem_fk,
    "k_anonymous_events": k_anonymous_events,
    "incremental_event_stats": incremental_event_stats,
    "user_feature_snapshot": user_feature_snapshot,
    "cdc_orders_state": cdc_orders_state,
    "rolling_median_value": rolling_median_value,
    "event_trigram_sequences": event_trigram_sequences,
    "bcubed_docs": bcubed_docs,
    "bucketed_join_revenue": bucketed_join_revenue,
    "quality_classifier_docs": quality_classifier_docs,
    "source_token_kl": source_token_kl,
    "dsir_select_docs": dsir_select_docs,
    "unpivot_lineitem_stats": unpivot_lineitem_stats,
    "weighted_sample_events": weighted_sample_events,
    "gap_fill_hourly_events": gap_fill_hourly_events,
    "scenario_revenue": scenario_revenue,
    "c4_clean_docs": c4_clean_docs,
    "ccnet_bucket_sample_docs": ccnet_bucket_sample_docs,
    "winsorized_event_stats": winsorized_event_stats,
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "gopher_rules_docs": gopher_rules_docs,
    "ewma_user_value": ewma_user_value,
    "cusum_event_alarms": cusum_event_alarms,
    "pmi_collocations_docs": pmi_collocations_docs,
    "zipf_alpha_docs": zipf_alpha_docs,
    "lexical_diversity_docs": lexical_diversity_docs,
    "readability_docs": readability_docs,
    "dup_rate_by_source": dup_rate_by_source,
    "cms_token_estimates": cms_token_estimates,
    "balanced_sample_docs": balanced_sample_docs,
    "token_budget_mixture_docs": token_budget_mixture_docs,
    "bpe_merges_docs": bpe_merges_docs,
    "near_dup_against_docs": near_dup_against_docs,
    "orders_by_dow": orders_by_dow,
    "event_value_histogram": event_value_histogram,
    "intersect_orders": intersect_orders,
    "intersect_all_parts": intersect_all_parts,
    "except_all_parts": except_all_parts,
    "except_orders": except_orders,
    "sample_events_per_user": sample_events_per_user,
    "normalize_docs": normalize_docs,
    "chunk_docs": chunk_docs,
    "repetition_docs": repetition_docs,
    "redact_pii_docs": redact_pii_docs,
    "dedup_incremental_docs": dedup_incremental_docs,
    "funnel_view_click_purchase": funnel_view_click_purchase,
    "rollup_order_totals": rollup_order_totals,
    "grouping_sets_orders": grouping_sets_orders,
    "upsert_orders": upsert_orders,
    "quantity_buckets": quantity_buckets,
    "mad_quantity_by_flag": mad_quantity_by_flag,
    "price_means_by_priority": price_means_by_priority,
    "diff_order_snapshots": diff_order_snapshots,
    "cube_order_totals": cube_order_totals,
    "top_order_per_customer": top_order_per_customer,
    "urgent_customers_bloom": urgent_customers_bloom,
    "decontaminate_docs": decontaminate_docs,
    "curate_documents": curate_documents,
    "tokenize_docs": tokenize_docs_q,
    "pack_docs": pack_docs,
    "split_docs": split_docs,
    "dedup_exact_docs": dedup_exact_docs,
    "token_count_docs": token_count_docs,
    "doc_stats_by_lang": doc_stats_by_lang,
    "near_dup_docs": near_dup_docs,
    "ngram_jaccard_dup": ngram_jaccard_dup,
    "simhash_docs": simhash_docs_q,
    "simhash_near_dup": simhash_near_dup_q,
    "embed_near_dup": embed_near_dup_q,
    "semdedup_embeddings": semdedup_embeddings_q,
    "knn_multi_topk": knn_multi_q,
    "langid_docs": langid_docs_q,
    "quality_docs": quality_docs_q,
    "fingerprint_docs": fingerprint_docs_q,
    "knn_cosine_topk": knn_cosine_topk,
    "mmr_diverse_neighbors": mmr_diverse_neighbors,
    "pca_embeddings": pca_embeddings,
    "hard_negatives_embeddings": hard_negatives_embeddings,
    "ivf_ann_topk": ivf_ann_topk,
    "pq_ann_topk": pq_ann_topk,
    "cluster_embeddings": cluster_embeddings,
    "cluster_quality_embeddings": cluster_quality_embeddings,
    "label_norms": label_norms,
    "label_centroids": label_centroids_q,
    "unnest_embeddings": unnest_embeddings,
    "kg_triples": kg_triples,
    "kg_nodes": kg_nodes,
    "kg_edges": kg_edges,
    "kg_pagerank": kg_pagerank,
    "kg_communities": kg_communities,
    "kg_assortativity": kg_assortativity,
    "kg_betweenness": kg_betweenness,
    "kg_functional_violations": kg_functional_violations,
    "kg_modularity": kg_modularity,
    "kg_link_prediction": kg_link_prediction,
    "kg_hits": kg_hits,
    "kg_smoothed_importance": kg_smoothed_importance,
    "kg_pagerank_weighted": kg_pagerank_weighted,
    "kg_pred_stats": kg_pred_stats,
    "kg_random_walks": kg_random_walks,
    "kg_triple_pr": kg_triple_pr,
    "kg_incremental_merge": kg_incremental_merge,
    "kg_walk_pairs": kg_walk_pairs,
    "kg_scc": kg_scc,
    "kg_node_embeddings": kg_node_embeddings,
    "kg_ppr": kg_ppr,
    "kg_khop": kg_khop,
    "canonical_url_dedup": canonical_url_dedup,
    "kg_degree_stats": kg_degree_stats,
    "kg_triangles": kg_triangles,
    "kg_kcore": kg_kcore,
    "kg_truss": kg_truss,
    "kg_densest": kg_densest,
    "kg_diameter": kg_diameter,
    "kg_mis": kg_mis,
    "kg_local_clustering": kg_local_clustering,
    "kg_centralities": kg_centralities,
    "kg_sweep_community": kg_sweep_community,
    "url_blocklist_pages": url_blocklist_pages,
    "blocking_quality_aliases": blocking_quality_aliases,
    "twap_user_value": twap_user_value,
    "sketch_union_users_by_type": sketch_union_users_by_type,
    "sketch_union_p90_value": sketch_union_p90_value,
    "bootstrap_mean_event_value": bootstrap_mean_event_value,
    "sketch_union_token_counts": sketch_union_token_counts,
    "gini_order_value": gini_order_value,
    "median_order_value_by_priority": median_order_value_by_priority,
    "p90_price_by_status_exact": p90_price_by_status_exact,
    "rank_top_orders_by_priority": rank_top_orders_by_priority,
    "shuffle_docs_epoch": shuffle_docs_epoch,
    "theil_index_order_value": theil_index_order_value,
    "page_domain_stats": page_domain_stats,
    "kg_mentions": kg_mentions,
    "kg_triples_llm": kg_triples_llm,
    "page_meta": page_meta,
    "page_tables": page_tables,
    "kg_extract_text": kg_extract_text,
    "image_features": image_features_q,
    "image_resize": image_resize_q,
    "video_frames": video_frames_q,
    "audio_features": audio_features_q,
    "image_features_real": image_features_real,
    "audio_features_real": audio_features_real,
    **TPCH_QUERIES,
}

# --- oracles over exported engine-derived inputs (r3 VERDICT task 4) ----
# These four queries read the synthesized pages corpus / materialized KG
# edges, not the registered driver views; their twins read the raw input
# columns the query exports via _export_oracle_input() and recompute the
# result from scratch in SQL.

_PAGE_DOMAIN_STATS_SQL = f"""
SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6) AS en_share
FROM read_parquet('{_ORACLE_INPUT_ROOT}/page_domain_stats/*.parquet')
GROUP BY 1 ORDER BY host
"""

_KG_DEGREE_STATS_SQL = f"""
WITH deg AS (
  SELECT subj_id, count(*) AS deg
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_degree_stats/*.parquet')
  GROUP BY subj_id
)
SELECT CAST(floor(log2(deg)) AS BIGINT) AS log2_degree,
       CAST(count(*) AS BIGINT) AS n_entities
FROM deg GROUP BY 1 ORDER BY log2_degree
"""

# the corpus' URLs all take the no-port/no-query/no-fragment fast path
# (lowercase + trailing-slash strip); the full urlsplit slow path
# (tracking-param removal, param sort) has no SQL form and is
# pytest-covered instead (tests/test_textops.py)
_CANONICAL_URL_DEDUP_SQL = f"""
WITH c AS (
  SELECT CASE WHEN regexp_matches(url, '^(https?)://([^/?#:]+)(/[^?#]*)?$')
         THEN lower(regexp_extract(url, '^(https?)://', 1)) || '://' ||
              lower(regexp_extract(url, '^https?://([^/?#:]+)', 1)) ||
              rtrim(coalesce(
                  regexp_extract(url, '^https?://[^/?#:]+(/[^?#]*)?$', 1),
                  ''), '/')
         ELSE url END AS canon_url
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/canonical_url_dedup/*.parquet')
),
g AS (SELECT canon_url, count(*) AS cnt FROM c GROUP BY canon_url)
SELECT CAST(sum(cnt) AS BIGINT) AS n_pages,
       CAST(count(*) AS BIGINT) AS n_canonical,
       CAST(max(cnt) AS BIGINT) AS max_dup
FROM g
"""

# Exact twin of the near-dup pipeline over the registered documents
# view: distinct char-4-gram sets (identical to the engine's byte
# shingles on this ASCII corpus; the base-31 shingle hash is injective
# over the lowercase+space alphabet), all-pairs exact Jaccard >= 0.7,
# connected components via transitive closure, representative = min
# doc_id. Verifies the MinHash-LSH candidate tier end-to-end: a single
# missed true pair would flip a group label and fail the hash compare.
_DUP_RATE_BY_SOURCE_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 4) AS g
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 2, 2))) t(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
good AS (
  SELECT u, v FROM pairs
  JOIN sz su ON su.doc_id = pairs.u JOIN sz sv ON sv.doc_id = pairs.v
  WHERE inter * 1.0 / (su.n + sv.n - inter) >= 0.7
),
edges2 AS (SELECT u, v FROM good UNION SELECT v AS u, u AS v FROM good),
reach AS (
  WITH RECURSIVE r(s, d) AS (
    SELECT u, v FROM edges2
    UNION
    SELECT r.s, e.v FROM r JOIN edges2 e ON r.d = e.u
  ) SELECT s, d FROM r
),
grp AS (
  SELECT doc_id, source,
         least(doc_id, coalesce(min(d), doc_id)) AS dup_group
  FROM documents LEFT JOIN reach ON reach.s = documents.doc_id
  GROUP BY doc_id, source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN dup_group <> doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dups,
       round(sum(CASE WHEN dup_group <> doc_id THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS dup_rate
FROM grp GROUP BY source ORDER BY source
"""

# shared CC body for the two text near-dup label oracles: both
# near_dup_docs (estimate tier active — empirically lossless here, its
# false-kill band is ~3.7 sigma below the 0.7 exact threshold) and
# ngram_jaccard_dup (pure exact verify) reduce to all-pairs exact
# char-4-gram Jaccard >= 0.7 + transitive closure, labels = min doc_id.
_NEAR_DUP_LABELS_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 4) AS g
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 2, 2))) t(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
good AS (
  SELECT u, v FROM pairs
  JOIN sz su ON su.doc_id = pairs.u JOIN sz sv ON sv.doc_id = pairs.v
  WHERE inter * 1.0 / (su.n + sv.n - inter) >= 0.7
),
edges2 AS (SELECT u, v FROM good UNION SELECT v AS u, u AS v FROM good),
reach AS (
  WITH RECURSIVE r(s, d) AS (
    SELECT u, v FROM edges2
    UNION
    SELECT r.s, e.v FROM r JOIN edges2 e ON r.d = e.u
  ) SELECT s, d FROM r
)
SELECT doc_id,
       CAST(least(doc_id, coalesce(min(d), doc_id)) AS BIGINT) AS dup_group
FROM documents LEFT JOIN reach ON reach.s = documents.doc_id
GROUP BY doc_id ORDER BY doc_id
"""

_EMBED_NEAR_DUP_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
),
edges2 AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
reach AS (
  WITH RECURSIVE r(s, d) AS (
    SELECT u, v FROM edges2
    UNION
    SELECT r.s, e.v FROM r JOIN edges2 e ON r.d = e.u
  ) SELECT s, d FROM r
)
SELECT vec_id,
       CAST(least(vec_id, coalesce(min(d), vec_id)) AS BIGINT) AS dup_group
FROM embeddings LEFT JOIN reach ON reach.s = embeddings.vec_id
GROUP BY vec_id ORDER BY vec_id
"""

_KG_PRED_STATS_SQL = f"""
SELECT pred,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(DISTINCT subj_id) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT obj_id) AS BIGINT) AS n_objects,
       round(avg(conf), 6) AS mean_conf
FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_pred_stats/*.parquet')
GROUP BY pred ORDER BY pred
"""

_KG_FUNCTIONAL_VIOLATIONS_SQL = f"""
WITH d AS (
  SELECT DISTINCT pred, subj_id, obj_id
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_functional_violations/*.parquet')
),
f AS (SELECT pred, subj_id, count(*) AS fanout FROM d GROUP BY 1, 2)
SELECT pred,
       CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_subjects,
       CAST(max(fanout) AS BIGINT) AS max_fanout,
       round(sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
           AS violation_rate
FROM f GROUP BY pred ORDER BY pred
"""

# Bit-exact SimHash twin: the engine's 64-bit fingerprint (base-31
# char-3-gram polynomial -> splitmix64 -> per-bit majority vote) is
# reproduced in SQL with exact uint64 arithmetic — splitmix64's
# overflowing multiplies run as HUGEINT split-multiplies
# ((lo32*c + ((hi32*c) mod 2^32) << 32) mod 2^64, products stay under
# the signed-128 ceiling), shifts/xors on UBIGINT, and the final
# fingerprint reassembles via 1<<b sums (never power(), which rounds
# through double). Verified bit-identical to kgraft.hashing.simhash64
# on both driver scales.
_SIMHASH_CTE = """
WITH w AS (
  SELECT doc_id,
         CAST(ascii(substr(text, CAST(i AS INT), 1))
            + 31 * ascii(substr(text, CAST(i AS INT) + 1, 1))
            + 961 * ascii(substr(text, CAST(i AS INT) + 2, 1)) AS UBIGINT) AS h0
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 1, 2))) t(i)
),
dw AS (SELECT DISTINCT doc_id, h0 FROM w),
s1 AS (SELECT doc_id, CAST((CAST(h0 AS HUGEINT) + 11400714819323198485)
                           % 18446744073709551616 AS UBIGINT) AS z FROM dw),
s1x AS (SELECT doc_id, xor(z, z >> 30) AS z FROM s1),
s2 AS (SELECT doc_id, CAST((
        (CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
         + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
            % 4294967296) * 4294967296)
       ) % 18446744073709551616 AS UBIGINT) AS z FROM s1x),
s2x AS (SELECT doc_id, xor(z, z >> 27) AS z FROM s2),
s3 AS (SELECT doc_id, CAST((
        (CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
         + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
            % 4294967296) * 4294967296)
       ) % 18446744073709551616 AS UBIGINT) AS z FROM s2x),
sh AS (SELECT doc_id, xor(z, z >> 31) AS h FROM s3),
votes AS (
  SELECT doc_id, b.b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM sh, LATERAL unnest(range(0, 64)) b(b)
  GROUP BY doc_id, b.b
),
fp AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0
                  THEN CAST(CAST(1 AS UBIGINT) << CAST(b AS INT) AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS u
  FROM votes GROUP BY doc_id
),
sim AS (
  SELECT doc_id,
         CAST(CASE WHEN u >= 9223372036854775808
              THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS simhash
  FROM fp
)
"""

_SIMHASH_DOCS_SQL = _SIMHASH_CTE + """
SELECT doc_id, simhash FROM sim ORDER BY doc_id
"""

# hamming <= 3 all-pairs + transitive closure: the exact semantics the
# engine's pigeonhole banding guarantees (banding is recall-lossless
# for the hamming ball, so the twin IS the spec, not an approximation).
# <= includes distance 0 — identical fingerprints group too (the
# engine's band-0 star-reduce), which matters for exact-dup texts.
_SIMHASH_NEAR_DUP_SQL = _SIMHASH_CTE + """,
good AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
edges2 AS (SELECT u, v FROM good UNION SELECT v AS u, u AS v FROM good),
reach AS (
  WITH RECURSIVE r(s, d) AS (
    SELECT u, v FROM edges2
    UNION
    SELECT r.s, e.v FROM r JOIN edges2 e ON r.d = e.u
  ) SELECT s, d FROM r
)
SELECT sim.doc_id,
       CAST(least(sim.doc_id, coalesce(min(d), sim.doc_id)) AS BIGINT)
           AS dup_group
FROM sim LEFT JOIN reach ON reach.s = sim.doc_id
GROUP BY sim.doc_id ORDER BY sim.doc_id
"""

# Winnowing fingerprint twin: k=8 polynomial (weights 31^0..31^7 stay
# under 2^63, so the raw hash is exact UBIGINT) -> the same splitmix64
# split-multiply chain as the SimHash CTE -> 4 smallest distinct
# hashes per doc -> bit_xor fold -> two's-complement BIGINT.
_FP_WSUM = " + ".join(
    f"CAST({31 ** j} AS UBIGINT) * ascii(substr(text, CAST(i AS INT) + {j}, 1))"
    for j in range(8)
)
_FINGERPRINT_DOCS_SQL = f"""
WITH w AS (
  SELECT doc_id, CAST({_FP_WSUM} AS UBIGINT) AS h0
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 6, 2))) t(i)
),
dw AS (SELECT DISTINCT doc_id, h0 FROM w),
s1 AS (SELECT doc_id, CAST((CAST(h0 AS HUGEINT) + 11400714819323198485)
                           % 18446744073709551616 AS UBIGINT) AS z FROM dw),
s1x AS (SELECT doc_id, xor(z, z >> 30) AS z FROM s1),
s2 AS (SELECT doc_id, CAST((
        (CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
         + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
            % 4294967296) * 4294967296)
       ) % 18446744073709551616 AS UBIGINT) AS z FROM s1x),
s2x AS (SELECT doc_id, xor(z, z >> 27) AS z FROM s2),
s3 AS (SELECT doc_id, CAST((
        (CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
         + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
            % 4294967296) * 4294967296)
       ) % 18446744073709551616 AS UBIGINT) AS z FROM s2x),
sh AS (SELECT DISTINCT doc_id, xor(z, z >> 31) AS h FROM s3),
rk AS (SELECT doc_id, h,
              row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
       FROM sh),
fold AS (SELECT doc_id, bit_xor(h) AS u FROM rk WHERE rn <= 4 GROUP BY doc_id)
SELECT doc_id,
       CAST(CASE WHEN u >= 9223372036854775808
            THEN CAST(u AS HUGEINT) - 18446744073709551616
            ELSE CAST(u AS HUGEINT) END AS BIGINT) AS fingerprint
FROM fold ORDER BY doc_id
"""

# langid twin: per-language stopword hit counts over lowercased
# [a-zA-Z]+ tokens; argmax with ties resolved in table order
# (en, de, fr, es — pandas idxmax column order), zero hits -> 'unk'.
_LANGID_STOPS = {
    "en": "the and of to a in is it for with".split(),
    "de": "der die das und ist nicht ein mit auf zu".split(),
    "fr": "le la les et est un une dans pour que".split(),
    "es": "el la los de que y es en un por".split(),
}


def _langid_count_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in sorted(_LANGID_STOPS[lang]))
    return (
        "len(list_filter(regexp_extract_all(lower(text), '[a-zA-Z]+'), "
        f"t -> t IN ({lst})))"
    )


_LANGID_DOCS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         {_langid_count_sql('en')} AS en, {_langid_count_sql('de')} AS de,
         {_langid_count_sql('fr')} AS fr, {_langid_count_sql('es')} AS es
  FROM documents
)
SELECT doc_id,
  CASE WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'unk'
       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
       WHEN de >= fr AND de >= es THEN 'de'
       WHEN fr >= es THEN 'fr' ELSE 'es' END AS lang_pred
FROM s ORDER BY doc_id
"""

_QUALITY_STOP_ALT = "|".join(sorted(_LANGID_STOPS["en"]))
_QUALITY_DOCS_SQL = f"""
WITH s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(lower(text),
             '\\b(?:{_QUALITY_STOP_ALT})\\b')) AS stop,
         length(text) - length(replace(text, ' ', '')) AS n_spaces
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_punct * 1.0
             / (CASE WHEN n_chars = 0 THEN 1 ELSE n_chars END), 6)
           AS punct_ratio,
       round(stop * 1.0
             / (CASE WHEN n_tokens = 0 THEN 1 ELSE n_tokens END), 6)
           AS stopword_ratio,
       round((n_chars - n_spaces) * 1.0
             / (CASE WHEN n_tokens = 0 THEN 1 ELSE n_tokens END), 6)
           AS mean_word_len,
       round((least(n_tokens, 500) / 500.0) * 0.5
             + (1.0 - least(greatest(n_punct * 1.0
                 / (CASE WHEN n_chars = 0 THEN 1 ELSE n_chars END), 0.0),
                 1.0)) * 0.2
             + least(greatest(stop * 1.0
                 / (CASE WHEN n_tokens = 0 THEN 1 ELSE n_tokens END), 0.0),
                 1.0) * 0.3, 6) AS quality
FROM s ORDER BY doc_id
"""

# incremental near-dup twin: same exact-Jaccard + transitive-closure
# machinery as _NEAR_DUP_LABELS_SQL over the full corpus; a src0 doc
# flags when its component contains any non-src0 doc (including
# ref-ref edges in the closure cannot change a new doc's has-ref flag
# — any chain from a new doc touches a ref at its first ref hop, the
# same argument the engine uses to drop ref-ref pairs map-side)
_NEAR_DUP_AGAINST_SQL = """
WITH sh AS (
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 4) AS g
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 2, 2))) t(i)
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
good AS (
  SELECT u, v FROM pairs
  JOIN sz su ON su.doc_id = pairs.u JOIN sz sv ON sv.doc_id = pairs.v
  WHERE inter * 1.0 / (su.n + sv.n - inter) >= 0.7
),
edges2 AS (SELECT u, v FROM good UNION SELECT v AS u, u AS v FROM good),
reach AS (
  WITH RECURSIVE r(s, d) AS (
    SELECT u, v FROM edges2
    UNION
    SELECT r.s, e.v FROM r JOIN edges2 e ON r.d = e.u
  ) SELECT s, d FROM r
),
grp AS (
  SELECT doc_id, least(doc_id, coalesce(min(d), doc_id)) AS dup_group
  FROM documents LEFT JOIN reach ON reach.s = documents.doc_id
  GROUP BY doc_id
),
has_ref AS (
  SELECT g.dup_group,
         max(CASE WHEN d.source <> 'src0' THEN 1 ELSE 0 END) AS hr
  FROM grp g JOIN documents d USING (doc_id) GROUP BY g.dup_group
)
SELECT d.doc_id, CAST(h.hr AS BOOLEAN) AS near_dup
FROM documents d JOIN grp g USING (doc_id) JOIN has_ref h USING (dup_group)
WHERE d.source = 'src0' ORDER BY d.doc_id
"""

# decontamination twin: 32-char windows joined on exact substring
# equality — the engine's hashed-shingle searchsorted scan is
# semantically a distinct-window semi join
_DECONTAMINATE_SQL = """
WITH w AS (
  SELECT doc_id, substr(text, CAST(i AS INT), 32) AS g
  FROM documents, LATERAL unnest(range(1, greatest(length(text) - 30, 2))) t(i)
),
dw AS (SELECT DISTINCT doc_id, g FROM w),
bench AS (SELECT DISTINCT g FROM dw WHERE doc_id % 29 = 0),
hits AS (
  SELECT dw.doc_id, count(*) AS n_hits
  FROM dw JOIN bench USING (g) GROUP BY dw.doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id) ORDER BY d.doc_id
"""

# the engine's literal blocklist (site k, k % 10 == 7, k < 5000) as an
# IN list over the parsed host — exact for any corpus, unlike a
# last-digit regex which would over-block past site4997
_BLOCKLIST_IN = ", ".join(f"'site{k}.example'" for k in range(7, 5000, 10))
_URL_BLOCKLIST_SQL = f"""
WITH p AS (
  SELECT lang, length(text) AS n_chars,
         CASE WHEN regexp_extract(url, '^https?://([^/]+)', 1)
                   IN ({_BLOCKLIST_IN})
              THEN 'blocked' ELSE 'kept' END AS verdict
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/url_blocklist_pages/*.parquet')
)
SELECT verdict, lang, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM p GROUP BY verdict, lang ORDER BY verdict, lang
"""


_KG_TRIANGLES_SQL = f"""
WITH raw AS (
  SELECT subj_id AS a, obj_id AS b
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_triangles/*.parquet')
  WHERE subj_id <> obj_id
),
und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
deg AS (
  SELECT n, count(*) AS d
  FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und) t
  GROUP BY n
),
tri AS (
  SELECT count(*) AS t
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
agg AS (
  SELECT count(*) AS n_nodes,
         CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT CAST(agg.n_nodes AS BIGINT) AS n_nodes,
       CAST((SELECT count(*) FROM und) AS BIGINT) AS n_edges,
       CAST(tri.t AS BIGINT) AS n_triangles,
       agg.n_wedges AS n_wedges,
       CASE WHEN agg.n_wedges > 0
            THEN round(3.0 * tri.t / agg.n_wedges, 6) ELSE 0.0 END
           AS global_clustering
FROM agg, tri
"""

_KG_KHOP_SQL = f"""
WITH e AS (
  SELECT subj_id AS a, obj_id AS b
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_khop/*.parquet')
),
und AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
seeds AS (
  SELECT entity_id AS n
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_khop_nodes/*.parquet')
  ORDER BY entity_id LIMIT 3
),
rr AS (
  WITH RECURSIVE r(n, hop) AS (
    SELECT n, 0 FROM seeds
    UNION
    SELECT und.b, r.hop + 1 FROM r JOIN und ON und.a = r.n WHERE r.hop < 3
  ) SELECT n, min(hop) AS hop FROM r GROUP BY n
)
SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
FROM rr GROUP BY hop ORDER BY hop
"""


_KG_ASSORT_SQL = f"""
WITH raw AS (
  SELECT subj_id AS a, obj_id AS b
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_assortativity/*.parquet')
  WHERE subj_id <> obj_id
),
und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
deg AS (
  SELECT n, CAST(count(*) AS DOUBLE) AS d
  FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und) t
  GROUP BY n
),
m AS (
  SELECT 2.0 * count(*) AS n,
         sum(du.d + dv.d) AS sx,
         sum(du.d * du.d + dv.d * dv.d) AS sxx,
         2.0 * sum(du.d * dv.d) AS sxy,
         count(*) AS ne
  FROM und JOIN deg du ON du.n = und.u JOIN deg dv ON dv.n = und.v
)
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST(ne AS BIGINT) AS n_edges,
       (sxy / n - (sx / n) * (sx / n))
           / (sxx / n - (sx / n) * (sx / n)) AS assortativity
FROM m
"""

_KG_LCC_SQL = f"""
WITH raw AS (
  SELECT subj_id AS a, obj_id AS b
  FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_local_clustering/*.parquet')
  WHERE subj_id <> obj_id
),
und AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
deg AS (
  SELECT n, count(*) AS d
  FROM (SELECT u AS n FROM und UNION ALL SELECT v AS n FROM und) t
  GROUP BY n
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
tc AS (
  SELECT n, CAST(count(*) AS DOUBLE) AS t
  FROM (SELECT a AS n FROM tri UNION ALL SELECT b AS n FROM tri
        UNION ALL SELECT c AS n FROM tri) x
  GROUP BY n
),
l AS (
  SELECT deg.n,
         round(coalesce(tc.t, 0) / ((deg.d * (deg.d - 1)) / 2.0), 6) AS lcc
  FROM deg LEFT JOIN tc ON tc.n = deg.n WHERE deg.d >= 2
),
b AS (SELECT least(CAST(floor(lcc * 10) AS BIGINT), 9) AS bin FROM l)
SELECT bin, round(bin / 10.0, 1) AS bin_lo, CAST(count(*) AS BIGINT) AS n_nodes
FROM b GROUP BY bin ORDER BY bin
"""


# DDSketch replayed in SQL: same gamma double, same ceil(ln v / ln
# gamma) bucket index, same representative value 2*gamma^j/(1+gamma),
# same rank rule max(ceil(q*total), 1) — an approximate sketch whose
# answer is nonetheless deterministic and value-hash-checkable.
_APPROX_MEDIAN_SQL = """
WITH p AS (SELECT (1.0 + 0.01) / (1.0 - 0.01) AS gamma),
b AS (
  SELECT o_orderpriority,
         CAST(ceil(ln(o_totalprice) / ln(gamma)) AS BIGINT) AS j
  FROM orders, p WHERE o_totalprice > 0
),
cnt AS (SELECT o_orderpriority, j, count(*) AS c FROM b GROUP BY 1, 2),
r AS (
  SELECT o_orderpriority, j, c,
         2.0 * power(gamma, CAST(j AS DOUBLE)) / (1.0 + gamma) AS v
  FROM cnt, p
),
s AS (
  SELECT *, sum(c) OVER (PARTITION BY o_orderpriority ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY o_orderpriority) AS total
  FROM r
)
SELECT o_orderpriority,
       round(min(CASE WHEN cum >= greatest(ceil(0.5 * total), 1)
                 THEN v END), 4) AS approx_median
FROM s GROUP BY 1 ORDER BY 1
"""


# HyperLogLog replayed in SQL (p=12): splitmix64 of each user_id via
# the exact-uint64 chain, register = top 12 bits, rho from the
# sentinel-capped remainder, per-register max, alpha_m bias constant +
# linear-counting branch — "approximate by design" still means
# deterministic, so the estimate value-hash-checks like any exact
# query. (np.rint vs SQL round(x,0) differ only at exact .5 — a
# measure-zero event for the estimator ratio.)
_APPROX_USERS_SQL = """
WITH s0 AS (SELECT event_type, CAST(user_id AS UBIGINT) AS z0 FROM events),
s1 AS (SELECT event_type, CAST((CAST(z0 AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM s0),
s1x AS (SELECT event_type, xor(z, z >> 30) AS z FROM s1),
s2 AS (SELECT event_type, CAST(((CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
        + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296))
       % 18446744073709551616 AS UBIGINT) AS z FROM s1x),
s2x AS (SELECT event_type, xor(z, z >> 27) AS z FROM s2),
s3 AS (SELECT event_type, CAST(((CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
        + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296))
       % 18446744073709551616 AS UBIGINT) AS z FROM s2x),
h AS (SELECT event_type, xor(z, z >> 31) AS h FROM s3),
rr AS (
  SELECT event_type, CAST(h >> 52 AS BIGINT) AS reg,
         63 - CAST(floor(log2(CAST(
             CAST((CAST(h AS HUGEINT) * 4096) % 18446744073709551616 AS UBIGINT)
                 | CAST(2048 AS UBIGINT)
             AS DOUBLE))) AS BIGINT) + 1 AS rho
  FROM h
),
regs AS (SELECT event_type, reg, max(rho) AS rho FROM rr GROUP BY 1, 2),
agg AS (
  SELECT event_type, sum(power(2.0, -CAST(rho AS DOUBLE))) AS inv_sum,
         count(*) AS n_present
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type,
         (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
             / (inv_sum + (4096 - n_present)) AS raw,
         4096 - n_present AS zeros
  FROM agg
),
fin AS (
  SELECT event_type,
         CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
              THEN 4096.0 * ln(4096.0 / greatest(zeros, 1))
              ELSE raw END, 0) AS BIGINT) AS u
  FROM est
)
SELECT event_type, u AS approx_users FROM fin ORDER BY event_type
"""

# Persisted-sketch union twins: the twin recomputes the estimate from
# the raw events view, so if the engine's sketch merge path ever broke
# (merged != direct registers/buckets), the engine answer would drift
# from the twin and fail the hash compare — the merge path is checked
# end-to-end, not just the formula.
_SKETCH_UNION_USERS_SQL = """
WITH s0 AS (SELECT event_type, CAST(user_id AS UBIGINT) AS z0 FROM events),
s1 AS (SELECT event_type, CAST((CAST(z0 AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM s0),
s1x AS (SELECT event_type, xor(z, z >> 30) AS z FROM s1),
s2 AS (SELECT event_type, CAST(((CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
        + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296))
       % 18446744073709551616 AS UBIGINT) AS z FROM s1x),
s2x AS (SELECT event_type, xor(z, z >> 27) AS z FROM s2),
s3 AS (SELECT event_type, CAST(((CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
        + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296))
       % 18446744073709551616 AS UBIGINT) AS z FROM s2x),
h AS (SELECT event_type, xor(z, z >> 31) AS h FROM s3),
rr AS (
  SELECT event_type, CAST(h >> 52 AS BIGINT) AS reg,
         63 - CAST(floor(log2(CAST(
             CAST((CAST(h AS HUGEINT) * 4096) % 18446744073709551616 AS UBIGINT)
                 | CAST(2048 AS UBIGINT)
             AS DOUBLE))) AS BIGINT) + 1 AS rho
  FROM h
),
regs AS (SELECT event_type, reg, max(rho) AS rho FROM rr GROUP BY 1, 2),
agg AS (
  SELECT event_type, sum(power(2.0, -CAST(rho AS DOUBLE))) AS inv_sum,
         count(*) AS n_present
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type,
         (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
             / (inv_sum + (4096 - n_present)) AS raw,
         4096 - n_present AS zeros
  FROM agg
),
fin AS (
  SELECT event_type,
         CAST(round(CASE WHEN raw <= 2.5 * 4096 AND zeros > 0
              THEN 4096.0 * ln(4096.0 / greatest(zeros, 1))
              ELSE raw END, 0) AS BIGINT) AS u
  FROM est
)
SELECT event_type, u AS approx_users, u AS direct_users,
       u = u AS merged_equals_direct
FROM fin ORDER BY event_type
"""

_SKETCH_UNION_P90_SQL = """
WITH p AS (SELECT (1.0 + 0.01) / (1.0 - 0.01) AS gamma),
b AS (
  SELECT event_type, CAST(ceil(ln(value) / ln(gamma)) AS BIGINT) AS j
  FROM events, p WHERE value > 0
),
cnt AS (SELECT event_type, j, count(*) AS c FROM b GROUP BY 1, 2),
r AS (SELECT event_type, j, c,
             2.0 * power(gamma, CAST(j AS DOUBLE)) / (1.0 + gamma) AS v
      FROM cnt, p),
s AS (SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS total FROM r),
fin AS (
  SELECT event_type,
         round(min(CASE WHEN cum >= greatest(ceil(0.9 * total), 1)
                   THEN v END), 4) AS q
  FROM s GROUP BY 1
)
SELECT event_type, q AS p90_merged, q AS p90_direct,
       q = q AS merged_equals_direct
FROM fin ORDER BY event_type
"""


# Count-Min replayed in SQL — the third member of the mergeable-
# summaries trio: FNV-1a over each distinct token via a recursive
# per-byte CTE with exact-uint64 split-multiplies, xor the row seed,
# splitmix64-finalize, mod width; per-(seed, bucket) corpus counts;
# estimate = min over the 4 rows. The union twin recomputes from the
# raw documents view, so a broken grid-merge path would drift from it.
_CMS_TOKEN_ESTIMATES_SQL = """
WITH toks AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents) x
  GROUP BY t
),
allt AS (
  SELECT t FROM toks
  UNION SELECT unnest(['data', 'sort', 'merge', 'stream', 'zzz_absent']) AS t
),
fnv AS (
  SELECT t, h FROM (
    WITH RECURSIVE f(t, pos, h) AS (
      SELECT t, 1, CAST(14695981039346656037 AS UBIGINT) FROM allt
      UNION ALL
      SELECT t, pos + 1,
        CAST((
          (CAST(xor(h, CAST(ascii(substr(t, pos, 1)) AS UBIGINT))
                % 4294967296 AS HUGEINT) * 1099511628211
           + ((CAST(xor(h, CAST(ascii(substr(t, pos, 1)) AS UBIGINT))
                // 4294967296 AS HUGEINT) * 1099511628211)
              % 4294967296) * 4294967296)
        ) % 18446744073709551616 AS UBIGINT)
      FROM f WHERE pos <= length(t)
    ) SELECT t, h FROM f WHERE pos = length(t) + 1
  )
),
seeded AS (
  SELECT t, s.seed, xor(h, CAST(s.seed AS UBIGINT)) AS z0
  FROM fnv, (SELECT unnest([101, 102, 103, 104]) AS seed) s
),
m1 AS (SELECT t, seed, CAST((CAST(z0 AS HUGEINT) + 11400714819323198485)
                            % 18446744073709551616 AS UBIGINT) AS z FROM seeded),
m1x AS (SELECT t, seed, xor(z, z >> 30) AS z FROM m1),
m2 AS (SELECT t, seed, CAST(((CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
        + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z FROM m1x),
m2x AS (SELECT t, seed, xor(z, z >> 27) AS z FROM m2),
m3 AS (SELECT t, seed, CAST(((CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
        + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z FROM m2x),
bk AS (SELECT t, seed, CAST(xor(z, z >> 31) % 4096 AS BIGINT) AS bucket FROM m3),
bucket_counts AS (
  SELECT bk.seed, bk.bucket, sum(toks.c) AS bc
  FROM bk JOIN toks USING (t) GROUP BY 1, 2
),
q AS (SELECT unnest(['data', 'sort', 'merge', 'stream', 'zzz_absent']) AS token),
est AS (
  SELECT q.token, min(coalesce(bc.bc, 0)) AS est_count
  FROM q
  JOIN bk ON bk.t = q.token
  LEFT JOIN bucket_counts bc ON bc.seed = bk.seed AND bc.bucket = bk.bucket
  GROUP BY q.token
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM toks)
SELECT token, CAST(est_count AS BIGINT) AS est_count,
       tot.n_total AS total_tokens
FROM est, tot ORDER BY token
"""

_SKETCH_UNION_TOKENS_SQL = """
WITH toks AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents) x
  GROUP BY t
),
allt AS (
  SELECT t FROM toks
  UNION SELECT unnest(['the', 'data', 'model', 'graph', 'language']) AS t
),
fnv AS (
  SELECT t, h FROM (
    WITH RECURSIVE f(t, pos, h) AS (
      SELECT t, 1, CAST(14695981039346656037 AS UBIGINT) FROM allt
      UNION ALL
      SELECT t, pos + 1,
        CAST((
          (CAST(xor(h, CAST(ascii(substr(t, pos, 1)) AS UBIGINT))
                % 4294967296 AS HUGEINT) * 1099511628211
           + ((CAST(xor(h, CAST(ascii(substr(t, pos, 1)) AS UBIGINT))
                // 4294967296 AS HUGEINT) * 1099511628211)
              % 4294967296) * 4294967296)
        ) % 18446744073709551616 AS UBIGINT)
      FROM f WHERE pos <= length(t)
    ) SELECT t, h FROM f WHERE pos = length(t) + 1
  )
),
seeded AS (
  SELECT t, s.seed, xor(h, CAST(s.seed AS UBIGINT)) AS z0
  FROM fnv, (SELECT unnest([101, 102, 103, 104]) AS seed) s
),
m1 AS (SELECT t, seed, CAST((CAST(z0 AS HUGEINT) + 11400714819323198485)
                            % 18446744073709551616 AS UBIGINT) AS z FROM seeded),
m1x AS (SELECT t, seed, xor(z, z >> 30) AS z FROM m1),
m2 AS (SELECT t, seed, CAST(((CAST(z % 4294967296 AS HUGEINT) * 13787848793156543929
        + ((CAST(z // 4294967296 AS HUGEINT) * 13787848793156543929)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z FROM m1x),
m2x AS (SELECT t, seed, xor(z, z >> 27) AS z FROM m2),
m3 AS (SELECT t, seed, CAST(((CAST(z % 4294967296 AS HUGEINT) * 10723151780598845931
        + ((CAST(z // 4294967296 AS HUGEINT) * 10723151780598845931)
           % 4294967296) * 4294967296)) % 18446744073709551616 AS UBIGINT) AS z FROM m2x),
bk AS (SELECT t, seed, CAST(xor(z, z >> 31) % 2048 AS BIGINT) AS bucket FROM m3),
bucket_counts AS (
  SELECT bk.seed, bk.bucket, sum(toks.c) AS bc
  FROM bk JOIN toks USING (t) GROUP BY 1, 2
),
q AS (SELECT unnest(['the', 'data', 'model', 'graph', 'language']) AS token),
est AS (
  SELECT q.token, min(coalesce(bc.bc, 0)) AS est_count
  FROM q
  JOIN bk ON bk.t = q.token
  LEFT JOIN bucket_counts bc ON bc.seed = bk.seed AND bc.bucket = bk.bucket
  GROUP BY q.token
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM toks)
SELECT token, CAST(est_count AS BIGINT) AS merged_est,
       CAST(est_count AS BIGINT) AS direct_est, tot.n_total,
       est_count = est_count AS merged_equals_direct
FROM est, tot ORDER BY token
"""

# PageRank replayed as a recursive CTE: one power iteration per
# recursion level over the exported (subj_id, obj_id) edges + node
# vocabulary, with the engine's exact per-step op order
# (1.0-0.85)/n + 0.85*(agg + dangling/n), per-edge term r/outdeg
# (outdeg 0 -> divide by 1), edge multiplicity preserved. Per-sum
# +-ulp order drift is absorbed by the 6dp grid both sides sort and
# compare on (see kg_pagerank).
_KG_PAGERANK_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_pagerank_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_pagerank/*.parquet')),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n0),
deg AS (SELECT n0.id, CAST(coalesce(d.c, 0) AS DOUBLE) AS outdeg
        FROM n0 LEFT JOIN (SELECT s, count(*) AS c FROM e GROUP BY s) d
        ON d.s = n0.id),
pr AS (
  SELECT 0 AS it, id, outdeg, 1.0 / (SELECT nn FROM meta) AS r FROM deg
  UNION ALL
  SELECT p.it + 1, p.id, p.outdeg,
         (1.0 - 0.85) / (SELECT nn FROM meta)
         + 0.85 * (
             coalesce((SELECT sum(q.r / (CASE WHEN q.outdeg > 0.0
                                          THEN q.outdeg ELSE 1.0 END))
                       FROM pr q JOIN e ON e.s = q.id
                       WHERE e.t = p.id), 0.0)
             + (SELECT coalesce(sum(q.r), 0.0) FROM pr q
                WHERE q.outdeg = 0.0) / (SELECT nn FROM meta))
  FROM pr p WHERE p.it < 15
)
SELECT id AS node_id, round(r, 6) AS rank
FROM pr WHERE it = 15
ORDER BY round(r, 6) DESC, id LIMIT 20
"""


# k-core peel replayed one simultaneous-drop round per recursion
# level: a level holds (current k, alive node); drops happen when the
# alive-degree (over the SQL-side-simplified undirected unique pairs)
# is < k; a fixpoint round advances k. coreness = (last k a node was
# alive at) - 1 — integer state, exact.
_KG_KCORE_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_kcore_nodes/*.parquet')),
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_kcore/*.parquet')),
pairs AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
          FROM raw WHERE s <> t),
ed AS (SELECT lo AS u, hi AS v FROM pairs
       UNION ALL SELECT hi, lo FROM pairs),
peel AS (
  SELECT 1 AS k, id FROM n0
  UNION ALL
  SELECT CASE WHEN (SELECT count(*) FROM peel x WHERE
                      (SELECT count(*) FROM ed e2
                       WHERE e2.u = x.id
                         AND e2.v IN (SELECT id FROM peel)) < x.k) > 0
              THEN l.k ELSE l.k + 1 END AS k,
         l.id
  FROM peel l
  WHERE (SELECT count(*) FROM peel x WHERE
           (SELECT count(*) FROM ed e2
            WHERE e2.u = x.id
              AND e2.v IN (SELECT id FROM peel)) < x.k) = 0
     OR (SELECT count(*) FROM ed e2
         WHERE e2.u = l.id
           AND e2.v IN (SELECT id FROM peel)) >= l.k
)
SELECT CAST(coreness AS BIGINT) AS coreness,
       CAST(count(*) AS BIGINT) AS n_entities
FROM (SELECT id, max(k) - 1 AS coreness FROM peel GROUP BY id)
GROUP BY coreness ORDER BY coreness
"""


# SCC size histogram via directed transitive closure (UNION
# recursion converges by dedup), mutual-reachability pairing with a
# reflexive base, min-member labels, then the size histogram —
# integer-exact; edge dedup is reachability-preserving.
_KG_SCC_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_scc_nodes/*.parquet')),
e AS (SELECT DISTINCT subj_id AS s, obj_id AS t
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_scc/*.parquet')),
reach AS (
  SELECT s AS a, t AS b FROM e
  UNION
  SELECT r.a, e.t FROM reach r JOIN e ON e.s = r.b
),
mut AS (
  SELECT id AS x, id AS y FROM n0
  UNION
  SELECT r1.a, r1.b FROM reach r1 JOIN reach r2
    ON r2.a = r1.b AND r2.b = r1.a
),
lab AS (SELECT x, min(y) AS scc_id FROM mut GROUP BY x),
sizes AS (SELECT scc_id, count(*) AS scc_size FROM lab GROUP BY scc_id)
SELECT CAST(scc_size AS BIGINT) AS scc_size,
       CAST(count(*) AS BIGINT) AS n_sccs
FROM sizes GROUP BY scc_size ORDER BY scc_size
"""


def _walk_salts_values(walk_length: int = 8, seed: int = 42) -> str:
    """Per-position walk-choice salts as SQL VALUES rows, computed with
    the engine's own salt derivation (kgraft.graph.walks._walk_choice)
    so the twin stays in sync with the choice stream."""
    from .graph.walks import _POS_SALT
    from .hashing import splitmix64

    rows = []
    for pos in range(walk_length):
        salt = splitmix64(
            np.array([pos], dtype=np.uint64) * _POS_SALT
            + np.array([seed], dtype=np.uint64)
        )[0]
        rows.append(f"({pos}, {int(salt)})")
    return ", ".join(rows)


# DeepWalk corpus replay: the engine's walks are DETERMINISTIC
# (choice = splitmix64(walk_id ^ salt(pos, seed)) % deg over the
# nbr-sorted deduped undirected adjacency), so a twin precomputes all
# (walk, pos) draws with exact uint64 CTE stages and advances every
# walk one step per recursion level; walks die at nodes with no
# neighbors. Integer-exact. Parameterized by export name so the
# walk-corpus consumers (kg_random_walks, kg_walk_pairs) each get a
# self-contained twin over their own exports.
def _walks_cte_sql(name: str) -> str:
    return f"""
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/{name}_nodes/*.parquet')),
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/{name}/*.parquet')),
adjp AS (SELECT DISTINCT node, nbr FROM (
          SELECT s AS node, t AS nbr FROM raw
          UNION ALL SELECT t AS node, s AS nbr FROM raw)),
adj AS (SELECT node, nbr,
               row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rnk
        FROM adjp),
dg AS (SELECT node, count(*) AS deg FROM adjp GROUP BY node),
seeds AS (SELECT (r.i - 1) * 2 + j.j AS wid, r.id AS start
          FROM (SELECT id, row_number() OVER (ORDER BY id) AS i FROM n0) r,
               (SELECT unnest([0, 1]) AS j) j),
salts(pos, salt) AS (VALUES {_walk_salts_values(8, 42)}),
dr0 AS (SELECT s.wid, salts.pos,
               xor(CAST(s.wid AS UBIGINT), CAST(salts.salt AS UBIGINT)) AS z
        FROM seeds s, salts),
{_sm64_chain_sql('dw', 'wid, pos', 'dr0')},
walks AS (
  SELECT wid, start, 0 AS pos, start AS node FROM seeds
  UNION ALL
  SELECT p.wid, p.start, p.pos + 1,
         (SELECT a.nbr
          FROM adj a JOIN dg g ON g.node = a.node
               JOIN dwf dr ON dr.wid = p.wid AND dr.pos = p.pos
          WHERE a.node = p.node
            AND a.rnk = CAST(dr.h % CAST(g.deg AS UBIGINT) AS BIGINT))
  FROM walks p
  WHERE p.pos < 8
    AND EXISTS (SELECT 1 FROM adj a WHERE a.node = p.node)
)"""


_KG_RANDOM_WALKS_SQL = f"""
WITH RECURSIVE {_walks_cte_sql('kg_walks')}
SELECT pos, CAST(count(*) AS BIGINT) AS n_walks,
       CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
FROM walks GROUP BY pos ORDER BY pos
"""


# Skip-gram pairs: unordered co-occurrences within window 2 on the
# same walk, with multiplicity (walk positions are consecutive by
# construction, so pos arithmetic IS walk adjacency).
_KG_WALK_PAIRS_SQL = f"""
WITH RECURSIVE {_walks_cte_sql('kg_walk_pairs')},
pp AS (
  SELECT least(a.node, b.node) AS u, greatest(a.node, b.node) AS v
  FROM walks a JOIN walks b
    ON b.wid = a.wid AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)
)
SELECT u, v, CAST(count(*) AS BIGINT) AS n
FROM pp GROUP BY u, v
ORDER BY n DESC, u, v LIMIT 20
"""


def _mis_salts_values(max_rounds: int = 64) -> str:
    """Per-round Luby priority salts (splitmix64 of the round number),
    computed with the engine's own hash. 64 rounds bounds any plausible
    corpus (Luby terminates in O(log n) rounds w.h.p.; the driver
    scales run <20); the twin's recursion stops at the same bound."""
    from .hashing import splitmix64

    rows = []
    for rnd in range(1, max_rounds + 1):
        rows.append(
            f"({rnd}, {int(splitmix64(np.array([rnd], dtype=np.uint64))[0])})"
        )
    return ", ".join(rows)


# Luby MIS replay: priorities are deterministic splitmix64(id ^
# salt(round)) draws, precomputed for every (node, round<=64) pair
# with exact uint64 CTE stages. Each round runs as TWO recursion
# half-steps over the full node-state table: the even step elects
# winners (strictly better (priority, dense-index) than every alive
# neighbor over the simplified undirected pairs — isolated alive
# nodes always win), the odd step removes winners and their alive
# neighbors. Terminates when no node is alive. Integer-exact.
_KG_MIS_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_mis_nodes/*.parquet')),
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_mis/*.parquet')),
pairs AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
          FROM raw WHERE s <> t),
und AS (SELECT lo AS v, hi AS u FROM pairs UNION ALL SELECT hi, lo FROM pairs),
ix AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS ix FROM n0),
salts(rnd, salt) AS (VALUES {_mis_salts_values(64)}),
d0 AS (SELECT i.id, i.ix, s.rnd,
        xor(CAST((CAST(i.id AS HUGEINT) % 18446744073709551616
                  + 18446744073709551616) % 18446744073709551616 AS UBIGINT),
            CAST(s.salt AS UBIGINT)) AS z
       FROM ix i, salts s),
{_sm64_chain_sql('mp', 'id, ix, rnd', 'd0')},
st AS (
  SELECT 0 AS step, i.id, i.ix, true AS alive, false AS in_mis, false AS win
  FROM ix i
  UNION ALL
  SELECT p.step + 1, p.id, p.ix,
    CASE WHEN p.step % 2 = 0 THEN p.alive
         ELSE p.alive AND NOT p.win AND NOT EXISTS (
            SELECT 1 FROM st q JOIN und u ON u.v = p.id AND u.u = q.id
            WHERE q.win) END,
    CASE WHEN p.step % 2 = 0 THEN p.in_mis ELSE p.in_mis OR p.win END,
    CASE WHEN p.step % 2 = 0 THEN
      p.alive AND (
        (SELECT h FROM mpf WHERE mpf.id = p.id
         AND mpf.rnd = p.step // 2 + 1)
          > coalesce((SELECT max(dr.h) FROM st q
                      JOIN und u ON u.v = p.id AND u.u = q.id
                      JOIN mpf dr ON dr.id = q.id
                        AND dr.rnd = p.step // 2 + 1
                      WHERE q.alive), 0)
        OR (
          (SELECT h FROM mpf WHERE mpf.id = p.id
           AND mpf.rnd = p.step // 2 + 1)
            = coalesce((SELECT max(dr.h) FROM st q
                        JOIN und u ON u.v = p.id AND u.u = q.id
                        JOIN mpf dr ON dr.id = q.id
                          AND dr.rnd = p.step // 2 + 1
                        WHERE q.alive), 0)
          AND p.ix > coalesce((SELECT max(q.ix) FROM st q
                JOIN und u ON u.v = p.id AND u.u = q.id
                JOIN mpf dr ON dr.id = q.id AND dr.rnd = p.step // 2 + 1
                WHERE q.alive AND dr.h = (SELECT max(dr2.h) FROM st q2
                      JOIN und u2 ON u2.v = p.id AND u2.u = q2.id
                      JOIN mpf dr2 ON dr2.id = q2.id
                        AND dr2.rnd = p.step // 2 + 1
                      WHERE q2.alive)), -1)
        ))
    ELSE false END
  FROM st p
  WHERE p.step < 128
    AND (SELECT count(*) FROM st x WHERE x.alive) > 0
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM n0) AS n_nodes,
       CAST(count(*) FILTER (WHERE in_mis) AS BIGINT) AS mis_size
FROM st WHERE step = (SELECT max(step) FROM st)
"""


# Adamic-Adar link prediction twin: wedge pairs from the deduped
# undirected adjacency (each center of distinct-degree 2..1024 gives
# every neighbor pair weight 1/ln(deg)), grouped, linked pairs
# anti-joined out, cut on the 6dp score grid with (score, a, b)
# tie-break — same grid the engine's query-level re-cut uses.
_KG_LINKPRED_SQL = f"""
WITH und AS (SELECT DISTINCT least(subj_id, obj_id) AS u,
                    greatest(subj_id, obj_id) AS v
             FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_link_prediction/*.parquet')
             WHERE subj_id <> obj_id),
adj AS (SELECT u AS c, v AS n FROM und UNION ALL SELECT v, u FROM und),
dg AS (SELECT c, count(*) AS m FROM adj GROUP BY c),
wedges AS (
  SELECT a1.n AS a, a2.n AS b, 1.0 / ln(dg.m) AS w
  FROM adj a1 JOIN adj a2 ON a2.c = a1.c AND a1.n < a2.n
  JOIN dg ON dg.c = a1.c
  WHERE dg.m >= 2 AND dg.m <= 1024
),
pairs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
                 sum(w) AS aa
          FROM wedges GROUP BY a, b),
unlinked AS (
  SELECT p.* FROM pairs p LEFT JOIN und ON und.u = p.a AND und.v = p.b
  WHERE und.u IS NULL
)
SELECT a AS node_a, b AS node_b, common_neighbors,
       round(aa, 6) AS adamic_adar
FROM unlinked
ORDER BY round(aa, 6) DESC, a, b LIMIT 20
"""



# 4-truss peel replay: one simultaneous-drop round per recursion
# level over the simplified undirected edge set; support(e) = common
# neighbors of its endpoints among the CURRENT survivors; a level
# whose survivors match its input (or empty out) carries done=true,
# reproducing the engine's rounds counter exactly (the engine counts
# the final confirming/emptying round; an un-emitted empty level
# shows up as last_done=false -> rounds = last_r + 1, truss 0).
_KG_TRUSS_SQL = f"""
WITH RECURSIVE
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_truss/*.parquet')),
p0 AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
       FROM raw WHERE s <> t),
tr AS (
  SELECT 0 AS r, lo, hi, false AS done FROM p0
  UNION ALL
  SELECT s.r + 1, s.lo, s.hi,
         ((SELECT count(*) FROM (
             SELECT 1 FROM tr e WHERE NOT e.done AND
               (SELECT count(*) FROM
                  (SELECT lo AS x, hi AS y FROM tr WHERE NOT done
                   UNION ALL SELECT hi, lo FROM tr WHERE NOT done) n1
                  JOIN
                  (SELECT lo AS x, hi AS y FROM tr WHERE NOT done
                   UNION ALL SELECT hi, lo FROM tr WHERE NOT done) n2
                  ON n2.y = n1.y
                WHERE n1.x = e.lo AND n2.x = e.hi) >= 2)) 
           = (SELECT count(*) FROM tr WHERE NOT done)) AS done
  FROM (
    SELECT e.r, e.lo, e.hi FROM tr e
    WHERE NOT e.done AND
      (SELECT count(*) FROM
         (SELECT lo AS x, hi AS y FROM tr WHERE NOT done
          UNION ALL SELECT hi, lo FROM tr WHERE NOT done) n1
         JOIN
         (SELECT lo AS x, hi AS y FROM tr WHERE NOT done
          UNION ALL SELECT hi, lo FROM tr WHERE NOT done) n2
         ON n2.y = n1.y
       WHERE n1.x = e.lo AND n2.x = e.hi) >= 2
  ) s
),
fin AS (SELECT max(r) AS last_r FROM tr),
lastlvl AS (SELECT t.* FROM tr t, fin WHERE t.r = fin.last_r)
SELECT CAST(4 AS BIGINT) AS k,
       (SELECT CAST(count(*) AS BIGINT) FROM p0) AS n_edges_in,
       CAST(CASE WHEN (SELECT bool_and(done) FROM lastlvl)
            THEN (SELECT count(*) FROM lastlvl) ELSE 0 END AS BIGINT)
         AS n_edges_truss,
       CAST(CASE WHEN (SELECT bool_and(done) FROM lastlvl)
            THEN (SELECT last_r FROM fin)
            ELSE (SELECT last_r FROM fin) + 1 END AS BIGINT) AS rounds
"""



# Densest-subgraph greedy peel replay (Bahmani et al., eps=0.05): one
# round per recursion level over the simplified pairs; alive nodes
# with degree <= 2*(1+eps)*(m_alive/n_alive) drop simultaneously (the
# threshold is an exact-operand fp product, identical on both sides);
# the answer is the highest-density level (strict improvements only,
# earliest round wins ties), rounds = number of levels with edges.
_KG_DENSEST_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_densest_nodes/*.parquet')),
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_densest/*.parquet')),
p0 AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
       FROM raw WHERE s <> t),
und AS (SELECT lo AS x, hi AS y FROM p0 UNION ALL SELECT hi, lo FROM p0),
dz AS (
  SELECT 0 AS r, id FROM n0
  UNION ALL
  SELECT p.r + 1, p.id
  FROM dz p
  WHERE (SELECT count(*) FROM p0 e
         WHERE e.lo IN (SELECT id FROM dz)
           AND e.hi IN (SELECT id FROM dz)) > 0
    AND NOT (
      (SELECT count(*) FROM und u
       WHERE u.x = p.id AND u.y IN (SELECT id FROM dz))
      <= 2.0 * (1.0 + 0.05) * (
           CAST((SELECT count(*) FROM p0 e
                 WHERE e.lo IN (SELECT id FROM dz)
                   AND e.hi IN (SELECT id FROM dz)) AS DOUBLE)
           / (SELECT count(*) FROM dz)))
),
lv AS (SELECT r, count(*) AS n_alive FROM dz GROUP BY r),
mlev AS (SELECT a.r, count(*) AS m
         FROM p0 e JOIN dz a ON a.id = e.lo
              JOIN dz b ON b.r = a.r AND b.id = e.hi
         GROUP BY a.r),
stats AS (SELECT lv.r, lv.n_alive, coalesce(ml.m, 0) AS m,
                 CAST(coalesce(ml.m, 0) AS DOUBLE) / lv.n_alive AS dens
          FROM lv LEFT JOIN mlev ml ON ml.r = lv.r),
best AS (SELECT * FROM stats WHERE dens > 0.0
         ORDER BY dens DESC, r ASC LIMIT 1)
SELECT round(coalesce((SELECT dens FROM best), 0.0), 6) AS density,
       CAST(coalesce((SELECT n_alive FROM best), 0) AS BIGINT) AS n_nodes,
       CAST(coalesce((SELECT m FROM best), 0) AS BIGINT) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM stats WHERE m > 0) AS rounds
"""



# Synchronous LPA replay: per round every node adopts the label with
# the highest undirected multiplicity-counted neighbor frequency
# (count desc, label asc — the engine's exact tie-break); isolated
# nodes keep their own label. 5 rounds, one per recursion level.
# Parameterized by export name: kg_communities and kg_modularity each
# replay LPA over their own exports.
def _lpa_cte_sql(name: str) -> str:
    return f"""
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/{name}_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/{name}/*.parquet')),
u AS (SELECT s AS a, t AS b FROM e UNION ALL SELECT t, s FROM e),
lp AS (
  SELECT 0 AS r, id, id AS lab FROM n0
  UNION ALL
  SELECT p.r + 1, p.id,
    coalesce((
      SELECT l FROM (
        SELECT q.lab AS l, count(*) AS c
        FROM u JOIN lp q ON q.id = u.b
        WHERE u.a = p.id
        GROUP BY q.lab
      ) cc ORDER BY c DESC, l ASC LIMIT 1
    ), p.lab)
  FROM lp p WHERE p.r < 5
)"""


_KG_COMMUNITIES_SQL = f"""
WITH RECURSIVE {_lpa_cte_sql('kg_communities')}
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_nodes
FROM lp WHERE r = 5
GROUP BY lab
ORDER BY n_nodes DESC, community ASC LIMIT 20
"""


# Newman-Girvan modularity of the replayed LPA labels over the
# undirected distinct self-loop-free edge set: Q = sum_c (L_c/m -
# (K_c/2m)^2) with per-term fp ops in the engine's order (the square
# written as x*x, matching numpy's **2), node universe = edge
# endpoints, unassigned nodes = singleton communities of their own id.
_KG_MODULARITY_SQL = f"""
WITH RECURSIVE {_lpa_cte_sql('kg_modularity')},
und AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
        FROM e WHERE s <> t),
idd AS (SELECT node, count(*) AS deg
        FROM (SELECT lo AS node FROM und UNION ALL SELECT hi FROM und)
        GROUP BY node),
fin AS (SELECT id, lab FROM lp WHERE r = 5),
labv AS (SELECT idd.node, coalesce(f.lab, idd.node) AS lab, idd.deg
         FROM idd LEFT JOIN fin f ON f.id = idd.node),
mm AS (SELECT CAST(sum(deg) AS DOUBLE) / 2.0 AS m FROM labv),
lc AS (SELECT a.lab AS c, count(*) AS l
       FROM und JOIN labv a ON a.node = und.lo
            JOIN labv b ON b.node = und.hi
       WHERE a.lab = b.lab GROUP BY a.lab),
kc AS (SELECT lab AS c, CAST(sum(deg) AS DOUBLE) AS k FROM labv GROUP BY lab),
terms AS (SELECT kc.c, CAST(coalesce(lc.l, 0) AS DOUBLE) AS l, kc.k
          FROM kc LEFT JOIN lc ON lc.c = kc.c)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM labv) AS n_nodes,
       CAST((SELECT m FROM mm) AS BIGINT) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM kc) AS n_communities,
       (SELECT sum(t.l / m.m - (t.k / (2.0 * m.m)) * (t.k / (2.0 * m.m)))
        FROM terms t, mm m) AS modularity
"""




# HyperBall replay (p=8, 256 registers/node): registers seeded from
# splitmix64(id) exactly as the engine (j = h & 255, rho from the
# leading-zero count of h >> 8 via bin()), then max-propagated over
# the simplified undirected pairs one round per recursion level;
# max-merge only grows register mass, so "sum(rho) increased" IS the
# engine's array-equality fixpoint test. Parameterized by export
# name: kg_diameter and kg_centralities each replay over their own
# exports. `pernode` carries the per-(round, node) HLL estimate with
# the linear-counting correction (alpha_256 at full precision).
def _hyperball_cte_sql(name: str) -> str:
    return f"""
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/{name}_nodes/*.parquet')),
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/{name}/*.parquet')),
p0 AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
       FROM raw WHERE s <> t),
h0 AS (SELECT id, CAST((CAST(id AS HUGEINT) % 18446744073709551616
            + 18446744073709551616) % 18446744073709551616 AS UBIGINT) AS z
       FROM n0),
{_sm64_chain_sql('hd', 'id', 'h0')},
init AS (SELECT id AS node, CAST(h % 256 AS BIGINT) AS j,
                CAST(CASE WHEN (h >> 8) = 0 THEN 57
                     ELSE 56 - (length(bin(h >> 8)) - 1) END AS BIGINT) AS rho
         FROM hdf),
nbr AS (SELECT id AS v, id AS src FROM n0
        UNION ALL SELECT lo, hi FROM p0
        UNION ALL SELECT hi, lo FROM p0),
hb AS (
  SELECT 0 AS r, node, j, rho FROM init
  UNION ALL
  SELECT p.r + 1, p.node, p.j, p.rho FROM (
    SELECT min(q.r) + 0 AS r, t.v AS node, q.j, max(q.rho) AS rho
    FROM nbr t JOIN hb q ON q.node = t.src
    GROUP BY t.v, q.j
  ) p
  WHERE (SELECT sum(x.rho) FROM (
           SELECT max(q2.rho) AS rho
           FROM nbr t2 JOIN hb q2 ON q2.node = t2.src
           GROUP BY t2.v, q2.j) x)
        > (SELECT sum(rho) FROM hb)
),
pernode AS (
  SELECT r, node,
         CASE WHEN (0.7182725932495458e0 * 256.0 * 256.0 /
                ((256 - count(*)) * 1.0 + sum(power(2.0, -rho))) <= 640.0
               AND (256 - count(*)) > 0)
              THEN 256.0 * ln(256.0 / CAST(256 - count(*) AS DOUBLE))
              ELSE 0.7182725932495458e0 * 256.0 * 256.0 /
                ((256 - count(*)) * 1.0 + sum(power(2.0, -rho)))
         END AS est
  FROM hb GROUP BY r, node
)"""


_KG_DIAMETER_SQL = f"""
WITH RECURSIVE {_hyperball_cte_sql('kg_diameter')},
est AS (SELECT r AS t, sum(est) AS nf FROM pernode GROUP BY r),
nf AS (
  SELECT t, CASE WHEN t = 0
                 THEN (SELECT CAST(count(*) AS DOUBLE) FROM n0)
                 ELSE nf END AS nf
  FROM est
),
tgt AS (SELECT 0.9 * (SELECT nf FROM nf ORDER BY t DESC LIMIT 1) AS tv),
hit AS (SELECT min(t) AS t FROM nf, tgt WHERE nf.nf >= tgt.tv),
ed AS (
  SELECT CASE WHEN (SELECT t FROM hit) = 0 THEN 0.0
         ELSE round(
           (SELECT t FROM hit) - 1
           + ((SELECT tv FROM tgt)
              - (SELECT nf FROM nf WHERE t = (SELECT t FROM hit) - 1))
             / ((SELECT nf FROM nf WHERE t = (SELECT t FROM hit))
                - (SELECT nf FROM nf WHERE t = (SELECT t FROM hit) - 1)), 4)
         END AS ed
)
SELECT nf.t AS t, round(nf.nf, 1) AS n_reachable_pairs,
       (SELECT ed FROM ed) AS effective_diameter
FROM nf ORDER BY t
"""


# Harmonic/closeness from the same replayed registers: per-(node, t)
# ball estimates, increments clamped at 0 against the engine's
# running max (prev_0 = |B(v,0)| = 1 exactly), harmonic = sum inc/t,
# closeness = (reached-1)/sum(inc*t); 6dp grid for compare AND the
# top-10 cut (the engine rounds before sorting).
_KG_CENTRALITIES_SQL = f"""
WITH RECURSIVE {_hyperball_cte_sql('kg_centralities')},
w AS (
  SELECT node, r, est,
         greatest(1.0, coalesce(max(est) OVER (
           PARTITION BY node ORDER BY r
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 1.0)) AS prev
  FROM pernode WHERE r >= 1
),
acc AS (
  SELECT node,
         sum(greatest(est - prev, 0.0) / r) AS harmonic,
         sum(greatest(est - prev, 0.0) * r) AS dist_sum,
         1.0 + sum(greatest(est - prev, 0.0)) AS reached
  FROM w GROUP BY node
),
allnodes AS (
  SELECT n0.id AS node_id,
         round(coalesce(a.harmonic, 0.0), 6) AS harmonic,
         round(CASE WHEN coalesce(a.dist_sum, 0.0) > 0.0
               THEN (a.reached - 1.0) / a.dist_sum ELSE 0.0 END, 6)
           AS closeness
  FROM n0 LEFT JOIN acc a ON a.node = n0.id
)
SELECT node_id, harmonic, closeness
FROM allnodes
ORDER BY harmonic DESC, node_id LIMIT 10
"""


# Sampled-source Brandes replay: node universe = distinct-edge
# endpoints; sources = bottom-64 ids by splitmix64 (the engine's
# permutation-invariant sample); distances from an exact-length
# frontier recursion (min l; undirected walks always realize the
# shortest length), path counts sigma as an integer-exact forward
# recursion one BFS level per step, dependencies as a backward
# recursion over a global descending level counter (a node's DAG
# successors all sit exactly one level deeper, so each node's delta
# closes in one step); bc = sum of deltas * (n/k)/2 with the engine's
# scalar op order, cut on the 4dp grid.
_KG_BETWEENNESS_SQL = f"""
WITH RECURSIVE
raw AS (SELECT subj_id AS s, obj_id AS t
        FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_betweenness/*.parquet')),
p0 AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
       FROM raw WHERE s <> t),
nodes AS (SELECT DISTINCT node FROM
          (SELECT lo AS node FROM p0 UNION ALL SELECT hi FROM p0)),
adj AS (SELECT lo AS x, hi AS y FROM p0 UNION ALL SELECT hi, lo FROM p0),
h0 AS (SELECT node AS id, CAST((CAST(node AS HUGEINT) % 18446744073709551616
            + 18446744073709551616) % 18446744073709551616 AS UBIGINT) AS z
       FROM nodes),
{_sm64_chain_sql('bw', 'id', 'h0')},
meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
srcs AS (SELECT id AS src FROM bwf
         ORDER BY h LIMIT least(64, (SELECT n FROM meta))),
fr AS (
  SELECT src, src AS v, 0 AS l FROM srcs
  UNION ALL
  SELECT DISTINCT p.src, a.y, p.l + 1
  FROM fr p JOIN adj a ON a.x = p.v
  WHERE p.l < 64
),
dist AS (SELECT src, v, min(l) AS d FROM fr GROUP BY src, v),
sig AS (
  SELECT 0 AS d, src, src AS v, 1.0e0 AS sigma FROM srcs
  UNION ALL
  SELECT p.d + 1, p.src, a.y AS v, sum(p.sigma) AS sigma
  FROM sig p JOIN adj a ON a.x = p.v
       JOIN dist dd ON dd.src = p.src AND dd.v = a.y AND dd.d = p.d + 1
  GROUP BY p.d, p.src, a.y
),
dmax AS (SELECT max(d) AS dm FROM dist),
del AS (
  SELECT 0 AS g, dd.src, dd.v, 0.0e0 AS delta
  FROM dist dd, dmax WHERE dd.d = dmax.dm
  UNION ALL
  SELECT gg.g, dd.src, dd.v,
         coalesce((
           SELECT sum(sv.sigma / sw.sigma * (1.0e0 + q.delta))
           FROM adj a
           JOIN del q ON q.src = dd.src AND q.v = a.y
           JOIN dist dw ON dw.src = dd.src AND dw.v = a.y
             AND dw.d = dd.d + 1
           JOIN sig sv ON sv.src = dd.src AND sv.v = dd.v
             AND sv.d = dd.d
           JOIN sig sw ON sw.src = dd.src AND sw.v = a.y
             AND sw.d = dd.d + 1
           WHERE a.x = dd.v
         ), 0.0) AS delta
  FROM (SELECT DISTINCT p.g + 1 AS g FROM del p) gg
  JOIN dmax ON true
  JOIN dist dd ON dd.d = dmax.dm - gg.g
  WHERE gg.g <= dmax.dm
),
acc AS (
  SELECT v AS node, sum(delta) AS sd
  FROM del JOIN dmax ON true
  WHERE v <> src
  GROUP BY v
),
kk AS (SELECT least(64, (SELECT n FROM meta)) AS k)
SELECT nodes.node AS node_id,
       round(coalesce(acc.sd, 0.0)
             * ((CAST((SELECT n FROM meta) AS DOUBLE) / (SELECT k FROM kk))
                / 2.0), 4) AS betweenness
FROM nodes LEFT JOIN acc ON acc.node = nodes.node
ORDER BY round(coalesce(acc.sd, 0.0)
             * ((CAST((SELECT n FROM meta) AS DOUBLE) / (SELECT k FROM kk))
                / 2.0), 4) DESC, nodes.node
LIMIT 20
"""



# ACL sweep-cut replay: PageRank-20 over the raw directed edges picks
# the seed on the 6dp grid; PPR-20 runs over the symmetrized distinct
# pairs with the seeded teleport; candidates rank by round(mass/deg,9)
# desc / id asc (the engine's grid); the conductance curve closes from
# prefix-straddling pair counts and degree prefix sums — phi values
# are exact-operand integer divisions, so the argmin (ties -> smallest
# prefix) is bit-identical. Fallback when no prefix has positive
# complement volume mirrors the engine (last prefix, conductance 1).
_KG_SWEEP_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id FROM
       read_parquet('{_ORACLE_INPUT_ROOT}/kg_sweep_community_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t FROM
      read_parquet('{_ORACLE_INPUT_ROOT}/kg_sweep_community/*.parquet')),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n0),
deg0 AS (SELECT n0.id, CAST(coalesce(d.c, 0) AS DOUBLE) AS outdeg
         FROM n0 LEFT JOIN (SELECT s, count(*) AS c FROM e GROUP BY s) d
         ON d.s = n0.id),
prs AS (
  SELECT 0 AS it, id, outdeg, 1.0 / (SELECT nn FROM meta) AS r FROM deg0
  UNION ALL
  SELECT p.it + 1, p.id, p.outdeg,
         (1.0 - 0.85) / (SELECT nn FROM meta)
         + 0.85 * (
             coalesce((SELECT sum(q.r / (CASE WHEN q.outdeg > 0.0
                                          THEN q.outdeg ELSE 1.0 END))
                       FROM prs q JOIN e ON e.s = q.id
                       WHERE e.t = p.id), 0.0)
             + (SELECT coalesce(sum(q.r), 0.0) FROM prs q
                WHERE q.outdeg = 0.0) / (SELECT nn FROM meta))
  FROM prs p WHERE p.it < 20
),
seed AS (SELECT id FROM prs WHERE it = 20
         ORDER BY round(r, 6) DESC, id LIMIT 1),
p0 AS (SELECT DISTINCT least(s, t) AS lo, greatest(s, t) AS hi
       FROM e WHERE s <> t),
sy AS (SELECT lo AS x, hi AS y FROM p0 UNION ALL SELECT hi, lo FROM p0),
dgu AS (SELECT n0.id, coalesce(d.c, 0) AS deg
        FROM n0 LEFT JOIN (SELECT x, count(*) AS c FROM sy GROUP BY x) d
        ON d.x = n0.id),
pd AS (SELECT dgu.id, CAST(dgu.deg AS DOUBLE) AS outdeg,
              CASE WHEN dgu.id = (SELECT id FROM seed)
                   THEN 1.0e0 ELSE 0.0e0 END AS pv
       FROM dgu),
ppr AS (
  SELECT 0 AS it, id, outdeg, pv, pv AS r FROM pd
  UNION ALL
  SELECT p.it + 1, p.id, p.outdeg, p.pv,
         (1.0 - 0.85) * p.pv
         + 0.85 * (
             coalesce((SELECT sum(q.r / (CASE WHEN q.outdeg > 0.0
                                          THEN q.outdeg ELSE 1.0 END))
                       FROM ppr q JOIN sy ON sy.x = q.id
                       WHERE sy.y = p.id), 0.0)
             + (SELECT coalesce(sum(q.r), 0.0) FROM ppr q
                WHERE q.outdeg = 0.0) * p.pv)
  FROM ppr p WHERE p.it < 20
),
sc AS (SELECT f.id, f.r, d.deg,
              CASE WHEN d.deg > 0 THEN f.r / greatest(d.deg, 1)
                   ELSE 0.0e0 END AS score
       FROM (SELECT id, r FROM ppr WHERE it = 20) f
       JOIN dgu d ON d.id = f.id),
cand AS (SELECT id, deg, round(score, 9) AS s9 FROM sc
         WHERE score > 0.0 AND deg > 0),
rk AS (SELECT id, deg, row_number() OVER (ORDER BY s9 DESC, id) AS k
       FROM cand),
sw AS (SELECT sum(deg) AS v, count(*) AS nc FROM rk),
er AS (SELECT least(coalesce(a.k, 999999999), coalesce(b.k, 999999999)) AS ra,
              greatest(coalesce(a.k, 999999999),
                       coalesce(b.k, 999999999)) AS rb
       FROM p0 LEFT JOIN rk a ON a.id = p0.lo
            LEFT JOIN rk b ON b.id = p0.hi),
curve AS (
  SELECT rk.k,
         (SELECT count(*) FROM er WHERE er.ra <= rk.k AND er.rb > rk.k)
           AS cut,
         (SELECT sum(r2.deg) FROM rk r2 WHERE r2.k <= rk.k) AS vol
  FROM rk),
ph AS (SELECT k, cut, vol,
              least(vol, (SELECT v FROM sw) - vol) AS denom FROM curve),
valid AS (SELECT k, cut, vol, CAST(cut AS DOUBLE) / denom AS phi
          FROM ph WHERE denom > 0),
best AS (SELECT * FROM valid ORDER BY phi ASC, k ASC LIMIT 1),
lastp AS (SELECT k, cut, vol FROM ph ORDER BY k DESC LIMIT 1)
SELECT (SELECT id FROM seed) AS seed,
       CAST(coalesce((SELECT k FROM best), (SELECT k FROM lastp))
            AS BIGINT) AS community_size,
       CASE WHEN (SELECT count(*) FROM valid) > 0
            THEN round((SELECT phi FROM best), 6) ELSE 1.0 END
         AS conductance,
       CAST(coalesce((SELECT cut FROM best), (SELECT cut FROM lastp))
            AS BIGINT) AS cut,
       CAST(coalesce((SELECT vol FROM best), (SELECT vol FROM lastp))
            AS BIGINT) AS volume
"""



# MMR greedy replay over the base embeddings view: shortlist-100 by
# cosine (query vector normalized with the engine's 1e-12 guard,
# per-row norms with the zero->1e-12 guard), then one greedy pick per
# recursion level — the running max-similarity to the selected set is
# carried per candidate and updated with unit-vector dot products
# (zero->1.0 norm guard, matching the engine's unit matrix); the
# argmax ties break to the lower vec_id exactly like the engine's
# lexsort. Outputs round at 6dp.
_MMR_SQL = """
WITH RECURSIVE
qq AS (SELECT CAST(embedding AS DOUBLE[]) AS qe,
              greatest(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))),
                       1e-12) AS qd
       FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb,
         list_dot_product(CAST(e.embedding AS DOUBLE[]),
                          list_transform(qq.qe, x -> x / qq.qd))
         / (CASE WHEN sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[]))) = 0.0
            THEN 1e-12
            ELSE sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                       CAST(e.embedding AS DOUBLE[]))) END)
           AS rel
  FROM embeddings e, qq),
short AS (SELECT * FROM scored ORDER BY rel DESC, vec_id LIMIT 100),
su AS (SELECT vec_id, rel,
              list_transform(emb, x -> x /
                (CASE WHEN sqrt(list_dot_product(emb, emb)) = 0.0
                 THEN 1.0e0 ELSE sqrt(list_dot_product(emb, emb)) END)) AS unit
       FROM short),
mm AS (
  SELECT 0 AS st, vec_id, rel, CAST(NULL AS DOUBLE) AS msim, unit,
         CAST(NULL AS BIGINT) AS picked_at, CAST(NULL AS DOUBLE) AS mmr_pick
  FROM su
  UNION ALL
  SELECT p.st + 1, p.vec_id, p.rel,
    CASE WHEN p.picked_at IS NOT NULL OR p.vec_id = b.bid THEN p.msim
         WHEN p.msim IS NULL THEN list_dot_product(p.unit, b.bunit)
         ELSE greatest(p.msim, list_dot_product(p.unit, b.bunit)) END,
    p.unit,
    CASE WHEN p.vec_id = b.bid THEN p.st + 1 ELSE p.picked_at END,
    CASE WHEN p.vec_id = b.bid THEN b.bmmr ELSE p.mmr_pick END
  FROM mm p,
       (SELECT x.vec_id AS bid, x.unit AS bunit,
               0.7e0 * x.rel - (1.0e0 - 0.7e0) * coalesce(x.msim, 0.0e0)
                 AS bmmr
        FROM mm x WHERE x.picked_at IS NULL
        ORDER BY 0.7e0 * x.rel
                 - (1.0e0 - 0.7e0) * coalesce(x.msim, 0.0e0) DESC,
                 x.vec_id
        LIMIT 1) b
  WHERE p.st < least(10, (SELECT count(*) FROM su))
)
SELECT picked_at AS rank, vec_id, round(rel, 6) AS relevance,
       round(mmr_pick, 6) AS mmr_score
FROM mm WHERE st = (SELECT max(st) FROM mm) AND picked_at IS NOT NULL
ORDER BY rank
"""



# Lloyd k-means replay: the deterministic hash sample (bottom rows by
# SIGNED splitmix64(vec_id ^ 0xA5A5), the engine's int64 view), init =
# first n_cells sample rows (the engine's r5 init — uniform via hash
# order AND replayable), then one Lloyd iteration per recursion level:
# argmin assignment (ties -> lowest cell), per-dimension means, empty
# cells keep their centroid. Distances via list arithmetic; the
# engine/SQL summation-order ulp drift only matters for points within
# ~1e-12 of a Voronoi boundary.
def _kmeans_cte_sql(n_cells: int, n_iter: int = 10,
                    sample_limit: int = 4096) -> str:
    return f"""
allv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
hs AS (SELECT vec_id, emb,
              CAST(CASE WHEN h >= 9223372036854775808
                   THEN CAST(h AS HUGEINT) - 18446744073709551616
                   ELSE CAST(h AS HUGEINT) END AS BIGINT) AS hsig
       FROM (
         SELECT vec_id, emb, z AS h0, h FROM (
           WITH s0 AS (SELECT vec_id, emb,
                        xor(CAST(vec_id AS UBIGINT), CAST(42405 AS UBIGINT))
                          AS z FROM allv),
           {_sm64_chain_sql('ks', 'vec_id, emb', 's0')}
           SELECT vec_id, emb, CAST(0 AS UBIGINT) AS z, h FROM ksf
         )
       )),
samp AS (SELECT vec_id, emb,
                row_number() OVER (ORDER BY hsig) AS rn
         FROM hs ORDER BY hsig LIMIT {sample_limit}),
km AS (
  SELECT 0 AS it, rn - 1 AS cell, emb AS cent
  FROM samp WHERE rn <= {n_cells}
  UNION ALL
  SELECT p.it + 1, p.cell, coalesce(nc.cent, p.cent)
  FROM km p LEFT JOIN (
    SELECT cell, list(v ORDER BY dim) AS cent FROM (
      SELECT a.cell, d.dim, avg(a.emb[CAST(d.dim AS INT)]) AS v
      FROM (
        SELECT s.emb,
               (SELECT q.cell FROM km q
                ORDER BY list_distance(s.emb, q.cent) ASC, q.cell ASC
                LIMIT 1) AS cell
        FROM samp s) a,
        unnest(range(1, len(a.emb) + 1)) d(dim)
      GROUP BY a.cell, d.dim)
    GROUP BY cell) nc ON nc.cell = p.cell
  WHERE p.it < {n_iter}
),
cents AS (SELECT cell, cent FROM km WHERE it = {n_iter})"""


# Corpus clustering twin: every vector -> nearest final centroid via
# the engine's |x|^2 - 2xc + |c|^2 expansion, dist = sqrt clamped at
# 0, rounded 6.
_CLUSTER_EMB_SQL = f"""
WITH RECURSIVE {_kmeans_cte_sql(16)},
d2 AS (
  SELECT a.vec_id, c.cell,
         list_dot_product(a.emb, a.emb)
         - 2.0 * list_dot_product(a.emb, c.cent)
         + list_dot_product(c.cent, c.cent) AS d2
  FROM allv a, cents c),
best AS (
  SELECT vec_id, cell, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC)
           AS rnk
  FROM d2)
SELECT vec_id, CAST(cell AS BIGINT) AS cluster_id,
       round(sqrt(greatest(d2, 0.0)), 6) AS dist
FROM best WHERE rnk = 1 ORDER BY vec_id
"""


# IVF ANN twin: probe the 4 centroids nearest the query (direct
# squared distance), keep vectors assigned (direct argmin) to probed
# cells, rank by cosine on the 6dp grid.
_IVF_SQL = f"""
WITH RECURSIVE {_kmeans_cte_sql(16)},
qq AS (SELECT CAST(embedding AS DOUBLE[]) AS qe,
              greatest(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))),
                       1e-12) AS qd
       FROM embeddings WHERE vec_id = 0),
probe AS (SELECT c.cell FROM cents c, qq
          ORDER BY list_distance(c.cent, qq.qe) ASC, c.cell ASC LIMIT 4),
asg AS (
  SELECT a.vec_id, a.emb,
         (SELECT c.cell FROM cents c
          ORDER BY list_distance(a.emb, c.cent) ASC, c.cell ASC LIMIT 1)
           AS cell
  FROM allv a),
scored AS (
  SELECT a.vec_id,
         round(list_dot_product(a.emb, list_transform(qq.qe, x -> x / qq.qd))
           / (CASE WHEN sqrt(list_dot_product(a.emb, a.emb)) = 0.0
              THEN 1e-12 ELSE sqrt(list_dot_product(a.emb, a.emb)) END), 6)
           AS score
  FROM asg a, qq WHERE a.cell IN (SELECT cell FROM probe))
SELECT vec_id, score FROM scored
ORDER BY score DESC, vec_id LIMIT 10
"""



# Cluster-quality twin: assignments via the expansion (like the
# engine's quality pass), per-cluster count / sqrt-distance sum /
# squared-distance sum, Davies-Bouldin from the live clusters'
# pairwise centroid distances (same expansion + clamp), 4dp grid.
_CLUSTER_QUALITY_SQL = f"""
WITH RECURSIVE {_kmeans_cte_sql(16)},
d2 AS (
  SELECT a.vec_id, c.cell,
         list_dot_product(a.emb, a.emb)
         - 2.0 * list_dot_product(a.emb, c.cent)
         + list_dot_product(c.cent, c.cent) AS d2
  FROM allv a, cents c),
best AS (
  SELECT vec_id, cell, greatest(d2, 0.0) AS b2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC)
           AS rnk
  FROM d2),
per AS (SELECT cell, count(*) AS n, sum(sqrt(b2)) AS sd, sum(b2) AS sd2
        FROM best WHERE rnk = 1 GROUP BY cell),
allc AS (SELECT c.cell, c.cent, coalesce(p.n, 0) AS n,
                coalesce(p.sd, 0.0) AS sd, coalesce(p.sd2, 0.0) AS sd2
         FROM cents c LEFT JOIN per p ON p.cell = c.cell),
sct AS (SELECT cell, cent, n, sd2,
               CASE WHEN n > 0 THEN sd / n ELSE 0.0 END AS scatter
        FROM allc),
live AS (SELECT * FROM sct WHERE n > 0),
dbr AS (
  SELECT a.cell,
         max((a.scatter + b.scatter)
             / sqrt(greatest(
                 list_dot_product(a.cent, a.cent)
                 - 2.0 * list_dot_product(a.cent, b.cent)
                 + list_dot_product(b.cent, b.cent), 0.0))) AS r
  FROM live a JOIN live b ON b.cell <> a.cell
  GROUP BY a.cell),
db AS (SELECT CASE WHEN (SELECT count(*) FROM live) < 2 THEN NULL
              ELSE (SELECT avg(r) FROM dbr) END AS v)
SELECT CAST(s.cell AS BIGINT) AS cluster_id,
       CAST(s.n AS BIGINT) AS n_vecs,
       round(s.sd2, 4) AS inertia,
       round(s.scatter, 4) AS scatter,
       round((SELECT v FROM db), 4) AS db_index
FROM sct s ORDER BY s.cell
"""



# SemDeDup twin: k-means(8) assignment via the expansion, then every
# within-cluster pair of unit vectors with cosine >= 0.95 (the
# engine's star/sub-split contractions are connectivity-preserving,
# so the closure of all threshold pairs IS the group structure);
# dup_group = min vec_id of the pair-connected component, singletons
# map to themselves.
_SEMDEDUP_SQL = f"""
WITH RECURSIVE {_kmeans_cte_sql(8)},
d2 AS (
  SELECT a.vec_id, a.emb, c.cell,
         list_dot_product(a.emb, a.emb)
         - 2.0 * list_dot_product(a.emb, c.cent)
         + list_dot_product(c.cent, c.cent) AS d2
  FROM allv a, cents c),
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT vec_id, emb, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, cell ASC) AS rnk
    FROM d2) WHERE rnk = 1),
un AS (SELECT vec_id, cell,
              list_transform(emb, x -> x /
                (CASE WHEN sqrt(list_dot_product(emb, emb)) = 0.0
                 THEN 1e-12 ELSE sqrt(list_dot_product(emb, emb)) END))
                AS unit
       FROM asg),
pp AS (SELECT a.vec_id AS x, b.vec_id AS y
       FROM un a JOIN un b ON b.cell = a.cell AND a.vec_id < b.vec_id
       WHERE list_dot_product(a.unit, b.unit) >= 0.95),
sym AS (SELECT x, y FROM pp UNION ALL SELECT y, x FROM pp),
reach AS (
  SELECT x AS a, y AS b FROM sym
  UNION
  SELECT r.a, s.y FROM reach r JOIN sym s ON s.x = r.b
),
grp AS (
  SELECT v.vec_id,
         least(v.vec_id,
               coalesce((SELECT min(r.b) FROM reach r
                         WHERE r.a = v.vec_id), v.vec_id)) AS dup_group
  FROM allv v)
SELECT vec_id, dup_group FROM grp ORDER BY vec_id
"""



# Hard-negative mining twin: k-means(8) expansion assignment, units
# with the zero->1.0 norm guard, per-vector argmax cosine among
# DIFFERENT-label cell mates (ties -> lowest neg_id, the engine's
# first-index-in-vec_id-order rule), first 200 by vec_id.
_HARD_NEG_SQL = f"""
WITH RECURSIVE {_kmeans_cte_sql(8)},
d2 AS (
  SELECT a.vec_id, a.emb, c.cell,
         list_dot_product(a.emb, a.emb)
         - 2.0 * list_dot_product(a.emb, c.cent)
         + list_dot_product(c.cent, c.cent) AS d2
  FROM allv a, cents c),
asg AS (
  SELECT vec_id, emb, cell FROM (
    SELECT vec_id, emb, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2 ASC, cell ASC) AS rnk
    FROM d2) WHERE rnk = 1),
un AS (SELECT a.vec_id, a.cell, e.label,
              list_transform(a.emb, x -> x /
                (CASE WHEN sqrt(list_dot_product(a.emb, a.emb)) = 0.0
                 THEN 1.0e0 ELSE sqrt(list_dot_product(a.emb, a.emb)) END))
                AS unit
       FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id),
cand AS (
  SELECT a.vec_id, b.vec_id AS neg_id, b.label AS neg_label,
         list_dot_product(a.unit, b.unit) AS sim
  FROM un a JOIN un b ON b.cell = a.cell AND b.vec_id <> a.vec_id
  WHERE b.label <> a.label),
best AS (
  SELECT vec_id, neg_id, neg_label, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, neg_id ASC) AS rnk
  FROM cand)
SELECT vec_id, neg_id, neg_label, round(sim, 6) AS cos_sim
FROM best WHERE rnk = 1 ORDER BY vec_id LIMIT 200
"""



def _minhash_consts():
    """Literal tables for the LSH blocking twin, drawn from the
    engine's own MinHasher(num_perm=64, seed=1001) so the permutation
    constants can never drift, plus the band-mix golden-ratio weights
    and per-band salts."""
    from .hashing import MinHasher, splitmix64

    h = MinHasher(num_perm=64, seed=1001, shingle_k=4)
    perms = ", ".join(
        f"({i}, {int(a)}, {int(b)})" for i, (a, b) in enumerate(zip(h.a, h.b))
    )
    g = np.uint64(0x9E3779B97F4A7C15) ** np.arange(4, dtype=np.uint64)
    salts = ", ".join(
        f"({j}, {int(v)})"
        for j, v in enumerate(splitmix64(np.arange(16, dtype=np.uint64)))
    )
    return perms, [int(x) for x in g], salts


_MH_PERMS, _MH_G, _MH_SALTS = _minhash_consts()

# MinHash-LSH blocking replay — exact integer arithmetic end to end:
# zero-padded 4-gram byte-polynomial shingles -> splitmix64 -> uint32
# fold; sig[i] = min over shingles of (a_i*h32 + b_i) mod 2^32; band
# hash j = splitmix64((sum_t sig[4j+t]*G^t mod 2^64) xor salt_j);
# per-(band, hash) bucket: identical-signature classes (grouped by the
# full signature LIST — the engine's 64-bit fingerprint equality is a
# whp-exact proxy for the same classes), band-0 min-id member stars,
# then all rep pairs when 2 <= #classes <= 64; both ER metrics from
# the multiset of emitted rows exactly like the engine's judge pass.
_BLOCKING_QUALITY_SQL = f"""
WITH docs AS (SELECT doc_id, text, entity_id FROM
  read_parquet('{_ORACLE_INPUT_ROOT}/blocking_quality_aliases/*.parquet')),
wn AS (
  SELECT d.doc_id, w.i,
    (CASE WHEN w.i <= length(d.text)
          THEN ascii(substr(d.text, CAST(w.i AS INT), 1)) ELSE 0 END)
    + 31 * (CASE WHEN w.i + 1 <= length(d.text)
          THEN ascii(substr(d.text, CAST(w.i AS INT) + 1, 1)) ELSE 0 END)
    + 961 * (CASE WHEN w.i + 2 <= length(d.text)
          THEN ascii(substr(d.text, CAST(w.i AS INT) + 2, 1)) ELSE 0 END)
    + 29791 * (CASE WHEN w.i + 3 <= length(d.text)
          THEN ascii(substr(d.text, CAST(w.i AS INT) + 3, 1)) ELSE 0 END)
      AS acc
  FROM docs d,
       LATERAL unnest(range(1, greatest(length(d.text), 4) - 2)) w(i)),
w0 AS (SELECT doc_id, i, CAST(acc AS UBIGINT) AS z FROM wn),
{_sm64_chain_sql('mh', 'doc_id, i', 'w0')},
h32 AS (SELECT doc_id, CAST(xor(h, h >> 32) % 4294967296 AS HUGEINT) AS h32
        FROM mhf),
perms(pi, pa, pb) AS (VALUES {_MH_PERMS}),
sigs AS (SELECT doc_id, p.pi AS perm,
                min(CAST((CAST(p.pa AS HUGEINT) * h32.h32 + p.pb)
                    % 4294967296 AS BIGINT)) AS sig
         FROM h32, perms p GROUP BY doc_id, p.pi),
sigl AS (SELECT doc_id, list(sig ORDER BY perm) AS sig
         FROM sigs GROUP BY doc_id),
salts(bj, salt) AS (VALUES {_MH_SALTS}),
mix AS (
  SELECT s.doc_id, b.bj AS band, s.sig,
         xor(CAST((
           CAST(s.sig[4 * b.bj + 1] AS HUGEINT) * {_MH_G[0]}
           + CAST(s.sig[4 * b.bj + 2] AS HUGEINT) * {_MH_G[1]}
           + CAST(s.sig[4 * b.bj + 3] AS HUGEINT) * {_MH_G[2]}
           + CAST(s.sig[4 * b.bj + 4] AS HUGEINT) * {_MH_G[3]}
         ) % 18446744073709551616 AS UBIGINT),
         CAST(b.salt AS UBIGINT)) AS z
  FROM sigl s, salts b),
{_sm64_chain_sql('bm', 'doc_id, band, sig', 'mix')},
bu AS (SELECT doc_id, band, sig, h AS band_hash FROM bmf),
cls AS (SELECT band, band_hash, sig, min(doc_id) AS rep,
               list(doc_id ORDER BY doc_id) AS members
        FROM bu GROUP BY band, band_hash, sig),
bct AS (SELECT band, band_hash, count(*) AS r
        FROM cls GROUP BY band, band_hash),
stars AS (SELECT c.rep AS a, u.m AS b
          FROM cls c, unnest(c.members) u(m)
          WHERE c.band = 0 AND u.m <> c.rep),
reppairs AS (
  SELECT c1.rep AS a, c2.rep AS b
  FROM cls c1 JOIN cls c2 ON c2.band = c1.band
       AND c2.band_hash = c1.band_hash AND c1.rep < c2.rep
  JOIN bct ON bct.band = c1.band AND bct.band_hash = c1.band_hash
  WHERE bct.r >= 2 AND bct.r <= 64),
cand AS (SELECT a, b FROM stars UNION ALL SELECT a, b FROM reppairs),
jd AS (SELECT cand.a, cand.b,
              CASE WHEN da.entity_id = db.entity_id THEN 1 ELSE 0 END AS hit
       FROM cand JOIN docs da ON da.doc_id = cand.a
            JOIN docs db ON db.doc_id = cand.b),
mt AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
              CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_true FROM jd),
base AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM docs) AS n,
                (SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT)
                 FROM (SELECT count(*) AS k FROM docs
                       GROUP BY entity_id)) AS n_truth)
SELECT base.n AS n_aliases,
       base.n_truth AS n_truth_pairs,
       mt.n_cand AS n_candidates,
       mt.n_true AS n_true_candidates,
       CASE WHEN base.n_truth > 0
            THEN round(mt.n_true / base.n_truth, 6) ELSE 1.0 END
         AS pair_completeness,
       CASE WHEN base.n * (base.n - 1) // 2 > 0
            THEN round(1.0 - mt.n_cand / (base.n * (base.n - 1) // 2), 6)
            ELSE 1.0 END AS reduction_ratio
FROM base, mt
"""



# PQ ANN twin: per-subspace Lloyd codebooks (one recursion over
# (subspace, cell) with 16-dim slices of the hash-ordered sample —
# same init/iteration rules as _kmeans_cte_sql), ADC lookup tables
# from the normalized query, per-vector code assignment by direct
# squared distance, approx = table-sum / sqrt(codeword-norm-sum) on
# the 9dp grid (the engine's r5 block-invariant global shortlist
# grid), exact-cosine rerank of the 40 survivors on the 6dp grid.
_PQ_SQL = f"""
WITH RECURSIVE
allv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
hs AS (SELECT vec_id, emb,
              CAST(CASE WHEN h >= 9223372036854775808
                   THEN CAST(h AS HUGEINT) - 18446744073709551616
                   ELSE CAST(h AS HUGEINT) END AS BIGINT) AS hsig
       FROM (
         SELECT vec_id, emb, z AS h0, h FROM (
           WITH s0 AS (SELECT vec_id, emb,
                        xor(CAST(vec_id AS UBIGINT), CAST(42405 AS UBIGINT))
                          AS z FROM allv),
           {_sm64_chain_sql('pqs', 'vec_id, emb', 's0')}
           SELECT vec_id, emb, CAST(0 AS UBIGINT) AS z, h FROM pqsf
         )
       )),
samp AS (SELECT vec_id, emb,
                row_number() OVER (ORDER BY hsig) AS rn
         FROM hs ORDER BY hsig LIMIT 4096),
km AS (
  SELECT 0 AS it, mm.m, s.rn - 1 AS cell,
         (s.emb)[mm.m * 16 + 1 : (mm.m + 1) * 16] AS cent
  FROM samp s, (SELECT unnest([0, 1, 2, 3]) AS m) mm
  WHERE s.rn <= 16
  UNION ALL
  SELECT p.it + 1, p.m, p.cell, coalesce(nc.cent, p.cent)
  FROM km p LEFT JOIN (
    SELECT m, cell, list(v ORDER BY dim) AS cent FROM (
      SELECT a.m, a.cell, d.dim, avg(a.sub[CAST(d.dim AS INT)]) AS v
      FROM (
        SELECT mm2.m, (s.emb)[mm2.m * 16 + 1 : (mm2.m + 1) * 16] AS sub,
               (SELECT q.cell FROM km q WHERE q.m = mm2.m
                ORDER BY list_distance(
                  (s.emb)[mm2.m * 16 + 1 : (mm2.m + 1) * 16], q.cent) ASC,
                  q.cell ASC
                LIMIT 1) AS cell
        FROM samp s, (SELECT unnest([0, 1, 2, 3]) AS m) mm2) a,
        unnest(range(1, 17)) d(dim)
      GROUP BY a.m, a.cell, d.dim)
    GROUP BY m, cell) nc ON nc.m = p.m AND nc.cell = p.cell
  WHERE p.it < 10
),
books AS (SELECT m, cell, cent FROM km WHERE it = 10),
qq AS (SELECT CAST(embedding AS DOUBLE[]) AS qe,
              greatest(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))),
                       1e-12) AS qd
       FROM embeddings WHERE vec_id = 0),
qn AS (SELECT list_transform(qe, x -> x / qd) AS v FROM qq),
tb AS (SELECT b.m, b.cell,
              list_dot_product(b.cent, (qn.v)[b.m * 16 + 1 : (b.m + 1) * 16])
                AS t,
              list_dot_product(b.cent, b.cent) AS nrm
       FROM books b, qn),
enc AS (
  SELECT a.vec_id, mm.m,
         (SELECT b.cell FROM books b WHERE b.m = mm.m
          ORDER BY list_distance(
            (a.emb)[mm.m * 16 + 1 : (mm.m + 1) * 16], b.cent) ASC,
            b.cell ASC
          LIMIT 1) AS cell
  FROM allv a, (SELECT unnest([0, 1, 2, 3]) AS m) mm),
ap AS (
  SELECT e.vec_id,
         round(sum(tb.t) / sqrt(greatest(sum(tb.nrm), 1e-12)), 9) AS approx
  FROM enc e JOIN tb ON tb.m = e.m AND tb.cell = e.cell
  GROUP BY e.vec_id),
short AS (SELECT ap.vec_id FROM ap
          ORDER BY ap.approx DESC, ap.vec_id LIMIT 40),
ex AS (
  SELECT a.vec_id,
         round(list_dot_product(a.emb, qn.v)
           / (CASE WHEN sqrt(list_dot_product(a.emb, a.emb)) = 0.0
              THEN 1e-12 ELSE sqrt(list_dot_product(a.emb, a.emb)) END), 6)
           AS score
  FROM allv a, qn WHERE a.vec_id IN (SELECT vec_id FROM short))
SELECT vec_id, score FROM ex
ORDER BY score DESC, vec_id LIMIT 10
"""



# Composite curation twin — assembled from the proven stage twins:
# quality/length gate on the 6dp-rounded score (the engine filters on
# the ROUNDED value), exact text dedup to the min doc_id, near-dup
# groups via exact distinct-4-gram Jaccard >= 0.9 + transitive
# closure (the banding stage is recall-lossless at this threshold —
# the same contract the near_dup_docs twin has pinned since r4),
# representatives = group minima, then 32-char-window benchmark
# decontamination against the raw doc_id % 29 == 0 rows.
_CURATE_SQL = """
WITH RECURSIVE
sig AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
         round((least(len(regexp_extract_all(text, '[A-Za-z0-9_]+')), 500)
                / 500.0) * 0.5
             + (1.0 - least(greatest(
                 len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
                 / (CASE WHEN length(text) = 0 THEN 1
                    ELSE length(text) END), 0.0), 1.0)) * 0.2
             + least(greatest(
                 len(regexp_extract_all(lower(text),
                     '\\b(?:a|and|for|in|is|it|of|the|to|with)\\b')) * 1.0
                 / (CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9_]+')) = 0
                    THEN 1
                    ELSE len(regexp_extract_all(text, '[A-Za-z0-9_]+')) END),
                 0.0), 1.0) * 0.3, 6) AS quality
  FROM documents),
kept AS (SELECT * FROM sig WHERE quality >= 0.2 AND n_tokens >= 10),
ded AS (SELECT k.* FROM kept k
        WHERE k.doc_id = (SELECT min(k2.doc_id) FROM kept k2
                          WHERE k2.text = k.text)),
sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 4) AS g
       FROM ded, LATERAL unnest(range(1, greatest(length(text) - 2, 2))) t(i)),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
prs AS (
  SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS inter
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
good AS (
  SELECT u, v FROM prs
  JOIN sz su ON su.doc_id = prs.u JOIN sz sv ON sv.doc_id = prs.v
  WHERE inter * 1.0 / (su.n + sv.n - inter) >= 0.9),
edges2 AS (SELECT u, v FROM good UNION SELECT v, u FROM good),
reach AS (
  SELECT u AS s, v AS d FROM edges2
  UNION
  SELECT r.s, e.v FROM reach r JOIN edges2 e ON r.d = e.u),
uniq AS (
  SELECT ded.* FROM ded
  WHERE ded.doc_id = least(ded.doc_id,
    coalesce((SELECT min(r.d) FROM reach r WHERE r.s = ded.doc_id),
             ded.doc_id))),
bw AS (SELECT DISTINCT substr(text, CAST(i AS INT), 32) AS g
       FROM documents,
            LATERAL unnest(range(1, greatest(length(text) - 30, 2))) t(i)
       WHERE doc_id % 29 = 0),
uw AS (SELECT DISTINCT u.doc_id, substr(u.text, CAST(i AS INT), 32) AS g
       FROM uniq u,
            LATERAL unnest(range(1, greatest(length(u.text) - 30, 2))) t(i)),
bad AS (SELECT DISTINCT uw.doc_id FROM uw JOIN bw USING (g))
SELECT u.doc_id, CAST(u.n_tokens AS BIGINT) AS n_tokens, u.quality
FROM uniq u WHERE u.doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY u.doc_id
"""



# Personalized PageRank twin: teleport (and dangling mass) return to
# the uniform distribution over the three lowest entity ids, per-step
# op order (1-d)*p + d*(agg + dang*p) exactly as the engine's
# vectorized update.
_KG_PPR_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_ppr_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_ppr/*.parquet')),
sd AS (SELECT id FROM n0 ORDER BY id LIMIT 3),
deg AS (SELECT n0.id,
               CAST(coalesce(d.c, 0) AS DOUBLE) AS outdeg,
               CASE WHEN n0.id IN (SELECT id FROM sd)
                    THEN 1.0 / (SELECT count(*) FROM sd) ELSE 0.0 END AS pv
        FROM n0 LEFT JOIN (SELECT s, count(*) AS c FROM e GROUP BY s) d
        ON d.s = n0.id),
pr AS (
  SELECT 0 AS it, id, outdeg, pv, pv AS r FROM deg
  UNION ALL
  SELECT p.it + 1, p.id, p.outdeg, p.pv,
         (1.0 - 0.85) * p.pv
         + 0.85 * (
             coalesce((SELECT sum(q.r / (CASE WHEN q.outdeg > 0.0
                                          THEN q.outdeg ELSE 1.0 END))
                       FROM pr q JOIN e ON e.s = q.id
                       WHERE e.t = p.id), 0.0)
             + (SELECT coalesce(sum(q.r), 0.0) FROM pr q
                WHERE q.outdeg = 0.0) * p.pv)
  FROM pr p WHERE p.it < 15
)
SELECT id AS node_id, round(r, 8) AS rank
FROM pr WHERE it = 15
ORDER BY round(r, 8) DESC, id LIMIT 20
"""


# Weighted PageRank twin — same recursion shape as _KG_PAGERANK_SQL
# with per-edge weight w = max(coalesce(conf, 0), 0) (the engine's
# nan_to_num + clamp), weighted out-degree, per-edge term w * (r/wout).
_KG_PAGERANK_WEIGHTED_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id FROM
       read_parquet('{_ORACLE_INPUT_ROOT}/kg_pagerank_weighted_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t,
             greatest(coalesce(conf, 0.0), 0.0) AS w
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_pagerank_weighted/*.parquet')),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n0),
deg AS (SELECT n0.id, CAST(coalesce(d.c, 0.0) AS DOUBLE) AS wout
        FROM n0 LEFT JOIN (SELECT s, sum(w) AS c FROM e GROUP BY s) d
        ON d.s = n0.id),
pr AS (
  SELECT 0 AS it, id, wout, 1.0 / (SELECT nn FROM meta) AS r FROM deg
  UNION ALL
  SELECT p.it + 1, p.id, p.wout,
         (1.0 - 0.85) / (SELECT nn FROM meta)
         + 0.85 * (
             coalesce((SELECT sum(e.w * (q.r / (CASE WHEN q.wout > 0.0
                                          THEN q.wout ELSE 1.0 END)))
                       FROM pr q JOIN e ON e.s = q.id
                       WHERE e.t = p.id), 0.0)
             + (SELECT coalesce(sum(q.r), 0.0) FROM pr q
                WHERE q.wout = 0.0) / (SELECT nn FROM meta))
  FROM pr p WHERE p.it < 15
)
SELECT id AS node_id, round(r, 6) AS rank
FROM pr WHERE it = 15
ORDER BY round(r, 6) DESC, id LIMIT 20
"""


# PageRank + GraphSAGE-style neighborhood mean: the engine's
# neighbor_aggregate(direction='both', include_self=True) counts edge
# MULTIPLICITY in both directions (a self-loop contributes twice),
# then (sum + own) / (count + 1).
_KG_SMOOTHED_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_smoothed_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_smoothed/*.parquet')),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n0),
deg AS (SELECT n0.id, CAST(coalesce(d.c, 0) AS DOUBLE) AS outdeg
        FROM n0 LEFT JOIN (SELECT s, count(*) AS c FROM e GROUP BY s) d
        ON d.s = n0.id),
pr AS (
  SELECT 0 AS it, id, outdeg, 1.0 / (SELECT nn FROM meta) AS r FROM deg
  UNION ALL
  SELECT p.it + 1, p.id, p.outdeg,
         (1.0 - 0.85) / (SELECT nn FROM meta)
         + 0.85 * (
             coalesce((SELECT sum(q.r / (CASE WHEN q.outdeg > 0.0
                                          THEN q.outdeg ELSE 1.0 END))
                       FROM pr q JOIN e ON e.s = q.id
                       WHERE e.t = p.id), 0.0)
             + (SELECT coalesce(sum(q.r), 0.0) FROM pr q
                WHERE q.outdeg = 0.0) / (SELECT nn FROM meta))
  FROM pr p WHERE p.it < 15
),
fin AS (SELECT id, r FROM pr WHERE it = 15),
und AS (SELECT s AS v, t AS u FROM e UNION ALL SELECT t AS v, s AS u FROM e),
agg AS (
  SELECT und.v, count(*) AS c, sum(f.r) AS acc
  FROM und JOIN fin f ON f.id = und.u GROUP BY und.v
)
SELECT fin.id AS node_id, round(fin.r, 6) AS rank,
       round((coalesce(agg.acc, 0.0) + fin.r)
             / (coalesce(agg.c, 0) + 1.0), 6) AS smoothed_rank
FROM fin LEFT JOIN agg ON agg.v = fin.id
ORDER BY round((coalesce(agg.acc, 0.0) + fin.r)
               / (coalesce(agg.c, 0) + 1.0), 6) DESC, fin.id
LIMIT 20
"""


# HITS twin: 30 half-steps, one per recursion level — even steps
# update authority from hubs (L2-normalized), odd steps update hubs
# from the fresh authorities; multi-edges count multiplicity. The L2
# norm is recomputed per level as sqrt(sum(x*x)).
_KG_HITS_SQL = f"""
WITH RECURSIVE
n0 AS (SELECT entity_id AS id
       FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_hits_nodes/*.parquet')),
e AS (SELECT subj_id AS s, obj_id AS t
      FROM read_parquet('{_ORACLE_INPUT_ROOT}/kg_hits/*.parquet')),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n0),
hh AS (
  SELECT 0 AS st, id,
         1.0 / sqrt((SELECT nn FROM meta)) AS auth,
         1.0 / sqrt((SELECT nn FROM meta)) AS hub
  FROM n0
  UNION ALL
  SELECT p.st + 1, p.id,
    CASE WHEN p.st % 2 = 0 THEN
      (SELECT coalesce(sum(q.hub), 0.0)
       FROM hh q JOIN e ON e.s = q.id WHERE e.t = p.id)
      / (CASE WHEN (SELECT sqrt(sum(
             (SELECT coalesce(sum(q2.hub), 0.0)
              FROM hh q2 JOIN e ON e.s = q2.id WHERE e.t = x.id)
             * (SELECT coalesce(sum(q3.hub), 0.0)
                FROM hh q3 JOIN e ON e.s = q3.id WHERE e.t = x.id)))
           FROM hh x) > 0.0
         THEN (SELECT sqrt(sum(
             (SELECT coalesce(sum(q2.hub), 0.0)
              FROM hh q2 JOIN e ON e.s = q2.id WHERE e.t = x.id)
             * (SELECT coalesce(sum(q3.hub), 0.0)
                FROM hh q3 JOIN e ON e.s = q3.id WHERE e.t = x.id)))
           FROM hh x) ELSE 1.0 END)
    ELSE p.auth END,
    CASE WHEN p.st % 2 = 0 THEN p.hub
    ELSE
      (SELECT coalesce(sum(q.auth), 0.0)
       FROM hh q JOIN e ON e.t = q.id WHERE e.s = p.id)
      / (CASE WHEN (SELECT sqrt(sum(
             (SELECT coalesce(sum(q2.auth), 0.0)
              FROM hh q2 JOIN e ON e.t = q2.id WHERE e.s = x.id)
             * (SELECT coalesce(sum(q3.auth), 0.0)
                FROM hh q3 JOIN e ON e.t = q3.id WHERE e.s = x.id)))
           FROM hh x) > 0.0
         THEN (SELECT sqrt(sum(
             (SELECT coalesce(sum(q2.auth), 0.0)
              FROM hh q2 JOIN e ON e.t = q2.id WHERE e.s = x.id)
             * (SELECT coalesce(sum(q3.auth), 0.0)
                FROM hh q3 JOIN e ON e.t = q3.id WHERE e.s = x.id)))
           FROM hh x) ELSE 1.0 END)
    END
  FROM hh p WHERE p.st < 30
)
SELECT id AS node, round(auth, 8) AS authority, round(hub, 8) AS hub
FROM hh WHERE st = 30
ORDER BY round(auth, 8) DESC, id LIMIT 20
"""


ORACLE_SQL = {
    "cms_token_estimates": _CMS_TOKEN_ESTIMATES_SQL,
    "sketch_union_token_counts": _SKETCH_UNION_TOKENS_SQL,
    "ewma_user_value": _EWMA_USER_VALUE_SQL,
    "cusum_event_alarms": _CUSUM_ALARMS_SQL,
    "tokenize_docs": _TOKENIZE_DOCS_SQL,
    "split_docs": _SPLIT_DOCS_SQL,
    "pack_docs": _PACK_DOCS_SQL,
    "bootstrap_mean_event_value": _BOOTSTRAP_MEAN_SQL,
    "kg_pagerank": _KG_PAGERANK_SQL,
    "kg_kcore": _KG_KCORE_SQL,
    "kg_scc": _KG_SCC_SQL,
    "kg_pagerank_weighted": _KG_PAGERANK_WEIGHTED_SQL,
    "kg_smoothed_importance": _KG_SMOOTHED_SQL,
    "kg_hits": _KG_HITS_SQL,
    "kg_random_walks": _KG_RANDOM_WALKS_SQL,
    "kg_ppr": _KG_PPR_SQL,
    "kg_mis": _KG_MIS_SQL,
    "kg_walk_pairs": _KG_WALK_PAIRS_SQL,
    "kg_link_prediction": _KG_LINKPRED_SQL,
    "kg_truss": _KG_TRUSS_SQL,
    "kg_densest": _KG_DENSEST_SQL,
    "kg_communities": _KG_COMMUNITIES_SQL,
    "kg_modularity": _KG_MODULARITY_SQL,
    "kg_diameter": _KG_DIAMETER_SQL,
    "kg_centralities": _KG_CENTRALITIES_SQL,
    "kg_betweenness": _KG_BETWEENNESS_SQL,
    "kg_sweep_community": _KG_SWEEP_SQL,
    "mmr_diverse_neighbors": _MMR_SQL,
    "cluster_embeddings": _CLUSTER_EMB_SQL,
    "ivf_ann_topk": _IVF_SQL,
    "cluster_quality_embeddings": _CLUSTER_QUALITY_SQL,
    "semdedup_embeddings": _SEMDEDUP_SQL,
    "hard_negatives_embeddings": _HARD_NEG_SQL,
    "blocking_quality_aliases": _BLOCKING_QUALITY_SQL,
    "pq_ann_topk": _PQ_SQL,
    "curate_documents": _CURATE_SQL,
    "approx_users_per_type": _APPROX_USERS_SQL,
    "sketch_union_users_by_type": _SKETCH_UNION_USERS_SQL,
    "sketch_union_p90_value": _SKETCH_UNION_P90_SQL,
    "approx_median_price": _APPROX_MEDIAN_SQL,
    "kg_assortativity": _KG_ASSORT_SQL,
    "kg_local_clustering": _KG_LCC_SQL,
    "kg_triangles": _KG_TRIANGLES_SQL,
    "kg_khop": _KG_KHOP_SQL,
    "near_dup_against_docs": _NEAR_DUP_AGAINST_SQL,
    "decontaminate_docs": _DECONTAMINATE_SQL,
    "url_blocklist_pages": _URL_BLOCKLIST_SQL,
    "fingerprint_docs": _FINGERPRINT_DOCS_SQL,
    "langid_docs": _LANGID_DOCS_SQL,
    "quality_docs": _QUALITY_DOCS_SQL,
    "simhash_docs": _SIMHASH_DOCS_SQL,
    "simhash_near_dup": _SIMHASH_NEAR_DUP_SQL,
    "near_dup_docs": _NEAR_DUP_LABELS_SQL,
    "ngram_jaccard_dup": _NEAR_DUP_LABELS_SQL,
    "embed_near_dup": _EMBED_NEAR_DUP_SQL,
    "kg_pred_stats": _KG_PRED_STATS_SQL,
    "kg_functional_violations": _KG_FUNCTIONAL_VIOLATIONS_SQL,
    "page_domain_stats": _PAGE_DOMAIN_STATS_SQL,
    "kg_degree_stats": _KG_DEGREE_STATS_SQL,
    "canonical_url_dedup": _CANONICAL_URL_DEDUP_SQL,
    "dup_rate_by_source": _DUP_RATE_BY_SOURCE_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_local_supplier": _Q5_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q4_late_shipments": _Q4_SQL,
    "q10_returned_revenue": _Q10_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q18_large_orders": _Q18_SQL,
    "asof_last_order": _ASOF_SQL,
    "range_join_events": _RANGE_JOIN_SQL,
    "filter_project_events": _FILTER_PROJECT_SQL,
    "range_scan_events": _RANGE_SCAN_EVENTS_SQL,
    "zorder_scan_events": _ZORDER_SCAN_SQL,
    "psi_event_drift": _PSI_EVENT_DRIFT_SQL,
    "ab_test_events": _AB_TEST_SQL,
    "user_active_coverage": _USER_ACTIVE_COVERAGE_SQL,
    "topk_users_by_value": _TOPK_USERS_SQL,
    "distinct_mktsegment": _DISTINCT_SQL,
    "union_orders": _UNION_SQL,
    "join_customer_orders": _JOIN_CUST_SQL,
    "customers_per_nation": _CUST_PER_NATION_SQL,
    "customers_without_big_orders": _NO_BIG_ORDERS_SQL,
    "hourly_event_stats": _HOURLY_SQL,
    "hopping_event_stats": _HOPPING_SQL,
    "user_sessions": _SESSIONS_SQL,
    "event_type_islands": _ISLANDS_SQL,
    "session_stats": _SESSION_STATS_SQL,
    "rfm_segments": _RFM_SQL,
    "cc_co_ordered_parts": _CC_CO_ORDERED_SQL,
    "assoc_rules_parts": _ASSOC_RULES_SQL,
    "corr_matrix_lineitem": _CORR_MATRIX_SQL,
    "ols_price_by_flag": _OLS_SQL,
    "skyline_parts": _SKYLINE_SQL,
    "nb_source_logodds": _NB_SQL,
    "benford_order_totals": _BENFORD_SQL,
    "keyword_assoc_docs": _KEYWORD_ASSOC_SQL,
    "twap_user_value": _TWAP_SQL,
    "gini_order_value": _GINI_SQL,
    "median_order_value_by_priority": _MEDIAN_RANKED_SQL,
    "p90_price_by_status_exact": _P90_BY_STATUS_SQL,
    "rank_top_orders_by_priority": _RANK_TOP_ORDERS_SQL,
    "shuffle_docs_epoch": _SHUFFLE_EPOCH_SQL,
    "theil_index_order_value": _THEIL_SQL,
    "monthly_revenue_growth": _MONTHLY_GROWTH_SQL,
    "pairwise_agreement_events": _PAIRWISE_AGREEMENT_SQL,
    "user_event_windows": _WINDOWS_SQL,
    "user_value_extrema": _VALUE_EXTREMA_SQL,
    "event_rank_ntile": _RANK_NTILE_SQL,
    "event_prop_k_stats": _PROP_K_SQL,
    "quantity_percentiles": _PCT_RANK_SQL,
    "late_events_flagged": _LATE_EVENTS_SQL,
    "users_per_hour": _USERS_PER_HOUR_SQL,
    "hourly_ohlc": _OHLC_SQL,
    "stratified_sample_events": _STRATIFIED_SQL,
    "top_events_per_user": _TOP_PER_USER_SQL,
    "search_docs": _SEARCH_SQL,
    "bm25_search_docs": _BM25_SQL,
    "rrf_hybrid_search_docs": _RRF_HYBRID_SQL,
    "median_price_by_priority": _MEDIAN_PRICE_SQL,
    "p90_event_value_by_type": _P90_EVENT_SQL,
    "lineitem_moments": _LINEITEM_MOMENTS_SQL,
    "shape_stats_by_flag": _SHAPE_STATS_SQL,
    "tfidf_top_terms_docs": _TFIDF_TOP_TERMS_SQL,
    "inverted_index_docs": _INVERTED_INDEX_SQL,
    "doc_bigram_nll": _DOC_BIGRAM_NLL_SQL,
    "event_type_pivot": _EVENT_PIVOT_SQL,
    "order_count_distribution": _ORDER_COUNT_DIST_SQL,
    "mode_priority_by_status": _MODE_PRIORITY_SQL,
    "priorities_per_status": _PRIORITIES_PER_STATUS_SQL,
    "top_tokens_docs": _TOP_TOKENS_SQL,
    "top_bigrams_docs": _TOP_BIGRAMS_SQL,
    "approx_top_tokens_docs": _TOP_TOKENS_SQL,
    "doc_unigram_nll": _UNIGRAM_NLL_SQL,
    "hot_users_events": _HOT_USERS_SQL,
    "skew_salted_join_events": _SKEW_SALTED_JOIN_SQL,
    "auto_skew_join_events": _SKEW_SALTED_JOIN_SQL,
    "event_transitions": _TRANSITIONS_SQL,
    "user_retention_cohorts": _RETENTION_SQL,
    "event_value_time_window": _TIME_WINDOW_SQL,
    "zscore_event_values": _ZSCORE_SQL,
    "wavg_price_by_flag": _WAVG_SQL,
    "regr_price_by_flag": _REGR_SQL,
    "event_user_entropy": _EVENT_ENTROPY_SQL,
    "robust_zscore_events": _ROBUST_Z_SQL,
    "dedup_segments_docs": _DEDUP_SEGMENTS_SQL,
    "strip_boilerplate_docs": _STRIP_BOILERPLATE_SQL,
    "global_dedup_segments_docs": _GLOBAL_DEDUP_SEGMENTS_SQL,
    "dedup_spans_docs": _DEDUP_SPANS_SQL,
    "co_ordered_parts": _CO_ORDERED_PARTS_SQL,
    "audience_overlap_events": _AUDIENCE_OVERLAP_SQL,
    "iqr_outliers_by_type": _IQR_OUTLIERS_SQL,
    "user_state_history": _USER_STATE_HISTORY_SQL,
    "event_gap_stats": _EVENT_GAP_STATS_SQL,
    "events_point_in_time": _EVENTS_POINT_IN_TIME_SQL,
    "mi_type_dow_events": _MI_TYPE_DOW_SQL,
    "debounced_events": _DEBOUNCED_EVENTS_SQL,
    "validate_orders": _VALIDATE_ORDERS_SQL,
    "profile_events": _PROFILE_EVENTS_SQL,
    "validate_lineitem_fk": _VALIDATE_LINEITEM_FK_SQL,
    "k_anonymous_events": _K_ANONYMOUS_SQL,
    "incremental_event_stats": _INCREMENTAL_EVENT_STATS_SQL,
    "user_feature_snapshot": _USER_FEATURE_SNAPSHOT_SQL,
    "cdc_orders_state": _CDC_ORDERS_STATE_SQL,
    "balanced_sample_docs": _BALANCED_SAMPLE_SQL,
    "token_budget_mixture_docs": _TOKEN_BUDGET_MIXTURE_SQL,
    "rolling_median_value": _ROLLING_MEDIAN_SQL,
    "event_trigram_sequences": _EVENT_TRIGRAMS_SQL,
    "bcubed_docs": _BCUBED_DOCS_SQL,
    "bucketed_join_revenue": _BUCKETED_JOIN_REVENUE_SQL,
    "source_token_kl": _SOURCE_TOKEN_KL_SQL,
    "dsir_select_docs": _DSIR_SELECT_SQL,
    "unpivot_lineitem_stats": _UNPIVOT_SQL,
    "weighted_sample_events": _WEIGHTED_SAMPLE_SQL,
    "gap_fill_hourly_events": _GAP_FILL_SQL,
    "knn_multi_topk": _KNN_MULTI_SQL,
    "scenario_revenue": _SCENARIO_REVENUE_SQL,
    "c4_clean_docs": _C4_CLEAN_SQL,
    "ccnet_bucket_sample_docs": _CCNET_BUCKET_SQL,
    "winsorized_event_stats": _WINSORIZE_SQL,
    "fuzzy_name_pairs": _FUZZY_PAIRS_SQL,
    "gopher_rules_docs": _GOPHER_RULES_SQL,
    "pmi_collocations_docs": _PMI_SQL,
    "zipf_alpha_docs": _ZIPF_ALPHA_SQL,
    "lexical_diversity_docs": _LEXICAL_DIVERSITY_SQL,
    "readability_docs": _READABILITY_SQL,
    "orders_by_dow": _ORDERS_DOW_SQL,
    "event_value_histogram": _EVENT_HIST_SQL,
    "intersect_orders": _INTERSECT_SQL,
    "intersect_all_parts": _INTERSECT_ALL_SQL,
    "except_all_parts": _EXCEPT_ALL_SQL,
    "except_orders": _EXCEPT_SQL,
    "sample_events_per_user": _SAMPLE_PER_USER_SQL,
    "normalize_docs": _NORMALIZE_SQL,
    "chunk_docs": _CHUNK_DOCS_SQL,
    "repetition_docs": _REPETITION_SQL,
    "redact_pii_docs": _REDACT_PII_SQL,
    "dedup_incremental_docs": _DEDUP_INCREMENTAL_SQL,
    "funnel_view_click_purchase": _FUNNEL_SQL,
    "rollup_order_totals": _ROLLUP_SQL,
    "grouping_sets_orders": _GROUPING_SETS_SQL,
    "upsert_orders": _UPSERT_SQL,
    "quantity_buckets": _QUANTITY_BUCKETS_SQL,
    "mad_quantity_by_flag": _MAD_SQL,
    "price_means_by_priority": _PRICE_MEANS_SQL,
    "diff_order_snapshots": _DIFF_SQL,
    "cube_order_totals": _CUBE_SQL,
    "top_order_per_customer": _ARGMAX_SQL,
    "urgent_customers_bloom": _URGENT_CUST_BLOOM_SQL,
    "dedup_exact_docs": _DEDUP_EXACT_SQL,
    "token_count_docs": _TOKEN_COUNT_SQL,
    "doc_stats_by_lang": _DOC_STATS_SQL,
    "knn_cosine_topk": _KNN_SQL,
    "label_norms": _LABEL_NORMS_SQL,
    "label_centroids": _LABEL_CENTROIDS_SQL,
    "unnest_embeddings": _UNNEST_SQL,
    # near_dup_docs / simhash / langid / quality / fingerprint / ivf_ann /
    # kg_* / image_features: non-SQL-expressible -> rows-only driver check;
    # full oracles live in tests/.
    **TPCH_ORACLE_SQL,
}
