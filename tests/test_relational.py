"""Relational layer vs duckdb oracles at sf0.001 (the driver's own gate is
scripts/check_oracle.py; these are the in-repo equivalents for a few ops
plus properties the driver doesn't cover)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from kgraft.relational import (
    bucketed_groupby_apply,
    distinct,
    hash_join,
    pre_aggregate,
    read_table,
    semi_anti_join,
    top_k,
)

from tests.conftest import SF_DIR


def _duck(sql):
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "events"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).df()


def test_pre_aggregate_matches_duckdb(ray_session):
    got = pre_aggregate(
        read_table(SF_DIR, "orders", columns=["o_orderpriority", "o_totalprice"]),
        ["o_orderpriority"],
        {
            "n": (None, "count"),
            "total": ("o_totalprice", "sum"),
            "avg_price": ("o_totalprice", "mean"),
            "max_price": ("o_totalprice", "max"),
            "min_price": ("o_totalprice", "min"),
        },
    ).sort_values("o_orderpriority").reset_index(drop=True)
    want = _duck(
        """SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total,
                  avg(o_totalprice) AS avg_price, max(o_totalprice) AS max_price,
                  min(o_totalprice) AS min_price
           FROM orders GROUP BY 1 ORDER BY 1"""
    )
    assert got["o_orderpriority"].tolist() == want["o_orderpriority"].tolist()
    assert got["n"].tolist() == want["n"].tolist()
    for c in ("total", "avg_price", "max_price", "min_price"):
        np.testing.assert_allclose(got[c], want[c], rtol=1e-9)


def test_hash_join_matches_duckdb(ray_session):
    import ray

    orders = read_table(SF_DIR, "orders", columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda df: df.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    cust = read_table(SF_DIR, "customer", columns=["c_custkey", "c_acctbal"])
    got = (
        hash_join(orders, cust, on="c_custkey")
        .to_pandas()
        .sort_values(["c_custkey", "o_totalprice"])
        .reset_index(drop=True)
    )
    want = _duck(
        """SELECT o.o_custkey AS c_custkey, o.o_totalprice, c.c_acctbal
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           ORDER BY 1, 2"""
    )
    np.testing.assert_allclose(got["o_totalprice"], want["o_totalprice"])
    np.testing.assert_allclose(got["c_acctbal"], want["c_acctbal"])


def test_semi_anti_join(ray_session):
    cust = read_table(SF_DIR, "customer", columns=["c_custkey"])
    keys = {1, 2, 3}
    semi = semi_anti_join(cust, keys, "c_custkey").to_pandas()
    anti = semi_anti_join(cust, keys, "c_custkey", anti=True).to_pandas()
    total = len(cust.to_pandas())
    assert set(semi["c_custkey"]) <= keys
    assert len(semi) + len(anti) == total


def test_distinct_and_topk(ray_session):
    got = sorted(
        distinct(
            read_table(SF_DIR, "orders", columns=["o_orderpriority"]),
            "o_orderpriority",
        )
        .to_pandas()["o_orderpriority"]
        .tolist()
    )
    want = sorted(_duck("SELECT DISTINCT o_orderpriority FROM orders")["o_orderpriority"])
    assert got == want

    top = top_k(
        read_table(SF_DIR, "orders", columns=["o_orderkey", "o_totalprice"]),
        "o_totalprice",
        5,
    ).to_pandas()
    want_top = _duck(
        "SELECT o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 5"
    )
    np.testing.assert_allclose(top["o_totalprice"], want_top["o_totalprice"])


def test_bucketed_groupby_colocates_keys(ray_session):
    """Every row of a key must land in exactly one bucket group."""
    import ray

    df = pd.DataFrame({"k": np.arange(1000) % 37, "v": np.arange(1000)})
    ds = ray.data.from_pandas(df).repartition(8)
    out = bucketed_groupby_apply(
        ds, "k", lambda g: g.groupby("k", as_index=False)["v"].sum(), num_buckets=16
    ).to_pandas()
    want = df.groupby("k", as_index=False)["v"].sum()
    merged = out.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, want, check_dtype=False)


def test_asof_join_matches_pandas(ray_session):
    """Bucketed distributed as-of join == single-node pandas merge_asof."""
    import ray

    from kgraft.relational import asof_join

    rng = np.random.RandomState(4)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 10, 200),
            "t": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.randint(0, 10000, 200), unit="m"),
            "lv": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 10, 80),
            "t2": pd.to_datetime("2020-01-01")
            + pd.to_timedelta(rng.randint(0, 10000, 80), unit="m"),
            "rv": np.arange(80) * 10,
        }
    ).drop_duplicates(["k", "t2"])
    got = (
        asof_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="k",
            left_on="t",
            right_on="t2",
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t2"),
        left_on="t",
        right_on="t2",
        by="k",
        direction="backward",
    ).sort_values("lv").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), want["rv"].astype("float64"), check_names=False
    )


def test_windowed_matches_pandas_oracle():
    import ray

    from kgraft.relational import windowed

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "pid": rng.randint(0, 23, 400),
            "ord": rng.permutation(400),
            "v": rng.rand(400) * 100,
        }
    )
    got = (
        windowed(
            ray.data.from_pandas(df.sample(frac=1, random_state=1)),
            part_keys="pid",
            order_keys="ord",
            specs={
                "rn": ("row_number", None),
                "prev": ("lag", "v", 1),
                "run": ("cumsum", "v"),
                "m3": ("rolling_mean", "v", 3),
            },
            num_buckets=8,
        )
        .to_pandas()
        .sort_values(["pid", "ord"])
        .reset_index(drop=True)
    )
    want = df.sort_values(["pid", "ord"]).reset_index(drop=True)
    g = want.groupby("pid", sort=False)
    want["rn"] = (g.cumcount() + 1).astype("int64")
    want["prev"] = g["v"].shift(1).fillna(0.0)
    want["run"] = g["v"].cumsum()
    want["m3"] = g["v"].rolling(3, min_periods=1).mean().reset_index(drop=True).to_numpy()
    for c in ("rn", "prev", "run", "m3"):
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=1e-12)


def test_grouped_quantile_disc_matches_duckdb():
    import ray

    from kgraft.relational import grouped_quantile_disc

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 7, 500),
            # duplicate-heavy values exercise the histogram combine
            "v": rng.randint(0, 40, 500).astype("float64"),
        }
    )
    for q in (0.25, 0.5, 0.9):
        got = (
            grouped_quantile_disc(ray.data.from_pandas(df), "k", "v", q=q, num_buckets=8)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            f"SELECT k, quantile_disc(v, {q}) AS vq FROM df GROUP BY k ORDER BY k"
        ).df()
        np.testing.assert_allclose(got.iloc[:, 1].to_numpy(), want["vq"].to_numpy())


def test_stratified_sample_deterministic_under_repartition():
    import ray

    from kgraft.relational import stratified_sample

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "id": np.arange(4000, dtype="int64"),
            "stratum": rng.choice(["a", "b", "c"], 4000),
        }
    )
    rates = {"a": 0.5, "b": 0.1}
    got1 = (
        stratified_sample(ray.data.from_pandas(df), "stratum", "id", rates, 0.02)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    # same decisions regardless of block layout (resume/repartition safety)
    got2 = (
        stratified_sample(
            ray.data.from_pandas(df).repartition(13), "stratum", "id", rates, 0.02
        )
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got1, got2)
    # rates land near nominal (hash uniformity sanity)
    frac_a = (got1["stratum"] == "a").sum() / (df["stratum"] == "a").sum()
    assert 0.4 < frac_a < 0.6
    frac_b = (got1["stratum"] == "b").sum() / (df["stratum"] == "b").sum()
    assert 0.05 < frac_b < 0.16


def test_moments_match_duckdb(ray_session):
    import ray

    from kgraft.relational import pre_aggregate

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], 3000),
            "x": rng.normal(10, 3, 3000),
            "y": rng.normal(5, 2, 3000),
        }
    )
    # plant nulls: var/corr must use non-null (pairwise) counts
    df.loc[df.index % 7 == 0, "x"] = np.nan
    df.loc[df.index % 11 == 0, "y"] = np.nan
    got = (
        pre_aggregate(
            ray.data.from_pandas(df).repartition(9),
            ["k"],
            {
                "sd": ("x", "std"),
                "vr": ("x", "var"),
                "cr": (("x", "y"), "corr"),
                "cv": (("x", "y"), "covar"),
                "sk": ("x", "skew"),
                "ku": ("x", "kurt"),
            },
        )
        .sort_values("k", ignore_index=True)
    )
    want = duckdb.sql(
        "SELECT k, stddev_samp(x) sd, var_samp(x) vr, corr(x, y) cr, "
        "covar_samp(x, y) cv, skewness(x) sk, kurtosis(x) ku "
        "FROM df GROUP BY k ORDER BY k"
    ).df()
    for c in ("sd", "vr", "cr", "cv"):
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=1e-9)
    for c in ("sk", "ku"):
        # power-sum cancellation: 3rd/4th moments lose a few digits
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=1e-7)


def test_skew_kurt_edge_groups(ray_session):
    """DuckDB NULL semantics at tiny/degenerate groups: skew NULL below
    3 samples or zero variance, kurt NULL below 4 samples."""
    import ray

    from kgraft.relational import pre_aggregate

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "b", "b", "c", "c", "c", "c", "d", "d", "d", "d"],
            "x": [1.0, 2.0, 1.0, 2.0, 4.0, 1.0, 3.0, 9.0, 2.0, 5.0, 5.0, 5.0, 5.0],
        }
    )
    got = (
        pre_aggregate(
            ray.data.from_pandas(df).repartition(3),
            ["k"],
            {"sk": ("x", "skew"), "ku": ("x", "kurt")},
        )
        .sort_values("k", ignore_index=True)
    )
    want = duckdb.sql(
        "SELECT k, skewness(x) sk, kurtosis(x) ku FROM df GROUP BY k ORDER BY k"
    ).df()
    for c in ("sk", "ku"):
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert (np.isnan(g) == np.isnan(w)).all(), (c, g, w)
        np.testing.assert_allclose(g[~np.isnan(g)], w[~np.isnan(w)], rtol=1e-9)


def test_grouped_quantile_cont_matches_duckdb(ray_session):
    import ray

    from kgraft.relational import grouped_quantile_cont

    rng = np.random.RandomState(3)
    for n, q in ((2, 0.5), (7, 0.25), (400, 0.9), (401, 0.5)):
        df = pd.DataFrame(
            {
                "k": np.repeat(["a", "b"], n),
                "v": np.concatenate([rng.uniform(0, 100, n), rng.uniform(-5, 5, n)]),
            }
        )
        got = (
            grouped_quantile_cont(ray.data.from_pandas(df), "k", "v", q=q, out_col="vq")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = duckdb.sql(
            f"SELECT k, quantile_cont(v, {q}) AS vq FROM df GROUP BY k ORDER BY k"
        ).df()
        np.testing.assert_allclose(got["vq"].to_numpy(), want["vq"].to_numpy())


def test_pivot_sum_matches_duckdb(ray_session):
    import ray

    from kgraft.relational import pivot_sum

    rng = np.random.RandomState(8)
    df = pd.DataFrame(
        {
            "u": rng.randint(0, 40, 5000),
            "t": rng.choice(["p", "q", "r"], 5000),
            "v": rng.uniform(0, 10, 5000),
        }
    )
    got = (
        pivot_sum(ray.data.from_pandas(df).repartition(7), "u", "t", "v", ["p", "q", "r"])
        .to_pandas()
        .sort_values("u", ignore_index=True)
    )
    want = duckdb.sql(
        "SELECT u, sum(CASE WHEN t='p' THEN v ELSE 0 END) p, "
        "sum(CASE WHEN t='q' THEN v ELSE 0 END) q, "
        "sum(CASE WHEN t='r' THEN v ELSE 0 END) r FROM df GROUP BY u ORDER BY u"
    ).df()
    got["u"] = got["u"].astype(want["u"].dtype)
    for c in ("p", "q", "r"):
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), rtol=1e-9)


def test_hll_within_error_bound(ray_session):
    import ray

    from kgraft.relational import grouped_approx_count_distinct

    rng = np.random.RandomState(17)
    # two regimes: linear-counting (small n << m) and HLL (n >> m=4096)
    df = pd.DataFrame(
        {
            "k": np.repeat(["small", "big"], 60000),
            "v": np.concatenate(
                [
                    rng.randint(0, 300, 60000),  # ~300 distinct
                    rng.randint(0, 10**9, 60000),  # ~60k distinct (dups rare)
                ]
            ),
        }
    )
    got = (
        grouped_approx_count_distinct(
            ray.data.from_pandas(df).repartition(11), "k", "v", out_col="nd"
        )
        .to_pandas()
        .set_index("k")["nd"]
    )
    exact = df.groupby("k")["v"].nunique()
    for k in ("small", "big"):
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel < 0.05, (k, got[k], exact[k], rel)
    # partial-merge associativity: block layout must not change the sketch
    got2 = (
        grouped_approx_count_distinct(
            ray.data.from_pandas(df).repartition(3), "k", "v", out_col="nd"
        )
        .to_pandas()
        .set_index("k")["nd"]
    )
    assert got.sort_index().tolist() == got2.sort_index().tolist()


def test_grouped_mode_matches_idiom(ray_session):
    import ray

    from kgraft.relational import grouped_mode

    rng = np.random.RandomState(23)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], 8000),
            "v": rng.choice(list("pqrstu"), 8000),
        }
    )
    got = (
        grouped_mode(ray.data.from_pandas(df).repartition(5), "k", "v", out_col="mv")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = duckdb.sql(
        """SELECT k, v AS mv FROM (
             SELECT k, v, row_number() OVER (
                 PARTITION BY k ORDER BY count(*) DESC, v) rn
             FROM df GROUP BY k, v) WHERE rn = 1 ORDER BY k"""
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_set_ops_match_duckdb(ray_session):
    import ray

    from kgraft.relational import set_op

    rng = np.random.RandomState(29)
    l = pd.DataFrame({"a": rng.randint(0, 50, 900), "b": rng.choice(["x", "y"], 900)})
    r = pd.DataFrame({"a": rng.randint(25, 75, 900), "b": rng.choice(["x", "y"], 900)})
    for op, sql_kw in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        got = (
            set_op(
                ray.data.from_pandas(l).repartition(5),
                ray.data.from_pandas(r).repartition(3),
                ["a", "b"],
                op,
            )
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        want = duckdb.sql(
            f"SELECT a, b FROM l {sql_kw} SELECT a, b FROM r ORDER BY a, b"
        ).df()
        pd.testing.assert_frame_equal(got, want)


def test_sample_k_per_group_deterministic(ray_session):
    import ray

    from kgraft.relational import sample_k_per_group

    rng = np.random.RandomState(31)
    df = pd.DataFrame(
        {"id": np.arange(3000, dtype="int64"), "g": rng.randint(0, 100, 3000)}
    )
    got1 = (
        sample_k_per_group(ray.data.from_pandas(df), "g", "id", k=5)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    got2 = (
        sample_k_per_group(ray.data.from_pandas(df).repartition(17), "g", "id", k=5)
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got1, got2)
    sizes = got1.groupby("g").size()
    assert (sizes <= 5).all() and sizes.max() == 5


def test_funnel_matches_bruteforce(ray_session):
    import ray

    from kgraft.relational import funnel

    rng = np.random.RandomState(37)
    n = 6000
    df = pd.DataFrame(
        {
            "u": rng.randint(0, 200, n),
            "ts": rng.randint(0, 10**6, n).astype("int64"),
            "t": rng.choice(["a", "b", "c", "x"], n, p=[0.3, 0.25, 0.15, 0.3]),
        }
    )
    got = funnel(ray.data.from_pandas(df).repartition(7), "u", "ts", "t", ["a", "b", "c"])
    # brute force, per user sequentially
    n1 = n2 = n3 = 0
    for _, g in df.groupby("u"):
        ta = g.loc[g["t"] == "a", "ts"].min()
        if pd.isna(ta):
            continue
        n1 += 1
        tb = g.loc[(g["t"] == "b") & (g["ts"] >= ta), "ts"].min()
        if pd.isna(tb):
            continue
        n2 += 1
        tc = g.loc[(g["t"] == "c") & (g["ts"] >= tb), "ts"].min()
        if not pd.isna(tc):
            n3 += 1
    assert got.iloc[0].tolist() == [n1, n2, n3]


def test_hash_join_all_hows_match_duckdb(ray_session):
    import ray

    from kgraft.relational import hash_join

    rng = np.random.RandomState(47)
    l = pd.DataFrame(
        {"k": rng.randint(0, 60, 400).astype("int64"), "lv": rng.uniform(0, 1, 400)}
    )
    r = pd.DataFrame(
        {"k": rng.randint(30, 90, 400).astype("int64"), "rv": rng.uniform(0, 1, 400)}
    )
    for how, sql_kw in (
        ("inner", "JOIN"),
        ("left", "LEFT OUTER JOIN"),
        ("right", "RIGHT OUTER JOIN"),
        ("outer", "FULL OUTER JOIN"),
    ):
        got = (
            hash_join(
                ray.data.from_pandas(l).repartition(5),
                ray.data.from_pandas(r).repartition(3),
                on="k",
                how=how,
            )
            .to_pandas()
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        )
        want = (
            duckdb.sql(f"SELECT COALESCE(l.k, r.k) AS k, lv, rv FROM l {sql_kw} r ON l.k = r.k")
            .df()
            .sort_values(["k", "lv", "rv"], ignore_index=True)
        )
        got["k"] = got["k"].astype("int64")
        want["k"] = want["k"].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pre_aggregate_property_random_frames(ray_session):
    """Property test: pre_aggregate == DuckDB on randomized frames with
    nulls, mixed dtypes, and varying block layouts (seeded sweep — a
    full hypothesis engine would re-init Ray per example)."""
    import ray

    from kgraft.relational import pre_aggregate

    for seed in (0, 1, 2, 3, 4):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(1, 4000))
        df = pd.DataFrame(
            {
                "k1": rng.choice(["a", "b", "c", "d", ""], n),
                "k2": rng.randint(0, int(rng.randint(1, 6)), n).astype("int64"),
                "x": rng.normal(0, 100, n),
            }
        )
        df.loc[rng.rand(n) < 0.2, "x"] = np.nan
        # plant an all-null group: SQL SUM/AVG/MIN/MAX there are NULL
        df.loc[df["k1"] == "d", "x"] = np.nan
        got = (
            pre_aggregate(
                ray.data.from_pandas(df).repartition(int(rng.randint(1, 9))),
                ["k1", "k2"],
                {
                    "s": ("x", "sum"),
                    "c": (None, "count"),
                    "mn": ("x", "min"),
                    "mx": ("x", "max"),
                    "av": ("x", "mean"),
                },
            )
            .sort_values(["k1", "k2"], ignore_index=True)
        )
        want = duckdb.sql(
            "SELECT k1, k2, sum(x) s, count(*) c, min(x) mn, max(x) mx, "
            "avg(x) av FROM df GROUP BY k1, k2 ORDER BY k1, k2"
        ).df()
        assert got.shape == want.shape, seed
        for col in ("s", "mn", "mx", "av"):
            np.testing.assert_allclose(
                got[col].to_numpy(), want[col].to_numpy(), rtol=1e-9, err_msg=f"seed={seed} col={col}"
            )
        assert (got["c"].to_numpy() == want["c"].to_numpy()).all(), seed


def test_bloom_semi_join_exact_under_false_positives(ray_session):
    import ray

    from kgraft.relational import bloom_semi_join, semi_anti_join

    rng = np.random.RandomState(53)
    probe = pd.DataFrame(
        {"k": rng.randint(0, 5000, 3000).astype("int64"), "v": rng.rand(3000)}
    )
    keys = pd.DataFrame({"k": rng.randint(0, 5000, 400).astype("int64")})
    # 256-bit bitmap with 400 keys -> saturated, nearly every probe row is
    # a bloom "maybe": the EXACT tier must still produce the true semi join
    got = (
        bloom_semi_join(
            ray.data.from_pandas(probe).repartition(5),
            ray.data.from_pandas(keys).repartition(3),
            on="k",
            num_bits=256,
            num_hashes=2,
        )
        .to_pandas()
        .sort_values(["k", "v"], ignore_index=True)
    )
    want = (
        semi_anti_join(ray.data.from_pandas(probe), keys["k"].tolist(), on="k")
        .to_pandas()
        .sort_values(["k", "v"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])


def test_hll_float_and_null_values(ray_session):
    import ray

    from kgraft.relational import grouped_approx_count_distinct

    rng = np.random.RandomState(61)
    # float values in a narrow range: an integer cast would collapse
    # 50k distinct values onto ~10 buckets (review finding r2)
    vals = rng.uniform(0, 10, 50000)
    df = pd.DataFrame({"k": ["f"] * 50000, "v": vals})
    df.loc[rng.rand(50000) < 0.1, "v"] = np.nan  # NULLs excluded like SQL
    got = (
        grouped_approx_count_distinct(ray.data.from_pandas(df), "k", "v", out_col="nd")
        .to_pandas()
        .set_index("k")["nd"]
    )
    exact = df["v"].dropna().nunique()
    assert abs(got["f"] - exact) / exact < 0.05, (got["f"], exact)


def test_rollup_all_null_group_sum_is_null(ray_session):
    import ray

    from kgraft.relational import rollup_aggregate

    df = pd.DataFrame(
        {
            "k1": ["a", "a", "d", "d"],
            "k2": ["x", "y", "x", "y"],
            "v": [1.0, 2.0, np.nan, np.nan],
        }
    )
    out = rollup_aggregate(
        ray.data.from_pandas(df), ["k1", "k2"], {"s": ("v", "sum"), "n": (None, "count")}
    )
    # the (d, NULL) subtotal and the finest (d, x)/(d, y) rows: SUM of
    # only NULLs is NULL at EVERY rollup level (review finding r2)
    d_sub = out[(out["k1"] == "d") & (out["k2"].isna())]
    assert len(d_sub) == 1 and np.isnan(d_sub["s"].iloc[0])
    grand = out[out["k1"].isna()]
    assert len(grand) == 1 and abs(grand["s"].iloc[0] - 3.0) < 1e-12


def test_rank_dense_ntile_match_duckdb(ray_session):
    import duckdb
    import ray

    from kgraft.relational import windowed

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "pid": rng.randint(0, 9, 300),
            "cat": rng.choice(list("abcd"), 300),  # heavy ties per partition
            "uid": rng.permutation(300),  # unique tiebreak
        }
    )
    for n in (1, 3, 4, 7):
        got = (
            windowed(
                ray.data.from_pandas(df.sample(frac=1, random_state=2)),
                part_keys="pid",
                order_keys=["cat"],
                specs={
                    "rnk": ("rank", None),
                    "drnk": ("dense_rank", None),
                    "tile": ("ntile", None, n),
                    "pr": ("percent_rank", None),
                    "cd": ("cume_dist", None),
                },
                tiebreak=["uid"],
                num_buckets=4,
            )
            .to_pandas()
            .sort_values("uid")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql(
            f"""
            SELECT uid,
                   CAST(rank() OVER (PARTITION BY pid ORDER BY cat) AS BIGINT) AS rnk,
                   CAST(dense_rank() OVER (PARTITION BY pid ORDER BY cat) AS BIGINT) AS drnk,
                   CAST(ntile({n}) OVER (PARTITION BY pid ORDER BY cat, uid) AS BIGINT) AS tile,
                   percent_rank() OVER (PARTITION BY pid ORDER BY cat) AS pr,
                   cume_dist() OVER (PARTITION BY pid ORDER BY cat) AS cd
            FROM t ORDER BY uid
            """
        ).df()
        for c in ("rnk", "drnk", "tile"):
            assert got[c].tolist() == want[c].tolist(), (n, c)
        for c in ("pr", "cd"):
            np.testing.assert_allclose(
                got[c].to_numpy(), want[c].to_numpy(), rtol=1e-12, err_msg=c
            )


def test_cube_matches_duckdb_with_nulls(ray_session):
    import duckdb
    import ray

    from kgraft.relational import cube_aggregate

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "a": rng.choice(list("xy"), 60),
            "b": rng.choice(list("pq"), 60),
            "v": np.where(rng.rand(60) < 0.3, np.nan, rng.rand(60) * 10),
        }
    )
    # one all-NULL group pins the NULL-SUM re-aggregation semantics
    df.loc[df["a"].eq("x") & df["b"].eq("q"), "v"] = np.nan
    got = cube_aggregate(
        ray.data.from_pandas(df), ["a", "b"], {"s": ("v", "sum"), "n": (None, "count")}
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT a, b, sum(v) AS s, count(*) AS n FROM t GROUP BY CUBE(a, b)"
    ).df()

    def norm(d):
        d = d.copy()
        d["s"] = d["s"].round(9)
        d["n"] = d["n"].astype("int64")
        return d.sort_values(["a", "b"], na_position="first").reset_index(drop=True)[
            ["a", "b", "s", "n"]
        ]

    pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)


def test_grouped_approx_quantile_within_relative_error(ray_session):
    import ray

    from kgraft.relational import grouped_approx_quantile

    rng = np.random.RandomState(21)
    alpha = 0.02
    for q in (0.5, 0.9):
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 7, 4000),
                "v": np.exp(rng.randn(4000) * 2.0),  # lognormal, 6+ decades
            }
        )
        got = (
            grouped_approx_quantile(
                ray.data.from_pandas(df), "k", "v", q, alpha=alpha, out_col="aq"
            )
            .to_pandas()
            .set_index("k")["aq"]
        )
        for k, grp in df.groupby("k"):
            vals = np.sort(grp["v"].to_numpy())
            rank = max(int(np.ceil(q * len(vals))), 1) - 1
            true = vals[rank]
            assert abs(got[k] - true) <= alpha * true * 1.0001, (q, k, got[k], true)


def test_grouped_approx_quantile_mixed_signs_and_zero(ray_session):
    import ray

    from kgraft.relational import grouped_approx_quantile

    df = pd.DataFrame({"k": [0] * 7, "v": [-100.0, -1.0, 0.0, 0.0, 1.0, 10.0, 100.0]})
    got = (
        grouped_approx_quantile(ray.data.from_pandas(df), "k", "v", 0.5, alpha=0.01)
        .to_pandas()
        .iloc[0, 1]
    )
    assert got == 0.0  # the exact median is the zero bucket


def test_salted_hash_join_matches_unsalted_and_duckdb(ray_session):
    import duckdb
    import ray

    rng = np.random.RandomState(31)
    n = 3000
    # Zipf head: 60% of left rows share one key
    keys = np.where(rng.rand(n) < 0.6, 7, rng.randint(0, 50, n)).astype("int64")
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype="int64")})
    right = pd.DataFrame(
        {"k": np.arange(0, 40, dtype="int64"), "rv": np.arange(0, 40, dtype="int64") * 3}
    )
    for how in ("inner", "left"):
        got = (
            hash_join(
                ray.data.from_pandas(left),
                ray.data.from_pandas(right),
                on="k",
                how=how,
                num_salts=8,
                num_buckets=16,
            )
            .to_pandas()
            .sort_values(["lv"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        want = con.sql(
            f"SELECT l.k, l.lv, r.rv FROM l {kw} r ON l.k = r.k ORDER BY l.lv"
        ).df()
        assert len(got) == len(want)
        assert got["lv"].tolist() == want["lv"].tolist()
        a = got["rv"].to_numpy(dtype="float64")
        b = want["rv"].to_numpy(dtype="float64")
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()
    # right/outer must refuse salting
    import pytest as _pytest

    from kgraft.errors import PlanError

    with _pytest.raises(PlanError):
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="outer",
            num_salts=4,
        )


def test_unnest_ragged_lists_matches_duckdb(ray_session):
    import duckdb
    import ray

    rng = np.random.RandomState(13)
    lists = [list(rng.randint(0, 100, rng.randint(0, 6)).astype(float)) for _ in range(60)]
    df = pd.DataFrame({"rid": np.arange(60, dtype="int64"), "xs": lists})
    got = (
        __import__("kgraft.relational", fromlist=["unnest"])
        .unnest(ray.data.from_pandas(df).repartition(4), "xs")
        .to_pandas()
        .sort_values(["rid", "ord"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT rid, generate_subscripts(xs, 1) AS ord, UNNEST(xs) AS val "
        "FROM t ORDER BY rid, ord"
    ).df()
    assert got["rid"].tolist() == want["rid"].tolist()
    assert got["ord"].tolist() == want["ord"].tolist()
    np.testing.assert_allclose(got["val"].to_numpy(), want["val"].to_numpy())


def test_grouped_argmax_with_planted_ties(ray_session):
    import duckdb
    import ray

    from kgraft.relational import grouped_argmax

    rng = np.random.RandomState(23)
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 9, 400),
            "arg": np.arange(400, dtype="int64"),
            # coarse values -> many exact ties, exercising the arg tiebreak
            "v": rng.randint(0, 5, 400).astype("float64"),
        }
    )
    for minimize, order in ((False, "DESC"), (True, "ASC")):
        got = (
            grouped_argmax(
                ray.data.from_pandas(df.sample(frac=1, random_state=2)).repartition(6),
                "k",
                "v",
                "arg",
                minimize=minimize,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql(
            f"""SELECT k, arg, v FROM (
                  SELECT k, arg, v, row_number() OVER (
                    PARTITION BY k ORDER BY v {order}, arg {order}) AS rn
                  FROM t) WHERE rn = 1 ORDER BY k"""
        ).df()
        assert got["arg"].tolist() == want["arg"].tolist(), minimize
        np.testing.assert_allclose(got["v"], want["v"])


def test_standardize_matches_duckdb_and_guards(ray_session):
    import ray
    import pytest
    from kgraft.relational import standardize
    from kgraft.errors import PlanError

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": range(50), "x": rng.normal(10, 4, 50)})
    df.loc[7, "x"] = np.nan  # null excluded from moments, null z out
    got = (
        standardize(ray.data.from_pandas(df), "x")
        .to_pandas()
        .sort_values("id")["z"]
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT round((x - avg(x) OVER ()) / stddev_samp(x) OVER (), 6) AS z "
        "FROM df ORDER BY id"
    ).df()["z"]
    pd.testing.assert_series_equal(got, want, check_names=False)

    with pytest.raises(PlanError):
        standardize(ray.data.from_pandas(pd.DataFrame({"x": [1.0, 1.0, 1.0]})), "x").to_pandas()
    with pytest.raises(PlanError):
        standardize(ray.data.from_pandas(pd.DataFrame({"x": [2.0]})), "x").to_pandas()


def test_wavg_nulls_match_duckdb(ray_session):
    import ray
    from kgraft.relational import pre_aggregate

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 3, 80),
            "x": rng.normal(50, 10, 80),
            "w": rng.uniform(0.1, 5.0, 80),
        }
    )
    df.loc[::7, "x"] = np.nan
    df.loc[::11, "w"] = np.nan
    got = pre_aggregate(
        ray.data.from_pandas(df), ["k"], {"wx": (("x", "w"), "wavg")}
    ).sort_values("k", ignore_index=True)
    got["wx"] = got["wx"].round(6)
    want = duckdb.sql(
        "SELECT k, round(sum(x * w) / "
        "sum(CASE WHEN x IS NOT NULL THEN w END), 6) AS wx "
        "FROM df GROUP BY k ORDER BY k"
    ).df()
    want["k"] = want["k"].astype(got["k"].dtype)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_first_last_rolling_extrema_match_duckdb(ray_session):
    """first_value / last_value / rolling min-max vs DuckDB under heavy
    order-key ties (tiebreak column pins intra-tie order on both sides)."""
    import duckdb
    import ray

    from kgraft.relational import windowed

    rng = np.random.RandomState(17)
    v = rng.randn(250).round(3)
    v[rng.rand(250) < 0.15] = np.nan  # NULLs: SQL FIRST/LAST_VALUE return
    df = pd.DataFrame(                # the edge ROW's value, null included
        {
            "pid": rng.randint(0, 7, 250),
            "ord": rng.randint(0, 5, 250),  # heavy ties
            "uid": rng.permutation(250),  # unique tiebreak
            "v": v,
        }
    )
    got = (
        windowed(
            ray.data.from_pandas(df.sample(frac=1, random_state=5)),
            part_keys="pid",
            order_keys=["ord"],
            specs={
                "fv": ("first_value", "v"),
                "lv": ("last_value", "v"),
                "mn3": ("rolling_min", "v", 3),
                "mx3": ("rolling_max", "v", 3),
            },
            tiebreak=["uid"],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """
        SELECT uid,
               first_value(v) OVER w AS fv,
               last_value(v) OVER
                   (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv,
               min(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mn3,
               max(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mx3
        FROM t WINDOW w AS (PARTITION BY pid ORDER BY ord, uid) ORDER BY uid
        """
    ).df()
    for c in ("fv", "lv", "mn3", "mx3"):
        np.testing.assert_allclose(got[c].to_numpy(), want[c].to_numpy(), atol=1e-12)


def test_upsert_version_tie_updates_win(ray_session):
    """On equal versions the UPDATES side must win deterministically
    (the side tag extends the sort); distinct keys merge like a union."""
    import ray

    import pyarrow as pa

    from kgraft.relational import upsert

    base = pd.DataFrame({"k": [1, 2, 3], "val": ["a", "b", "c"], "v": [1, 5, 1]})
    upd = pd.DataFrame({"k": [2, 3, 4], "val": ["B", "C", "D"], "v": [5, 0, 9]})
    schema = pa.schema([("k", pa.int64()), ("val", pa.string()), ("v", pa.int64())])
    got = (
        upsert(
            ray.data.from_pandas(base),
            ray.data.from_pandas(upd),
            "k",
            "v",
            num_buckets=3,
            base_schema=schema,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=2: tie at v=5 -> updates win; k=3: base v=1 beats update v=0
    assert got["val"].tolist() == ["a", "B", "c", "D"]


def test_grouped_mad_matches_duckdb_random(ray_session):
    """grouped_mad vs DuckDB mad() over random bounded-cardinality
    values, including even/odd group sizes (interpolation on both
    median stages)."""
    import duckdb
    import ray

    from kgraft.relational import grouped_mad

    rng = np.random.RandomState(41)
    df = pd.DataFrame(
        {
            "k": rng.choice(list("abc"), 500),
            "v": rng.randint(0, 25, 500).astype("float64"),
        }
    )
    got = (
        grouped_mad(ray.data.from_pandas(df), "k", "v", num_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql("SELECT k, mad(v) AS mad FROM t GROUP BY k ORDER BY k").df()
    np.testing.assert_allclose(got["mad"].to_numpy(), want["mad"].to_numpy(), atol=1e-12)


def test_windowed_property_random_frames(ray_session):
    """Property sweep: EVERY window kind vs DuckDB on randomized frames
    with nulls, heavy order-key ties, and varying block layouts."""
    import duckdb
    import ray

    from kgraft.relational import windowed

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        n = int(rng.randint(50, 600))
        v = rng.normal(0, 10, n).round(3)
        v[rng.rand(n) < 0.2] = np.nan
        df = pd.DataFrame(
            {
                "pid": rng.randint(0, 6, n),
                "ord": rng.randint(0, 4, n),  # heavy ties
                "uid": rng.permutation(n),
                "v": v,
            }
        )
        got = (
            windowed(
                ray.data.from_pandas(df.sample(frac=1, random_state=seed)).repartition(
                    int(rng.randint(1, 7))
                ),
                part_keys="pid",
                order_keys=["ord"],
                specs={
                    "rn": ("row_number", None),
                    "lg": ("lag", "v", 1),
                    "ld": ("lead", "v", 2),
                    "cs": ("cumsum", "v"),
                    "rm": ("rolling_mean", "v", 3),
                    "rmn": ("rolling_min", "v", 2),
                    "rmx": ("rolling_max", "v", 4),
                    "rk": ("rank", None),
                    "dr": ("dense_rank", None),
                    "nt": ("ntile", None, 3),
                    "pr": ("percent_rank", None),
                    "cd": ("cume_dist", None),
                    "fv": ("first_value", "v"),
                    "lv": ("last_value", "v"),
                },
                tiebreak=["uid"],
                num_buckets=int(rng.randint(1, 6)),
            )
            .to_pandas()
            .sort_values("uid")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.sql(
            """
            SELECT uid,
                   CAST(row_number() OVER wt AS BIGINT) AS rn,
                   coalesce(lag(v) OVER wt, 0.0) AS lg,
                   coalesce(lead(v, 2) OVER wt, 0.0) AS ld,
                   sum(v) OVER (wt ROWS UNBOUNDED PRECEDING) AS cs,
                   avg(v) OVER (wt ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rm,
                   min(v) OVER (wt ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS rmn,
                   max(v) OVER (wt ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rmx,
                   CAST(rank() OVER w AS BIGINT) AS rk,
                   CAST(dense_rank() OVER w AS BIGINT) AS dr,
                   CAST(ntile(3) OVER wt AS BIGINT) AS nt,
                   percent_rank() OVER w AS pr,
                   cume_dist() OVER w AS cd,
                   first_value(v) OVER wt AS fv,
                   last_value(v) OVER
                       (wt ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
            FROM t
            WINDOW w AS (PARTITION BY pid ORDER BY ord),
                   wt AS (PARTITION BY pid ORDER BY ord, uid)
            ORDER BY uid
            """
        ).df()
        for c in ("rn", "rk", "dr", "nt"):
            assert got[c].tolist() == want[c].tolist(), (seed, c)
        for c in ("lg", "ld", "cs", "rm", "rmn", "rmx", "pr", "cd", "fv", "lv"):
            np.testing.assert_allclose(
                got[c].to_numpy(), want[c].to_numpy(), atol=1e-9,
                err_msg=f"seed={seed} col={c}",
            )


def test_asof_and_range_join_property_one_sided_keys(ray_session):
    """Seeded sweep for the two interval operators with keys present on
    ONLY one side (the bucket paths that once emitted inconsistent
    schemas — ADVICE r1), across bucket counts and block layouts."""
    import ray

    from kgraft.relational import asof_join, range_join

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        nl, nr = int(rng.randint(10, 300)), int(rng.randint(10, 200))
        # disjoint-ish key spaces: ~half the keys exist on one side only
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 12, nl),
                "t": rng.randint(0, 1000, nl).astype("int64"),
                "lv": np.arange(nl),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.randint(6, 18, nr),
                "t2": rng.randint(0, 1000, nr).astype("int64"),
                "rv": np.arange(nr) * 10,
            }
        ).drop_duplicates(["k", "t2"])
        nb = int(rng.randint(2, 9))

        got = (
            asof_join(
                ray.data.from_pandas(left).repartition(int(rng.randint(1, 5))),
                ray.data.from_pandas(right),
                by="k",
                left_on="t",
                right_on="t2",
                num_buckets=nb,
            )
            .to_pandas()
            .sort_values("lv")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("t2"),
            left_on="t",
            right_on="t2",
            by="k",
            direction="backward",
        ).sort_values("lv").reset_index(drop=True)
        assert len(got) == len(want), seed
        np.testing.assert_allclose(
            got["rv"].to_numpy(dtype="float64"),
            want["rv"].to_numpy(dtype="float64"),
            err_msg=f"seed={seed}",
        )

        # integer ordering keys must keep their dtype through the join
        assert got["t"].dtype == np.dtype("int64"), seed

        lo, hi = 0, int(rng.randint(1, 60))
        got_r = range_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            by="k",
            left_on="t",
            right_on="t2",
            lower=lo,
            upper=hi,
            num_buckets=nb,
        ).to_pandas()
        m = left.merge(right, on="k")
        m = m[(m["t2"] >= m["t"] + lo) & (m["t2"] < m["t"] + hi)]
        want_r = m.sort_values(["lv", "rv"]).reset_index(drop=True)
        assert len(got_r) == len(want_r), seed
        if len(want_r):  # an all-empty result arrives column-less from Ray
            got_r = got_r.sort_values(["lv", "rv"]).reset_index(drop=True)
            assert got_r["rv"].tolist() == want_r["rv"].tolist(), seed


def test_grouped_argmax_ignores_null_values(ray_session):
    """SQL max_by skips NULL values — a NaN-value row must never win."""
    import ray

    from kgraft.relational import grouped_argmax

    df = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "v": [3.0, np.nan, np.nan, 7.0, np.nan],
            "a": [10, 20, 30, 40, 50],
        }
    )
    got = (
        grouped_argmax(ray.data.from_pandas(df), "k", "v", "a")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=3 is all-NULL -> no row (documented); k=1/k=2 pick the real max
    assert got["k"].tolist() == [1, 2]
    assert got["a"].tolist() == [10, 40]


def test_windowed_rank_with_null_order_keys(ray_session):
    """NULL order keys rank as their own (NULLS LAST) tie group instead
    of crashing the int64 cast (review r2) — verified against DuckDB."""
    import duckdb
    import ray

    from kgraft.relational import windowed

    df = pd.DataFrame(
        {
            "pid": [1, 1, 1, 1, 2, 2],
            "ord": [2.0, np.nan, 1.0, np.nan, np.nan, 5.0],
            "uid": [0, 1, 2, 3, 4, 5],
        }
    )
    got = (
        windowed(
            ray.data.from_pandas(df),
            part_keys="pid",
            order_keys=["ord"],
            specs={"r": ("rank", None), "d": ("dense_rank", None),
                   "pr": ("percent_rank", None), "cd": ("cume_dist", None)},
            num_buckets=2,
        )
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        """SELECT uid, CAST(rank() OVER w AS BIGINT) r,
                  CAST(dense_rank() OVER w AS BIGINT) d,
                  percent_rank() OVER w pr, cume_dist() OVER w cd
           FROM t WINDOW w AS (PARTITION BY pid ORDER BY ord) ORDER BY uid"""
    ).df()
    assert got["r"].tolist() == want["r"].tolist()
    assert got["d"].tolist() == want["d"].tolist()
    np.testing.assert_allclose(got["pr"].to_numpy(), want["pr"].to_numpy(), atol=1e-12)
    np.testing.assert_allclose(got["cd"].to_numpy(), want["cd"].to_numpy(), atol=1e-12)


def test_upsert_duplicate_update_rows_deterministic(ray_session):
    """Same-side duplicate (key, version) rows must resolve identically
    across runs (stable content-hash tie-break, ADVICE r3)."""
    import ray

    from kgraft.relational import upsert

    base = pd.DataFrame({"k": [1], "v": [0], "payload": ["base"]})
    upd = pd.DataFrame(
        {"k": [1, 1, 1], "v": [5, 5, 5], "payload": ["zz", "aa", "mm"]}
    )
    outs = []
    for _ in range(3):
        got = upsert(
            ray.data.from_pandas(base),
            ray.data.from_pandas(upd),
            key="k",
            version_col="v",
        ).to_pandas()
        outs.append(got["payload"].iloc[0])
    assert len(set(outs)) == 1


def test_grouping_sets_count_stays_int64(ray_session):
    import ray

    from kgraft.relational import grouping_sets_aggregate

    df = pd.DataFrame({"a": ["x", "x", "y"], "b": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    out = grouping_sets_aggregate(
        ray.data.from_pandas(df),
        [["a", "b"], ["a"], []],
        {"n": (None, "count"), "s": ("v", "sum")},
    )
    assert out["n"].dtype == "int64"
    total = out[out["a"].isna() & out["b"].isna()]
    assert total["n"].iloc[0] == 3


def test_quantile_bucketize_int64_native_and_typed_error(ray_session):
    import pytest
    import ray

    from kgraft.errors import PlanError
    from kgraft.relational import quantile_bucketize

    # int64 beyond 2^53: float64 would collapse the two values
    big = 2**60
    df = pd.DataFrame({"x": [big, big + 1, big + 1, 0], "id": [0, 1, 2, 3]})
    out = (
        quantile_bucketize(ray.data.from_pandas(df), "x", 2, ["id", "x"])
        .to_pandas()
        .sort_values("id")
    )
    # big and big+1 must land in different buckets relative to the cut
    assert out.loc[out["x"] == big, "bucket"].nunique() == 1
    assert (
        out.loc[out["x"] == big + 1, "bucket"].iloc[0]
        > out.loc[out["x"] == 0, "bucket"].iloc[0]
    )
    with pytest.raises(PlanError):
        quantile_bucketize(
            ray.data.from_pandas(pd.DataFrame({"x": ["a", "b"], "id": [0, 1]})),
            "x",
            2,
            ["id"],
        )


def test_time_windowed_matches_bruteforce(ray_session):
    import ray

    from kgraft.errors import PlanError
    from kgraft.relational import time_windowed

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 20, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.choice(10**6, n, replace=False), unit="s"),
            "v": rng.normal(size=n).round(3),
        }
    )
    got = (
        time_windowed(ray.data.from_pandas(df), "uid", "ts", "v", "1h",
                      ["sum", "mean", "min", "max", "count"])
        .to_pandas()
        .sort_values(["uid", "ts"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["uid", "ts"]).reset_index(drop=True)
    roll = exp.groupby("uid", sort=False).rolling("1h", on="ts")["v"]
    for k in ["sum", "mean", "min", "max"]:
        np.testing.assert_allclose(
            got[f"w_{k}"].to_numpy(), getattr(roll, k)().to_numpy(), rtol=1e-12
        )
    assert (got["w_count"].to_numpy() == roll.count().to_numpy().astype(int)).all()

    import pytest

    with pytest.raises(PlanError):
        time_windowed(ray.data.from_pandas(df), "uid", "ts", "v", "1h", ["median"])


def test_regr_slope_intercept_match_duckdb(ray_session):
    """regr_slope/regr_intercept aggregate kinds vs DuckDB, with nulls
    on both sides and a zero-variance-x group (must be NULL)."""
    import ray

    from kgraft.relational import pre_aggregate

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "k": rng.choice(list("abcd"), 300),
            "x": rng.uniform(0, 10, 300),
            "y": rng.normal(5, 2, 300),
        }
    )
    df.loc[::9, "x"] = np.nan
    df.loc[::13, "y"] = np.nan
    df.loc[df["k"] == "d", "x"] = 3.0  # var_pop(x)=0 -> NULL slope
    got = pre_aggregate(
        ray.data.from_pandas(df),
        ["k"],
        {"slope": (("y", "x"), "regr_slope"), "icept": (("y", "x"), "regr_intercept")},
    ).sort_values("k", ignore_index=True)
    want = duckdb.sql(
        "SELECT k, regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept "
        "FROM df GROUP BY k ORDER BY k"
    ).df()
    np.testing.assert_allclose(
        got[["slope", "icept"]].to_numpy(dtype=float),
        want[["slope", "icept"]].to_numpy(dtype=float),
        rtol=1e-9,
    )
    assert np.isnan(got.loc[got["k"] == "d", "slope"].iloc[0])


def test_grouped_entropy_matches_counts_oracle(ray_session):
    """grouped_entropy vs a from-scratch -sum(p ln p), nulls excluded,
    single-category group (entropy 0) included."""
    import ray

    from kgraft.relational import grouped_entropy

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "k": rng.choice(list("abc"), 400),
            "c": rng.choice(list("xyzw"), 400).astype(object),
        }
    )
    df.loc[::17, "c"] = None
    df.loc[df["k"] == "c", "c"] = "x"  # one category -> entropy 0
    got = (
        grouped_entropy(ray.data.from_pandas(df), "k", "c", num_buckets=4)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    d = df[df["c"].notna()]
    want = []
    for k, g in d.groupby("k"):
        p = g["c"].value_counts(normalize=True).to_numpy()
        want.append(-(p * np.log(p)).sum())
    np.testing.assert_allclose(got["entropy"].to_numpy(), want, rtol=1e-12)
    assert got.loc[got["k"] == "c", "entropy"].iloc[0] == 0.0


def test_robust_standardize_matches_duckdb(ray_session):
    """robust_standardize vs DuckDB (x - median)/(1.4826*mad), with a
    constant group (mad=0 -> NULL) and value nulls passing through."""
    import ray

    from kgraft.relational import robust_standardize

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "rid": np.arange(350),
            "k": rng.choice(list("abc"), 350),
            "v": rng.randint(0, 40, 350).astype("float64"),
        }
    )
    df.loc[::23, "v"] = np.nan
    df.loc[df["k"] == "c", "v"] = 7.0  # mad = 0 -> NULL z
    got = (
        robust_standardize(ray.data.from_pandas(df), "k", "v", num_buckets=4)
        .to_pandas()
        .sort_values("rid", ignore_index=True)
    )
    want = duckdb.sql(
        """
        WITH s AS (SELECT k, median(v) AS med, mad(v) AS mad FROM df GROUP BY k)
        SELECT rid, CASE WHEN 1.4826 * mad = 0 THEN NULL
                         ELSE (v - med) / (1.4826 * mad) END AS rz
        FROM df JOIN s USING (k) ORDER BY rid
        """
    ).df()
    np.testing.assert_allclose(
        got["rz"].to_numpy(dtype=float), want["rz"].to_numpy(dtype=float),
        rtol=1e-9, equal_nan=True,
    )
    assert got.loc[df.sort_values("rid")["k"].to_numpy() == "c", "rz"].isna().all()


def test_gap_fill_forward_fill(ray_session):
    """Gap-fill: every key emits one row per hour from its min to max
    timestamp; missing hours carry the previous hour's value; keys
    never bleed into each other's grids."""
    import ray

    from kgraft.relational import gap_fill

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "b"],
            "h": pd.to_datetime(
                [
                    "2024-01-01 00:00",
                    "2024-01-01 01:00",
                    "2024-01-01 03:00",  # hour 2 missing -> ffill 2.0
                    "2024-01-01 05:00",
                    "2024-01-01 07:00",  # hour 6 missing -> ffill 4.0
                ]
            ),
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = (
        gap_fill(ray.data.from_pandas(df).repartition(2), "k", "h", "v", freq="h", num_buckets=4)
        .to_pandas()
        .sort_values(["k", "h"], ignore_index=True)
    )
    a = out[out["k"] == "a"]
    b = out[out["k"] == "b"]
    assert a["v"].tolist() == [1.0, 2.0, 2.0, 3.0]
    assert a["h"].dt.hour.tolist() == [0, 1, 2, 3]
    assert b["v"].tolist() == [4.0, 4.0, 5.0]
    assert b["h"].dt.hour.tolist() == [5, 6, 7]


def test_cross_join_small_guard_and_values(ray_session):
    """Cross join replicates every row per grid row; a corpus-scale
    'small' side raises PlanError."""
    import ray

    from kgraft.errors import PlanError
    from kgraft.relational import cross_join_small

    df = pd.DataFrame({"x": [1, 2, 3]})
    grid = pd.DataFrame({"s": ["a", "b"], "m": [1.0, 2.0]})
    out = (
        cross_join_small(ray.data.from_pandas(df).repartition(2), grid)
        .to_pandas()
        .sort_values(["x", "s"], ignore_index=True)
    )
    assert len(out) == 6
    assert out.loc[(out["x"] == 2) & (out["s"] == "b"), "m"].iloc[0] == 2.0

    big = pd.DataFrame({"s": range(20001)})
    try:
        cross_join_small(ray.data.from_pandas(df), big, max_broadcast_rows=20000)
        assert False, "expected PlanError"
    except PlanError:
        pass


def test_auto_hash_join_salts_and_matches_plain(ray_session):
    """auto_hash_join on a planted-Zipf key must pick num_salts > 1 and
    return exactly the plain join's rows; on a uniform key it degrades
    to the unsalted path."""
    import logging

    import ray

    from kgraft.relational import auto_hash_join, hash_join

    n = 3000
    uid = np.arange(n, dtype="int64")
    skew = np.where(uid % 3 == 0, 0, uid)
    left = pd.DataFrame({"k": skew, "x": uid})
    right = pd.DataFrame({"k": np.unique(skew), "y": np.unique(skew) * 2})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    import pyarrow as pa

    ls = pa.schema([("k", pa.int64()), ("x", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("y", pa.int64())])

    logs = []
    h = logging.Handler()
    h.emit = lambda rec: logs.append(rec.getMessage())
    lg = logging.getLogger("kgraft.relational")
    old_level = lg.level
    lg.setLevel(logging.INFO)
    lg.addHandler(h)
    try:
        got = (
            auto_hash_join(lds, rds, on="k", left_schema=ls, right_schema=rs)
            .to_pandas()
            .sort_values(["k", "x"], ignore_index=True)
        )
    finally:
        lg.removeHandler(h)
        lg.setLevel(old_level)
    assert any("num_salts=4" in m for m in logs), logs
    want = (
        hash_join(lds, rds, on="k", left_schema=ls, right_schema=rs)
        .to_pandas()
        .sort_values(["k", "x"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[["k", "x", "y"]], want[["k", "x", "y"]])


def test_clustering_agreement_matches_per_item(ray_session):
    """Dataset B-cubed == literal per-item average (the definition),
    including a perfect clustering and an all-singletons one."""
    import ray

    from kgraft.relational import clustering_agreement

    rng = np.random.RandomState(23)
    n = 400
    df = pd.DataFrame(
        {
            "pred": rng.randint(0, 12, n).astype("int64"),
            "gold": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    df.loc[rng.rand(n) < 0.05, "gold"] = None  # pairwise-null excluded

    def per_item(frame):
        frame = frame.dropna(subset=["pred", "gold"]).reset_index(drop=True)
        ps, rs = [], []
        for i in range(len(frame)):
            cl = frame[frame["pred"] == frame.loc[i, "pred"]]
            gc = frame[frame["gold"] == frame.loc[i, "gold"]]
            same = ((frame["pred"] == frame.loc[i, "pred"])
                    & (frame["gold"] == frame.loc[i, "gold"])).sum()
            ps.append(same / len(cl))
            rs.append(same / len(gc))
        p, r = np.mean(ps), np.mean(rs)
        return len(frame), p, r, 2 * p * r / (p + r)

    got = clustering_agreement(
        ray.data.from_pandas(df).repartition(7), "pred", "gold"
    )
    n_items, p, r, f1 = per_item(df)
    assert got.loc[0, "n_items"] == n_items
    np.testing.assert_allclose(got.loc[0, "bcubed_precision"], round(p, 6), atol=1e-6)
    np.testing.assert_allclose(got.loc[0, "bcubed_recall"], round(r, 6), atol=1e-6)
    np.testing.assert_allclose(got.loc[0, "bcubed_f1"], round(f1, 6), atol=1e-6)

    # perfect clustering: all three scores 1.0
    perfect = pd.DataFrame({"pred": df["gold"], "gold": df["gold"]}).dropna()
    got_p = clustering_agreement(ray.data.from_pandas(perfect), "pred", "gold")
    assert got_p.loc[0, "bcubed_precision"] == 1.0
    assert got_p.loc[0, "bcubed_recall"] == 1.0

    # singletons: precision 1, recall = E[1/class size]
    single = df.dropna().reset_index(drop=True)
    single["pred"] = np.arange(len(single), dtype="int64")
    got_s = clustering_agreement(ray.data.from_pandas(single), "pred", "gold")
    assert got_s.loc[0, "bcubed_precision"] == 1.0
    assert got_s.loc[0, "bcubed_recall"] < 0.1


def test_scd2_compress_nulls_and_ties(ray_session):
    """Null-safe state compare (NULL == NULL keeps the interval open)
    and deterministic equal-timestamp ordering via the tiebreak col."""
    import ray

    from kgraft.relational import scd2_compress

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-03",
                 "2024-01-01", "2024-01-01", "2024-01-02"]
            ).astype("datetime64[us]"),
            "tb": [0, 1, 2, 3, 0, 1, 2],
            "st": ["a", None, None, "b", "x", "y", "y"],
        }
    )
    got = (
        scd2_compress(
            ray.data.from_pandas(df).repartition(3), "k", ["ts", "tb"], "st"
        )
        .to_pandas()
        .sort_values(["k", "valid_from", "tb"] if "tb" in [] else ["k", "valid_from"],
                     ignore_index=True)
    )
    # key 1: a | NULL (two rows collapse) | b ; key 2: x | y (two collapse)
    k1 = got[got["k"] == 1].reset_index(drop=True)
    assert list(k1["st"]) == ["a", None, "b"]
    assert k1.loc[0, "valid_to"] == k1.loc[1, "valid_from"]
    assert k1.loc[1, "valid_to"] == k1.loc[2, "valid_from"]
    assert pd.isna(k1.loc[2, "valid_to"])
    k2 = got[got["k"] == 2].reset_index(drop=True)
    # equal-ts rows ordered by tiebreak: x (tb 0) then y (tb 1), y@01-02 collapses
    assert list(k2["st"]) == ["x", "y"]
    assert pd.isna(k2.loc[1, "valid_to"])


def test_temporal_join_matches_direct(ray_session):
    """Point-in-time join == direct per-row interval scan, with gaps
    (closed intervals before the probe ts must NOT match), open current
    versions, and keys absent from the dimension."""
    import ray

    from kgraft.relational import temporal_join

    dim = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 3],
            "state": ["a", "b", "c", "x", "z"],
            "valid_from": pd.to_datetime(
                ["2024-01-01", "2024-01-05", "2024-02-01",
                 "2024-01-03", "2024-01-01"]
            ).astype("datetime64[us]"),
            "valid_to": pd.to_datetime(
                ["2024-01-05", "2024-01-10", None, None, "2024-01-02"]
            ).astype("datetime64[us]"),
        }
    )
    rng = np.random.RandomState(61)
    facts = pd.DataFrame(
        {
            "k": rng.choice([1, 2, 3, 4], 200).astype("int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 60 * 24 * 3600, 200), unit="s"),
            "v": rng.rand(200),
        }
    )
    facts["ts"] = facts["ts"].astype("datetime64[us]")

    got = (
        temporal_join(
            ray.data.from_pandas(facts).repartition(5), dim, "k", "ts",
        )
        .to_pandas()
        .sort_values(["k", "ts", "v"], ignore_index=True)
    )

    def lookup(row):
        m = dim[
            (dim["k"] == row["k"])
            & (dim["valid_from"] <= row["ts"])
            & (dim["valid_to"].isna() | (row["ts"] < dim["valid_to"]))
        ]
        return m.iloc[-1]["state"] if len(m) else None

    want = facts.sort_values(["k", "ts", "v"], ignore_index=True)
    want_state = want.apply(lookup, axis=1)
    got_state = got["state"].where(got["state"].notna(), None)
    assert list(got_state) == list(want_state)

    inner = temporal_join(
        ray.data.from_pandas(facts), dim, "k", "ts", how="inner"
    ).to_pandas()
    assert len(inner) == want_state.notna().sum()


def test_validate_finds_planted_violations(ray_session):
    """Every rule kind catches its planted violation with the exact
    count; the clean table passes everything."""
    import ray

    from kgraft.relational import validate

    df = pd.DataFrame(
        {
            "k": [1, 2, 3, 3, 4],           # one duplicate key
            "v": [0.5, -1.0, 2.0, 11.0, None],  # two out of [0, 10]
            "s": ["ab", "cb", "zz", None, "ab"],  # one regex miss (zz)
            "c": ["x", "y", "q", "x", None],      # one not accepted (q)
        }
    )
    got = validate(
        ray.data.from_pandas(df).repartition(3),
        [
            {"kind": "not_null", "col": "v"},
            {"kind": "in_range", "col": "v", "lo": 0.0, "hi": 10.0},
            {"kind": "regex", "col": "s", "pattern": r"[a-c]+"},
            {"kind": "accepted_values", "col": "c", "values": ["x", "y"]},
            {"kind": "unique", "col": "k"},
        ],
    ).set_index("rule")
    assert got.loc["not_null(v)", "n_violations"] == 1
    assert got.loc["in_range(v)", "n_violations"] == 2
    assert got.loc["regex(s)", "n_violations"] == 1
    assert got.loc["accepted_values(c)", "n_violations"] == 1
    assert got.loc["unique(k)", "n_violations"] == 1
    assert (got["n_rows"] == 5).all()
    assert got["passed"].sum() == 0

    clean = validate(
        ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})),
        [{"kind": "unique", "col": "k"}, {"kind": "in_range", "col": "v",
                                          "lo": 0, "hi": 5}],
    )
    assert (clean["passed"] == 1).all()


def test_new_ops_invariant_to_block_layout(ray_session):
    """scd2_compress, temporal_join, debounce and apply_cdc must give
    identical results at any repartitioning (the co-location contract
    of the bucket exchange)."""
    import ray

    from kgraft.relational import apply_cdc, scd2_compress, temporal_join
    from kgraft.streamops import debounce

    rng = np.random.RandomState(71)
    n = 400
    ev = pd.DataFrame(
        {
            "k": rng.randint(0, 25, n).astype("int64"),
            "ts": (
                pd.to_datetime("2024-03-01")
                + pd.to_timedelta(rng.randint(0, 86400 * 10, n), unit="s")
            ).astype("datetime64[us]"),
            "tb": np.arange(n, dtype="int64"),
            "st": rng.choice(["a", "b", "c"], n),
        }
    )

    def run_all(num_blocks):
        ds = ray.data.from_pandas(ev).repartition(num_blocks)
        scd = (
            scd2_compress(ds, "k", ["ts", "tb"], "st")
            .to_pandas()
            .sort_values(["k", "valid_from", "st"], ignore_index=True)
        )
        dim = scd.rename(columns={"st": "state"})
        tj = (
            temporal_join(ds, dim, "k", "ts")
            .to_pandas()
            .sort_values(["k", "ts", "tb"], ignore_index=True)[
                ["k", "ts", "tb", "state"]
            ]
        )
        db = (
            debounce(ds, ["k"], "ts", 3600.0, tiebreak="tb")
            .to_pandas()
            .sort_values(["k", "ts", "tb"], ignore_index=True)
        )
        ch = ev.head(50).copy()
        ch["op"] = np.where(ch["tb"] % 2 == 0, "D", "U")
        ch["version"] = np.int64(1)
        cdc = (
            apply_cdc(
                ds, ray.data.from_pandas(ch).repartition(3), "k", "version", "op",
                base_schema=ray.data.from_pandas(ev).schema(),
            )
            .to_pandas()
            .sort_values(["k", "ts", "tb"], ignore_index=True)
        )
        return scd, tj, db, cdc

    a = run_all(1)
    b = run_all(9)
    for x, y in zip(a, b):
        pd.testing.assert_frame_equal(x, y)


def test_incremental_aggregate_three_folds_with_nulls(ray_session):
    """Three-fold incremental build == one-shot DuckDB aggregate, with
    nulls (SQL divisor semantics) and all five algebraic kinds."""
    import ray

    from kgraft.relational import incremental_aggregate

    rng = np.random.RandomState(83)
    n = 900
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "x": rng.normal(10, 3, n),
        }
    )
    df.loc[rng.rand(n) < 0.15, "x"] = np.nan
    aggs = {
        "c": (None, "count"),
        "s": ("x", "sum"),
        "m": ("x", "mean"),
        "mn": ("x", "min"),
        "mx": ("x", "max"),
    }
    state = None
    for lo, hi in ((0, 300), (300, 600), (600, 900)):
        chunk = ray.data.from_pandas(df.iloc[lo:hi]).repartition(3)
        result, state = incremental_aggregate(state, chunk, ["k"], aggs)
    got = result.sort_values("k", ignore_index=True)
    want = duckdb.sql(
        "SELECT k, count(*) c, sum(x) s, avg(x) m, min(x) mn, max(x) mx "
        "FROM df GROUP BY k ORDER BY k"
    ).df()
    assert got["c"].tolist() == want["c"].tolist()
    for col in ("s", "m", "mn", "mx"):
        np.testing.assert_allclose(got[col].to_numpy(), want[col].to_numpy(),
                                   rtol=1e-9)


def test_k_anonymize_planted_groups(ray_session):
    import ray

    from kgraft.relational import k_anonymize

    df = pd.DataFrame(
        {
            "q1": ["a"] * 10 + ["b"] * 3 + ["c"] * 5,
            "q2": [1] * 10 + [1] * 3 + [2] * 5,
            "v": np.arange(18),
        }
    )
    got = (
        k_anonymize(ray.data.from_pandas(df).repartition(4), ["q1", "q2"], 5)
        .to_pandas()
        .sort_values("v", ignore_index=True)
    )
    # ('b', 1) has 3 < 5 rows -> suppressed; the other groups survive
    assert len(got) == 15
    assert set(got["q1"]) == {"a", "c"}


def test_apply_once_per_key_runs_fn_once_per_distinct(ray_session):
    import numpy as np
    import pandas as pd
    import ray
    from kgraft.relational import apply_once_per_key

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def add(self, k):
            self.n += k

        def get(self):
            return self.n

    counter = Counter.remote()
    # 600 rows over 7 distinct content keys (heavy duplication)
    rng = np.random.default_rng(23)
    h = rng.integers(100, 107, 600).astype(np.int64)
    df = pd.DataFrame(
        {
            "row_id": np.arange(600, dtype=np.int64),
            "h": h,
        }
    )

    def fn(uniq):
        def work(b: pd.DataFrame) -> pd.DataFrame:
            ray.get(counter.add.remote(len(b)))
            b = b.copy()
            b["score"] = b["h"] * 2  # deterministic function of the key
            return b

        return uniq.map_batches(work, batch_format="pandas")

    out = (
        apply_once_per_key(ray.data.from_pandas(df).repartition(8), "h", fn)
        .to_pandas()
        .sort_values("row_id", ignore_index=True)
    )
    assert len(out) == 600
    assert (out["score"] == out["h"] * 2).all()  # == rowwise application
    assert ray.get(counter.get.remote()) == 7  # once per distinct key


def test_clustering_pairwise_matches_bruteforce(ray_session):
    import itertools

    import numpy as np
    import pandas as pd
    import ray
    from kgraft.relational import clustering_pairwise

    rng = np.random.default_rng(31)
    n = 120
    df = pd.DataFrame(
        {
            "pred": rng.integers(0, 6, n),
            "gold": rng.integers(0, 5, n),
        }
    )
    # some nulls excluded pairwise
    df.loc[::17, "pred"] = None
    got = clustering_pairwise(
        ray.data.from_pandas(df).repartition(5), "pred", "gold", num_buckets=4
    ).iloc[0]

    kept = df.dropna().reset_index(drop=True)
    tp = fp = fn_ = tn = 0
    for i, j in itertools.combinations(range(len(kept)), 2):
        sp = kept.loc[i, "pred"] == kept.loc[j, "pred"]
        sg = kept.loc[i, "gold"] == kept.loc[j, "gold"]
        tp += sp and sg
        fp += sp and not sg
        fn_ += (not sp) and sg
        tn += (not sp) and (not sg)
    prec = tp / (tp + fp)
    rec = tp / (tp + fn_)
    f1 = 2 * prec * rec / (prec + rec)
    total = tp + fp + fn_ + tn
    expected = (tp + fp) * (tp + fn_) / total
    ari = (tp - expected) / ((2 * tp + fp + fn_) / 2 - expected)
    assert got["n_items"] == len(kept)
    assert abs(got["pair_precision"] - prec) < 1e-6
    assert abs(got["pair_recall"] - rec) < 1e-6
    assert abs(got["pair_f1"] - f1) < 1e-6
    assert abs(got["ari"] - ari) < 1e-6


def test_clustering_pairwise_perfect_and_degenerate(ray_session):
    import pandas as pd
    import ray
    from kgraft.relational import clustering_pairwise

    df = pd.DataFrame({"pred": [1, 1, 2, 2, 3], "gold": [9, 9, 8, 8, 7]})
    got = clustering_pairwise(ray.data.from_pandas(df), "pred", "gold").iloc[0]
    assert got["pair_f1"] == 1.0 and got["ari"] == 1.0

    # all-singletons on both sides: no pairs anywhere -> NaN P/R, ARI 1
    df2 = pd.DataFrame({"pred": [1, 2, 3], "gold": [7, 8, 9]})
    got2 = clustering_pairwise(ray.data.from_pandas(df2), "pred", "gold").iloc[0]
    assert got2["ari"] == 1.0
    assert pd.isna(got2["pair_precision"])


def test_ols_fit_recovers_planted_coefficients(ray_session):
    import ray

    from kgraft.relational import ols_fit

    rng = np.random.RandomState(7)
    n = 5000
    g = np.repeat(np.array(["a", "b"]), n // 2)
    x1 = rng.randn(n)
    x2 = rng.randn(n)
    # group a: y = 2 + 3*x1 - 1*x2 (exact); group b: different plane
    y = np.where(g == "a", 2 + 3 * x1 - x2, -1 + 0.5 * x1 + 4 * x2)
    ds = ray.data.from_pandas(
        pd.DataFrame({"g": g, "x1": x1, "x2": x2, "y": y})
    ).repartition(8)
    out = ols_fit(ds, ["g"], "y", ["x1", "x2"]).sort_values("g")
    np.testing.assert_allclose(
        out[["icept", "coef_x1", "coef_x2"]].to_numpy(),
        [[2.0, 3.0, -1.0], [-1.0, 0.5, 4.0]],
        atol=1e-9,
    )
    np.testing.assert_allclose(out["r2"].to_numpy(), [1.0, 1.0], atol=1e-9)


def test_ols_fit_collinear_falls_back_to_lstsq(ray_session):
    import ray

    from kgraft.relational import ols_fit

    rng = np.random.RandomState(3)
    x1 = rng.randn(1000)
    df = pd.DataFrame({"g": "a", "x1": x1, "x2": 2 * x1, "y": 1 + 4 * x1})
    out = ols_fit(ray.data.from_pandas(df).repartition(4), ["g"], "y", ["x1", "x2"])
    # x2 = 2*x1 is singular; minimum-norm solution still predicts exactly
    row = out.iloc[0]
    pred_slope = row["coef_x1"] + 2 * row["coef_x2"]
    np.testing.assert_allclose(pred_slope, 4.0, atol=1e-6)
    np.testing.assert_allclose(row["r2"], 1.0, atol=1e-9)


def test_skyline2d_matches_bruteforce(ray_session):
    import ray

    from kgraft.relational import skyline2d

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "x": rng.randint(0, 30, 400).astype("float64"),
            "y": rng.randint(0, 30, 400).astype("float64"),
        }
    )

    def brute(df, min_x, max_y):
        pts = set(zip(df["x"], df["y"]))
        out = []
        for p in pts:
            dominated = False
            for q in pts:
                if q == p:
                    continue
                bx = q[0] <= p[0] if min_x else q[0] >= p[0]
                by = q[1] >= p[1] if max_y else q[1] <= p[1]
                sx = q[0] < p[0] if min_x else q[0] > p[0]
                sy = q[1] > p[1] if max_y else q[1] < p[1]
                if bx and by and (sx or sy):
                    dominated = True
                    break
            if not dominated:
                out.append(p)
        return sorted(out)

    ds = ray.data.from_pandas(df).repartition(7)
    for min_x, max_y in [(True, True), (True, False), (False, True)]:
        got = skyline2d(ds, "x", "y", minimize_x=min_x, maximize_y=max_y)
        assert sorted(zip(got["x"], got["y"])) == brute(df, min_x, max_y)


def test_hll_sketch_tables_merge_equals_direct(ray_session):
    """Persisted-sketch invariant: union of per-snapshot sketch tables
    re-estimated == sketching the union directly, register-exact."""
    import ray

    from kgraft.relational import (
        grouped_approx_count_distinct,
        hll_estimate_sketches,
        hll_sketch_table,
    )

    rng = np.random.RandomState(3)
    a = pd.DataFrame(
        {"k": rng.choice(["x", "y"], 4000),
         "u": rng.randint(0, 900, 4000).astype("int64")}
    )
    b = pd.DataFrame(
        {"k": rng.choice(["x", "y", "z"], 3000),
         "u": rng.randint(500, 2000, 3000).astype("int64")}
    )
    dsa = ray.data.from_pandas(a).repartition(4)
    dsb = ray.data.from_pandas(b).repartition(3)
    ska = hll_sketch_table(dsa, "k", "u")
    skb = hll_sketch_table(dsb, "k", "u")
    merged = (
        hll_estimate_sketches(ska.union(skb), "k")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    direct = (
        grouped_approx_count_distinct(
            ray.data.from_pandas(pd.concat([a, b], ignore_index=True)), "k", "u"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(merged, direct)
    # and the estimate is within the p=12 error bound of exact
    exact = pd.concat([a, b]).groupby("k")["u"].nunique()
    for _, row in merged.iterrows():
        assert abs(row["approx_n_distinct"] - exact[row["k"]]) / exact[row["k"]] < 0.05


def test_dd_sketch_tables_merge_equals_direct(ray_session):
    """Union of per-snapshot DDSketch tables re-estimated == sketching
    the union directly, bucket-exact; and within the alpha bound."""
    import ray

    from kgraft.relational import (
        dd_quantile_sketches,
        dd_sketch_table,
        grouped_approx_quantile,
    )

    rng = np.random.RandomState(8)
    a = pd.DataFrame(
        {"k": rng.choice(["x", "y"], 5000), "v": rng.lognormal(3, 1, 5000)}
    )
    b = pd.DataFrame(
        {"k": rng.choice(["x", "y"], 5000), "v": rng.lognormal(4, 0.5, 5000)}
    )
    ska = dd_sketch_table(ray.data.from_pandas(a).repartition(4), "k", "v")
    skb = dd_sketch_table(ray.data.from_pandas(b).repartition(3), "k", "v")
    merged = (
        dd_quantile_sketches(ska.union(skb), "k", 0.9)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    direct = (
        grouped_approx_quantile(
            ray.data.from_pandas(pd.concat([a, b], ignore_index=True)),
            "k", "v", 0.9,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(merged, direct)
    exact = pd.concat([a, b]).groupby("k")["v"].quantile(0.9)
    for _, row in merged.iterrows():
        assert abs(row["approx_q90"] - exact[row["k"]]) <= 0.025 * exact[row["k"]]


def test_set_op_all_bag_semantics_with_nulls(ray_session):
    import ray

    from kgraft.relational import set_op_all

    l = pd.DataFrame({"k": [1.0, 1.0, 2.0, None, None, None]})
    r = pd.DataFrame({"k": [1.0, None]})
    dl, dr = ray.data.from_pandas(l), ray.data.from_pandas(r)

    def key(x):
        return (x != x, x)  # NaN last

    inter = sorted(
        set_op_all(dl, dr, "k", "intersect_all").to_pandas()["k"], key=key
    )
    assert inter[0] == 1.0 and len(inter) == 2 and inter[1] != inter[1]
    exc = sorted(set_op_all(dl, dr, "k", "except_all").to_pandas()["k"], key=key)
    assert exc[:2] == [1.0, 2.0] and len(exc) == 4
    assert exc[2] != exc[2] and exc[3] != exc[3]


def test_poisson_bootstrap_ci_covers_and_is_partition_invariant(ray_session):
    import ray

    from kgraft.relational import poisson_bootstrap_mean

    rng = np.random.RandomState(12)
    n = 20_000
    df = pd.DataFrame(
        {"id": np.arange(n, dtype="int64"), "x": rng.normal(50, 10, n)}
    )
    a = poisson_bootstrap_mean(
        ray.data.from_pandas(df).repartition(7), "x", "id", n_boot=200
    )
    row = a.iloc[0]
    # CI brackets the sample mean, width ~ 4*sd/sqrt(n) = ~0.28
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    width = row["ci_hi"] - row["ci_lo"]
    se = 10 / np.sqrt(n)
    assert 2.0 * se < width < 6.5 * se, width
    # deterministic across partitionings (draws keyed on the id column)
    b = poisson_bootstrap_mean(
        ray.data.from_pandas(df).repartition(2), "x", "id", n_boot=200
    )
    pd.testing.assert_frame_equal(a, b)


def test_ranked_global_row_number_matches_pandas(ray_session):
    """relational.ranked: global per-partition row_number from a
    distributed sort + block-offset partials equals the single-machine
    window, under heavy order-key ties spanning blocks, ascending and
    descending, at a 3-value partition key (the low-cardinality shape
    windowed() cannot scale to)."""
    import ray

    from kgraft.relational import ranked

    rng = np.random.RandomState(21)
    n = 8000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "v": rng.randint(0, 12, n).astype("float64"),  # massive ties
            "id": rng.permutation(n).astype("int64"),  # unique tiebreak
        }
    )
    for desc in (False, True):
        got = (
            ranked(
                ray.data.from_pandas(df).repartition(9),
                ["k"],
                ["v"],
                "id",
                descending=desc,
            )
            .to_pandas()
            .sort_values("id", ignore_index=True)
        )
        want = df.sort_values(
            ["k", "v", "id"], ascending=[True, not desc, True]
        )
        want = want.assign(
            row_number=want.groupby("k", sort=False).cumcount() + 1
        ).sort_values("id", ignore_index=True)
        pd.testing.assert_frame_equal(
            got[["k", "v", "id", "row_number"]],
            want[["k", "v", "id", "row_number"]],
        )


def test_grouped_quantile_by_sort_matches_direct(ray_session):
    """Exact sort-based grouped quantile at a 3-value partition key:
    equals the direct numpy order statistic at several q, under heavy
    value ties."""
    import math

    import ray

    from kgraft.relational import grouped_quantile_by_sort

    rng = np.random.RandomState(31)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.choice(["F", "O", "P"], n),
            "v": rng.randint(0, 40, n).astype("float64"),
            "id": np.arange(n, dtype="int64"),
        }
    )
    for q in (0.1, 0.5, 0.9, 1.0):
        got = grouped_quantile_by_sort(
            ray.data.from_pandas(df).repartition(7), "k", "v", q, "id",
            out_col="qv",
        )
        for _, row in got.iterrows():
            d = df[df["k"] == row["k"]].sort_values(["v", "id"])
            cnt = len(d)
            tgt = min(cnt, max(1, math.ceil(q * cnt)))
            assert row["qv"] == d["v"].iloc[tgt - 1], (row["k"], q)
            assert row["n_rows"] == cnt


def test_ranked_single_group_and_tiny_input(ray_session):
    """ranked(): a one-group corpus (the extreme low-cardinality case)
    and a tiny input both produce correct dense ranks."""
    import ray

    from kgraft.relational import ranked

    df = pd.DataFrame(
        {"k": ["x"] * 1500, "v": np.arange(1500)[::-1] % 7, "id": np.arange(1500)}
    )
    got = (
        ranked(ray.data.from_pandas(df).repartition(5), ["k"], ["v"], "id")
        .to_pandas()
        .sort_values(["v", "id"], ignore_index=True)
    )
    assert got["row_number"].tolist() == list(range(1, 1501))

    tiny = pd.DataFrame({"k": ["a"], "v": [1.0], "id": [0]})
    got = ranked(ray.data.from_pandas(tiny), ["k"], ["v"], "id").to_pandas()
    assert got["row_number"].tolist() == [1]
