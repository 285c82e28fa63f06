"""SQL rounding convention (VERDICT r3 task 1) and the de-skewed Gini.

numpy/pandas round half-to-even; DuckDB rounds half away from zero.
Every oracled query must round through ``kgraft.sqlround.sql_round``,
which reproduces DuckDB's double path bit-for-bit. These tests plant
exact half-ULP values (the class that made ``assoc_rules_parts`` fail
the driver's hash compare in round 3) and fuzz against DuckDB itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from kgraft.sqlround import sql_round


def _duckdb_round(vals: np.ndarray, d: int) -> np.ndarray:
    import duckdb

    res = duckdb.sql(
        f"select round(v::DOUBLE, {d}) from (select unnest($v) v)",
        params={"v": vals},
    ).fetchnumpy()
    return list(res.values())[0]


def test_planted_half_ulps_match_duckdb():
    # the assoc_rules_parts regression value plus classic banker's traps
    vals = np.array(
        [55.28625, -55.28625, 0.5, -0.5, 1.5, 2.5, -2.5, 0.125, -0.125,
         2.675, 1.005, -1.005, 0.0005, -0.0005, 123456.5, -123456.5]
    )
    for d in (0, 1, 2, 3, 4, 6):
        np.testing.assert_array_equal(sql_round(vals, d), _duckdb_round(vals, d))


def test_banker_disagreement_is_real():
    # prove np.round would fail where sql_round matches DuckDB
    assert float(np.round(55.28625, 4)) == 55.2862  # banker's
    assert sql_round(55.28625, 4) == 55.2863  # DuckDB
    assert _duckdb_round(np.array([55.28625]), 4)[0] == 55.2863


def test_fuzz_vs_duckdb_bit_exact():
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 5000),
            # dense half-ULP plants: k/2 * 10^-d grids
            rng.integers(-10**7, 10**7, 5000) / 2e4,
            rng.integers(-10**5, 10**5, 2000) / 2e2,
        ]
    )
    for d in (0, 2, 4, 6):
        np.testing.assert_array_equal(sql_round(vals, d), _duckdb_round(vals, d))


def test_negative_digits_and_containers():
    assert sql_round(1250.0, -2) == 1300.0  # half away, not to 1200
    assert sql_round(-1250.0, -2) == -1300.0
    s = pd.Series([0.15, None, -0.15], name="x")
    out = sql_round(s, 1)
    assert out.name == "x"
    assert out.iloc[0] == 0.2 and out.iloc[2] == -0.2 and np.isnan(out.iloc[1])
    df = pd.DataFrame({"a": [2.5], "b": [1]})
    out = sql_round(df, 0)
    assert out["a"].iloc[0] == 3.0 and out["b"].iloc[0] == 1  # ints untouched
    assert np.isnan(sql_round(float("nan"), 2))
    assert sql_round(float("inf"), 2) == float("inf")


def test_no_bankers_round_left_in_oracled_sources():
    """Grep gate: no np.round / Series.round / builtin round() in the
    query-surface modules (SQL strings excluded by tokenizing)."""
    import io
    import os
    import tokenize

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)), "kgraft")
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.endswith(".py") or f in ("pipeline.py", "manifest.py"):
                continue
            path = os.path.join(dirpath, f)
            src = open(path).read()
            toks = [
                t
                for t in tokenize.generate_tokens(io.StringIO(src).readline)
                if t.type not in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE)
            ]
            for i, t in enumerate(toks):
                if t.type == tokenize.NAME and t.string in ("round", "around"):
                    nxt = toks[i + 1] if i + 1 < len(toks) else None
                    if nxt is None or nxt.string != "(":
                        continue
                    prev = toks[i - 1] if i > 0 else None
                    owner = toks[i - 2] if i >= 2 else None
                    if (
                        prev is not None
                        and prev.string == "."
                        and owner is not None
                        and owner.string == "pc"
                    ):
                        continue  # pyarrow pc.round is audited separately
                    offenders.append(f"{path}:{t.start[0]}")
    assert offenders == [], offenders


def test_gini_order_value_cross_block_offsets(ray_session, tmp_path):
    """The de-skewed Gini (distributed sort + per-batch algebraic
    partials, VERDICT r3 task 2) equals the direct single-machine rank
    formula, with planted ties crossing batch boundaries."""
    from kgraft.queries import gini_order_value

    rng = np.random.default_rng(11)
    n = 6000  # >> map_batches batch size -> many partials per group
    pri = rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n)
    # coarse grid -> massive tie runs that straddle batch boundaries
    price = np.round(rng.uniform(1, 30, n), 0) * 100.0
    df = pd.DataFrame({"o_orderpriority": pri, "o_totalprice": price})
    df.to_parquet(tmp_path / "orders.parquet")

    got = gini_order_value(str(tmp_path))

    want = []
    for g, d in df.groupby("o_orderpriority"):
        x = np.sort(d["o_totalprice"].to_numpy(np.float64))
        m = float(len(x))
        i = np.arange(1, len(x) + 1, dtype=np.float64)
        want.append(
            {
                "o_orderpriority": g,
                "gini": sql_round(
                    float(np.sum((2 * i - m - 1) * x) / (m * x.sum())), 6
                ),
                "n_orders": len(x),
            }
        )
    want = pd.DataFrame(want).sort_values("o_orderpriority", ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


def test_nan_inf_pass_through_without_warnings():
    """Non-finite inputs propagate unchanged and the vectorized
    half-away path emits NO RuntimeWarning (r4 VERDICT wrong #1: the
    inf-inf intermediate in _round_half_away warned before the
    isfinite mask replaced it)."""
    import warnings

    from kgraft.sqlround import sql_round

    arr = np.array([np.nan, np.inf, -np.inf, 1.5, -2.5, 55.28625])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> test failure
        out = sql_round(arr, 4)
        s = sql_round(pd.Series(arr), 4)
        scalar_nan = sql_round(float("nan"))
        scalar_inf = sql_round(float("inf"), 2)
    assert np.isnan(out[0]) and out[1] == np.inf and out[2] == -np.inf
    assert out[3] == 1.5 and out[4] == -2.5 and out[5] == 55.2863
    assert np.isnan(s.iloc[0]) and s.iloc[1] == np.inf
    assert np.isnan(scalar_nan) and scalar_inf == np.inf
