"""Adversarial tie fuzz for every LIMIT-k-shaped oracled query.

The two classes that produce ``rows_match=true / hash_match=false`` at
the driver are (a) values landing exactly on rounding boundaries —
covered structurally by ``sql_round`` (tests/test_sqlround.py) — and
(b) rank ties at a ``limit(k)`` cut, where the engine and DuckDB must
break the tie IDENTICALLY or the two k-row answers differ.

This sweep rebuilds the sf0.001 tables with every float measure
quantized to 7 levels drawn from its own quantiles (plus a planted
half-ULP level), which floods every ORDER-BY-measure cut with exact
ties, then runs EVERY oracled query whose SQL contains a LIMIT through
the exact driver-precision compare. A query that relies on an
undocumented tiebreak fails here before it fails at the driver.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

# float measures to quantize per table (keys/dates/strings keep their
# values so join structure and selectivity survive)
_QUANTIZE = {
    "part.parquet": ["p_retailprice"],
    "events.parquet": ["value"],
    "customer.parquet": ["c_acctbal"],
    "supplier.parquet": ["s_acctbal"],
    "lineitem.parquet": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders.parquet": ["o_totalprice"],
}


@pytest.fixture(scope="module")
def tie_sf_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("tiefuzz_sf")
    rng = np.random.default_rng(99)
    for fname in os.listdir(src):
        df = pq.read_table(os.path.join(src, fname)).to_pandas()
        for col in _QUANTIZE.get(fname, []):
            x = df[col].to_numpy()
            # 7 quantile levels of the real column, at 2 dp like the
            # original money columns. 2 dp matters: these measures are
            # SUMMED and rounded at 4 dp downstream, and 2 dp inputs
            # keep every true sum >= 0.005 from a rounding boundary, so
            # the ~1e-9 summation-order fp noise (engine partial sums
            # vs DuckDB's order — both correct) can never flip the
            # rounded digit. A 5 dp plant here makes sums land EXACTLY
            # on half-ULP boundaries and fails both engines against
            # each other nondeterministically — that class is inherent
            # to float sums, not a tiebreak bug (verified: planting
            # +0.00005 flips topk_users_by_value by 1e-4). Half-ULP
            # plants for non-aggregated paths live in test_sqlround.py.
            levels = np.round(
                np.quantile(x, [0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]), 2
            )
            df[col] = rng.choice(levels, size=len(df))
        df.to_parquet(dst / fname)
    return str(dst)


def test_limit_k_queries_tie_stable(ray_session, tie_sf_dir):
    from check_oracle import compare_one, oracle_connection

    from kgraft.queries import ORACLE_SQL

    limit_queries = sorted(
        n for n, sql in ORACLE_SQL.items() if "LIMIT" in sql.upper()
    )
    assert len(limit_queries) >= 20  # the sweep must actually cover the class
    con = oracle_connection(tie_sf_dir)
    failures = []
    for name in limit_queries:
        try:
            ok, detail = compare_one(name, tie_sf_dir, con)
        except Exception as e:  # noqa: BLE001 - collect, report all at once
            ok, detail = False, f"{type(e).__name__}: {e}"
        if not ok:
            failures.append(f"{name}: {detail}")
    assert failures == [], "\n".join(failures)


def test_simhash_near_dup_oracle_with_planted_exact_dups(ray_session, tmp_path):
    """The dist-0 edge the real tables never exercise: exact-duplicate
    texts share a fingerprint and must GROUP (the engine's band-0
    star-reduce; the SQL twin's hamming <= 3 includes 0). Plants an
    exact dup and a 1-char near dup and runs the full driver-precision
    compare plus a direct group assertion."""
    import shutil

    from check_oracle import compare_one, oracle_connection

    src = "/root/testdata/sf0.001"
    for f in os.listdir(src):
        shutil.copy(os.path.join(src, f), tmp_path / f)
    d = pd.read_parquet(tmp_path / "documents.parquet")
    base = d.loc[0, "text"]
    d.loc[1, "text"] = base  # exact dup -> identical simhash (dist 0)
    d.loc[2, "text"] = base[:-1] + ("x" if base[-1] != "x" else "y")
    d.to_parquet(tmp_path / "documents.parquet")

    sf = str(tmp_path)
    ok, detail = compare_one("simhash_near_dup", sf, oracle_connection(sf))
    assert ok, detail

    from kgraft.queries import QUERIES

    got = QUERIES["simhash_near_dup"](sf).to_pandas().set_index("doc_id")
    ids = d["doc_id"].to_numpy()
    assert got.loc[ids[1], "dup_group"] == got.loc[ids[0], "dup_group"]
