"""JSON extraction and late-event watermark semantics vs DuckDB / brute force."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from kgraft import streamops


def test_json_extract_typed_and_malformed(ray_session):
    import ray

    df = pd.DataFrame(
        {
            "id": range(8),
            "props": [
                '{"k": 69}',
                '{"k": -3, "other": 1}',
                '{"other": 5}',  # missing field -> NULL
                "not json",  # malformed -> NULL
                '{"k": "str"}',  # non-numeric -> NULL under int64
                '{"k": 2.5}',
                None,  # null input -> NULL
                '{"nested": {"x": 1}, "k": 7}',
            ],
        }
    )
    got = (
        streamops.json_extract(ray.data.from_pandas(df), "props", "k", "k", "float64")
        .to_pandas()
        .sort_values("id")["k"]
        .tolist()
    )
    want = [69.0, -3.0, None, None, None, 2.5, None, 7.0]
    for g, w in zip(got, want):
        assert (pd.isna(g) and w is None) or g == w, (g, w)


def test_late_events_matches_duckdb_window(ray_session):
    import ray

    rng = np.random.RandomState(5)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 17, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 10_000, n), unit="s"),
        }
    )
    lateness_us = 600 * 1_000_000  # 10 minutes
    got = (
        streamops.late_events(
            ray.data.from_pandas(df.sample(frac=1, random_state=3)),
            lateness_us,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")["is_late"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("e", df)
    want = con.sql(
        """
        SELECT CAST(max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) - ts > INTERVAL '10 minutes'
               AS BIGINT) AS is_late
        FROM e ORDER BY event_id
        """
    ).df()["is_late"].tolist()
    assert got == want
    assert sum(got) > 0  # the random stream actually contains late rows


def test_hopping_window_covers_each_row_k_times(ray_session):
    import ray
    import pytest
    from kgraft.errors import PlanError

    rng = np.random.default_rng(7)
    n = 400
    ts = pd.to_datetime(
        rng.integers(1_700_000_000, 1_700_050_000, n) * 1_000_000
        + rng.integers(0, 1_000_000, n),  # sub-second fractions exercised
        unit="us",
    )
    df = pd.DataFrame({"ts": ts, "value": rng.normal(size=n)})
    win = streamops.hopping_window(
        ray.data.from_pandas(df),
        "ts",
        width_s=3600,
        hop_s=900,
        aggs={"n_events": (None, "count"), "total": ("value", "sum")},
    ).to_pandas()

    # every row lands in exactly width/hop = 4 windows
    assert win["n_events"].sum() == 4 * n
    assert np.isclose(win["total"].sum(), 4 * df["value"].sum())
    # brute-force oracle: membership test per (row, window)
    epoch = df["ts"].astype("datetime64[us]").astype("int64") / 1e6
    for ws in win["window_start"].sample(10, random_state=0):
        mask = (epoch >= ws) & (epoch < ws + 3600)
        row = win[win["window_start"] == ws].iloc[0]
        assert row["n_events"] == int(mask.sum())
        assert np.isclose(row["total"], df.loc[mask, "value"].sum())
    # window starts are hop-aligned
    assert (win["window_start"] % 900 == 0).all()

    with pytest.raises(PlanError):
        streamops.hopping_window(
            ray.data.from_pandas(df), "ts", width_s=3600, hop_s=1000, aggs={}
        )


def test_json_extract_nested_shadow_and_string_edge_cases(ray_session):
    """Nested payloads must take the real parse (the anywhere-matching
    regex used to report a NESTED field as top-level), and string edge
    cases survive: a literal "null" value and values with real quote
    characters (review r2)."""
    import ray

    from kgraft.streamops import json_extract

    df = pd.DataFrame(
        {
            "props": [
                '{"meta": {"x": 1}, "x": 2}',   # nested shadow: want 2
                '{"meta": {"x": 1}}',            # nested only: want NULL
                '{"x": 7}',                      # flat fast path
                '{"f": "null"}',                 # literal string "null"
                '{"f": "\\"hi\\""}',             # escaped quotes in value
                '{"f": null}',                   # real JSON null
            ]
        }
    )
    ds = ray.data.from_pandas(df)
    xs = json_extract(ds, "props", "x", "x_val", dtype="int64").to_pandas()["x_val"]
    assert xs.tolist()[:3] == [2, pd.NA, 7] or (
        xs.iloc[0] == 2 and pd.isna(xs.iloc[1]) and xs.iloc[2] == 7
    )
    fs = json_extract(ds, "props", "f", "f_val", dtype="str").to_pandas()["f_val"]
    assert fs.iloc[3] == "null"
    assert fs.iloc[4] == '"hi"'
    assert fs.iloc[5] is None or pd.isna(fs.iloc[5])


def test_json_extract_array_payload_keeps_fast_path_correct(ray_session):
    """Payloads carrying an array AFTER the target field must still
    extract correctly (they now ride the span-checked fast tier), and a
    field shadowed INSIDE a nested container must not leak out."""
    import ray

    from kgraft.streamops import json_extract

    rows = pd.DataFrame(
        {
            "payload": [
                '{"k": 7, "tags": [1, 2, 3]}',      # array after field
                '{"tags": [1, 2], "k": 9}',          # array before field
                '{"nested": {"k": 5}}',              # only nested k -> NULL
                '{"k": 1, "nested": {"k": 5}}',      # top-level wins
                "not json",
            ]
        }
    )
    out = json_extract(
        ray.data.from_pandas(rows), "payload", "k", "k_val"
    ).to_pandas()
    got = out["k_val"].tolist()
    assert got[0] == 7
    assert got[1] == 9
    assert pd.isna(got[2])
    assert got[3] == 1
    assert pd.isna(got[4])


def test_ewma_matches_pandas(ray_session):
    """Distributed per-key EWMA equals the serial pandas recursion."""
    import ray

    from kgraft import streamops

    rng = np.random.RandomState(2)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n),
            "i": np.arange(n, dtype="int64"),
            "x": rng.randn(n).round(3),
        }
    )
    got = (
        streamops.ewma(
            ray.data.from_pandas(df).repartition(4), "k", "i", "x", alpha=0.25
        )
        .to_pandas()
        .sort_values("i", ignore_index=True)
    )
    from kgraft.sqlround import sql_round

    want = sql_round(
        df.sort_values(["k", "i"])
        .groupby("k")["x"]
        .transform(lambda s: s.ewm(alpha=0.25, adjust=False).mean()),
        6,
    )
    np.testing.assert_allclose(
        got.sort_values("i")["ewma"].to_numpy(),
        df.assign(w=want).sort_values("i")["w"].to_numpy(),
        atol=1e-9,
    )


def test_cusum_alarms_planted_shift(ray_session):
    """CUSUM: a planted +3 mean shift mid-series raises the alarm only
    after the shift; the vectorized identity equals the direct
    recursion."""
    import ray

    from kgraft import streamops

    rng = np.random.RandomState(4)
    pre = rng.normal(0, 0.3, 50)
    post = rng.normal(3, 0.3, 50)
    x = np.concatenate([pre, post])
    df = pd.DataFrame(
        {"k": ["a"] * 100, "i": np.arange(100, dtype="int64"), "x": x}
    )
    got = (
        streamops.cusum_alarms(
            ray.data.from_pandas(df).repartition(3),
            "k", "i", "x", target=0.0, slack=0.5, threshold=4.0,
        )
        .to_pandas()
        .sort_values("i", ignore_index=True)
    )
    # direct recursion oracle
    s, want = 0.0, []
    for v in x:
        s = max(0.0, s + v - 0.5)
        want.append(round(s, 6))
    np.testing.assert_allclose(got["cusum"].to_numpy(), want, atol=1e-9)
    assert got.loc[got["i"] < 50, "alarm"].sum() == 0
    assert got.loc[got["i"] >= 52, "alarm"].all()
