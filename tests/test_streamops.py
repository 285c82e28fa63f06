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
