"""Format round-trips: parquet -> JSONL/CSV -> Dataset must preserve
values and (via the dtype pin) types."""

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _events_pd():
    import pyarrow.parquet as pq

    return (
        pq.read_table(f"{SF_DIR}/events.parquet")
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )


def test_jsonl_roundtrip_events(ray_session, tmp_path):
    import ray

    from kgraft import io as kio

    want = _events_pd()
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "ev_jsonl")
    kio.write_jsonl(ds, out)
    back = (
        kio.read_jsonl(out, dtypes={"ts": "datetime64[us]", "event_id": "int64",
                                    "user_id": "int64", "value": "float64"})
        .to_pandas()
        .sort_values("event_id", ignore_index=True)[want.columns]
    )
    assert back["ts"].dtype == want["ts"].astype("datetime64[us]").dtype
    pd.testing.assert_frame_equal(
        back.assign(ts=back["ts"].astype("datetime64[us]")),
        want.assign(ts=want["ts"].astype("datetime64[us]")),
    )


def test_csv_roundtrip_customer(ray_session, tmp_path):
    import ray

    from kgraft import io as kio

    import pyarrow.parquet as pq

    want = (
        pq.read_table(f"{SF_DIR}/customer.parquet")
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)
    )
    ds = ray.data.read_parquet(f"{SF_DIR}/customer.parquet")
    out = str(tmp_path / "cust_csv")
    kio.write_csv(ds, out)
    back = (
        kio.read_csv(out, dtypes={"c_custkey": "int64", "c_nationkey": "int32",
                                  "c_acctbal": "float64"})
        .to_pandas()
        .sort_values("c_custkey", ignore_index=True)[want.columns]
    )
    pd.testing.assert_frame_equal(back, want)
