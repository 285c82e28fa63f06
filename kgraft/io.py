"""Source/sink formats beyond Parquet: JSONL and CSV.

Thin, schema-pinning wrappers over Ray Data's native readers/writers.
The wrappers exist for the dtype ROUND-TRIP contract: JSON and CSV
erase types on disk (timestamps become ISO strings, ints can widen or
stringify), so a pipeline that accepts these feeds needs the read side
to re-pin the schema before any operator sees the batch — every engine
operator assumes typed columns (int64 keys for the pack-shuffle join,
datetime64 for the window family). Pass ``dtypes`` with the intended
pandas dtypes; parsing happens once, map-side, at the read.

Scale notes: both readers are Ray Data streaming sources (per-file
blocks, no driver materialization); both writers emit one file per
block into a directory — the same resumable partitioned-output layout
the KG checkpoint writer uses. Parquet remains the recommended format
(typed, columnar, prunable); these are ingestion/egress seams.

Reference: forsummer/Gondar's sinks are a joined string and an
in-memory DataFrame (SURVEY.md §2.1 S4/S5); file-format coverage is
engine-contract territory.
"""

from __future__ import annotations

import pandas as pd
import ray


def _pin(df: pd.DataFrame, dtypes: dict | None) -> pd.DataFrame:
    if not dtypes:
        return df
    for col, dt in dtypes.items():
        if col not in df.columns:
            continue
        if str(dt).startswith("datetime64"):
            s = df[col]
            if pd.api.types.is_integer_dtype(s):
                # Arrow's JSON writer emits timestamps as epoch ints in
                # the column's storage unit; take the target dtype's
                # unit as that unit (default us)
                unit = (
                    str(dt).split("[", 1)[1].rstrip("]")
                    if "[" in str(dt)
                    else "us"
                )
                df[col] = pd.to_datetime(s, unit=unit).astype(dt)
            else:
                df[col] = pd.to_datetime(s).astype(dt)
        else:
            df[col] = df[col].astype(dt)
    return df


def _isoify(df: pd.DataFrame) -> pd.DataFrame:
    # Ray's JSON sink truncates timestamps to epoch SECONDS; write
    # ISO-8601 with microseconds instead so the round-trip is lossless
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    return df


def write_jsonl(ds, out_dir: str) -> None:
    """Dataset -> directory of JSONL files (one per block); timestamp
    columns serialize as microsecond ISO-8601 strings (lossless)."""
    ds.map_batches(_isoify, batch_format="pandas").write_json(out_dir)


def read_jsonl(paths, dtypes: dict | None = None):
    """JSONL file(s)/dir -> Dataset with ``dtypes`` re-pinned map-side."""
    ds = ray.data.read_json(paths)
    if dtypes:
        ds = ds.map_batches(
            lambda df: _pin(df, dtypes), batch_format="pandas"
        )
    return ds


def write_csv(ds, out_dir: str) -> None:
    """Dataset -> directory of CSV files (one per block, with header);
    timestamps serialize as microsecond ISO-8601 (same contract as
    :func:`write_jsonl`)."""
    ds.map_batches(_isoify, batch_format="pandas").write_csv(out_dir)


def read_csv(paths, dtypes: dict | None = None):
    """CSV file(s)/dir -> Dataset with ``dtypes`` re-pinned map-side."""
    ds = ray.data.read_csv(paths)
    if dtypes:
        ds = ds.map_batches(
            lambda df: _pin(df, dtypes), batch_format="pandas"
        )
    return ds
