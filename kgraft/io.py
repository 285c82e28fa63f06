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

import numpy as np
import pandas as pd
import pyarrow as pa
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


# ---------------------------------------------------------------------------
# hash-bucketed Parquet layout: co-partitioned storage for shuffle-free joins


def write_bucketed(ds, out_dir: str, on, num_buckets: int = 64) -> None:
    """Write a Dataset as a HASH-BUCKETED Parquet layout: rows land in
    ``__bucket=<b>/`` hive directories by the engine's versioned join
    hash (:func:`kgraft.relational.join_key_hash`) of the key columns.
    Two tables written with the same key types and ``num_buckets`` are
    CO-PARTITIONED: :func:`copartitioned_join` later joins them
    bucket-by-bucket with NO shuffle at all — the storage layout IS the
    exchange, paid once at write time and amortized over every
    downstream join (the Hive/Iceberg bucketing trade). A
    ``_buckets.json`` manifest pins (key, num_buckets, key kind, hash
    version, Arrow schema) so a mismatched join fails fast instead of
    silently mispairing.
    """
    import base64
    import json
    import os

    import numpy as np
    import pyarrow as pa

    from .relational import join_key_hash

    on_cols = [on] if isinstance(on, str) else list(on)
    schema = ds.schema()

    def _arrow_type(t):
        # pandas-block datasets report numpy dtypes; normalize so the
        # manifest always pins Arrow types (object columns are strings
        # by the engine's data model)
        if isinstance(t, pa.DataType):
            return t
        dt = np.dtype(t)
        return pa.string() if dt == np.dtype(object) else pa.from_numpy_dtype(dt)

    types = {n: _arrow_type(t) for n, t in zip(schema.names, schema.types)}
    missing = [c for c in on_cols if c not in types]
    if missing:
        raise ValueError(f"write_bucketed: key column(s) {missing} not in schema")
    import pyarrow.types as pt

    int_keys = all(pt.is_integer(types[c]) for c in on_cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = join_key_hash(t, on_cols, int_keys)
        return t.append_column(
            "__bucket",
            pa.array((h % np.uint64(num_buckets)).astype(np.int64), pa.int64()),
        )

    # atomic publish: write into a scratch dir, manifest last, one rename
    # — an interrupted writer can never leave a half-layout at out_dir
    # that a later retry would silently append into (double-counted rows)
    import shutil

    tmp = out_dir.rstrip("/") + ".inprogress"
    for p in (tmp, out_dir):
        if os.path.exists(p):
            shutil.rmtree(p)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["__bucket"]
    )
    arrow_schema = pa.schema([(n, types[n]) for n in schema.names])
    manifest = {
        "key": on_cols,
        "num_buckets": int(num_buckets),
        "int_keys": bool(int_keys),
        "hash_version": 1,
        "schema_b64": base64.b64encode(arrow_schema.serialize().to_pybytes()).decode(),
    }
    with open(os.path.join(tmp, "_buckets.json"), "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, out_dir)


def _load_bucket_manifest(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_buckets.json")) as f:
        return json.load(f)


def copartitioned_join(left_dir: str, right_dir: str, on, how: str = "inner"):
    """SHUFFLE-FREE equi-join of two hash-bucketed layouts written by
    :func:`write_bucketed`: bucket b of the left joins bucket b of the
    right inside one map task — no exchange, because co-partitioning
    already co-located every key. Validates both manifests (same key,
    bucket count, key kind, hash version) and fails fast on drift.
    Returns a streaming Dataset; join semantics match
    :func:`kgraft.relational.hash_join` (Acero ``pyarrow.Table.join``
    per bucket).
    """
    import base64
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    on_cols = [on] if isinstance(on, str) else list(on)
    lm, rm = _load_bucket_manifest(left_dir), _load_bucket_manifest(right_dir)
    for m, side in ((lm, "left"), (rm, "right")):
        if m["key"] != on_cols:
            raise ValueError(
                f"copartitioned_join: {side} layout is bucketed by "
                f"{m['key']}, join asked for {on_cols}"
            )
    for field in ("num_buckets", "int_keys", "hash_version"):
        if lm[field] != rm[field]:
            raise ValueError(
                f"copartitioned_join: layouts disagree on {field}: "
                f"{lm[field]} vs {rm[field]} — rewrite one side"
            )
    join_type = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }.get(how)
    if join_type is None:
        raise ValueError(f"copartitioned_join: unsupported how={how!r}")
    lschema = pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(lm["schema_b64"]))
    )
    rschema = pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(rm["schema_b64"]))
    )
    shared = [
        c for c in rschema.names if c in lschema.names and c not in on_cols
    ]
    if shared:
        raise ValueError(
            f"copartitioned_join: ambiguous non-key columns on both sides: {shared}"
        )

    n = int(lm["num_buckets"])
    buckets = ray.data.from_items(list(range(n)), override_num_blocks=n)

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in df["item"].tolist():
            lp = sorted(glob.glob(os.path.join(left_dir, f"__bucket={b}", "*.parquet")))
            rp = sorted(glob.glob(os.path.join(right_dir, f"__bucket={b}", "*.parquet")))
            lt = (
                pa.concat_tables([pq.read_table(p, schema=lschema) for p in lp])
                if lp
                else lschema.empty_table()
            )
            rt = (
                pa.concat_tables([pq.read_table(p, schema=rschema) for p in rp])
                if rp
                else rschema.empty_table()
            )
            if how == "inner" and (len(lt) == 0 or len(rt) == 0):
                continue
            j = lt.join(rt, keys=on_cols, join_type=join_type)
            if len(j):
                outs.append(j.to_pandas())
        if not outs:
            cols = list(dict.fromkeys(lschema.names + rschema.names))
            return pd.DataFrame({c: [] for c in cols})
        return pd.concat(outs, ignore_index=True)

    return buckets.map_batches(join_bucket, batch_format="pandas")


def write_sorted(ds, out_dir: str, on: str) -> None:
    """Write a Dataset as a RANGE-CLUSTERED Parquet layout: one global
    sort on ``on`` (Ray's range shuffle), blocks written in key order so
    every file covers a narrow key range. The zone maps are FREE — the
    Parquet footer's column statistics — so :func:`range_scan` later
    prunes at file granularity with no index structure to maintain
    (the Iceberg/Delta sort-clustering trade: one shuffle at write time
    buys every future range predicate a 1/num_files-scale read).
    Published atomically like :func:`write_bucketed` (scratch dir +
    rename); ``_sorted.json`` pins the cluster key."""
    import json
    import os
    import shutil

    tmp = out_dir.rstrip("/") + ".inprogress"
    for p in (tmp, out_dir):
        if os.path.exists(p):
            shutil.rmtree(p)
    ds.sort(on).write_parquet(tmp)
    with open(os.path.join(tmp, "_sorted.json"), "w") as f:
        json.dump({"key": on}, f)
    os.rename(tmp, out_dir)


def _morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave the low 32 bits of two non-negative int64 columns into
    one 64-bit Morton (Z-order) code — vectorized bit spreading."""

    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    return (spread(a) | (spread(b) << np.uint64(1))).astype(np.int64)


def write_zorder(ds, out_dir: str, on: tuple, quantize=None) -> None:
    """Write a Dataset as a Z-ORDER-CLUSTERED Parquet layout: rows are
    globally sorted by the Morton interleave of TWO key columns, so
    every file covers a small rectangle in (key1, key2) space and the
    Parquet footer min/max of EACH key column prunes 2-D range
    predicates — the Delta/Iceberg OPTIMIZE ZORDER trade (a linear sort
    clusters one dimension perfectly and the other not at all; the
    Morton curve splits the locality between both).

    ``quantize``: optional (q1, q2) divisors applied before
    interleaving (floats/wide ranges quantize to curve cells; pruning
    correctness never depends on it — footer stats are exact either
    way). Published atomically; ``_zorder.json`` pins the keys."""
    import json
    import os
    import shutil

    c1, c2 = on
    q1, q2 = quantize if quantize is not None else (1, 1)

    def add_code(df):
        a = (df[c1].to_numpy(np.float64) / q1).astype(np.int64)
        b = (df[c2].to_numpy(np.float64) / q2).astype(np.int64)
        out = df.copy()
        out["__z"] = _morton2(np.maximum(a, 0), np.maximum(b, 0))
        return out

    tmp = out_dir.rstrip("/") + ".inprogress"
    for p in (tmp, out_dir):
        if os.path.exists(p):
            shutil.rmtree(p)
    (
        ds.map_batches(add_code, batch_format="pandas")
        .sort("__z")
        .drop_columns(["__z"])
        .write_parquet(tmp)
    )
    with open(os.path.join(tmp, "_zorder.json"), "w") as f:
        json.dump({"keys": [c1, c2]}, f)
    os.rename(tmp, out_dir)


def _file_minmax(path: str, key: str):
    """(min, max) of ``key`` across a file's row groups from footer
    statistics only; (None, None) when any group lacks stats."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    fmin = fmax = None
    for rg in range(md.num_row_groups):
        col = None
        for ci in range(md.num_columns):
            c = md.row_group(rg).column(ci)
            if c.path_in_schema == key:
                col = c
                break
        st = col.statistics if col is not None else None
        if st is None or not st.has_min_max:
            return None, None
        fmin = st.min if fmin is None else min(fmin, st.min)
        fmax = st.max if fmax is None else max(fmax, st.max)
    return fmin, fmax


def zorder_scan(layout_dir: str, bounds: dict, columns=None):
    """2-D (or 1-D) range read over a :func:`write_zorder` layout:
    prune files whose footer rectangle misses ANY requested bound
    (``bounds`` maps key -> (lo, hi), either end None), then close the
    coarse file granularity with an exact map-side filter. Returns
    ``(dataset, kept_files, total_files)`` so callers can assert the
    pruning actually happened."""
    import glob
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    with open(os.path.join(layout_dir, "_zorder.json")) as f:
        keys = json.load(f)["keys"]
    for k in bounds:
        if k not in keys:
            raise ValueError(f"{k!r} is not a zorder key of this layout")
    files = sorted(glob.glob(os.path.join(layout_dir, "*.parquet")))
    kept = []
    for path in files:
        ok = True
        for k, (lo, hi) in bounds.items():
            fmin, fmax = _file_minmax(path, k)
            if fmin is None:
                continue  # stat-less: cannot prune on this key
            if (lo is not None and fmax < lo) or (hi is not None and fmin > hi):
                ok = False
                break
        if ok:
            kept.append(path)
    if not kept:
        schema = pq.read_schema(files[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table()), 0, len(files)
    read_cols = columns
    if columns:
        read_cols = list(dict.fromkeys(list(columns) + list(bounds)))
    ds = ray.data.read_parquet(kept, columns=read_cols)

    def exact(t: "pa.Table") -> "pa.Table":
        m = None
        for k, (lo, hi) in bounds.items():
            if lo is not None:
                c = pc.greater_equal(t[k], lo)
                m = c if m is None else pc.and_(m, c)
            if hi is not None:
                c = pc.less_equal(t[k], hi)
                m = c if m is None else pc.and_(m, c)
        out = t.filter(m) if m is not None else t
        if columns:
            out = out.select(list(columns))
        return out

    return ds.map_batches(exact, batch_format="pyarrow"), len(kept), len(files)


def prune_range_files(layout_dir: str, lo=None, hi=None):
    """Zone-map pruning over a :func:`write_sorted` layout: return
    ``(kept_files, total_files)`` where kept files are those whose
    footer min/max range for the cluster key overlaps ``[lo, hi]``
    (either bound may be None = unbounded). Footer reads only — no row
    data is touched."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(layout_dir, "_sorted.json")) as f:
        key = json.load(f)["key"]
    files = sorted(glob.glob(os.path.join(layout_dir, "*.parquet")))
    kept = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            col = None
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == key:
                    col = c
                    break
            st = col.statistics if col is not None else None
            if st is None or not st.has_min_max:
                fmin = fmax = None  # no stats -> cannot prune this file
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None:  # stat-less file: keep (correctness over pruning)
            kept.append(path)
            continue
        if (lo is None or fmax >= lo) and (hi is None or fmin <= hi):
            kept.append(path)
    return kept, len(files)


def range_scan(layout_dir: str, lo=None, hi=None, columns=None):
    """Range read over a :func:`write_sorted` layout: zone-map-prune to
    the overlapping files, then apply the EXACT bound filter map-side
    (file granularity is coarse; the residual filter closes it).
    Returns a streaming Dataset; ``columns`` prunes at the read."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    with open(os.path.join(layout_dir, "_sorted.json")) as f:
        key = json.load(f)["key"]
    kept, _total = prune_range_files(layout_dir, lo, hi)
    if not kept:
        import glob

        import pyarrow.parquet as pq

        any_file = sorted(glob.glob(os.path.join(layout_dir, "*.parquet")))[0]
        schema = pq.read_schema(any_file)
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    read_cols = columns
    if columns and key not in columns:
        read_cols = list(columns) + [key]
    ds = ray.data.read_parquet(kept, columns=read_cols)

    def exact(t: "pa.Table") -> "pa.Table":
        m = None
        if lo is not None:
            m = pc.greater_equal(t[key], lo)
        if hi is not None:
            mh = pc.less_equal(t[key], hi)
            m = mh if m is None else pc.and_(m, mh)
        out = t.filter(m) if m is not None else t
        return out.select(columns) if columns and key not in columns else out

    return ds.map_batches(exact, batch_format="pyarrow")


def bucket_lookup(layout_dir: str, key_values) -> pd.DataFrame:
    """Point lookup against a :func:`write_bucketed` layout: hash the
    probe keys with the layout's own join hash and read ONLY the
    buckets they land in — the index-like read path the bucketed layout
    buys besides shuffle-free joins (1/num_buckets of the table scanned
    per probed bucket, no shuffle, no full scan). Probe sets are
    point-lookup-scale by definition, so the result returns as pandas.

    ``key_values``: list of scalars (single-column key) or tuples
    (composite key), in manifest key order.
    """
    import base64
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .relational import join_key_hash

    m = _load_bucket_manifest(layout_dir)
    on_cols = m["key"]
    schema = pa.ipc.read_schema(
        pa.BufferReader(base64.b64decode(m["schema_b64"]))
    )
    rows = [
        kv if isinstance(kv, (tuple, list)) else (kv,) for kv in key_values
    ]
    if not rows:
        return schema.empty_table().to_pandas()
    if any(len(r) != len(on_cols) for r in rows):
        raise ValueError(
            f"bucket_lookup: layout key is {on_cols}; every probe must "
            f"have {len(on_cols)} value(s)"
        )
    probe = pa.table(
        {
            c: pa.array([r[i] for r in rows], schema.field(c).type)
            for i, c in enumerate(on_cols)
        }
    )
    h = join_key_hash(probe, on_cols, bool(m["int_keys"]))
    buckets = np.unique((h % np.uint64(int(m["num_buckets"]))).astype(np.int64))
    probe_d = pa.TableGroupBy(probe, on_cols).aggregate([]).select(on_cols)
    outs = []
    for b in buckets:
        paths = sorted(
            glob.glob(os.path.join(layout_dir, f"__bucket={b}", "*.parquet"))
        )
        if not paths:
            continue
        t = pa.concat_tables([pq.read_table(p, schema=schema) for p in paths])
        j = t.join(probe_d, keys=on_cols, join_type="left semi")
        if len(j):
            outs.append(j.to_pandas())
    if not outs:
        return schema.empty_table().to_pandas()
    return pd.concat(outs, ignore_index=True)


def compact(in_dir: str, out_dir: str, target_mb: int = 128) -> dict:
    """Small-file compaction (lakehouse table maintenance): rewrite a
    directory of Parquet fragments into ~``target_mb``-sized files,
    preserving the row multiset exactly -> stats dict
    ``{n_files_in, n_files_out, n_rows, bytes_in}``.

    The checkpoint writer (and any incremental ingest) legitimately
    emits one small fragment per (task, partition); after enough
    increments a reader pays per-file open/footer costs and Ray's
    default splitting shreds the table into tiny blocks (the measured
    `_read_kg_edges` effect). Compaction is the standard maintenance
    pass: one streaming read -> ``repartition(n_out)`` (a split/coalesce
    plan, NOT an all-to-all shuffle — row order inside fragments is
    already meaningless to the engine's order-insensitive semantics) ->
    atomic publish (scratch dir + rename, the :func:`write_bucketed`
    discipline), so an interrupted compaction never leaves a
    half-written table.
    """
    import glob as _glob
    import math
    import os
    import shutil

    import ray

    files = sorted(_glob.glob(os.path.join(in_dir, "*.parquet")))
    if not files:
        raise ValueError(f"compact: no parquet fragments under {in_dir!r}")
    if os.path.abspath(in_dir) == os.path.abspath(out_dir):
        raise ValueError("compact: out_dir must differ from in_dir")
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / (target_mb << 20)))

    ds = ray.data.read_parquet(files)
    tmp = out_dir.rstrip("/") + ".inprogress"
    for p in (tmp, out_dir):
        if os.path.exists(p):
            shutil.rmtree(p)
    n_rows = ds.count()
    ds.repartition(n_out).write_parquet(tmp)
    os.rename(tmp, out_dir)
    return {
        "n_files_in": len(files),
        "n_files_out": len(_glob.glob(os.path.join(out_dir, "*.parquet"))),
        "n_rows": int(n_rows),
        "bytes_in": int(bytes_in),
    }


def write_partitioned(ds, out_dir: str, by: str) -> None:
    """Hive-style VALUE-partitioned Parquet layout: rows land under
    ``<by>=<value>/`` directories (Ray's native ``partition_cols``
    write), published atomically (scratch dir + rename, the
    :func:`write_bucketed` discipline). The complement of the hash
    layout: :func:`write_bucketed` co-partitions for joins,
    this co-locates for PRUNED SCANS — a downstream filter on the
    partition column reads only its directories
    (:func:`read_partition`), the standard lake layout for
    low-cardinality scan keys (lang, source, date)."""
    import os
    import shutil

    tmp = out_dir.rstrip("/") + ".inprogress"
    for p in (tmp, out_dir):
        if os.path.exists(p):
            shutil.rmtree(p)
    ds.write_parquet(tmp, partition_cols=[by])
    os.rename(tmp, out_dir)


def read_partition(layout_dir: str, by: str, values, columns=None):
    """Pruned read of a :func:`write_partitioned` layout: only the
    ``<by>=<value>/`` directories of the requested ``values`` are
    listed and scanned — 1/cardinality of the table per value, no
    post-read filter needed. Missing values are simply absent (no
    error), matching SQL filter semantics. The partition column comes
    back as a regular column (Ray's hive read restores it from the
    directory names)."""
    import os

    import ray

    if isinstance(values, str):
        values = [values]
    dirs = [
        d
        for d in (os.path.join(layout_dir, f"{by}={v}") for v in values)
        if os.path.isdir(d)
    ]
    if not dirs:
        raise ValueError(
            f"read_partition: no partitions for {values!r} under {layout_dir!r}"
        )
    # one read per directory (a path LIST disables pyarrow's directory
    # expansion); hive inference restores the partition column per dir
    pieces = [ray.data.read_parquet(d, columns=columns) for d in dirs]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def read_evolved(snapshot_dirs, columns=None):
    """Schema-evolution read: union several Parquet snapshots whose
    schemas differ by ADDED (or dropped) columns — every row comes back
    under the UNION schema, with columns a snapshot lacks filled as
    typed nulls. The incremental-ingest reality at 100 TB: a crawl adds
    a field in March and the January snapshot must still scan.

    Column order follows first appearance across ``snapshot_dirs``;
    a column whose Arrow type CONFLICTS across snapshots fails fast
    with the two types named (silent casts corrupt downstream typed
    operators). Alignment is map-side (``pa.nulls`` append — no copy of
    existing buffers); the union is a zero-shuffle plan concatenation.
    """
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    if isinstance(snapshot_dirs, str):
        snapshot_dirs = [snapshot_dirs]
    groups = []
    union: dict[str, pa.DataType] = {}
    for d in snapshot_dirs:
        files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            raise ValueError(f"read_evolved: no parquet files under {d!r}")
        sch = pq.read_schema(files[0])
        for name, typ in zip(sch.names, sch.types):
            if name in union and union[name] != typ:
                raise ValueError(
                    f"read_evolved: column {name!r} type conflict — "
                    f"{union[name]} vs {typ} (in {d!r})"
                )
            union.setdefault(name, typ)
        groups.append((files, set(sch.names)))
    if columns is not None:
        missing = [c for c in columns if c not in union]
        if missing:
            raise ValueError(f"read_evolved: unknown column(s) {missing}")
        out_names = list(columns)
    else:
        out_names = list(union)

    pieces = []
    for files, have in groups:
        cols_here = [c for c in out_names if c in have]
        # a snapshot with NONE of the requested columns still contributes
        # its row count (all-null rows) — read one narrow column for length
        read_cols = cols_here or [sorted(have)[0]]

        def align(t: pa.Table, _have=tuple(cols_here)) -> pa.Table:
            arrays = []
            for name in out_names:
                if name in _have:
                    arrays.append(t[name])
                else:
                    arrays.append(pa.nulls(len(t), union[name]))
            return pa.table(dict(zip(out_names, arrays)))

        pieces.append(
            ray.data.read_parquet(files, columns=read_cols).map_batches(
                align, batch_format="pyarrow"
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out
