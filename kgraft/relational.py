"""Generic relational operators over ``ray.data.Dataset`` (SURVEY.md §2.2
row 12).

The reference has no relational algebra at all (SURVEY.md §2.1 "does NOT
implement"); this layer supplies the filter/project/join/aggregate/sort/
distinct/union/dedup surface a user of the engine needs, each realized
with the Ray Data primitive that scales:

* filters/projections — vectorized ``map_batches`` over Arrow
* aggregations — **map-side partial aggregation** then a small groupby
  (never shuffles raw rows; defuses key skew)
* joins — broadcast (``ray.put``) for small sides; bucketed hash join
  (``groupby(bucket).map_groups`` with a pandas merge per bucket) for
  large-large; semi/anti via broadcast key sets
* top-k — ``sort().limit()``
* distinct — groupby-first

No function here calls ``ray.init``.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .hashing import hash_strings
from .errors import ConfigError, PlanError, SchemaError
from kgraft.sqlround import sql_round

# ---------------------------------------------------------------------------
# sources


def read_table(sf_dir: str, name: str, columns=None):
    """Column-pruned parquet read of one testdata table.

    Block sizing: Ray's parallelism floor (~2 x CPUs) shreds a small
    file into ~64 tiny blocks, and every downstream exchange then pays
    ~64 per-task fixed costs PER SIDE — which dominates wall time at
    test scale (measured: orders x customer hash_join at sf0.1 is
    2.7-3.8 s with default 64-way splits vs 0.45 s at 8 blocks). For
    files under 512 MB we override to ~1 MB of compressed bytes per
    block; ``documents``/``embeddings`` keep a 16-block floor because
    their downstream kernels (shingling, signatures, matmuls) are
    CPU-dense per row and need the actor pools fed. Files at or above
    512 MB keep Ray's own size-based sizing, which already targets
    ~128 MB in-memory blocks — so at corpus scale block count grows
    with the data, exactly as the 100-TB layout needs.
    """
    import os as _os

    path = f"{sf_dir}/{name}.parquet"
    kwargs = {}
    try:
        size = _os.path.getsize(path)
    except OSError:
        size = None
    if size is not None and size < 512 * (1 << 20):
        floor = 16 if name in ("documents", "embeddings") else 1
        kwargs["override_num_blocks"] = int(max(floor, size // (1 << 20)))
    return ray.data.read_parquet(path, columns=columns, **kwargs)


# ---------------------------------------------------------------------------
# per-batch transforms


def filter_batches(ds, predicate):
    """Vectorized filter: ``predicate(pa.Table) -> BooleanArray``."""
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow"
    )


def project(ds, exprs):
    """``exprs``: dict of out_col -> fn(pa.Table) -> Array. Keeps only them."""

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({name: e(t) for name, e in exprs.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bucketed reduce: shuffle on a coarse bucket, vectorized reduce inside.
# Ray's native groupby().aggregate() pays per-group Python overhead in the
# reduce, which is pathological for high-cardinality keys; grouping on
# ``hash(key) % B`` keeps the Ray group count at B while the exact
# per-key reduction happens as one vectorized pandas groupby per bucket.


def bucketed_groupby_apply(ds, keys, apply_fn, num_buckets: int = 64):
    """``apply_fn(pd.DataFrame) -> pd.DataFrame`` runs once per bucket on
    all rows whose key hashes into it (co-location guarantee: every row
    of a given key lands in exactly one bucket)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.uint64)
        for k in keys:
            h ^= pd.util.hash_pandas_object(df[k], index=False).to_numpy(
                dtype=np.uint64
            )
        df = df.copy()
        df["__bucket"] = (h % np.uint64(num_buckets)).astype("int64")
        return df

    bucketed = ds.map_batches(add_bucket, batch_format="pandas")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return apply_fn(g.drop(columns=["__bucket"]))

    return bucketed.groupby("__bucket").map_groups(run, batch_format="pandas")


# ---------------------------------------------------------------------------
# aggregation: map-side partials -> small global groupby


def pre_aggregate_ds(ds, keys, aggs, num_buckets: int = 64):
    """Grouped aggregation with per-batch partial combine — Dataset out.

    ``aggs``: dict out_col -> (in_col, kind) with kind in
    {sum, count, min, max, mean, var, std, skew, kurt, corr, covar,
    wavg, regr_slope, regr_intercept}. Mean is computed
    from sum + NON-NULL count partials (SQL semantics: nulls are excluded
    from the divisor). ``var``/``std`` are SAMPLE variance/stddev
    (ddof=1, DuckDB ``var_samp``/``stddev_samp``) from (sum, sum-of-
    squares, non-null count) partials; ``corr``/``covar`` take in_col as
    a PAIR ``(x_col, y_col)`` and reduce the five cross-moment sums over
    rows where BOTH are non-null (DuckDB ``corr``/``covar_samp``);
    ``regr_slope``/``regr_intercept`` take in_col as ``(y_col, x_col)``
    — SQL argument order ``regr_slope(y, x)`` — and reduce the same
    five cross-moment sums (population covariance over variance, DuckDB
    semantics: NULL when var_pop(x) = 0); ``wavg``
    takes in_col as ``(x_col, weight_col)`` and reduces (sum(w*x), sum(w))
    over pairwise-non-null rows — SQL ``SUM(x*w) / SUM(w)``. All of
    these are algebraic — one partial row per (key, batch) crosses the
    shuffle no matter how many raw rows fed it.
    Raw rows never shuffle — only one partial row per (key, batch) does,
    which is what makes Zipf-skewed keys safe at 100 TB (SURVEY.md §4
    skew row) — and the merged result STAYS a Dataset, so
    corpus-cardinality keys (per-order, per-user) never collect to the
    driver; follow with :func:`top_k` / ``write_parquet`` / a join.
    """
    sum_cols, min_cols, max_cols, var_cols, corr_cols = [], [], [], [], []
    wavg_cols, skew_cols = [], []
    for out, (col, kind) in aggs.items():
        if kind in ("sum", "mean"):
            sum_cols.append((out, col, kind))
        elif kind == "wavg":
            wavg_cols.append((out, col))  # col = (x_col, weight_col)
        elif kind == "count":
            sum_cols.append((out, None, "count"))
        elif kind == "min":
            min_cols.append((out, col))
        elif kind == "max":
            max_cols.append((out, col))
        elif kind in ("var", "std"):
            var_cols.append((out, col, kind))
        elif kind in ("skew", "kurt"):
            # adjusted Fisher-Pearson G1 / excess G2 — DuckDB
            # skewness()/kurtosis() (== pandas .skew()/.kurt()) from four
            # power-sum partials. Raw power sums cancel badly when
            # |mean| >> std at huge n; fine for bounded business columns,
            # documented trade vs a sequential pairwise-update merge.
            skew_cols.append((out, col, kind))
        elif kind in ("corr", "covar", "regr_slope", "regr_intercept"):
            # corr/covar: col = (x_col, y_col); regr_*: col = (y_col, x_col)
            # — SQL argument order regr_slope(y, x). All four reduce the
            # same five cross-moment sums; only the finalize differs.
            corr_cols.append((out, col, kind))
        else:
            raise PlanError(f"unknown aggregate kind {kind!r}")

    key_list = [keys] if isinstance(keys, str) else list(keys)
    need_n = any(kind == "count" for _, _, kind in sum_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or any(k not in df.columns for k in key_list):
            # empty upstream groups can yield schema-less blocks. When the
            # empty block still carries typed columns, mirror THEIR dtypes
            # — a float64 placeholder next to int64/datetime partials from
            # non-empty blocks is an Arrow schema conflict (review r2)
            def _dt(c, fallback):
                return df[c].dtype if c in df.columns else fallback

            cols = {k: pd.Series([], dtype=_dt(k, object)) for k in key_list}
            cols["__n"] = pd.Series([], dtype="int64")
            for out, col, kind in sum_cols:
                if kind != "count":
                    cols[f"__sum_{out}"] = pd.Series([], dtype=_dt(col, "float64"))
                    cols[f"__cnt_{out}"] = pd.Series([], dtype="int64")
            for out, col in min_cols:
                cols[f"__min_{out}"] = pd.Series([], dtype=_dt(col, "float64"))
            for out, col in max_cols:
                cols[f"__max_{out}"] = pd.Series([], dtype=_dt(col, "float64"))
            for out, _, _ in var_cols:
                for p in ("s1", "s2"):
                    cols[f"__{p}_{out}"] = pd.Series([], dtype="float64")
                cols[f"__c_{out}"] = pd.Series([], dtype="int64")
            for out, _, _ in skew_cols:
                for p in ("p1", "p2", "p3", "p4"):
                    cols[f"__{p}_{out}"] = pd.Series([], dtype="float64")
                cols[f"__pc_{out}"] = pd.Series([], dtype="int64")
            for out, _, _ in corr_cols:
                for p in ("sx", "sy", "sxx", "syy", "sxy"):
                    cols[f"__{p}_{out}"] = pd.Series([], dtype="float64")
                cols[f"__cn_{out}"] = pd.Series([], dtype="int64")
            for out, _ in wavg_cols:
                cols[f"__swx_{out}"] = pd.Series([], dtype="float64")
                cols[f"__sw_{out}"] = pd.Series([], dtype="float64")
            return pd.DataFrame(cols)
        derived = {}
        for out, col, _ in var_cols:
            v = df[col].astype("float64")
            derived[f"__sq_{out}"] = v * v
        for out, col, _ in skew_cols:
            v = df[col].astype("float64")
            v2 = v * v
            derived[f"__pw2_{out}"] = v2
            derived[f"__pw3_{out}"] = v2 * v
            derived[f"__pw4_{out}"] = v2 * v2
        for out, (xc, yc), _ in corr_cols:
            x, y = df[xc].astype("float64"), df[yc].astype("float64")
            m = x.notna() & y.notna()
            xm, ym = x.where(m), y.where(m)
            derived[f"__x_{out}"] = xm
            derived[f"__y_{out}"] = ym
            derived[f"__xx_{out}"] = xm * xm
            derived[f"__yy_{out}"] = ym * ym
            derived[f"__xy_{out}"] = xm * ym
        for out, (xc, wc) in wavg_cols:
            x, w = df[xc].astype("float64"), df[wc].astype("float64")
            m = x.notna() & w.notna()  # pairwise nulls, like corr/covar
            derived[f"__wx_{out}"] = (x * w).where(m)
            derived[f"__wo_{out}"] = w.where(m)
        if derived:
            df = df.assign(**derived)
        # dropna=False: SQL GROUP BY keeps the NULL-key group (review r2)
        g = df.groupby(keys, observed=True, sort=False, dropna=False)
        parts = {}
        parts["__n"] = g.size()
        for out, col, kind in sum_cols:
            if kind == "count":
                continue
            parts[f"__sum_{out}"] = g[col].sum()
            # non-null count: g[col].sum() skips nulls, so the mean
            # divisor must too (ADVICE r1), and SQL SUM over an all-null
            # group is NULL, not 0 — the finalize nulls those out
            parts[f"__cnt_{out}"] = g[col].count()
        for out, col in min_cols:
            parts[f"__min_{out}"] = g[col].min()
        for out, col in max_cols:
            parts[f"__max_{out}"] = g[col].max()
        for out, col, _ in var_cols:
            parts[f"__s1_{out}"] = g[col].sum()
            parts[f"__s2_{out}"] = g[f"__sq_{out}"].sum()
            parts[f"__c_{out}"] = g[col].count()
        for out, col, _ in skew_cols:
            parts[f"__p1_{out}"] = g[col].sum()
            parts[f"__p2_{out}"] = g[f"__pw2_{out}"].sum()
            parts[f"__p3_{out}"] = g[f"__pw3_{out}"].sum()
            parts[f"__p4_{out}"] = g[f"__pw4_{out}"].sum()
            parts[f"__pc_{out}"] = g[col].count()
        for out, _, _ in corr_cols:
            for p, c in (
                ("sx", "__x_"), ("sy", "__y_"), ("sxx", "__xx_"),
                ("syy", "__yy_"), ("sxy", "__xy_"),
            ):
                parts[f"__{p}_{out}"] = g[f"{c}{out}"].sum()
            parts[f"__cn_{out}"] = g[f"__x_{out}"].count()
        for out, _ in wavg_cols:
            parts[f"__swx_{out}"] = g[f"__wx_{out}"].sum()
            parts[f"__sw_{out}"] = g[f"__wo_{out}"].sum()
        return pd.DataFrame(parts).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    agg_plan = {"__n": "sum"}
    for out, col, kind in sum_cols:
        if kind != "count":
            agg_plan[f"__sum_{out}"] = "sum"
            agg_plan[f"__cnt_{out}"] = "sum"
    for out, _ in min_cols:
        agg_plan[f"__min_{out}"] = "min"
    for out, _ in max_cols:
        agg_plan[f"__max_{out}"] = "max"
    for out, _, _ in var_cols:
        for p in ("s1", "s2", "c"):
            agg_plan[f"__{p}_{out}"] = "sum"
    for out, _, _ in skew_cols:
        for p in ("p1", "p2", "p3", "p4", "pc"):
            agg_plan[f"__{p}_{out}"] = "sum"
    for out, _, _ in corr_cols:
        for p in ("sx", "sy", "sxx", "syy", "sxy", "cn"):
            agg_plan[f"__{p}_{out}"] = "sum"
    for out, _ in wavg_cols:
        agg_plan[f"__swx_{out}"] = "sum"
        agg_plan[f"__sw_{out}"] = "sum"

    def merge_finalize(g: pd.DataFrame) -> pd.DataFrame:
        merged = g.groupby(
            key_list, as_index=False, observed=True, sort=False, dropna=False
        ).agg(
            agg_plan
        )
        out_df = merged[key_list].copy()
        for out, col, kind in sum_cols:
            if kind == "count":
                out_df[out] = merged["__n"].astype("int64")
            elif kind == "sum":
                # SQL: SUM over an all-null group is NULL, not 0
                out_df[out] = merged[f"__sum_{out}"].where(
                    merged[f"__cnt_{out}"] > 0
                )
            else:  # mean
                out_df[out] = merged[f"__sum_{out}"] / merged[f"__cnt_{out}"]
        for out, _ in min_cols:
            out_df[out] = merged[f"__min_{out}"]
        for out, _ in max_cols:
            out_df[out] = merged[f"__max_{out}"]
        for out, _, kind in var_cols:
            c = merged[f"__c_{out}"]
            var = (
                merged[f"__s2_{out}"] - merged[f"__s1_{out}"] ** 2 / c
            ) / (c - 1)
            var = var.where(c > 1)  # SQL: NULL below 2 samples
            out_df[out] = np.sqrt(var.clip(lower=0)) if kind == "std" else var
        for out, _, kind in skew_cols:
            c = merged[f"__pc_{out}"].astype("float64")
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = merged[f"__p1_{out}"] / c
                e2 = merged[f"__p2_{out}"] / c
                e3 = merged[f"__p3_{out}"] / c
                e4 = merged[f"__p4_{out}"] / c
                m2 = e2 - mean**2
                if kind == "skew":
                    m3 = e3 - 3 * mean * e2 + 2 * mean**3
                    g1 = m3 / m2**1.5
                    val = g1 * np.sqrt(c * (c - 1)) / (c - 2)
                    # DuckDB skewness(): NULL below 3 samples or zero var
                    val = val.where((c > 2) & (m2 > 0))
                else:
                    m4 = e4 - 4 * mean * e3 + 6 * mean**2 * e2 - 3 * mean**4
                    g2 = m4 / m2**2 - 3.0
                    val = ((c + 1) * g2 + 6) * (c - 1) / ((c - 2) * (c - 3))
                    # DuckDB kurtosis(): NULL below 4 samples or zero var
                    val = val.where((c > 3) & (m2 > 0))
            out_df[out] = val.replace([np.inf, -np.inf], np.nan)
        for out, _, kind in corr_cols:
            n = merged[f"__cn_{out}"]
            sx, sy = merged[f"__sx_{out}"], merged[f"__sy_{out}"]
            sxx, syy = merged[f"__sxx_{out}"], merged[f"__syy_{out}"]
            sxy = merged[f"__sxy_{out}"]
            if kind == "covar":
                val = ((sxy - sx * sy / n) / (n - 1)).where(n > 1)
            elif kind in ("regr_slope", "regr_intercept"):
                # pair order is (y, x): sx/sxx track y, sy/syy track x.
                # slope = covar_pop(y,x)/var_pop(x); NULL when n = 0 or
                # var_pop(x) = 0 (DuckDB regr_slope/regr_intercept).
                denom = n * syy - sy**2
                slope = ((n * sxy - sx * sy) / denom).where((n > 0) & (denom != 0))
                if kind == "regr_slope":
                    val = slope
                else:
                    val = ((sx - slope * sy) / n).where((n > 0) & (denom != 0))
            else:
                denom = np.sqrt((n * sxx - sx**2) * (n * syy - sy**2))
                val = ((n * sxy - sx * sy) / denom).where(n > 1)
                val = val.replace([np.inf, -np.inf], np.nan)
            out_df[out] = val
        for out, _ in wavg_cols:
            sw = merged[f"__sw_{out}"]
            out_df[out] = (merged[f"__swx_{out}"] / sw).where(sw != 0)
        return out_df

    return bucketed_groupby_apply(
        partials, key_list, merge_finalize, num_buckets=num_buckets
    )


def pre_aggregate(ds, keys, aggs):
    """:func:`pre_aggregate_ds` collected to pandas — ONLY for
    dimension-bounded key spaces (returnflag, nation, hour). For
    corpus-cardinality keys use the Dataset variant + :func:`top_k`."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    merged = pre_aggregate_ds(ds, keys, aggs).to_pandas()
    if merged.empty and any(k not in merged.columns for k in key_list):
        # a fully-empty input collapses to a 0-column frame; restore shape
        dtypes = {
            out: "int64" if kind == "count" else "float64"
            for out, (_, kind) in aggs.items()
        }
        merged = pd.DataFrame(
            {
                **{k: pd.Series([], dtype=object) for k in key_list},
                **{c: pd.Series([], dtype=dt) for c, dt in dtypes.items()},
            }
        )
    return merged


def ols_fit(ds, keys, y_col, x_cols):
    """Grouped MULTIVARIATE ordinary-least-squares fit via normal
    equations: y = b0 + b1*x1 + ... + bk*xk per group, plus R^2.

    The 100 TB shape: each batch contributes ONE partial row per group
    holding the (k+1)x(k+1) design cross-moment sums (X'X upper
    triangle), the X'y vector and sum(y^2) — all map-side vectorized
    products riding :func:`pre_aggregate`'s single exchange — and the
    driver solves a tiny (k+1)-dim linear system per group. Data size
    never touches the solve; only group-count x k^2 floats do.

    Returns a pandas frame: keys + ``icept`` + ``coef_<x>`` per feature
    + ``r2``. Singular groups (collinear features) yield the minimum-
    norm least-squares solution (numpy lstsq fallback).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    xs = list(x_cols)
    k = len(xs)
    if k == 0:
        raise PlanError("ols_fit needs at least one feature column")

    mom_cols = [f"__m{i}{j}" for i in range(k) for j in range(i, k)]
    xy_cols = [f"__xy{i}" for i in range(k)]

    def products(df: pd.DataFrame) -> pd.DataFrame:
        out = df[key_list].copy()
        X = [df[c].to_numpy(np.float64) for c in xs]
        y = df[y_col].to_numpy(np.float64)
        for i in range(k):
            out[f"__sx{i}"] = X[i]
            out[f"__xy{i}"] = X[i] * y
            for j in range(i, k):
                out[f"__m{i}{j}"] = X[i] * X[j]
        out["__sy"] = y
        out["__yy"] = y * y
        return out

    aug = ds.map_batches(products, batch_format="pandas")
    plan = {c: (c, "sum") for c in mom_cols + xy_cols}
    plan.update({f"__sx{i}": (f"__sx{i}", "sum") for i in range(k)})
    plan.update({"__sy": ("__sy", "sum"), "__yy": ("__yy", "sum"),
                 "__n": (None, "count")})
    agg = pre_aggregate(aug, key_list, plan)

    coefs = np.empty((len(agg), k + 1), dtype=np.float64)
    r2 = np.empty(len(agg), dtype=np.float64)
    for r in range(len(agg)):
        row = agg.iloc[r]
        n = float(row["__n"])
        A = np.empty((k + 1, k + 1))
        b = np.empty(k + 1)
        A[0, 0] = n
        b[0] = row["__sy"]
        for i in range(k):
            A[0, i + 1] = A[i + 1, 0] = row[f"__sx{i}"]
            b[i + 1] = row[f"__xy{i}"]
            for j in range(i, k):
                A[i + 1, j + 1] = A[j + 1, i + 1] = row[f"__m{i}{j}"]
        try:
            c = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            c = np.linalg.lstsq(A, b, rcond=None)[0]
        coefs[r] = c
        sst = row["__yy"] - row["__sy"] ** 2 / n
        sse = row["__yy"] - float(c @ b)
        r2[r] = 1.0 - sse / sst if sst > 0 else np.nan
    out = agg[key_list].copy()
    out["icept"] = coefs[:, 0]
    for i, x in enumerate(xs):
        out[f"coef_{x}"] = coefs[:, i + 1]
    out["r2"] = r2
    return out


def poisson_bootstrap_mean(ds, col, id_col, n_boot: int = 200,
                           ci: float = 0.95):
    """Distributed bootstrap confidence interval for the MEAN via the
    Poisson bootstrap (the streaming/web-scale resampling trick: at
    large n, multinomial resample weights per row converge to iid
    Poisson(1), so each block can weight its own rows independently —
    no global resample pass, no coordination).

    Replicate weights are DETERMINISTIC: Poisson(1) draws by inverse
    CDF over splitmix64(id, replicate) uniforms, so the interval is a
    pure function of the data — repartition/worker-count invariant.
    Each batch emits one (n_boot x 2) partial (weighted count + sum per
    replicate, vectorized n x B matrix math); partials add up; the
    driver turns B replicate means into the percentile interval.

    Returns a one-row DataFrame: mean, ci_lo, ci_hi, n, n_boot."""
    from .hashing import splitmix64

    import math

    # Poisson(1) inverse-CDF thresholds (cumulative e^-1 * 1/k!) — k=0..11
    pk = np.cumsum(np.exp(-1.0) / np.array(
        [math.factorial(k) for k in range(12)], dtype=np.float64
    ))
    b_keys = splitmix64(np.arange(1, n_boot + 1, dtype=np.uint64))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[id_col, col]].dropna(subset=[col])
        out = {
            "__b": np.arange(n_boot, dtype=np.int64),
            "__n": np.zeros(n_boot, dtype=np.float64),
            "__s": np.zeros(n_boot, dtype=np.float64),
        }
        if len(d):
            ids = d[id_col].to_numpy().astype(np.uint64)
            x = d[col].to_numpy(np.float64)
            h = splitmix64(ids)  # (n,)
            # uniforms per (row, replicate): one more mix against the
            # replicate key; 2^-64 scale to [0, 1)
            u = splitmix64(h[:, None] ^ b_keys[None, :]).astype(np.float64)
            u *= 2.0**-64
            w = np.searchsorted(pk, u).astype(np.float64)  # Poisson(1)
            out["__n"] = w.sum(axis=0)
            out["__s"] = (w * x[:, None]).sum(axis=0)
        return pd.DataFrame(out)

    parts = ds.select_columns([id_col, col]).map_batches(
        partial, batch_format="pandas"
    )
    agg = pre_aggregate(
        parts, ["__b"], {"n": ("__n", "sum"), "s": ("__s", "sum")}
    )
    means = agg["s"].to_numpy() / np.maximum(agg["n"].to_numpy(), 1.0)
    alpha = (1.0 - ci) / 2.0
    lo, hi = np.quantile(means, [alpha, 1.0 - alpha])
    # exact mean/count from one more tiny aggregate
    tot = pre_aggregate(
        ds.select_columns([col]).map_batches(
            lambda df: pd.DataFrame(
                {"k": np.zeros(1, dtype=np.int64),
                 "s": [float(df[col].dropna().sum())],
                 "n": [np.int64(df[col].notna().sum())]}
            ),
            batch_format="pandas",
        ),
        ["k"],
        {"s": ("s", "sum"), "n": ("n", "sum")},
    )
    n_tot = int(tot["n"][0])
    mean = float(tot["s"][0]) / n_tot if n_tot else np.nan
    return pd.DataFrame(
        {
            "mean": [sql_round(mean, 6)],
            "ci_lo": [sql_round(float(lo), 6)],
            "ci_hi": [sql_round(float(hi), 6)],
            "n": [np.int64(n_tot)],
            "n_boot": [np.int64(n_boot)],
        }
    )


def skyline2d(ds, x_col, y_col, minimize_x: bool = True,
              maximize_y: bool = True):
    """2-D skyline (Pareto frontier): the distinct (x, y) pairs not
    DOMINATED by any other row — q dominates p when q is at least as
    good on both dims and strictly better on one.

    Skyline is an exact combiner (skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B))), so each batch reduces to its
    local frontier with one vectorized sort-sweep (sort x-best-first
    with y best-first inside ties; keep rows that strictly improve the
    running best y) and only the per-batch frontiers — O(log n) points
    each for continuous data — reach the driver for the same sweep
    once more. No shuffle at all; the 100 TB skyline costs one map
    pass."""

    def _frontier(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        # canonical form: minimize both (flip signs for max dims)
        cx = x if minimize_x else -x
        cy = -y if maximize_y else y
        pairs = np.unique(np.stack([cx, cy], axis=1), axis=0)
        px, py = pairs[:, 0], pairs[:, 1]
        order = np.lexsort((py, px))  # x asc, y asc within ties
        px, py = px[order], py[order]
        # first row per x-group has that group's best y; a row is on
        # the frontier iff its y strictly improves the best seen at
        # any strictly-smaller x (ties on x keep only the group's best)
        first_of_x = np.r_[True, px[1:] != px[:-1]]
        best = np.minimum.accumulate(py)
        keep = first_of_x & (py <= best)
        # equal-y at larger x is dominated (strict on x): enforce strict
        # improvement vs the previous kept frontier point
        ky = py[keep]
        strict = np.r_[True, ky[1:] < ky[:-1]]
        out = pairs[order][keep][strict]
        return out

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {x_col: pd.Series(dtype="float64"),
                 y_col: pd.Series(dtype="float64")}
            )
        f = _frontier(df[x_col].to_numpy(np.float64),
                      df[y_col].to_numpy(np.float64))
        return pd.DataFrame({x_col: f[:, 0] * (1 if minimize_x else -1),
                             y_col: f[:, 1] * (-1 if maximize_y else 1)})

    cand = ds.select_columns([x_col, y_col]).map_batches(
        local, batch_format="pandas"
    ).to_pandas()  # frontier-scale: O(batches * log batch) points
    if not len(cand):
        return cand
    f = _frontier(cand[x_col].to_numpy(np.float64),
                  cand[y_col].to_numpy(np.float64))
    return pd.DataFrame(
        {x_col: f[:, 0] * (1 if minimize_x else -1),
         y_col: f[:, 1] * (-1 if maximize_y else 1)}
    ).sort_values([x_col, y_col], ignore_index=True)


# ---------------------------------------------------------------------------
# joins


def _typed_placeholder(n: int, atype) -> pd.Series:
    """A length-``n`` pandas Series with the dtype Arrow type ``atype`` maps
    to. Values are placeholders (0/NaN/NaT/"") — they are only ever carried
    through the side-union shuffle and dropped before the merge; what
    matters is that EVERY bucket block carries the same typed schema
    (an object/None column here breaks Arrow block unification downstream)."""
    import pyarrow.types as pt

    if isinstance(atype, pa.DataType):
        if pt.is_integer(atype):
            return pd.Series(np.zeros(n, dtype="int64"))
        if pt.is_floating(atype):
            return pd.Series(np.full(n, np.nan, dtype="float64"))
        if pt.is_timestamp(atype) or pt.is_date(atype):
            return pd.Series(
                np.full(n, np.datetime64("NaT"), dtype="datetime64[ns]")
            )
        if pt.is_boolean(atype):
            return pd.Series(np.zeros(n, dtype=bool))
        if pt.is_binary(atype) or pt.is_large_binary(atype):
            return pd.Series([b""] * n, dtype=object)
        return pd.Series([""] * n, dtype=object)
    # pandas-backed blocks report numpy dtypes / `object` here instead
    try:
        dt = np.dtype(atype)
    except TypeError:
        return pd.Series([""] * n, dtype=object)
    if np.issubdtype(dt, np.integer):
        return pd.Series(np.zeros(n, dtype="int64"))
    if np.issubdtype(dt, np.floating):
        return pd.Series(np.full(n, np.nan, dtype="float64"))
    if np.issubdtype(dt, np.datetime64):
        return pd.Series(np.full(n, np.datetime64("NaT"), dtype="datetime64[ns]"))
    if dt == np.dtype(bool):
        return pd.Series(np.zeros(n, dtype=bool))
    return pd.Series([""] * n, dtype=object)


def _make_widen(all_cols, arrow_types: dict):
    """Widen fn: add each missing column with a dtype-correct placeholder
    (from the source Dataset's Arrow schema), then order columns."""

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in df.columns:
                df[c] = _typed_placeholder(len(df), arrow_types[c]).values
        return df[all_cols]

    return widen


def _uniform_nullable(df: pd.DataFrame, cols) -> pd.DataFrame:
    """Cast integer/bool columns to float64 so blocks agree on schema
    whether or not this particular bucket produced unmatched (NaN) rows
    in an outer-ish join."""
    for c in cols:
        if c in df.columns and (
            pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c])
        ):
            df[c] = df[c].astype("float64")
    return df


def grouped_argmax(ds, keys, val_col: str, arg_col: str, minimize: bool = False):
    """``arg_max(arg_col, val_col) GROUP BY keys`` (SQL max_by): the row
    whose value is extreme per key, ties broken deterministically by the
    larger (resp. smaller) ``arg_col``.

    Algebraic: each batch emits ONE candidate row per key (its local
    best), candidates meet in one bucketed exchange, and the same
    lexicographic reduction picks the global best — raw rows never
    shuffle, so a Zipf-hot key costs one candidate per batch, not its
    row count."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    # tail(1) of an ASCENDING sort is the max (and, among val ties, the
    # max arg); descending + tail gives the min with min-arg ties
    asc = not minimize

    def best(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        # SQL max_by/min_by ignore NULL values — without this drop the
        # ascending sort puts NaN LAST and tail(1) would crown a
        # NULL-value row over any real extremum (review r2). Keys whose
        # every value is NULL emit no row, matching DuckDB arg_max.
        df = df[df[val_col].notna()]
        if not len(df):
            return df
        d = df.sort_values(
            key_list + [val_col, arg_col], ascending=[True] * len(key_list) + [asc, asc],
            kind="mergesort",
        )
        return d.groupby(key_list, sort=False, as_index=False).tail(1)

    partials = ds.select_columns(key_list + [arg_col, val_col]).map_batches(
        best, batch_format="pandas"
    )
    return bucketed_groupby_apply(partials, key_list, best)


def unnest(ds, list_col: str, out_col: str = "val", ord_col: str = "ord"):
    """SQL ``UNNEST(list_col) WITH ORDINALITY``: one output row per list
    element, other columns repeated, 1-based ``ord_col`` position.

    Vectorized Arrow explode — list offsets give element counts, parent
    rows replicate via one ``take``, values come out zero-copy via
    ``flatten()``; no Python loop over rows or elements. Shuffle-free:
    each block explodes independently (output blocks grow by the mean
    list length — size ``batch_size`` upstream for wide lists).
    NULL lists are unsupported (offset/flatten alignment assumes a
    dense validity map; the driver tables carry none)."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # ListArray offsets may start past 0 after slicing
        lengths = np.diff(offsets)
        parent = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
        total = int(lengths.sum())
        ords = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1] - offsets[0], lengths) + 1
        cols = {}
        for c in t.column_names:
            if c != list_col:
                cols[c] = t[c].take(pa.array(parent))
        cols[ord_col] = pa.array(ords, pa.int64())
        cols[out_col] = col.flatten()
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def unpivot(ds, id_cols, value_cols, var_name: str = "variable",
            value_name: str = "value"):
    """SQL UNPIVOT / pandas melt: one output row per (input row, value
    column); measures share one float64 ``value_name`` column and the
    source column name lands in ``var_name``.

    Shuffle-free map-side explode (each block emits len(value_cols)
    stacked copies of its id columns — Arrow concat, no Python rows);
    output grows by the measure count, so size ``batch_size`` upstream
    for wide unpivots."""
    import pyarrow.compute as pc

    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    value_cols = list(value_cols)
    if not value_cols:
        raise PlanError("unpivot needs at least one value column")

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        parts = []
        for c in value_cols:
            cols = {ic: t[ic] for ic in id_cols}
            cols[var_name] = pa.array([c] * n, pa.string())
            cols[value_name] = pc.cast(t[c], pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_sample(ds, weight_col: str, k: int, id_col: str,
                    keep_cols=None):
    """Weighted sampling WITHOUT replacement, top-``k`` (Efraimidis &
    Spirakis 2006, A-ES): each row draws u in (0,1) and scores
    ln(u)/w — the k largest scores are exactly a weighted sample
    without replacement. Rows with non-positive weight are excluded
    (zero-weight rows can never be drawn; the score is undefined).

    Deterministic and SQL-replayable: u derives from the id by a fixed
    Knuth-multiplicative map ``((id * 2654435761) mod 2^32 + 1) /
    (2^32 + 2)`` — the same expression a DuckDB twin can evaluate, and
    invariant to repartitioning/resume. Scale shape: each block emits
    only its local top-k candidate rows; a tiny global sort finishes
    (same pattern as the hash-sample matrix)."""
    keep_cols = [] if keep_cols is None else list(keep_cols)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight_col].to_numpy(dtype="float64")
        pos = w > 0
        df = df[pos]
        if len(df) == 0:
            out = {id_col: pd.Series([], dtype="int64"),
                   "score": pd.Series([], dtype="float64")}
            for c in keep_cols:
                out[c] = pd.Series([], dtype="float64")
            return pd.DataFrame(out)
        ids = df[id_col].to_numpy(dtype="int64").astype(np.uint64)
        u = ((ids * np.uint64(2654435761)) % np.uint64(2**32)).astype(
            np.float64
        )
        u = (u + 1.0) / float(2**32 + 2)
        score = np.log(u) / w[pos]
        order = np.argsort(-score, kind="stable")[:k]
        out = {id_col: df[id_col].to_numpy()[order],
               "score": score[order]}
        for c in keep_cols:
            out[c] = df[c].to_numpy()[order]
        return pd.DataFrame(out)

    partial = ds.map_batches(local, batch_format="pandas")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)


BROADCAST_ROW_GUARD = 5_000_000  # a "small side" beyond this is a plan bug


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner",
                   max_broadcast_rows: int = BROADCAST_ROW_GUARD):
    """Broadcast the small side once (``ray.put``); pandas merge per batch.

    Guarded: broadcasting is only correct for genuinely bounded tables
    (nation/region/alias dicts). A corpus-scale side silently OOMs every
    worker at 100x — fail fast with a typed error and point at
    :func:`hash_join` instead."""
    if len(small_df) > max_broadcast_rows:
        raise ConfigError(
            f"broadcast side has {len(small_df)} rows (> {max_broadcast_rows}); "
            "this is corpus-scale — use hash_join, or raise max_broadcast_rows "
            "explicitly if the table is genuinely bounded"
        )
    ref = ray.put(small_df)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(fn, batch_format="pandas")


def semi_anti_join(ds, keys, on: str, anti: bool = False):
    """Semi/anti join via a broadcast key set filtered inside map_batches.

    ``keys``: an iterable of key values, or a DataFrame with column ``on``.
    """
    if isinstance(keys, pd.DataFrame):
        keys = keys[on].tolist()
    keys = set(keys)
    if len(keys) > BROADCAST_ROW_GUARD:
        raise ConfigError(
            f"semi/anti key set has {len(keys)} entries (> {BROADCAST_ROW_GUARD}); "
            "use bloom_semi_join (exact, bitmap-prefiltered) for corpus-scale keys"
        )
    ref = ray.put(keys)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        mask = df[on].isin(ray.get(ref))
        return df[~mask] if anti else df[mask]

    return ds.map_batches(fn, batch_format="pandas")


def join_key_hash(t: pa.Table, on_cols, int_keys: bool) -> np.ndarray:
    """The engine's ONE join-key hash (versioned: v1) — shared by
    :func:`hash_join` and the bucketed storage layout in ``kgraft.io``
    so that tables written with :func:`kgraft.io.write_bucketed` are
    co-partitioned with live join buckets."""
    from .hashing import splitmix64

    if int_keys:
        h = np.zeros(len(t), dtype=np.uint64)
        for i, c in enumerate(on_cols):
            v = t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
            h ^= splitmix64(v + np.uint64(0x9E3779B97F4A7C15 * (i + 1) & (2**64 - 1)))
        return h
    # Arrow-native for string keys: cast + element-wise join stay in
    # Arrow buffers (the pandas astype(str) detour copied every key
    # through Python objects per batch — r2 review)
    import pyarrow.compute as pc

    arrs = [
        pc.fill_null(pc.cast(t[c], pa.string()), "\x00null")
        for c in on_cols
    ]
    key = (
        arrs[0]
        if len(arrs) == 1
        else pc.binary_join_element_wise(*arrs, "\x1f")
    )
    return hash_strings(key.to_pylist(), seed=3)


def hash_join(
    left,
    right,
    on,
    num_buckets: int = 32,
    how: str = "inner",
    left_schema=None,
    right_schema=None,
    dedup_right: bool = False,
    num_salts: int = 1,
):
    """Large-large equi-join: explicit bucketed hash join.

    ``dedup_right``: drop duplicate right-side rows inside each bucket
    before joining (exact — a key's rows all share a bucket). This is
    the semi-join building block: callers can skip the global distinct
    shuffle and let the join dedup post-colocation for free.

    ``num_salts``: hot-key defusal (SURVEY.md §4 skew row). A plain
    bucketed equi-join co-locates EVERY row of a key in one bucket, so
    a Zipf-head key serializes on one reducer. With salts, each LEFT
    row gets a deterministic salt in [0, k) and each RIGHT row is
    replicated once per salt; ``__salt`` joins as an extra key column,
    so every left row still meets exactly one copy of its matches while
    the hot key's left rows spread over k buckets. Cost: right side
    shuffles k times — use when the LEFT side is the skewed fact table
    and the right side is the smaller relation. Exact for ``inner`` and
    ``left`` joins; right/outer would emit unmatched right replicas k
    times and raise PlanError.

    Both sides get ``bucket = stable_hash(key) % B``; a union tagged by
    side is grouped by bucket and merged with pandas inside
    ``map_groups``. One shuffle keyed on the bucket; B bounds reducer
    fan-in. Hot keys can be salted into sub-buckets by raising B.
    (Ray's native ``Dataset.join`` exists in this version; this explicit
    form keeps the partitioning visible and portable.)

    ``left_schema``/``right_schema``: optional ``pyarrow.Schema`` for the
    inputs. Pass them when an input is a LAZY dataset downstream of a
    shuffle — fetching such a dataset's schema re-executes its whole
    prefix, so spelling the schema keeps deep join chains single-pass.

    Arrow-native end to end (r1 verdict #10), via a PACK shuffle: each
    input block slices itself per bucket and ships ONE row per
    (block, bucket) — ``(bucket, side, payload)`` where payload is the
    typed sub-table as Arrow IPC bytes. The all-to-all therefore moves
    (#blocks x #buckets) rows of opaque binary instead of raw rows, the
    shuffle machinery can never retype columns (Ray's sort path
    round-trips rows through pandas, turning null-padded int64 into
    double and all-null into null), and the per-bucket merge is
    ``pyarrow.Table.join`` (Acero hash join) with schema-derived output
    types — no pandas, no placeholder widening, no uniformity casts.
    """
    on_cols = [on] if isinstance(on, str) else list(on)

    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    shared = [c for c in rcols if c in lcols and c not in on_cols]
    if shared:
        raise SchemaError(f"ambiguous non-key columns on both sides: {shared}")
    join_type = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }.get(how)
    if join_type is None:
        raise PlanError(f"unsupported how={how!r}")
    salted = int(num_salts) > 1
    if salted and how not in ("inner", "left"):
        raise PlanError(
            f"num_salts requires how in ('inner','left'); got {how!r} "
            "(unmatched right replicas would duplicate)"
        )
    arrow_types = dict(zip(rcols, rschema.types))
    arrow_types.update(zip(lcols, lschema.types))
    import pyarrow.types as pt

    int_keys = all(
        isinstance(arrow_types[c], pa.DataType) and pt.is_integer(arrow_types[c])
        for c in on_cols
    )
    all_cols = list(dict.fromkeys(lcols + rcols)) + ["__bucket", "__side"]
    out_cols = lcols + [c for c in rcols if c not in on_cols]

    def rawhash(t: pa.Table) -> np.ndarray:
        return join_key_hash(t, on_cols, int_keys)

    base_l, base_r = list(lcols), list(rcols)
    if salted:
        lcols = lcols + ["__salt"]
        rcols = rcols + ["__salt"]
        arrow_types["__salt"] = pa.int64()
    l_side_schema = pa.schema([(c, arrow_types[c]) for c in lcols])
    r_side_schema = pa.schema([(c, arrow_types[c]) for c in rcols])
    join_cols = on_cols + ["__salt"] if salted else on_cols

    def pack(side, side_schema):
        from .hashing import splitmix64

        base_names = [n for n in side_schema.names if n != "__salt"]

        def emit(t, buckets, salt_vals, out_b, out_p):
            for b in np.unique(buckets):
                mask = buckets == b
                sub = t.filter(pa.array(mask)).select(base_names)
                if salted:
                    sub = sub.append_column(
                        "__salt", pa.array(salt_vals[mask].astype(np.int64), pa.int64())
                    )
                # cast pins the payload to the declared side schema (empty
                # pandas blocks arrive null-typed; timestamps vary ns/us)
                sub = sub.cast(side_schema).combine_chunks()
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, side_schema) as w:
                    w.write_table(sub)
                out_b.append(int(b))
                out_p.append(sink.getvalue().to_pybytes())

        def fn(t: pa.Table) -> pa.Table:
            out_b, out_p = [], []
            h_raw = rawhash(t)
            if not salted:
                emit(t, (h_raw % np.uint64(num_buckets)).astype(np.int64), None, out_b, out_p)
            elif side == 0:
                salt = (np.arange(len(t)) % num_salts).astype(np.uint64)
                h = splitmix64(h_raw ^ (salt + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
                emit(t, (h % np.uint64(num_buckets)).astype(np.int64), salt, out_b, out_p)
            else:
                for j in range(num_salts):  # right side replicates per salt
                    salt = np.full(len(t), j, dtype=np.uint64)
                    h = splitmix64(h_raw ^ (salt + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
                    emit(t, (h % np.uint64(num_buckets)).astype(np.int64), salt, out_b, out_p)
            return pa.table(
                {
                    "__bucket": pa.array(out_b, pa.int64()),
                    "__side": pa.array([side] * len(out_b), pa.int64()),
                    "payload": pa.array(out_p, pa.binary()),
                }
            )

        return fn

    lt = left.map_batches(pack(0, l_side_schema), batch_format="pyarrow")
    rt = right.map_batches(pack(1, r_side_schema), batch_format="pyarrow")
    both = lt.union(rt)

    def _unpack(payloads) -> list:
        return [
            pa.ipc.open_stream(pa.py_buffer(p)).read_all() for p in payloads
        ]

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g["__side"]
        lparts = _unpack(g.filter(pc.equal(side, 0))["payload"].to_pylist())
        rparts = _unpack(g.filter(pc.equal(side, 1))["payload"].to_pylist())
        lf = (
            pa.concat_tables(lparts).combine_chunks()
            if lparts
            else l_side_schema.empty_table()
        )
        rf = (
            pa.concat_tables(rparts).combine_chunks()
            if rparts
            else r_side_schema.empty_table()
        )
        if dedup_right and len(rf):
            # post-shuffle, co-located dedup: unique (key, payload) rows
            # per bucket — the semi-join path's replacement for a global
            # distinct shuffle (cross-batch duplicates all land here)
            names = rf.column_names
            rf = rf.group_by(names).aggregate([]).rename_columns(names)
        out = lf.join(rf, keys=join_cols, join_type=join_type)
        return out.select(out_cols)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def asof_join(
    left,
    right,
    by: str,
    left_on: str,
    right_on: str,
    num_buckets: int = 32,
    left_schema=None,
    right_schema=None,
):
    """As-of join (an operator Ray Data lacks): match each left row to the
    LATEST right row with ``right[right_on] <= left[left_on]`` within the
    same ``by`` key; left rows with no prior right row keep nulls.

    Realization: both sides are tagged and co-located with ONE shuffle on
    ``hash(by) % num_buckets`` (every row of a key lands in exactly one
    bucket — the partitioning assumption); inside each bucket a single
    vectorized ``pandas.merge_asof`` over time-sorted frames does the
    match. Hot keys can be handled by raising ``num_buckets`` only if the
    by-key cardinality supports it — a single giant key is inherently one
    group for as-of semantics.
    """
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    shared = [c for c in rcols if c in lcols and c != by]
    if shared:
        raise SchemaError(f"ambiguous non-key columns on both sides: {shared}")
    arrow_types = dict(zip(rcols, rschema.types))
    arrow_types.update(zip(lcols, lschema.types))

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            h = hash_strings(df[by].astype(str).tolist(), seed=5)
            df["__bucket"] = (h % np.uint64(num_buckets)).astype("int64")
            return df

        return fn

    all_cols = list(dict.fromkeys(lcols + rcols)) + ["__side", "__bucket"]
    import pyarrow as _pa

    arrow_types["__side"] = _pa.int64()
    arrow_types["__bucket"] = _pa.int64()
    widen = _make_widen(all_cols, arrow_types)

    lt = left.map_batches(tag(0), batch_format="pandas").map_batches(
        widen, batch_format="pandas"
    )
    rt = right.map_batches(tag(1), batch_format="pandas").map_batches(
        widen, batch_format="pandas"
    )
    # right value columns gain NaN on unmatched left rows — cast uniformly
    # so a fully-matched bucket emits the same schema as a sparse one
    # right_on INCLUDED: an unmatched left row NaN-promotes an integer
    # right_on to float64 in its bucket only — casting it uniformly keeps
    # every bucket's schema identical (datetime keys are immune: NaT
    # doesn't retype, and _uniform_nullable only touches int/bool)
    null_right = [c for c in rcols if c != by]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # empty sides flow through the SAME merge_asof (typed placeholders
        # from widen keep the dtypes), so every bucket — including ones
        # whose keys exist on only one side — emits one typed schema
        lf = g[g["__side"] == 0][lcols].sort_values(left_on)
        rf = g[g["__side"] == 1][rcols].sort_values(right_on)
        # datetime keys: normalize both to ns — mixed us/ns (parquet vs
        # pandas blocks) is a MergeError in merge_asof. Numeric ordering
        # keys pass through untouched (coercing ints to datetime would
        # silently retype the output schema)
        if not pd.api.types.is_numeric_dtype(lf[left_on]):
            lf = lf.assign(
                **{left_on: pd.to_datetime(lf[left_on]).astype("datetime64[ns]")}
            )
            rf = rf.assign(
                **{right_on: pd.to_datetime(rf[right_on]).astype("datetime64[ns]")}
            )
        out = pd.merge_asof(
            lf, rf, left_on=left_on, right_on=right_on, by=by, direction="backward"
        )
        return _uniform_nullable(out, null_right)

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def range_join(
    left,
    right,
    by: str,
    left_on: str,
    right_on: str,
    lower,
    upper,
    num_buckets: int = 32,
    left_schema=None,
    right_schema=None,
):
    """Range (interval) join — another operator Ray Data lacks: inner-match
    rows where ``left[left_on] + lower <= right[right_on] < left[left_on]
    + upper`` within the same ``by`` key.

    Realization mirrors :func:`asof_join`: ONE shuffle co-locates each
    key's rows in a bucket; inside the bucket the match is a vectorized
    pandas merge on the key followed by the interval filter. Per-key
    fanout is bounded by the interval width — the documented assumption;
    for very wide intervals switch to a sorted ``searchsorted`` sweep
    inside the same bucket function.
    """
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    shared = [c for c in rcols if c in lcols and c != by]
    if shared:
        raise SchemaError(f"ambiguous non-key columns on both sides: {shared}")
    arrow_types = dict(zip(rcols, rschema.types))
    arrow_types.update(zip(lcols, lschema.types))

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            h = hash_strings(df[by].astype(str).tolist(), seed=6)
            df["__bucket"] = (h % np.uint64(num_buckets)).astype("int64")
            return df

        return fn

    all_cols = list(dict.fromkeys(lcols + rcols)) + ["__side", "__bucket"]
    import pyarrow as _pa

    arrow_types["__side"] = _pa.int64()
    arrow_types["__bucket"] = _pa.int64()
    widen = _make_widen(all_cols, arrow_types)

    lt = left.map_batches(tag(0), batch_format="pandas").map_batches(
        widen, batch_format="pandas"
    )
    rt = right.map_batches(tag(1), batch_format="pandas").map_batches(
        widen, batch_format="pandas"
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0][lcols]
        rf = g[g["__side"] == 1][rcols]
        # merge even when one side is empty: head(0) merges preserve the
        # full schema WITH dtypes (an untyped empty frame here would give
        # this block a different schema and break downstream groupbys)
        m = lf.merge(rf, on=by)
        if m.empty:
            return m.head(0)
        # numeric ordering columns take numeric bounds; anything else is
        # coerced to datetime with timedelta bounds
        if pd.api.types.is_numeric_dtype(m[left_on]):
            lv, t = m[left_on], m[right_on]
        else:
            lv, t = pd.to_datetime(m[left_on]), pd.to_datetime(m[right_on])
        return m[(t >= lv + lower) & (t < lv + upper)]

    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# order / distinct


def top_k(ds, key, k: int, descending: bool = True):
    return ds.sort(key, descending=descending).limit(k)


def distinct(ds, cols, num_buckets: int = 64):
    """Distinct rows over ``cols``: map-side drop_duplicates per batch,
    then ONE bucketed exchange with a vectorized in-bucket
    drop_duplicates. (Ray's native ``groupby().aggregate(Count)`` pays
    per-GROUP cost — measured 240 s for a 600 k-group distinct at
    sf0.1 where this path takes ~2 s; the bucket exchange sorts 64
    bucket ids instead.)"""
    cols = [cols] if isinstance(cols, str) else list(cols)
    slim = ds.select_columns(cols).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    return bucketed_groupby_apply(
        slim, cols, lambda g: g.drop_duplicates(), num_buckets
    )


# ---------------------------------------------------------------------------
# window functions / distinct-count / quantile


def windowed(ds, part_keys, order_keys, specs, num_buckets: int = 64, tiebreak=None):
    """Partitioned window functions (SQL ``OVER (PARTITION BY .. ORDER BY ..)``).

    One bucketed shuffle co-locates each partition key's rows; inside a
    bucket everything is vectorized — a single sort by
    ``part_keys + order_keys`` followed by pandas groupby transforms (no
    per-partition Python dispatch, which matters when partitions number
    in the millions). Partition sizes must fit a worker (same contract
    as sessionization); for low-cardinality partition keys or
    corpus-scale single partitions use :func:`ranked` — the distributed
    sort + block-offset prefix-sum two-pass — for the positional kinds.

    ``specs``: dict out_col -> (kind, col, param) with kinds
      row_number (col/param ignored; 1-based int64)
      lag / lead  (param = offset, default 1; NULL -> fill value 0)
      cumsum      (running sum, current row inclusive)
      rolling_mean / rolling_min / rolling_max (param = window size in
                    rows, current row inclusive, min_periods=1 — SQL
                    ``ROWS BETWEEN p-1 PRECEDING AND CURRENT ROW``)
      first_value (partition-wide first under the sort — SQL
                    FIRST_VALUE with the default frame)
      last_value  (partition-wide last — SQL LAST_VALUE with ``ROWS
                    BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
                    FOLLOWING``; pass ``tiebreak`` for determinism
                    under order-key ties)
      rank / dense_rank (SQL semantics: ties share a rank; rank leaves
                    gaps, dense_rank doesn't. Ties = equal order_keys)
      percent_rank / cume_dist (SQL semantics: (rank-1)/(count-1) with
                    0.0 for single-row partitions; tie-group max row
                    number over partition count)
      ntile       (param = n; SQL allocation — the first count%n tiles
                    get one extra row. Include a ``tiebreak`` unique
                    column for a deterministic result under ties)

    ``tiebreak``: optional columns appended to the in-bucket sort AFTER
    ``order_keys`` — they pin intra-tie row order (for row_number /
    ntile / lag determinism) WITHOUT entering rank/dense_rank tie
    groups, matching SQL ``ORDER BY order_keys, tiebreak`` for the
    positional kinds and ``ORDER BY order_keys`` for the rank kinds.
    """
    part_keys = [part_keys] if isinstance(part_keys, str) else list(part_keys)
    order_keys = [order_keys] if isinstance(order_keys, str) else list(order_keys)
    tiebreak = (
        [] if tiebreak is None
        else [tiebreak] if isinstance(tiebreak, str) else list(tiebreak)
    )

    def window_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(part_keys + order_keys + tiebreak, kind="mergesort")
        grp = g.groupby(part_keys, sort=False)
        out = g.copy()
        rn_cache = (grp.cumcount() + 1).astype("int64")
        for out_col, (kind, col, *rest) in specs.items():
            param = rest[0] if rest else None
            if kind == "row_number":
                out[out_col] = rn_cache
            elif kind in ("percent_rank", "cume_dist"):
                tmp = pd.DataFrame({"rn": rn_cache.values}, index=g.index)
                # dropna=False: NULL order keys form their own tie group
                # (sorted NULLS LAST, matching DuckDB ASC) instead of
                # vanishing from the groupby and leaving NaN ranks that
                # crash the int64 cast (review r2)
                tie = tmp.groupby(
                    [g[c] for c in part_keys + order_keys], sort=False, dropna=False
                )
                cnt = grp[order_keys[0]].transform("size").to_numpy().astype("float64")
                if kind == "percent_rank":
                    # (rank - 1) / (count - 1); 0.0 for single-row partitions
                    rank_min = tie["rn"].transform("min").to_numpy()
                    denom = np.maximum(cnt - 1.0, 1.0)
                    out[out_col] = (rank_min - 1.0) / denom
                else:
                    # rows with order key <= current = the tie group's MAX rn
                    rank_max = tie["rn"].transform("max").to_numpy()
                    out[out_col] = rank_max / cnt
            elif kind in ("rank", "dense_rank"):
                # ties = equal order_keys within the partition; rank is
                # the min row_number of the tie group (gaps), dense is
                # the running count of tie-group starts (no gaps)
                tmp = pd.DataFrame({"rn": rn_cache.values}, index=g.index)
                rank_min = tmp.groupby(
                    [g[c] for c in part_keys + order_keys],
                    sort=False,
                    dropna=False,  # NULL order keys rank as a tie group
                )["rn"].transform("min")
                if kind == "rank":
                    out[out_col] = rank_min.astype("int64")
                else:
                    starts = (rn_cache.values == rank_min.values).astype("int64")
                    out[out_col] = (
                        pd.Series(starts, index=g.index)
                        .groupby([g[c] for c in part_keys], sort=False)
                        .cumsum()
                        .astype("int64")
                    )
            elif kind == "ntile":
                n = int(param or 4)
                cnt = grp[order_keys[0]].transform("size").to_numpy()
                rn0 = rn_cache.to_numpy() - 1  # 0-based
                size = cnt // n
                rem = cnt % n
                big = rem * (size + 1)  # rows covered by the larger tiles
                in_big = rn0 < big
                tile = np.where(
                    in_big,
                    rn0 // np.maximum(size + 1, 1) + 1,
                    rem + (rn0 - big) // np.maximum(size, 1) + 1,
                )
                out[out_col] = tile.astype("int64")
            elif kind in ("lag", "lead"):
                off = param or 1
                shifted = grp[col].shift(off if kind == "lag" else -off)
                out[out_col] = shifted.fillna(0.0)
            elif kind == "cumsum":
                # SQL running SUM: NULL inputs are skipped (they don't
                # poison the sum) and the result is NULL only until the
                # first non-null value — pandas cumsum instead emits NaN
                # AT every null row, so build from the filled series and
                # mask the leading all-null prefix
                by = [g[c] for c in part_keys]
                cs = g[col].fillna(0).groupby(by, sort=False).cumsum()
                nn = g[col].notna().groupby(by, sort=False).cumsum()
                out[out_col] = cs.where(nn > 0)
            elif kind in ("first_value", "last_value"):
                # SQL FIRST_VALUE with the default frame / LAST_VALUE with
                # ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                # — both are partition-wide under the (order_keys +
                # tiebreak) sort, so a tiebreak column makes them
                # deterministic under order-key ties. SQL returns the
                # frame-edge ROW's value INCLUDING NULL, so pandas
                # transform('first'/'last') (which skip NaN) is wrong;
                # mask everything but the edge row and spread it (one
                # candidate per partition, so 'max' is the identity)
                cnt = grp[order_keys[0]].transform("size").to_numpy()
                edge = rn_cache.to_numpy() == (
                    1 if kind == "first_value" else cnt
                )
                masked = g[col].where(pd.Series(edge, index=g.index))
                out[out_col] = masked.groupby(
                    [g[c] for c in part_keys], sort=False
                ).transform("max")
            elif kind in ("rolling_mean", "rolling_min", "rolling_max"):
                w = param or 3
                agg = kind.split("_")[1]
                out[out_col] = (
                    grp[col]
                    .rolling(w, min_periods=1)
                    .agg(agg)
                    .reset_index(drop=True)
                    .to_numpy()
                )
            elif kind == "rolling_median":
                # linear interpolation == SQL windowed quantile_cont(0.5)
                # over ROWS BETWEEN (w-1) PRECEDING AND CURRENT ROW
                w = param or 3
                out[out_col] = (
                    grp[col]
                    .rolling(w, min_periods=1)
                    .quantile(0.5, interpolation="linear")
                    .reset_index(drop=True)
                    .to_numpy()
                )
            else:  # pragma: no cover - spec validation
                raise PlanError(f"unknown window kind {kind!r}")
        return out

    return bucketed_groupby_apply(ds, part_keys, window_bucket, num_buckets)


_OFFSETS_CACHE: dict = {}


def _offsets_from_ref(ref):
    """Worker-side once-per-process deserialization of the broadcast
    offsets dict (ray.get of the same ref is plasma-cached, but the
    dict would still re-deserialize per block without this)."""
    k = ref.hex()
    offs = _OFFSETS_CACHE.get(k)
    if offs is None:
        offs = ray.get(ref)
        _OFFSETS_CACHE.clear()  # one live rank pass per worker is typical
        _OFFSETS_CACHE[k] = offs
    return offs


def ranked(ds, part_keys, order_keys, tiebreak: str, out_col: str = "row_number",
           descending=False):
    """Global per-partition ROW_NUMBER at ANY partition-key cardinality.

    :func:`windowed` co-locates each partition into one bucket — right
    for high-cardinality keys, a scale-killer when the key has a
    handful of values (the whole corpus lands on <= k reducers; r3
    VERDICT "missing" #3). This operator instead runs ONE distributed
    ``sort(part_keys + order_keys + [tiebreak])`` — range-partitioned
    on the full high-cardinality tuple, so no reducer ever holds more
    than a block — and closes GLOBAL ranks from metadata-scale
    per-block partials:

    1. the sorted dataset is materialized once (it is consumed twice);
    2. pass 1 emits, per (block, partition-slice), the partition key,
       the slice's first ``tiebreak`` value and its row count — blocks
       x partitions-per-block rows, never corpus-scale;
    3. the driver orders these partials by each slice's FIRST full
       sort tuple (part asc, order with the same desc flags, tiebreak
       asc) — self-contained block-order recovery that does NOT rely
       on map_batches output order (Ray's default
       ``preserve_order=False`` delivers partials in task-completion
       order; r4 ADVICE high) — then computes cumulative offsets per
       partition, broadcast as one dict keyed by
       (partition, first-tiebreak);
    4. pass 2 re-reads the same blocks (``batch_size=None`` pins batch
       == block in both passes) and appends ``offset + within-block
       cumcount``.

    ``descending`` applies to ``order_keys`` (bool or list); partition
    keys and the tiebreak always sort ascending, matching SQL
    ``ROW_NUMBER() OVER (PARTITION BY p ORDER BY o [DESC], tb)``.
    ``tiebreak`` must be a globally-unique column (an id) — that is
    what makes the result deterministic and the offset keys unique.
    """
    part_keys = [part_keys] if isinstance(part_keys, str) else list(part_keys)
    order_keys = [order_keys] if isinstance(order_keys, str) else list(order_keys)
    if isinstance(descending, bool):
        desc_order = [descending] * len(order_keys)
    else:
        desc_order = list(descending)
    sort_cols = part_keys + order_keys + [tiebreak]
    desc = [False] * len(part_keys) + desc_order + [False]

    sorted_ds = ds.sort(sort_cols, descending=desc).materialize()

    ok_cols = [f"__ok{i}" for i in range(len(order_keys))]

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        grp = df.groupby(part_keys, sort=False, as_index=False)
        aggs = {"__tb_first": (tiebreak, "first"), "__m": (tiebreak, "size")}
        for i, ok in enumerate(order_keys):
            aggs[ok_cols[i]] = (ok, "first")
        return grp.agg(**aggs)

    parts = sorted_ds.map_batches(
        block_partials, batch_format="pandas", batch_size=None
    ).to_pandas()  # blocks x partitions-per-block rows: metadata-scale

    # driver: recover block order per partition WITHOUT assuming
    # map_batches output order (Ray's streaming executor defaults to
    # preserve_order=False, so partials arrive in task-completion
    # order). Slices are disjoint runs of the global sort order, so
    # every row of a later slice compares >= every row of an earlier
    # one under the full (part, order, tiebreak) comparator; the
    # globally-unique tiebreak makes first-row tuples distinct. Hence
    # a stable sort of the partials by each slice's FIRST tuple, with
    # the SAME ascending/descending flags as the distributed sort,
    # reproduces global block order exactly.
    parts = parts.sort_values(
        part_keys + ok_cols + ["__tb_first"],
        ascending=[True] * len(part_keys)
        + [not d for d in desc_order]
        + [True],
        kind="mergesort",
        ignore_index=True,
    )
    grp = parts.groupby(part_keys, sort=False)
    parts["__off"] = grp["__m"].cumsum() - parts["__m"]
    key_cols = part_keys + ["__tb_first"]
    offsets = {
        tuple(row): int(off)
        for row, off in zip(
            parts[key_cols].itertuples(index=False, name=None), parts["__off"]
        )
    }
    off_ref = ray.put(offsets)

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        offs = _offsets_from_ref(off_ref)
        df = df.copy()
        grp = df.groupby(part_keys, sort=False)
        j = grp.cumcount().to_numpy(np.int64) + 1
        first_tb = grp[tiebreak].transform("first")
        keys_df = pd.concat([df[part_keys], first_tb.rename("__tb_first")], axis=1)
        base = np.fromiter(
            (offs[t] for t in keys_df.itertuples(index=False, name=None)),
            dtype=np.int64,
            count=len(df),
        )
        df[out_col] = base + j
        return df

    return sorted_ds.map_batches(add_rank, batch_format="pandas", batch_size=None)


def grouped_quantile_by_sort(ds, part_keys, col: str, q: float, tiebreak: str,
                            out_col: str | None = None):
    """EXACT grouped quantile via global ranks — no histogram, no
    bounded-value-cardinality contract (contrast
    :func:`grouped_quantile_disc`), and no per-key co-location
    (contrast :func:`windowed`): works when the group key has 3 values
    and each group is terabytes, because :func:`ranked` range-partitions
    on the full (part, value, tiebreak) tuple.

    The selected row is the one at rank ``clamp(ceil(q * n), 1, n)``
    under ``(col, tiebreak)`` order — the discrete (lower-mass)
    quantile. A SQL twin must use the SAME row_number formula (both
    sides compute ``ceil(q * n)`` on identical doubles, so the fp
    product is bit-identical); DuckDB's ``quantile_disc`` rank
    convention differs at exact fp boundaries.

    Returns a pandas frame (part_keys..., out_col, n_rows)."""
    part_keys = [part_keys] if isinstance(part_keys, str) else list(part_keys)
    out_col = out_col or f"q{q}"
    r = ranked(ds, part_keys, [col], tiebreak)
    n = pre_aggregate(ds, part_keys, {"n_rows": (None, "count")})
    meta = {}
    for _, row in n.iterrows():
        key = tuple(row[k] for k in part_keys)
        cnt = int(row["n_rows"])
        meta[key] = (min(cnt, max(1, int(np.ceil(q * cnt)))), cnt)
    mref = ray.put(meta)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(mref)  # group-cardinality, not corpus
        tgt = np.fromiter(
            (m[t][0] for t in df[part_keys].itertuples(index=False, name=None)),
            dtype=np.int64,
            count=len(df),
        )
        keep = df[df["row_number"].to_numpy() == tgt]
        out = keep[part_keys].copy()
        out[out_col] = keep[col].to_numpy()
        out["n_rows"] = np.fromiter(
            (m[t][1] for t in keep[part_keys].itertuples(index=False, name=None)),
            dtype=np.int64,
            count=len(keep),
        )
        return out

    res = r.map_batches(pick, batch_format="pandas").to_pandas()
    return res.sort_values(part_keys, ignore_index=True)


def grouped_count_distinct(ds, keys, col, out_col="n_distinct", num_buckets: int = 64):
    """``COUNT(DISTINCT col) GROUP BY keys`` as two partial-combined
    exchanges, both keyed by a SMALL INT bucket id (a multi-column Ray
    sort-groupby here measured 2x the whole query's budget): map-side
    drop_duplicates is the combiner, distinct (keys, col) pairs
    co-locate by hash — skew-safe: one hot key's values spread over all
    buckets — each bucket emits per-key partial counts (≤ one row per
    (bucket, key)), and a final partial-sum reduce yields the counts.
    Stays a Dataset end to end; no driver collect."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    slim = ds.select_columns(keys + [col]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )

    def partial_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates()
        return u.groupby(keys, sort=False, as_index=False).size().rename(
            columns={"size": "__pc"}
        )

    part = bucketed_groupby_apply(slim, keys + [col], partial_counts, num_buckets)
    return pre_aggregate_ds(part, keys, {out_col: ("__pc", "sum")}, num_buckets)


def grouped_approx_count_distinct(
    ds, keys, col, out_col="approx_n_distinct", p: int = 12, num_buckets: int = 64
):
    """Approximate ``COUNT(DISTINCT col) GROUP BY keys`` via HyperLogLog
    (Flajolet et al. 2007) with linear-counting small-range correction —
    standard error ~1.04/sqrt(2^p) (~1.6% at the default p=12).

    This is the scale path :func:`grouped_count_distinct` can't take: the
    exact operator shuffles every distinct (key, value) pair, which for
    e.g. distinct-visitors-per-URL at web scale is the corpus itself. The
    HLL partial is AT MOST one row per (key, register, batch) — bounded
    by 2^p per key per batch no matter how many raw values fed it — and
    register merges are max(), so partials combine associatively across
    batches, buckets, and (on a real cluster) nodes. Registers travel as
    tabular (key, register, rho) rows, not opaque blobs, so the merge is
    the same partial-combined groupby-max machinery as every other
    aggregate here. Deterministic: fixed-seed value hash.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    partials = ds.select_columns(keys + [col]).map_batches(
        _hll_partial_fn(keys, col, p), batch_format="pandas"
    )
    return bucketed_groupby_apply(
        partials, keys, _hll_estimate_fn(keys, p, out_col), num_buckets
    )


def _hll_partial_fn(keys, col, p: int):
    """Per-batch HLL register partial: (keys, __reg, __rho) rows, at
    most 2^p per key per batch."""
    from .hashing import splitmix64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype=object) for k in keys},
                    "__reg": pd.Series([], dtype="int64"),
                    "__rho": pd.Series([], dtype="int64"),
                }
            )
        v = df[col].dropna()  # SQL COUNT(DISTINCT) excludes NULLs
        if len(v) == 0:
            return partial(df.iloc[0:0])
        df = df.loc[v.index]
        if pd.api.types.is_integer_dtype(v):
            h = splitmix64(v.to_numpy().astype(np.uint64))
        elif pd.api.types.is_float_dtype(v):
            # hash the float64 BIT PATTERN: an integer cast truncates
            # (1.1, 1.2, 1.9 would all hash as 1) and is undefined for
            # NaN/negatives
            h = splitmix64(v.to_numpy(dtype=np.float64).view(np.uint64))
        else:
            h = hash_strings(v.astype(str).tolist(), seed=7)
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        # sentinel bit keeps w nonzero and caps rho at 64-p+1
        w = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
        rho = (63 - np.floor(np.log2(w.astype(np.float64)))).astype(np.int64) + 1
        part = df[keys].copy()
        part["__reg"] = reg
        part["__rho"] = rho
        return part.groupby(keys + ["__reg"], sort=False, as_index=False)[
            "__rho"
        ].max()

    return partial


def _hll_estimate_fn(keys, p: int, out_col):
    """In-bucket HLL finisher over (keys, __reg, __rho) register rows:
    merge registers by max, estimate with the standard alpha_m bias
    constant + linear-counting small-range correction."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # bias constant for m >= 128

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = g.groupby(keys + ["__reg"], sort=False, as_index=False)["__rho"].max()
        grp = regs.groupby(keys, sort=False)
        inv_sum = grp["__rho"].agg(lambda r: np.sum(np.exp2(-r.to_numpy(dtype="float64"))))
        n_present = grp.size()
        out = inv_sum.reset_index()[keys].copy()
        zeros = m - n_present.to_numpy()
        total = inv_sum.to_numpy() + zeros  # absent registers contribute 2^0
        est = alpha * m * m / total
        # linear counting where HLL is biased (small cardinalities)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lc = m * np.log(m / np.maximum(zeros, 1).astype("float64"))
        est = np.where(small, lc, est)
        out[out_col] = np.rint(est).astype("int64")
        return out

    return estimate


def hll_sketch_table(ds, keys, col, p: int = 12, num_buckets: int = 64):
    """Reduce a corpus to its PERSISTED mergeable sketch: one
    (keys, __reg, __rho) register set per key — the Agarwal et al.
    "mergeable summaries" pattern. Write this table once per
    snapshot/partition (it is at most 2^p rows per key regardless of
    corpus size); any UNION of sketch tables from different snapshots
    re-reduces with :func:`hll_estimate_sketches` to answer distinct
    counts over the combined data WITHOUT rescanning raw rows — exact
    register-level equivalence with sketching the union directly
    (register merge is max: associative, commutative, idempotent)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    partials = ds.select_columns(keys + [col]).map_batches(
        _hll_partial_fn(keys, col, p), batch_format="pandas"
    )
    return pre_aggregate_ds(
        partials, keys + ["__reg"], {"__rho": ("__rho", "max")}, num_buckets
    )


def hll_estimate_sketches(
    sketches, keys, out_col="approx_n_distinct", p: int = 12,
    num_buckets: int = 64,
):
    """Distinct-count estimates from one or a UNION of
    :func:`hll_sketch_table` outputs (same ``p`` required). One bucketed
    exchange on the keys; in-bucket register max-merge + the standard
    HLL estimator."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys].copy()
        out["__reg"] = df["__reg"].astype("int64")
        out["__rho"] = df["__rho"].astype("int64")
        return out

    return bucketed_groupby_apply(
        sketches.map_batches(norm, batch_format="pandas"),
        keys,
        _hll_estimate_fn(keys, p, out_col),
        num_buckets,
    )


def grouped_string_agg(ds, keys, col, sep: str = ",", out_col=None, num_buckets: int = 64):
    """SQL ``string_agg(col, sep ORDER BY col)``: per group, the sorted
    non-null values joined with ``sep`` (ORDER BY makes it deterministic
    — bare string_agg is partition-order-dependent). One bucketed
    shuffle co-locates each group's values; the in-bucket join is a
    single sort + vectorized groupby-agg. Group payloads must fit a
    worker (same contract as the window functions) — aggregating
    corpus-sized value lists into one string is a misuse at any scale."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_agg"
    slim = ds.select_columns(keys + [col])

    def join(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[col]).sort_values(keys + [col], kind="mergesort")
        out = (
            g.groupby(keys, sort=False, as_index=False)[col]
            .agg(lambda s: sep.join(s.astype(str)))
        )
        return out.rename(columns={col: out_col})

    return bucketed_groupby_apply(slim, keys, join, num_buckets)


def grouped_mode(ds, keys, col, out_col=None, num_buckets: int = 64):
    """Most frequent NON-NULL value of ``col`` per group, ties broken by
    smallest value (made deterministic on purpose — the SQL twin is the
    ``row_number() OVER (ORDER BY cnt DESC, value)`` idiom, since bare
    ``mode()`` tie-breaks arbitrarily). NULLs are excluded as candidate
    values (like SQL ``mode()``, unlike a bare ``GROUP BY k, v`` which
    would count the NULL group); on a column that can be mostly-NULL,
    filter or fill first if NULL should win. Same scale shape as the
    grouped quantiles: only the (keys, value) COUNT histogram shuffles."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_mode"
    hist = pre_aggregate_ds(ds, keys + [col], {"__n": (None, "count")}, num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["__n", col], ascending=[False, True], kind="mergesort"
        )
        hit = g.groupby(keys, sort=False, as_index=False).first()
        return hit[keys + [col]].rename(columns={col: out_col})

    return bucketed_groupby_apply(hist, keys, pick, num_buckets)


def grouped_quantile_disc(ds, keys, col, q: float = 0.5, out_col=None, num_buckets: int = 64):
    """Exact discrete quantile per group (DuckDB ``quantile_disc``:
    the smallest sorted value whose cumulative count reaches
    ``ceil(q*n)`` — verified against DuckDB over n in 2..10, q in
    {0.25, 0.5, 0.9}).

    Scale shape: a grouped COUNT over (keys, value) builds a per-group
    value histogram — partial-combined, so raw rows never shuffle and
    Zipf-heavy values collapse map-side — then one bucketed pass per
    group walks the sorted histogram's cumulative counts. The histogram
    is distinct-value-scale per group, not row-scale."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_q{q}"
    hist = pre_aggregate_ds(ds, keys + [col], {"__n": (None, "count")}, num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [col], kind="mergesort")
        grp = g.groupby(keys, sort=False)
        cum = grp["__n"].cumsum()
        total = grp["__n"].transform("sum")
        rank = np.ceil(total * q)  # 1-based target rank
        hit = g[cum >= rank].groupby(keys, sort=False, as_index=False).first()
        return hit[keys + [col]].rename(columns={col: out_col})

    return bucketed_groupby_apply(hist, keys, pick, num_buckets)


def grouped_quantiles_disc(ds, keys, col, qs: dict, num_buckets: int = 64):
    """Several exact discrete quantiles per group from ONE histogram:
    ``qs`` maps out_col -> q. Same semantics as
    :func:`grouped_quantile_disc`, but the (keys, value) count histogram
    builds and shuffles once and the in-bucket walk extracts every
    requested quantile — the shape IQR/fence computations need (q1 and
    q3 off a single exchange instead of two full scans)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    hist = pre_aggregate_ds(ds, keys + [col], {"__n": (None, "count")}, num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [col], kind="mergesort")
        grp = g.groupby(keys, sort=False)
        cum = grp["__n"].cumsum()
        total = grp["__n"].transform("sum")
        out = None
        for out_col, q in qs.items():
            rank = np.ceil(total * q)
            hit = (
                g[cum >= rank]
                .groupby(keys, sort=False, as_index=False)
                .first()[keys + [col]]
                .rename(columns={col: out_col})
            )
            out = hit if out is None else out.merge(hit, on=keys)
        return out

    return bucketed_groupby_apply(hist, keys, pick, num_buckets)


def grouped_quantile_cont(ds, keys, col, q: float = 0.5, out_col=None, num_buckets: int = 64):
    """Exact INTERPOLATED quantile per group (DuckDB ``quantile_cont`` /
    SQL ``percentile_cont``: linear interpolation between the order
    statistics at 0-based fractional rank ``h = (n-1)*q``).

    Same scale shape as :func:`grouped_quantile_disc`: a partial-combined
    (keys, value) COUNT histogram is the only thing that shuffles; the
    per-group walk reads cumulative counts over distinct values and picks
    the two adjacent order statistics to interpolate."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"{col}_q{q}"
    hist = pre_aggregate_ds(ds, keys + [col], {"__n": (None, "count")}, num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + [col], kind="mergesort")
        grp = g.groupby(keys, sort=False)
        cum = grp["__n"].cumsum()
        total = grp["__n"].transform("sum")
        h = (total - 1) * q  # 0-based fractional rank
        lo_rank = np.floor(h) + 1  # 1-based ranks of the two order stats
        hi_rank = np.ceil(h) + 1
        lo = (
            g[cum >= lo_rank]
            .groupby(keys, sort=False, as_index=False)
            .first()[keys + [col]]
            .rename(columns={col: "__lo"})
        )
        hi = (
            g[cum >= hi_rank]
            .groupby(keys, sort=False, as_index=False)
            .first()[keys + [col]]
            .rename(columns={col: "__hi"})
        )
        fr = (
            g.assign(__frac=h - np.floor(h))[keys + ["__frac"]]
            .groupby(keys, sort=False, as_index=False)
            .first()
        )
        m = lo.merge(hi, on=keys).merge(fr, on=keys)
        m[out_col] = m["__lo"] + (m["__hi"] - m["__lo"]) * m["__frac"]
        return m[keys + [out_col]]

    return bucketed_groupby_apply(hist, keys, pick, num_buckets)


def pivot_sum(ds, key, pivot_col, value_col, categories):
    """Pivot: one output row per ``key``, one column per category holding
    ``SUM(value_col) WHERE pivot_col == category`` (0.0 where absent —
    SQL twin ``SUM(CASE WHEN pivot_col='c' THEN value ELSE 0 END)``).

    Realization: a vectorized map projects one masked value column per
    category, then the partial-combined grouped sum reduces them — the
    shuffle moves one partial row per (key, batch) regardless of corpus
    size, and the category set (bounded, user-declared or discovered via
    a cheap ``Dataset.unique``) never shuffles at all. Category names
    become output column names, so they must not collide with ``key``."""
    cats = list(categories)
    if key in cats:
        raise SchemaError(f"category name collides with key column: {key!r}")

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        out = {key: df[key]}
        v = df[value_col].astype("float64")
        pv = df[pivot_col]
        for c in cats:
            out[c] = v.where(pv == c, 0.0)
        return pd.DataFrame(out)

    wide = ds.map_batches(widen, batch_format="pandas")
    return pre_aggregate_ds(wide, key, {c: (c, "sum") for c in cats})


def stratified_sample(ds, stratum_col, id_col, rates: dict, default_rate: float = 0.0):
    """Deterministic stratified sampling: keep a row iff its stable
    per-id hash falls below the stratum's rate.

    The hash is the Knuth multiplicative mix ``(id * 2654435761) mod
    2^32`` scaled to basis points — fixed and documented so an external
    system (or the DuckDB oracle) can reproduce the exact sample. A
    training-data pipeline uses this to downsample dominant strata
    (language, domain, source) without a shuffle: the operator is a
    stateless map over blocks, scale-free at any corpus size. Sampling
    DECISIONS depend only on (id, stratum), so the sample is stable
    under repartitioning, resume, and reordering — the property random()
    sampling lacks.

    Reference seed: none (the reference has no sampling at all,
    SURVEY.md §2.1 "does NOT implement"); required for the
    training-data operator set (brief: stratified/deterministic
    sampling for corpus shaping).
    """
    bps = {k: int(sql_round(r * 10000)) for k, r in rates.items()}
    dflt = int(sql_round(default_rate * 10000))

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # uint64 math: int64 would overflow-wrap for ids above ~3.47e9
        # (the SQL twin casts to HUGEINT for the same reason)
        h = (
            (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        ) % np.uint64(10000)
        h = h.astype(np.int64)
        strata = t[stratum_col].to_pandas()
        cut = strata.map(bps).fillna(dflt).to_numpy(dtype=np.int64)
        return t.filter(pa.array(h < cut))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_k_per_group(ds, group_col, id_col, k: int, num_buckets: int = 64):
    """Deterministic "k examples per group": within each group, keep the
    k rows whose stable per-id hash ranks smallest (ties by id) — the
    per-class subsampling step of a training-data pipeline ("3 examples
    per label", "N pages per domain"), reproducible under repartitioning
    and resume, and exactly replayable in SQL via ``row_number() OVER
    (PARTITION BY g ORDER BY (id::HUGEINT * 2654435761) %% 4294967296, id)``
    (HUGEINT: a 64-bit SQL multiply overflows for ids above ~3.47e9).

    One bucketed shuffle on the group key co-locates each group; the
    in-bucket cut is a vectorized sort + cumcount. Group sizes must fit
    a worker (same contract as the window functions)."""

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        df = df.copy()
        # uint64 math: int64 overflow-wraps for ids above ~3.47e9 and
        # the SQL replay (HUGEINT multiply) could never reproduce it
        df["__h"] = (
            (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        ).astype(np.int64)
        return df

    hashed = ds.map_batches(add_hash, batch_format="pandas")

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "__h", id_col], kind="mergesort")
        rank = g.groupby(group_col, sort=False).cumcount()
        return g[rank < k].drop(columns=["__h"])

    return bucketed_groupby_apply(hashed, group_col, cut, num_buckets)



def grouped_approx_quantile(
    ds, keys, col, q: float, alpha: float = 0.01, out_col=None, num_buckets: int = 64
):
    """Approximate grouped quantile with RELATIVE-error guarantee alpha
    (DDSketch log-histogram, VLDB 2019): the returned value v satisfies
    |v - true_q| <= alpha * true_q for positive values.

    This is the scale path grouped_quantile_disc/cont can't take: the
    exact operators shuffle one histogram row per DISTINCT VALUE per
    key, which for continuous corpus-scale columns is the corpus
    itself. The DDSketch partial is AT MOST one row per (key, log
    bucket, batch) — bucket count is bounded by the value RANGE, not
    the row count (log_gamma(max/min) buckets; ~920 per key for
    alpha=0.01 over 8 decades) — and bucket-count merges are plain
    sums, so partials combine associatively across batches, buckets
    and nodes. Zeros land in a dedicated bucket; negatives mirror into
    a negative store (same guarantee on |v|).
    """
    out_col = out_col or f"approx_q{int(q * 100)}"
    key_list = [keys] if isinstance(keys, str) else list(keys)
    merged = dd_sketch_table(ds, key_list, col, alpha, num_buckets)
    return bucketed_groupby_apply(
        merged, key_list, _dd_finish_fn(key_list, q, alpha, out_col), num_buckets
    )


def _dd_bucket_math(alpha: float):
    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = np.log(gamma)

    # log indices are BIASED so sub-1 values (negative log index) never
    # collide with the zero bucket or flip the store parity; the bias
    # covers the full float64 exponent range at alpha >= 0.005
    OFF = np.int64(200_000)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        # 0 -> bucket 0; v>0 -> even store; v<0 -> odd store (mirrored)
        b = np.zeros(len(v), dtype=np.int64)
        pos = v > 0
        neg = v < 0
        jp = np.ceil(np.log(v[pos]) / lg).astype(np.int64) + OFF
        jn = np.ceil(np.log(-v[neg]) / lg).astype(np.int64) + OFF
        b[pos] = jp * 2 + 2
        b[neg] = jn * 2 + 3
        return b

    def value_of(b: np.ndarray) -> np.ndarray:
        v = np.zeros(len(b), dtype=np.float64)
        pos = (b >= 2) & (b % 2 == 0)
        neg = (b >= 3) & (b % 2 == 1)
        v[pos] = 2.0 * np.power(gamma, ((b[pos] - 2) // 2 - OFF).astype(np.float64)) / (1.0 + gamma)
        v[neg] = -2.0 * np.power(gamma, ((b[neg] - 3) // 2 - OFF).astype(np.float64)) / (1.0 + gamma)
        return v

    return bucket_of, value_of


def _dd_partial_fn(key_list, col, alpha: float):
    bucket_of, _ = _dd_bucket_math(alpha)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[key_list + [col]].dropna(subset=[col])
        if not len(d):
            return pd.DataFrame(
                {**{k: pd.Series([], dtype=object) for k in key_list},
                 "__b": pd.Series([], dtype="int64"),
                 "__c": pd.Series([], dtype="int64")}
            )
        d = d.assign(__b=bucket_of(d[col].to_numpy(dtype=np.float64)))
        g = d.groupby(key_list + ["__b"], sort=False, as_index=False).size()
        return g.rename(columns={"size": "__c"})

    return partial


def _dd_finish_fn(key_list, q: float, alpha: float, out_col):
    _, value_of = _dd_bucket_math(alpha)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # negative store descending |v| < zeros < positive ascending:
        # order buckets by their representative value
        g = g.assign(__v=value_of(g["__b"].to_numpy()))
        g = g.sort_values(key_list + ["__v"], kind="mergesort")
        grp = g.groupby(key_list, sort=False)
        cum = grp["__c"].cumsum()
        total = grp["__c"].transform("sum")
        rank = np.maximum(np.ceil(q * total.to_numpy()), 1)
        hit = g[cum.to_numpy() >= rank].groupby(key_list, sort=False, as_index=False).first()
        return hit[key_list + ["__v"]].rename(columns={"__v": out_col})

    return finish


def dd_sketch_table(ds, keys, col, alpha: float = 0.01, num_buckets: int = 64):
    """Reduce a corpus to its PERSISTED mergeable DDSketch table: one
    (keys, __b, __c) log-bucket histogram per key — the quantile
    sibling of :func:`hll_sketch_table` (mergeable summaries). Bucket
    counts merge by SUM, so unioning sketch tables written from
    different snapshots and re-reducing with
    :func:`dd_quantile_sketches` answers any quantile over the combined
    data without rescanning raw rows, with the same relative-error
    alpha guarantee."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    parts = ds.map_batches(
        _dd_partial_fn(key_list, col, alpha), batch_format="pandas"
    )
    return pre_aggregate_ds(
        parts, key_list + ["__b"], {"__c": ("__c", "sum")}, num_buckets
    )


def dd_quantile_sketches(
    sketches, keys, q: float, alpha: float = 0.01, out_col=None,
    num_buckets: int = 64,
):
    """Quantile estimates from one or a UNION of :func:`dd_sketch_table`
    outputs (same ``alpha`` required): re-merge duplicate log buckets
    across snapshots (sum), then the standard DDSketch rank walk."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    out_col = out_col or f"approx_q{int(q * 100)}"

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        out = df[key_list].copy()
        out["__b"] = df["__b"].astype("int64")
        out["__c"] = df["__c"].astype("int64")
        return out

    merged = pre_aggregate_ds(
        sketches.map_batches(norm, batch_format="pandas"),
        key_list + ["__b"],
        {"__c": ("__c", "sum")},
        num_buckets,
    )
    return bucketed_groupby_apply(
        merged, key_list, _dd_finish_fn(key_list, q, alpha, out_col), num_buckets
    )

def bloom_semi_join(ds, keys_ds, on: str, num_bits: int = 1 << 23, num_hashes: int = 4):
    """EXACT semi join against a large key set, Bloom-prefiltered.

    :func:`semi_anti_join` broadcasts the exact key set — fine for
    bounded dimensions, corpus-sized for e.g. "users who purchased" at
    web scale. This is the scale pattern: the key side collapses
    map-side into fixed-size bitmap partials (packed uint64 words, 1 MiB
    at the default 2^23 bits) that OR together — associative, so on a
    real cluster the OR is a tree reduce; here the driver folds the
    per-block partials. ONE broadcast of the bitmap then prefilters the
    probe side in a shuffle-free vectorized scan: Bloom filters have no
    false negatives, so everything dropped is truly non-matching, and
    the surviving ~selectivity·corpus + false positives (rate
    ``(1-e^(-kn/m))^k``) are resolved EXACTLY by the bucketed hash join
    against the distinct keys — the expensive exact machinery only ever
    sees the survivors.
    """
    from .hashing import splitmix64

    nb = np.uint64(num_bits)
    words = num_bits // 64
    seeds = [np.uint64(0x9E3779B97F4A7C15 * (i + 1) & (2**64 - 1)) for i in range(num_hashes)]

    def key_hashes(vals) -> list:
        arr = np.asarray(vals)
        if arr.dtype.kind in "iuf":
            base = arr.astype(np.uint64)
            return [splitmix64(base ^ s) % nb for s in seeds]
        h0 = hash_strings([str(v) for v in vals], seed=13)
        return [splitmix64(h0 ^ s) % nb for s in seeds]

    def build(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(words, dtype=np.uint64)
        if len(df):
            for pos in key_hashes(df[on].to_numpy()):
                np.bitwise_or.at(
                    bm, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        return pd.DataFrame({"__bm": [bm.tobytes()]})

    parts = keys_ds.select_columns([on]).map_batches(build, batch_format="pandas")
    bitmap = np.zeros(words, dtype=np.uint64)
    for blob in parts.to_pandas()["__bm"]:
        bitmap |= np.frombuffer(blob, dtype=np.uint64)
    bref = ray.put(bitmap)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        bm = ray.get(bref)
        keep = np.ones(len(df), dtype=bool)
        for pos in key_hashes(df[on].to_numpy()):
            word = bm[(pos >> np.uint64(6)).astype(np.int64)]
            keep &= (word >> (pos & np.uint64(63))) & np.uint64(1) > 0
        return df[keep]

    survivors = ds.map_batches(probe, batch_format="pandas")
    # map-side dedup only; the exact tier dedups per bucket inside the
    # join (dedup_right) — no global distinct shuffle on the key set
    keys_slim = keys_ds.select_columns([on]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    return hash_join(
        survivors,
        keys_slim,
        on=on,
        left_schema=ds.schema(),
        right_schema=pa.schema([(on, dict(zip(ds.schema().names, ds.schema().types))[on])]),
        dedup_right=True,
    )


def rollup_aggregate(ds, keys, aggs):
    """SQL ``GROUP BY ROLLUP(k1, k2, ...)``: aggregates at every key
    prefix level down to the grand total, rolled-up key columns NULL.

    Sugar for :func:`grouping_sets_aggregate` over the key prefixes
    (finest level first, grand total last) — ONE corpus scan, coarser
    levels re-aggregated from the finest. Kinds: sum, count, min, max
    (the algebraic ones that re-aggregate losslessly; SQL NULL-SUM
    semantics preserved via min_count=1 there)."""
    keys = list(keys)
    return grouping_sets_aggregate(
        ds, [keys[:i] for i in range(len(keys), -1, -1)], aggs
    )


def cube_aggregate(ds, keys, aggs):
    """SQL ``GROUP BY CUBE(k1, k2, ...)``: aggregates at EVERY key
    subset (2^k levels), absent key columns NULL.

    Sugar for :func:`grouping_sets_aggregate` over ALL key subsets —
    same scan discipline (ONE corpus scan at the finest level, each
    subset re-aggregated from it). Kinds: sum, count, min, max."""
    from itertools import combinations

    keys = list(keys)
    sets = [
        list(sub) for r in range(len(keys), -1, -1) for sub in combinations(keys, r)
    ]
    return grouping_sets_aggregate(ds, sets, aggs)


def grouping_sets_aggregate(ds, sets, aggs):
    """SQL ``GROUP BY GROUPING SETS ((..), (..), ...)`` — the general
    form ROLLUP and CUBE are sugar for: aggregate at exactly the
    requested key subsets, absent key columns NULL.

    Same scan discipline as :func:`rollup_aggregate`: ONE
    partial-combined corpus scan at the finest level (the union of all
    requested keys), then each requested set re-aggregates that
    dimension-bounded result driver-side. Kinds: sum, count, min, max
    (algebraic — they re-aggregate losslessly; AVG would need its
    sum/count partials carried instead)."""
    sets = [list(s) for s in sets]
    keys = list(dict.fromkeys(k for s in sets for k in s))
    if not keys:
        raise PlanError("grouping_sets needs at least one non-empty set")
    plan = {}
    for out_col, (_, kind) in aggs.items():
        if kind == "count":
            plan[out_col] = "sum"
        elif kind == "sum":
            # min_count=1: SQL NULL-SUM semantics (see rollup_aggregate)
            plan[out_col] = lambda s: s.sum(min_count=1)
        elif kind in ("min", "max"):
            plan[out_col] = kind
        else:
            raise PlanError(f"grouping_sets does not support kind {kind!r}")
    finest = pre_aggregate(ds, keys, aggs)
    levels = []
    for sub in sets:
        if set(sub) == set(keys):
            lv = finest.copy()
        elif sub:
            lv = finest.groupby(sub, as_index=False, observed=True, dropna=False).agg(plan)
        else:
            lv = finest[list(plan)].agg(plan).to_frame().T
        for k in keys:
            if k not in sub:
                lv[k] = None
        levels.append(lv[keys + list(aggs)])
    out = pd.concat(levels, ignore_index=True)
    # the grand-total row builds via .agg().to_frame().T, which promotes
    # int aggregates to float64 and leaks float counts to every level
    # through the concat; counts are definitionally integral, so re-cast
    # here instead of relying on each caller (ADVICE r2 — float64 loses
    # integer precision past 2^53)
    for out_col, (_, kind) in aggs.items():
        if kind == "count":
            out[out_col] = out[out_col].astype("int64")
    return out


def funnel(ds, user_col, ts_col, type_col, steps, num_buckets: int = 64):
    """Ordered funnel analysis: how many users completed step 1, then
    step 2 AT OR AFTER their step-1 time, then step 3 after that, ...
    -> ONE row of per-step user counts (``n_<step>`` columns).

    Realization: one bucketed shuffle co-locates each user's events;
    inside a bucket the sequential dependency (step i's clock starts at
    the user's step i-1 completion) is resolved with vectorized
    merge + groupby-min per step — no per-user Python. Each bucket emits
    a single partial-count row (users are hash-partitioned, so bucket
    counts are disjoint) and the driver sums ``num_buckets`` rows."""
    steps = list(steps)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cur = None  # per-user completion time of the previous step
        out = {}
        for s in steps:
            rows = g.loc[g[type_col] == s].reset_index(drop=True)
            if cur is not None:
                rows = rows.merge(cur, on=user_col)
                rows = rows[rows[ts_col] >= rows["__prev"]]
            t = rows.groupby(user_col, sort=False, as_index=False)[ts_col].min()
            out[f"n_{s}"] = np.int64(len(t))
            cur = t.rename(columns={ts_col: "__prev"})
        return pd.DataFrame([out])

    parts = bucketed_groupby_apply(
        ds.select_columns([user_col, ts_col, type_col]),
        user_col,
        per_bucket,
        num_buckets,
    )
    total = parts.to_pandas().sum()  # num_buckets partial rows
    return pd.DataFrame([total.astype("int64")])


def set_op(left, right, cols, op: str, num_buckets: int = 64):
    """SQL ``INTERSECT`` / ``EXCEPT`` (set semantics — distinct rows).

    Map-side distinct per batch (the combiner), then ONE bucketed
    shuffle of tagged distinct rows; per group the presence of each
    side reduces to min/max of the side tag — fully vectorized, no
    per-group Python. Both inputs must share the ``cols`` schema."""
    if op not in ("intersect", "except"):
        raise PlanError(f"unsupported set op: {op!r}")
    cols = [cols] if isinstance(cols, str) else list(cols)

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            u = df[cols].drop_duplicates()
            u = u.copy()
            u["__side"] = np.int64(side)
            return u

        return fn

    lt = left.select_columns(cols).map_batches(tag(0), batch_format="pandas")
    rt = right.select_columns(cols).map_batches(tag(1), batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL set ops treat NULLs as equal and KEEP
        # NULL-bearing rows (review r2)
        gb = g.groupby(cols, sort=False, as_index=False, dropna=False)["__side"]
        mn, mx = gb.min(), gb.max()
        if op == "intersect":
            keep = (mn["__side"] == 0) & (mx["__side"] == 1)
        else:  # except: on the left, never on the right
            keep = mx["__side"] == 0
        return mn.loc[keep, cols]

    return bucketed_groupby_apply(lt.union(rt), cols, reduce, num_buckets)


def set_op_all(left, right, cols, op: str, num_buckets: int = 64):
    """SQL ``INTERSECT ALL`` / ``EXCEPT ALL`` (BAG semantics — row
    multiplicities survive: intersect keeps min(l, r) copies, except
    keeps max(l - r, 0)).

    Map-side value_counts per batch is the combiner — only (row, count)
    partials cross ONE bucketed exchange — and per group the two side
    counts reduce to the multiplicity arithmetic, rows re-emitted with
    ``np.repeat``. NULL key values compare equal and are kept (the SQL
    set-op rule, unlike joins)."""
    if op not in ("intersect_all", "except_all"):
        raise PlanError(f"unsupported set op: {op!r}")
    cols = [cols] if isinstance(cols, str) else list(cols)

    def counted(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            g = df[cols].groupby(
                cols, sort=False, as_index=False, dropna=False
            ).size()
            g = g.rename(columns={"size": "__c"})
            g["__side"] = np.int64(side)
            return g

        return fn

    lt = left.select_columns(cols).map_batches(counted(0), batch_format="pandas")
    rt = right.select_columns(cols).map_batches(counted(1), batch_format="pandas")

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        piv = g.groupby(cols + ["__side"], sort=False, as_index=False,
                        dropna=False)["__c"].sum()
        wide = piv.pivot_table(index=cols, columns="__side", values="__c",
                               aggfunc="sum", fill_value=0, dropna=False)
        for side in (0, 1):
            if side not in wide.columns:
                wide[side] = 0
        l, r = wide[0].to_numpy(np.int64), wide[1].to_numpy(np.int64)
        mult = np.minimum(l, r) if op == "intersect_all" else np.maximum(l - r, 0)
        keep = mult > 0
        base = wide.index.to_frame(index=False)[keep].reset_index(drop=True)
        return base.loc[base.index.repeat(mult[keep])].reset_index(drop=True)

    return bucketed_groupby_apply(lt.union(rt), cols, reduce, num_buckets)


# ---------------------------------------------------------------------------
# skew diagnostics: hot-key detection (the pre-pass that sizes num_salts)


def cross_join_small(ds, small_df: pd.DataFrame,
                     max_broadcast_rows: int = 10_000):
    """SQL CROSS JOIN against a bounded parameter table (scenario
    grids, rate tables): every input row pairs with every small-side
    row. Broadcast once via ``ray.put``; each block replicates itself
    |small| times map-side — shuffle-free, output grows by the
    small-side row count. Guarded like :func:`broadcast_join`: a
    corpus-scale "small" side is a plan bug, fail fast."""
    if len(small_df) > max_broadcast_rows:
        raise PlanError(
            f"cross_join_small: small side has {len(small_df)} rows "
            f"(> {max_broadcast_rows}); a cross join against a "
            "corpus-scale table is a plan bug"
        )
    shared = set(small_df.columns)
    ref = ray.put(small_df.reset_index(drop=True))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        overlap = shared & set(df.columns)
        if overlap:
            raise SchemaError(f"cross join column clash: {sorted(overlap)}")
        s = ray.get(ref)
        n, m = len(df), len(s)
        left = df.iloc[np.repeat(np.arange(n), m)].reset_index(drop=True)
        right = s.iloc[np.tile(np.arange(m), n)].reset_index(drop=True)
        return pd.concat([left, right], axis=1)

    return ds.map_batches(fn, batch_format="pandas")


def gap_fill(ds, key_col: str, ts_col: str, val_col: str,
             freq: str = "h", num_buckets: int = 64):
    """Time-series gap-fill / resample with forward fill (an operator
    Ray Data lacks): for every key, emit one row per ``freq`` step from
    that key's min to max timestamp; steps with no input row carry the
    previous step's value (SQL ``last_value(v IGNORE NULLS)`` over a
    ``generate_series`` grid). Input must be one row per (key, step) —
    pre-aggregate first (e.g. :func:`pre_aggregate_ds` on the truncated
    timestamp).

    Scale shape: ONE bucketed exchange co-locates each key's rows;
    in-bucket the fill is a per-key vectorized reindex + ffill (the
    per-key loop is key-cardinality-bounded, grids never leave their
    bucket). Output grows by the gap density — at 100 TB keep ``freq``
    coarse enough that per-key grids stay partition-sized."""

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, grp in g.groupby(key_col, sort=False):
            grp = grp.sort_values(ts_col)
            s = pd.Series(
                grp[val_col].to_numpy(),
                index=pd.DatetimeIndex(grp[ts_col]),
            )
            grid = pd.date_range(s.index.min(), s.index.max(), freq=freq)
            f = s.reindex(grid).ffill()
            out.append(
                pd.DataFrame(
                    {key_col: k, ts_col: f.index, val_col: f.to_numpy()}
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=g[key_col].dtype),
                    ts_col: pd.Series([], dtype="datetime64[us]"),
                    val_col: pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return bucketed_groupby_apply(ds, [key_col], fill, num_buckets)


def scd2_compress(ds, key_col: str, order_cols, state_col: str,
                  num_buckets: int = 64):
    """Slowly-changing-dimension (type 2) interval build: collapse each
    key's ordered state stream into change intervals
    ``(key, state, valid_from, valid_to)`` — the dimension-history
    materialization every warehouse MERGE pipeline needs. A row opens an
    interval when its state differs from the key's previous state
    (null-safe, SQL ``IS DISTINCT FROM``); ``valid_to`` is the next
    interval's ``valid_from`` and NULL (NaT) for the current interval.

    ``order_cols``: list defining a DETERMINISTIC total order per key —
    include a unique tiebreak column after the timestamp, or equal-time
    rows make the compression order-dependent. ``valid_from`` is the
    first order column at the change row.

    Scale shape: ONE bucketed exchange co-locates each key's rows;
    in-bucket everything is vectorized shift/compare — no per-key or
    per-row Python. Output is change-proportional, never row-scale."""
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    ts_col = order_cols[0]

    def compress(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, ignore_index=True)
        key = g[key_col]
        st = g[state_col]
        new_key = ~key.eq(key.shift()).to_numpy()
        prev = st.shift()
        same_state = (st.eq(prev) | (st.isna() & prev.isna())).to_numpy()
        c = g.loc[new_key | ~same_state]
        nk = c[key_col].to_numpy()
        vf = c[ts_col].reset_index(drop=True)
        vt = vf.shift(-1)
        vt[np.r_[nk[1:] != nk[:-1], True]] = (
            pd.NaT if np.issubdtype(vf.dtype, np.datetime64) else np.nan
        )
        return pd.DataFrame(
            {
                key_col: nk,
                state_col: c[state_col].to_numpy(),
                "valid_from": vf.to_numpy(),
                "valid_to": vt.to_numpy(),
            }
        )

    return bucketed_groupby_apply(ds, [key_col], compress, num_buckets)


def clustering_agreement(ds, pred_col: str, gold_col: str,
                         num_buckets: int = 64) -> pd.DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) between a
    predicted clustering and gold labels — THE entity-resolution /
    dedup-quality metric: per-item precision is the fraction of the
    item's predicted cluster sharing its gold label, recall the
    fraction of its gold class sharing its cluster; scores average over
    items. Rows where either label is NULL are excluded (pairwise-null,
    like corr).

    Scale shape: rows reduce through ONE map-side-combined (pred, gold)
    contingency aggregate that STAYS a Dataset (singleton clusters make
    cells item-scale — never collected); per-cluster and per-class
    marginal sums reduce it again to two more partial-combined
    aggregates whose per-key contribution ``(Σc²)/(Σc)`` uses the
    identity: item-average B-cubed precision = Σ_cells c²/cluster_size
    over n. Only four scalars ever reach the driver."""

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[pred_col, gold_col]]
        return out[out[pred_col].notna() & out[gold_col].notna()]

    cells = pre_aggregate_ds(
        ds.map_batches(slim, batch_format="pandas"),
        [pred_col, gold_col],
        {"c": (None, "count")},
        num_buckets=num_buckets,
    ).materialize()  # two marginal consumers below

    def add_c2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c2"] = df["c"].astype("float64") * df["c"].astype("float64")
        return df

    cells2 = cells.map_batches(add_c2, batch_format="pandas")

    def marginal_sum(key_col: str) -> tuple:
        per_key = pre_aggregate_ds(
            cells2, key_col, {"s2": ("c2", "sum"), "s1": ("c", "sum")},
            num_buckets=num_buckets,
        )
        contrib = per_key.map_batches(
            lambda d: pd.DataFrame(
                {"num": d["s2"].astype("float64") / d["s1"].astype("float64"),
                 "n": d["s1"].astype("float64")}
            ),
            batch_format="pandas",
        )
        return float(contrib.sum("num") or 0.0), float(contrib.sum("n") or 0.0)

    p_num, n = marginal_sum(pred_col)
    r_num, _ = marginal_sum(gold_col)
    if n == 0:
        return pd.DataFrame(
            {"n_items": [0], "bcubed_precision": [np.nan],
             "bcubed_recall": [np.nan], "bcubed_f1": [np.nan]}
        )
    prec, rec = p_num / n, r_num / n
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
    return pd.DataFrame(
        {
            "n_items": [int(n)],
            "bcubed_precision": [sql_round(prec, 6)],
            "bcubed_recall": [sql_round(rec, 6)],
            "bcubed_f1": [sql_round(f1, 6)],
        }
    )


def temporal_join(facts, dim: pd.DataFrame, key_col: str, ts_col: str,
                  valid_from: str = "valid_from", valid_to: str = "valid_to",
                  how: str = "left", num_buckets: int = 64):
    """Point-in-time (temporal) join: attach to each fact row the
    dimension version whose ``[valid_from, valid_to)`` interval contains
    its timestamp — the AS-OF dimension lookup every SCD2 history
    (:func:`scd2_compress`) exists to serve. NULL ``valid_to`` = open
    current version. Facts whose key has no covering interval keep NULL
    dim columns (``how='left'``) or drop (``'inner'``).

    ``dim``: a pandas frame (dimension histories are key-scale —
    change-compressed, broadcastable; for corpus-scale dims route both
    sides through :func:`bucketed_groupby_apply` with the same in-bucket
    body). One bucketed exchange co-locates facts by key; in-bucket the
    lookup is a vectorized ``merge_asof`` + interval-end mask."""
    if how not in ("left", "inner"):
        raise PlanError(f"temporal_join: unsupported how={how!r}")
    dim = dim.sort_values([valid_from, key_col], ignore_index=True)
    dim_cols = [c for c in dim.columns if c not in (key_col, valid_from, valid_to)]
    dim_ref = ray.put(dim)

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dim_ref)
        g = g.sort_values(ts_col, kind="mergesort", ignore_index=True)
        # pandas block round-trips can widen us->ns; merge_asof demands
        # identical key dtypes
        if (
            pd.api.types.is_datetime64_any_dtype(d[valid_from])
            and g[ts_col].dtype != d[valid_from].dtype
        ):
            g[ts_col] = g[ts_col].astype(d[valid_from].dtype)
        j = pd.merge_asof(
            g, d, by=key_col, left_on=ts_col, right_on=valid_from,
            direction="backward",
        )
        # merge_asof ignores interval ends: null out matches whose
        # interval closed before the fact's timestamp
        closed = j[valid_to].notna() & (j[ts_col] >= j[valid_to])
        j.loc[closed, dim_cols + [valid_from, valid_to]] = None
        if how == "inner":
            j = j[j[valid_from].notna()]
        return j.drop(columns=[valid_to])

    return bucketed_groupby_apply(facts, [key_col], probe, num_buckets)


def time_windowed(ds, part_col: str, ts_col: str, val_col: str, window: str,
                  kinds, out_prefix: str = "w_", num_buckets: int = 64):
    """Time-RANGE window aggregates (an operator Ray Data lacks): for
    each row, aggregate ``val_col`` over the trailing time window
    ``[ts - window, ts]`` within its ``part_col`` partition — SQL
    ``... OVER (PARTITION BY part ORDER BY ts RANGE BETWEEN INTERVAL
    window PRECEDING AND CURRENT ROW)``. ``kinds`` ⊆ {sum, mean,
    count, min, max}; ``window`` is a pandas offset string ('30min').

    One bucketed exchange co-locates each partition key; in-bucket the
    whole computation is a single vectorized time-based
    ``groupby().rolling(window, on=ts)`` — no per-row or per-key
    Python. Equal timestamps within a key would diverge from SQL RANGE
    peer semantics (SQL includes later peers at the same ts, a
    row-position rolling does not); callers with tied timestamps
    should disambiguate the order key first."""
    kinds = [kinds] if isinstance(kinds, str) else list(kinds)
    bad = set(kinds) - {"sum", "mean", "count", "min", "max"}
    if bad:
        raise PlanError(f"unsupported time-window kinds: {sorted(bad)}")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([part_col, ts_col], kind="mergesort")
        out = g.copy()
        roll = g.groupby(part_col, sort=False).rolling(window, on=ts_col)[val_col]
        for k in kinds:
            vals = getattr(roll, k)().to_numpy()
            if k == "count":
                out[f"{out_prefix}{k}"] = vals.astype("int64")
            else:
                out[f"{out_prefix}{k}"] = vals
        return out

    return bucketed_groupby_apply(ds, part_col, per_bucket, num_buckets)


def hot_keys(ds, keys, k: int = 10):
    """Top-k hottest key values by row count, with each key's share of
    total rows — the diagnostic a pipeline runs BEFORE a wide join or
    groupby to decide whether (and how hard) to salt. Deterministic
    tie-break: count desc, then key asc.

    Scale shape: per-batch value_counts partials (one row per (key,
    batch)), a grouped sum, then a distributed sort-limit for the cut —
    the total row count rides as one more partial column, so no second
    pass over the input. Only the k winners collect.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby(key_list, sort=False, dropna=False).size().rename("n")
        return vc.reset_index()

    agg = pre_aggregate_ds(
        ds.map_batches(counts, batch_format="pandas"), key_list, {"n": ("n", "sum")}
    ).materialize()  # key-cardinality-scale, pinned for the two consumers
    total = int(agg.sum("n"))
    out = (
        agg.sort(["n", *key_list], descending=[True] + [False] * len(key_list))
        .limit(k)
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["share"] = sql_round((out["n"] / total), 6)
    return out


def winsorize(ds, col: str, lower_q: float = 0.05, upper_q: float = 0.95):
    """Percentile clipping (winsorization): values below the
    ``lower_q`` quantile rise to it, values above ``upper_q`` drop to
    it — the outlier-robust feature transform. Cut points are exact
    ``quantile_disc`` values (rank = ceil(q*n) over the cumulative
    distinct-value histogram — the same rule DuckDB implements and
    :func:`quantile_bucketize` uses), from ONE partial-combined
    histogram exchange; the clip itself is shuffle-free. Other columns
    pass through. Same cardinality contract as ``quantile_bucketize``:
    the histogram is distinct-VALUE-scale and must stay driver-bounded
    — for unbounded continuous columns derive approximate cuts from
    :func:`grouped_approx_quantile` instead."""
    import math

    hist = (
        pre_aggregate_ds(ds.select_columns([col]), [col], {"__n": (None, "count")})
        .to_pandas()
        .sort_values(col)
        .reset_index(drop=True)
    )
    if not len(hist):
        return ds
    cum = hist["__n"].cumsum()
    total = int(cum.iloc[-1])

    def cut(q: float):
        return hist[col][cum >= math.ceil(total * q)].iloc[0]

    lo, hi = cut(lower_q), cut(upper_q)

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[col] = df[col].clip(lo, hi)
        return df

    return ds.map_batches(clip, batch_format="pandas")


def auto_hash_join(left, right, on, how: str = "inner",
                   num_buckets: int = 64, left_schema=None,
                   right_schema=None, hot_share: float = 0.1,
                   max_salts: int = 16):
    """:func:`hash_join` with the skew playbook built in: one
    diagnostic pass (:func:`hot_keys`, k=1) over the LEFT side's key
    column measures the hottest key's row share, and ``num_salts``
    sizes itself as ceil(share / hot_share) (capped at ``max_salts``)
    so the hot key's reducer work spreads back down to roughly a
    ``hot_share``-sized bucket. Below the threshold it degrades to a
    plain unsalted join — the diagnostic costs one extra scan of the
    left KEY column only (pass a materialized ``left`` when its
    upstream is expensive, or call :func:`hash_join` with explicit
    ``num_salts`` when the skew is already known).

    Salting requires ``how`` in ('inner', 'left') — same contract as
    ``hash_join``; other join types skip the diagnostic entirely."""
    import math

    on_cols = [on] if isinstance(on, str) else list(on)
    num_salts = 1
    if how in ("inner", "left"):
        head = hot_keys(left.select_columns(on_cols), on_cols, k=1)
        share = float(head["share"].iloc[0]) if len(head) else 0.0
        if share > hot_share:
            num_salts = int(min(max_salts, max(2, math.ceil(share / hot_share))))
            logging.getLogger("kgraft.relational").info(
                "auto_hash_join: hot key share %.3f > %.3f -> num_salts=%d",
                share, hot_share, num_salts,
            )
    return hash_join(
        left, right, on=on, how=how, num_buckets=num_buckets,
        num_salts=num_salts, left_schema=left_schema,
        right_schema=right_schema,
    )


def standardize(ds, col: str, out_col: str = "z", round_dp: int = 6, ddof: int = 1):
    """Two-pass global z-score standardization of one numeric column —
    the feature-scaling pass before clustering / anomaly cuts.

    Pass 1 reduces (sum, sum-of-squares, non-null count) — three floats
    per batch cross the exchange; the two scalars (mean, std) then ride
    into pass 2 as plain closure constants, so the transform itself is
    shuffle-free and streams. SQL twin:
    ``(x - AVG(x) OVER ()) / STDDEV_SAMP(x) OVER ()``.
    """

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype="float64")
        m = ~np.isnan(v)
        return pd.DataFrame(
            {
                "s": [float(v[m].sum())],
                "ss": [float((v[m] * v[m]).sum())],
                "n": [int(m.sum())],
            }
        )

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    if n <= ddof:
        raise PlanError(f"standardize needs more than {ddof} non-null rows, got {n}")
    s, ss = float(parts["s"].sum()), float(parts["ss"].sum())
    mean = s / n
    var = (ss - n * mean * mean) / (n - ddof)
    std = float(np.sqrt(max(var, 0.0)))
    if std == 0.0:
        raise PlanError(f"standardize: column {col!r} is constant")

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out[out_col] = sql_round(((df[col] - mean) / std), round_dp)
        return out

    return ds.map_batches(transform, batch_format="pandas")


def histogram(ds, col: str, lo: float, hi: float, n_bins: int):
    """Equi-width histogram of one numeric column over [lo, hi) — the
    distribution-profiling pass (bin = floor((x - lo) / width); rows
    outside the range and nulls are dropped). Returns a Dataset of
    (bin, bin_lo, n) — bin-count-bounded, one partial row per
    (bin, batch) crosses the exchange.
    """
    if not (hi > lo) or n_bins <= 0:
        raise PlanError(f"histogram needs hi > lo and n_bins > 0, got [{lo}, {hi}) x {n_bins}")
    width = (hi - lo) / n_bins

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype="float64")
        m = ~np.isnan(v) & (v >= lo) & (v < hi)
        b = np.floor((v[m] - lo) / width).astype("int64")
        # float edge: x just under hi can round into bin n_bins
        b = np.minimum(b, n_bins - 1)
        vc = pd.Series(b).value_counts()
        return pd.DataFrame(
            {"bin": vc.index.to_numpy(dtype="int64"), "n": vc.to_numpy(dtype="int64")}
        )

    agg = pre_aggregate_ds(
        ds.map_batches(binify, batch_format="pandas"), "bin", {"n": ("n", "sum")}
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["bin_lo"] = sql_round((lo + out["bin"] * width), 6)
        out["n"] = out["n"].astype("int64")
        return out[["bin", "bin_lo", "n"]]

    return agg.map_batches(finalize, batch_format="pandas")


# ---------------------------------------------------------------------------
# snapshot maintenance: upsert (MERGE) and diff (CDC)


def upsert(base, updates, key, version_col, num_buckets: int = 64,
           base_schema=None):
    """Latest-wins merge (SQL ``MERGE INTO`` / lakehouse upsert): for
    each key, keep the row with the highest ``version_col``; on version
    ties the UPDATES side wins, and same-side (key, version) duplicates
    break on a stable content hash of the full row — the output is
    deterministic across runs regardless of shuffle/block arrival order
    (ADVICE r2). Both sides must share one schema.

    One tagged union + ONE bucketed exchange on the key; per bucket a
    single vectorized sort + ``drop_duplicates(keep='last')`` — no
    per-key Python. Payload columns ride the shuffle once (never a
    second join against either snapshot); at corpus scale this is the
    standard incremental-snapshot maintenance pass.
    """
    key_list = [key] if isinstance(key, str) else list(key)
    schema = base_schema if base_schema is not None else base.schema()
    cols = list(schema.names)

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["__side"] = np.int8(side)
            return df

        return fn

    both = base.map_batches(tag(0), batch_format="pandas").union(
        updates.map_batches(tag(1), batch_format="pandas")
    )

    def keep_last(g: pd.DataFrame) -> pd.DataFrame:
        # stable content-hash tie-break for same-side duplicate
        # (key, version) rows — without it keep='last' falls to
        # in-bucket row order, which depends on shuffle arrival
        g = g.assign(
            __rh=pd.util.hash_pandas_object(g[cols], index=False).to_numpy()
        )
        g = g.sort_values(
            key_list + [version_col, "__side", "__rh"], kind="mergesort"
        )
        return g.drop_duplicates(key_list, keep="last").drop(
            columns=["__side", "__rh"]
        )

    return bucketed_groupby_apply(both, key_list, keep_last, num_buckets)


def snapshot_diff(a, b, key, cmp_cols, num_buckets: int = 64):
    """Change-data-capture between two snapshots: per key, classify as
    ``added`` (only in b), ``removed`` (only in a), or ``changed`` (in
    both with any ``cmp_cols`` difference); unchanged keys emit nothing.

    Both sides project to (key + cmp_cols), tag, and co-locate with ONE
    bucketed key exchange; per bucket a vectorized outer merge +
    ``np.select`` classifies every key. Assumes key-unique snapshots
    (the upsert invariant). NULL-safe: NULL vs NULL compares equal,
    NULL vs value is a change (SQL ``IS DISTINCT FROM``).
    """
    key_list = [key] if isinstance(key, str) else list(key)
    cmp_list = [cmp_cols] if isinstance(cmp_cols, str) else list(cmp_cols)
    cols = key_list + cmp_list

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["__side"] = np.int8(side)
            return df

        return fn

    both = a.select_columns(cols).map_batches(tag(0), batch_format="pandas").union(
        b.select_columns(cols).map_batches(tag(1), batch_format="pandas")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        ga = g[g["__side"] == 0][cols]
        gb = g[g["__side"] == 1][cols]
        m = ga.merge(gb, on=key_list, how="outer", suffixes=("_a", "_b"),
                     indicator=True)
        diff = np.zeros(len(m), dtype=bool)
        for c in cmp_list:
            xa, xb = m[f"{c}_a"], m[f"{c}_b"]
            # IS DISTINCT FROM: NULLs equal each other, differ from values
            diff |= (xa != xb) & ~(xa.isna() & xb.isna())
        change = np.select(
            [m["_merge"] == "right_only", m["_merge"] == "left_only", diff],
            ["added", "removed", "changed"],
            default="same",
        )
        out = m[key_list].copy()
        out["change"] = change
        return out[out["change"] != "same"]

    return bucketed_groupby_apply(both, key_list, classify, num_buckets)


def quantile_bucketize(ds, col, n_tiles: int, keep_cols, num_buckets: int = 64):
    """Global quantile binning (feature-engineering NTILE-by-value): cut
    points are the exact ``quantile_disc`` values at i/n_tiles, and each
    row's bucket is ``1 + #(cuts < value)`` — so equal values ALWAYS
    share a bucket (unlike SQL NTILE, which splits ties by row order).

    Scale shape: the only exchange is the partial-combined (value ->
    count) histogram — distinct-VALUE-scale, the same contract as
    :func:`grouped_quantile_disc`; it must be driver-bounded (use a
    bounded-cardinality column, or the DDSketch path
    :func:`grouped_approx_quantile` to derive approximate cuts for
    continuous columns). The n-1 cuts broadcast via ``ray.put`` and
    assignment is a shuffle-free ``searchsorted`` scan."""
    import math

    hist = (
        pre_aggregate_ds(ds, [col], {"__n": (None, "count")}, num_buckets)
        .to_pandas()
        .sort_values(col)
        .reset_index(drop=True)
    )
    if len(hist):
        # cuts and values stay in the column's NATIVE numeric dtype: a
        # float64 detour mis-buckets int64 values past 2^53, and
        # non-numeric columns fail with a typed PlanError instead of an
        # opaque numpy cast error (ADVICE r2)
        if pd.api.types.is_integer_dtype(hist[col]):
            np_dtype = np.int64
        elif pd.api.types.is_float_dtype(hist[col]):
            np_dtype = np.float64
        else:
            raise PlanError(
                f"quantile_bucketize needs a numeric column; {col!r} is "
                f"{hist[col].dtype}"
            )
        cum = hist["__n"].cumsum()
        total = int(cum.iloc[-1])
        cuts = [
            hist[col][cum >= math.ceil(total * i / n_tiles)].iloc[0]
            for i in range(1, n_tiles)
        ]
    else:  # empty input -> no cuts; assignment passes empty blocks through
        np_dtype = np.float64
        cuts = []
    cuts_ref = ray.put(np.asarray(cuts, dtype=np_dtype))  # kept sorted, dups kept
    cols = list(keep_cols)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cuts_ref)
        x = df[col].to_numpy(dtype=c.dtype if len(df) else np.float64)
        out = df[cols].copy()
        # side='left': equal-to-cut values do NOT pass the cut (x > c)
        out["bucket"] = (1 + np.searchsorted(c, x, side="left")).astype("int64")
        return out

    return ds.map_batches(assign, batch_format="pandas")


def _hist_cont_median(g: pd.DataFrame, keys: list, col: str, cnt: str) -> pd.DataFrame:
    """Continuous (interpolated) median per key group from a sorted-able
    (keys, value, count) histogram — the grouped_quantile_cont walk,
    factored so :func:`grouped_mad` can run it twice in one bucket."""
    g = g.sort_values(keys + [col], kind="mergesort")
    grp = g.groupby(keys, sort=False)
    cum = grp[cnt].cumsum()
    total = grp[cnt].transform("sum")
    h = (total - 1) * 0.5
    lo_rank = np.floor(h) + 1
    hi_rank = np.ceil(h) + 1
    lo = (
        g[cum >= lo_rank]
        .groupby(keys, sort=False, as_index=False)
        .first()[keys + [col]]
        .rename(columns={col: "__lo"})
    )
    hi = (
        g[cum >= hi_rank]
        .groupby(keys, sort=False, as_index=False)
        .first()[keys + [col]]
        .rename(columns={col: "__hi"})
    )
    fr = (
        g.assign(__frac=h - np.floor(h))[keys + ["__frac"]]
        .groupby(keys, sort=False, as_index=False)
        .first()
    )
    m = lo.merge(hi, on=keys).merge(fr, on=keys)
    m["__med"] = m["__lo"] + (m["__hi"] - m["__lo"]) * m["__frac"]
    return m[keys + ["__med"]]


def grouped_mad(ds, keys, col, out_col="mad", num_buckets: int = 64):
    """Median absolute deviation per group (robust spread — DuckDB
    ``mad``: the CONTINUOUS median of ``|x - median_cont(x)|``).

    One exchange total: the partial-combined (keys, value) COUNT
    histogram co-locates each key's distinct values; inside the bucket
    the interpolated median is computed from cumulative counts, the
    deviation histogram ``|value - med|`` derives from the SAME rows
    (counts carry over — no second corpus pass), and the median walk
    runs again over it. Distinct-value-scale, never row-scale, same
    contract as :func:`grouped_quantile_disc`."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    hist = pre_aggregate_ds(ds, keys + [col], {"__n": (None, "count")}, num_buckets)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        med = _hist_cont_median(g, keys, col, "__n")
        d = g.merge(med, on=keys)
        d["__dev"] = (d[col] - d["__med"]).abs()
        # distinct values can map to the same deviation -> re-sum
        d = d.groupby(keys + ["__dev"], as_index=False, sort=False)["__n"].sum()
        out = _hist_cont_median(d, keys, "__dev", "__n")
        return out.rename(columns={"__med": out_col})

    return bucketed_groupby_apply(hist, keys, pick, num_buckets)


def grouped_gmean(ds, keys, col, out_col="gmean", num_buckets: int = 64):
    """Geometric mean per group: ``exp(AVG(ln x))`` — one shuffle-free
    log transform feeding the algebraic mean partials (nothing new
    crosses the exchange). Requires positive values; NULLs are skipped
    like SQL AVG. SQL twin: ``exp(avg(ln(col)))``."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def ln(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys + [col]].copy()
        out[col] = np.log(out[col].to_numpy(dtype="float64"))
        return out

    out = pre_aggregate(
        ds.select_columns(keys + [col]).map_batches(ln, batch_format="pandas"),
        keys,
        {out_col: (col, "mean")},
    )
    out[out_col] = np.exp(out[out_col].to_numpy(dtype="float64"))
    return out


def grouped_hmean(ds, keys, col, out_col="hmean", num_buckets: int = 64):
    """Harmonic mean per group: ``n / SUM(1/x)`` = ``1 / AVG(1/x)`` —
    same shape as :func:`grouped_gmean` with a reciprocal transform.
    SQL twin: ``1.0 / avg(1.0 / col)``."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def inv(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys + [col]].copy()
        out[col] = 1.0 / out[col].to_numpy(dtype="float64")
        return out

    out = pre_aggregate(
        ds.select_columns(keys + [col]).map_batches(inv, batch_format="pandas"),
        keys,
        {out_col: (col, "mean")},
    )
    out[out_col] = 1.0 / out[out_col].to_numpy(dtype="float64")
    return out


def grouped_entropy(ds, keys, col, out_col="entropy", num_buckets: int = 64):
    """Shannon entropy (natural log) of ``col``'s empirical distribution
    per key group — ``-sum(p * ln p)`` over the group's category
    frequencies. NULL categories are excluded (DuckDB ``entropy``
    semantics, which this matches up to its log base: DuckDB uses log2,
    so the SQL twin is spelled from raw counts instead).

    Scale shape: one partial row per (key, category, batch) crosses the
    exchange — the map side collapses raw rows to counts first, so a
    million-event user costs the shuffle as many rows as it has DISTINCT
    event types per batch. Final entropy is a vectorized transform over
    the merged (key, category) count table inside each bucket.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or any(c not in df.columns for c in key_list + [col]):
            cols = {
                k: pd.Series([], dtype=df[k].dtype if k in df.columns else object)
                for k in key_list + [col]
            }
            cols["__c"] = pd.Series([], dtype="int64")
            return pd.DataFrame(cols)
        d = df[df[col].notna()]
        return (
            d.groupby(key_list + [col], observed=True, sort=False, dropna=False)
            .size()
            .rename("__c")
            .reset_index()
        )

    partials = ds.select_columns(key_list + [col]).map_batches(
        partial, batch_format="pandas"
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        cc = g.groupby(
            key_list + [col], as_index=False, observed=True, sort=False, dropna=False
        )["__c"].sum()
        tot = cc.groupby(key_list, sort=False)["__c"].transform("sum")
        p = cc["__c"].to_numpy(dtype="float64") / tot.to_numpy(dtype="float64")
        cc["__h"] = -p * np.log(p)
        out = cc.groupby(key_list, as_index=False, sort=False)["__h"].sum()
        return out.rename(columns={"__h": out_col})

    return bucketed_groupby_apply(partials, key_list, finalize, num_buckets)


def robust_standardize(
    ds, keys, col, out_col="rz", scale: float = 1.4826, num_buckets: int = 64
):
    """Per-group ROBUST z-score: ``(x - median) / (scale * MAD)`` —
    outlier-resistant standardization (1.4826 makes MAD a consistent
    sigma estimator under normality). Median and MAD are the
    interpolated (continuous) statistics of :func:`grouped_mad`, and
    both derive from ONE partial-combined (keys, value) count histogram
    — a single distinct-value-scale exchange; the per-row transform is
    then shuffle-free (the small per-key (median, mad) table broadcasts
    via ``ray.put``). Groups with MAD = 0 emit NULL (division guard).
    Dimension-bounded key spaces only (the stats table is collected).

    SQL twin: ``(col - median(col) OVER group) / (scale * mad(col))``
    spelled as a join against ``GROUP BY keys`` of ``median``/``mad``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    hist = pre_aggregate_ds(
        ds.select_columns(key_list + [col]),
        key_list + [col],
        {"__n": (None, "count")},
        num_buckets,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g[col].notna()]  # SQL median/mad skip NULLs
        if len(g) == 0:
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype=g[k].dtype) for k in key_list},
                    "__med": pd.Series([], dtype="float64"),
                    "__mad": pd.Series([], dtype="float64"),
                }
            )
        med = _hist_cont_median(g, key_list, col, "__n")
        d = g.merge(med, on=key_list)
        d["__dev"] = (d[col] - d["__med"]).abs()
        d = d.groupby(key_list + ["__dev"], as_index=False, sort=False)["__n"].sum()
        mad = _hist_cont_median(d, key_list, "__dev", "__n").rename(
            columns={"__med": "__mad"}
        )
        return med.merge(mad, on=key_list)

    stats = bucketed_groupby_apply(hist, key_list, pick, num_buckets).to_pandas()
    if len(stats) > BROADCAST_ROW_GUARD:
        raise ConfigError(
            f"robust_standardize key space has {len(stats)} groups "
            f"(> {BROADCAST_ROW_GUARD}); use a join-based plan for "
            "corpus-cardinality keys"
        )
    ref = ray.put(stats)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        m = df[key_list].merge(ray.get(ref), on=key_list, how="left")
        denom = scale * m["__mad"].to_numpy(dtype="float64")
        x = df[col].to_numpy(dtype="float64")
        out = df.copy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (x - m["__med"].to_numpy(dtype="float64")) / denom
        out[out_col] = np.where(denom == 0, np.nan, z)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def validate(ds, rules, num_buckets: int = 64) -> pd.DataFrame:
    """Data-quality assertion report (the expectations pass a pipeline
    runs before publishing a table): one streaming scan evaluates every
    row-local rule vectorized and emits per-rule violation-count
    partials; ``unique`` rules reduce through a map-side-combined
    key-count aggregate that STAYS a Dataset (duplicate keys are
    corpus-scale in the failure case — only the violation COUNT reaches
    the driver).

    ``rules``: list of dicts —
      {"kind": "not_null",        "col": c}
      {"kind": "in_range",        "col": c, "lo": x, "hi": y}   (inclusive; NULL passes — pair with not_null)
      {"kind": "regex",           "col": c, "pattern": p}        (full match; NULL passes)
      {"kind": "accepted_values", "col": c, "values": [...]}     (NULL passes)
      {"kind": "unique",          "col": c}                      (rows beyond the first per key violate)
      {"kind": "fk", "col": c, "ref": other_ds, "ref_col": rc}   (DISTINCT child keys with no parent violate)
    Returns (rule, kind, col, n_rows, n_violations, passed)."""
    import re as _re

    row_rules = [r for r in rules if r["kind"] not in ("unique", "fk")]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]
    fk_rules = [r for r in rules if r["kind"] == "fk"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"__n": [np.int64(len(df))]}
        for i, r in enumerate(row_rules):
            col = df[r["col"]]
            if r["kind"] == "not_null":
                bad = col.isna()
            elif r["kind"] == "in_range":
                bad = col.notna() & ((col < r["lo"]) | (col > r["hi"]))
            elif r["kind"] == "regex":
                bad = col.notna() & ~col.astype(str).str.fullmatch(
                    _re.compile(r["pattern"])
                )
            elif r["kind"] == "accepted_values":
                bad = col.notna() & ~col.isin(r["values"])
            else:
                raise PlanError(f"validate: unknown rule kind {r['kind']!r}")
            out[f"__v{i}"] = [np.int64(bad.sum())]
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n_rows = int(parts["__n"].sum())
    rows = []
    for i, r in enumerate(row_rules):
        v = int(parts[f"__v{i}"].sum())
        rows.append((f"{r['kind']}({r['col']})", r["kind"], r["col"], v))
    for r in uniq_rules:
        per_key = pre_aggregate_ds(
            ds, r["col"], {"__c": (None, "count")}, num_buckets
        )
        extras = per_key.map_batches(
            lambda d: pd.DataFrame(
                {"x": (d["__c"].astype("int64") - 1).clip(lower=0)}
            ),
            batch_format="pandas",
        )
        v = int(extras.sum("x") or 0)
        rows.append((f"unique({r['col']})", "unique", r["col"], v))
    for r in fk_rules:
        # referential integrity: child keys with no parent — distinct
        # child keys join the distinct parent keys through ONE bucketed
        # LEFT join; only the orphan COUNT reaches the driver
        child_keys = distinct(ds, [r["col"]], num_buckets)
        parent_keys = distinct(r["ref"], [r["ref_col"]], num_buckets)
        marked = parent_keys.map_batches(
            lambda d, c=r["ref_col"], cc=r["col"]: pd.DataFrame(
                {cc: d[c], "__hit": np.int8(1)}
            ),
            batch_format="pandas",
        )
        j = hash_join(
            child_keys,
            marked,
            on=r["col"],
            how="left",
            num_buckets=num_buckets,
            left_schema=pa.schema([(r["col"], pa.int64())]),
            right_schema=pa.schema(
                [(r["col"], pa.int64()), ("__hit", pa.int8())]
            ),
        )
        import pyarrow.compute as _pc

        orphan_keys = j.map_batches(
            lambda t: pa.table(
                {
                    "o": pa.array(
                        _pc.is_null(t["__hit"]).to_numpy(zero_copy_only=False)
                        .astype(np.int64),
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        v = int(orphan_keys.sum("o") or 0)
        rows.append(
            (f"fk({r['col']}->{r['ref_col']})", "fk", r["col"], v)
        )
    out = pd.DataFrame(rows, columns=["rule", "kind", "col", "n_violations"])
    out.insert(3, "n_rows", np.int64(n_rows))
    out["passed"] = (out["n_violations"] == 0).astype("int64")
    return out.sort_values("rule", ignore_index=True)


def apply_cdc(base, changes, key, version_col: str, op_col: str = "op",
              num_buckets: int = 64, base_schema=None):
    """Apply a change-data-capture stream WITH DELETES to a base
    snapshot (the op-aware upgrade of :func:`upsert`): per key, the
    highest-``version_col`` change wins — 'I'/'U' replace the base row,
    'D' removes the key; untouched base rows pass through. Change rows
    carry the base schema plus (version, op); base rows rank below
    every change (version −∞ semantics via the side tag). Same
    deterministic tie-breaks as upsert (changes over base, stable row
    hash within a side — document-unique (key, version) changes
    recommended).

    One tagged union + ONE bucketed key exchange + a vectorized
    per-bucket sort/keep-last/drop-deleted — payload rides the shuffle
    once, the standard lakehouse MERGE-with-deletes maintenance pass.
    """
    key_list = [key] if isinstance(key, str) else list(key)
    schema = base_schema if base_schema is not None else base.schema()
    cols = list(schema.names)

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["__side"] = np.int8(0)
        df["__ver"] = np.float64(0.0)
        df["__op"] = "U"
        return df

    def tag_changes(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["__side"] = np.int8(1)
        out["__ver"] = df[version_col].astype("float64")
        out["__op"] = df[op_col].astype(str)
        return out

    both = base.map_batches(tag_base, batch_format="pandas").union(
        changes.map_batches(tag_changes, batch_format="pandas")
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            __rh=pd.util.hash_pandas_object(g[cols], index=False).to_numpy()
        )
        g = g.sort_values(
            key_list + ["__side", "__ver", "__rh"], kind="mergesort"
        )
        last = g.drop_duplicates(key_list, keep="last")
        return last[last["__op"] != "D"][cols]

    return bucketed_groupby_apply(both, key_list, resolve, num_buckets)


def profile(ds, columns, num_buckets: int = 64) -> pd.DataFrame:
    """Column-profile summary (the data-catalog / pre-ingest statistics
    pass): per column — row count, null count/fraction, exact distinct
    count, and min/max/mean for numeric columns (NULL otherwise, so the
    report schema is type-stable). One streaming scan computes every
    per-column partial; each distinct count is its own map-side-reduced
    exchange (column-bounded: one per profiled column, the distinct
    sets themselves never collect — only their counts do)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"__n": [np.int64(len(df))]}
        for i, c in enumerate(columns):
            col = df[c]
            out[f"__null{i}"] = [np.int64(col.isna().sum())]
            if pd.api.types.is_numeric_dtype(col):
                v = col.dropna().astype("float64")
                out[f"__min{i}"] = [v.min() if len(v) else np.nan]
                out[f"__max{i}"] = [v.max() if len(v) else np.nan]
                out[f"__sum{i}"] = [v.sum() if len(v) else 0.0]
                out[f"__cnt{i}"] = [np.int64(len(v))]
            else:
                out[f"__min{i}"] = [np.nan]
                out[f"__max{i}"] = [np.nan]
                out[f"__sum{i}"] = [0.0]
                out[f"__cnt{i}"] = [np.int64(0)]
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    n_rows = int(parts["__n"].sum())
    numeric_seen = {
        c: bool(parts[f"__cnt{i}"].sum() > 0) for i, c in enumerate(columns)
    }
    rows = []
    for i, c in enumerate(columns):
        nd = int(distinct(ds, [c], num_buckets).count())
        nulls = int(parts[f"__null{i}"].sum())
        if nulls:  # SQL COUNT(DISTINCT) excludes NULL; distinct() keeps it
            nd -= 1
        if numeric_seen[c]:
            mn = float(parts[f"__min{i}"].min())
            mx = float(parts[f"__max{i}"].max())
            cnt = int(parts[f"__cnt{i}"].sum())
            mean = float(parts[f"__sum{i}"].sum()) / cnt if cnt else np.nan
        else:
            mn = mx = mean = np.nan
        rows.append(
            (c, n_rows, nulls, sql_round(nulls / n_rows, 6) if n_rows else np.nan,
             nd, sql_round(mn, 6) if mn == mn else np.nan,
             sql_round(mx, 6) if mx == mx else np.nan,
             sql_round(mean, 6) if mean == mean else np.nan)
        )
    return pd.DataFrame(
        rows,
        columns=["column", "n_rows", "n_nulls", "null_frac", "n_distinct",
                 "min_val", "max_val", "mean_val"],
    ).sort_values("column", ignore_index=True)


def k_anonymize(ds, quasi_cols, k: int, num_buckets: int = 64):
    """k-anonymity suppression (Sweeney 2002): drop every row whose
    quasi-identifier combination is shared by fewer than ``k`` rows —
    the release gate before publishing event-level data. ONE bucketed
    exchange co-locates each quasi-group (a group's rows all hash to
    one bucket), the in-bucket filter is a vectorized group-size
    transform; suppressed rows simply vanish (no suppression marker
    survives, by design)."""
    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby(quasi_cols, sort=False, dropna=False)[
            quasi_cols[0]
        ].transform("size")
        return g[sizes >= k]

    return bucketed_groupby_apply(ds, quasi_cols, fn, num_buckets)


def incremental_aggregate(state, new_ds, keys, aggs, num_buckets: int = 64):
    """Incremental aggregate maintenance (the dbt-incremental /
    materialized-view pattern): fold a NEW data partition into a saved
    PARTIAL-STATE table and return ``(result, new_state)`` — the full
    history is never rescanned, only the new partition streams.

    ``aggs``: out_col -> (in_col, kind), kinds ⊆ {sum, count, mean,
    min, max} (the algebraic set; holistic aggregates can't maintain
    incrementally by definition). ``state``: the ``new_state`` frame
    from the previous call, or ``None`` for the first build — key-scale
    (one row per key), the thing a pipeline persists between runs.
    ``result`` equals a full re-aggregation over everything folded so
    far (the pytest/oracle equivalence)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    plan = {}
    for out, (col, kind) in aggs.items():
        if kind not in ("sum", "count", "mean", "min", "max"):
            raise PlanError(
                f"incremental_aggregate: kind {kind!r} is not algebraic"
            )
        plan[out] = (col, kind)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_list, observed=True, sort=False, dropna=False)
        parts = {"__n": g.size()}
        for out, (col, kind) in plan.items():
            if kind == "count":
                continue
            if kind in ("sum", "mean"):
                parts[f"__s_{out}"] = g[col].sum()
                parts[f"__c_{out}"] = g[col].count()
            elif kind == "min":
                parts[f"__mn_{out}"] = g[col].min()
            else:
                parts[f"__mx_{out}"] = g[col].max()
        return pd.DataFrame(parts).reset_index()

    fresh = (
        new_ds.map_batches(partial, batch_format="pandas").to_pandas()
        if new_ds is not None
        else pd.DataFrame()
    )
    frames = [f for f in (state, fresh) if f is not None and len(f)]
    if not frames:
        raise PlanError("incremental_aggregate: no state and no new data")
    both = pd.concat(frames, ignore_index=True)
    merge_plan = {"__n": "sum"}
    for out, (col, kind) in plan.items():
        if kind in ("sum", "mean"):
            merge_plan[f"__s_{out}"] = "sum"
            merge_plan[f"__c_{out}"] = "sum"
        elif kind == "min":
            merge_plan[f"__mn_{out}"] = "min"
        elif kind == "max":
            merge_plan[f"__mx_{out}"] = "max"
    new_state = both.groupby(key_list, as_index=False, observed=True,
                             sort=False, dropna=False).agg(merge_plan)
    result = new_state[key_list].copy()
    for out, (col, kind) in plan.items():
        if kind == "count":
            result[out] = new_state["__n"].astype("int64")
        elif kind == "sum":
            result[out] = new_state[f"__s_{out}"].where(
                new_state[f"__c_{out}"] > 0
            )
        elif kind == "mean":
            result[out] = new_state[f"__s_{out}"] / new_state[f"__c_{out}"]
        elif kind == "min":
            result[out] = new_state[f"__mn_{out}"]
        else:
            result[out] = new_state[f"__mx_{out}"]
    return result, new_state


def apply_once_per_key(ds, key_cols, fn, num_buckets: int = 64, how: str = "left"):
    """Run an expensive transform ONCE per distinct key and fan results
    back to every row — inference dedup. On a web corpus the same
    boilerplate segment appears on millions of pages; an LLM/model
    stage that pays per COPY instead of per distinct input burns its
    budget on duplicates — this is the compose-around for any actor-pool
    stage (LLM extraction, scoring, embedding) fed repetitive inputs.

    ``fn``: Dataset -> Dataset over the DISTINCT-key table; must
    preserve ``key_cols`` and may add result columns. Plan: the
    engine's map-side-combined :func:`distinct` -> ``fn`` over the
    (much smaller) distinct table -> ONE bucketed :func:`hash_join`
    back to the full corpus. Key by a content HASH column (128-bit,
    the exact-dedup contract) rather than raw text so the join moves
    16 bytes per row, not documents.

    Determinism contract: with ``fn`` deterministic, output equals
    applying ``fn`` rowwise — pinned by pytest, including a call-count
    assertion that the expensive path ran once per distinct key.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    uniq = distinct(ds, key_cols, num_buckets)
    # pinned: the join plan consumes its build side more than once, and a
    # lazy `enriched` would re-run the EXPENSIVE fn per consumer — the
    # call-count pytest catches exactly this. Distinct-key scale.
    enriched = fn(uniq).materialize()
    return hash_join(ds, enriched, on=key_cols, how=how, num_buckets=num_buckets)


def clustering_pairwise(ds, pred_col: str, gold_col: str,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Pairwise clustering-agreement metrics (pair precision / recall /
    F1 + Adjusted Rand Index, Hubert & Arabie 1985) — the
    same-cluster-pair view of entity-resolution quality next to the
    item-averaged :func:`clustering_agreement`: a pair of items counts
    as TP when BOTH clusterings co-locate it. NULL rows excluded
    (pairwise-null, like corr).

    Scale shape: identical to B-cubed — rows reduce through ONE
    map-side-combined (pred, gold) contingency aggregate that stays a
    Dataset; the three pair sums (Σ C(cell,2), Σ C(cluster,2),
    Σ C(class,2)) each fold a partial-combined aggregate to ONE scalar.
    ARI's expected-index correction uses only those scalars and n.
    """

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[pred_col, gold_col]]
        return out[out[pred_col].notna() & out[gold_col].notna()]

    cells = pre_aggregate_ds(
        ds.map_batches(slim, batch_format="pandas"),
        [pred_col, gold_col],
        {"c": (None, "count")},
        num_buckets=num_buckets,
    ).materialize()  # three consumers below

    def _choose2(s: pd.Series) -> pd.Series:
        f = s.astype("float64")
        return f * (f - 1.0) / 2.0

    tp = float(
        cells.map_batches(
            lambda d: pd.DataFrame({"p": _choose2(d["c"])}),
            batch_format="pandas",
        ).sum("p")
        or 0.0
    )
    n = float(
        cells.map_batches(
            lambda d: pd.DataFrame({"n": d["c"].astype("float64")}),
            batch_format="pandas",
        ).sum("n")
        or 0.0
    )

    def marginal_pairs(key_col: str) -> float:
        per_key = pre_aggregate_ds(
            cells, key_col, {"s1": ("c", "sum")}, num_buckets=num_buckets
        )
        return float(
            per_key.map_batches(
                lambda d: pd.DataFrame({"p": _choose2(d["s1"])}),
                batch_format="pandas",
            ).sum("p")
            or 0.0
        )

    if n < 2:
        return pd.DataFrame(
            {"n_items": [int(n)], "pair_precision": [np.nan],
             "pair_recall": [np.nan], "pair_f1": [np.nan], "ari": [np.nan]}
        )
    p_pairs = marginal_pairs(pred_col)
    g_pairs = marginal_pairs(gold_col)
    prec = tp / p_pairs if p_pairs > 0 else np.nan
    rec = tp / g_pairs if g_pairs > 0 else np.nan
    f1 = (
        2 * prec * rec / (prec + rec)
        if p_pairs > 0 and g_pairs > 0 and (prec + rec) > 0
        else (0.0 if p_pairs > 0 and g_pairs > 0 else np.nan)
    )
    total = n * (n - 1.0) / 2.0
    expected = p_pairs * g_pairs / total
    max_index = (p_pairs + g_pairs) / 2.0
    ari = (
        (tp - expected) / (max_index - expected)
        if max_index != expected
        else 1.0  # degenerate: both clusterings trivial -> perfect agreement
    )
    return pd.DataFrame(
        {
            "n_items": [int(n)],
            "pair_precision": [sql_round(prec, 6) if prec == prec else np.nan],
            "pair_recall": [sql_round(rec, 6) if rec == rec else np.nan],
            "pair_f1": [sql_round(f1, 6) if f1 == f1 else np.nan],
            "ari": [sql_round(ari, 6)],
        }
    )
