"""Semi-structured and streaming-semantics operators.

Two capabilities a web-scale event pipeline needs that the relational
core doesn't cover:

* :func:`json_extract` — typed field extraction from a JSON-string
  column (the ``props`` pattern: event payloads land as opaque JSON).
* :func:`late_events` — out-of-order/late-data detection with a
  per-key watermark, the batch twin of a streaming engine's
  allowed-lateness rule. The reference has no streaming surface at all
  (SURVEY.md §2.1 "does NOT implement": windows/watermarks/late-data);
  this supplies the semantics Ray Data lacks natively.
* :func:`hopping_window` — overlapping (sliding) time-window
  aggregation, the hop/width generalization of the tumbling
  ``hourly_event_stats`` bucket.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from kgraft.sqlround import sql_round


def json_extract(ds, col: str, field: str, out_col: str, dtype: str = "int64"):
    """Extract one top-level ``field`` from a JSON-string column ->
    input columns + ``out_col`` (typed; missing/malformed -> NULL).

    Shuffle-free single pass. The per-value ``json.loads`` is C-speed;
    the surrounding loop is the honest cost of schema-on-read JSON —
    at corpus scale prefer extracting ONCE into a typed column (this
    op's output written back to parquet) over re-parsing per query.
    A fast path handles the overwhelmingly common flat scalar case with
    a vectorized regex and falls back to a real parse only for rows the
    regex misses (nested/escaped), so typical telemetry payloads never
    hit the Python loop.
    """
    import re

    fast = re.compile(
        r'"%s"\s*:\s*("(?:[^"\\]*)"|-?\d+(?:\.\d+)?|true|false|null)'
        % re.escape(field)
    )

    def parse_one(s):
        try:
            v = json.loads(s).get(field)
        except (TypeError, ValueError):
            return None
        return v

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col]
        # the regex matches the field ANYWHERE, so a nested container
        # could shadow (or fabricate) the top-level value — but only if
        # it opens BEFORE the match completes. Container-free payloads
        # stay on the fully vectorized path; payloads with a container
        # get a cheap per-row regex span check (trust the match iff it
        # ends before the first container token opens any nested scope),
        # and only genuinely ambiguous rows pay json.loads (ADVICE r2:
        # the old rule sent EVERY row containing '[' to the slow path,
        # disabling the fast path for corpora with array fields).
        nested = s.str.slice(1).str.contains(r"[{\[]", regex=True).fillna(True)
        raw = s.str.extract(fast, expand=False)
        fast_ok = (~nested & raw.notna()).fillna(False)
        maybe = (nested & raw.notna() & s.notna()).fillna(False)
        if maybe.any():

            def _match_before_container(x: str) -> bool:
                m = fast.search(x)
                if m is None:
                    return False
                positions = [p for p in (x.find("{", 1), x.find("[", 1)) if p != -1]
                return bool(positions) and m.end() <= min(positions)

            fast_ok.loc[maybe] = s[maybe].map(_match_before_container)
        vals = pd.Series([None] * len(df), index=df.index, dtype=object)
        fv = raw[fast_ok]
        # fast hits are JSON literals: bare `null` -> NULL first, THEN
        # unquote quoted strings (so a legitimate "null" string survives)
        fv = fv.where(fv != "null", None)
        is_q = fv.str.startswith('"').fillna(False)
        fv.loc[is_q] = fv.loc[is_q].str.slice(1, -1)
        vals.loc[fast_ok] = fv
        slow = (~fast_ok) & s.notna()
        if slow.any():
            vals.loc[slow] = s[slow].map(parse_one)
        out = df.copy()
        if dtype in ("int64", "float64"):
            out[out_col] = pd.to_numeric(vals, errors="coerce")
            if dtype == "int64":
                out[out_col] = out[out_col].astype("Int64")
        else:
            out[out_col] = vals
        return out

    return ds.map_batches(fn, batch_format="pandas")


def late_events(
    events,
    lateness_us: int,
    part_col: str = "user_id",
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
):
    """Per-key watermark / allowed-lateness flagging -> input columns +
    ``is_late`` (int64 0/1).

    Streaming semantics in batch form: rows arrive in ``arrival_col``
    order; the key's watermark is the running max of event time seen so
    far minus ``lateness_us``. A row whose event time is already below
    the watermark at its own arrival is LATE — a streaming window would
    have closed before it arrived (it belongs in the dead-letter/
    correction path, not the aggregate).

    One bucketed shuffle on ``part_col`` (same partitioning contract as
    ``relational.windowed``); inside a bucket the running max is one
    vectorized ``groupby().cummax()``. The inclusive running max is
    safe: a row that advances the watermark can never flag itself
    (max - ts == 0). SQL twin::

        max(ts) OVER (PARTITION BY part ORDER BY arrival
                      ROWS UNBOUNDED PRECEDING) - ts > lateness
    """
    from .relational import bucketed_groupby_apply

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([part_col, arrival_col], kind="mergesort")
        # pin to MICROSECONDS: pandas blocks surface parquet timestamps
        # as datetime64[ns], whose raw int64 view is 1000x off
        epoch = g[ts_col].astype("datetime64[ns]").astype("int64") // 1000
        runmax = epoch.groupby(g[part_col], sort=False).cummax()
        out = g.copy()
        out["is_late"] = ((runmax - epoch) > lateness_us).astype("int64")
        return out

    return bucketed_groupby_apply(events, part_col, flag, num_buckets)


def hopping_window(ds, ts_col, width_s: int, hop_s: int, aggs, keys=()):
    """Overlapping (hopping / sliding) time-window aggregation.

    Every row lands in the ``width_s / hop_s`` windows whose
    ``[start, start + width)`` interval covers its timestamp; windows
    start on ``hop_s`` boundaries (epoch-aligned, the Flink/Beam
    HoppingWindow rule). Output: one row per (window_start, *keys)
    with the requested aggregates; ``window_start`` is int64 epoch
    seconds.

    Scale shape: the explode is a vectorized k-way concat inside
    ``map_batches`` (k = width/hop, a SMALL constant — 2-4 in
    practice), and the aggregation is :func:`pre_aggregate_ds`, so
    only per-(window, key, batch) partial rows cross the shuffle; raw
    event rows are amplified k-fold only transiently inside the map
    task, never through the exchange. Stays a Dataset — window count
    grows with the time span, which is corpus-scale.
    """
    from .errors import PlanError
    from .relational import pre_aggregate_ds

    if width_s <= 0 or hop_s <= 0 or width_s % hop_s:
        raise PlanError(
            f"hopping_window needs width_s divisible by hop_s, got {width_s}/{hop_s}"
        )
    k = width_s // hop_s
    keys = [keys] if isinstance(keys, str) else list(keys)
    val_cols = sorted(
        {col for col, _ in aggs.values() if isinstance(col, str)}
        | {c for pair, _ in aggs.values() if isinstance(pair, tuple) for c in pair}
    )

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df[ts_col].astype("datetime64[us]").astype("int64") // 1_000_000
        last_start = (epoch // hop_s) * hop_s
        frames = []
        for i in range(k):
            f = df[keys + val_cols].copy()
            f.insert(0, "window_start", last_start - i * hop_s)
            frames.append(f)
        return pd.concat(frames, ignore_index=True)

    exploded = ds.map_batches(explode, batch_format="pandas")
    return pre_aggregate_ds(exploded, ["window_start", *keys], aggs)


def ewma(ds, part_col: str, order_col: str, val_col: str,
         alpha: float = 0.3, out_col: str = "ewma", num_buckets: int = 64):
    """Per-key exponentially weighted moving average in event order
    (recursive form, pandas ``ewm(adjust=False)`` semantics:
    e_0 = x_0, e_t = alpha*x_t + (1-alpha)*e_{t-1}) — the streaming
    smoother behind rate limiting and anomaly baselines. One bucketed
    exchange on the key; in-bucket the whole recursion is a vectorized
    ``groupby().ewm`` transform. Appends ``out_col`` (rounded 6)."""
    from .relational import bucketed_groupby_apply

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([part_col, order_col], kind="mergesort")
        g[out_col] = (
            sql_round(g.groupby(part_col, sort=False)[val_col]
            .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
            , 6)
        )
        return g

    return bucketed_groupby_apply(ds, [part_col], fn, num_buckets)


def cusum_alarms(ds, part_col: str, order_col: str, val_col: str,
                 target: float, slack: float, threshold: float,
                 num_buckets: int = 64):
    """Per-key one-sided CUSUM change-point detection (Page 1954): the
    classic upward-shift monitor ``s_t = max(0, s_{t-1} + x_t - target
    - slack)`` with an alarm where ``s_t > threshold``. Appends
    ``cusum`` (rounded 6) and ``alarm`` (0/1).

    One bucketed exchange; in-bucket the recursion vectorizes through
    the running-minimum identity ``s_t = y_t - min(0, min_{j<=t} y_j)``
    with ``y = cumsum(x - target - slack)`` — no per-row Python."""
    from .relational import bucketed_groupby_apply

    k = float(target) + float(slack)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([part_col, order_col], kind="mergesort")

        def one(s: pd.Series) -> pd.Series:
            y = (s.to_numpy(dtype="float64") - k).cumsum()
            floor = np.minimum.accumulate(np.minimum(y, 0.0))
            return pd.Series(y - floor, index=s.index)

        g["cusum"] = (
            sql_round(g.groupby(part_col, sort=False)[val_col].transform(one), 6)
        )
        g["alarm"] = (g["cusum"] > threshold).astype("int64")
        return g

    return bucketed_groupby_apply(ds, [part_col], fn, num_buckets)


def debounce(ds, key_cols, ts_col: str, window_s: float, tiebreak=None,
             num_buckets: int = 64):
    """Stream debounce dedup: keep a row iff it is its key's first, or
    at least ``window_s`` seconds after the key's PREVIOUS row — the
    duplicate-click / retry-storm suppressor. (This is the
    lag-comparison variant every SQL engine can express; the
    "vs last KEPT row" throttle variant is inherently sequential and
    intentionally not offered — its output depends on scan order.)

    One bucketed exchange co-locates each key's rows (keys hash
    together via the first key column); in-bucket the gap test is one
    vectorized sort + shift. ``tiebreak``: extra column(s) appended to
    the per-key ordering so equal-timestamp rows order
    deterministically."""
    from .relational import bucketed_groupby_apply

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = key_cols + [ts_col] + (
        [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    )

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, ignore_index=True)
        same = np.ones(len(g), dtype=bool)
        for k in key_cols:
            same &= g[k].eq(g[k].shift()).to_numpy()
        gap = (
            g[ts_col].astype("datetime64[us]").astype("int64")
            .diff()
            .to_numpy(dtype="float64")
            / 1e6
        )
        keep = ~same | (gap >= window_s)
        return g[keep]

    return bucketed_groupby_apply(ds, [key_cols[0]], fn, num_buckets)
