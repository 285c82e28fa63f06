"""SQL-compatible rounding: half AWAY from zero, exactly like DuckDB.

numpy/pandas ``round`` use banker's rounding (half to even); DuckDB's
``round(x, d)`` for DOUBLE is ``std::round(x * 10^d) / 10^d`` with
``std::round`` rounding half away from zero (and ``round(x / 10^-d) *
10^-d`` for negative ``d``).  At exact half-ULPs the two conventions
disagree in the last kept digit — e.g. ``55.28625`` rounds to
``55.2862`` (banker's) vs ``55.2863`` (DuckDB) — which flips the
driver's value-hash compare even though both answers are "right".

``sql_round`` reproduces the DuckDB float path bit-for-bit:

* scale by the same ``10.0 ** d`` double DuckDB uses (divide for
  negative ``d``, matching its branch),
* round the scaled value half away from zero *exactly* — the
  fractional part ``|v| - floor(|v|)`` of a double is exactly
  representable, so the ``>= 0.5`` test has no intermediate error
  (unlike the common ``floor(v + 0.5)`` trick, which can bump values
  one ULP below .5 across the boundary),
* unscale with the same division.

Every oracled query MUST round through this helper, never through
``np.round`` / ``Series.round`` / builtin ``round`` (see VERDICT r3:
``assoc_rules_parts``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["sql_round"]


def _round_half_away(v: np.ndarray) -> np.ndarray:
    """Vectorized std::round for float64: half away from zero, exact."""
    av = np.abs(v)
    # inf - inf (and NaN propagation) would emit RuntimeWarning: invalid
    # value — non-finite inputs are replaced by the caller's isfinite
    # mask, so silence the intermediate (r4 VERDICT "wrong" #1).
    with np.errstate(invalid="ignore"):
        fl = np.floor(av)
        # av - fl is exactly representable (Sterbenz for av >= 1, trivially
        # exact below 1), so the half test carries no rounding error.
        r = np.where(av - fl >= 0.5, fl + 1.0, fl)
        return np.copysign(r, v)


def sql_round(x, ndigits: int = 0):
    """DuckDB-compatible round of ``x`` to ``ndigits`` decimal places.

    Accepts scalars, numpy arrays, ``pd.Series`` and ``pd.DataFrame``
    (float columns only); returns the same container type (scalars come
    back as Python ``float``).  Non-finite values pass through.
    """
    if isinstance(x, pd.DataFrame):
        out = x.copy()
        for c in out.columns:
            if pd.api.types.is_float_dtype(out[c]):
                out[c] = sql_round(out[c], ndigits)
        return out
    if isinstance(x, pd.Series):
        return pd.Series(
            sql_round(x.to_numpy(dtype=np.float64, na_value=np.nan), ndigits),
            index=x.index,
            name=x.name,
        )
    arr = np.asarray(x, dtype=np.float64)
    d = int(ndigits)
    if d >= 0:
        m = 10.0 ** d  # same double as C++ std::pow(10, d) for small d
        v = arr * m
        rounded = _round_half_away(v) / m
    else:
        m = 10.0 ** (-d)  # DuckDB divides for negative precision
        v = arr / m
        rounded = _round_half_away(v) * m
    rounded = np.where(np.isfinite(arr), rounded, arr)
    if np.isscalar(x) or arr.ndim == 0:
        return float(rounded)
    return rounded
