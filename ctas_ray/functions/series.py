"""Per-series (one subject / one conversation-channel) numeric kernels.

Vectorized numpy transcriptions of the reference's per-row feature math
(R/ctas.R:589-681) plus the graft-mandated physical-layer kernels
(rolling stats, gap-fill) from BASELINE.json's north_star.

All "matrix" variants operate on a 2-D float64 array ``wide`` of shape
(n_subjects, n_timepoints) with NaN for missing — the Ray engine builds
one such array per timeseries group inside ``map_groups`` (never a
global wide table).

NA semantics deliberately mirror R:
- feature values that R computes as NA (e.g. sd of a single value) come
  out as NaN here and are dropped when pivoting long
  (``values_drop_na=TRUE``, R/ctas.R:675-676).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "feature_range",
    "feature_sd",
    "feature_unique_rel",
    "feature_autocorr",
    "feature_average",
    "rolling_mean",
    "rolling_sd",
    "gap_fill",
]


def feature_range(wide: np.ndarray) -> np.ndarray:
    """max - min per row, na.rm=TRUE (R/ctas.R:616-622).

    All-NaN rows yield NaN (R would yield -Inf with warnings; such rows
    cannot occur for eligible subjects — documented deviation)."""
    with np.errstate(all="ignore"):
        return np.nanmax(wide, axis=1) - np.nanmin(wide, axis=1)


def feature_sd(wide: np.ndarray) -> np.ndarray:
    """Sample sd (ddof=1) per row, na.rm=TRUE (R stats::sd; R/ctas.R:624-630).

    Rows with <2 non-NaN values give NaN, like R's sd of length-1 input."""
    n = np.sum(~np.isnan(wide), axis=1).astype(np.float64)
    with np.errstate(all="ignore"):
        mean = np.nanmean(wide, axis=1)
        ss = np.nansum((wide - mean[:, None]) ** 2, axis=1)
        out = np.sqrt(ss / (n - 1.0))
    out[n < 2] = np.nan
    return out


def feature_unique_rel(wide: np.ndarray) -> np.ndarray:
    """n_distinct(x, na.rm=TRUE) / #non-NA per row (R/ctas.R:632-638)."""
    n_rows = wide.shape[0]
    out = np.empty(n_rows, dtype=np.float64)
    for i in range(n_rows):  # rows are short (timepoints); loop is per-series
        row = wide[i]
        valid = row[~np.isnan(row)]
        out[i] = len(np.unique(valid)) / len(valid) if len(valid) else np.nan
    return out


def feature_autocorr(wide: np.ndarray, lag: int = 1) -> np.ndarray:
    """Lag-1 Pearson autocorrelation per row with pairwise-complete masking,
    exactly ``cor(x[1:(n-1)], x[2:n], use="pairwise.complete.obs")``
    (calculate_autocorrelation, R/ctas.R:1197-1207).

    Pairs where either side is NaN are dropped; <2 complete pairs or a
    zero-variance side gives NaN (R cor semantics)."""
    a = wide[:, :-lag] if lag else wide
    b = wide[:, lag:]
    mask = ~(np.isnan(a) | np.isnan(b))
    n = mask.sum(axis=1).astype(np.float64)
    a0 = np.where(mask, a, 0.0)
    b0 = np.where(mask, b, 0.0)
    with np.errstate(all="ignore"):
        ma = a0.sum(axis=1) / n
        mb = b0.sum(axis=1) / n
        da = np.where(mask, a0 - ma[:, None], 0.0)
        db = np.where(mask, b0 - mb[:, None], 0.0)
        cov = (da * db).sum(axis=1)
        va = (da * da).sum(axis=1)
        vb = (db * db).sum(axis=1)
        out = cov / np.sqrt(va * vb)
    out[(n < 2) | (va <= 0) | (vb <= 0)] = np.nan
    return out


def feature_average(wide: np.ndarray) -> np.ndarray:
    """mean(x, na.rm=TRUE) per row (R/ctas.R:650-652)."""
    with np.errstate(all="ignore"):
        return np.nanmean(wide, axis=1)


# --------------------------------------------------------------------------
# user-extension registry (SURVEY.md §2.10): the reference's extension
# surface is a ';'-list of built-in feature names (R/ctas.R:59,596);
# ours additionally accepts REGISTERED per-series functions so the
# generic map_groups stage never changes. A registered fn has signature
# fn(wide: (n_subjects, n_timepoints) float64 NaN-for-missing,
#    baseline: str) -> per-subject float64 vector (NaN rows are dropped
# by the long pivot, like the built-ins).
# --------------------------------------------------------------------------
FEATURE_REGISTRY: dict[str, "callable"] = {}


def _ensure_by_value(fn) -> None:
    """Registered extension fns often live in modules Ray workers cannot
    import (scripts, notebooks, test files). Tell cloudpickle to ship
    such modules BY VALUE so the closure travels with the task instead
    of hanging worker deserialization on an unimportable module."""
    import sys

    mod = getattr(fn, "__module__", None)
    if not mod or mod.startswith(("ctas_ray", "builtins", "__main__", "numpy", "pandas")):
        return
    module = sys.modules.get(mod)
    if module is None:
        return
    # Ray serializes with its VENDORED cloudpickle — register there;
    # also register with the standalone package for non-Ray picklers.
    for modname in ("ray.cloudpickle", "cloudpickle"):
        try:
            import importlib

            cp = importlib.import_module(modname)
            cp.register_pickle_by_value(module)
        except Exception:
            pass  # best effort; __main__ and library fns work regardless


def register_feature(name: str, fn) -> None:
    """Register (or override) a per-series feature usable in any
    ``timeseries_features_to_calculate`` list / StudyConfig.features."""
    _ensure_by_value(fn)
    FEATURE_REGISTRY[name] = fn


def compute_series_features(
    wide: np.ndarray,
    baseline: str,
    features: list[str],
    extra: dict | None = None,
) -> dict[str, np.ndarray]:
    """The univariate feature gate logic of calculate_ts_features
    (R/ctas.R:608-652): most features are constant unless
    ``ncol > 1 and baseline == "original"``; ``average`` always computed.

    Cross-subject features (lof, own_site_simil_score) live in
    :mod:`ctas_ray.functions.multivariate` — the caller joins them in.
    Unknown names fall through to FEATURE_REGISTRY entries.
    """
    n_rows, n_cols = wide.shape
    rich = n_cols > 1 and baseline == "original"
    out: dict[str, np.ndarray] = {}
    for feat in features:
        if feat == "range":
            out[feat] = feature_range(wide) if rich else np.zeros(n_rows)
        elif feat == "sd":
            out[feat] = feature_sd(wide) if rich else np.zeros(n_rows)
        elif feat == "unique_value_count_relative":
            out[feat] = feature_unique_rel(wide) if rich else np.ones(n_rows)
        elif feat == "autocorr":
            out[feat] = feature_autocorr(wide) if rich else np.zeros(n_rows)
        elif feat == "average":
            out[feat] = feature_average(wide)
        else:
            # ``extra`` = registry snapshot shipped to workers (module
            # globals don't travel to Ray worker processes)
            fn = (extra or {}).get(feat, FEATURE_REGISTRY.get(feat))
            if fn is not None:
                out[feat] = np.asarray(fn(wide, baseline), dtype=np.float64)
    return out


# ---------------------------------------------------------------------------
# [graft] physical-layer kernels (BASELINE.json north_star) — no reference
# equivalent; semantics documented here and pinned by tests.
# ---------------------------------------------------------------------------


def rolling_mean(x: np.ndarray, window: int) -> np.ndarray:
    """Trailing-window rolling mean over a 1-D series; NaN-aware
    (window entries with <1 valid value give NaN). First window-1
    positions use the partial window (min_periods=1 semantics)."""
    x = np.asarray(x, dtype=np.float64)
    valid = ~np.isnan(x)
    cs = np.cumsum(np.where(valid, x, 0.0))
    cn = np.cumsum(valid.astype(np.int64))
    cs = np.concatenate([[0.0], cs])
    cn = np.concatenate([[0], cn])
    idx = np.arange(1, len(x) + 1)
    lo = np.maximum(0, idx - window)
    s = cs[idx] - cs[lo]
    n = cn[idx] - cn[lo]
    with np.errstate(all="ignore"):
        out = s / n
    out[n == 0] = np.nan
    return out


def rolling_sd(x: np.ndarray, window: int) -> np.ndarray:
    """Trailing-window rolling sample sd (ddof=1), NaN-aware; positions
    with <2 valid values in window give NaN. Uses the two-pass-free
    centered-sum-of-squares on cumulative (n, sum, sumsq) — the same
    mergeable partials the rollup tiers keep, so tier re-aggregation and
    rolling stats agree bit-for-bit on the same data."""
    x = np.asarray(x, dtype=np.float64)
    valid = ~np.isnan(x)
    xv = np.where(valid, x, 0.0)
    cs = np.concatenate([[0.0], np.cumsum(xv)])
    cq = np.concatenate([[0.0], np.cumsum(xv * xv)])
    cn = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    idx = np.arange(1, len(x) + 1)
    lo = np.maximum(0, idx - window)
    n = (cn[idx] - cn[lo]).astype(np.float64)
    s = cs[idx] - cs[lo]
    q = cq[idx] - cq[lo]
    with np.errstate(all="ignore"):
        var = (q - s * s / n) / (n - 1.0)
        out = np.sqrt(np.maximum(var, 0.0))
    out[n < 2] = np.nan
    return out


def gap_fill(
    ts_us: np.ndarray,
    values: np.ndarray,
    step_us: int,
    method: str = "locf",
    grid_start_us: int | None = None,
    grid_end_us: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """[graft] Regularise an irregular series onto an epoch-aligned grid.

    Grid points are multiples of ``step_us`` (epoch-aligned so that
    chunked/salted execution produces the identical grid as a single-group
    run). By default covers ``ceil(first_obs) .. floor(last_obs)``.

    - ``locf``: value at grid point t = last observation with ts <= t.
    - ``linear``: np.interp between the surrounding observations
      (grid points outside the observation span are not emitted).

    Returns (grid_ts_us, grid_values). Observations must be sorted by ts;
    duplicate timestamps keep the last value (stable, documented).
    """
    ts_us = np.asarray(ts_us, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    if len(ts_us) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    start = grid_start_us if grid_start_us is not None else int(-(-ts_us[0] // step_us) * step_us)
    end = grid_end_us if grid_end_us is not None else int(ts_us[-1] // step_us * step_us)
    if end < start:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    grid = np.arange(start, end + 1, step_us, dtype=np.int64)
    if method == "locf":
        # index of last obs with ts <= t ; 'right' side gives count of <= t
        idx = np.searchsorted(ts_us, grid, side="right") - 1
        out = np.where(idx >= 0, values[np.clip(idx, 0, None)], np.nan)
        return grid, out
    if method == "linear":
        # explicit v0 + slope * dt chain (not np.interp) so the result is
        # bit-identical to the SQL oracle's expression
        n = len(ts_us)
        i0 = np.clip(np.searchsorted(ts_us, grid, side="right") - 1, 0, n - 1)
        i1 = np.clip(i0 + 1, 0, n - 1)
        t0, t1 = ts_us[i0].astype(np.float64), ts_us[i1].astype(np.float64)
        v0, v1 = values[i0], values[i1]
        same = t1 == t0
        with np.errstate(all="ignore"):
            out = np.where(
                same, v0, v0 + (v1 - v0) / (t1 - t0) * (grid - t0)
            )
        out = np.where((grid < ts_us[0]) | (grid > ts_us[-1]), np.nan, out)
        return grid, out
    raise ValueError(f"unknown gap_fill method: {method}")
