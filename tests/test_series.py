"""Per-series feature kernels vs hand/pandas computation, incl. the
reference's NA-tolerance invariants (tests/testthat/test_features.R:1-7)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.functions.series import (
    compute_series_features,
    feature_autocorr,
    feature_average,
    feature_range,
    feature_sd,
    feature_unique_rel,
    gap_fill,
    rolling_mean,
    rolling_sd,
)


def test_range_sd_avg_unique():
    wide = np.array([[1.0, 5.0, 3.0, np.nan], [2.0, 2.0, 2.0, 2.0]])
    np.testing.assert_allclose(feature_range(wide), [4.0, 0.0])
    np.testing.assert_allclose(
        feature_sd(wide), [np.std([1, 5, 3], ddof=1), 0.0]
    )
    np.testing.assert_allclose(feature_average(wide), [3.0, 2.0])
    np.testing.assert_allclose(feature_unique_rel(wide), [1.0, 0.25])


def test_sd_single_value_is_nan():
    wide = np.array([[7.0, np.nan, np.nan]])
    assert np.isnan(feature_sd(wide)[0])  # R sd of length-1 -> NA


def test_autocorr_matches_r_pairwise_complete():
    # mirrors testthat test_features.R:1-7 — NAs at head/middle/tail tolerated
    cases = [
        [np.nan, 5, 6, 3, np.nan, 7, 8, np.nan],
        [1, 2, 3, 4, 5, 6, 7, 8],
        [5, 1, 5, 1, 5, 1, 5, 1],
    ]
    for x in cases:
        x = np.array(x, dtype=float)
        a, b = x[:-1], x[1:]
        mask = ~(np.isnan(a) | np.isnan(b))
        expect = (
            np.corrcoef(a[mask], b[mask])[0, 1] if mask.sum() >= 2 else np.nan
        )
        got = feature_autocorr(x[None, :])[0]
        if np.isnan(expect):
            assert np.isnan(got)
        else:
            assert got == pytest.approx(expect, rel=1e-12)


def test_autocorr_zero_variance_side_nan():
    x = np.array([[2.0, 2.0, 2.0, 5.0]])
    # lagged pairs: a=(2,2,2), b=(2,2,5): var(a)=0 -> R cor returns NA
    assert np.isnan(feature_autocorr(x)[0])


def test_gate_logic_single_column():
    wide = np.array([[3.0], [4.0]])
    out = compute_series_features(
        wide, "original", ["range", "sd", "unique_value_count_relative", "autocorr", "average"]
    )
    np.testing.assert_allclose(out["range"], [0, 0])
    np.testing.assert_allclose(out["sd"], [0, 0])
    np.testing.assert_allclose(out["unique_value_count_relative"], [1, 1])
    np.testing.assert_allclose(out["autocorr"], [0, 0])
    np.testing.assert_allclose(out["average"], [3, 4])


def test_gate_logic_cfb():
    wide = np.array([[3.0, 5.0]])
    out = compute_series_features(wide, "cfb", ["range", "sd", "average"])
    np.testing.assert_allclose(out["range"], [0])  # constants for cfb
    np.testing.assert_allclose(out["average"], [4.0])  # average always computed


def test_rolling_matches_pandas():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 100)
    x[rng.random(100) < 0.2] = np.nan
    s = pd.Series(x)
    np.testing.assert_allclose(
        rolling_mean(x, 7), s.rolling(7, min_periods=1).mean().to_numpy(), equal_nan=True
    )
    np.testing.assert_allclose(
        rolling_sd(x, 7),
        s.rolling(7, min_periods=2).std(ddof=1).to_numpy(),
        equal_nan=True,
        atol=1e-9,
    )


class TestGapFill:
    def test_locf(self):
        ts = np.array([95, 130, 250], dtype=np.int64)
        vals = np.array([1.0, 2.0, 3.0])
        grid, out = gap_fill(ts, vals, step_us=100, method="locf")
        np.testing.assert_array_equal(grid, [100, 200])
        np.testing.assert_allclose(out, [1.0, 2.0])

    def test_linear(self):
        ts = np.array([0, 200], dtype=np.int64)
        vals = np.array([0.0, 2.0])
        grid, out = gap_fill(ts, vals, step_us=100, method="linear")
        np.testing.assert_array_equal(grid, [0, 100, 200])
        np.testing.assert_allclose(out, [0.0, 1.0, 2.0])

    def test_explicit_grid_bounds_mask(self):
        ts = np.array([150], dtype=np.int64)
        vals = np.array([5.0])
        grid, out = gap_fill(ts, vals, 100, "locf", grid_start_us=0, grid_end_us=300)
        np.testing.assert_array_equal(grid, [0, 100, 200, 300])
        assert np.isnan(out[0]) and np.isnan(out[1])
        np.testing.assert_allclose(out[2:], [5.0, 5.0])

    def test_empty(self):
        g, v = gap_fill(np.array([], dtype=np.int64), np.array([]), 100)
        assert len(g) == 0 and len(v) == 0

    def test_chunked_equals_whole_locf(self):
        # chunk-exactness: epoch-aligned grid makes split execution identical
        rng = np.random.default_rng(7)
        ts = np.cumsum(rng.integers(1, 500, size=200)).astype(np.int64)
        vals = rng.normal(0, 1, 200)
        step = 250
        g_all, v_all = gap_fill(ts, vals, step, "locf")
        # split at an arbitrary point; chunk 2 carries the prev observation
        cut = 77
        g1, v1 = gap_fill(
            ts[:cut], vals[:cut], step, "locf",
            grid_start_us=int(-(-ts[0] // step) * step),
            grid_end_us=int((ts[cut] - 1) // step * step),
        )
        g2, v2 = gap_fill(
            ts[cut - 1 :], vals[cut - 1 :], step, "locf",
            grid_start_us=int((ts[cut] - 1) // step * step) + step,
            grid_end_us=int(ts[-1] // step * step),
        )
        np.testing.assert_array_equal(np.concatenate([g1, g2]), g_all)
        np.testing.assert_allclose(np.concatenate([v1, v2]), v_all, equal_nan=True)
