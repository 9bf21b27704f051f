"""Round-2 continuation operators: Spearman channel-rank partials,
per-series sampling-gap profile, Benford first-digit screen and
peak/trough/median-crossing shape stats — DuckDB oracle parity at
sf0.001 plus brute-force invariants (scipy-free Spearman recompute on a
planted conversation, gap math on a hand-built series, Benford digit
law sanity, shape counts on a planted zig-zag)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con.execute(e.oracle_sql()[name]).fetchdf()


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    want = want[list(got.columns)]
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert g.dtype.kind == w.dtype.kind, (c, g.dtype, w.dtype)
        assert (g == w).all(), (c, g[g != w][:3], w[g != w][:3])


def test_spearman_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import spearman_channel_ranks

    got = spearman_channel_ranks(SF)
    want = _oracle("spearman_channel_ranks")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # Cauchy-Schwarz on the centered sums: rho in [-1, 1]
    n = got["n_pairs"].to_numpy(np.float64)
    mean2 = n + 1  # doubled midranks average to n+1 exactly
    cxy = got["sxy2"].to_numpy(np.float64) - n * mean2 * mean2
    cxx = got["sxx2"].to_numpy(np.float64) - n * mean2 * mean2
    cyy = got["syy2"].to_numpy(np.float64) - n * mean2 * mean2
    ok = (cxx > 0) & (cyy > 0)
    rho = cxy[ok] / np.sqrt(cxx[ok] * cyy[ok])
    assert (np.abs(rho) <= 1 + 1e-12).all()


def test_spearman_planted_conversation():
    """Kernel-level check against a direct midrank computation."""
    from ctas_ray.pipelines.queries import _spearman_partition

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:05", "2024-01-01 00:00:07",
         "2024-01-01 00:00:20", "2024-01-01 00:00:22"]
    )
    part = pd.DataFrame(
        {
            "user_id": [7] * 5,
            "ts": ts,
            "event_id": np.arange(5),
            "props": ["ab", "abcd", "ab", "abcdefgh", "x"],
        }
    )
    out = _spearman_partition(part)
    assert len(out) == 1
    # pairs: x = len(props[1:]) = [4, 2, 8, 1], y = dt = [5s, 2s, 13s, 2s]
    x = np.array([4, 2, 8, 1], dtype=np.float64)
    y = np.array([5e6, 2e6, 13e6, 2e6], dtype=np.float64)
    d2x = pd.Series(x).rank(method="average").to_numpy() * 2
    d2y = pd.Series(y).rank(method="average").to_numpy() * 2
    assert out["n_pairs"].iloc[0] == 4
    assert out["sxy2"].iloc[0] == int((d2x * d2y).sum())
    assert out["sxx2"].iloc[0] == int((d2x * d2x).sum())
    assert out["syy2"].iloc[0] == int((d2y * d2y).sum())


def test_gap_profile_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import sampling_gap_profile

    got = sampling_gap_profile(SF)
    want = _oracle("sampling_gap_profile")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["max_gap_us"] <= got["span_us"]).all()
    assert (got["med2_gap_us"] <= 2 * got["max_gap_us"]).all()
    assert (got["span_us"] >= 0).all()


def test_gap_profile_planted_series():
    from ctas_ray.pipelines.queries import _gap_profile_partition

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:04",
         "2024-01-01 00:00:10"]
    )
    part = pd.DataFrame(
        {
            "event_type": ["a"] * 4,
            "user_id": [1] * 4,
            "ts": ts,
            "event_id": np.arange(4),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = _gap_profile_partition(part)
    assert len(out) == 1
    r = out.iloc[0]
    # gaps = [1s, 3s, 6s]: span 10s, max 6s, median 3s (med2 = 6s)
    assert r["n_points"] == 4
    assert r["span_us"] == 10_000_000
    assert r["max_gap_us"] == 6_000_000
    assert r["med2_gap_us"] == 6_000_000


def test_benford_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import benford_first_digit

    got = benford_first_digit(SF)
    want = _oracle("benford_first_digit")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert got["digit"].between(1, 9).all()
    # conservation: total count equals non-null nonzero values
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    v = ev["value"].dropna().to_numpy()
    nz = np.abs(np.floor(v * 1e6 + 0.5)) > 0
    assert got["n"].sum() == int(nz.sum())


def test_shape_stats_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import series_shape_stats

    got = series_shape_stats(SF)
    want = _oracle("series_shape_stats")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # peaks and troughs alternate: counts differ by at most 1
    assert (np.abs(got["n_peaks"] - got["n_troughs"]) <= 1).all()
    assert (got["n_peaks"] <= (got["n_points"] - 2 + 1) // 2).all()


def test_shape_stats_planted_zigzag():
    from ctas_ray.pipelines.queries import _shape_partition

    # values 1, 5, 1, 5, 1: peaks at idx 1, 3; troughs at idx 2;
    # median 1 -> signs of 2v - med2=... sorted [1,1,1,5,5] med=1,
    # med2=2; signs: v=1 -> 0 (on median), v=5 -> +1; nonzero signs
    # [+1, +1] -> 0 crossings
    ts = pd.date_range("2024-01-01", periods=5, freq="1min")
    part = pd.DataFrame(
        {
            "event_type": ["a"] * 5,
            "user_id": [1] * 5,
            "ts": ts,
            "event_id": np.arange(5),
            "value": [1.0, 5.0, 1.0, 5.0, 1.0],
        }
    )
    out = _shape_partition(part)
    r = out.iloc[0]
    assert r["n_peaks"] == 2
    assert r["n_troughs"] == 1
    assert r["n_crossings"] == 0
    # shifted series -1, 5, -1, 5, 9: median -1... use one that crosses
    part2 = part.assign(value=[1.0, 5.0, 2.0, 6.0, 3.0])
    # sorted [1,2,3,5,6] med=3 med2=6; 2v-6 = [-4,+4,-2,+6,0]; the final
    # point sits ON the median (dropped), nonzero signs [-1,+1,-1,+1]
    # -> 3 crossings
    r2 = _shape_partition(part2).iloc[0]
    assert r2["n_crossings"] == 3
    assert r2["n_peaks"] == 2
    assert r2["n_troughs"] == 1
