"""Round-2 trend/robust-location operators: trapezoid time-weighted
average, Theil-Sen robust slope, longest increasing/constant runs,
exact NTILE decile totals, 5%-trimmed totals, site hourly profile —
DuckDB oracle parity at sf0.001 plus kernel invariants on planted
series (trapezoid vs hand integral, Theil-Sen outlier immunity, run
lengths on a constructed walk, decile sizes and conservation)."""

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


def _series_frame(ts_s, values, et="load", uid=7):
    return pd.DataFrame(
        {
            "event_id": np.arange(len(values), dtype=np.int64),
            "ts": pd.to_datetime(np.asarray(ts_s, dtype=np.int64), unit="s"),
            "event_type": et,
            "user_id": np.int64(uid),
            "value": np.asarray(values, dtype=np.float64),
        }
    )


def test_time_weighted_avg_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import time_weighted_avg

    got = time_weighted_avg(SF)
    _assert_frames_equal(got, _oracle("time_weighted_avg"))
    assert len(got) > 0
    # a single-point series has zero span and zero numerator
    single = got[got["n_points"] == 1]
    assert (single["twa_num_e3us"] == 0).all()
    assert (single["span_us"] == 0).all()


def test_twa_kernel_hand_integral():
    from ctas_ray.pipelines.queries import _twa_partition

    # v(t): 2.0 for 10 s, then 4.0 for 30 s -> twa = (3*10 + 4*30)/40?
    # trapezoid: segments (2,4) over 10 s and (4,4) over 30 s
    part = _series_frame([0, 10, 40], [2.0, 4.0, 4.0])
    out = _twa_partition(part)
    num = int(out["twa_num_e3us"].iloc[0])
    span = int(out["span_us"].iloc[0])
    # num = (2000+4000)*10e6 + (4000+4000)*30e6 ; twa = num / (2*span)
    assert num == (2000 + 4000) * 10_000_000 + (4000 + 4000) * 30_000_000
    assert span == 40_000_000
    assert num / (2 * span) / 1000 == ((2.0 + 4.0) / 2 * 10 + 4.0 * 30) / 40


def test_theil_sen_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import theil_sen_slope

    got = theil_sen_slope(SF)
    _assert_frames_equal(got, _oracle("theil_sen_slope"))
    assert len(got) > 0
    assert (got["n_pairs"] > 0).all()


def test_theil_sen_kernel_outlier_immunity():
    from ctas_ray.pipelines.queries import _theil_sen_partition

    # perfect slope 1.0/s with one wild outlier: median slope unmoved
    ts = np.arange(9) * 10
    vals = ts.astype(float).copy()
    vals[4] = 1e5
    out = _theil_sen_partition(_series_frame(ts, vals))
    # slope_med2 = 2 * median(slope_e6_per_s) = 2e6 for slope 1.0
    assert int(out["slope_med2"].iloc[0]) == 2_000_000
    assert int(out["n_pairs"].iloc[0]) == 9 * 8 // 2


def test_longest_runs_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import longest_run_stats

    got = longest_run_stats(SF)
    _assert_frames_equal(got, _oracle("longest_run_stats"))
    assert (got["longest_inc"] >= 1).all()
    assert (got["longest_const"] >= 1).all()
    assert (got["longest_inc"] <= got["n_points"]).all()


def test_runs_kernel_planted_walk():
    from ctas_ray.pipelines.queries import _runs_partition

    vals = [1, 2, 3, 3, 3, 3, 2, 3, 4, 5, 6]  # inc run 2..6 = 5, const = 4
    out = _runs_partition(_series_frame(np.arange(len(vals)), vals))
    assert int(out["longest_inc"].iloc[0]) == 5
    assert int(out["longest_const"].iloc[0]) == 4
    assert int(out["n_points"].iloc[0]) == len(vals)


def test_value_deciles_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import value_decile_totals

    got = value_decile_totals(SF)
    _assert_frames_equal(got, _oracle("value_decile_totals"))
    # conservation: decile counts/sums partition each parameter exactly
    con = duckdb.connect()
    tot = con.execute(
        f"""SELECT event_type AS parameter_id, COUNT(*) AS n,
                   CAST(SUM(CAST(FLOOR(value*1000000+0.5) AS BIGINT)) AS BIGINT)
                       AS sum_e6
            FROM read_parquet('{SF}/events.parquet')
            WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1"""
    ).fetchdf()
    agg = got.groupby("parameter_id", as_index=False)[["n", "sum_e6"]].sum()
    assert (agg["n"].to_numpy() == tot["n"].to_numpy()).all()
    assert (agg["sum_e6"].to_numpy() == tot["sum_e6"].to_numpy()).all()
    # NTILE sizes: within a parameter, max-min count spread <= 1
    spread = got.groupby("parameter_id")["n"].agg(lambda s: s.max() - s.min())
    assert (spread <= 1).all()


def test_trimmed_and_hourly_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import (
        site_hourly_profile,
        trimmed_mean_by_parameter,
    )

    _assert_frames_equal(
        trimmed_mean_by_parameter(SF), _oracle("trimmed_mean_by_parameter")
    )
    _assert_frames_equal(site_hourly_profile(SF), _oracle("site_hourly_profile"))


def test_trimmed_kernel_tie_split():
    from ctas_ray.pipelines.queries import _trimmed_param_kernel

    # 40 points, k = 2 trimmed each side; low tie-group of three 1s
    # straddles the cut: exactly one survives
    vq = np.r_[[1, 1, 1], np.arange(2, 38), [100]].astype(np.int64)
    g = pd.DataFrame({"event_type": "x", "vq": vq, "cnt": np.ones(40, np.int64)})
    out = _trimmed_param_kernel(g)
    assert int(out["trimmed_n"].iloc[0]) == 36
    assert int(out["trimmed_sum_e6"].iloc[0]) == 1 + int(np.arange(2, 37).sum())


def _oracle_multi(name: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(e.oracle_sql()[name]).fetchdf()


def test_mann_kendall_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import mann_kendall_s

    got = mann_kendall_s(SF)
    _assert_frames_equal(got, _oracle("mann_kendall_s"))
    # |S| is bounded by the pair count
    assert (got["mk_s"].abs() <= got["n_pairs"]).all()


def test_mann_kendall_kernel_monotone():
    from ctas_ray.pipelines.queries import _mann_kendall_partition

    up = _mann_kendall_partition(_series_frame(np.arange(8), np.arange(8.0)))
    assert int(up["mk_s"].iloc[0]) == 8 * 7 // 2  # all concordant
    flat = _mann_kendall_partition(_series_frame(np.arange(8), np.ones(8)))
    assert int(flat["mk_s"].iloc[0]) == 0


def test_doc_quality_verdict_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import doc_quality_verdict

    got = doc_quality_verdict(SF)
    _assert_frames_equal(got, _oracle_multi("doc_quality_verdict"))
    # verdict is consistent with the flags, and the gates actually fire
    flagged = got[["f_short", "f_top_word", "f_low_distinct"]].sum(axis=1)
    assert ((got["keep"] == 1) == (flagged == 0)).all()
    assert got["keep"].sum() < len(got)


def test_tpch_q17_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_small_quantity_revenue

    got = tpch_small_quantity_revenue(SF)
    _assert_frames_equal(got, _oracle_multi("tpch_small_quantity_revenue"))
    assert len(got) > 0
    assert (got["revenue_e2"] > 0).all()
