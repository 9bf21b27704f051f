"""Round-2 continuation batch 3: slope extrema, daily cumulative
totals, winsorized totals, lineage time-travel — DuckDB oracle parity
at sf0.001 plus invariants (slope ordering, cumsum monotonicity,
winsorized-vs-raw bounds, snapshot recovery semantics)."""

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


def test_slope_extrema_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import slope_extrema

    got = slope_extrema(SF)
    want = _oracle("slope_extrema")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["max_slope_q"] >= got["min_slope_q"]).all()
    assert (got["n_steps"] >= 1).all()


def test_daily_cumulative_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import daily_cumulative_totals

    got = daily_cumulative_totals(SF)
    want = _oracle("daily_cumulative_totals")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    for _, g in got.groupby("parameter_id"):
        assert (np.diff(g["cum_n"].to_numpy()) > 0).all()
        assert g["cum_n"].iloc[-1] == g["n"].sum()
        assert g["cum_sum_e6"].iloc[-1] == g["sum_e6"].sum()


def test_winsorized_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import winsorized_totals

    got = winsorized_totals(SF)
    want = _oracle("winsorized_totals")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["winsor_lo_e6_x20"] <= got["winsor_hi_e6_x20"]).all()
    # clamped total lies within [n * lo, n * hi]
    assert (got["winsor_sum_e6_x20"] >= got["n"] * got["winsor_lo_e6_x20"]).all()
    assert (got["winsor_sum_e6_x20"] <= got["n"] * got["winsor_hi_e6_x20"]).all()


def test_winsor_kernel_planted():
    from ctas_ray.pipelines.queries import _winsor_param_kernel

    # 21 values 0..20: P5 = 1.0, P95 = 19.0 exactly (h = p*(n-1) = 1, 19)
    g = pd.DataFrame(
        {"event_type": ["a"] * 21, "vq": np.arange(21), "cnt": [1] * 21}
    )
    r = _winsor_param_kernel(g).iloc[0]
    assert r["winsor_lo_e6_x20"] == 20
    assert r["winsor_hi_e6_x20"] == 380
    # clamp replaces 0 -> 1 and 20 -> 19: sum = 210 - 0 - 20 + 1 + 19 = 210
    assert r["winsor_sum_e6_x20"] == 20 * 210


def test_timetravel_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import rollup_1m_timetravel

    got = rollup_1m_timetravel(SF)
    want = _oracle("rollup_1m_timetravel")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_read_tier_asof_semantics(ray_session, tmp_path):
    """back=0 equals the merged view; back past the origin raises;
    the prior snapshot is untouched by ingest."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        read_increment_tier,
        read_tier_asof,
        run_rollup_events,
    )

    ev = pq.read_table(f"{SF}/events.parquet")
    ts = ev["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    cut = np.median(ts)
    d_old, d_full = str(tmp_path / "old"), str(tmp_path / "full")
    os.makedirs(d_old)
    os.makedirs(d_full)
    early = ts <= cut
    pq.write_table(ev.filter(pa.array(early)), f"{d_old}/events.parquet")
    pq.write_table(ev, f"{d_full}/events.parquet")
    inc = str(tmp_path / "increment.parquet")
    pq.write_table(ev.filter(pa.array(~early)), inc)

    cfg = RollupConfig()
    prior = run_rollup_events(d_old, str(tmp_path / "prior"), cfg)
    merged = ingest_events_increment(d_full, inc, prior, str(tmp_path / "m"), cfg)

    def norm(df):
        return (
            df.sort_values(["conv_id", "channel", "bucket"]).reset_index(drop=True)
        )

    cur = norm(read_tier_asof(merged, "tier_1m", back=0).to_pandas())
    view = norm(read_increment_tier(merged, "tier_1m").to_pandas())
    pd.testing.assert_frame_equal(cur, view)

    snap = norm(read_tier_asof(merged, "tier_1m", back=1).to_pandas())
    prior_df = norm(read_tier_asof(prior, "tier_1m", back=0).to_pandas())
    pd.testing.assert_frame_equal(snap, prior_df)
    assert len(snap) < len(cur)

    try:
        read_tier_asof(merged, "tier_1m", back=2)
        raise AssertionError("expected ValueError walking past the origin")
    except ValueError:
        pass
