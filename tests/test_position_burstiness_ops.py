"""Round-2 continuation batch 19: turn-position profile and
burstiness partials — DuckDB oracle parity at sf0.001 plus
monotonicity/variance invariants."""

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


def test_position_profile_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import turn_position_profile

    got = turn_position_profile(SF)
    want = _oracle("turn_position_profile")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # counts at position k never exceed counts at position k-1
    assert (np.diff(got["n"].to_numpy()) <= 0).all()
    # position 1 counts every conversation
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert got["n"].iloc[0] == ev["user_id"].nunique()


def test_burstiness_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import burstiness_partials

    got = burstiness_partials(SF)
    want = _oracle("burstiness_partials")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # Cauchy-Schwarz: n * sumsq >= sum^2
    n = got["n_gaps"].to_numpy(np.float64)
    s = got["sum_gap_ms"].to_numpy(np.float64)
    ss = got["sumsq_gap_ms"].to_numpy(np.float64)
    assert (n * ss >= s * s - 1e-6).all()
