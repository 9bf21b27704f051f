"""Round-2 continuation batch 7: dense-rank-with-ties top values, null
profiler, weekday-vs-weekend MWU shift — DuckDB oracle parity at
sf0.001 plus tie-semantics and identity invariants."""

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


def test_dense_rank_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import dense_rank_top_values

    got = dense_rank_top_values(SF)
    want = _oracle("dense_rank_top_values")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # each parameter has exactly one distinct rank-1 value and (when
    # present) one distinct rank-2 value, below rank 1
    for _, g in got.groupby("parameter_id"):
        v1 = g.loc[g["vrank"] == 1, "value_e6"].unique()
        assert len(v1) == 1
        v2 = g.loc[g["vrank"] == 2, "value_e6"].unique()
        assert len(v2) <= 1
        if len(v2):
            assert v2[0] < v1[0]


def test_null_profile_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import events_null_profile

    got = events_null_profile(SF)
    want = _oracle("events_null_profile")
    _assert_frames_equal(got, want)
    assert set(got["col_name"]) == {"props", "value"}
    assert got["n_total"].nunique() == 1
    assert (got["n_null"] <= got["n_total"]).all()


def test_weekend_shift_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import weekday_value_shift

    got = weekday_value_shift(SF)
    want = _oracle("weekday_value_shift")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # MWU identity: U_weekday + U_weekend = n0 * n1 (two-group case),
    # doubled on both sides
    for _, g in got.groupby("parameter_id"):
        if len(g) == 2:
            n0, n1 = g["n_group"].to_numpy(np.int64)
            assert g["u2"].sum() == 2 * n0 * n1
