"""Round-2 continuation batch 18: hourly moments, paired hour values,
Simpson diversity — DuckDB oracle parity at sf0.001 plus
Cauchy-Schwarz / pairing / diversity-bound invariants."""

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


def test_moments_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import hourly_moment_profile

    got = hourly_moment_profile(SF)
    want = _oracle("hourly_moment_profile")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # Cauchy-Schwarz: n * sumsq >= sum^2
    n = got["n"].to_numpy(np.float64)
    s = got["sum_e3"].to_numpy(np.float64)
    ss = got["sumsq_e6"].to_numpy(np.float64)
    assert (n * ss >= s * s - 1e-6).all()


def test_paired_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import paired_hour_values

    got = paired_hour_values(SF)
    want = _oracle("paired_hour_values")
    _assert_frames_equal(got, want)
    # one pair per (subject, hour)
    assert not got.duplicated(["subject_id", "hour_us"]).any()
    assert (got["hour_us"] % 3_600_000_000 == 0).all()


def test_simpson_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import value_simpson_index

    got = value_simpson_index(SF)
    want = _oracle("value_simpson_index")
    _assert_frames_equal(got, want)
    # bounds: n <= sum_c2 <= n^2; equality cases are all-distinct /
    # single-value
    assert (got["sum_c2"] >= got["n"]).all()
    assert (got["sum_c2"] <= got["n"] * got["n"]).all()
    assert (got["n_distinct"] <= got["n"]).all()
