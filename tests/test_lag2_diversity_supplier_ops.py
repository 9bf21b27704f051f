"""Round-2 continuation batch 23: lag-2 ACF partials, conversation
tool diversity, supplier balance quantiles — DuckDB oracle parity at
sf0.001 plus bound invariants."""

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
    for t in ("events", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
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


def test_lag2_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import lag2_autocorr_partials

    got = lag2_autocorr_partials(SF)
    want = _oracle("lag2_autocorr_partials")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # Cauchy-Schwarz on the cross moment: (sum_xy)^2 <= sum_x2 * sum_y2
    xy = got["sum_xy"].to_numpy(np.float64)
    assert (
        xy * xy
        <= got["sum_x2"].to_numpy(np.float64)
        * got["sum_y2"].to_numpy(np.float64)
        + 1e-6
    ).all()


def test_tool_diversity_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import conv_tool_diversity

    got = conv_tool_diversity(SF)
    want = _oracle("conv_tool_diversity")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["n_types"] <= got["n_turns"]).all()
    # collision-mass bounds: n_turns <= sum_c2 <= n_turns^2
    assert (got["sum_c2"] >= got["n_turns"]).all()
    assert (got["sum_c2"] <= got["n_turns"] * got["n_turns"]).all()


def test_supplier_quantiles_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import supplier_acctbal_quantiles

    got = supplier_acctbal_quantiles(SF)
    want = _oracle("supplier_acctbal_quantiles")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # quartile ordering: q1/4 <= med2/2 <= q3/4
    assert (got["q1_e2_x4"] <= 2 * got["med2_e2"]).all()
    assert (2 * got["med2_e2"] <= got["q3_e2_x4"]).all()
