"""Round-2 continuation batch 21: fulfilment-lag SLO and Q6-shaped
revenue — DuckDB oracle parity at sf0.001 plus ordering and
non-vacuity checks."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _oracle(name: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
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


def test_fulfilment_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import order_fulfilment_lag

    got = order_fulfilment_lag(SF)
    want = _oracle("order_fulfilment_lag")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # P95 (20-fold) is never below the median (doubled): p95/20 >= med2/2
    assert (got["p95_lag_d_x20"] >= 10 * got["med2_lag_d"]).all()
    assert (got["n_items"] >= 1).all()


def test_q6_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_q6_revenue

    got = tpch_q6_revenue(SF)
    want = _oracle("tpch_q6_revenue")
    _assert_frames_equal(got, want)
    assert int(got["n_items"].iloc[0]) > 0  # brackets chosen non-vacuous
    assert int(got["revenue_e4"].iloc[0]) > 0
