"""Round-2 continuation batch 2: SAX symbolization, GROUPING SETS
hierarchy totals, Pareto top-10 concentration, site x parameter
contingency — DuckDB oracle parity at sf0.001 plus structural
invariants (symbol alphabet/monotonicity, hierarchy additivity, rank
ordering, margin conservation)."""

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
    for t in ("events", "orders", "customer", "nation", "region"):
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


def test_sax_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import sax_symbols

    got = sax_symbols(SF)
    want = _oracle("sax_symbols")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert got["symbol"].between(0, 3).all()
    # a 4-letter alphabet over global quartiles uses every letter on
    # any non-degenerate distribution
    assert got["symbol"].nunique() == 4


def test_sax_quartile_kernel_exact():
    from ctas_ray.pipelines.queries import _quartiles_q4

    # distribution 1..9 each once: type-7 quartiles are 3, 5, 7
    g = pd.DataFrame(
        {"event_type": ["a"] * 9, "vq": np.arange(1, 10), "cnt": [1] * 9}
    )
    q = _quartiles_q4(g).sort_values("p")
    assert list(q["q4"]) == [12, 20, 28]
    # even count with interpolation: 1,2,3,4 -> Q1 = 1.75, Q2 = 2.5,
    # Q3 = 3.25 -> quadrupled 7, 10, 13
    g2 = pd.DataFrame(
        {"event_type": ["a"] * 4, "vq": [1, 2, 3, 4], "cnt": [1] * 4}
    )
    q2 = _quartiles_q4(g2).sort_values("p")
    assert list(q2["q4"]) == [7, 10, 13]


def test_regional_rollup_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import regional_rollup_totals

    got = regional_rollup_totals(SF)
    want = _oracle("regional_rollup_totals")
    _assert_frames_equal(got, want)
    # hierarchy additivity: nations sum to the grand total, regions too
    tot = got.loc[got["lvl"] == "all"]
    assert len(tot) == 1
    for lvl in ("nation", "region"):
        part = got.loc[got["lvl"] == lvl]
        assert part["n_orders"].sum() == tot["n_orders"].iloc[0]
        assert part["revenue_e2"].sum() == tot["revenue_e2"].iloc[0]


def test_pareto_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import pareto_topk_share

    got = pareto_topk_share(SF)
    want = _oracle("pareto_topk_share")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # per parameter: ranks are 1..k and sums are non-increasing
    for _, g in got.groupby("parameter_id"):
        assert list(g["rnk"]) == list(range(1, len(g) + 1))
        assert (np.diff(g["user_sum_e6"].to_numpy()) <= 0).all()
        assert g["total_e6"].nunique() == 1


def test_contingency_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import site_parameter_contingency

    got = site_parameter_contingency(SF)
    want = _oracle("site_parameter_contingency")
    _assert_frames_equal(got, want)
    # margins conserve: per-site cell sums equal site_n, grand is global
    grand = got["grand_n"].iloc[0]
    assert got["n"].sum() == grand
    for _, g in got.groupby("site"):
        assert g["n"].sum() == g["site_n"].iloc[0]
    for _, g in got.groupby("parameter_id"):
        assert g["n"].sum() == g["param_n"].iloc[0]
