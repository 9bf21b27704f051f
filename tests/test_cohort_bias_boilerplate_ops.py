"""Round-2 continuation batch 9: retention cohorts, new-user accrual,
round-number bias, boilerplate n-grams — DuckDB oracle parity at
sf0.001 plus conservation/nesting invariants."""

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
    for t in ("events", "documents"):
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


def test_retention_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import retention_cohorts

    got = retention_cohorts(SF)
    want = _oracle("retention_cohorts")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # offset-0 cohort sizes sum to the number of distinct users
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert (
        got.loc[got["week_offset"] == 0, "n_users"].sum()
        == ev["user_id"].nunique()
    )
    # retention never exceeds the cohort size
    base = got.loc[got["week_offset"] == 0].set_index("cohort_week_us")["n_users"]
    for _, r in got.iterrows():
        assert r["n_users"] <= base[r["cohort_week_us"]]


def test_new_users_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import new_users_by_day

    got = new_users_by_day(SF)
    want = _oracle("new_users_by_day")
    _assert_frames_equal(got, want)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    assert got["cum_users"].iloc[-1] == ev["user_id"].nunique()
    assert (np.diff(got["cum_users"].to_numpy()) > 0).all()


def test_round_bias_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import round_number_bias

    got = round_number_bias(SF)
    want = _oracle("round_number_bias")
    _assert_frames_equal(got, want)
    # nesting: integers subset halves subset tenths subset total
    assert (got["n_int"] <= got["n_half"]).all()
    assert (got["n_half"] <= got["n_tenth"]).all()
    assert (got["n_tenth"] <= got["n_total"]).all()


def test_boilerplate_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import (
        BOILERPLATE_MIN_DF,
        BOILERPLATE_NGRAM,
        boilerplate_ngrams,
    )

    got = boilerplate_ngrams(SF)
    want = _oracle("boilerplate_ngrams")
    _assert_frames_equal(got, want)
    assert (got["df"] >= BOILERPLATE_MIN_DF).all()
    assert (got["g"].str.split().str.len() == BOILERPLATE_NGRAM).all()
