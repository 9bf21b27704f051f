"""Round-2 continuation batch 20: tercile transition matrix and
genericness counts — DuckDB oracle parity at sf0.001 plus mass
conservation and balance invariants."""

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


def test_tercile_transitions_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import tercile_transition_matrix

    got = tercile_transition_matrix(SF)
    want = _oracle("tercile_transition_matrix")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert got["t_from"].between(0, 2).all()
    assert got["t_to"].between(0, 2).all()
    # transition mass = points - series (each series loses one pair)
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "user_id", "value"]
    ).dropna(subset=["value"])
    n_points = len(ev)
    n_series = len(ev.drop_duplicates(["event_type", "user_id"]))
    assert got["n"].sum() == n_points - n_series


def test_genericness_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import doc_genericness_counts

    got = doc_genericness_counts(SF)
    want = _oracle("doc_genericness_counts")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["n_top50"] <= got["n_tokens"]).all()
    # the top-50 vocabulary covers a meaningful share of any natural
    # corpus (Zipf) — sanity, not exactness
    assert got["n_top50"].sum() > 0
