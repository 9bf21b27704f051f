"""Round-2 continuation batch 22: segment mix and size-price Pearson
partials — DuckDB oracle parity at sf0.001 plus conservation and
Cauchy-Schwarz checks."""

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
    for t in ("customer", "nation", "part"):
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


def test_segment_mix_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import segment_nation_mix

    got = segment_nation_mix(SF)
    want = _oracle("segment_nation_mix")
    _assert_frames_equal(got, want)
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    assert got["n_customers"].sum() == len(cust)


def test_size_price_partials_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import part_size_price_partials

    got = part_size_price_partials(SF)
    want = _oracle("part_size_price_partials")
    _assert_frames_equal(got, want)
    part = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"])
    assert got["n"].sum() == len(part)
    # Cauchy-Schwarz on both moments
    n = got["n"].to_numpy(np.float64)
    for s, ss in (("sum_size", "sum_size2"), ("sum_price_e2", "sum_price2_e4")):
        x = got[s].to_numpy(np.float64)
        xx = got[ss].to_numpy(np.float64)
        assert (n * xx >= x * x - 1e-6).all()
