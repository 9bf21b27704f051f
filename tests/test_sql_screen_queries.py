"""The hash-verified study-screen queries vs their DuckDB oracles.

Mirrors the driver's comparison (row count + schema + values) at
sf0.001 so regressions in planning, feature math, gates, IQR fences or
the KS statistic surface in CI before the driver round.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

QUERIES = [
    "study_screen_plan",
    "study_screen_features_exact",
    "study_screen_iqr_sitescores",
    "study_screen_ks_statistics",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_screen_query_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as entry

    got = entry.queries()[name](SF)
    want = oracle_con.execute(entry.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True), c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


def test_iqr_signal_rows_nonvacuous(ray_session):
    """The IQR variant must actually flag something at sf0.001/sf0.01 —
    a 0-signal result would make the hash check near-vacuous."""
    import __ray_entry__ as entry

    s = entry.queries()["study_screen_iqr_sitescores"](SF)
    assert len(s) > 0
    assert set(s["is_signal"].unique()) <= {0, 1}
