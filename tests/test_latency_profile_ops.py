"""Round-2 continuation batch 12: cold-start latency profile and
per-tool tail-latency quantiles — DuckDB oracle parity at sf0.001 plus
ordering/quantile invariants."""

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


def test_coldstart_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import coldstart_latency_profile

    got = coldstart_latency_profile(SF)
    want = _oracle("coldstart_latency_profile")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["first_latency_us"] >= 0).all()
    assert (got["med2_rest_us"] >= 0).all()
    assert (got["n_lat"] >= 2).all()


def test_coldstart_planted():
    from ctas_ray.pipelines.queries import _coldstart_partition

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10",  # first lat 10s
         "2024-01-01 00:00:12", "2024-01-01 00:00:16"]  # rest 2s, 4s
    )
    part = pd.DataFrame({"user_id": [3] * 4, "ts": ts, "event_id": range(4)})
    r = _coldstart_partition(part).iloc[0]
    assert r["first_latency_us"] == 10_000_000
    assert r["med2_rest_us"] == 6_000_000  # 2*median(2s,4s) = 2s+4s
    assert r["n_lat"] == 3


def test_tail_latency_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tail_latency_by_tool

    got = tail_latency_by_tool(SF)
    want = _oracle("tail_latency_by_tool")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["p50_x100"] <= got["p95_x100"]).all()
    assert (got["p95_x100"] <= got["p99_x100"]).all()
    assert (got["n_lat"] >= 1).all()
