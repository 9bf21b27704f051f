"""Round-2 continuation batch 8: resolution-routed tier reads and the
distributed sweep-line concurrency peak — DuckDB oracle parity at
sf0.001 plus router unit semantics and a brute-force sweep check."""

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


def test_route_tier_picks_coarsest_divisor():
    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import route_tier

    cfg = RollupConfig()
    # tiers are 60 / 3600 / 86400 s
    assert route_tier(7200, cfg) == "tier_1h"
    assert route_tier(60, cfg) == "tier_1m"
    assert route_tier(86400 * 2, cfg) == "tier_1d"
    assert route_tier(180, cfg) == "tier_1m"
    try:
        route_tier(90, cfg)
        raise AssertionError("expected ValueError for undividable resolution")
    except ValueError:
        pass


def test_routed_range_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import rollup_routed_range

    got = rollup_routed_range(SF)
    want = _oracle("rollup_routed_range")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["bucket"] % 7_200_000_000 == 0).all()


def test_routed_range_prunes(ray_session):
    """start/end pruning keeps only in-range buckets."""
    from ctas_ray.pipelines.queries import _tier_dirs, rollup_routed_range
    from ctas_ray.pipelines.rollup import read_rollup_at_resolution

    full = rollup_routed_range(SF)
    lo = int(full["bucket"].quantile(0.3))
    hi = int(full["bucket"].quantile(0.7))
    lo -= lo % 7_200_000_000
    hi -= hi % 7_200_000_000
    part = read_rollup_at_resolution(
        _tier_dirs(SF), 7200, start_us=lo, end_us=hi
    ).to_pandas()
    assert (part["bucket"] >= lo).all()
    assert (part["bucket"] < hi).all()
    want = full[(full["bucket"] >= lo) & (full["bucket"] < hi)]
    assert len(part) == len(want)
    assert part["count"].sum() == want["n"].sum()


def test_concurrency_peak_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import session_concurrency_peak

    got = session_concurrency_peak(SF)
    want = _oracle("session_concurrency_peak")
    _assert_frames_equal(got, want)
    assert got["peak_concurrency"].iloc[0] >= 1


def test_sweep_kernel_brute_force():
    """Day-partitioned carry chain equals a single sorted sweep."""
    from ctas_ray.pipelines.queries import SESSION_SWEEP_US, _sweep_day_partition

    rng = np.random.default_rng(7)
    day_us = 86_400_000_000
    tus = np.sort(rng.integers(0, 5 * day_us, size=400).astype(np.int64))
    t = np.concatenate([tus, tus + SESSION_SWEEP_US])
    d = np.concatenate([np.ones(400, np.int64), -np.ones(400, np.int64)])
    df = pd.DataFrame({"t": t, "d": d, "day": t // day_us})
    parts = (
        pd.concat(
            [_sweep_day_partition(g) for _, g in df.groupby("day")],
            ignore_index=True,
        )
        .sort_values("day")
        .reset_index(drop=True)
    )
    carry = np.concatenate(([0], np.cumsum(parts["net"].to_numpy())[:-1]))
    cand = carry + parts["maxp"].to_numpy()
    peak = int(cand.max())
    first = int(np.argmax(cand == peak))
    at = int(parts["att"].iloc[first])
    # brute force: one global sorted sweep (-1 before +1 at ties)
    order = np.lexsort((d, t))
    pref = np.cumsum(d[order])
    bpeak = int(pref.max())
    bat = int(t[order][int(np.argmax(pref == bpeak))])
    assert peak == bpeak
    assert at == bat
