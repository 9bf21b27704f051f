"""Round-2 continuation batch 13: latency-vs-length bins, order
inversions, referential integrity — DuckDB oracle parity at sf0.001
plus planted-skew and orphan-injection checks."""

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
    for t in ("events", "orders", "customer", "nation", "lineitem"):
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


def test_latency_bins_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import latency_length_bins

    got = latency_length_bins(SF)
    want = _oracle("latency_length_bins")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["med2_latency_us"] >= 0).all()


def test_inversions_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import ts_order_inversions

    got = ts_order_inversions(SF)
    want = _oracle("ts_order_inversions")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["n_inversions"] <= got["n_pairs"]).all()


def test_inversions_planted_skew():
    from ctas_ray.pipelines.queries import _inversion_partition

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:02",
         "2024-01-01 00:00:01",  # event 2 emitted with an earlier ts
         "2024-01-01 00:00:03"]
    )
    part = pd.DataFrame({"user_id": [1] * 4, "event_id": range(4), "ts": ts})
    r = _inversion_partition(part).iloc[0]
    assert r["n_pairs"] == 6
    assert r["n_inversions"] == 1  # only the (1, 2) pair is inverted


def test_integrity_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import referential_integrity

    got = referential_integrity(SF)
    want = _oracle("referential_integrity")
    _assert_frames_equal(got, want)
    assert len(got) == 3
    assert (got["n_orphans"] >= 0).all()
    assert (got["n_orphans"] <= got["n_child"]).all()


def test_integrity_detects_planted_orphans(ray_session, tmp_path):
    """Injecting orphan custkeys into a copy of orders is detected."""
    import shutil

    from ctas_ray.pipelines.queries import referential_integrity

    d = tmp_path / "sf"
    d.mkdir()
    for t in ("events", "orders", "customer", "nation", "lineitem",
              "documents", "embeddings"):
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    orders = pd.read_parquet(d / "orders.parquet")
    bad = orders.head(7).copy()
    bad["o_custkey"] = 99_999_999  # no such customer
    bad["o_orderkey"] = bad["o_orderkey"] + 10_000_000
    pd.concat([orders, bad], ignore_index=True).to_parquet(d / "orders.parquet")
    got = referential_integrity(str(d))
    row = got.loc[got["relation"] == "orders.o_custkey->customer"].iloc[0]
    assert row["n_orphans"] == 7
