"""Temporal join / window operators (stages/windows.py) and the
repetition-quality signals: DuckDB-oracle parity at sf0.001 (mirrors
the driver's compare) plus semantic edge cases the fixture data can't
hit (equal-timestamp ties, window boundaries, empty right side).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

QUERIES = [
    "session_windows",
    "asof_join_clicks",
    "range_join_purchases",
    "hopping_window_stats",
    "repetition_stats",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_window_query_matches_oracle(ray_session, oracle_con, name):
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
            assert np.allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True
            ), c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c


def _ts(us):
    return pd.Timestamp("2024-01-01") + pd.to_timedelta(us, unit="us")


def test_sessionize_gap_boundary(ray_session):
    """Gap exactly == threshold stays in-session; gap+1us splits."""
    from ctas_ray.stages.windows import sessionize

    gap = 1_000_000  # 1s
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": [_ts(0), _ts(gap), _ts(2 * gap + 1), _ts(5)],
            "event_id": [1, 2, 3, 4],
            "value": [1.0, 2.0, None, 4.0],
        }
    )
    out = (
        sessionize(rd.from_pandas(df), gap_us=gap)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_idx"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["n_values"].tolist() == [2, 0, 1]
    assert out["sum_value_e6"].tolist() == [3_000_000, 0, 4_000_000]
    assert out["duration_us"].tolist() == [gap, 0, 0]


def test_asof_tie_and_no_match(ray_session):
    """Right row at the exact left ts matches; equal-ts right dupes
    resolve to MAX(value); a left row before any right gets NULL."""
    from ctas_ray.stages.windows import asof_join

    left = pd.DataFrame(
        {"user_id": [1, 1, 2], "ts": [_ts(10), _ts(5), _ts(1)], "event_id": [1, 2, 3]}
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": [_ts(10), _ts(10), _ts(4), _ts(2)],
            "value": [7.0, 9.0, 3.0, 1.0],
        }
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "asof_value"] == 9.0  # tie at ts=10 -> max
    assert out.loc[1, "asof_value"] == 3.0
    assert np.isnan(out.loc[2, "asof_value"])  # before any right row


def test_range_join_closed_interval(ray_session):
    """Rights at both interval endpoints count; outside does not."""
    from ctas_ray.stages.windows import range_join_count

    W = 100
    left = pd.DataFrame({"user_id": [1], "ts": [_ts(200)], "event_id": [1]})
    right = pd.DataFrame(
        {
            "user_id": [1] * 5,
            # 99 (out), 100 (lower edge), 150, 200 (upper edge), 201 (out)
            "ts": [_ts(99), _ts(100), _ts(150), _ts(200), _ts(201)],
        }
    )
    out = range_join_count(
        rd.from_pandas(left), rd.from_pandas(right), window_us=W
    ).to_pandas()
    assert out["n_in_window"].tolist() == [3]


def test_range_join_empty_right(ray_session):
    from ctas_ray.stages.windows import range_join_count

    left = pd.DataFrame({"user_id": [1, 2], "ts": [_ts(1), _ts(2)], "event_id": [1, 2]})
    right = pd.DataFrame({"user_id": [3], "ts": [_ts(1)]})
    out = range_join_count(
        rd.from_pandas(left), rd.from_pandas(right), window_us=10
    ).to_pandas()
    assert sorted(out["n_in_window"].tolist()) == [0, 0]


def test_hopping_window_membership(ray_session):
    """An event contributes to exactly size/hop windows, and window
    starts tile backwards from its hop bucket."""
    from ctas_ray.stages.windows import hopping_window_agg

    df = pd.DataFrame(
        {"event_type": ["a"], "ts": [_ts(3_600_000_000)], "value": [2.0]}
    )
    out = (
        hopping_window_agg(
            rd.from_pandas(df), size_us=4_000_000, hop_us=1_000_000
        )
        .to_pandas()
        .sort_values("window_start_us")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    base = out["window_start_us"].iloc[-1]
    assert (np.diff(out["window_start_us"].to_numpy()) == 1_000_000).all()
    assert (out["n"] == 1).all()
    assert (out["sum_value_e6"] == 2_000_000).all()
    # newest window starts at the event's own hop bucket
    epoch0 = pd.Timestamp("1970-01-01")
    ev_us = int((_ts(3_600_000_000) - epoch0).value // 1000)
    assert base == (ev_us // 1_000_000) * 1_000_000


def test_repetition_stats_edges(ray_session):
    from ctas_ray.stages.text_analysis import repetition_stats

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a a b", "x", "p q  q p"],  # note double space in 3
        }
    )
    out = (
        repetition_stats(rd.from_pandas(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [4, 1, 5]  # '' token from double space
    assert out["n_distinct_words"].tolist() == [2, 1, 3]
    assert out["top_word_count"].tolist() == [3, 1, 2]
    assert out["n_bigrams"].tolist() == [3, 0, 4]
    assert out["n_distinct_bigrams"].tolist() == [2, 0, 4]
