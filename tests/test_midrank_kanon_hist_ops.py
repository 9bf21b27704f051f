"""Round-2 continuation batch 10: global midrank normalization,
k-anonymity suppression, log2 token histogram — DuckDB oracle parity
at sf0.001 plus rank-sum and conservation invariants."""

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


def test_midranks_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import global_midrank_values

    got = global_midrank_values(SF)
    want = _oracle("global_midrank_values")
    _assert_frames_equal(got, want)
    # rank-sum identity: doubled midranks per parameter sum to n*(n+1)
    for _, g in got.groupby("parameter_id"):
        n = len(g)
        assert g["midrank2"].sum() == n * (n + 1)
    # monotone: larger value never has a smaller midrank
    for _, g in got.groupby("parameter_id"):
        s = g.sort_values("value_e6")
        assert (np.diff(s["midrank2"].to_numpy()) >= 0).all()


def test_kanon_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import (
        K_ANON_THRESHOLD,
        k_anonymity_suppression,
    )

    got = k_anonymity_suppression(SF)
    want = _oracle("k_anonymity_suppression")
    _assert_frames_equal(got, want)
    assert (got["n_subjects"] < K_ANON_THRESHOLD).all()
    # ground truth recomputation
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    ev = ev.assign(site=ev["user_id"] % 12)
    truth = (
        ev.drop_duplicates()
        .groupby(["site", "event_type"])["user_id"]
        .nunique()
    )
    small = truth[truth < K_ANON_THRESHOLD]
    assert len(got) == len(small)


def test_token_histogram_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import doc_token_histogram

    got = doc_token_histogram(SF)
    want = _oracle("doc_token_histogram")
    _assert_frames_equal(got, want)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    n_tok = docs["text"].astype(str).str.split().str.len()
    assert got["n_docs"].sum() == int((n_tok > 0).sum())
    assert got["sum_tokens"].sum() == int(n_tok.sum())
    # bucket b holds counts in [2^(b-1), 2^b)
    lo = np.left_shift(1, got["bucket_bits"].to_numpy(np.int64) - 1)
    hi = np.left_shift(1, got["bucket_bits"].to_numpy(np.int64))
    assert (got["sum_tokens"].to_numpy() >= got["n_docs"].to_numpy() * lo).all()
    assert (got["sum_tokens"].to_numpy() < got["n_docs"].to_numpy() * hi).all()
