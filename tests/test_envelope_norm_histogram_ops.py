"""Round-2 continuation batch 14: weekly range envelope, embedding
norm stats, near-dup cluster-size histogram — DuckDB oracle parity at
sf0.001 plus conservation invariants."""

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
    for t in ("events", "embeddings", "documents"):
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


def test_envelope_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import weekly_range_envelope

    got = weekly_range_envelope(SF)
    want = _oracle("weekly_range_envelope")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["min_e6"] <= got["max_e6"]).all()


def test_sqnorm_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import embedding_sqnorm_stats

    got = embedding_sqnorm_stats(SF)
    want = _oracle("embedding_sqnorm_stats")
    _assert_frames_equal(got, want)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label"])
    assert got["n_vecs"].sum() == len(emb)
    assert (got["min_sqnorm_e12"] <= got["max_sqnorm_e12"]).all()
    assert (got["sum_sqnorm_e12"] >= got["n_vecs"] * got["min_sqnorm_e12"]).all()


def test_cluster_histogram_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import (
        jaccard_neardup_clusters,
        neardup_cluster_size_histogram,
    )

    got = neardup_cluster_size_histogram(SF)
    want = _oracle("neardup_cluster_size_histogram")
    _assert_frames_equal(got, want)
    # mass conservation vs the cluster assignment; every cluster >= 2
    cc = jaccard_neardup_clusters(SF)
    assert (got["size"] >= 2).all()
    assert (got["size"] * got["n_clusters"]).sum() == len(cc)
