"""Round-2 continuation batch 5: product-quantization codes, stale
series flags, latest-value percentile rank — DuckDB oracle parity at
sf0.001 plus invariants (PQ code width / residual vs full k-means,
staleness monotonicity, rank count conservation)."""

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
    for t in ("events", "embeddings"):
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


def test_pq_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import pq_codebook_assignments

    got = pq_codebook_assignments(SF)
    want = _oracle("pq_codebook_assignments")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert got["code0"].between(0, 3).all()
    assert got["code1"].between(0, 3).all()
    assert (got["dist2_0"] >= 0).all()
    assert (got["dist2_1"] >= 0).all()


def test_pq_residual_additivity(ray_session):
    """PQ residual = sum of subspace residuals; each subspace residual
    is no larger than assigning the subvector to ANY single shared
    centroid — spot-check vs the full-space k=4 clustering."""
    import pyarrow.parquet as pq

    from ctas_ray.pipelines.queries import pq_codebook_assignments
    from ctas_ray.stages.clustering import kmeans_quantized
    from ctas_ray.sources import read_parquet_clean

    got = pq_codebook_assignments(SF)
    emb = read_parquet_clean(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    full = kmeans_quantized(emb, k=4, iters=2)
    m = got.merge(full, on="vec_id")
    # the PQ codebook has 16 effective cells vs 4 full-space cells:
    # its total residual can never exceed the full-space clustering's
    pq_res = (m["dist2_0"] + m["dist2_1"]).sum()
    assert pq_res <= m["dist2"].sum()


def test_stale_flags_match_oracle(ray_session):
    from ctas_ray.pipelines.queries import stale_series_flags

    got = stale_series_flags(SF)
    want = _oracle("stale_series_flags")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert got["global_max_us"].nunique() == 1
    assert (got["last_ts_us"] <= got["global_max_us"]).all()
    # the series holding the global max is never stale
    head = got.loc[got["last_ts_us"] == got["global_max_us"]]
    assert (head["is_stale"] == 0).all()


def test_latest_rank_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import latest_percentile_rank

    got = latest_percentile_rank(SF)
    want = _oracle("latest_percentile_rank")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["n_eq"] >= 1).all()  # the latest value equals itself
    assert (got["n_less"] + got["n_eq"] <= got["n_points"]).all()
