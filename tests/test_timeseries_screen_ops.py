"""Timeseries screening primitives + vocabulary combiner
(pipelines/queries.py: cusum_changepoint, channel_correlation,
token_vocabulary_topk) — DuckDB oracle parity at sf0.001 and
small hand-checked invariants."""

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
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(e.oracle_sql()[name]).fetchdf()


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert (g == w).all(), (c, g[g != w][:3], w[g != w][:3])


def test_cusum_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import cusum_changepoint

    got = cusum_changepoint(SF)
    want = _oracle("cusum_changepoint")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # the statistic is scale-by-n of the centered cumsum: a constant
    # series has stat 0, changepoint 1 (earliest argmax tie-break)
    zero = got[got["cusum_scaled"] == 0]
    assert (zero["changepoint"] == 1).all()


def test_cusum_planted_shift():
    """A deterministic level shift must put the changepoint at the
    shift boundary: S_t peaks where the mean changes."""
    from ctas_ray.pipelines.queries import _cusum_partition

    n = 40
    df = pd.DataFrame(
        {
            "event_type": "m",
            "user_id": np.int64(7),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": np.r_[np.zeros(20), np.ones(20)],
        }
    )
    out = _cusum_partition(df)
    assert len(out) == 1
    assert int(out["changepoint"].iloc[0]) == 20


def test_channel_correlation_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import channel_correlation

    got = channel_correlation(SF)
    want = _oracle("channel_correlation")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert got["corr_e6"].between(-1_000_000, 1_000_000).all()


def test_token_vocabulary_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import token_vocabulary_topk

    got = token_vocabulary_topk(SF)
    want = _oracle("token_vocabulary_topk")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # counts are descending with token-asc tie-break
    n = got["n"].to_numpy()
    assert (n[:-1] >= n[1:]).all()


def test_ewma_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import ewma_last

    got = ewma_last(SF)
    want = _oracle("ewma_last")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_ewma_scalar_fold_parity():
    """The vectorized cross-series scan must be bit-equal to a scalar
    left fold per series."""
    from ctas_ray.pipelines.queries import _ewma_partition

    rng = np.random.default_rng(7)
    n = 37
    df = pd.DataFrame(
        {
            "event_type": np.repeat(["a", "b"], n),
            "user_id": np.int64(3),
            "ts": np.tile(pd.date_range("2024-01-01", periods=n, freq="1min"), 2),
            "event_id": np.arange(2 * n, dtype=np.int64),
            "value": rng.normal(size=2 * n) * 100,
        }
    )
    out = _ewma_partition(df)
    for et in ("a", "b"):
        vals = df[df["event_type"] == et]["value"].to_numpy()
        acc = vals[0]
        for x in vals[1:]:
            acc = 0.25 * x + 0.75 * acc
        want = int(np.floor(acc * 1e6 + 0.5))
        got = int(out[out["parameter_id"] == et]["ewma_e6"].iloc[0])
        assert got == want


def test_rolling_extrema_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import rolling_extrema

    got = rolling_extrema(SF)
    want = _oracle("rolling_extrema")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["max5_e6"] >= got["min5_e6"]).all()


def test_range_shift_flags_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import range_shift_flags

    got = range_shift_flags(SF)
    want = _oracle("range_shift_flags")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_flags_planted_patterns():
    """A constant-dominated series must raise repeated_flag; a
    flat-then-exploding series must raise range_shift_flag."""
    from ctas_ray.pipelines.queries import _flags_partition

    n = 30
    ts = pd.date_range("2024-01-01", periods=n, freq="1min")
    rep = pd.DataFrame(
        {"event_type": "rep", "user_id": np.int64(1), "ts": ts,
         "event_id": np.arange(n, dtype=np.int64),
         "value": np.r_[np.full(20, 7.0), np.arange(10, dtype=np.float64)]}
    )
    shift = pd.DataFrame(
        {"event_type": "shift", "user_id": np.int64(2), "ts": ts,
         "event_id": np.arange(n, dtype=np.int64),
         "value": np.r_[np.linspace(0, 1, 15), np.linspace(0, 10, 15)]}
    )
    out = _flags_partition(pd.concat([rep, shift], ignore_index=True))
    rrow = out[out["parameter_id"] == "rep"].iloc[0]
    srow = out[out["parameter_id"] == "shift"].iloc[0]
    assert rrow["repeated_flag"] == 1 and rrow["max_run"] == 20
    assert srow["range_shift_flag"] == 1 and srow["repeated_flag"] == 0


def test_activity_trend_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import activity_trend

    got = activity_trend(SF)
    want = _oracle("activity_trend")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_stratified_sample_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import stratified_sample

    got = stratified_sample(SF)
    want = _oracle("stratified_sample")
    _assert_frames_equal(got, want)
    assert 0 < len(got)
    # rate sanity: ~20% of the corpus, deterministic
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert 0.05 * n < len(got) < 0.45 * n
    again = stratified_sample(SF)
    assert (again["doc_id"].to_numpy() == got["doc_id"].to_numpy()).all()


def test_inverted_index_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import inverted_index

    got = inverted_index(SF)
    want = _oracle("inverted_index")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # posting head is ascending doc ids, at most 5
    for p in got["postings_head"]:
        ids = [int(x) for x in p.split(",")]
        assert len(ids) <= 5 and ids == sorted(ids)


def test_hopping_active_users_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import hopping_active_users

    got = hopping_active_users(SF)
    want = _oracle("hopping_active_users")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # every count is positive and bounded by the corpus user count
    assert (got["n_entities"] > 0).all()


def test_embedding_centroids_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import embedding_centroids

    got = embedding_centroids(SF)

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = con.execute(e.oracle_sql()["embedding_centroids"]).fetchdf()
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # every label has a full dim vector and a consistent n
    dims = got.groupby("label")["dim"].count()
    assert dims.nunique() == 1
    assert (got.groupby("label")["n"].nunique() == 1).all()


def test_top_docs_per_group_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import top_docs_per_group

    got = top_docs_per_group(SF)
    want = _oracle("top_docs_per_group")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got.groupby("lang")["rank"].max() <= 3).all()


def test_curated_corpus_neardup_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import curated_corpus_neardup

    got = curated_corpus_neardup(SF)
    want = _oracle("curated_corpus_neardup")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # near-dup removal really dropped something relative to gates+sample
    assert got["doc_id"].is_unique


def test_stratified_topk_sample_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import stratified_topk_sample

    got = stratified_topk_sample(SF)
    want = _oracle("stratified_topk_sample")
    _assert_frames_equal(got, want)
    assert (got.groupby("lang")["doc_id"].count() <= 10).all()


def test_quantiles_by_parameter_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import quantiles_by_parameter

    got = quantiles_by_parameter(SF)
    want = _oracle("quantiles_by_parameter")
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float), rtol=0, atol=0)
        else:
            assert (g == w).all(), c
    assert (got["value_lo"] <= got["value_hi"]).all()


def test_percent_rank_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import percent_rank_by_series

    got = percent_rank_by_series(SF)
    want = _oracle("percent_rank_by_series")
    _assert_frames_equal(got, want)
    assert (got["rank"] <= got["n"]).all()
    assert (got["rank"] >= 1).all()


def test_value_histogram_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import value_histogram

    got = value_histogram(SF)
    want = _oracle("value_histogram")
    _assert_frames_equal(got, want)
    assert got["bin"].between(0, 19).all()
    # total counts = non-null values
    import pyarrow.parquet as pq

    vals = pq.read_table(f"{SF}/events.parquet", columns=["value"])
    assert got["n"].sum() == len(vals) - vals.column("value").null_count


def _oracle_tpch(name: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(e.oracle_sql()[name]).fetchdf()


def test_tpch_pricing_summary_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_pricing_summary

    got = tpch_pricing_summary(SF)
    want = _oracle_tpch("tpch_pricing_summary")
    _assert_frames_equal(got, want)
    assert len(got) == 6


def test_tpch_top_revenue_orders_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_top_revenue_orders

    got = tpch_top_revenue_orders(SF)
    want = _oracle_tpch("tpch_top_revenue_orders")
    _assert_frames_equal(got, want)
    r = got["revenue_e4"].to_numpy()
    assert (r[:-1] >= r[1:]).all()


def test_tpch_regional_volume_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_regional_volume

    got = tpch_regional_volume(SF)
    want = _oracle_tpch("tpch_regional_volume")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_tpch_semi_join_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_late_shipment_priority

    got = tpch_late_shipment_priority(SF)
    want = _oracle_tpch("tpch_late_shipment_priority")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_tpch_order_count_distribution_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_order_count_distribution

    got = tpch_order_count_distribution(SF)
    want = _oracle_tpch("tpch_order_count_distribution")
    _assert_frames_equal(got, want)
    # distribution covers every customer exactly once
    import pyarrow.parquet as pq

    n_cust = pq.read_metadata(f"{SF}/customer.parquet").num_rows
    assert got["custdist"].sum() == n_cust
