"""Late-round operators: aggregate-gated semi-join (Q18-shaped),
window funnel matching, tf/df term scoring, transcript turn-taking —
DuckDB oracle parity at sf0.001 plus hand-checked invariants."""

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
    for t in ("events", "documents", "lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(e.oracle_sql()[name]).fetchdf()


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        assert g.dtype.kind == w.dtype.kind, (c, g.dtype, w.dtype)
        assert (g == w).all(), (c, g[g != w][:3], w[g != w][:3])


def test_large_order_customers_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tpch_large_order_customers

    got = tpch_large_order_customers(SF)
    want = _oracle("tpch_large_order_customers")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # the HAVING gate is strict: every surviving order's quantity total
    # exceeds the threshold
    assert (got["sum_qty_e2"] > 30_000).all()


def test_window_funnel_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import window_funnel

    got = window_funnel(SF)
    want = _oracle("window_funnel")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # step times are strictly increasing along every matched chain
    m2 = got["t2_us"] >= 0
    assert (got.loc[m2, "t2_us"] > got.loc[m2, "t1_us"]).all()
    m3 = got["t3_us"] >= 0
    assert (got.loc[m3, "t3_us"] > got.loc[m3, "t2_us"]).all()
    # level is consistent with which steps matched
    assert (got["funnel_level"] == 1 + m2.astype(int) + m3.astype(int)).all()


def test_window_funnel_planted_chain():
    """Hand-built event log: the funnel must pick the EARLIEST valid
    chain, and a purchase BEFORE the click must not count."""
    from ctas_ray.pipelines.queries import _funnel_partition

    base = np.datetime64("2024-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    part = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": [
                base + 1 * sec,  # view
                base + 2 * sec,  # purchase (too early: before click)
                base + 3 * sec,  # click
                base + 9 * sec,  # purchase (valid)
                base + 1 * sec,  # view
                base + 1 * sec,  # click at the SAME time: not strictly after
            ],
            "event_type": ["view", "purchase", "click", "purchase", "view", "click"],
        }
    )
    out = _funnel_partition(part).set_index("subject_id")
    assert out.loc["1", "funnel_level"] == 3
    assert out.loc["1", "t3_us"] == (base + 9 * sec - np.datetime64(0, "us")) // np.timedelta64(1, "us")
    assert out.loc["2", "funnel_level"] == 1
    assert out.loc["2", "t2_us"] == -1


def test_tfidf_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import tfidf_top_terms

    got = tfidf_top_terms(SF)
    want = _oracle("tfidf_top_terms")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    # at most 3 terms per doc, ranks dense from 1
    per = got.groupby("doc_id")["rank"].agg(["min", "max", "size"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["size"]).all()
    assert (per["size"] <= 3).all()


def test_conv_turn_taking_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import conv_turn_taking

    got = conv_turn_taking(SF)
    want = _oracle("conv_turn_taking")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert (got["n_tool_calls"] <= got["n_turns"]).all()
    assert (got["n_distinct_tools"] <= got["n_tool_calls"]).all()
    assert (got["max_text_len"] <= got["total_text_len"]).all()


def test_event_cooccurrence_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import event_cooccurrence

    got = event_cooccurrence(SF)
    want = _oracle("event_cooccurrence")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_cooccur_partition_vs_brute_force():
    """Prefix-sum counting equals the naive windowed self-join on a
    hand-sized random stream (incl. same-timestamp tie handling)."""
    rng = np.random.default_rng(7)
    n = 300
    base = np.datetime64("2024-01-01T00:00:00", "us")
    part = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, n),
            "ts": base + rng.integers(0, 2000, n) * np.timedelta64(1_000_000, "us"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "event_id": np.arange(n),
        }
    )
    from ctas_ray.pipelines.queries import _cooccur_partition

    W = 300 * 1_000_000
    got = (
        _cooccur_partition(part, W)
        .groupby(["type_a", "type_b"])["n_pairs"].sum().to_dict()
    )
    t = part["ts"].to_numpy("datetime64[us]").astype(np.int64)
    brute: dict = {}
    for i in range(n):
        for j in range(n):
            if part["user_id"].iat[i] != part["user_id"].iat[j]:
                continue
            after = t[j] > t[i] or (
                t[j] == t[i] and part["event_id"].iat[j] > part["event_id"].iat[i]
            )
            if after and t[j] <= t[i] + W:
                k = (part["event_type"].iat[i], part["event_type"].iat[j])
                brute[k] = brute.get(k, 0) + 1
    assert got == brute


def test_codec_roundtrip_points_matches_oracle(ray_session):
    """Losslessness as an external check: decode(encode(points)) from
    the rollup's Gorilla blobs equals the original channel points the
    DuckDB oracle derives straight from events."""
    from ctas_ray.pipelines.queries import codec_roundtrip_points

    got = codec_roundtrip_points(SF)
    want = _oracle("codec_roundtrip_points")
    _assert_frames_equal(got, want)
    assert len(got) > 0


def test_decontaminated_corpus_matches_oracle(ray_session):
    from ctas_ray.pipelines.queries import decontaminated_corpus

    got = decontaminated_corpus(SF)
    want = _oracle("decontaminated_corpus")
    _assert_frames_equal(got, want)
    assert len(got) > 0
    assert ((got["keep"] == 1) == (got["n_hits"] == 0)).all()


def test_decontamination_planted_overlap():
    """A candidate that quotes 8+ consecutive tokens from the held-out
    set must be flagged; 7-token overlap must not."""
    from ctas_ray.functions.text import WS_RE
    from ctas_ray.pipelines.queries import DECON_NGRAM

    holdout = "the quick brown fox jumps over the lazy dog tonight"
    toks = holdout.split()
    quoted8 = " ".join(["prefix"] + toks[:8] + ["suffix"])
    quoted7 = " ".join(["prefix"] + toks[:7] + ["suffix"])

    def ngrams(text):
        t = [x for x in WS_RE.split(text.strip()) if x]
        return {" ".join(t[i: i + DECON_NGRAM]) for i in range(len(t) - DECON_NGRAM + 1)}

    bl = ngrams(holdout)
    assert len(ngrams(quoted8) & bl) == 1
    assert len(ngrams(quoted7) & bl) == 0
