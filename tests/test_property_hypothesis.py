"""Hypothesis property tests for the codecs and stat kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ctas_ray.functions.codec import (
    decode_series,
    decode_text_block,
    encode_series,
    encode_text_block,
)
from ctas_ray.functions.stats import ks_test, p_adjust, rankdata_average

floats_any = st.floats(
    allow_nan=True, allow_infinity=True, allow_subnormal=True, width=64
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-(2**62), 2**62), floats_any),
        min_size=0, max_size=150,
    )
)
def test_gorilla_roundtrip_any_series(pairs):
    ts = np.array([p[0] for p in pairs], dtype=np.int64)
    vals = np.array([p[1] for p in pairs], dtype=np.float64)
    ts2, v2 = decode_series(encode_series(ts, vals))
    np.testing.assert_array_equal(ts2, ts)
    np.testing.assert_array_equal(v2.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=200), max_size=80))
def test_text_block_roundtrip_any_text(texts):
    assert decode_text_block(encode_text_block(texts)) == texts


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40),
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40),
)
def test_ks_bounds_and_symmetry(x, y):
    x, y = np.array(x), np.array(y)
    stat, p = ks_test(x, y, "two.sided")
    assert 0.0 <= stat <= 1.0 + 1e-12
    assert 0.0 <= p <= 1.0
    # two-sided statistic is symmetric in the samples
    stat2, p2 = ks_test(y, x, "two.sided")
    assert abs(stat - stat2) < 1e-12
    assert abs(p - p2) < 1e-9


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(0.0, 1.0), min_size=1, max_size=60))
def test_bh_properties(p):
    p = np.array(p)
    adj = p_adjust(p, "fdr")
    assert (adj >= p - 1e-15).all()  # BH never decreases a p-value
    assert (adj <= 1.0 + 1e-15).all()
    # monotone: larger p never gets smaller adjusted value
    order = np.argsort(p, kind="mergesort")
    assert (np.diff(adj[order]) >= -1e-12).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(-100, 100), min_size=1, max_size=60))
def test_rank_average_is_permutation_sum(x):
    x = np.array(x)
    r = rankdata_average(x)
    # ranks always sum to n(n+1)/2 regardless of ties
    n = len(x)
    assert abs(r.sum() - n * (n + 1) / 2) < 1e-9
