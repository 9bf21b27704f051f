"""Property tests for the Arrow-native verify-exchange helpers
(stages/dedup.py): blob buffer views, id lookups, pair dedup, hashing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ctas_ray.stages.dedup import (
    _blob_matrix,
    _blob_u64_views,
    _hash_part,
    _index_in,
    _unique_pairs,
)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(1, 40),  # rows
    st.integers(1, 8),   # uint64 words per row
    st.booleans(),       # large_binary vs binary
    st.integers(0, 5),   # slice offset
)
def test_blob_matrix_roundtrip(n, w, large, off):
    rng = np.random.default_rng(n * 100 + w)
    mat = rng.integers(0, 2**63, (n, w), dtype=np.uint64)
    t = pa.binary() if not large else pa.large_binary()
    arr = pa.array([row.tobytes() for row in mat], type=t)
    off = min(off, n - 1)
    sliced = arr.slice(off)
    got = _blob_matrix(sliced, np.uint64)
    assert got.shape == (n - off, w)
    assert (got == mat[off:]).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 6), min_size=1, max_size=20))
def test_blob_u64_views_variable_rows(lens):
    rng = np.random.default_rng(sum(lens) + len(lens))
    rows = [rng.integers(0, 2**63, k, dtype=np.uint64) for k in lens]
    arr = pa.array([r.tobytes() for r in rows], type=pa.large_binary())
    u, off = _blob_u64_views(arr)
    for i, r in enumerate(rows):
        assert (u[off[i] : off[i + 1]] == r).all()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=30),
    st.lists(st.integers(-(2**40), 2**40), min_size=0, max_size=30),
)
def test_index_in_matches_pandas(keys, queries):
    keys = np.array(sorted(set(keys)), dtype=np.int64)
    q = np.array(queries, dtype=np.int64)
    got = _index_in(keys, q)
    want = pd.Index(keys).get_indexer(q) if len(keys) and len(q) else np.full(
        len(q), -1, np.int64
    )
    assert (got == want).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), max_size=60))
def test_unique_pairs_is_set_semantics(pairs):
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    ua, ub = _unique_pairs(a, b)
    assert set(zip(ua, ub)) == set(pairs)
    assert len(ua) == len(set(pairs))


def test_hash_part_deterministic_and_in_range():
    ids = np.arange(10_000, dtype=np.int64)
    p1 = _hash_part(64, ids)
    p2 = _hash_part(64, ids.copy())
    assert (p1 == p2).all()
    assert p1.min() >= 0 and p1.max() < 64
    # reasonably uniform: no partition holds > 3x the mean
    counts = np.bincount(p1, minlength=64)
    assert counts.max() < 3 * counts.mean()
    # pair hashing differs from single-id hashing and is order-sensitive
    q1 = _hash_part(64, ids, ids[::-1])
    q2 = _hash_part(64, ids[::-1], ids)
    assert (q1 != p1).any() and (q1 != q2).any()


def test_hash_part_string_ids():
    ids = np.array([f"doc{i}" for i in range(500)], dtype=object)
    p = _hash_part(16, ids)
    assert p.min() >= 0 and p.max() < 16
    assert (p == _hash_part(16, ids)).all()
