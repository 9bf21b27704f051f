"""Gorilla codec round-trip property tests (FIXTURES.md §B5)."""

from __future__ import annotations

import numpy as np
import pytest

from ctas_ray.functions.codec import decode_series, encode_series


def roundtrip(ts, vals):
    blob = encode_series(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, vals2 = decode_series(blob)
    np.testing.assert_array_equal(ts2, np.asarray(ts, np.int64))
    # bit-exact comparison (covers NaN payloads, -0.0, denormals)
    np.testing.assert_array_equal(
        vals2.view(np.uint64), np.asarray(vals, np.float64).view(np.uint64)
    )
    return blob


def test_empty():
    blob = roundtrip([], [])
    assert len(blob) == 12


def test_single_point():
    roundtrip([1_700_000_000_000_000], [3.14159])


def test_constant_run_compresses():
    n = 1000
    ts = 1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 60_000_000
    vals = np.full(n, 42.0)
    blob = roundtrip(ts, vals)
    # v2 SoA layout: constant runs cost one 2-bit code per point per
    # stream (4 bits/pt total) — the deliberate trade for the fully
    # vectorized decode (13x throughput; codec.py module docstring)
    assert len(blob) < 40 + n
    # legacy v1 keeps the 1-bit zero-run floor (~2 bits/pt total)
    from ctas_ray.functions.codec import encode_series

    assert len(encode_series(ts, vals, version=1)) < 16 + n // 2


def test_irregular_gaps_and_noise():
    rng = np.random.default_rng(0)
    n = 500
    ts = np.cumsum(rng.integers(1, 10**9, size=n)).astype(np.int64)
    vals = rng.normal(0, 1e6, n)
    roundtrip(ts, vals)


def test_nan_runs_negative_zero_denormals():
    vals = np.array(
        [0.0, -0.0, np.nan, np.nan, np.inf, -np.inf, 5e-324, -5e-324, 1.0, np.nan]
    )
    ts = np.arange(10, dtype=np.int64) * 1000
    roundtrip(ts, vals)


def test_nan_payload_preserved():
    # two different NaN bit patterns must round-trip exactly
    a = np.array([np.uint64(0x7FF8000000000001), np.uint64(0x7FF8DEADBEEF0000)])
    vals = a.view(np.float64)
    roundtrip(np.array([0, 1], dtype=np.int64), vals)


def test_non_monotonic_and_duplicate_ts():
    ts = np.array([100, 100, 50, 200, 199], dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    roundtrip(ts, vals)


def test_extreme_timestamps():
    ts = np.array([-(2**62), 2**62, 0, 1], dtype=np.int64)
    roundtrip(ts, np.array([1.0, 2.0, 3.0, 4.0]))


def test_random_property_sweep():
    rng = np.random.default_rng(42)
    for trial in range(20):
        n = int(rng.integers(1, 200))
        ts = np.cumsum(rng.integers(-(10**6), 10**7, size=n)).astype(np.int64)
        vals = rng.normal(0, 10.0 ** float(rng.integers(-300, 300)), n)
        mask = rng.random(n) < 0.3
        vals[mask] = np.nan
        roundtrip(ts, vals)


def test_compression_ratio_on_regular_series():
    n = 10_000
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    rng = np.random.default_rng(1)
    # slowly-varying values (typical rollup output)
    vals = np.round(np.cumsum(rng.normal(0, 0.1, n)), 2)
    blob = encode_series(ts, vals)
    raw = n * 16
    assert len(blob) < raw * 0.55  # beats raw comfortably


class TestPerStreamRaw:
    """Per-stream raw flags (r02): mixed raw/encoded stream combinations
    must round-trip exactly, including NaN payloads in a raw value
    stream and the legacy whole-blob raw marker."""

    def test_mixed_raw_combinations(self):
        import numpy as np

        from ctas_ray.functions.codec import decode_series, encode_series

        rng = np.random.default_rng(17)
        n = 5000
        ts_random = np.sort(rng.integers(0, 2**60, n)).astype(np.int64)
        ts_smooth = np.arange(n, dtype=np.int64) * 60_000_000
        v_random = rng.random(n)
        v_smooth = np.round(np.sin(np.arange(n) / 100.0), 1)
        v_nan = v_random.copy()
        v_nan[::7] = np.nan
        for ts in (ts_random, ts_smooth):
            for vals in (v_random, v_smooth, v_nan):
                blob = encode_series(ts, vals)
                ts2, v2 = decode_series(blob)
                assert np.array_equal(ts2, ts)
                assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))

    def test_legacy_whole_raw_marker_decodes(self):
        import numpy as np

        from ctas_ray.functions.codec import _RAW_MARKER, decode_series

        n = 100
        ts = np.arange(n, dtype=np.int64)
        vals = np.linspace(0, 1, n)
        blob = n.to_bytes(4, "little") + _RAW_MARKER + ts.tobytes() + vals.tobytes()
        ts2, v2 = decode_series(blob)
        assert np.array_equal(ts2, ts) and np.array_equal(v2, vals)

    def test_worst_case_throughput_floor(self):
        """Coarse regression floor: the slowest encode shape must stay
        well above the round-1 0.5M pts/s loop (threshold lax for CI
        noise; the measured rate is ~2.1M pts/s)."""
        import time

        import numpy as np

        from ctas_ray.functions.codec import encode_series

        rng = np.random.default_rng(3)
        n = 100_000
        ts = np.arange(n, dtype=np.int64) * 30_000_000
        vals = np.round(np.cumsum(rng.normal(size=n)), 3)
        encode_series(ts[:1000], vals[:1000])  # warm
        best = min(
            (lambda t0: (encode_series(ts, vals), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        assert n / best > 1_000_000, f"{n/best:.0f} pts/s"


class TestBatchEncode:
    def test_batch_byte_identical_to_single(self):
        import numpy as np
        from ctas_ray.functions.codec import encode_series, encode_series_batch

        rng = np.random.default_rng(42)

        def rand_series(kind, n):
            if kind == 0:  # regular
                ts = (np.arange(n) * 60_000_000 + int(rng.integers(0, 10**12))).astype(np.int64)
                v = np.round(np.sin(np.arange(n) / 50), 2) * 100
            elif kind == 1:  # incompressible
                ts = np.cumsum(rng.integers(1, 10**9, n)).astype(np.int64)
                v = rng.normal(size=n)
            elif kind == 2:  # constant
                ts = (np.arange(n) * 1000).astype(np.int64)
                v = np.full(n, 7.25)
            elif kind == 3:  # NaN / -0.0 / denormal / inf mix
                ts = np.cumsum(rng.integers(1, 10**6, n)).astype(np.int64)
                v = rng.choice([np.nan, -0.0, 5e-324, 1.5, np.inf, -np.inf], size=n)
            else:  # mixed compressibility
                ts = np.cumsum(rng.integers(1, 3000, n)).astype(np.int64)
                v = np.where(rng.random(n) < 0.7, 3.5, rng.normal(size=n))
            return ts, np.asarray(v, dtype=np.float64)

        for trial in range(10):
            S = int(rng.integers(1, 30))
            series = [rand_series(int(rng.integers(0, 5)), int(rng.integers(1, 300)))
                      for _ in range(S)]
            ts_all = np.concatenate([t for t, _ in series])
            v_all = np.concatenate([v for _, v in series])
            starts = np.r_[0, np.cumsum([len(t) for t, _ in series])[:-1]].astype(np.int64)
            blobs = encode_series_batch(ts_all, v_all, starts)
            for i, (t, v) in enumerate(series):
                assert blobs[i] == encode_series(t, v), f"trial {trial} series {i}"

    def test_batch_edge_cases(self):
        import numpy as np
        from ctas_ray.functions.codec import encode_series, encode_series_batch

        # single one-point segment
        b = encode_series_batch(np.array([5], dtype=np.int64), np.array([1.0]), np.array([0]))
        assert b[0] == encode_series(np.array([5], dtype=np.int64), np.array([1.0]))
        # empty batch
        assert encode_series_batch(np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64)) == []


def test_v1_blobs_still_decode():
    # store compatibility: blobs written before the v2 layout flip must
    # keep decoding bit-exactly through the legacy per-point reader
    rng = np.random.default_rng(7)
    n = 2000
    ts = np.cumsum(rng.integers(1, 10**8, size=n)).astype(np.int64)
    vals = np.round(rng.normal(0, 100, n), 1)
    vals[::17] = np.nan
    from ctas_ray.functions.codec import decode_series, encode_series

    t1, v1 = decode_series(encode_series(ts, vals, version=1))
    t2, v2 = decode_series(encode_series(ts, vals))
    assert np.array_equal(t1, ts) and np.array_equal(t2, ts)
    assert np.array_equal(v1.view(np.uint64), vals.view(np.uint64))
    assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))
