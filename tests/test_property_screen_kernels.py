"""Property tests for the segment-vectorized screening kernels
(pipelines/queries.py): the reduceat/cumsum implementations must equal
a naive per-group brute force on arbitrary inputs."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")


def _frame(values: list[float], groups: list[int]) -> pd.DataFrame:
    n = len(values)
    return pd.DataFrame(
        {
            "event_type": np.asarray([f"p{g % 2}" for g in groups], dtype=object),
            "user_id": np.asarray([g // 2 for g in groups], dtype=np.int64),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": np.asarray(values, dtype=np.float64),
        }
    )


vals = st.lists(
    st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=1, max_size=60
)
grps = st.integers(min_value=0, max_value=5)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(-1e3, 1e3, allow_nan=False), grps),
                min_size=1, max_size=80))
def test_cusum_matches_bruteforce(pairs):
    from ctas_ray.pipelines.queries import _cusum_partition, _scaled_int

    df = _frame([p[0] for p in pairs], [p[1] for p in pairs])
    out = _cusum_partition(df)
    ref_rows = {}
    g = df.sort_values(["event_type", "user_id", "ts", "event_id"])
    for (et, uid), sub in g.groupby(["event_type", "user_id"]):
        vq = _scaled_int(sub["value"].to_numpy())
        n = len(vq)
        prefix = np.cumsum(vq)
        total = int(prefix[-1])
        amps = [abs(n * int(prefix[t]) - (t + 1) * total) for t in range(n)]
        best = max(amps)
        ref_rows[(et, str(uid))] = (amps.index(best) + 1, best)
    assert len(out) == len(ref_rows)
    for r in out.itertuples():
        cp, amp = ref_rows[(r.parameter_id, r.subject_id)]
        assert (r.changepoint, r.cusum_scaled) == (cp, amp)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(-1e3, 1e3, allow_nan=False), grps),
                min_size=4, max_size=80))
def test_flags_match_bruteforce(pairs):
    from ctas_ray.pipelines.queries import _flags_partition

    df = _frame([p[0] for p in pairs], [p[1] for p in pairs])
    out = _flags_partition(df)
    g = df.sort_values(["event_type", "user_id", "ts", "event_id"])
    ref = {}
    for (et, uid), sub in g.groupby(["event_type", "user_id"]):
        x = sub["value"].to_numpy()
        n = len(x)
        if n < 4:
            continue
        runs, cur = [1], 1
        for i in range(1, n):
            cur = cur + 1 if x[i] == x[i - 1] else 1
            runs.append(cur)
        max_run = max(runs)
        h = n // 2
        r1 = x[:h].max() - x[:h].min()
        r2 = x[h:].max() - x[h:].min()
        ref[(et, str(uid))] = (
            n, max_run, int(max_run * 2 >= n),
            int(r2 > 2.0 * r1 or r1 > 2.0 * r2),
        )
    assert len(out) == len(ref)
    for r in out.itertuples():
        assert ref[(r.parameter_id, r.subject_id)] == (
            r.n, r.max_run, r.repeated_flag, r.range_shift_flag
        )


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.floats(-1e3, 1e3, allow_nan=False), grps),
                min_size=1, max_size=80))
def test_ewma_matches_scalar_fold(pairs):
    from ctas_ray.pipelines.queries import _ewma_partition

    df = _frame([p[0] for p in pairs], [p[1] for p in pairs])
    out = _ewma_partition(df)
    g = df.sort_values(["event_type", "user_id", "ts", "event_id"])
    ref = {}
    for (et, uid), sub in g.groupby(["event_type", "user_id"]):
        vals_ = sub["value"].to_numpy()
        acc = vals_[0]
        for x in vals_[1:]:
            acc = 0.25 * x + 0.75 * acc
        ref[(et, str(uid))] = int(np.floor(acc * 1e6 + 0.5))
    assert len(out) == len(ref)
    for r in out.itertuples():
        assert ref[(r.parameter_id, r.subject_id)] == r.ewma_e6
