"""Unit oracles for the round-5 analytics kernels: skyline dominance,
Mann-Whitney midrank algebra, mixture-sampling thresholds, CUSUM scan
algebra (scan form == literal recurrence)."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from ctas_ray.pipelines.queries import _skyline_2d  # noqa: E402


def _brute_skyline(price, qty):
    n = len(price)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if (
                (price[j] < price[i] and qty[j] >= qty[i])
                or (price[j] <= price[i] and qty[j] > qty[i])
            ):
                keep[i] = False
                break
    return keep


def test_skyline_matches_bruteforce():
    rng = np.random.RandomState(7)
    for trial in range(25):
        n = rng.randint(1, 60)
        # small value domain forces plenty of ties
        price = rng.randint(0, 8, n).astype(np.int64)
        qty = rng.randint(0, 8, n).astype(np.int64)
        got = _skyline_2d(price, qty)
        want = _brute_skyline(price, qty)
        assert (got == want).all(), (trial, price, qty)


def test_skyline_duplicates_all_kept():
    price = np.array([3, 3, 3], dtype=np.int64)
    qty = np.array([5, 5, 5], dtype=np.int64)
    assert _skyline_2d(price, qty).all()


def test_mannwhitney_midrank_identity():
    # U2_a + U2_b == 2 * n_a * n_b on the doubled grid, ties included
    rng = np.random.RandomState(11)
    for _ in range(20):
        a = rng.randint(0, 10, rng.randint(1, 30))
        b = rng.randint(0, 10, rng.randint(1, 30))
        vals = np.concatenate([a, b])
        who_a = np.r_[np.ones(len(a), bool), np.zeros(len(b), bool)]
        order = np.argsort(vals, kind="mergesort")
        vals, who_a = vals[order], who_a[order]
        uniq, counts = np.unique(vals, return_counts=True)
        cnt_lt = np.cumsum(counts) - counts
        two_mid = 2 * cnt_lt + counts + 1
        mid_of = dict(zip(uniq, two_mid))
        ranks2 = np.array([mid_of[v] for v in vals], dtype=np.int64)
        na, nb = int(who_a.sum()), int((~who_a).sum())
        u2a = int(ranks2[who_a].sum()) - na * (na + 1)
        u2b = int(ranks2[~who_a].sum()) - nb * (nb + 1)
        assert u2a + u2b == 2 * na * nb
        assert 0 <= u2a <= 2 * na * nb


def test_cusum_scan_equals_recurrence():
    rng = np.random.RandomState(3)
    for _ in range(20):
        y = rng.randint(-50, 50, rng.randint(1, 200)).astype(np.int64)
        c = np.cumsum(y)
        s_scan = c - np.minimum(np.minimum.accumulate(c), 0)
        s = 0
        s_ref = np.empty(len(y), np.int64)
        for i, v in enumerate(y):
            s = max(0, s + v)
            s_ref[i] = s
        assert (s_scan == s_ref).all()


def test_mixture_rate_caps():
    # a language whose share already exceeds its target must cap at 1.0
    total = 1000
    chars = {"en": 700, "zh": 300}
    weights = {"en": 10, "zh": 90}
    for lang, c in chars.items():
        target = total * weights[lang] // 100
        rate = min(10**9, target * 10**9 // c)
        assert 0 <= rate <= 10**9
    assert min(10**9, (total * 90 // 100) * 10**9 // 300) == 10**9


def test_rate_limit_window_counts_match_bruteforce():
    # searchsorted composite-key window == brute-force RANGE semantics
    # (all equal-timestamp peers included)
    rng = np.random.RandomState(5)
    W = 100
    for _ in range(15):
        n = rng.randint(1, 80)
        uid = np.sort(rng.randint(0, 4, n)).astype(np.int64)
        ts = np.sort(rng.randint(0, 500, n)).astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        dense = np.cumsum(np.r_[0, (uid[1:] != uid[:-1]).astype(np.int64)])
        rel = ts - ts.min()
        span = int(rel.max()) + W + 1
        key = dense * span + rel
        lo = np.searchsorted(key, dense * span + np.maximum(rel - W, 0),
                             side="left")
        hi = np.searchsorted(key, key, side="right")
        wc = hi - lo
        brute = np.array([
            int(((uid == uid[i]) & (ts >= ts[i] - W) & (ts <= ts[i])).sum())
            for i in range(n)
        ])
        assert (wc == brute).all()


def test_streak_islands_match_bruteforce():
    rng = np.random.RandomState(9)
    for _ in range(15):
        n = rng.randint(1, 60)
        v = rng.randint(0, 5, n).astype(np.int64)
        rising = np.r_[False, v[1:] > v[:-1]]
        island = np.cumsum(~rising)
        runs = np.bincount(island)[1:]
        # brute: walk the runs
        best, cur, cnt = 1, 1, 1
        for i in range(1, n):
            if v[i] > v[i - 1]:
                cur += 1
            else:
                cur = 1
                cnt += 1
            best = max(best, cur)
        assert runs.max() == best and len(runs) == cnt and runs.sum() == n
