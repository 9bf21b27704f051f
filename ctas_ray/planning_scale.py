"""Scalable series planning — the 10^12-turn version of
:mod:`ctas_ray.planning`.

The classic planner materializes, per parameter, a (subjects x ranks)
presence matrix and ';'-packed subject lists (fine for clinical-study
sizes, impossible at 10^8 conversations). This module computes the SAME
acceptance decisions from O(#presence rows) work using an interval
decomposition:

For a subject with measurement positions p_1 < ... < p_m in the
parameter's rank order, its cumulative count at prefix k is
cum(k) = #{p_j <= k}. The subject is eligible at prefix k iff
cum(k) >= need(k), need(k) = ceil((1 - max_share_missing) * k)
(R/ctas.R:922-927). Since need is nondecreasing, {k : need(k) <= j} is
a prefix [1, K_j], so the subject's eligible-k set is the union of
intervals [p_j, min(p_{j+1}-1, K_j)] — O(m) boundary deltas per
subject instead of O(n_ranks) columns. Summing deltas over all subjects
and cumsum-ing yields n_eligible(k) for EVERY prefix in one pass; the
reference's acceptance walk (R/ctas.R:938-945) then runs driver-side on
that tiny vector.

Phase C converts acceptance back to membership: each subject gets a
bitmask over the accepted combos (bit i set iff eligible at k_i),
emitted as a (parameter_id, subject_id, mask) Dataset that the feature
explode stage JOINS instead of broadcasting packed subject strings.

Results are identical to the classic planner (parity-tested).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = [
    "need_inverse",
    "subject_eligibility_deltas",
    "eligible_counts_from_deltas",
    "acceptance_walk",
    "subject_combo_mask",
]


def _need(k: np.ndarray | int, max_share_missing: float) -> np.ndarray | int:
    # same IEEE chain as R's ceiling((1 - msm) * k)
    if isinstance(k, np.ndarray):
        return np.ceil((1.0 - max_share_missing) * k).astype(np.int64)
    return math.ceil((1.0 - max_share_missing) * k)


def need_inverse(n_ranks: int, max_share_missing: float) -> np.ndarray:
    """K[j] = max prefix length k (1-based) with need(k) <= j, for
    j = 0..n_ranks (K[j] = 0 when none). Vectorized over all k."""
    ks = np.arange(1, n_ranks + 1)
    needs = _need(ks, max_share_missing)  # nondecreasing in k
    # for each j: #k with need(k) <= j == max such k (needs nondecreasing)
    return np.searchsorted(needs, np.arange(n_ranks + 1), side="right").astype(np.int64)


def subject_eligibility_deltas(
    positions: np.ndarray, K: np.ndarray, n_ranks: int
) -> tuple[np.ndarray, np.ndarray]:
    """Eligible-interval boundary deltas for ONE subject.

    ``positions``: 1-based sorted measurement positions in rank order
    (duplicates allowed — a (subject, rank) may count twice when both
    baseline-flag variants exist, mirroring the reference's n() over
    the distinct-with-flag table).

    Returns (ks, deltas): +1 at interval starts, -1 one past interval
    ends, over k in [1, n_ranks].
    """
    m = len(positions)
    if m == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ks: list[int] = []
    ds: list[int] = []
    last_K = len(K) - 1
    for j in range(1, m + 1):
        lo = positions[j - 1]  # cum >= j from this position on
        hi = positions[j] - 1 if j < m else n_ranks  # until next position
        hi = min(hi, int(K[min(j, last_K)]))  # and while need(k) <= j
        if lo <= hi:
            ks.append(lo)
            ds.append(1)
            if hi + 1 <= n_ranks:
                ks.append(hi + 1)
                ds.append(-1)
    return np.asarray(ks, dtype=np.int64), np.asarray(ds, dtype=np.int64)


def eligible_counts_from_deltas(
    ks: np.ndarray, deltas: np.ndarray, n_ranks: int
) -> np.ndarray:
    """n_eligible[k] for k = 1..n_ranks from aggregated deltas."""
    acc = np.zeros(n_ranks + 2, dtype=np.int64)
    np.add.at(acc, ks, deltas)
    return np.cumsum(acc)[1 : n_ranks + 1]


def acceptance_walk(
    n_eligible: np.ndarray,
    time_point_count_min: float,
    subject_count_min: float,
    optimize: bool = False,
    n_sites_per_k: np.ndarray | None = None,
) -> list[int]:
    """The reference's prefix acceptance rule (R/ctas.R:915-945) on the
    precomputed eligibility vector; returns accepted prefix lengths in
    emission order (longest first)."""
    n_ranks = len(n_eligible)
    if n_ranks < time_point_count_min:
        return []
    tp_max = math.inf
    if optimize and n_sites_per_k is not None:
        # get_max_sites_and_subjects (R/ctas.R:985-1039)
        best = None
        for k in range(n_ranks, int(time_point_count_min) - 1, -1):
            n_subj = int(n_eligible[k - 1])
            if n_subj < subject_count_min:
                continue
            cand = (int(n_sites_per_k[k - 1]), n_subj, k)
            if best is None or cand > best:
                best = cand
        tp_max = best[2] if best else math.inf
    accepted: list[int] = []
    prev = 0
    for k in range(n_ranks, int(time_point_count_min) - 1, -1):
        num = int(n_eligible[k - 1])
        if num < subject_count_min:
            continue
        if (
            prev == 0
            or (num - prev >= subject_count_min and num / prev >= 1.2)
            or (optimize and num - prev >= subject_count_min and num > prev and k == tp_max)
        ):
            accepted.append(k)
            prev = num
    return accepted


def subject_combo_mask(
    positions: np.ndarray, K: np.ndarray, accepted_ks: list[int]
) -> int:
    """Bitmask over accepted combos for one subject: bit i set iff the
    subject is eligible at prefix accepted_ks[i]. O(m + #combos)."""
    m = len(positions)
    mask = 0
    last_K = len(K) - 1
    for i, k in enumerate(accepted_ks):
        # cum(k) = #positions <= k  (positions sorted)
        cum = int(np.searchsorted(positions, k, side="right"))
        if cum >= 1 and K[min(cum, last_K)] >= k:
            mask |= 1 << i
    return mask
