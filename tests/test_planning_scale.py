"""Interval-based scalable planner vs the classic matrix planner —
identical acceptance decisions and memberships on randomized inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.planning import order_timepoint_ranks, pick_timepoint_combos
from ctas_ray.planning_scale import (
    acceptance_walk,
    eligible_counts_from_deltas,
    need_inverse,
    subject_combo_mask,
    subject_eligibility_deltas,
)


def _random_presence(seed, n_subj=40, n_ranks=25, p=0.6, dup_p=0.1):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_subj):
        for r in range(1, n_ranks + 1):
            if rng.random() < p:
                rows.append((f"s{s:03d}", float(r), "No"))
                if rng.random() < dup_p:
                    rows.append((f"s{s:03d}", float(r), "Yes"))
    df = pd.DataFrame(rows, columns=["subject_id", "timepoint_rank", "has_baseline_value"])
    df["parameter_id"] = "p1"
    return df


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("msm", [0.0, 0.3, 0.5, 1.0])
@pytest.mark.parametrize("tp_min,subj_min", [(3, 3), (1, 2), (8, 5)])
def test_vector_planner_matches_classic(seed, msm, tp_min, subj_min):
    pres = _random_presence(seed)
    classic = pick_timepoint_combos(
        "consecutive", pres, tp_min, subj_min, msm, "original"
    )

    # --- vector path ---
    rank_order = order_timepoint_ranks(pres, "consecutive")
    n_ranks = len(rank_order)
    pos_of_rank = {r: i + 1 for i, r in enumerate(rank_order)}
    K = need_inverse(n_ranks, msm)
    all_ks, all_ds = [], []
    subj_positions = {}
    for subj, grp in pres.groupby("subject_id"):
        positions = np.sort(grp["timepoint_rank"].map(pos_of_rank).to_numpy())
        subj_positions[subj] = positions
        ks, ds = subject_eligibility_deltas(positions, K, n_ranks)
        all_ks.append(ks)
        all_ds.append(ds)
    n_eligible = eligible_counts_from_deltas(
        np.concatenate(all_ks), np.concatenate(all_ds), n_ranks
    )
    accepted = acceptance_walk(n_eligible, tp_min, subj_min)

    # same combos in the same emission order
    expect_combos = classic["timepoint_combo"].tolist()
    got_combos = [
        ";".join(str(int(r)) for r in rank_order[:k]) for k in accepted
    ]
    assert got_combos == expect_combos

    # same memberships via the bitmask
    for i, (_, crow) in enumerate(classic.iterrows()):
        expect_members = set(crow["timepoint_combo_subjects"].split(";"))
        got_members = {
            s for s, p in subj_positions.items()
            if subject_combo_mask(p, K, accepted) & (1 << i)
        }
        assert got_members == expect_members, (i, msm, seed)


def test_eligible_counts_brute_force():
    rng = np.random.default_rng(9)
    n_ranks = 15
    msm = 0.4
    K = need_inverse(n_ranks, msm)
    import math

    for _ in range(50):
        m = int(rng.integers(1, 20))
        positions = np.sort(rng.integers(1, n_ranks + 1, size=m))
        ks, ds = subject_eligibility_deltas(positions, K, n_ranks)
        vec = eligible_counts_from_deltas(ks, ds, n_ranks)
        for k in range(1, n_ranks + 1):
            cum = int(np.searchsorted(positions, k, side="right"))
            need = math.ceil((1 - msm) * k)
            expect = 1 if (cum >= need and cum >= 1) else 0
            assert vec[k - 1] == expect, (positions, k)


def test_adaptive_ordering_compatible():
    # vector planner on the adaptive rank order gives classic's combos
    pres = _random_presence(5)
    rank_order = order_timepoint_ranks(pres, "adaptive")
    classic = pick_timepoint_combos("adaptive", pres, 3, 3, 0.5, "original")
    n_ranks = len(rank_order)
    pos_of_rank = {r: i + 1 for i, r in enumerate(rank_order)}
    K = need_inverse(n_ranks, 0.5)
    all_ks, all_ds = [], []
    for _, grp in pres.groupby("subject_id"):
        positions = np.sort(grp["timepoint_rank"].map(pos_of_rank).to_numpy())
        ks, ds = subject_eligibility_deltas(positions, K, n_ranks)
        all_ks.append(ks)
        all_ds.append(ds)
    n_eligible = eligible_counts_from_deltas(
        np.concatenate(all_ks), np.concatenate(all_ds), n_ranks
    )
    accepted = acceptance_walk(n_eligible, 3, 3)
    got = [
        ";".join(str(int(r)) for r in np.sort(rank_order[:k])) for k in accepted
    ]
    assert got == classic["timepoint_combo"].tolist()
