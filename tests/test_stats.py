"""Unit tests for the R-semantics statistical kernels."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from ctas_ray.functions.stats import (
    auroc,
    ks_test,
    norm_sf,
    p_adjust,
    quantile_type7,
    rankdata_average,
)


class TestKS:
    def test_statistic_two_sided(self):
        x = np.array([1.0, 2.0, 3.0])
        y = np.array([1.5, 2.5, 3.5, 4.5])
        # ECDF difference: D = max |F1 - F2|
        stat, _ = ks_test(x, y, "two.sided")
        pool = np.sort(np.concatenate([x, y]))
        d = max(
            abs(np.mean(x <= t) - np.mean(y <= t)) for t in pool
        )
        assert stat == pytest.approx(d)

    def test_one_sided_statistics(self):
        x = np.array([10.0, 11, 12, 13])
        y = np.array([1.0, 2, 3, 4])
        # x stochastically larger: ECDF of x below ECDF of y
        stat_less, _ = ks_test(x, y, "less")
        stat_greater, _ = ks_test(x, y, "greater")
        assert stat_less == pytest.approx(1.0)
        assert stat_greater <= 0.0 + 1e-12

    def test_exact_p_matches_brute_force(self):
        # enumerate all orderings for small m, n and compare P(D >= d_obs)
        x = np.array([0.1, 0.5, 0.9])
        y = np.array([0.2, 0.4, 0.6, 0.8])
        m, n = len(x), len(y)
        stat, p = ks_test(x, y, "two.sided")

        def stat_of(assignment):
            # assignment: tuple of 0/1 in pooled sorted order (1 = from x)
            cum = 0.0
            best = 0.0
            for a in assignment:
                cum += 1.0 / m if a else -1.0 / n
                best = max(best, abs(cum))
            return best

        total = 0
        ge = 0
        for positions in itertools.combinations(range(m + n), m):
            assign = [1 if i in positions else 0 for i in range(m + n)]
            total += 1
            if stat_of(assign) >= stat - 1e-12:
                ge += 1
        assert p == pytest.approx(ge / total, abs=1e-12)

    def test_exact_p_one_sided_brute_force(self):
        x = np.array([0.15, 0.35, 0.95])
        y = np.array([0.2, 0.5, 0.7])
        m, n = len(x), len(y)
        stat, p = ks_test(x, y, "greater")

        def stat_of(assignment):
            cum, best = 0.0, 0.0
            for a in assignment:
                cum += 1.0 / m if a else -1.0 / n
                best = max(best, cum)
            return best

        total = ge = 0
        for positions in itertools.combinations(range(m + n), m):
            assign = [1 if i in positions else 0 for i in range(m + n)]
            total += 1
            if stat_of(assign) >= stat - 1e-12:
                ge += 1
        assert p == pytest.approx(ge / total, abs=1e-12)

    def test_asymptotic_branch_large(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, 200)
        y = rng.normal(0, 1, 200)  # m*n = 40000 >= 10^4 -> asymptotic
        stat, p = ks_test(x, y, "two.sided")
        assert 0.0 <= p <= 1.0
        # same distribution: p should not be tiny
        assert p > 0.01

    def test_identical_heavy_ties_no_nan_after_jitter(self):
        # mirror of reference test_features.R:10-29 — ties exist, but the
        # pipeline jitters upstream; here verify tie path returns finite p
        x = np.repeat([5.0], 100)
        y = np.repeat([50.0], 100)
        stat, p = ks_test(x, y, "two.sided")
        assert stat == pytest.approx(1.0)
        assert np.isfinite(p)

    def test_far_apart_tiny_p(self):
        rng = np.random.default_rng(1)
        x = rng.normal(5, 0.1, 50)
        y = rng.normal(50, 0.1, 60)
        stat, p = ks_test(x, y, "two.sided")
        assert stat == pytest.approx(1.0)
        assert p < 1e-10


class TestPAdjust:
    def test_bh_known_vector(self):
        # classic worked example
        p = np.array([0.001, 0.008, 0.039, 0.041, 0.042, 0.06])
        adj = p_adjust(p, "fdr")
        expect = np.array([0.006, 0.024, 0.0504, 0.0504, 0.0504, 0.06])
        np.testing.assert_allclose(adj, expect, rtol=1e-12)

    def test_bh_all_equal(self):
        p = np.array([0.01, 0.02, 0.03, 0.04])
        np.testing.assert_allclose(p_adjust(p, "BH"), [0.04, 0.04, 0.04, 0.04])

    def test_bonferroni(self):
        np.testing.assert_allclose(
            p_adjust(np.array([0.01, 0.4]), "bonferroni"), [0.02, 0.8]
        )

    def test_holm(self):
        # R: p.adjust(c(0.01, 0.02, 0.04), "holm") == c(0.03, 0.04, 0.04)
        np.testing.assert_allclose(
            p_adjust(np.array([0.01, 0.02, 0.04]), "holm"), [0.03, 0.04, 0.04]
        )

    def test_by(self):
        # BY = BH * sum(1/i)
        p = np.array([0.01, 0.02])
        bh = p_adjust(p, "BH")
        by = p_adjust(p, "BY")
        np.testing.assert_allclose(by, np.minimum(1.0, bh * 1.5))

    def test_none_and_nan(self):
        p = np.array([0.1, np.nan, 0.5])
        out = p_adjust(p, "none")
        assert np.isnan(out[1]) and out[0] == 0.1

    @staticmethod
    def _hommel_bruteforce(p: np.ndarray) -> np.ndarray:
        """Closed-testing definition: adj p_i = max over subsets I
        containing i of the Simes p-value of I. Exponential — oracle for
        tiny n only (Hommel 1988)."""
        import itertools

        n = len(p)
        out = np.zeros(n)
        for r in range(1, n + 1):
            for idx in itertools.combinations(range(n), r):
                sub = np.sort(p[list(idx)])
                simes = np.min(r * sub / np.arange(1, r + 1))
                for i in idx:
                    out[i] = max(out[i], simes)
        return out

    def test_hommel_vs_bruteforce(self):
        rng = np.random.default_rng(7)
        for n in (1, 2, 3, 5, 8):
            p = np.sort(rng.uniform(0.001, 0.9, size=n))
            rng.shuffle(p)
            np.testing.assert_allclose(
                p_adjust(p, "hommel"), self._hommel_bruteforce(p), rtol=1e-12
            )

    def test_hommel_known_vector(self):
        # R: p.adjust(c(0.01, 0.02, 0.04), "hommel") == c(0.03, 0.04, 0.04)
        np.testing.assert_allclose(
            p_adjust(np.array([0.01, 0.02, 0.04]), "hommel"), [0.03, 0.04, 0.04]
        )
        # hommel is uniformly <= hochberg <= holm (known dominance)
        p = np.array([0.011, 0.02, 0.031, 0.2, 0.5, 0.6])
        hom = p_adjust(p, "hommel")
        hoch = p_adjust(p, "hochberg")
        holm = p_adjust(p, "holm")
        assert (hom <= hoch + 1e-15).all() and (hoch <= holm + 1e-15).all()


class TestSmall:
    def test_auroc_hand(self):
        # perfect separation: positives have smaller distance
        score = np.array([1.0, 2.0, 10.0, 11.0])
        positive = np.array([1, 1, 0, 0])
        # reference formula: rank(-score) = [4,3,2,1]; U over negatives = 0
        # -> 1.0 when positives have the SMALLER scores (as with distances:
        # same-site subjects nearby => high own-site similarity)
        assert auroc(score, positive) == pytest.approx(1.0)
        assert auroc(-score, positive) == pytest.approx(0.0)

    def test_auroc_ties(self):
        score = np.array([1.0, 1.0, 1.0, 1.0])
        positive = np.array([1, 0, 1, 0])
        assert auroc(score, positive) == pytest.approx(0.5)

    def test_rank_average_ties(self):
        np.testing.assert_allclose(
            rankdata_average(np.array([10.0, 20.0, 20.0, 30.0])), [1, 2.5, 2.5, 4]
        )

    def test_norm_sf(self):
        assert norm_sf(1.959963984540054) == pytest.approx(0.025, abs=1e-9)
        assert norm_sf(0.0) == pytest.approx(0.5)

    def test_quantile_type7(self):
        x = np.array([1.0, 2.0, 3.0, 4.0])
        # R: quantile(1:4, .25) = 1.75 (type 7)
        assert quantile_type7(x, 0.25) == pytest.approx(1.75)
        assert quantile_type7(x, 0.75) == pytest.approx(3.25)
