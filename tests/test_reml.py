"""Exact one-level REML (VERDICT r4 item 7): pin reml_one_way against
literal REML math — the balanced-design closed form, the profiled-score
root condition, and the BLUP/PEV identities."""

from __future__ import annotations

import numpy as np
import pytest

from ctas_ray.functions.stats import reml_one_way


def _neg2_restricted_ll(lam, n_i, mean_i, ssw):
    """Literal profiled -2 restricted log-likelihood (up to constants):
    (n-1) ln Q + sum ln(1+lam n_i) + ln W — written directly from the
    definition, NOT in the solver's moment form."""
    n = n_i.sum()
    w = n_i / (1.0 + lam * n_i)
    W = w.sum()
    mu = (w * mean_i).sum() / W
    Q = ssw + (w * (mean_i - mu) ** 2).sum()
    return (n - 1) * np.log(Q) + np.log1p(lam * n_i).sum() + np.log(W)


def _balanced_fixture():
    rng = np.random.default_rng(5)
    q, n_per = 8, 25
    site_eff = rng.normal(0, 3.0, q)
    y = []
    for i in range(q):
        y.append(10.0 + site_eff[i] + rng.normal(0, 2.0, n_per))
    y = np.stack(y)  # (q, n_per)
    n_i = np.full(q, n_per, dtype=float)
    mean_i = y.mean(axis=1)
    ssw = float(((y - mean_i[:, None]) ** 2).sum())
    return n_i, mean_i, ssw, y


def test_balanced_matches_anova_closed_form():
    """For a balanced one-way layout REML == the ANOVA estimators:
    sigma2 = MSE, tau2 = (MSB - MSE)/n_per (when positive)."""
    n_i, mean_i, ssw, y = _balanced_fixture()
    q, n_per = y.shape
    n = q * n_per
    fit = reml_one_way(n_i, mean_i, ssw)
    mse = ssw / (n - q)
    grand = y.mean()
    msb = n_per * ((mean_i - grand) ** 2).sum() / (q - 1)
    assert fit["tau2"] > 0
    assert fit["sigma2"] == pytest.approx(mse, rel=1e-9)
    assert fit["tau2"] == pytest.approx((msb - mse) / n_per, rel=1e-9)
    # mu is the GLS mean == grand mean under balance
    assert fit["mu"] == pytest.approx(grand, rel=1e-12)


def test_unbalanced_root_minimizes_restricted_likelihood():
    """Unbalanced layout: the solved lambda is a stationary minimum of
    the literal restricted likelihood — perturbing lambda in either
    direction increases it, and a coarse grid finds no better value."""
    rng = np.random.default_rng(11)
    n_i = np.array([5, 40, 12, 33, 7, 21], dtype=float)
    mean_i = rng.normal(50, 4.0, len(n_i))
    ssw = float((n_i - 1).sum() * 9.0)
    fit = reml_one_way(n_i, mean_i, ssw)
    lam = fit["lam"]
    assert lam > 0
    base = _neg2_restricted_ll(lam, n_i, mean_i, ssw)
    for bump in (1e-4, 1e-3, 1e-2):
        assert _neg2_restricted_ll(lam * (1 + bump), n_i, mean_i, ssw) >= base
        assert _neg2_restricted_ll(lam * (1 - bump), n_i, mean_i, ssw) >= base
    grid = np.geomspace(1e-6, 1e4, 400)
    assert min(_neg2_restricted_ll(g, n_i, mean_i, ssw) for g in grid) >= base - 1e-9


def test_boundary_zero_when_no_between_variance():
    """Identical group means -> tau2 pinned at 0 and all BLUPs 0."""
    n_i = np.array([10, 20, 30], dtype=float)
    mean_i = np.array([5.0, 5.0, 5.0])
    fit = reml_one_way(n_i, mean_i, ssw=57.0)
    assert fit["lam"] == 0.0 and fit["tau2"] == 0.0
    assert np.all(fit["blup"] == 0.0)


def test_blup_and_pev_identities():
    """Given the fitted (sigma2, tau2): BLUPs equal the literal
    shrinkage formula and PEV equals the conditional variance plus the
    GLS-mean propagation term."""
    n_i, mean_i, ssw, _ = _balanced_fixture()
    fit = reml_one_way(n_i, mean_i, ssw)
    s2, t2, mu = fit["sigma2"], fit["tau2"], fit["mu"]
    d = s2 + n_i * t2
    np.testing.assert_allclose(fit["blup"], t2 * n_i * (mean_i - mu) / d, rtol=1e-12)
    W = (n_i / (1.0 + fit["lam"] * n_i)).sum()
    pev = t2 * s2 / d + (t2 * n_i / d) ** 2 * (s2 / W)
    np.testing.assert_allclose(fit["blup_sd"] ** 2, pev, rtol=1e-12)


def test_contract_query_values(ray_session):
    """site_reml_blups at sf0.001: interior root on every parameter
    (planted site effect), BLUPs sum to ~0 under near-balance, schema
    stable."""
    from ctas_ray.pipelines.queries import site_reml_blups

    out = site_reml_blups("/root/testdata/sf0.001")
    assert list(out.columns) == [
        "parameter_id", "site", "n_obs", "blup_e6", "blup_sd_e6",
        "mu_e6", "sigma2_e6", "tau2_e6",
    ]
    per_param = out.groupby("parameter_id")
    assert (per_param["tau2_e6"].first() > 0).all()
    # shrunk effects of a planted linear site gradient: monotone-ish,
    # mean near zero relative to their spread
    for _, g in per_param:
        b = g.sort_values("site")["blup_e6"].to_numpy()
        assert abs(b.mean()) < 0.1 * (b.max() - b.min())
