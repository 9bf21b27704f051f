"""KS site-scoring edge cases — ports of the reference's
tests/testthat/test_features.R:10-29 (B3 fixture) and the one-sided
alternative selection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.study_core import score_sites_ks


def _two_site_group(mu_a=5.0, mu_b=50.0, sd=0.1, n=1000, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for site, mu in (("A", mu_a), ("B", mu_b)):
        vals = rng.normal(mu, sd, n)
        for i, v in enumerate(vals):
            rows.append(
                {"subject_id": f"{site}{i:04d}", "value": v, "site": site,
                 "country": "c1", "region": "r1"}
            )
    return pd.DataFrame(rows)


class TestTwoSiteKS:
    def test_no_nan_pvalues_heavy_data(self):
        # B3: 2 x 1000 near-constant values; jitter + 1e-100 patch paths
        g = _two_site_group()
        out = score_sites_ks(g, "average", "global", jitter_sd=1e-5, jitter_seed=1)
        assert len(out) == 2
        # p may underflow to exactly 0.0 (as in R; -log10 capped to 30
        # downstream) but must never be NaN
        assert out["pvalue_kstest"].notna().all()
        # the -log10 cap path turns p=0 into logp=30 (R/ctas.R:223-225)
        from ctas_ray.functions.stats import p_adjust
        from ctas_ray.study_core import finalize_ks_scores

        out2 = out.copy()
        out2["timeseries_id"] = "t"
        out2["feature"] = "average"
        out2["ref_group"] = "global"
        final = finalize_ks_scores(out2, p_adjust, "fdr")
        assert np.isfinite(final["pvalue_kstest_logp"]).all()
        assert (final["pvalue_kstest_logp"] <= 30.0).all()

    def test_identical_constant_values_patched(self):
        # all values identical -> after NO jitter, D=1? actually D=0 for
        # identical distributions; with heavy ties p must still be finite
        g = _two_site_group(mu_a=5, mu_b=5, sd=0.0)
        out = score_sites_ks(g, "average", "global", jitter_sd=0.0)
        assert out["pvalue_kstest"].notna().all()

    def test_separated_sites_tiny_p(self):
        g = _two_site_group()
        out = score_sites_ks(g, "average", "global", jitter_sd=1e-5, jitter_seed=1)
        assert (out["kstest_statistic"] > 0.99).all()
        assert (out["pvalue_kstest"] < 1e-50).all()

    def test_subject_count_column(self):
        g = _two_site_group(n=50)
        out = score_sites_ks(g, "average", "global", jitter_sd=0.0)
        assert (out["subj_count"] == 50).all()

    def test_ref_group_country_excludes_own_site(self):
        g = _two_site_group(n=30)
        # both sites share country c1: country ref == global here
        a = score_sites_ks(g, "average", "country", jitter_sd=0.0)
        b = score_sites_ks(g, "average", "global", jitter_sd=0.0)
        np.testing.assert_allclose(
            a.sort_values("site")["kstest_statistic"],
            b.sort_values("site")["kstest_statistic"],
        )

    def test_site_without_reference_skipped(self):
        # single site in its own country under 'country' ref -> no rows
        g = _two_site_group(n=20)
        g.loc[g["site"] == "A", "country"] = "cA"
        g.loc[g["site"] == "B", "country"] = "cB"
        out = score_sites_ks(g, "average", "country", jitter_sd=0.0)
        assert len(out) == 0  # R/ctas.R:349 `next` on empty reference

    def test_one_sided_alternatives(self):
        rng = np.random.default_rng(3)
        rows = []
        # site A's values stochastically SMALLER than B's
        for site, lo in (("A", 0.0), ("B", 1.0)):
            for i in range(200):
                rows.append(
                    {"subject_id": f"{site}{i}", "value": lo + rng.random(),
                     "site": site, "country": "c", "region": "r"}
                )
        g = pd.DataFrame(rows)
        # own_site_simil_score -> alternative 'less' (R/ctas.R:309-313):
        # R's 'less' = ECDF of the site lies BELOW the reference = the
        # site's values are stochastically LARGER — flags suspiciously
        # HIGH own-site similarity (the co-clustering fabrication signal)
        out_less = score_sites_ks(g, "own_site_simil_score", "global", jitter_sd=0.0)
        out_two = score_sites_ks(g, "average", "global", jitter_sd=0.0)
        pa_less = out_less.set_index("site")["pvalue_kstest"]
        assert pa_less["B"] < 1e-6  # B has the larger (more similar) scores
        assert pa_less["A"] > 0.5
        # unique_value_count_relative -> 'greater': flags LOW uniqueness
        out_gr = score_sites_ks(
            g, "unique_value_count_relative", "global", jitter_sd=0.0
        )
        pg = out_gr.set_index("site")["pvalue_kstest"]
        assert pg["A"] < 1e-6  # A's values stochastically smaller
        assert out_two["pvalue_kstest"].notna().all()

    def test_jitter_determinism(self):
        # overlapping distributions so the statistic is jitter-sensitive
        g = _two_site_group(mu_a=5.0, mu_b=5.0, sd=0.0, n=40)
        a = score_sites_ks(g, "average", "global", jitter_sd=1e-5, jitter_seed=9, seed_key="k")
        b = score_sites_ks(g, "average", "global", jitter_sd=1e-5, jitter_seed=9, seed_key="k")
        pd.testing.assert_frame_equal(a, b)
        c = score_sites_ks(g, "average", "global", jitter_sd=1e-5, jitter_seed=10, seed_key="k")
        assert not np.allclose(a["kstest_statistic"], c["kstest_statistic"])
