"""Cross-subject kernels: R dist NA-scaling, LOF, own-site AUROC, PCA."""

from __future__ import annotations

import numpy as np
import pytest

from ctas_ray.functions.multivariate import (
    local_outlier_factor,
    own_site_similarity,
    pca_coordinates,
    r_dist_euclidean,
)
from ctas_ray.functions.stats import auroc


class TestRDist:
    def test_plain_euclidean(self):
        x = np.array([[0.0, 0.0], [3.0, 4.0]])
        d = r_dist_euclidean(x)
        assert d[0, 1] == pytest.approx(5.0)
        assert d[1, 0] == pytest.approx(5.0)
        assert d[0, 0] == 0.0

    def test_na_scaling_matches_r(self):
        # R: dist(rbind(c(1, NA, 3), c(2, 4, 6))) -> sqrt((1+9) * 3/2)
        x = np.array([[1.0, np.nan, 3.0], [2.0, 4.0, 6.0]])
        d = r_dist_euclidean(x)
        assert d[0, 1] == pytest.approx(np.sqrt((1 + 9) * 3 / 2))

    def test_all_na_pair_is_nan(self):
        x = np.array([[np.nan, 1.0], [2.0, np.nan]])
        d = r_dist_euclidean(x)
        assert np.isnan(d[0, 1])


class TestLOF:
    def test_uniform_grid_near_one(self):
        # regular grid: every point is as dense as its neighbours
        xs, ys = np.meshgrid(np.arange(5.0), np.arange(5.0))
        pts = np.column_stack([xs.ravel(), ys.ravel()])
        d = r_dist_euclidean(pts)
        lof = local_outlier_factor(d, k=4)
        assert np.nanmedian(lof) == pytest.approx(1.0, abs=0.15)

    def test_outlier_detected(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(0, 1, size=(30, 2))
        pts = np.vstack([pts, [[30.0, 30.0]]])
        d = r_dist_euclidean(pts)
        lof = local_outlier_factor(d, k=5)
        assert np.argmax(lof) == 30
        assert lof[30] > 2.0

    def test_identical_points_nonfinite_then_capped(self):
        pts = np.zeros((5, 2))
        d = r_dist_euclidean(pts)
        lof = local_outlier_factor(d, k=2)
        lof[~np.isfinite(lof)] = 1.0  # caller-side cap (R/ctas.R:551)
        np.testing.assert_allclose(lof, np.ones(5))


class TestLofNaDistPath:
    def test_nan_dist_drops_lof_rows(self):
        # R/ctas.R:530-538: NA anywhere in the dist object -> all-NA lof
        # (dropped by the long pivot) — triggered by subject pairs with
        # zero overlapping non-NA timepoints
        from ctas_ray.study_core import timeseries_features_long

        wide = np.array(
            [[1.0, np.nan, np.nan], [np.nan, 2.0, np.nan], [1.5, 2.5, 3.0]]
        )
        subj = np.array(["a", "b", "c"], dtype=object)
        out = timeseries_features_long(
            subj, wide, "original", "lof;average", {"a": "s1", "b": "s1", "c": "s2"}
        )
        assert not (out["feature"] == "lof").any()  # all lof rows dropped
        assert (out["feature"] == "average").sum() == 3  # average survives


class TestOwnSite:
    def test_matches_direct_auroc(self):
        rng = np.random.default_rng(1)
        wide = rng.normal(0, 1, size=(8, 4))
        sites = np.array(["A", "A", "A", "B", "B", "C", "C", "D"], dtype=object)
        d = r_dist_euclidean(wide)
        out = own_site_similarity(d, sites)
        # subject 0 (site A, 3 subjects): direct computation
        mask = np.ones(8, dtype=bool)
        mask[0] = False
        expect = auroc(d[0][mask], (sites[mask] == "A").astype(float))
        assert out[0] == pytest.approx(expect)
        # singleton site D -> NaN (reference filters -1 init, R/ctas.R:512)
        assert np.isnan(out[7])

    def test_tight_site_cluster_scores_high(self):
        # site A subjects are mutually close -> AUROC near 1
        a = np.array([[0.0, 0], [0.1, 0], [0, 0.1]])
        b = np.array([[10.0, 10], [11, 10], [10, 11], [12, 12]])
        wide = np.vstack([a, b])
        sites = np.array(["A"] * 3 + ["B"] * 4, dtype=object)
        d = r_dist_euclidean(wide)
        out = own_site_similarity(d, sites)
        assert np.all(out[:3] > 0.9)


class TestPCA:
    def test_one_column_passthrough(self):
        wide = np.array([[1.0], [2.0], [3.0]])
        pc1, pc2 = pca_coordinates(wide)
        np.testing.assert_allclose(pc1, [1, 2, 3])
        np.testing.assert_allclose(pc2, [0, 0, 0])

    def test_two_column_passthrough(self):
        wide = np.array([[1.0, 9.0], [2.0, 8.0]])
        pc1, pc2 = pca_coordinates(wide)
        np.testing.assert_allclose(pc1, [1, 2])
        np.testing.assert_allclose(pc2, [9, 8])

    def test_constant_columns_dropped(self):
        wide = np.array([[5.0, 1.0], [5.0, 2.0], [5.0, 3.0]])
        pc1, pc2 = pca_coordinates(wide)  # constant col dropped -> 1-col path
        np.testing.assert_allclose(pc1, [1, 2, 3])
        np.testing.assert_allclose(pc2, [0, 0, 0])

    def test_all_constant_returns_none(self):
        wide = np.full((3, 2), 7.0)
        assert pca_coordinates(wide) is None

    def test_row_mean_imputation(self):
        # NaN imputed with ROW mean before everything else (R/ctas.R:698-701)
        wide = np.array([[1.0, np.nan, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
        res = pca_coordinates(wide)
        assert res is not None
        # imputed matrix: row0 mean = 2 -> [1,2,3]; full rank -> SVD path
        imputed = np.array([[1.0, 2.0, 3.0], [4, 5, 6], [7, 8, 9]])
        centered = imputed - imputed.mean(axis=0)
        u, s, vt = np.linalg.svd(centered, full_matrices=False)
        scores = u * s
        pc1, pc2 = res
        # compare up to sign
        assert np.allclose(np.abs(pc1), np.abs(scores[:, 0]), atol=1e-9)

    def test_svd_scores_match_covariance_eig(self):
        rng = np.random.default_rng(2)
        wide = rng.normal(0, 1, size=(10, 5))
        pc1, pc2 = pca_coordinates(wide)
        centered = wide - wide.mean(axis=0)
        cov = np.cov(centered, rowvar=False)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1]
        e1 = centered @ v[:, order[0]]
        e2 = centered @ v[:, order[1]]
        assert np.allclose(np.abs(pc1), np.abs(e1), atol=1e-8)
        assert np.allclose(np.abs(pc2), np.abs(e2), atol=1e-8)


def test_r_dist_matmul_equals_literal_loop():
    """The matmul decomposition must match the literal per-row
    (xi - xj)^2 formulation of R's NA-rescaled dist to 1e-9."""
    import numpy as np
    from ctas_ray.functions.multivariate import r_dist_euclidean

    def loop_ref(wide):
        x = np.asarray(wide, dtype=np.float64)
        n, p = x.shape
        valid = ~np.isnan(x)
        x0 = np.where(valid, x, 0.0)
        d2 = np.zeros((n, n))
        cnt = np.zeros((n, n))
        for i in range(n):
            both = valid[i][None, :] & valid
            diff = np.where(both, x0[i][None, :] - x0, 0.0)
            d2[i] = (diff * diff).sum(axis=1)
            cnt[i] = both.sum(axis=1)
        with np.errstate(all="ignore"):
            out = np.sqrt(d2 * (p / cnt))
        out[cnt == 0] = np.nan
        np.fill_diagonal(out, 0.0)
        return out

    rng = np.random.default_rng(3)
    for _ in range(5):
        n, p = int(rng.integers(2, 200)), int(rng.integers(1, 30))
        x = rng.normal(100, 5, (n, p))  # large offset stresses cancellation
        x[rng.random((n, p)) < 0.3] = np.nan
        np.testing.assert_allclose(
            r_dist_euclidean(x), loop_ref(x), rtol=1e-9, atol=1e-9, equal_nan=True
        )


def test_own_site_vectorized_equals_per_subject_auroc():
    """The rank-sum identity path must match the literal per-subject
    auroc loop exactly, including ties and singleton-site NaNs."""
    import numpy as np
    from ctas_ray.functions.multivariate import own_site_similarity
    from ctas_ray.functions.stats import auroc

    def loop_ref(dist, sites):
        n = dist.shape[0]
        sites = np.asarray(sites)
        out = np.full(n, np.nan)
        uniq, counts = np.unique(sites, return_counts=True)
        multi = set(uniq[counts > 1].tolist())
        for i in range(n):
            if sites[i] not in multi:
                continue
            mask = np.ones(n, dtype=bool)
            mask[i] = False
            out[i] = auroc(
                dist[i][mask], (sites[mask] == sites[i]).astype(np.float64)
            )
        return out

    rng = np.random.default_rng(5)
    for _ in range(6):
        n = int(rng.integers(2, 120))
        d = np.abs(rng.normal(0, 1, (n, n)))
        d = (d + d.T) / 2
        np.fill_diagonal(d, 0.0)
        if n > 6:  # plant ties
            d[0, 1] = d[1, 0] = d[2, 3] = d[3, 2] = 0.5
        sites = rng.integers(0, max(2, n // 4), n).astype(str)
        np.testing.assert_allclose(
            own_site_similarity(d, sites), loop_ref(d, sites),
            rtol=1e-12, equal_nan=True,
        )


# ---------------------------------------------------------------------------
# qpca: the deterministic integer PCA variant (hash-verified in the
# driver contract via study_screen_pca_exact)
# ---------------------------------------------------------------------------


def test_qpca_tracks_svd_directions():
    from ctas_ray.functions.multivariate import pca_coordinates, qpca_coordinates

    rng = np.random.default_rng(7)
    w = rng.normal(0.0, 4.0, (60, 8))
    w[rng.random(w.shape) < 0.15] = np.nan
    q1, q2 = qpca_coordinates(w)
    s1, s2 = pca_coordinates(w)
    assert abs(np.corrcoef(q1 / 1e6, s1)[0, 1]) > 0.999
    assert abs(np.corrcoef(q2 / 1e6, s2)[0, 1]) > 0.999


def test_qpca_passthrough_one_and_two_columns():
    from ctas_ray.functions.multivariate import qpca_coordinates

    one = np.array([[1.5], [2.5], [3.0]])
    p1, p2 = qpca_coordinates(one)
    assert np.array_equal(p1, [1_500_000, 2_500_000, 3_000_000])
    assert np.array_equal(p2, [0, 0, 0])
    two = np.array([[1.0, 4.0], [2.0, 5.0], [3.0, 7.0]])
    p1, p2 = qpca_coordinates(two)
    assert np.array_equal(p1, [1_000_000, 2_000_000, 3_000_000])
    assert np.array_equal(p2, [4_000_000, 5_000_000, 7_000_000])


def test_qpca_constant_columns_dropped_and_none_when_all_constant():
    from ctas_ray.functions.multivariate import qpca_coordinates

    assert qpca_coordinates(np.ones((5, 3))) is None
    w = np.column_stack([np.ones(4), [1.0, 2.0, 3.0, 4.0]])
    p1, p2 = qpca_coordinates(w)  # constant col dropped -> 1-col passthrough
    assert np.array_equal(p1, [1_000_000, 2_000_000, 3_000_000, 4_000_000])
    assert np.array_equal(p2, [0, 0, 0, 0])


def test_qpca_row_permutation_equivariant():
    """Integer arithmetic is associative: permuting input rows permutes
    the outputs identically (no Ray-block-order sensitivity)."""
    from ctas_ray.functions.multivariate import qpca_coordinates

    rng = np.random.default_rng(3)
    w = rng.normal(0.0, 2.0, (25, 5))
    w[rng.random(w.shape) < 0.2] = np.nan
    perm = rng.permutation(25)
    a1, a2 = qpca_coordinates(w)
    b1, b2 = qpca_coordinates(w[perm])
    assert np.array_equal(a1[perm], b1)
    assert np.array_equal(a2[perm], b2)


def test_qpca_impute_uses_floor_div_row_mean():
    from ctas_ray.functions.multivariate import qpca_coordinates

    # row [1.0, NaN]: impute = floor((2*1e6 + 1) // 2) = 1e6 -> col2
    # value 1e6 for that row
    w = np.array([[1.0, np.nan], [2.0, 5.0], [3.0, 4.0]])
    p1, p2 = qpca_coordinates(w)
    assert np.array_equal(p1, [1_000_000, 2_000_000, 3_000_000])
    assert np.array_equal(p2, [1_000_000, 5_000_000, 4_000_000])
