"""Cross-subject kernels: R-compatible distance matrix, Local Outlier
Factor, own-site similarity, and PCA coordinates.

These run per-timeseries inside a ``map_groups`` UDF — bounded by the
number of eligible subjects in one series, never by total data volume.
They use full square numpy matrices where the reference does condensed
``dist``-vector index gymnastics (R/ctas.R:459-501); the results are
identical, the code is 10x simpler, and per-group sizes stay small.
"""

from __future__ import annotations

import numpy as np

from .stats import auroc

__all__ = [
    "r_dist_euclidean",
    "local_outlier_factor",
    "own_site_similarity",
    "pca_coordinates",
    "qpca_coordinates",
]


def r_dist_euclidean(wide: np.ndarray) -> np.ndarray:
    """Pairwise Euclidean distances with R ``stats::dist`` NA semantics
    (used at R/ctas.R:604): coordinates where either value is NA are
    dropped and the sum of squares is scaled up by p / n_valid; a pair
    with zero valid coordinates gives NaN.

    Returns the full symmetric (n, n) matrix with 0 diagonal.
    """
    x = np.asarray(wide, dtype=np.float64)
    n, p = x.shape
    valid = ~np.isnan(x)
    # column-center first (distances are translation-invariant): the
    # matmul decomposition below loses precision when |x| >> |xi - xj|
    with np.errstate(all="ignore"):
        mu = np.where(valid, x, 0.0).sum(axis=0) / np.maximum(valid.sum(axis=0), 1)
    x0 = np.where(valid, x - mu[None, :], 0.0)
    # sum over both-valid c of (xi_c - xj_c)^2
    #   = sum xi^2*valid_j + sum xj^2*valid_i - 2 sum xi*xj
    # (x0 is zero at invalid coordinates, so each term self-masks) —
    # three BLAS matmuls instead of a Python loop over rows
    v = valid.astype(np.float64)
    sq = x0 * x0
    d2 = sq @ v.T + v @ sq.T - 2.0 * (x0 @ x0.T)
    np.maximum(d2, 0.0, out=d2)  # clamp matmul round-off
    cnt = v @ v.T
    with np.errstate(all="ignore"):
        out = np.sqrt(d2 * (p / cnt))
    out[cnt == 0] = np.nan
    np.fill_diagonal(out, 0.0)
    return out


def local_outlier_factor(dist: np.ndarray, k: int) -> np.ndarray:
    """Classic LOF (Breunig et al. 2000) over a precomputed distance
    matrix, matching ``dbscan::lof(dist, minPts=k+1)`` as called by the
    reference (calculate_lof, R/ctas.R:526-559):

    - ``k = min(10, floor(n/3))`` with floor 1 is chosen by the CALLER
      (R/ctas.R:541-546); this function takes k directly.
    - k-distance = distance to the k-th nearest neighbour; the
      neighbourhood is tie-inclusive (all points with d <= k-distance).
    - reach-dist_k(p,o) = max(k-dist(o), d(p,o));
      lrd(p) = 1/mean(reach-dist over neighbourhood);
      LOF(p) = mean(lrd(o))/lrd(p) over the neighbourhood.

    Non-finite LOF values (identical-point clusters) are the caller's
    problem — the reference maps them to 1.0 (R/ctas.R:551).
    NaN anywhere in dist → caller returns all-NaN (R/ctas.R:530-538).
    """
    d = np.asarray(dist, dtype=np.float64)
    n = d.shape[0]
    if n <= 1:
        return np.full(n, np.nan)
    k = min(k, n - 1)
    # k-distance per point (excluding self): partition row without diagonal
    big = d.copy()
    np.fill_diagonal(big, np.inf)
    kdist = np.partition(big, k - 1, axis=1)[:, k - 1]
    neigh = big <= kdist[:, None]  # tie-inclusive neighbourhood, excl. self
    # lrd
    reach = np.maximum(kdist[None, :], d)  # reach(p row, o col)
    with np.errstate(all="ignore"):
        lrd = 1.0 / (np.where(neigh, reach, 0.0).sum(axis=1) / neigh.sum(axis=1))
        lof = np.where(neigh, lrd[None, :], 0.0).sum(axis=1) / neigh.sum(axis=1) / lrd
    return lof


def own_site_similarity(
    dist: np.ndarray,
    sites: np.ndarray,
) -> np.ndarray:
    """Own-site similarity score per subject (calculate_own_site_simil_score,
    R/ctas.R:432-516): for each subject at a site with >= 2 subjects in
    the series, the AUROC of (distances to all other subjects, ranked
    ascending-by-negation as in the reference's ``rank(-score)``)
    against same-site membership. Subjects at singleton sites get NaN
    (reference initialises -1 and filters, R/ctas.R:436,512).

    ``dist`` is the full square matrix; ``sites`` the per-subject site id
    aligned with its rows.
    """
    n = dist.shape[0]
    sites = np.asarray(sites)
    out = np.full(n, np.nan)
    if n <= 1:
        return out
    # sites with more than one subject in this series
    uniq, inv, counts = np.unique(sites, return_inverse=True, return_counts=True)
    n2 = counts[inv] - 1.0  # same-site others per subject
    eligible = n2 >= 1
    if not eligible.any():
        return out
    # Vectorized over ALL subjects at once: rank(-dist) per row with
    # average ties (pandas C kernel; the diagonal is NaN so each row
    # ranks exactly its n-1 "other" subjects, like the per-subject
    # reference formula), then the AUROC U-statistic via the rank-sum
    # identity: sum of different-site ranks = total - same-site sum.
    import pandas as pd

    negd = -np.asarray(dist, dtype=np.float64)
    np.fill_diagonal(negd, np.nan)
    ranks = pd.DataFrame(negd).rank(axis=1, method="average").to_numpy()
    same = inv[:, None] == inv[None, :]
    np.fill_diagonal(same, False)
    same_sum = np.where(same, ranks, 0.0).sum(axis=1)
    total = (n - 1) * n / 2.0  # row rank sum (ties preserve the total)
    n1 = (n - 1) - n2  # different-site others
    with np.errstate(all="ignore"):
        u = (total - same_sum) - n1 * (n1 + 1) / 2.0
        res = 1.0 - u / n1 / n2  # identical float order to stats.auroc
    out[eligible] = res[eligible]
    return out


def pca_coordinates(wide: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """First two principal-component coordinates per subject
    (calculate_principal_components, R/ctas.R:692-750):

    1. impute NaN with ROW means (R/ctas.R:698-701)
    2. drop zero-variance columns (exact ``var != 0``, R/ctas.R:705)
    3. 0 cols left  -> None (empty frame; no subjects emitted)
       1 col  left  -> (value, 0)            (R/ctas.R:708-716)
       2 cols left  -> (values as-is)        (R/ctas.R:718-724)
       >2 cols      -> prcomp(center=TRUE, scale.=FALSE) scores 1..2
                       (R/ctas.R:726-737)

    PC sign is an SVD convention, not a semantic: R's prcomp (LAPACK) and
    numpy may disagree per-component. Tests compare up to sign; the
    engine applies a deterministic convention (largest-|loading| positive)
    so results are stable across runs and cluster sizes.
    """
    x = np.asarray(wide, dtype=np.float64).copy()
    n, p = x.shape
    with np.errstate(all="ignore"):
        row_means = np.nanmean(x, axis=1)
    nan_r, nan_c = np.where(np.isnan(x))
    x[nan_r, nan_c] = row_means[nan_r]
    # var per column (ddof=1, na.rm) — after imputation NaNs only remain
    # for all-NaN rows, which cannot occur for eligible subjects
    with np.errstate(all="ignore"):
        col_var = np.nanvar(x, axis=0, ddof=1) if n > 1 else np.zeros(p)
    keep = col_var != 0
    x = x[:, keep]
    p = x.shape[1]
    if p == 0:
        return None
    if p == 1:
        return x[:, 0].copy(), np.zeros(n)
    if p == 2:
        return x[:, 0].copy(), x[:, 1].copy()
    centered = x - x.mean(axis=0)
    # scores = centered @ V ; use SVD for numerical parity with prcomp
    u, s, vt = np.linalg.svd(centered, full_matrices=False)
    # deterministic sign: make the largest-|v| loading of each PC positive
    for comp in range(min(2, vt.shape[0])):
        j = np.argmax(np.abs(vt[comp]))
        if vt[comp, j] < 0:
            vt[comp] = -vt[comp]
            u[:, comp] = -u[:, comp]
    scores = u * s
    if scores.shape[1] == 1:  # rank-1 data: pad PC2 with zeros
        return scores[:, 0], np.zeros(n)
    return scores[:, 0], scores[:, 1]


# ---------------------------------------------------------------------------
# qpca: deterministic integer-arithmetic PCA variant (hash-verifiable)
# ---------------------------------------------------------------------------

def _round_div(num: int, den: int) -> int:
    """round-half-away-from-zero of num/den (den > 0), exact integers.
    Written so a SQL oracle with truncating integer division reproduces
    it bit-for-bit (operands of // are kept non-negative)."""
    if num >= 0:
        return (2 * num + den) // (2 * den)
    return -((2 * (-num) + den) // (2 * den))


def _power_iterate(mq: list[list[int]], p: int, scale: int, iters: int,
                   deflate: list[int] | None = None) -> list[int]:
    """Fixed-count power iteration on the integer matrix ``mq`` with the
    iterate re-quantized to the ``scale`` grid each step (exact integer
    arithmetic throughout — associative, so any execution order agrees).
    With ``deflate`` = v1, each step projects out the v1 component via
    the integer identity  w = (v1.v1) * (M u) - (v1.(M u)) * v1  before
    re-quantizing. Sign convention: largest-|component| positive
    (smallest index wins ties)."""
    v = [scale] * p
    b = sum(d * d for d in deflate) if deflate is not None else 0
    for _ in range(iters):
        w = [sum(mq[i][j] * v[j] for j in range(p)) for i in range(p)]
        if deflate is not None:
            a = sum(deflate[i] * w[i] for i in range(p))
            w = [b * w[i] - a * deflate[i] for i in range(p)]
        mw = max(abs(x) for x in w)
        if mw == 0:  # degenerate (rank-deficient): keep the iterate
            break
        v = [_round_div(x * scale, mw) for x in w]
    jstar = max(range(p), key=lambda j: (abs(v[j]), -j))
    if v[jstar] < 0:
        v = [-x for x in v]
    return v


def qpca_coordinates(
    wide: np.ndarray, scale: int = 1_000_000, iters: int = 24
) -> tuple[np.ndarray, np.ndarray] | None:
    """Deterministic integer PCA ("qpca"): the hash-verifiable variant of
    :func:`pca_coordinates` (R/ctas.R:692-750). Same shape semantics —
    row-mean impute, constant-column drop, 1/2-column passthrough — but
    every arithmetic step is exact integer math reproducible in SQL:

    1. quantize values to the 1/scale grid: FLOOR(x*scale + 0.5)
    2. impute missing with floor-div row mean: (2*S + c) // (2*c)
    3. drop constant columns (min == max)
    4. p==1 -> (x, 0); p==2 -> (x1, x2)  [quantized passthrough]
    5. p>2: centered-by-n integers y = n*x - colsum; M = Y^T Y;
       M re-quantized to the scale grid by round-half-away division;
       ``iters`` power-iteration steps -> v1; integer-deflated power
       iteration -> v2; sign = largest-|loading| positive (the same
       convention the SVD path applies); scores s = Y.v rounded to the
       scale grid via round-half-away by n*scale.

    Integer sums are associative, so results are independent of Ray
    block boundaries and of SQL aggregation order — unlike float PCA.
    Outputs are exact integers (scale-grid scores) returned as float64.
    This is a verification/contract path; the production screen keeps
    the SVD route (prcomp parity).

    CONVERGENCE CAVEAT (ADVICE r3): the fixed ``iters`` power-iteration
    count converges geometrically in (λ2/λ1)^iters, so when the top
    eigengap is SMALL the returned direction can differ materially from
    the SVD PC1 (random full-rank trials show |corr| as low as ~0.6).
    qpca is deterministic and hash-verifiable but NOT interchangeable
    with the prcomp-parity path — do not flip a production screen to
    ``pca_method='qpca'`` expecting SVD-equivalent coordinates (see the
    same note on ``StudyConfig.pca_method``).
    """
    x = np.asarray(wide, dtype=np.float64)
    n, p = x.shape
    xq = np.floor(x * scale + 0.5)  # NaN propagates
    rows: list[list[int]] = []
    for r in range(n):
        vals = [None if np.isnan(v) else int(v) for v in xq[r]]
        present = [v for v in vals if v is not None]
        if present:
            s_row = sum(present)
            c = len(present)
            imp = (2 * s_row + c) // (2 * c)  # floor(S/c + 0.5), exact
        else:
            imp = 0
        rows.append([imp if v is None else v for v in vals])
    keep = [
        j
        for j in range(p)
        if max(rows[r][j] for r in range(n)) != min(rows[r][j] for r in range(n))
    ]
    if not keep:
        return None
    if len(keep) == 1:
        c0 = np.array([float(rows[r][keep[0]]) for r in range(n)])
        return c0, np.zeros(n)
    if len(keep) == 2:
        c0 = np.array([float(rows[r][keep[0]]) for r in range(n)])
        c1 = np.array([float(rows[r][keep[1]]) for r in range(n)])
        return c0, c1
    q = len(keep)
    colsum = [sum(rows[r][j] for r in range(n)) for j in keep]
    y = [[n * rows[r][keep[jj]] - colsum[jj] for jj in range(q)] for r in range(n)]
    m = [[sum(y[r][i] * y[r][j] for r in range(n)) for j in range(q)] for i in range(q)]
    m_max = max(abs(m[i][j]) for i in range(q) for j in range(q))
    if m_max == 0:  # cannot happen for kept (non-constant) columns
        return None
    mq = [[_round_div(m[i][j] * scale, m_max) for j in range(q)] for i in range(q)]
    v1 = _power_iterate(mq, q, scale, iters)
    v2 = _power_iterate(mq, q, scale, iters, deflate=v1)
    d = n * scale
    pc1 = np.array(
        [float(_round_div(sum(y[r][j] * v1[j] for j in range(q)), d)) for r in range(n)]
    )
    pc2 = np.array(
        [float(_round_div(sum(y[r][j] * v2[j] for j in range(q)), d)) for r in range(n)]
    )
    return pc1, pc2
