"""Group-level compute kernels for the study pipeline.

Each function here operates on ONE group's data (one timeseries, or one
(timeseries, feature, ref_group) scoring group) — they are the bodies
of the Ray ``map_groups`` stages and, composed sequentially, the
single-process NumPy oracle used by the test suite.

Reference parity notes are cited inline into /root/reference/R/ctas.R.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from .functions.multivariate import (
    local_outlier_factor,
    own_site_similarity,
    pca_coordinates,
    r_dist_euclidean,
)
from .functions.series import compute_series_features
from .functions.stats import ks_test, norm_sf, quantile_type7

__all__ = [
    "build_wide_timeseries",
    "timeseries_features_long",
    "timeseries_pca",
    "score_sites_ks",
    "score_sites_iqr",
    "score_sites_mixedeffects_approx",
]

UNIVARIATE_FEATURES = ("range", "sd", "unique_value_count_relative", "autocorr", "average")

# user-extension registry for site-scoring methods (SURVEY.md §2.10):
# fn(group: DataFrame[subject_id, value, site, country, region]) ->
# DataFrame with an 'entity' column + any metric columns; the engine
# attaches (timeseries_id, feature, ref_group) and returns rows as-is
# (no FDR pass — a registered method owns its own statistics).
SCORING_REGISTRY: dict[str, tuple] = {}


def register_scoring(name: str, fn, empty_columns: list[str] | None = None) -> None:
    """``empty_columns`` = the scorer's output columns, used to emit
    schema-stable zero-row frames for groups failing the eligibility
    gates (distributed blocks must share one schema)."""
    from .functions.series import _ensure_by_value

    _ensure_by_value(fn)
    SCORING_REGISTRY[name] = (fn, list(empty_columns or ["entity"]))


def build_wide_timeseries(
    measurements: pd.DataFrame,
    combo: str,
    subjects_packed: str | None,
    baseline: str,
) -> tuple[np.ndarray, np.ndarray] | None:
    """generate_wide_timeseries_table (R/ctas.R:765-789).

    ``measurements``: this parameter's rows with columns
    (subject_id, timepoint_rank, result, baseline).

    Returns (subject_ids, wide) where wide is (n_subjects, n_present_cols)
    float64 with NaN for missing; columns are the combo ranks that have at
    least one measurement, ascending (pivot_wider after arrange).
    Duplicate (subject, rank) cells are averaged with NA-propagating mean
    (``values_fn = mean``, R/ctas.R:784-785). None when no rows survive
    (caller drops the series, R/ctas.R:160 ``filter(nrow(...) > 0)``).
    """
    ranks = [float(t) for t in combo.split(";")]
    m = measurements[measurements["timepoint_rank"].astype(float).isin(ranks)]
    if subjects_packed is not None:  # None = caller pre-filtered members
        subj_list = [s for s in subjects_packed.split(";") if s]
        m = m[m["subject_id"].isin(subj_list)]
    if baseline == "cfb":
        m = m[m["baseline"].notna()].copy()
        m["result"] = m["result"] - m["baseline"]
    if len(m) == 0:
        return None
    m = m.sort_values("timepoint_rank", kind="mergesort")
    col_ranks = pd.unique(m["timepoint_rank"])  # ascending (arranged)
    col_pos = {r: i for i, r in enumerate(col_ranks)}
    row_subj = pd.unique(m["subject_id"])  # first-appearance, like pivot_wider
    row_pos = {s: i for i, s in enumerate(row_subj)}
    wide = np.full((len(row_subj), len(col_ranks)), np.nan)
    ri = m["subject_id"].map(row_pos).to_numpy()
    ci = m["timepoint_rank"].map(col_pos).to_numpy()
    vals = m["result"].to_numpy(dtype=np.float64)
    dup_mask = pd.MultiIndex.from_arrays([ri, ci]).duplicated(keep=False)
    if not dup_mask.any():
        wide[ri, ci] = vals
    else:
        # slow path: NA-propagating mean per duplicated cell (R mean default)
        wide[ri[~dup_mask], ci[~dup_mask]] = vals[~dup_mask]
        dd = pd.DataFrame({"r": ri[dup_mask], "c": ci[dup_mask], "v": vals[dup_mask]})
        for (r, c), grp in dd.groupby(["r", "c"]):
            v = grp["v"].to_numpy()
            wide[r, c] = np.nan if np.isnan(v).any() else v.mean()
    return np.asarray(row_subj, dtype=object), wide


def timeseries_features_long(
    subject_ids: np.ndarray,
    wide: np.ndarray,
    baseline: str,
    features_packed: str,
    site_of_subject: dict[str, str],
    max_subjects_for_pairwise: int = 20_000,
    extra_features: dict | None = None,
) -> pd.DataFrame:
    """calculate_ts_features (R/ctas.R:589-681) for one series.

    Returns long frame (subject_id, feature, value) with NaN values
    dropped (``values_drop_na=TRUE``, R/ctas.R:675-676). Emits the
    lof warning semantics: NaN in the distance matrix -> all-NaN lof
    (dropped rows), matching R/ctas.R:530-538.
    """
    feats = features_packed.split(";")
    cols: dict[str, np.ndarray] = compute_series_features(
        wide, baseline, feats, extra=extra_features
    )
    needs_dist = "lof" in feats or "own_site_simil_score" in feats
    if needs_dist and len(subject_ids) > max_subjects_for_pairwise:
        # the reference's O(n^2) dist cliff (R/ctas.R:604): emit no
        # pairwise-feature rows (same shape as its NA-dist path) rather
        # than building an n^2 matrix that would OOM the worker
        needs_dist = False
    if needs_dist:
        dist = r_dist_euclidean(wide)
        if "lof" in feats:
            if np.isnan(dist).any():
                cols["lof"] = np.full(len(subject_ids), np.nan)
            else:
                n = len(subject_ids)
                k = min(10, n // 3)  # R/ctas.R:541-546
                k = 1 if k == 0 else k
                lof = local_outlier_factor(dist, k)
                lof[~np.isfinite(lof)] = 1.0  # R/ctas.R:551
                cols["lof"] = lof
        if "own_site_simil_score" in feats:
            sites = np.array([site_of_subject.get(s) for s in subject_ids], dtype=object)
            with np.errstate(all="ignore"):
                cols["own_site_simil_score"] = own_site_similarity(dist, sites)
    # long pivot in feature-column order, per subject (order irrelevant);
    # registered custom features follow the built-ins
    builtin = ("range", "sd", "unique_value_count_relative", "autocorr",
               "average", "lof", "own_site_simil_score")
    order = [f for f in builtin if f in cols] + [f for f in cols if f not in builtin]
    frames = []
    for f in order:
        v = cols[f]
        keep = ~np.isnan(v)
        frames.append(
            pd.DataFrame(
                {"subject_id": subject_ids[keep], "feature": f, "value": v[keep]}
            )
        )
    if not frames:
        return pd.DataFrame({"subject_id": [], "feature": [], "value": []})
    return pd.concat(frames, ignore_index=True)


def timeseries_pca(
    subject_ids: np.ndarray, wide: np.ndarray, method: str = "svd"
) -> pd.DataFrame:
    """calculate_principal_components wrapper -> frame
    (subject_id, pc1, pc2); empty when all columns are constant
    (R/ctas.R:741-747 adds subjects only if PCs exist). ``method``:
    "svd" (prcomp parity) or "qpca" (hash-verifiable integer variant)."""
    if method == "qpca":
        from .functions.multivariate import qpca_coordinates

        res = qpca_coordinates(wide)
    else:
        res = pca_coordinates(wide)
    if res is None:
        return pd.DataFrame({"subject_id": [], "pc1": [], "pc2": []})
    pc1, pc2 = res
    return pd.DataFrame({"subject_id": subject_ids, "pc1": pc1, "pc2": pc2})


def _group_jitter(values: np.ndarray, sd: float, seed_key: str, seed: int | None) -> np.ndarray:
    """The reference adds unseeded N(0, 1e-5) jitter to break KS ties
    (R/ctas.R:304). We derive a per-group deterministic seed from the
    group key so results are reproducible and partition-order-independent;
    sd=0 disables jitter for bit-exact oracle tests."""
    if sd == 0.0:
        return values
    digest = hashlib.sha256(f"{seed}:{seed_key}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
    return values + rng.normal(0.0, sd, size=len(values))


def score_sites_ks(
    group: pd.DataFrame,
    feature: str,
    ref_group: str,
    jitter_sd: float = 1e-5,
    jitter_seed: int | None = 42,
    seed_key: str = "",
) -> pd.DataFrame:
    """calculate_site_bias_ts_features (R/ctas.R:301-379) for one
    (timeseries, feature, ref_group) group.

    ``group`` columns: subject_id, value, site, country, region.
    Returns (site, pvalue_kstest, kstest_statistic, region, country,
    subj_count) — FDR correction happens globally at the driver
    (R/ctas.R:222 barrier).
    """
    # deterministic row order: group rows arrive in shuffle order under
    # Ray; sort by subject_id so jitter draws and site iteration order are
    # identical no matter how the data was partitioned
    group = group.sort_values("subject_id", kind="mergesort")
    values = _group_jitter(
        group["value"].to_numpy(dtype=np.float64), jitter_sd, seed_key, jitter_seed
    )
    sites = group["site"].to_numpy(dtype=object)
    countries = group["country"].to_numpy(dtype=object)
    regions = group["region"].to_numpy(dtype=object)
    # alternative per feature (R/ctas.R:308-313)
    if feature == "own_site_simil_score":
        alternative = "less"
    elif feature == "unique_value_count_relative":
        alternative = "greater"
    else:
        alternative = "two.sided"
    meta = (
        group.groupby("site", sort=False)
        .agg(
            region=("region", "first"),
            country=("country", "first"),
            subj_count=("subject_id", "nunique"),
        )
        .reset_index()
    )
    meta_idx = meta.set_index("site")
    rows = []
    for this_site in pd.unique(sites):
        own = sites == this_site
        if ref_group == "country":
            ref = (countries == meta_idx.loc[this_site, "country"]) & ~own
        elif ref_group == "region":
            ref = (regions == meta_idx.loc[this_site, "region"]) & ~own
        else:  # global
            ref = ~own
        if not ref.any():
            continue  # R/ctas.R:349
        stat, p = ks_test(values[own], values[ref], alternative)
        rows.append({"site": this_site, "pvalue_kstest": p, "kstest_statistic": stat})
    out = pd.DataFrame(rows, columns=["site", "pvalue_kstest", "kstest_statistic"])
    out = out.merge(meta, on="site", how="left")
    # NA p with statistic == 1 -> 1e-100 (R/ctas.R:367-375)
    patch = out["pvalue_kstest"].isna() & (out["kstest_statistic"] == 1.0)
    out.loc[patch, "pvalue_kstest"] = 1e-100
    return out


def score_sites_iqr(group: pd.DataFrame) -> pd.DataFrame:
    """calculate_simple_site_feature_avgs (R/ctas.R:1251-1275): site means
    of the feature, R type-7 IQR fences, is_signal in {0, 1}."""
    group = group.sort_values("subject_id", kind="mergesort")  # order-stable sums
    avg = (
        group.groupby("site", sort=True)["value"].mean().rename("avg_value").reset_index()
    )
    vals = avg["avg_value"].to_numpy()
    q1 = quantile_type7(vals, 0.25)
    q3 = quantile_type7(vals, 0.75)
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    avg["is_signal"] = np.where((vals < lo) | (vals > hi), 1, 0)
    return avg


def score_sites_mixedeffects_approx(group: pd.DataFrame) -> pd.DataFrame:
    """DOCUMENTED APPROXIMATION of fit_mixed_effects_model
    (R/ctas.R:1215-1248).

    The reference fits ``lmer(value ~ (1|region/country/site))`` and
    Monte-Carlo simulates random effects (``REsim``, n.sims=500 —
    *unseeded*, so the reference itself is not bit-reproducible). lme4
    does not exist in this environment; we compute deterministic
    method-of-moments BLUPs per grouping level instead:

    for each level (site, then country, then region when >1 distinct):
      between-variance tau2 via one-way ANOVA method of moments,
      shrinkage B_g = tau2 / (tau2 + sigma2/n_g),
      effect mean = median = B_g * (group_mean - grand_mean),
      sd = sqrt(B_g * sigma2 / n_g)  (conditional posterior sd).

    Output matches the reference's shape: (entity, groupFctr, mean,
    median, sd) — downstream z/p/FDR math is identical (R/ctas.R:234-240).
    """
    group = group.sort_values("subject_id", kind="mergesort")  # order-stable sums
    y = group["value"].to_numpy(dtype=np.float64)
    grand = y.mean()
    n = len(y)
    levels = [("site", group["site"])]
    if group["country"].nunique() > 1:
        levels.append(("country", group["country"]))
        if group["region"].nunique() > 1:
            levels.append(("region", group["region"]))
    rows = []
    for fct, labels in levels:
        labels = labels.to_numpy(dtype=object)
        uniq, inv, counts = np.unique(labels, return_inverse=True, return_counts=True)
        gmeans = np.bincount(inv, weights=y) / counts
        resid = y - gmeans[inv]
        dof = max(1, n - len(uniq))
        sigma2 = float((resid**2).sum() / dof)
        # method of moments between-variance
        ssb = float((counts * (gmeans - grand) ** 2).sum())
        c = n - float((counts**2).sum()) / n
        tau2 = max(0.0, (ssb - (len(uniq) - 1) * sigma2) / c) if c > 0 else 0.0
        shrink = tau2 / (tau2 + sigma2 / counts) if tau2 > 0 else np.zeros(len(uniq))
        eff = shrink * (gmeans - grand)
        sd = np.sqrt(np.maximum(shrink * sigma2 / counts, 1e-300))
        for i, ent in enumerate(uniq):
            rows.append(
                {
                    "entity": ent,
                    "groupFctr": fct,
                    "mean": eff[i],
                    "median": eff[i],
                    "sd": sd[i],
                }
            )
    out = pd.DataFrame(rows)
    out["z_score"] = np.abs(out["median"] / out["sd"])
    out["p_value"] = np.array([norm_sf(z) for z in out["z_score"]])
    return out


def finalize_ks_scores(scores: pd.DataFrame, padjust, padjust_method: str) -> pd.DataFrame:
    """Global FDR barrier + -log10 transforms + Inf capping
    (R/ctas.R:222-227). ``scores`` = concatenated per-group KS rows with
    timeseries_id/feature/ref_group attached."""
    p = scores["pvalue_kstest"].to_numpy(dtype=np.float64)
    adj = padjust(p, padjust_method)
    with np.errstate(all="ignore"):
        logp = -np.log10(p)
        logp_adj = -np.log10(adj)
    logp[np.isinf(logp)] = 30.0
    logp_adj[np.isinf(logp_adj)] = 30.0
    out = scores.copy()
    out["pvalue_kstest_logp"] = logp
    out["fdr_corrected_pvalue_logp"] = logp_adj
    out = out.rename(columns={"subj_count": "subject_count"})
    return out[
        [
            "timeseries_id",
            "site",
            "country",
            "region",
            "feature",
            "pvalue_kstest_logp",
            "kstest_statistic",
            "fdr_corrected_pvalue_logp",
            "ref_group",
            "subject_count",
        ]
    ]
