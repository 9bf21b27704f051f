"""Single-process oracle: a literal composition of the planning and
group kernels, mirroring ``process_a_study`` (R/ctas.R:29-287) end to
end on pandas frames.

Used by the test suite as ground truth for the distributed Ray pipeline
(`ctas_ray.pipelines.study`) — both must produce identical frames. It is
also a usable small-study API in its own right.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import StudyConfig
from .planning import plan_study_series, presence_index
from .functions.stats import p_adjust
from .study_core import (
    SCORING_REGISTRY,
    build_wide_timeseries,
    finalize_ks_scores,
    score_sites_iqr,
    score_sites_ks,
    score_sites_mixedeffects_approx,
    timeseries_features_long,
    timeseries_pca,
)

__all__ = ["process_a_study", "fill_parameter_defaults", "readable_combo"]


def fill_parameter_defaults(parameters: pd.DataFrame, cfg: StudyConfig) -> pd.DataFrame:
    """Per-parameter NA config -> global defaults (R/ctas.R:54-61)."""
    p = parameters.copy()
    fills = {
        "time_point_count_min": cfg.min_timepoints_per_series,
        "subject_count_min": cfg.min_subjects_per_series,
        "max_share_missing": cfg.max_share_missing,
        "generate_change_from_baseline": cfg.generate_change_from_baseline,
        "timeseries_features_to_calculate": cfg.features,
        "use_only_custom_timeseries": False,
    }
    for col, default in fills.items():
        if col not in p.columns:
            p[col] = default
        else:
            p[col] = p[col].where(p[col].notna(), default)
    return p


def readable_combo(
    combo: str, parameter_id: str, rank_names: dict[tuple[str, str], str]
) -> str:
    """parse_readable_timeseries_combo_string (R/ctas.R:392-422):
    rank -> '<tp1>_<tp2>' name with 'ND' components dropped."""
    out = []
    for rank in combo.split(";"):
        name = rank_names.get((parameter_id, rank), "")
        components = [c for c in name.split("_") if c != "ND"]
        out.append("_".join(components))
    return ";".join(out)


def _empty_result(cfg: StudyConfig) -> dict[str, pd.DataFrame | None]:
    return {
        "timeseries": None,
        "timeseries_features": None,
        "PCA_coordinates": None,
        "site_scores": None,
    }


def process_a_study(
    subjects: pd.DataFrame,
    parameters: pd.DataFrame,
    data: pd.DataFrame,
    custom_timeseries: pd.DataFrame | None = None,
    custom_reference_groups: pd.DataFrame | None = None,
    cfg: StudyConfig = StudyConfig(),
) -> dict[str, pd.DataFrame | None]:
    """End-to-end single-process study screen; returns the reference's
    four output frames (SURVEY.md §1.3)."""
    if custom_timeseries is None:
        custom_timeseries = pd.DataFrame(
            columns=["timeseries_id", "parameter_id", "timepoint_combo"]
        )
    if custom_reference_groups is None:
        custom_reference_groups = pd.DataFrame(
            columns=["parameter_id", "feature", "ref_group"]
        )
    params = fill_parameter_defaults(parameters, cfg)

    # rank -> human-readable name mapping (R/ctas.R:64-66)
    rank_names: dict[tuple[str, str], str] = {}
    tp2 = data["timepoint_2_name"] if "timepoint_2_name" in data.columns else None
    for i, (pid, rank, t1) in enumerate(
        zip(data["parameter_id"], data["timepoint_rank"], data["timepoint_1_name"])
    ):
        t2 = tp2.iloc[i] if tp2 is not None else None
        key = (pid, str(int(rank)) if float(rank).is_integer() else str(rank))
        if key not in rank_names:
            rank_names[key] = f"{t1}_{t2 if t2 is not None and t2 == t2 else 'NA'}"

    pres = presence_index(data)
    if len(pres) == 0:
        return _empty_result(cfg)  # R/ctas.R:76-81

    series = plan_study_series(
        pres,
        params,
        custom_timeseries,
        subjects,
        cfg.autogen_enabled,
        cfg.autogen_type,
        cfg.optimize_sites_and_patients,
    )
    if len(series) == 0:
        return _empty_result(cfg)  # R/ctas.R:143-148

    feat_of_param = params.set_index("parameter_id")["timeseries_features_to_calculate"]
    scm_of_param = params.set_index("parameter_id")["subject_count_min"]
    site_of_subject = dict(zip(subjects["subject_id"], subjects["site"]))

    ts_rows = []
    feat_frames = []
    pca_frames = []
    for _, srow in series.iterrows():
        # cfb series need >1 timepoint (R/ctas.R:157)
        if srow["baseline"] != "original" and srow["timepoint_count"] <= 1:
            continue
        m = data[data["parameter_id"] == srow["parameter_id"]]
        built = build_wide_timeseries(
            m, srow["timepoint_combo"], srow["timepoint_combo_subjects"], srow["baseline"]
        )
        if built is None:
            continue  # R/ctas.R:160
        subj_ids, wide = built
        pca = timeseries_pca(subj_ids, wide)
        feats = timeseries_features_long(
            subj_ids,
            wide,
            srow["baseline"],
            feat_of_param[srow["parameter_id"]],
            site_of_subject,
            max_subjects_for_pairwise=cfg.max_subjects_for_pairwise,
        )
        ts_rows.append(
            {
                "timeseries_id": srow["timeseries_id"],
                "parameter_id": srow["parameter_id"],
                "baseline": srow["baseline"],
                "timepoint_combo": srow["timepoint_combo"],
                "timepoint_combo_readable": readable_combo(
                    srow["timepoint_combo"], srow["parameter_id"], rank_names
                ),
                "timepoint_count": srow["timepoint_count"],
            }
        )
        feats.insert(0, "timeseries_id", srow["timeseries_id"])
        pca.insert(0, "timeseries_id", srow["timeseries_id"])
        feat_frames.append(feats)
        pca_frames.append(pca)

    if not ts_rows:
        return _empty_result(cfg)

    tso_timeseries = pd.DataFrame(ts_rows)
    tso_features = pd.concat(feat_frames, ignore_index=True).merge(
        subjects, on="subject_id", how="left"
    )
    tso_features = tso_features.rename(columns={"value": "feature_value"})
    tso_features = tso_features[
        ["timeseries_id", "subject_id", "feature", "feature_value"]
        + [c for c in ("site", "country", "region") if c in tso_features.columns]
    ]
    tso_pca = pd.concat(pca_frames, ignore_index=True)[
        ["timeseries_id", "subject_id", "pc1", "pc2"]
    ]

    # ---- site scoring (R/ctas.R:193-281) ----
    scoring = pd.concat(feat_frames, ignore_index=True).merge(
        subjects, on="subject_id", how="inner"
    )
    scoring = scoring.merge(
        tso_timeseries[["timeseries_id", "parameter_id"]], on="timeseries_id"
    )
    scoring["subject_count_min"] = scoring["parameter_id"].map(scm_of_param)
    if len(custom_reference_groups) > 0:
        scoring = scoring.merge(
            custom_reference_groups, on=["parameter_id", "feature"], how="left"
        )
        scoring["ref_group"] = scoring["ref_group"].fillna("global")
    else:
        scoring["ref_group"] = "global"

    group_frames = []
    for (tsid, feature, ref_group), g in scoring.groupby(
        ["timeseries_id", "feature", "ref_group"], sort=True
    ):
        n_sites = g["site"].nunique()
        n = len(g)
        # gates (R/ctas.R:200-207)
        if n_sites < 2 or n < g["subject_count_min"].iloc[0] or not (n_sites < n):
            continue
        if cfg.site_scoring_method == "ks":
            res = score_sites_ks(
                g,
                feature,
                ref_group,
                jitter_sd=cfg.ks_jitter_sd,
                jitter_seed=cfg.ks_jitter_seed,
                seed_key=f"{tsid}|{feature}|{ref_group}",
            )
        elif cfg.site_scoring_method == "avg_feat_value":
            res = score_sites_iqr(g).rename(columns={"site": "entity"})
        elif cfg.site_scoring_method in SCORING_REGISTRY:  # §2.10 extension
            fn, cols = SCORING_REGISTRY[cfg.site_scoring_method]
            res = fn(g).reindex(columns=cols)
        else:  # mixedeffects (documented approximation)
            res = score_sites_mixedeffects_approx(g)
        res.insert(0, "timeseries_id", tsid)
        res.insert(1, "feature", feature)
        res["ref_group"] = ref_group
        group_frames.append(res)

    if group_frames:
        all_scores = pd.concat(group_frames, ignore_index=True)
        if cfg.site_scoring_method == "ks":
            tso_scores = finalize_ks_scores(all_scores, p_adjust, cfg.padjust_method)
        elif cfg.site_scoring_method == "avg_feat_value":
            tso_scores = all_scores[["timeseries_id", "feature", "entity", "is_signal"]]
        elif cfg.site_scoring_method in SCORING_REGISTRY:
            tso_scores = all_scores  # registered method owns its statistics
        else:
            adj = p_adjust(
                all_scores["p_value"].to_numpy(dtype=np.float64), cfg.padjust_method
            )
            with np.errstate(all="ignore"):
                logp = -np.log10(adj)
            logp[np.isinf(logp)] = 30.0
            all_scores["fdr_corrected_pvalue_logp"] = logp
            tso_scores = all_scores[
                ["timeseries_id", "feature", "entity", "mean", "median", "sd",
                 "p_value", "fdr_corrected_pvalue_logp"]
            ]
    else:
        # typed empty frames per method (R/ctas.R:258-281)
        if cfg.site_scoring_method == "ks":
            tso_scores = pd.DataFrame(
                columns=["timeseries_id", "site", "country", "region", "feature",
                         "pvalue_kstest_logp", "kstest_statistic",
                         "fdr_corrected_pvalue_logp", "ref_group", "subject_count"]
            )
        elif cfg.site_scoring_method == "avg_feat_value":
            tso_scores = pd.DataFrame(
                columns=["timeseries_id", "feature", "entity", "is_signal"]
            )
        else:
            tso_scores = pd.DataFrame(
                columns=["timeseries_id", "feature", "entity", "mean", "median",
                         "sd", "p_value", "fdr_corrected_pvalue_logp"]
            )

    return {
        "timeseries": tso_timeseries,
        "timeseries_features": tso_features,
        "PCA_coordinates": tso_pca,
        "site_scores": tso_scores,
    }
