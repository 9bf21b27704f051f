"""Distributed study screen: the reference's ``process_a_study``
(R/ctas.R:29-287) re-expressed as a Ray Data pipeline.

Physical plan (SURVEY.md §7.3):

  data (Dataset)
    -> presence projection (map_batches, local dedup)          # narrow
    -> groupby(parameter_id).map_groups(plan per parameter)    # shuffle P1
         (presence rows per parameter are tiny vs raw data)
    -> driver: mint ids in the reference's row_number order
    -> broadcast series defs (ray.put) -> explode measurements
       to (timeseries_id, ...) assignments (map_batches)       # narrow
    -> groupby(timeseries_id).map_groups(features + PCA)       # shuffle P2
    -> decorate with site/country/region + ref_group
       (broadcast lookup, map_batches)                          # narrow
    -> groupby(ts, feature, ref_group).map_groups(KS/IQR/ME)   # shuffle P3
    -> driver: global FDR barrier (one small p-value column)

The dimension tables (parameters, subjects, custom_*) are broadcast via
``ray.put`` — J1-J3 of SURVEY.md §2.5. At 10^8+ subjects the decoration
join should switch to a co-partitioned ``Dataset.join``; the broadcast
threshold is explicit below.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from ..config import StudyConfig
from ..functions.stats import p_adjust
from ..oracle import fill_parameter_defaults, readable_combo
from ..planning import pick_timepoint_combos, pick_subjects_for_custom_timeseries
from ..study_core import (
    build_wide_timeseries,
    finalize_ks_scores,
    score_sites_iqr,
    score_sites_ks,
    score_sites_mixedeffects_approx,
    timeseries_features_long,
    timeseries_pca,
)

__all__ = ["process_a_study_ray"]

BROADCAST_SUBJECT_LIMIT = 5_000_000  # above this, switch decoration to a join


def _presence_project(batch: pd.DataFrame) -> pd.DataFrame:
    """M2/M3 projection + per-batch local dedup (global dedup happens in
    the per-parameter group)."""
    ok = batch["result"].notna()
    out = batch.loc[ok, ["parameter_id", "subject_id", "timepoint_rank", "baseline"]].copy()
    out["has_baseline_value"] = np.where(out["baseline"].notna(), "Yes", "No")
    out = out.drop(columns=["baseline"])
    return out.drop_duplicates()


def _plan_group(
    group: pd.DataFrame,
    param_cfg: dict,
    autogen_type: str,
    optimize: bool,
    subjects_df: pd.DataFrame,
) -> pd.DataFrame:
    """Per-parameter planning group body: dedup presence rows, run the
    prefix walk per baseline variant, emit combos tagged with emission
    order (ids minted at the driver)."""
    pid = group["parameter_id"].iloc[0]
    cfgrow = param_cfg.get(pid)
    if cfgrow is None or cfgrow["use_only_custom_timeseries"]:
        return pd.DataFrame(
            columns=["parameter_id", "baseline", "timepoint_combo",
                     "timepoint_combo_subjects", "emit_order"]
        )
    pres = group.drop_duplicates(
        subset=["parameter_id", "subject_id", "timepoint_rank", "has_baseline_value"]
    )
    baselines = (
        ["original", "cfb"] if cfgrow["generate_change_from_baseline"] else ["original"]
    )
    rows = []
    order = 0
    for bl in baselines:
        combos = pick_timepoint_combos(
            autogen_type,
            pres,
            cfgrow["time_point_count_min"],
            cfgrow["subject_count_min"],
            cfgrow["max_share_missing"],
            bl,
            subjects_df,
            optimize,
        )
        for _, c in combos.iterrows():
            rows.append(
                {
                    "parameter_id": pid,
                    "baseline": bl,
                    "timepoint_combo": c["timepoint_combo"],
                    "timepoint_combo_subjects": c["timepoint_combo_subjects"],
                    "emit_order": order,
                }
            )
            order += 1
    return pd.DataFrame(
        rows,
        columns=["parameter_id", "baseline", "timepoint_combo",
                 "timepoint_combo_subjects", "emit_order"],
    )


def _explode_assignments(batch: pd.DataFrame, defs_ref) -> pd.DataFrame:
    """Tag each measurement with every series it belongs to (series of
    its parameter whose combo contains its rank AND whose subject list
    contains its subject). Amplification = series per parameter (small:
    nested prefixes). Broadcast defs are read once per task."""
    defs = ray.get(defs_ref) if not isinstance(defs_ref, dict) else defs_ref
    frames = []
    for pid, series_list in defs.items():
        sub = batch[batch["parameter_id"] == pid]
        if len(sub) == 0:
            continue
        ranks = sub["timepoint_rank"].to_numpy(dtype=np.float64)
        subj = sub["subject_id"].to_numpy(dtype=object)
        for tsid, combo_ranks, combo_subjects in series_list:
            mask = np.isin(ranks, combo_ranks) & pd.Series(subj).isin(combo_subjects).to_numpy()
            if mask.any():
                sel = sub.loc[mask, ["subject_id", "timepoint_rank", "result", "baseline"]].copy()
                sel.insert(0, "timeseries_id", tsid)
                frames.append(sel)
    if not frames:
        return pd.DataFrame(
            columns=["timeseries_id", "subject_id", "timepoint_rank", "result", "baseline"]
        )
    return pd.concat(frames, ignore_index=True)


def _series_group(
    group: pd.DataFrame,
    meta_ref,
) -> pd.DataFrame:
    """Per-timeseries group body: wide assembly, features, PCA.
    Emits union rows: kind='feat' (subject_id, feature, value) and
    kind='pca' (subject_id, pc1->feature='pc1' etc.)."""
    meta = ray.get(meta_ref) if not isinstance(meta_ref, dict) else meta_ref
    tsid = group["timeseries_id"].iloc[0]
    m = meta["series"][tsid]
    built = build_wide_timeseries(
        group, m["timepoint_combo"], m["timepoint_combo_subjects"], m["baseline"]
    )
    cols = ["timeseries_id", "subject_id", "feature", "value", "kind"]
    if built is None:
        return pd.DataFrame(columns=cols)
    subj_ids, wide = built
    feats = timeseries_features_long(
        subj_ids, wide, m["baseline"], m["features"], meta["site_of_subject"]
    )
    feats["kind"] = "feat"
    feats.insert(0, "timeseries_id", tsid)
    pca = timeseries_pca(subj_ids, wide)
    out_frames = [feats[cols[:4] + ["kind"]]]
    if len(pca):
        pca_long = pd.concat(
            [
                pd.DataFrame(
                    {"timeseries_id": tsid, "subject_id": pca["subject_id"],
                     "feature": name, "value": pca[name], "kind": "pca"}
                )
                for name in ("pc1", "pc2")
            ],
            ignore_index=True,
        )
        out_frames.append(pca_long)
    return pd.concat(out_frames, ignore_index=True).reindex(columns=cols)


def _decorate(batch: pd.DataFrame, lookup_ref) -> pd.DataFrame:
    """Attach site/country/region + subject_count_min + ref_group via
    broadcast dict lookups (J2/J3)."""
    lk = ray.get(lookup_ref) if not isinstance(lookup_ref, dict) else lookup_ref
    out = batch.copy()
    subj = out["subject_id"].map(lk["subjects"])
    missing = subj.isna()
    out = out[~missing]
    subj = subj[~missing]
    out["site"] = [s[0] for s in subj]
    out["country"] = [s[1] for s in subj]
    out["region"] = [s[2] for s in subj]
    pid = out["timeseries_id"].map(lk["param_of_series"])
    out["parameter_id"] = pid
    out["subject_count_min"] = pid.map(lk["scm"])
    keys = list(zip(pid, out["feature"]))
    out["ref_group"] = [lk["ref_groups"].get(k, "global") for k in keys]
    return out


def _score_group(group: pd.DataFrame, method: str, jitter_sd: float, jitter_seed) -> pd.DataFrame:
    """Per-(timeseries, feature, ref_group) scoring with the eligibility
    gates (A5, R/ctas.R:200-207)."""
    tsid = group["timeseries_id"].iloc[0]
    feature = group["feature"].iloc[0]
    ref_group = group["ref_group"].iloc[0]
    ks_cols = ["timeseries_id", "feature", "ref_group", "site", "pvalue_kstest",
               "kstest_statistic", "region", "country", "subj_count"]
    n_sites = group["site"].nunique()
    n = len(group)
    if n_sites < 2 or n < group["subject_count_min"].iloc[0] or not (n_sites < n):
        if method == "ks":
            return pd.DataFrame(columns=ks_cols)
        if method == "avg_feat_value":
            return pd.DataFrame(columns=["timeseries_id", "feature", "ref_group", "entity", "avg_value", "is_signal"])
        return pd.DataFrame(columns=["timeseries_id", "feature", "ref_group", "entity",
                                     "groupFctr", "mean", "median", "sd", "z_score", "p_value"])
    if method == "ks":
        res = score_sites_ks(
            group, feature, ref_group, jitter_sd=jitter_sd, jitter_seed=jitter_seed,
            seed_key=f"{tsid}|{feature}|{ref_group}",
        )
    elif method == "avg_feat_value":
        res = score_sites_iqr(group).rename(columns={"site": "entity"})
    else:
        res = score_sites_mixedeffects_approx(group)
    res.insert(0, "timeseries_id", tsid)
    res.insert(1, "feature", feature)
    res.insert(2, "ref_group", ref_group)
    if method == "ks":
        return res.reindex(columns=ks_cols)
    return res


def process_a_study_ray(
    data: rd.Dataset,
    subjects: pd.DataFrame,
    parameters: pd.DataFrame,
    custom_timeseries: pd.DataFrame | None = None,
    custom_reference_groups: pd.DataFrame | None = None,
    cfg: StudyConfig = StudyConfig(),
    features_as_dataset: bool = False,
    decorate_with_join: bool | None = None,
) -> dict:
    """Distributed study screen. ``data`` is the (possibly huge)
    measurement Dataset; dimension tables are small pandas frames.

    Returns the reference's four outputs; ``timeseries_features`` and
    ``PCA_coordinates`` come back as pandas by default or as Datasets
    when ``features_as_dataset`` (big-study mode — they scale with
    subjects x series x features).
    """
    if custom_timeseries is None:
        custom_timeseries = pd.DataFrame(columns=["timeseries_id", "parameter_id", "timepoint_combo"])
    if custom_reference_groups is None:
        custom_reference_groups = pd.DataFrame(columns=["parameter_id", "feature", "ref_group"])
    params = fill_parameter_defaults(parameters, cfg)
    param_cfg = {
        r["parameter_id"]: {
            "time_point_count_min": r["time_point_count_min"],
            "subject_count_min": r["subject_count_min"],
            "max_share_missing": r["max_share_missing"],
            "generate_change_from_baseline": bool(r["generate_change_from_baseline"]),
            "use_only_custom_timeseries": bool(r["use_only_custom_timeseries"]),
            "features": r["timeseries_features_to_calculate"],
        }
        for _, r in params.iterrows()
    }

    # ---- rank -> readable-name mapping (small distinct) ----
    names = data.map_batches(
        lambda b: b[["parameter_id", "timepoint_rank", "timepoint_1_name", "timepoint_2_name"]]
        .drop_duplicates(subset=["parameter_id", "timepoint_rank"]),
        batch_format="pandas",
    ).to_pandas().drop_duplicates(subset=["parameter_id", "timepoint_rank"])
    rank_names = {}
    for _, r in names.iterrows():
        rank = r["timepoint_rank"]
        key = (r["parameter_id"], str(int(rank)) if float(rank).is_integer() else str(rank))
        t2 = r["timepoint_2_name"]
        rank_names.setdefault(key, f"{r['timepoint_1_name']}_{t2 if t2 is not None and t2 == t2 else 'NA'}")

    # ---- presence + per-parameter planning (shuffle P1) ----
    pres_ds = data.map_batches(_presence_project, batch_format="pandas")
    planned = (
        pres_ds.groupby("parameter_id")
        .map_groups(
            functools.partial(
                _plan_group,
                param_cfg=param_cfg,
                autogen_type=cfg.autogen_type,
                optimize=cfg.optimize_sites_and_patients,
                subjects_df=subjects[["subject_id", "site"]],
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    empty = {
        "timeseries": None, "timeseries_features": None,
        "PCA_coordinates": None, "site_scores": None,
    }
    # ---- driver: id minting in reference order + custom series ----
    series_rows = []
    if cfg.autogen_enabled and len(planned):
        planned = planned.sort_values(["parameter_id", "emit_order"], kind="mergesort")
        planned["timeseries_id"] = [
            f"ts_{i + 1}_autogen_{bl}" for i, bl in enumerate(planned["baseline"])
        ]
        if len(custom_timeseries):
            key = set(zip(custom_timeseries["parameter_id"], custom_timeseries["timepoint_combo"]))
            planned = planned[
                [(p, c) not in key for p, c in zip(planned["parameter_id"], planned["timepoint_combo"])]
            ]
        series_rows.append(planned.drop(columns=["emit_order"]))
    if len(custom_timeseries):
        # custom validation needs the full presence index for its params
        pres_small = pres_ds.map_batches(
            lambda b: b[b["parameter_id"].isin(set(custom_timeseries["parameter_id"]))],
            batch_format="pandas",
        ).to_pandas().drop_duplicates()
        crows = []
        for _, crow in custom_timeseries.iterrows():
            pid = crow["parameter_id"]
            pc_ = param_cfg[pid]
            baselines = ["original", "cfb"] if pc_["generate_change_from_baseline"] else ["original"]
            for bl in baselines:
                subj = pick_subjects_for_custom_timeseries(
                    pres_small, crow["timepoint_combo"], pc_["max_share_missing"], pid, bl
                )
                if subj.count(";") + 1 >= pc_["subject_count_min"]:
                    crows.append(
                        {"parameter_id": pid, "baseline": bl,
                         "timepoint_combo": crow["timepoint_combo"],
                         "timepoint_combo_subjects": subj,
                         "timeseries_id": f"{crow['timeseries_id']}_{bl}"}
                    )
        if crows:
            series_rows.append(pd.DataFrame(crows))
    if not series_rows:
        return empty
    series = pd.concat(series_rows, ignore_index=True)
    if len(series) == 0:
        return empty
    series["timepoint_count"] = series["timepoint_combo"].str.count(";") + 1
    # cfb series need >1 timepoint (R/ctas.R:157)
    series = series[(series["baseline"] == "original") | (series["timepoint_count"] > 1)]
    if len(series) == 0:
        return empty

    # ---- broadcast series defs + explode assignments ----
    defs: dict[str, list] = {}
    for _, s in series.iterrows():
        defs.setdefault(s["parameter_id"], []).append(
            (
                s["timeseries_id"],
                np.array([float(x) for x in s["timepoint_combo"].split(";")]),
                set(x for x in s["timepoint_combo_subjects"].split(";") if x),
            )
        )
    defs_ref = ray.put(defs)
    assigned = data.map_batches(
        functools.partial(_explode_assignments, defs_ref=defs_ref),
        batch_format="pandas",
    )

    # ---- per-series features + PCA (shuffle P2) ----
    meta = {
        "series": {
            s["timeseries_id"]: {
                "timepoint_combo": s["timepoint_combo"],
                "timepoint_combo_subjects": s["timepoint_combo_subjects"],
                "baseline": s["baseline"],
                "features": param_cfg[s["parameter_id"]]["features"],
            }
            for _, s in series.iterrows()
        },
        "site_of_subject": dict(zip(subjects["subject_id"], subjects["site"])),
    }
    meta_ref = ray.put(meta)
    series_out = assigned.groupby("timeseries_id").map_groups(
        functools.partial(_series_group, meta_ref=meta_ref), batch_format="pandas"
    )
    # consumed by BOTH the feature and the PCA branches: pin the blocks
    # once instead of re-executing the explode+group lineage per branch.
    # (bounded: rows = subjects x series x (features + 2), far smaller
    # than the raw measurements; spills to disk if needed)
    series_out = series_out.materialize()

    feat_ds = series_out.map_batches(
        lambda b: b[b["kind"] == "feat"].drop(columns=["kind"]), batch_format="pandas"
    )
    pca_ds = series_out.map_batches(
        lambda b: b[b["kind"] == "pca"].drop(columns=["kind"]), batch_format="pandas"
    )

    # ---- decoration + scoring groups (shuffle P3) ----
    use_join = (
        decorate_with_join
        if decorate_with_join is not None
        else len(subjects) > BROADCAST_SUBJECT_LIMIT
    )
    if use_join:
        # J2 scale path: subjects too big to broadcast -> hash-partitioned
        # Dataset.join keyed on subject_id (co-partitioned with the
        # feature rows), then the small per-series/ref-group lookups
        subjects_ds = rd.from_pandas(
            subjects[["subject_id", "site", "country", "region"]]
        )
        n_parts = 16
        joined = feat_ds.join(
            subjects_ds, join_type="inner", num_partitions=n_parts,
            on=("subject_id",),
        )
        small = {
            "param_of_series": dict(zip(series["timeseries_id"], series["parameter_id"])),
            "scm": {p: c["subject_count_min"] for p, c in param_cfg.items()},
            "ref_groups": {
                (r["parameter_id"], r["feature"]): r["ref_group"]
                for _, r in custom_reference_groups.iterrows()
            },
        }
        small_ref = ray.put(small)

        def attach_small(b: pd.DataFrame) -> pd.DataFrame:
            lk = ray.get(small_ref)
            pid = b["timeseries_id"].map(lk["param_of_series"])
            b["parameter_id"] = pid
            b["subject_count_min"] = pid.map(lk["scm"])
            keys = list(zip(pid, b["feature"]))
            b["ref_group"] = [lk["ref_groups"].get(k, "global") for k in keys]
            return b

        decorated = joined.map_batches(attach_small, batch_format="pandas")
    else:
        lookup = {
            "subjects": {
                r["subject_id"]: (r["site"], r["country"], r["region"])
                for _, r in subjects.iterrows()
            },
            "param_of_series": dict(zip(series["timeseries_id"], series["parameter_id"])),
            "scm": {p: c["subject_count_min"] for p, c in param_cfg.items()},
            "ref_groups": {
                (r["parameter_id"], r["feature"]): r["ref_group"]
                for _, r in custom_reference_groups.iterrows()
            },
        }
        lookup_ref = ray.put(lookup)
        decorated = feat_ds.map_batches(
            functools.partial(_decorate, lookup_ref=lookup_ref), batch_format="pandas"
        )
    decorated = decorated.materialize()  # consumed by scoring + output
    scored = decorated.groupby(["timeseries_id", "feature", "ref_group"]).map_groups(
        functools.partial(
            _score_group,
            method=cfg.site_scoring_method,
            jitter_sd=cfg.ks_jitter_sd,
            jitter_seed=cfg.ks_jitter_seed,
        ),
        batch_format="pandas",
    ).to_pandas()

    # ---- driver: FDR barrier + output shaping ----
    if len(scored):
        if cfg.site_scoring_method == "ks":
            site_scores = finalize_ks_scores(scored, p_adjust, cfg.padjust_method)
        elif cfg.site_scoring_method == "avg_feat_value":
            site_scores = scored[["timeseries_id", "feature", "entity", "is_signal"]]
        else:
            adj = p_adjust(scored["p_value"].to_numpy(dtype=np.float64), cfg.padjust_method)
            with np.errstate(all="ignore"):
                logp = -np.log10(adj)
            logp[np.isinf(logp)] = 30.0
            scored["fdr_corrected_pvalue_logp"] = logp
            site_scores = scored[["timeseries_id", "feature", "entity", "mean", "median",
                                  "sd", "p_value", "fdr_corrected_pvalue_logp"]]
    else:
        site_scores = scored

    timeseries = series[["timeseries_id", "parameter_id", "baseline",
                         "timepoint_combo", "timepoint_count"]].copy()
    timeseries["timepoint_combo_readable"] = [
        readable_combo(c, p, rank_names)
        for c, p in zip(timeseries["timepoint_combo"], timeseries["parameter_id"])
    ]
    timeseries = timeseries[["timeseries_id", "parameter_id", "baseline",
                             "timepoint_combo", "timepoint_combo_readable", "timepoint_count"]]

    if features_as_dataset:
        features_out = decorated
        pca_out = pca_ds
    else:
        features_out = decorated.to_pandas()
        features_out = features_out.rename(columns={"value": "feature_value"})[
            ["timeseries_id", "subject_id", "feature", "feature_value", "site", "country", "region"]
        ]
        pca_wide = pca_ds.to_pandas()
        if len(pca_wide):
            pca_out = pca_wide.pivot_table(
                index=["timeseries_id", "subject_id"], columns="feature",
                values="value", aggfunc="first",
            ).reset_index()
            pca_out.columns.name = None
            pca_out = pca_out[["timeseries_id", "subject_id", "pc1", "pc2"]]
        else:
            pca_out = pd.DataFrame(columns=["timeseries_id", "subject_id", "pc1", "pc2"])

    # drop series that produced no measurements (R/ctas.R:160)
    if features_as_dataset:
        live = timeseries
    else:
        live_ids = set(features_out["timeseries_id"].unique()) | set(
            pca_out["timeseries_id"].unique()
        )
        live = timeseries[timeseries["timeseries_id"].isin(live_ids)]
    if len(live) == 0:
        return empty
    return {
        "timeseries": live.reset_index(drop=True),
        "timeseries_features": features_out,
        "PCA_coordinates": pca_out,
        "site_scores": site_scores,
    }
