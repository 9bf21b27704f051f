"""Series planning: auto-generate time-series definitions per parameter.

Pure pandas/numpy transcription of the reference's planning stage
(R/ctas.R:84-151): presence index -> candidate rank ordering
(consecutive / adaptive) -> prefix walk with the 20%-growth acceptance
rule -> optional max-sites optimisation -> custom-series validation ->
deterministic id minting.

These functions run per-parameter inside a Ray ``map_groups`` (the
presence index is tiny relative to raw data: one row per distinct
(subject, rank, has-baseline) tuple), or driver-side for small studies.
Emission order is deterministic and matches the reference's
``row_number()`` id contract (SURVEY.md §3.2): parameter_id ascending,
baseline original-then-cfb, prefixes longest-first.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = [
    "presence_index",
    "order_timepoint_ranks",
    "pick_timepoint_combos",
    "pick_subjects_for_custom_timeseries",
    "plan_study_series",
]


def _fmt_rank(r: float) -> str:
    """Format a numeric rank the way R ``paste`` does (integral -> '3')."""
    return str(int(r)) if float(r).is_integer() else repr(float(r))


def _eligible_count(count: float, max_share_missing: float) -> float:
    """R: ceiling((1 - max_share_missing) * timepoint_count) — same IEEE
    double ops as R so edge cases round identically (R/ctas.R:824,927)."""
    return math.ceil((1.0 - max_share_missing) * count)


def presence_index(data: pd.DataFrame) -> pd.DataFrame:
    """Distinct (parameter_id, subject_id, timepoint_rank, has_baseline_value)
    over non-null, non-blank results (R/ctas.R:69-73)."""
    result = data["result"]
    ok = result.notna()
    if result.dtype == object:
        ok &= result.astype(str) != ""
    df = data.loc[ok, ["parameter_id", "subject_id", "timepoint_rank", "baseline"]].copy()
    has_bl = df["baseline"].notna()
    if df["baseline"].dtype == object:
        has_bl &= df["baseline"].astype(str) != ""
    df["has_baseline_value"] = np.where(has_bl, "Yes", "No")
    df = df.drop(columns=["baseline"])
    df = (
        df.sort_values(["parameter_id", "subject_id", "timepoint_rank", "has_baseline_value"])
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return df


def order_timepoint_ranks(pres: pd.DataFrame, autogen_type: str) -> np.ndarray:
    """Candidate rank ordering: sorted unique ranks for 'consecutive'
    (R/ctas.R:862); adaptive scoring (R/ctas.R:863-896) otherwise —
    score = consistency_pctl + patients_pctl + rank_pctl, ordered by
    (score desc, rank desc)."""
    if autogen_type == "consecutive":
        return np.sort(pres["timepoint_rank"].unique())
    # adaptive
    visits = pres.groupby("timepoint_rank").size().rename("nr_patients").reset_index()
    visits["timepoint_rank_percentile"] = (
        visits["timepoint_rank"] / visits["timepoint_rank"].max()
    )
    visits["nr_patients_percentile"] = visits["nr_patients"] / visits["nr_patients"].max()
    nr_visits = pres.groupby("subject_id").size().rename("nr_visits")
    scored = pres.join(nr_visits, on="subject_id")
    consistency = (
        scored.groupby("timepoint_rank")["nr_visits"].sum().rename("nr_patient_consistency")
    ).reset_index()
    consistency = consistency.merge(
        visits[["timepoint_rank", "nr_patients_percentile", "timepoint_rank_percentile"]],
        on="timepoint_rank",
    )
    consistency["nr_patient_consistency_percentile"] = (
        consistency["nr_patient_consistency"]
        / consistency["nr_patient_consistency"].max()
    )
    consistency["score"] = (
        consistency["nr_patient_consistency_percentile"]
        + consistency["nr_patients_percentile"]
        + consistency["timepoint_rank_percentile"]
    )
    consistency = consistency.sort_values("timepoint_rank", ascending=False, kind="mergesort")
    consistency = consistency.sort_values("score", ascending=False, kind="mergesort")
    return consistency["timepoint_rank"].to_numpy()


def _prefix_eligibility(
    pres: pd.DataFrame, rank_order: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorised eligibility engine for the prefix walk.

    Returns (subject_ids sorted asc, counts matrix of shape
    (n_subjects, n_prefixes) where counts[s, k] = measurement rows of
    subject s over the first k+1 ranks of ``rank_order``, rank_order).

    One pass replaces the reference's O(prefixes x data) re-scan
    (R/ctas.R:915-927): per-(subject, rank) row counts, column-reordered
    to ``rank_order`` then cumsummed.
    """
    subjects = np.sort(pres["subject_id"].unique())
    subj_pos = {s: i for i, s in enumerate(subjects)}
    rank_pos = {r: i for i, r in enumerate(rank_order)}
    mat = np.zeros((len(subjects), len(rank_order)), dtype=np.int64)
    counts = pres.groupby(["subject_id", "timepoint_rank"]).size()
    for (s, r), c in counts.items():
        if r in rank_pos:
            mat[subj_pos[s], rank_pos[r]] = c
    return subjects, np.cumsum(mat, axis=1), rank_order


def pick_timepoint_combos(
    autogen_type: str,
    pres: pd.DataFrame,
    time_point_count_min: float,
    subject_count_min: float,
    max_share_missing: float,
    baseline: str,
    subjects_df: pd.DataFrame | None = None,
    optimize_sites_and_patients: bool = False,
) -> pd.DataFrame:
    """The prefix walk (pick_timepoint_combos, R/ctas.R:845-972).

    ``pres`` is this parameter's slice of the presence index. Returns a
    frame (timepoint_combo, timepoint_combo_subjects) in emission order
    (longest prefix first), combos ';'-packed like the reference.
    """
    if baseline == "cfb":
        pres = pres[pres["has_baseline_value"] == "Yes"]  # R/ctas.R:856-860
    if len(pres) == 0:
        return pd.DataFrame({"timepoint_combo": [], "timepoint_combo_subjects": []})
    rank_order = order_timepoint_ranks(pres, autogen_type)
    n_ranks = len(rank_order)
    if n_ranks < time_point_count_min:
        return pd.DataFrame({"timepoint_combo": [], "timepoint_combo_subjects": []})
    subjects, cum, _ = _prefix_eligibility(pres, rank_order)

    tp_max = math.inf
    if optimize_sites_and_patients and subjects_df is not None:
        tp_max = _max_sites_and_subjects_index(
            subjects, cum, subjects_df, max_share_missing, subject_count_min,
            time_point_count_min,
        )

    combos: list[str] = []
    subject_lists: list[str] = []
    prev_count = 0
    start = int(time_point_count_min)
    for last_idx in range(n_ranks, start - 1, -1):  # longest -> shortest
        k = last_idx  # prefix length
        need = _eligible_count(k, max_share_missing)
        eligible_mask = cum[:, k - 1] >= need
        # subjects with zero measurements never appear in pres, so cum>0
        elig = subjects[eligible_mask]
        num = len(elig)
        if num < subject_count_min:
            continue
        accept = (
            prev_count == 0
            or (num - prev_count >= subject_count_min and num / prev_count >= 1.2)
            or (
                optimize_sites_and_patients
                and num - prev_count >= subject_count_min
                and num > prev_count
                and last_idx == tp_max
            )
        )
        if accept:
            pts = rank_order[:k]
            if autogen_type == "adaptive":
                pts = np.sort(pts)  # R/ctas.R:951 sorts adaptive combos
            combos.append(";".join(_fmt_rank(r) for r in pts))
            subject_lists.append(";".join(elig))
            prev_count = num
    return pd.DataFrame(
        {"timepoint_combo": combos, "timepoint_combo_subjects": subject_lists}
    )


def _max_sites_and_subjects_index(
    subjects: np.ndarray,
    cum: np.ndarray,
    subjects_df: pd.DataFrame,
    max_share_missing: float,
    subject_count_min: float,
    time_point_count_min: float,
) -> float:
    """get_max_sites_and_subjects (R/ctas.R:985-1039): for each prefix
    length meeting the subject minimum, count distinct eligible subjects
    and sites; return the prefix index maximising
    (n_sites desc, n_subjects desc, prefix length desc); Inf if none."""
    site_of = subjects_df.set_index("subject_id")["site"]
    sites = site_of.reindex(subjects).to_numpy()
    best: tuple[int, int, int] | None = None
    n_ranks = cum.shape[1]
    for last_idx in range(n_ranks, int(time_point_count_min) - 1, -1):
        need = _eligible_count(last_idx, max_share_missing)
        mask = cum[:, last_idx - 1] >= need
        n_subj = int(mask.sum())
        if n_subj < subject_count_min:
            continue
        n_sites = len(pd.unique(sites[mask]))
        cand = (n_sites, n_subj, last_idx)
        if best is None or cand > best:
            best = cand
    return float(best[2]) if best else math.inf


def pick_subjects_for_custom_timeseries(
    pres: pd.DataFrame,
    timepoints_string: str,
    max_share_missing: float,
    parameter_id: str,
    baseline: str,
) -> str:
    """pick_subjects_for_custom_timeseries (R/ctas.R:803-829): eligible
    subjects for an explicit combo, ';'-packed (may be '' when none)."""
    if baseline == "cfb":
        pres = pres[pres["has_baseline_value"] == "Yes"]
    pts = [float(t) for t in timepoints_string.split(";")]
    tp_count = len(pts)
    sub = pres[
        (pres["parameter_id"] == parameter_id)
        & (pres["timepoint_rank"].astype(float).isin(pts))
    ]
    counts = sub.groupby("subject_id").size()
    need = _eligible_count(tp_count, max_share_missing)
    chosen = sorted(counts[counts >= need].index)
    return ";".join(chosen)


def plan_study_series(
    pres: pd.DataFrame,
    parameters: pd.DataFrame,
    custom_timeseries: pd.DataFrame,
    subjects_df: pd.DataFrame,
    autogen_enabled: bool,
    autogen_type: str,
    optimize_sites_and_patients: bool = False,
) -> pd.DataFrame:
    """Full planning stage -> series-definition table with columns
    (timeseries_id, parameter_id, baseline, timepoint_combo,
    timepoint_combo_subjects, timepoint_count).

    Id minting reproduces the reference's ``row_number()`` order contract
    (R/ctas.R:87-99; SURVEY.md §3.2): parameters ascending, baseline
    original-then-cfb, prefixes longest-first; ids ts_<n>_autogen_<baseline>.
    ``parameters`` must already have defaults filled (R/ctas.R:54-61).
    """
    rows: list[dict] = []
    if autogen_enabled:
        params = parameters.sort_values("parameter_id")
        for _, prow in params.iterrows():
            if bool(prow["use_only_custom_timeseries"]):
                continue  # R/ctas.R:90
            p_pres = pres[pres["parameter_id"] == prow["parameter_id"]]
            baselines = (
                ["original", "cfb"]
                if bool(prow["generate_change_from_baseline"])
                else ["original"]
            )
            for bl in baselines:
                combos = pick_timepoint_combos(
                    autogen_type,
                    p_pres,
                    prow["time_point_count_min"],
                    prow["subject_count_min"],
                    prow["max_share_missing"],
                    bl,
                    subjects_df,
                    optimize_sites_and_patients,
                )
                for _, c in combos.iterrows():
                    rows.append(
                        {
                            "parameter_id": prow["parameter_id"],
                            "baseline": bl,
                            "timepoint_combo": c["timepoint_combo"],
                            "timepoint_combo_subjects": c["timepoint_combo_subjects"],
                        }
                    )
    auto = pd.DataFrame(rows, columns=["parameter_id", "baseline", "timepoint_combo", "timepoint_combo_subjects"])
    if len(auto):
        auto["timeseries_id"] = [
            f"ts_{i + 1}_autogen_{bl}" for i, bl in enumerate(auto["baseline"])
        ]
    else:
        auto["timeseries_id"] = pd.Series([], dtype=object)
    # anti-join away autogen series duplicated by custom ones (R/ctas.R:104-109)
    if len(custom_timeseries) > 0 and len(auto) > 0:
        key = set(
            zip(custom_timeseries["parameter_id"], custom_timeseries["timepoint_combo"])
        )
        auto = auto[
            [
                (p, c) not in key
                for p, c in zip(auto["parameter_id"], auto["timepoint_combo"])
            ]
        ]
    frames = [auto]
    if len(custom_timeseries) > 0:
        crow_list: list[dict] = []
        pcfg = parameters.set_index("parameter_id")
        for _, crow in custom_timeseries.iterrows():
            pid = crow["parameter_id"]
            baselines = (
                ["original", "cfb"]
                if bool(pcfg.loc[pid, "generate_change_from_baseline"])
                else ["original"]
            )
            for bl in baselines:
                subj = pick_subjects_for_custom_timeseries(
                    pres, crow["timepoint_combo"], pcfg.loc[pid, "max_share_missing"], pid, bl
                )
                # R gate: str_count(subjects, ';') + 1 >= subject_count_min
                # (empty string still counts as 1 — replicated faithfully)
                if subj.count(";") + 1 >= pcfg.loc[pid, "subject_count_min"]:
                    crow_list.append(
                        {
                            "timeseries_id": f"{crow['timeseries_id']}_{bl}",
                            "parameter_id": pid,
                            "baseline": bl,
                            "timepoint_combo": crow["timepoint_combo"],
                            "timepoint_combo_subjects": subj,
                        }
                    )
        frames.append(pd.DataFrame(crow_list, columns=auto.columns))
    out = pd.concat(frames, ignore_index=True)
    out["timepoint_count"] = out["timepoint_combo"].str.count(";") + 1  # R/ctas.R:151
    return out[
        [
            "timeseries_id",
            "parameter_id",
            "baseline",
            "timepoint_combo",
            "timepoint_combo_subjects",
            "timepoint_count",
        ]
    ]
