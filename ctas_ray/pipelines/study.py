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
import pyarrow as pa

import ray
import ray.data as rd

from ..config import StudyConfig
from ..functions.series import FEATURE_REGISTRY
from ..functions.stats import p_adjust
from ..oracle import fill_parameter_defaults, readable_combo
from ..planning import pick_timepoint_combos, pick_subjects_for_custom_timeseries
from ..sources import arrow_clean
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


def _salt_spans_disjoint(mins, maxs) -> bool:
    """True iff the per-batch [salt_min, salt_max] spans are pairwise
    disjoint — the witness that every salt GROUP lived wholly in one
    batch. groupby(salt) sorts by salt, so each block is a contiguous
    salt range and a split group shows up as two overlapping spans."""
    mn = np.asarray(mins, dtype=np.int64)
    mx = np.asarray(maxs, dtype=np.int64)
    if len(mn) < 2:
        return True
    order = np.argsort(mn, kind="mergesort")
    return bool((mn[order][1:] > mx[order][:-1]).all())


def _typed_arrow(b: pd.DataFrame, types: dict) -> pa.Table:
    """Typed pandas->Arrow projection for hash-exchange (join) inputs.

    Join inputs must be Arrow blocks with (a) no pandas schema metadata
    -- the metadata dict makes ``pyarrow.Schema`` unhashable, defeating
    Ray's schema-dedup fast path in every HashShuffleAggregator reduce
    ("Failed to hash the schemas" per task) -- and (b) explicit column
    types: Ray types an all-null pandas column as Arrow ``null``, which
    pyarrow's hash join rejects for non-key fields. Emitting the table
    ourselves also gives EMPTY batches a full schema, so unused salt
    partitions no longer produce the columnless blocks the join
    aggregator rejects.
    """
    return pa.table(
        {n: pa.Array.from_pandas(b[n], type=t) for n, t in types.items()}
    )


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


_FGROUP_PCA = "__pca__"


def _feature_groups(features) -> list[str]:
    """Split one series' feature list into independently-computable
    GROUPS so the exchange can run them concurrently (VERDICT r3 item
    4): the quadratic per-series kernels (lof, own_site_simil_score)
    each get their own partition, the O(n) scalar features share one,
    and PCA is its own group. A 5-series screen then exposes up to
    5 x 4 = 20 concurrent tasks instead of 5 — the toy-parallelism
    floor of rounds 1-3. Every group rebuilds the (small) wide matrix;
    the quadratic kernels it unblocks dominate that duplication."""
    feats = [f for f in str(features or "").split(";") if f]
    heavy = [f for f in feats if f in ("lof", "own_site_simil_score")]
    light = [f for f in feats if f not in ("lof", "own_site_simil_score")]
    groups: list[str] = []
    if light:
        groups.append(";".join(light))
    groups.extend(heavy)
    groups.append(_FGROUP_PCA)
    return groups


def _series_group(
    group: pd.DataFrame,
    meta_ref,
    fgroup: str | None = None,
) -> pd.DataFrame:
    """Per-timeseries group body: wide assembly, features, PCA.
    Emits union rows: kind='feat' (subject_id, feature, value) and
    kind='pca' (subject_id, pc1->feature='pc1' etc.).

    ``fgroup``: restrict to one feature group from _feature_groups
    (';'-joined feature subset, or _FGROUP_PCA for the PCA branch);
    None computes everything (single-dispatch callers)."""
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
    out_frames = []
    feat_spec = m["features"] if fgroup is None else fgroup
    if feat_spec != _FGROUP_PCA:
        feats = timeseries_features_long(
            subj_ids, wide, m["baseline"], feat_spec,
            meta["site_of_subject"],
            max_subjects_for_pairwise=meta.get("max_pairwise", 20_000),
            extra_features=meta.get("extra_features"),
        )
        feats["kind"] = "feat"
        feats.insert(0, "timeseries_id", tsid)
        out_frames.append(feats[cols[:4] + ["kind"]])
    if fgroup is None or fgroup == _FGROUP_PCA:
        pca = timeseries_pca(
            subj_ids, wide, method=meta.get("pca_method", "svd")
        )
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
    if not out_frames:
        return pd.DataFrame(columns=cols)
    return pd.concat(out_frames, ignore_index=True).reindex(columns=cols)


_SERIES_SALT_PARTS = 64


def _series_salt(batch: pd.DataFrame, part_ref) -> pd.DataFrame:
    """Balanced int64 partition key per (series, feature-group) for the
    feature exchange. The driver knows every series id and its feature
    groups, so (series, group) pairs are dealt round-robin — perfectly
    balanced, no hash collisions until #pairs > #parts. Each series'
    rows are REPLICATED once per feature group (bounded x4), buying
    concurrent execution of its quadratic kernels."""
    slot_maps = ray.get(part_ref) if isinstance(part_ref, ray.ObjectRef) else part_ref
    # slot_maps: list of (fg_of: {tsid: fgroup}, part_of: {tsid: part})
    # — one dict pair per replication slot, so each slot's assignment is
    # a vectorized .map, never a per-row Python loop
    tsid = batch["timeseries_id"]
    frames = []
    for fg_of, p_of in slot_maps:
        fg = tsid.map(fg_of)
        has = fg.notna().to_numpy()
        if not has.any():
            continue
        sub = batch[has].copy(deep=False)
        sub["fgroup"] = fg[has].to_numpy()
        sub["part"] = tsid[has].map(p_of).to_numpy(dtype=np.int64)
        frames.append(sub)
    if not frames:
        out = batch.copy(deep=False)
        out["fgroup"] = ""
        out["part"] = np.int64(0)
        return out.iloc[:0]
    return pd.concat(frames, ignore_index=True)


def _series_partition(part: pd.DataFrame, meta_ref) -> pd.DataFrame:
    """One call per PARTITION: split into (series, feature-group)
    groups locally and run ``_series_group`` on each (never one
    exchange group per series)."""
    meta = ray.get(meta_ref) if not isinstance(meta_ref, dict) else meta_ref
    cols = ["timeseries_id", "subject_id", "feature", "value", "kind"]
    outs = [
        _series_group(
            g.drop(columns=["fgroup"]), meta,
            fgroup=None if fg == "__all__" else fg,
        )
        for (_, fg), g in part.groupby(["timeseries_id", "fgroup"], sort=True)
    ]
    outs = [o for o in outs if len(o)]
    if not outs:
        return pd.DataFrame(columns=cols)
    return pd.concat(outs, ignore_index=True)


def _decorate(batch: pd.DataFrame, lookup_ref) -> pd.DataFrame:
    """Attach site/country/region + subject_count_min + ref_group via
    broadcast dict lookups (J2/J3).

    Subjects missing from the subjects table are KEPT with NaN
    site/country/region — the reference left-joins subjects for the
    timeseries_features output (R/ctas.R:177-180); the scoring branch
    drops them downstream (inner-join semantics, R/ctas.R:196)."""
    lk = ray.get(lookup_ref) if not isinstance(lookup_ref, dict) else lookup_ref
    out = batch.copy()
    subj = out["subject_id"].map(lk["subjects"])
    out["site"] = [s[0] if isinstance(s, tuple) else None for s in subj]
    out["country"] = [s[1] if isinstance(s, tuple) else None for s in subj]
    out["region"] = [s[2] if isinstance(s, tuple) else None for s in subj]
    pid = out["timeseries_id"].map(lk["param_of_series"])
    out["parameter_id"] = pid
    out["subject_count_min"] = pid.map(lk["scm"])
    keys = list(zip(pid, out["feature"]))
    out["ref_group"] = [lk["ref_groups"].get(k, "global") for k in keys]
    return out


def _score_group(
    group: pd.DataFrame, method: str, jitter_sd: float, jitter_seed,
    scoring_registry: dict | None = None,
) -> pd.DataFrame:
    """Per-(timeseries, feature, ref_group) scoring with the eligibility
    gates (A5, R/ctas.R:200-207)."""
    ks_cols = ["timeseries_id", "feature", "ref_group", "site", "pvalue_kstest",
               "kstest_statistic", "region", "country", "subj_count"]
    n_sites = group["site"].nunique()
    n = len(group)
    # module registries don't travel to workers: the caller ships a
    # snapshot through the task closure
    SCORING_REGISTRY = scoring_registry or {}

    def _empty_for_method() -> pd.DataFrame:
        # the per-METHOD empty schema (gate failure AND the n == 0 case
        # from _score_partition's all-gated fallback share it)
        if method == "ks":
            return pd.DataFrame(columns=ks_cols)
        if method == "avg_feat_value":
            return pd.DataFrame(columns=["timeseries_id", "feature", "ref_group", "entity", "avg_value", "is_signal"])
        if method in SCORING_REGISTRY:
            return pd.DataFrame(
                columns=["timeseries_id", "feature", "ref_group"] + SCORING_REGISTRY[method][1]
            )
        return pd.DataFrame(columns=["timeseries_id", "feature", "ref_group", "entity",
                                     "groupFctr", "mean", "median", "sd", "z_score", "p_value"])

    if n == 0:
        return _empty_for_method()
    tsid = group["timeseries_id"].iloc[0]
    feature = group["feature"].iloc[0]
    ref_group = group["ref_group"].iloc[0]

    if n_sites < 2 or n < group["subject_count_min"].iloc[0] or not (n_sites < n):
        return _empty_for_method()
    if method == "ks":
        res = score_sites_ks(
            group, feature, ref_group, jitter_sd=jitter_sd, jitter_seed=jitter_seed,
            seed_key=f"{tsid}|{feature}|{ref_group}",
        )
    elif method == "avg_feat_value":
        res = score_sites_iqr(group).rename(columns={"site": "entity"})
    elif method in SCORING_REGISTRY:
        res = SCORING_REGISTRY[method][0](group).reindex(
            columns=SCORING_REGISTRY[method][1]
        )
    else:
        res = score_sites_mixedeffects_approx(group)
    res.insert(0, "timeseries_id", tsid)
    res.insert(1, "feature", feature)
    res.insert(2, "ref_group", ref_group)
    if method == "ks":
        return res.reindex(columns=ks_cols)
    return res


def _plan_vector(
    pres_ds: rd.Dataset,
    param_cfg: dict,
    autogen_type: str,
    salt_buckets: int = 64,
    custom_timeseries: pd.DataFrame | None = None,
    autogen_enabled: bool = True,
    optimize: bool = False,
    site_of_subject: dict | None = None,
    subject_complete_blocks: bool = False,
) -> tuple[pd.DataFrame, rd.Dataset]:
    """Scalable planning (see ctas_ray.planning_scale): two passes over
    the presence projection, O(#presence rows) work, no per-subject
    matrices and no ';'-packed subject lists.

      E1 (salted by (param, subject)): global dedup + per-(param, rank,
         baseline-flag) count partials -> driver computes rank orders
      E2 (same salt): per-subject positions + eligibility-interval
         delta partials -> driver runs the acceptance walk ->
         per-subject combo BITMASKS as a Dataset (joined downstream
         instead of broadcasting subject lists)

    Returns (series definitions frame without subject lists,
    membership dataset (parameter_id, subject_id, mask_original,
    mask_cfb)).
    """
    import zlib

    from ..planning import order_timepoint_ranks
    from ..planning_scale import (
        acceptance_walk,
        eligible_counts_from_deltas,
        need_inverse,
        subject_combo_mask,
        subject_eligibility_deltas,
    )

    def add_salt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["salt"] = [
            zlib.crc32(f"{p}|{s}".encode()) % salt_buckets
            for p, s in zip(b["parameter_id"], b["subject_id"])
        ]
        return b

    # ---- E1: dedup + rank-stat partials (for rank ordering) ----
    def e1(g: pd.DataFrame) -> pd.DataFrame:
        span = None
        if "salt" in g.columns and len(g):
            # batch-boundary witness for the split-group check below:
            # e1 is only exact over salt-GROUP-complete batches
            span = (int(g["salt"].min()), int(g["salt"].max()))
        g = g.drop_duplicates(
            subset=["parameter_id", "subject_id", "timepoint_rank", "has_baseline_value"]
        )
        out = []
        for variant, sub in (("original", g), ("cfb", g[g["has_baseline_value"] == "Yes"])):
            if len(sub) == 0:
                continue
            # nr_patients per rank + consistency (sum of per-subject
            # visit counts) per rank — the adaptive-score ingredients.
            # Keyed by (parameter, subject): a block may hold the same
            # subject under several parameters (merged salt groups /
            # subject-complete blocks), and a subject's visit count is
            # per parameter (R/ctas.R:878-884)
            nv = sub.groupby(["parameter_id", "subject_id"])[
                "timepoint_rank"
            ].transform("size")
            agg = sub.assign(nv=nv).groupby(["parameter_id", "timepoint_rank"]).agg(
                nr_patients=("subject_id", "size"), consistency=("nv", "sum")
            ).reset_index()
            agg["variant"] = variant
            out.append(agg)
        if not out:
            base = pd.DataFrame(
                columns=["parameter_id", "timepoint_rank", "nr_patients",
                         "consistency", "variant"]
            )
        else:
            base = pd.concat(out, ignore_index=True)
        if span is not None:
            base = pd.concat(
                [base, pd.DataFrame(
                    {"parameter_id": ["__span__"], "timepoint_rank": [0],
                     "nr_patients": [span[0]], "consistency": [span[1]],
                     "variant": ["__span__"]}
                )],
                ignore_index=True,
            )
        return base

    # ONE salt exchange serves both planning passes: E1 and E2 group by
    # (parameter_id, subject_id) internally, so any block holding whole
    # salt partitions is a valid input — materialize the exchanged
    # blocks and run both passes as map_batches over them instead of
    # paying the sort exchange twice. When the CALLER guarantees each
    # subject's rows already live in one block (subject_complete_blocks
    # — e.g. the measurement table came off a subject-salted exchange,
    # the bucketed-table physical hint), planning needs NO exchange at
    # all: both passes run straight over the input blocks.
    if subject_complete_blocks:
        parts = pres_ds.materialize()
    else:
        salted = pres_ds.map_batches(add_salt, batch_format="pandas")
        parts = (
            salted.groupby("salt")
            .map_groups(lambda g: g, batch_format="pandas")
            .materialize()
        )
    stats = parts.map_batches(
        e1, batch_format="pandas", batch_size=None
    ).to_pandas()
    if "parameter_id" not in stats.columns:  # empty presence -> no columns
        stats = pd.DataFrame(
            columns=["parameter_id", "timepoint_rank", "nr_patients",
                     "consistency", "variant"]
        )
    # Split-group guard (ADVICE r3): Ray's dynamic block splitting may
    # cut one salt group's output across blocks once it exceeds the
    # target block size, and e1's per-batch dedup / visit counts are
    # only exact over group-complete batches. Each batch emitted its
    # [salt_min, salt_max] span; groupby(salt) sorted by salt, so whole
    # groups per block <=> pairwise-disjoint spans. On violation,
    # re-dispatch per GROUP — exact under any block layout.
    spans = stats[stats["variant"] == "__span__"]
    stats = stats[stats["variant"] != "__span__"]
    if len(spans) and not _salt_spans_disjoint(
        spans["nr_patients"], spans["consistency"]
    ):
        stats = (
            parts.groupby("salt")
            .map_groups(e1, batch_format="pandas")
            .to_pandas()
        )
        stats = stats[stats["variant"] != "__span__"]
    rank_orders: dict[tuple[str, str], np.ndarray] = {}
    for (pid, variant), grp in stats.groupby(["parameter_id", "variant"]):
        merged = grp.groupby("timepoint_rank").agg(
            nr_patients=("nr_patients", "sum"), consistency=("consistency", "sum")
        ).reset_index()
        if autogen_type == "consecutive":
            rank_orders[(pid, variant)] = np.sort(merged["timepoint_rank"].unique())
        else:
            # rebuild the adaptive score from the merged partials
            # (R/ctas.R:863-896): percentiles + (score desc, rank desc)
            merged["timepoint_rank_percentile"] = (
                merged["timepoint_rank"] / merged["timepoint_rank"].max()
            )
            merged["nr_patients_percentile"] = (
                merged["nr_patients"] / merged["nr_patients"].max()
            )
            merged["consistency_percentile"] = (
                merged["consistency"] / merged["consistency"].max()
            )
            merged["score"] = (
                merged["consistency_percentile"]
                + merged["nr_patients_percentile"]
                + merged["timepoint_rank_percentile"]
            )
            merged = merged.sort_values("timepoint_rank", ascending=False, kind="mergesort")
            merged = merged.sort_values("score", ascending=False, kind="mergesort")
            rank_orders[(pid, variant)] = merged["timepoint_rank"].to_numpy()

    pos_maps = {
        key: {r: i + 1 for i, r in enumerate(order)}
        for key, order in rank_orders.items()
    }
    K_arrays = {
        key: need_inverse(len(order), param_cfg[key[0]]["max_share_missing"])
        for key, order in rank_orders.items()
        if key[0] in param_cfg
    }
    site_map = site_of_subject if optimize else None
    plan_refs = ray.put((pos_maps, K_arrays, site_map))

    # ---- E2: per-subject positions + delta partials (per-site deltas
    # too when the max-sites optimisation needs distinct-site counts) ----
    def e2(g: pd.DataFrame) -> pd.DataFrame:
        pos_maps_l, K_l, sites_l = ray.get(plan_refs)
        span = None
        if "salt" in g.columns and len(g):
            span = (int(g["salt"].min()), int(g["salt"].max()))
        g = g.drop_duplicates(
            subset=["parameter_id", "subject_id", "timepoint_rank", "has_baseline_value"]
        )
        delta_rows = []
        site_delta_rows = []
        pos_rows = []
        for (pid, subj), sub in g.groupby(["parameter_id", "subject_id"], sort=False):
            row = {"parameter_id": pid, "subject_id": subj, "kind": "pos"}
            for variant in ("original", "cfb"):
                key = (pid, variant)
                if key not in pos_maps_l:
                    row[f"pos_{variant}"] = b""
                    continue
                s2 = sub if variant == "original" else sub[sub["has_baseline_value"] == "Yes"]
                positions = np.sort(
                    s2["timepoint_rank"].map(pos_maps_l[key]).dropna().to_numpy(dtype=np.int64)
                )
                # ragged arrays don't survive Ray's pandas<->Arrow tensor
                # casting: ship as raw int64 bytes
                row[f"pos_{variant}"] = positions.tobytes()
                n_ranks = len(pos_maps_l[key])
                ks, ds = subject_eligibility_deltas(positions, K_l[key], n_ranks)
                for k, d in zip(ks, ds):
                    delta_rows.append((pid, variant, int(k), int(d)))
                if sites_l is not None:
                    # sentinel for unknown site: classic counts a NaN
                    # site as one distinct site via pd.unique
                    site = sites_l.get(subj, "__nosite__")
                    for k, d in zip(ks, ds):
                        site_delta_rows.append((pid, variant, site, int(k), int(d)))
            pos_rows.append(row)
        out_pos = pd.DataFrame(pos_rows)
        frames = [out_pos]
        if delta_rows:
            dd = pd.DataFrame(delta_rows, columns=["parameter_id", "variant", "k", "delta"])
            dd = dd.groupby(["parameter_id", "variant", "k"], as_index=False)["delta"].sum()
            dd["kind"] = "delta"
            frames.append(dd)
        if site_delta_rows:
            sd = pd.DataFrame(
                site_delta_rows, columns=["parameter_id", "variant", "site", "k", "delta"]
            )
            sd = sd.groupby(
                ["parameter_id", "variant", "site", "k"], as_index=False
            )["delta"].sum()
            sd["kind"] = "site_delta"
            frames.append(sd)
        out = pd.concat(frames, ignore_index=True) if len(frames) > 1 else out_pos
        cols = ["kind", "parameter_id", "subject_id", "pos_original", "pos_cfb",
                "variant", "k", "delta", "site"]
        if span is not None:
            out = pd.concat(
                [out, pd.DataFrame(
                    [{"kind": "span", "k": span[0], "delta": span[1]}]
                )],
                ignore_index=True,
            )
        return out.reindex(columns=cols)

    e2_out = parts.map_batches(
        e2, batch_format="pandas", batch_size=None
    ).materialize()
    # same split-group guard as E1: per-subject positions/deltas are
    # only exact when each (param, subject) lives wholly in one batch.
    # (span rows exist only on the salted path — subject-complete
    # inputs carry the caller's assertion instead, see StudyConfig)
    if not subject_complete_blocks:
        spans2 = e2_out.map_batches(
            lambda b: b[b["kind"] == "span"][["k", "delta"]],
            batch_format="pandas",
        ).to_pandas()
        if len(spans2) and not _salt_spans_disjoint(
            spans2["k"], spans2["delta"]
        ):
            e2_out = (
                parts.groupby("salt")
                .map_groups(e2, batch_format="pandas")
                .materialize()
            )
    deltas = e2_out.map_batches(
        lambda b: b[b["kind"] == "delta"][["parameter_id", "variant", "k", "delta"]],
        batch_format="pandas",
    ).to_pandas()
    site_deltas = None
    if optimize:
        site_deltas = e2_out.map_batches(
            lambda b: b[b["kind"] == "site_delta"][
                ["parameter_id", "variant", "site", "k", "delta"]
            ],
            batch_format="pandas",
        ).to_pandas()
        site_deltas = site_deltas.groupby(
            ["parameter_id", "variant", "site", "k"], as_index=False
        )["delta"].sum()

    # ---- driver: acceptance walks + id minting (reference order) ----
    series_rows = []
    accepted_by_key: dict[tuple[str, str], list[int]] = {}
    for pid in sorted(param_cfg):
        cfgp = param_cfg[pid]
        if not autogen_enabled or cfgp["use_only_custom_timeseries"]:
            continue
        variants = ["original", "cfb"] if cfgp["generate_change_from_baseline"] else ["original"]
        for variant in variants:
            key = (pid, variant)
            if key not in rank_orders:
                continue
            order = rank_orders[key]
            n_ranks = len(order)
            dsub = deltas[(deltas["parameter_id"] == pid) & (deltas["variant"] == variant)]
            n_eligible = eligible_counts_from_deltas(
                dsub["k"].to_numpy(dtype=np.int64),
                dsub["delta"].to_numpy(dtype=np.int64),
                n_ranks,
            )
            n_sites_per_k = None
            if optimize and site_deltas is not None:
                ssub = site_deltas[
                    (site_deltas["parameter_id"] == pid)
                    & (site_deltas["variant"] == variant)
                ]
                n_sites_per_k = np.zeros(n_ranks, dtype=np.int64)
                for _, sgrp in ssub.groupby("site"):
                    vec = eligible_counts_from_deltas(
                        sgrp["k"].to_numpy(dtype=np.int64),
                        sgrp["delta"].to_numpy(dtype=np.int64),
                        n_ranks,
                    )
                    n_sites_per_k += (vec > 0).astype(np.int64)
            accepted = acceptance_walk(
                n_eligible, cfgp["time_point_count_min"], cfgp["subject_count_min"],
                optimize=optimize, n_sites_per_k=n_sites_per_k,
            )
            accepted_by_key[key] = accepted
            for k in accepted:
                pts = order[:k]
                if autogen_type == "adaptive":
                    pts = np.sort(pts)
                combo = ";".join(
                    str(int(r)) if float(r).is_integer() else str(r) for r in pts
                )
                series_rows.append(
                    {"parameter_id": pid, "baseline": variant,
                     "timepoint_combo": combo, "prefix_k": k}
                )
    series = pd.DataFrame(
        series_rows, columns=["parameter_id", "baseline", "timepoint_combo", "prefix_k"]
    )
    if len(series):
        series["timeseries_id"] = [
            f"ts_{i + 1}_autogen_{bl}" for i, bl in enumerate(series["baseline"])
        ]

    # ---- custom series: position-sets + eligibility thresholds ----
    # (pick_subjects_for_custom_timeseries semantics, R/ctas.R:803-829)
    import math as _math

    custom_defs: dict[tuple[str, str], list] = {}
    if custom_timeseries is not None and len(custom_timeseries):
        for _, crow in custom_timeseries.iterrows():
            pid = crow["parameter_id"]
            cfgp = param_cfg[pid]
            variants = ["original", "cfb"] if cfgp["generate_change_from_baseline"] else ["original"]
            combo_ranks = [float(t) for t in crow["timepoint_combo"].split(";")]
            need = _math.ceil((1.0 - cfgp["max_share_missing"]) * len(combo_ranks))
            for variant in variants:
                key = (pid, variant)
                pos_set = frozenset(
                    pos_maps[key][r] for r in combo_ranks if key in pos_maps and r in pos_maps[key]
                )
                custom_defs.setdefault(key, []).append(
                    (crow["timeseries_id"], pos_set, need, crow["timepoint_combo"])
                )
        # the cmask_* columns are int64 bitmasks: one bit per custom
        # series per (parameter, variant). Guard the width instead of
        # silently overflowing / gating out series 63+.
        from ..schemas import SchemaError

        for key, defs in custom_defs.items():
            if len(defs) > 62:
                raise SchemaError(
                    f"parameter {key[0]} ({key[1]}) has {len(defs)} custom "
                    "timeseries; the vector planner supports at most 62 per "
                    "parameter/variant (int64 bitmask width)"
                )

    accepted_ref = ray.put((accepted_by_key, K_arrays, custom_defs))

    def to_masks(b: pd.DataFrame) -> pd.DataFrame:
        """Per-subject combo bitmasks — runs DISTRIBUTED over the E2
        partials (per-row work is irreducible: each row carries a ragged
        positions array); zip over columns, no iterrows."""
        acc, K_l, cust = ray.get(accepted_ref)
        b = b[b["kind"] == "pos"]
        rows = []
        for pid, subj, raw_o, raw_c in zip(
            b["parameter_id"], b["subject_id"], b["pos_original"], b["pos_cfb"]
        ):
            masks = {}
            cmasks = {}
            for variant, raw in (("original", raw_o), ("cfb", raw_c)):
                key = (pid, variant)
                positions = np.frombuffer(raw, dtype=np.int64) if raw else np.empty(0, np.int64)
                if key in acc and acc[key] and len(positions):
                    masks[variant] = subject_combo_mask(positions, K_l[key], acc[key])
                else:
                    masks[variant] = 0
                cm = 0
                if key in cust and len(positions):
                    pos_set_subject = set(positions.tolist())
                    for bit, (_, pos_set, need, _) in enumerate(cust[key]):
                        if len(pos_set_subject & pos_set) >= need:
                            cm |= 1 << bit
                cmasks[variant] = cm
            if masks["original"] or masks["cfb"] or cmasks["original"] or cmasks["cfb"]:
                rows.append(
                    {"parameter_id": pid, "subject_id": subj,
                     "mask_original": masks["original"], "mask_cfb": masks["cfb"],
                     "cmask_original": cmasks["original"], "cmask_cfb": cmasks["cfb"]}
                )
        df = pd.DataFrame(
            rows, columns=["parameter_id", "subject_id", "mask_original", "mask_cfb",
                           "cmask_original", "cmask_cfb"]
        )
        # Arrow out: membership feeds a hash join (see _typed_arrow)
        return _typed_arrow(df, {
            "parameter_id": pa.string(), "subject_id": pa.string(),
            "mask_original": pa.int64(), "mask_cfb": pa.int64(),
            "cmask_original": pa.int64(), "cmask_cfb": pa.int64(),
        })

    membership = e2_out.map_batches(to_masks, batch_format="pandas")
    if custom_defs:
        membership = membership.materialize()  # consumed by gate + explode

    if custom_defs:
        # gate custom combos: enough eligible subjects (R/ctas.R:123 —
        # note the reference's quirk: an EMPTY subject list still counts
        # as 1 because str_count('',';')+1 == 1; replicated via max(n,1))
        n_bits = {}  # (pid, variant) -> number of custom-series bits
        for key, defs in custom_defs.items():
            n_bits[key] = len(defs)

        def _cmask_counts(b: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for variant in ("original", "cfb"):
                vals = b[f"cmask_{variant}"].to_numpy(dtype=np.int64)
                for pid, grp_idx in b.groupby("parameter_id").indices.items():
                    v = vals[grp_idx]
                    for bit in range(n_bits.get((pid, variant), 0)):
                        c = int(((v >> bit) & 1).sum())
                        if c:
                            rows.append((pid, variant, bit, c))
            return pd.DataFrame(rows, columns=["parameter_id", "variant", "bit", "n"])

        counts = membership.map_batches(_cmask_counts, batch_format="pandas").to_pandas()
        counts = counts.groupby(["parameter_id", "variant", "bit"], as_index=False)["n"].sum()
        custom_rows = []
        for (pid, variant), defs in sorted(custom_defs.items()):
            for bit, (tsid, _, _, combo_str) in enumerate(defs):
                hit = counts[
                    (counts["parameter_id"] == pid)
                    & (counts["variant"] == variant)
                    & (counts["bit"] == bit)
                ]
                n_elig = int(hit["n"].iloc[0]) if len(hit) else 0
                gate_n = n_elig if n_elig >= 1 else 1
                if gate_n >= param_cfg[pid]["subject_count_min"]:
                    custom_rows.append(
                        {"parameter_id": pid, "baseline": variant,
                         "timepoint_combo": combo_str, "prefix_k": -1,
                         "timeseries_id": f"{tsid}_{variant}",
                         "custom_bit": bit}
                    )
        if len(series) and custom_timeseries is not None and len(custom_timeseries):
            # anti-join: autogen combos duplicated by customs (after
            # numbering — id gaps preserved like the reference)
            dup = set(zip(custom_timeseries["parameter_id"], custom_timeseries["timepoint_combo"]))
            series = series[
                [(p, c) not in dup
                 for p, c in zip(series["parameter_id"], series["timepoint_combo"])]
            ]
        if custom_rows:
            series = pd.concat(
                [series, pd.DataFrame(custom_rows)], ignore_index=True
            )

    plan_meta = {
        "pos_maps": pos_maps,
        "accepted": accepted_by_key,
        "custom_defs": custom_defs,
    }
    return series, membership, plan_meta


def _stage_timer():
    """Opt-in per-stage wall logging (CTAS_SCREEN_TIMING=1): each tick
    logs the elapsed wall since the previous one — the screen runs a
    dozen separate Dataset executions, and this is how their fixed
    costs get attributed when tuning."""
    import logging as _logging
    import os as _os
    import time as _time

    if not _os.environ.get("CTAS_SCREEN_TIMING"):
        return lambda label: None
    log = _logging.getLogger("ctas_ray.study")
    state = {"t": _time.perf_counter()}

    def tick(label: str) -> None:
        now = _time.perf_counter()
        log.warning("screen stage %-22s %.2fs", label, now - state["t"])
        state["t"] = now

    return tick


def process_a_study_ray(
    data: rd.Dataset,
    subjects: pd.DataFrame | rd.Dataset,
    parameters: pd.DataFrame,
    custom_timeseries: pd.DataFrame | None = None,
    custom_reference_groups: pd.DataFrame | None = None,
    cfg: StudyConfig = StudyConfig(),
    features_as_dataset: bool = False,
    decorate_with_join: bool | None = None,
    plan_mode: str = "vector",
) -> dict:
    """Distributed study screen. ``data`` is the (possibly huge)
    measurement Dataset; dimension tables are small pandas frames.
    ``subjects`` may also be a Dataset (scale path): decoration then
    runs as a hash join and the table is never collected to the driver
    — unless the feature set needs a per-subject site map inside the
    per-series groups (own_site_simil_score) or the max-sites
    optimisation is on, both of which are documented collects.

    Returns the reference's four outputs; ``timeseries_features`` and
    ``PCA_coordinates`` come back as pandas by default or as Datasets
    when ``features_as_dataset`` (big-study mode — they scale with
    subjects x series x features).
    """
    _tick = _stage_timer()
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

    subjects_ds: rd.Dataset | None = None
    if isinstance(subjects, rd.Dataset):
        subjects_ds = subjects.materialize()
        if decorate_with_join is None:
            decorate_with_join = True
        needs_site_map = cfg.optimize_sites_and_patients or any(
            "own_site_simil_score" in str(c["features"] or "")
            for c in param_cfg.values()
        )
        if needs_site_map:
            subjects = subjects_ds.to_pandas()
        else:
            subjects = pd.DataFrame(columns=["subject_id", "site", "country", "region"])

    # ---- ONE projection scan of the raw data feeds both the rank-name
    # mapping and the presence index (the only other raw scan is the
    # feature explode after planning -> 2 total scans of the big table).
    # The projection is materialized: bounded by distinct (param,
    # subject, rank, flag) tuples, a few % of raw at worst, spillable.
    def _project(b: pd.DataFrame) -> pd.DataFrame:
        pres = _presence_project(b).assign(kind="pres")
        names = (
            b[["parameter_id", "timepoint_rank", "timepoint_1_name", "timepoint_2_name"]]
            .drop_duplicates(subset=["parameter_id", "timepoint_rank"])
            .assign(kind="name")
        )
        return pd.concat([pres, names], ignore_index=True).reindex(
            columns=["kind", "parameter_id", "subject_id", "timepoint_rank",
                     "has_baseline_value", "timepoint_1_name", "timepoint_2_name"]
        )

    projection = data.map_batches(_project, batch_format="pandas").materialize()
    _tick("projection")
    names = projection.map_batches(
        lambda b: b[b["kind"] == "name"][
            ["parameter_id", "timepoint_rank", "timepoint_1_name", "timepoint_2_name"]
        ],
        batch_format="pandas",
    ).to_pandas().drop_duplicates(subset=["parameter_id", "timepoint_rank"])
    rank_names = {}
    for _, r in names.iterrows():
        rank = r["timepoint_rank"]
        key = (r["parameter_id"], str(int(rank)) if float(rank).is_integer() else str(rank))
        t2 = r["timepoint_2_name"]
        rank_names.setdefault(key, f"{r['timepoint_1_name']}_{t2 if t2 is not None and t2 == t2 else 'NA'}")
    _tick("rank_names")

    # ---- presence + per-parameter planning (shuffle P1) ----
    pres_ds = projection.map_batches(
        lambda b: b[b["kind"] == "pres"][
            ["parameter_id", "subject_id", "timepoint_rank", "has_baseline_value"]
        ],
        batch_format="pandas",
    )

    if plan_mode == "vector":
        return _run_vector_mode(
            data, pres_ds, subjects, param_cfg, custom_timeseries,
            custom_reference_groups, cfg, rank_names, features_as_dataset,
            decorate_with_join, subjects_ds=subjects_ds, _tick=_tick,
        )

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
    return _finish_study(
        assigned, series, param_cfg, subjects, custom_reference_groups, cfg,
        rank_names, features_as_dataset, decorate_with_join,
        subjects_ds=subjects_ds, _tick=_tick,
    )


def _explode_by_mask(batch: pd.DataFrame, vmeta_ref) -> pd.DataFrame:
    """Vector-mode explode: membership via per-subject combo bitmasks
    (broadcast) + rank-position predicates — no packed subject sets.
    Autogen combos test pos <= k (prefix); custom combos test pos in
    the combo's position set."""
    vm = ray.get(vmeta_ref) if not isinstance(vmeta_ref, dict) else vmeta_ref
    frames = []
    for pid, combos in vm["combos"].items():
        sub = batch[batch["parameter_id"] == pid]
        if len(sub) == 0:
            continue
        mask_cols = {
            ("auto", "original"): sub["subject_id"].map(vm["mask_original"].get(pid, {})).fillna(0).astype(np.int64),
            ("auto", "cfb"): sub["subject_id"].map(vm["mask_cfb"].get(pid, {})).fillna(0).astype(np.int64),
            ("custom", "original"): sub["subject_id"].map(vm["cmask_original"].get(pid, {})).fillna(0).astype(np.int64),
            ("custom", "cfb"): sub["subject_id"].map(vm["cmask_cfb"].get(pid, {})).fillna(0).astype(np.int64),
        }
        for tsid, variant, k, bit, pos_set in combos:
            pos = sub["timepoint_rank"].map(vm["pos_maps"][(pid, variant)])
            if pos_set is None:  # autogen prefix combo
                in_combo = pos.notna() & (pos <= k)
                masks = mask_cols[("auto", variant)]
            else:
                in_combo = pos.isin(pos_set)
                masks = mask_cols[("custom", variant)]
            m = in_combo & ((masks // (1 << bit)) % 2 == 1)
            if m.any():
                sel = sub.loc[m, ["subject_id", "timepoint_rank", "result", "baseline"]].copy()
                sel.insert(0, "timeseries_id", tsid)
                frames.append(sel)
    if not frames:
        return pd.DataFrame(
            columns=["timeseries_id", "subject_id", "timepoint_rank", "result", "baseline"]
        )
    return pd.concat(frames, ignore_index=True)


def _explode_by_mask_joined(batch: pd.DataFrame, vmeta_ref) -> pd.DataFrame:
    """Join-path explode: the measurement batch already carries this
    subject's mask columns (hash-joined on (parameter_id, subject_id)) —
    only the tiny combo/pos-map metadata is broadcast."""
    vm = ray.get(vmeta_ref) if not isinstance(vmeta_ref, dict) else vmeta_ref
    frames = []
    for pid, combos in vm["combos"].items():
        sub = batch[batch["parameter_id"] == pid]
        if len(sub) == 0:
            continue
        for tsid, variant, k, bit, pos_set in combos:
            pos = sub["timepoint_rank"].map(vm["pos_maps"][(pid, variant)])
            col = f"mask_{variant}" if pos_set is None else f"cmask_{variant}"
            masks = sub[col].fillna(0).astype(np.int64)
            if pos_set is None:
                in_combo = pos.notna() & (pos <= k)
            else:
                in_combo = pos.isin(pos_set)
            m = in_combo & ((masks // (1 << bit)) % 2 == 1)
            if m.any():
                sel = sub.loc[m, ["subject_id", "timepoint_rank", "result", "baseline"]].copy()
                sel.insert(0, "timeseries_id", tsid)
                frames.append(sel)
    if not frames:
        return pd.DataFrame(
            columns=["timeseries_id", "subject_id", "timepoint_rank", "result", "baseline"]
        )
    return pd.concat(frames, ignore_index=True)


def _run_vector_mode(
    data: rd.Dataset,
    pres_ds: rd.Dataset,
    subjects: pd.DataFrame,
    param_cfg: dict,
    custom_timeseries: pd.DataFrame,
    custom_reference_groups: pd.DataFrame,
    cfg: StudyConfig,
    rank_names: dict,
    features_as_dataset: bool,
    decorate_with_join: bool | None,
    subjects_ds: rd.Dataset | None = None,
    _tick=lambda label: None,
) -> dict:
    """Scalable planning mode (see planning_scale): no per-parameter
    presence matrices, no ';'-packed subject lists — eligibility via
    interval deltas and membership via per-subject bitmasks."""
    empty = {
        "timeseries": None, "timeseries_features": None,
        "PCA_coordinates": None, "site_scores": None,
    }
    if not cfg.autogen_enabled and not len(custom_timeseries):
        return empty
    series, membership, plan_meta = _plan_vector(
        pres_ds, param_cfg, cfg.autogen_type,
        custom_timeseries=custom_timeseries,
        autogen_enabled=cfg.autogen_enabled,
        optimize=cfg.optimize_sites_and_patients,
        site_of_subject=dict(zip(subjects["subject_id"], subjects["site"])),
        subject_complete_blocks=cfg.data_subject_complete,
    )
    if len(series) == 0:
        return empty
    series["timepoint_count"] = series["timepoint_combo"].str.count(";") + 1
    series = series[(series["baseline"] == "original") | (series["timepoint_count"] > 1)]
    if len(series) == 0:
        return empty

    # combos per parameter: autogen prefixes (bit in mask_*) and custom
    # position-sets (bit in cmask_*)
    combos: dict[str, list] = {}
    for (pid, variant), accepted in plan_meta["accepted"].items():
        for bit, k in enumerate(accepted):
            row = series[
                (series["parameter_id"] == pid)
                & (series["baseline"] == variant)
                & (series["prefix_k"] == k)
            ]
            if len(row):
                combos.setdefault(pid, []).append(
                    (row["timeseries_id"].iloc[0], variant, k, bit, None)
                )
    if "custom_bit" in series.columns:
        cust_defs = plan_meta["custom_defs"]
        for _, row in series[series["prefix_k"] == -1].iterrows():
            pid, variant = row["parameter_id"], row["baseline"]
            bit = int(row["custom_bit"])
            pos_set = cust_defs[(pid, variant)][bit][1]
            combos.setdefault(pid, []).append(
                (row["timeseries_id"], variant, None, bit, pos_set)
            )

    # membership routing: broadcast the per-subject masks when small,
    # hash-join them onto the measurements when large (no driver-side
    # per-row loops on either path; the join path never collects
    # membership to the driver at all). The repartition merges away the
    # schemaless EMPTY blocks Ray's group machinery emits for unused
    # salt partitions — the hash-join aggregator rejects columnless
    # blocks ("no match for key field parameter_id"). Sized from the
    # membership bytes (VERDICT r4 item 6): at toy scale this merges to
    # the CPU floor like the old fixed 16, at real scale the count grows
    # with membership so no single ~192 MB+ block forms on the join path.
    from ..partitioning import parts_for as _parts_for

    membership = membership.repartition(_parts_for(membership)).materialize()
    n_members = membership.count()
    _tick("plan+membership")
    use_member_join = (
        decorate_with_join
        if decorate_with_join is not None
        else n_members > BROADCAST_SUBJECT_LIMIT
    )
    if use_member_join:
        vmeta_ref = ray.put({"combos": combos, "pos_maps": plan_meta["pos_maps"]})

        def _narrow(b: pd.DataFrame):
            # project to the explode columns and emit an EXPLICIT Arrow
            # schema: Ray types an all-NaN pandas column as Arrow `null`,
            # which pyarrow's hash join rejects for non-key fields
            import pyarrow as pa

            def col(s: pd.Series):
                if s.dtype == object and s.notna().any():
                    return pa.Array.from_pandas(s)
                return pa.Array.from_pandas(
                    s.astype(np.float64), type=pa.float64()
                )

            return pa.table(
                {
                    "parameter_id": pa.Array.from_pandas(b["parameter_id"].astype(str)),
                    "subject_id": pa.Array.from_pandas(b["subject_id"].astype(str)),
                    "timepoint_rank": pa.Array.from_pandas(
                        b["timepoint_rank"].astype(np.float64), type=pa.float64()
                    ),
                    "result": col(b["result"]),
                    "baseline": col(b["baseline"]),
                }
            )

        # repartition before the join: upstream salted groupbys emit
        # EMPTY blocks with no schema for unused salt partitions, and
        # Ray's join aggregator rejects columnless blocks ("No match
        # ... FieldRef parameter_id"); the block merge erases them
        narrow = arrow_clean(
            data.map_batches(_narrow, batch_format="pandas").repartition(16)
        )
        joined = narrow.join(
            membership,
            join_type="inner",
            num_partitions=16,
            on=("parameter_id", "subject_id"),
        )
        assigned = joined.map_batches(
            functools.partial(_explode_by_mask_joined, vmeta_ref=vmeta_ref),
            batch_format="pandas",
        )
    else:
        mem = membership.to_pandas()
        mask_o: dict[str, dict] = {}
        mask_c: dict[str, dict] = {}
        cmask_o: dict[str, dict] = {}
        cmask_c: dict[str, dict] = {}
        for pid, g in mem.groupby("parameter_id", sort=False):
            subj = g["subject_id"]
            mask_o[pid] = dict(zip(subj, g["mask_original"].astype(np.int64)))
            mask_c[pid] = dict(zip(subj, g["mask_cfb"].astype(np.int64)))
            cmask_o[pid] = dict(zip(subj, g["cmask_original"].astype(np.int64)))
            cmask_c[pid] = dict(zip(subj, g["cmask_cfb"].astype(np.int64)))
        vmeta_ref = ray.put(
            {
                "combos": combos,
                "pos_maps": plan_meta["pos_maps"],
                "mask_original": mask_o,
                "mask_cfb": mask_c,
                "cmask_original": cmask_o,
                "cmask_cfb": cmask_c,
            }
        )
        assigned = data.map_batches(
            functools.partial(_explode_by_mask, vmeta_ref=vmeta_ref),
            batch_format="pandas",
        )
    series = series.drop(columns=["prefix_k"], errors="ignore")
    if "custom_bit" in series.columns:
        series = series.drop(columns=["custom_bit"])
    return _finish_study(
        assigned, series, param_cfg, subjects, custom_reference_groups, cfg,
        rank_names, features_as_dataset, decorate_with_join,
        subjects_ds=subjects_ds, _tick=_tick,
    )


def _finish_study(
    assigned: rd.Dataset,
    series: pd.DataFrame,
    param_cfg: dict,
    subjects: pd.DataFrame,
    custom_reference_groups: pd.DataFrame,
    cfg: StudyConfig,
    rank_names: dict,
    features_as_dataset: bool,
    decorate_with_join: bool | None,
    subjects_ds: rd.Dataset | None = None,
    _tick=lambda label: None,
) -> dict:
    """Shared downstream of both planning modes: per-series features +
    PCA groups, decoration, scoring groups, FDR barrier, output shaping."""
    empty = {
        "timeseries": None, "timeseries_features": None,
        "PCA_coordinates": None, "site_scores": None,
    }
    # ---- per-series features + PCA (shuffle P2) ----
    meta = {
        "series": {
            s["timeseries_id"]: {
                "timepoint_combo": s["timepoint_combo"],
                "timepoint_combo_subjects": s.get("timepoint_combo_subjects"),
                "baseline": s["baseline"],
                "features": param_cfg[s["parameter_id"]]["features"],
            }
            for _, s in series.iterrows()
        },
        "site_of_subject": dict(zip(subjects["subject_id"], subjects["site"])),
        "max_pairwise": cfg.max_subjects_for_pairwise,
        "pca_method": cfg.pca_method,
        # §2.10 extension surface: registered per-series features travel
        # to workers as a snapshot (module globals don't)
        "extra_features": dict(FEATURE_REGISTRY),
    }
    meta_ref = ray.put(meta)
    # per-PARTITION dispatch (module convention): deal each (series,
    # feature-group) pair a balanced int part and process ALL of a
    # partition's groups in one UDF call — the exchange sorts an int64
    # key instead of globally sorting the exploded rows by a string
    # series id, group dispatch is per-partition, and splitting each
    # series across its feature groups runs the quadratic kernels of
    # one series concurrently (VERDICT r3 item 4)
    # Feature-group splitting pays a ~4x fatter exchange to run one
    # series' quadratic kernels concurrently — worth it exactly when
    # those kernels dominate (many subjects per series: LOF/own-site
    # are O(subjects^2)). Below the threshold the kernels are
    # milliseconds and the fatter exchange is pure loss, so each series
    # stays one un-replicated group ("__all__").
    split_min = int(
        __import__("os").environ.get(
            "CTAS_RAY_FGROUP_SPLIT_MIN_SUBJECTS", "5000"
        )
    )
    do_split = len(subjects) >= split_min
    pairs = [
        (t, fg)
        for t in series["timeseries_id"]
        for fg in (
            _feature_groups(meta["series"][t]["features"])
            if do_split else ["__all__"]
        )
    ]
    n_parts = max(1, min(_SERIES_SALT_PARTS, len(pairs)))
    by_tsid: dict[str, list] = {}
    for i, (t, fg) in enumerate(pairs):
        by_tsid.setdefault(t, []).append((fg, i % n_parts))
    max_g = max((len(v) for v in by_tsid.values()), default=0)
    slot_maps = [
        (
            {t: v[gi][0] for t, v in by_tsid.items() if len(v) > gi},
            {t: v[gi][1] for t, v in by_tsid.items() if len(v) > gi},
        )
        for gi in range(max_g)
    ]
    part_ref = ray.put(slot_maps)
    series_out = (
        assigned.map_batches(
            functools.partial(_series_salt, part_ref=part_ref),
            batch_format="pandas",
        )
        .groupby("part")
        .map_groups(
            functools.partial(_series_partition, meta_ref=meta_ref),
            batch_format="pandas",
        )
    )
    # consumed by BOTH the feature and the PCA branches: pin the blocks
    # once instead of re-executing the explode+group lineage per branch.
    # (bounded: rows = subjects x series x (features + 2), far smaller
    # than the raw measurements; spills to disk if needed)
    series_out = series_out.materialize()
    _tick("features_explode")

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
        _subj_types = {
            "subject_id": pa.string(), "site": pa.string(),
            "country": pa.string(), "region": pa.string(),
        }
        if subjects_ds is None:
            subjects_ds = rd.from_arrow(
                _typed_arrow(
                    subjects[["subject_id", "site", "country", "region"]],
                    _subj_types,
                )
            )
        else:
            subjects_ds = subjects_ds.map_batches(
                lambda b: _typed_arrow(b, _subj_types), batch_format="pandas"
            )
        n_parts = 16
        # left outer: features keep subjects missing from the subjects
        # table (R/ctas.R:177-180); scoring filters them out below.
        # Both sides repartition first: salted groupbys upstream emit
        # schemaless EMPTY blocks that the join aggregator rejects.
        feat_join = feat_ds.map_batches(
            lambda b: _typed_arrow(b, {
                "timeseries_id": pa.string(), "subject_id": pa.string(),
                "feature": pa.string(), "value": pa.float64(),
            }),
            batch_format="pandas",
        )
        joined = feat_join.repartition(n_parts).join(
            subjects_ds.repartition(n_parts), join_type="left_outer",
            num_partitions=n_parts, on=("subject_id",),
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
    _tick("decorate")
    from ..study_core import SCORING_REGISTRY as _SCORING_REGISTRY

    # scoring inner-joins subjects (R/ctas.R:196): rows whose subject is
    # absent from the subjects table never reach the gates or scorers
    def _score_salt(b: pd.DataFrame) -> pd.DataFrame:
        out = b[b["site"].notna()]
        h = pd.util.hash_pandas_object(
            out[["timeseries_id", "feature", "ref_group"]], index=False
        ).to_numpy()
        out = out.copy(deep=False)
        out["part"] = (h % np.uint64(_SERIES_SALT_PARTS)).astype(np.int64)
        return out

    score_fn = functools.partial(
        _score_group,
        method=cfg.site_scoring_method,
        jitter_sd=cfg.ks_jitter_sd,
        jitter_seed=cfg.ks_jitter_seed,
        scoring_registry=dict(_SCORING_REGISTRY),
    )

    def _score_partition(part: pd.DataFrame) -> pd.DataFrame:
        # per-PARTITION dispatch: one int-keyed exchange, all of a
        # partition's (series, feature, ref_group) groups in one call
        outs = [
            score_fn(g)
            for _, g in part.groupby(
                ["timeseries_id", "feature", "ref_group"], sort=True
            )
        ]
        outs = [o for o in outs if len(o)]
        if not outs:
            return score_fn(part.iloc[:0])
        return pd.concat(outs, ignore_index=True)

    def _score_exchange() -> pd.DataFrame:
        return (
            decorated.map_batches(_score_salt, batch_format="pandas")
            .groupby("part")
            .map_groups(_score_partition, batch_format="pandas")
            .to_pandas()
        )

    if decorate_with_join:
        # join-decorated rows are hash-partitioned by SUBJECT — scoring
        # groups are scattered, so the exchange is required
        scored = _score_exchange()
    else:
        # Broadcast-decorated rows keep the feature-stage block layout,
        # where every (series, feature) pair's rows were computed by
        # the ONE partition that owned that feature group — so scoring
        # runs as a per-block map, saving the third sort exchange. Ray
        # only merges blocks into tasks (never splits a group) until an
        # output exceeds the dynamic block-size target; each batch
        # emits WITNESS rows naming its scoring keys, and any key seen
        # in two batches (a split group — which could be silently GATED,
        # not just double-scored) triggers the exact exchange path.
        def _score_block(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["site"].notna()]
            res = _score_partition(b)
            res = res.assign(__witness__=np.int8(0))
            keys = b[["timeseries_id", "feature", "ref_group"]].drop_duplicates()
            if len(keys):
                keys = keys.assign(__witness__=np.int8(1))
                res = pd.concat([res, keys], ignore_index=True)
            return res

        raw = decorated.map_batches(
            _score_block, batch_format="pandas", batch_size=None
        ).to_pandas()
        if "__witness__" in raw.columns:
            wit = raw[raw["__witness__"] == 1]
            scored = raw[raw["__witness__"] == 0].drop(columns=["__witness__"])
            split = wit.duplicated(
                subset=["timeseries_id", "feature", "ref_group"]
            ).any()
        else:  # no blocks at all
            scored, split = raw, False
        if split:
            scored = _score_exchange()
    _tick("scoring")

    # ---- driver: FDR barrier + output shaping ----
    if len(scored):
        if cfg.site_scoring_method == "ks":
            site_scores = finalize_ks_scores(scored, p_adjust, cfg.padjust_method)
        elif cfg.site_scoring_method == "avg_feat_value":
            site_scores = scored[["timeseries_id", "feature", "entity", "is_signal"]]
        elif cfg.site_scoring_method in _SCORING_REGISTRY:
            site_scores = scored  # registered method owns its statistics
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
