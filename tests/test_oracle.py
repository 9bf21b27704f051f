"""Port of the reference's end-to-end invariant suite
(tests/testthat/test_process_a_study.R) against the single-process
oracle, on the regenerated seeded fixture (FIXTURES.md §B)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.config import StudyConfig
from ctas_ray.fixtures import generate_ctas_study
from ctas_ray.oracle import process_a_study
from ctas_ray.schemas import SchemaError


@pytest.fixture(scope="module")
def study():
    return generate_ctas_study(seed=1)


@pytest.fixture(scope="module")
def mainline(study):
    # mirrors test_process_a_study.R:14-30: all 7 features, min tp 3,
    # min subj 3, max missing 0.5, no cfb, consecutive autogen
    cfg = StudyConfig()
    return process_a_study(
        study["subjects"], study["parameters"], study["data"],
        study["custom_timeseries"], study["custom_reference_groups"], cfg,
    )


class TestMainline:
    def test_all_four_outputs_present_and_nonempty(self, mainline):
        # test_process_a_study.R:33-37,51-58
        assert set(mainline) == {
            "timeseries", "timeseries_features", "PCA_coordinates", "site_scores"
        }
        for name, frame in mainline.items():
            assert frame is not None and len(frame) > 0, name

    def test_all_seven_features_in_site_scores(self, mainline):
        # test_process_a_study.R:39-49
        feats = set(mainline["site_scores"]["feature"].unique())
        assert feats == {
            "autocorr", "average", "own_site_simil_score", "sd",
            "unique_value_count_relative", "range", "lof",
        }

    def test_no_nas_anywhere(self, mainline):
        # test_process_a_study.R asserts no NAs in any output frame
        for name, frame in mainline.items():
            assert not frame.isna().any().any(), f"NAs in {name}"

    def test_timeseries_schema(self, mainline):
        assert list(mainline["timeseries"].columns) == [
            "timeseries_id", "parameter_id", "baseline", "timepoint_combo",
            "timepoint_combo_readable", "timepoint_count",
        ]
        assert set(mainline["timeseries"]["baseline"]) <= {"original", "cfb"}

    def test_site_scores_schema(self, mainline):
        assert list(mainline["site_scores"].columns) == [
            "timeseries_id", "site", "country", "region", "feature",
            "pvalue_kstest_logp", "kstest_statistic",
            "fdr_corrected_pvalue_logp", "ref_group", "subject_count",
        ]
        s = mainline["site_scores"]
        assert (s["pvalue_kstest_logp"] <= 30.0 + 1e-12).all()
        assert (s["fdr_corrected_pvalue_logp"] <= s["pvalue_kstest_logp"] + 1e-9).all()

    def test_id_minting_order(self, mainline):
        ids = mainline["timeseries"]["timeseries_id"].tolist()
        assert all(i.startswith("ts_") and i.endswith("_original") for i in ids)
        nums = [int(i.split("_")[1]) for i in ids]
        assert nums == sorted(nums)

    def test_feature_values_match_recomputation(self, mainline, study):
        # spot-check: average feature for one series == nanmean over the
        # combo's measurements for that subject
        ts = mainline["timeseries"].iloc[0]
        feats = mainline["timeseries_features"]
        avg = feats[
            (feats["timeseries_id"] == ts["timeseries_id"])
            & (feats["feature"] == "average")
        ]
        combo = [float(x) for x in ts["timepoint_combo"].split(";")]
        data = study["data"]
        for _, row in avg.head(5).iterrows():
            m = data[
                (data["parameter_id"] == ts["parameter_id"])
                & (data["subject_id"] == row["subject_id"])
                & (data["timepoint_rank"].isin(combo))
            ]
            assert row["feature_value"] == pytest.approx(
                np.nanmean(m["result"].to_numpy()), rel=1e-12
            )


class TestDegenerateConfigs:
    def test_max_share_missing_zero_with_sparse_data(self, study):
        # test_process_a_study.R:121-148: max_share_missing=0 + NA results
        # -> no subject has complete data for long combos -> may be empty;
        # at minimum the run must not crash and must return the dict shape
        cfg = StudyConfig(max_share_missing=0.0, min_timepoints_per_series=30)
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        assert set(out) == {
            "timeseries", "timeseries_features", "PCA_coordinates", "site_scores"
        }

    def test_min_timepoints_huge_returns_all_none(self, study):
        # test_process_a_study.R:150-170
        cfg = StudyConfig(min_timepoints_per_series=1e6)
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        assert all(v is None for v in out.values())

    def test_min_subjects_huge_returns_all_none(self, study):
        # test_process_a_study.R:172-192
        cfg = StudyConfig(min_subjects_per_series=1e6)
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        assert all(v is None for v in out.values())

    def test_all_results_null_returns_all_none(self, study):
        data = study["data"].copy()
        data["result"] = np.nan
        out = process_a_study(study["subjects"], study["parameters"], data)
        assert all(v is None for v in out.values())

    def test_min_subjects_one_errors(self):
        # test_process_a_study.R:194-224 / R/ctas.R:1173
        with pytest.raises(SchemaError):
            StudyConfig(min_subjects_per_series=1)

    def test_unknown_feature_errors(self):
        with pytest.raises(SchemaError):
            StudyConfig(features="average;bogus")


class TestLofMinptsRegression:
    def test_small_sites_lof_only(self):
        # FIXTURES.md §B2 analogue: 6 subjects across 5 sites (several
        # singleton), features='lof' only — the historical minPts crash
        rng = np.random.default_rng(5)
        rows = []
        seqs = {
            "A": range(11, 22), "B": range(1, 24), "C": range(1, 37),
            "D": range(1, 51), "E": range(1, 30), "F": range(1, 36),
        }
        for subj, ranks in seqs.items():
            for r in ranks:
                rows.append(
                    {
                        "subject_id": subj, "parameter_id": "A",
                        "timepoint_1_name": f"V{r}", "timepoint_2_name": "ND",
                        "timepoint_rank": float(r),
                        "result": float(rng.integers(1, 1000)),
                        "baseline": np.nan,
                    }
                )
        data = pd.DataFrame(rows)
        subjects = pd.DataFrame(
            {
                "subject_id": list(seqs),
                "site": ["sA", "sB", "sC", "sD", "sE", "sA"],
                "country": ["B", "A", "E", "A", "B", "B"],
                "region": ["r1"] * 6,
            }
        )
        parameters = pd.DataFrame(
            {
                "parameter_id": ["A"], "parameter_name": ["A"],
                "parameter_category_1": ["x"], "parameter_category_2": [None],
                "parameter_category_3": [None],
                "time_point_count_min": [np.nan], "subject_count_min": [np.nan],
                "max_share_missing": [np.nan],
                "generate_change_from_baseline": [None],
                "timeseries_features_to_calculate": [None],
                "use_only_custom_timeseries": [None],
            }
        )
        cfg = StudyConfig(features="lof", max_share_missing=1.0)
        out = process_a_study(subjects, parameters, data, cfg=cfg)
        assert out["timeseries"] is not None
        # lof must exist (minPts floor path: n=6 -> k = floor(6/3)=2)
        feats = out["timeseries_features"]
        assert (feats["feature"] == "lof").all()
        assert len(feats) > 0


class TestSingleTimepointSeries:
    def test_constant_fallbacks(self):
        # test_process_a_study.R:323-353: single-timepoint data with the
        # feature subset -> constant fallbacks, corrected logp stays small
        rng = np.random.default_rng(9)
        n = 30
        subs = [f"s{i}" for i in range(n)]
        data = pd.DataFrame(
            {
                "subject_id": subs, "parameter_id": "p1",
                "timepoint_1_name": "V1", "timepoint_2_name": "ND",
                "timepoint_rank": 1.0,
                "result": rng.normal(10, 2, n), "baseline": np.nan,
            }
        )
        subjects = pd.DataFrame(
            {
                "subject_id": subs,
                "site": [f"site{i % 5}" for i in range(n)],
                "country": ["c1"] * n, "region": ["r1"] * n,
            }
        )
        parameters = pd.DataFrame(
            {
                "parameter_id": ["p1"], "parameter_name": ["p1"],
                "parameter_category_1": ["x"], "parameter_category_2": [None],
                "parameter_category_3": [None],
                "time_point_count_min": [1.0], "subject_count_min": [np.nan],
                "max_share_missing": [np.nan],
                "generate_change_from_baseline": [None],
                "timeseries_features_to_calculate": [None],
                "use_only_custom_timeseries": [None],
            }
        )
        cfg = StudyConfig(
            features="autocorr;sd;unique_value_count_relative;range",
            min_timepoints_per_series=1,
        )
        out = process_a_study(subjects, parameters, data, cfg=cfg)
        feats = out["timeseries_features"]
        # constant fallbacks: range=0, sd=0, unique=1, autocorr=0
        assert (feats.loc[feats["feature"] == "range", "feature_value"] == 0).all()
        assert (feats.loc[feats["feature"] == "sd", "feature_value"] == 0).all()
        assert (
            feats.loc[feats["feature"] == "unique_value_count_relative", "feature_value"] == 1
        ).all()
        # constant features -> KS on identical values; corrected logp < 1
        s = out["site_scores"]
        if len(s):
            assert (s["fdr_corrected_pvalue_logp"] < 1.0 + 1e-9).all()


class TestCustomSeries:
    def test_custom_only(self, study):
        custom = pd.DataFrame(
            {
                "timeseries_id": ["custom_ts_1"],
                "parameter_id": ["param_1"],
                "timepoint_combo": ["1;2;3;4"],
            }
        )
        cfg = StudyConfig(autogenerate_timeseries=False)
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], custom, cfg=cfg
        )
        assert out["timeseries"] is not None
        assert set(out["timeseries"]["timeseries_id"]) == {"custom_ts_1_original"}
        assert (out["timeseries"]["timepoint_count"] == 4).all()

    def test_custom_dedups_autogen(self, study):
        # an autogenerated combo listed as custom must appear ONCE, under
        # the custom id (anti-join, R/ctas.R:104-109)
        base = process_a_study(
            study["subjects"], study["parameters"], study["data"]
        )
        first = base["timeseries"].iloc[0]
        custom = pd.DataFrame(
            {
                "timeseries_id": ["my_custom"],
                "parameter_id": [first["parameter_id"]],
                "timepoint_combo": [first["timepoint_combo"]],
            }
        )
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], custom
        )
        ts = out["timeseries"]
        dup = ts[
            (ts["parameter_id"] == first["parameter_id"])
            & (ts["timepoint_combo"] == first["timepoint_combo"])
        ]
        assert len(dup) == 1
        assert dup.iloc[0]["timeseries_id"] == "my_custom_original"


class TestScoringVariants:
    def test_avg_feat_value(self, study):
        cfg = StudyConfig(site_scoring_method="avg_feat_value", features="average")
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        s = out["site_scores"]
        assert list(s.columns) == ["timeseries_id", "feature", "entity", "is_signal"]
        assert set(s["is_signal"].unique()) <= {0, 1}

    def test_mixedeffects_approx(self, study):
        cfg = StudyConfig(site_scoring_method="mixedeffects", features="average")
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        s = out["site_scores"]
        assert list(s.columns) == [
            "timeseries_id", "feature", "entity", "mean", "median", "sd",
            "p_value", "fdr_corrected_pvalue_logp",
        ]
        assert (s["p_value"].between(0, 1)).all()

    def test_custom_reference_groups(self, study):
        crg = pd.DataFrame(
            {
                "parameter_id": ["param_1"],
                "feature": ["average"],
                "ref_group": ["country"],
            }
        )
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"],
            custom_reference_groups=crg,
        )
        s = out["site_scores"]
        got = s[(s["feature"] == "average")]["ref_group"].unique()
        # param_1 average groups are scored vs country, others global
        assert "country" in got
        assert set(s["ref_group"].unique()) <= {"country", "global"}


class TestAdaptiveAndOptimize:
    def test_adaptive_runs(self, study):
        cfg = StudyConfig(autogenerate_timeseries="adaptive")
        out = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        assert out["timeseries"] is not None and len(out["timeseries"]) > 0
        # adaptive combos are sorted ascending (R/ctas.R:951)
        for combo in out["timeseries"]["timepoint_combo"]:
            ranks = [float(x) for x in combo.split(";")]
            assert ranks == sorted(ranks)

    def test_optimize_superset(self, study):
        # test_process_a_study.R:60-118: default combos ⊆ optimized combos
        base = process_a_study(study["subjects"], study["parameters"], study["data"])
        cfg = StudyConfig(optimize_sites_and_patients=True)
        opt = process_a_study(
            study["subjects"], study["parameters"], study["data"], cfg=cfg
        )
        base_combos = set(
            zip(base["timeseries"]["parameter_id"], base["timeseries"]["timepoint_combo"])
        )
        opt_combos = set(
            zip(opt["timeseries"]["parameter_id"], opt["timeseries"]["timepoint_combo"])
        )
        assert base_combos <= opt_combos
