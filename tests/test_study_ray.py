"""Distributed study pipeline vs the single-process oracle — frames must
match (values to float tolerance; ids/combos exactly)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.config import StudyConfig
from ctas_ray.fixtures import generate_ctas_study
from ctas_ray.oracle import process_a_study


@pytest.fixture(scope="module")
def study():
    return generate_ctas_study(seed=7)


def _run_both(study, cfg, ray_session, custom=None, crg=None):
    import ray.data as rd
    from ctas_ray.pipelines.study import process_a_study_ray

    oracle = process_a_study(
        study["subjects"], study["parameters"], study["data"],
        custom, crg, cfg,
    )
    data_ds = rd.from_pandas(study["data"]).repartition(8)
    dist = process_a_study_ray(
        data_ds, study["subjects"], study["parameters"], custom, crg, cfg
    )
    return oracle, dist


def _sorted(df, keys):
    return df.sort_values(keys, kind="mergesort").reset_index(drop=True)


class TestParity:
    @pytest.fixture(scope="class")
    def pair(self, study, ray_session):
        return _run_both(study, StudyConfig(), ray_session)

    def test_timeseries_table_identical(self, pair):
        oracle, dist = pair
        a = _sorted(oracle["timeseries"], ["timeseries_id"])
        b = _sorted(dist["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_features_identical(self, pair):
        oracle, dist = pair
        keys = ["timeseries_id", "subject_id", "feature"]
        a = _sorted(oracle["timeseries_features"], keys)
        b = _sorted(dist["timeseries_features"], keys)
        assert len(a) == len(b)
        for k in keys + ["site", "country", "region"]:
            assert (a[k].to_numpy() == b[k].to_numpy()).all(), k
        np.testing.assert_allclose(
            a["feature_value"].to_numpy(), b["feature_value"].to_numpy(),
            rtol=1e-12, atol=1e-12,
        )

    def test_pca_identical_up_to_sign(self, pair):
        oracle, dist = pair
        keys = ["timeseries_id", "subject_id"]
        a = _sorted(oracle["PCA_coordinates"], keys)
        b = _sorted(dist["PCA_coordinates"], keys)
        assert len(a) == len(b)
        np.testing.assert_allclose(
            np.abs(a[["pc1", "pc2"]].to_numpy(dtype=float)),
            np.abs(b[["pc1", "pc2"]].to_numpy(dtype=float)),
            rtol=1e-9, atol=1e-9,
        )

    def test_site_scores_identical(self, pair):
        oracle, dist = pair
        keys = ["timeseries_id", "feature", "ref_group", "site"]
        a = _sorted(oracle["site_scores"], keys)
        b = _sorted(dist["site_scores"], keys)
        assert len(a) == len(b)
        for k in keys + ["country", "region"]:
            assert (a[k].to_numpy() == b[k].to_numpy()).all(), k
        np.testing.assert_allclose(
            a[["pvalue_kstest_logp", "kstest_statistic", "fdr_corrected_pvalue_logp"]].to_numpy(dtype=float),
            b[["pvalue_kstest_logp", "kstest_statistic", "fdr_corrected_pvalue_logp"]].to_numpy(dtype=float),
            rtol=1e-9, atol=1e-12,
        )
        assert (a["subject_count"].to_numpy() == b["subject_count"].to_numpy()).all()


class TestParityVariants:
    def test_custom_series_and_ref_groups(self, study, ray_session):
        custom = pd.DataFrame(
            {"timeseries_id": ["cx1"], "parameter_id": ["param_1"],
             "timepoint_combo": ["1;2;3;4;5"]}
        )
        crg = pd.DataFrame(
            {"parameter_id": ["param_1"], "feature": ["average"], "ref_group": ["country"]}
        )
        cfg = StudyConfig(features="average;sd;range")
        oracle, dist = _run_both(study, cfg, ray_session, custom, crg)
        a = _sorted(oracle["timeseries"], ["timeseries_id"])
        b = _sorted(dist["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        sa = _sorted(oracle["site_scores"], ["timeseries_id", "feature", "ref_group", "site"])
        sb = _sorted(dist["site_scores"], ["timeseries_id", "feature", "ref_group", "site"])
        assert len(sa) == len(sb)
        np.testing.assert_allclose(
            sa["fdr_corrected_pvalue_logp"], sb["fdr_corrected_pvalue_logp"], rtol=1e-9
        )
        assert "country" in set(sb["ref_group"])

    def test_avg_feat_value_parity(self, study, ray_session):
        cfg = StudyConfig(site_scoring_method="avg_feat_value", features="average")
        oracle, dist = _run_both(study, cfg, ray_session)
        keys = ["timeseries_id", "feature", "entity"]
        a = _sorted(oracle["site_scores"], keys)
        b = _sorted(dist["site_scores"], keys)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_join_decoration_equals_broadcast(self, study, ray_session):
        # J2 scale path: Dataset.join decoration must match broadcast
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        cfg = StudyConfig(features="average;sd")
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        a = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg,
            decorate_with_join=False,
        )
        b = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg,
            decorate_with_join=True,
        )
        keys = ["timeseries_id", "subject_id", "feature"]
        fa = _sorted(a["timeseries_features"], keys)
        fb = _sorted(b["timeseries_features"], keys)
        pd.testing.assert_frame_equal(fa, fb, check_dtype=False)
        sa = _sorted(a["site_scores"], ["timeseries_id", "feature", "ref_group", "site"])
        sb = _sorted(b["site_scores"], ["timeseries_id", "feature", "ref_group", "site"])
        pd.testing.assert_frame_equal(sa, sb, check_dtype=False)

    def test_adaptive_parity(self, study, ray_session):
        cfg = StudyConfig(autogenerate_timeseries="adaptive", features="average")
        oracle, dist = _run_both(study, cfg, ray_session)
        a = _sorted(oracle["timeseries"], ["timeseries_id"])
        b = _sorted(dist["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_optimize_parity(self, study, ray_session):
        cfg = StudyConfig(optimize_sites_and_patients=True, features="average")
        oracle, dist = _run_both(study, cfg, ray_session)
        a = _sorted(oracle["timeseries"], ["timeseries_id"])
        b = _sorted(dist["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_vector_plan_mode_parity(self, study, ray_session):
        """Scalable (interval/bitmask) planning must reproduce the
        classic path's outputs exactly."""
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        cfg = StudyConfig()
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        classic = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg,
            plan_mode="classic",
        )
        vector = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg,
            plan_mode="vector",
        )
        a = _sorted(classic["timeseries"], ["timeseries_id"])
        b = _sorted(vector["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        keys = ["timeseries_id", "subject_id", "feature"]
        fa = _sorted(classic["timeseries_features"], keys)
        fb = _sorted(vector["timeseries_features"], keys)
        assert len(fa) == len(fb)
        np.testing.assert_allclose(
            fa["feature_value"].to_numpy(), fb["feature_value"].to_numpy(), rtol=1e-12
        )
        sk = ["timeseries_id", "feature", "ref_group", "site"]
        sa = _sorted(classic["site_scores"], sk)
        sb = _sorted(vector["site_scores"], sk)
        assert len(sa) == len(sb)
        np.testing.assert_allclose(
            sa["fdr_corrected_pvalue_logp"].to_numpy(),
            sb["fdr_corrected_pvalue_logp"].to_numpy(), rtol=1e-9,
        )

    def test_vector_plan_mode_custom_parity(self, study, ray_session):
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        custom = pd.DataFrame(
            {"timeseries_id": ["cx1", "cx2"], "parameter_id": ["param_1", "param_2"],
             "timepoint_combo": ["1;2;3;4;5", "2;4;6"]}
        )
        cfg = StudyConfig(features="average;sd")
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        classic = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], custom, cfg=cfg
        )
        vector = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], custom, cfg=cfg,
            plan_mode="vector",
        )
        a = _sorted(classic["timeseries"], ["timeseries_id"])
        b = _sorted(vector["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        keys = ["timeseries_id", "subject_id", "feature"]
        fa = _sorted(classic["timeseries_features"], keys)
        fb = _sorted(vector["timeseries_features"], keys)
        assert len(fa) == len(fb)
        np.testing.assert_allclose(
            fa["feature_value"].to_numpy(), fb["feature_value"].to_numpy(), rtol=1e-12
        )

    def test_vector_plan_mode_custom_only(self, study, ray_session):
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        custom = pd.DataFrame(
            {"timeseries_id": ["solo"], "parameter_id": ["param_1"],
             "timepoint_combo": ["1;2;3;4"]}
        )
        cfg = StudyConfig(autogenerate_timeseries=False, features="average")
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        classic = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], custom, cfg=cfg
        )
        vector = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], custom, cfg=cfg,
            plan_mode="vector",
        )
        pd.testing.assert_frame_equal(
            _sorted(classic["timeseries"], ["timeseries_id"]),
            _sorted(vector["timeseries"], ["timeseries_id"]),
            check_dtype=False,
        )

    def test_vector_plan_mode_optimize_parity(self, study, ray_session):
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        cfg = StudyConfig(optimize_sites_and_patients=True, features="average")
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        classic = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg
        )
        vector = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg,
            plan_mode="vector",
        )
        a = _sorted(classic["timeseries"], ["timeseries_id"])
        b = _sorted(vector["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_vector_plan_mode_adaptive_parity(self, study, ray_session):
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        cfg = StudyConfig(autogenerate_timeseries="adaptive", features="average")
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        classic = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg
        )
        vector = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg,
            plan_mode="vector",
        )
        a = _sorted(classic["timeseries"], ["timeseries_id"])
        b = _sorted(vector["timeseries"], ["timeseries_id"])
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_features_as_dataset_mode(self, study, ray_session):
        # big-study mode: features/PCA come back as lazy Datasets
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        cfg = StudyConfig(features="average;sd")
        out = process_a_study_ray(
            rd.from_pandas(study["data"]).repartition(8),
            study["subjects"], study["parameters"], cfg=cfg,
            features_as_dataset=True,
        )
        feats = out["timeseries_features"]
        assert isinstance(feats, rd.Dataset)
        fdf = feats.to_pandas()
        assert len(fdf) > 0 and {"subject_id", "feature", "value", "site"} <= set(fdf.columns)
        # site_scores still a concrete frame (post-FDR driver output)
        assert len(out["site_scores"]) > 0

    def test_duplicate_measurements_parity(self, study, ray_session):
        # values_fn=mean duplicate handling must agree distributed vs oracle
        dup = pd.concat([study["data"], study["data"].head(300)], ignore_index=True)
        study2 = dict(study, data=dup)
        cfg = StudyConfig(features="average;range")
        oracle, dist = _run_both(study2, cfg, ray_session)
        keys = ["timeseries_id", "subject_id", "feature"]
        fa = _sorted(oracle["timeseries_features"], keys)
        fb = _sorted(dist["timeseries_features"], keys)
        assert len(fa) == len(fb)
        np.testing.assert_allclose(
            fa["feature_value"].to_numpy(), fb["feature_value"].to_numpy(), rtol=1e-12
        )

    def test_empty_data_returns_none(self, study, ray_session):
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        d = study["data"].copy()
        d["result"] = np.nan
        out = process_a_study_ray(
            rd.from_pandas(d), study["subjects"], study["parameters"], cfg=StudyConfig()
        )
        assert all(v is None for v in out.values())


class TestSubjectsDataset:
    def test_subjects_as_dataset_matches_pandas(self, study, ray_session):
        """Scale path: subjects passed as a Dataset (decoration via hash
        join, no driver collect when the feature set needs no site map)
        must equal the pandas-subjects run."""
        import ray.data as rd
        from ctas_ray.pipelines.study import process_a_study_ray

        cfg = StudyConfig(features="average;sd;range")
        data_ds = rd.from_pandas(study["data"]).repartition(8)
        a = process_a_study_ray(
            data_ds, study["subjects"], study["parameters"], cfg=cfg
        )
        b = process_a_study_ray(
            data_ds,
            rd.from_pandas(study["subjects"]).repartition(4),
            study["parameters"],
            cfg=cfg,
        )
        keys = ["timeseries_id", "subject_id", "feature"]
        fa = _sorted(a["timeseries_features"], keys)
        fb = _sorted(b["timeseries_features"], keys)
        pd.testing.assert_frame_equal(fa, fb, check_dtype=False)
        sa = _sorted(a["site_scores"], ["timeseries_id", "feature", "ref_group", "site"])
        sb = _sorted(b["site_scores"], ["timeseries_id", "feature", "ref_group", "site"])
        pd.testing.assert_frame_equal(sa, sb, check_dtype=False)
