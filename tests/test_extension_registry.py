"""§2.10 user-extension surface: registered per-series features and
site-scoring methods flow through both the oracle and the distributed
pipeline without engine changes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.config import StudyConfig
from ctas_ray.fixtures import generate_ctas_study
from ctas_ray.functions.series import FEATURE_REGISTRY, register_feature
from ctas_ray.oracle import process_a_study
from ctas_ray.study_core import SCORING_REGISTRY, register_scoring


def _median_feature(wide: np.ndarray, baseline: str) -> np.ndarray:
    with np.errstate(all="ignore"):
        return np.nanmedian(wide, axis=1)


def _site_mean_z(group: pd.DataFrame) -> pd.DataFrame:
    m = group.groupby("site")["value"].mean()
    z = (m - m.mean()) / (m.std(ddof=1) or 1.0)
    return pd.DataFrame({"entity": m.index, "site_z": z.to_numpy()})


@pytest.fixture()
def registered():
    register_feature("median", _median_feature)
    register_scoring("site_mean_z", _site_mean_z, empty_columns=["entity", "site_z"])
    yield
    FEATURE_REGISTRY.pop("median", None)
    SCORING_REGISTRY.pop("site_mean_z", None)


@pytest.fixture(scope="module")
def study():
    return generate_ctas_study(seed=23)


def test_unregistered_feature_rejected(study):
    from ctas_ray.schemas import SchemaError

    with pytest.raises(SchemaError):
        StudyConfig(features="average;median")


def test_registered_feature_oracle(registered, study):
    cfg = StudyConfig(features="average;median")
    out = process_a_study(study["subjects"], study["parameters"], study["data"], cfg=cfg)
    feats = out["timeseries_features"]
    med = feats[feats["feature"] == "median"]
    assert len(med) > 0
    # spot-check one value against a direct recomputation
    ts = out["timeseries"].iloc[0]
    row = med[med["timeseries_id"] == ts["timeseries_id"]].iloc[0]
    combo = [float(x) for x in ts["timepoint_combo"].split(";")]
    m = study["data"]
    m = m[
        (m["parameter_id"] == ts["parameter_id"])
        & (m["subject_id"] == row["subject_id"])
        & (m["timepoint_rank"].isin(combo))
    ]
    assert row["feature_value"] == pytest.approx(
        np.nanmedian(m["result"].to_numpy()), rel=1e-12
    )


def test_registered_scoring_oracle(registered, study):
    cfg = StudyConfig(features="average", site_scoring_method="site_mean_z")
    out = process_a_study(study["subjects"], study["parameters"], study["data"], cfg=cfg)
    s = out["site_scores"]
    assert {"entity", "site_z"} <= set(s.columns)
    assert len(s) > 0


def test_registered_distributed_matches_oracle(registered, study, ray_session):
    import ray.data as rd
    from ctas_ray.pipelines.study import process_a_study_ray

    cfg = StudyConfig(features="average;median", site_scoring_method="site_mean_z")
    oracle = process_a_study(
        study["subjects"], study["parameters"], study["data"], cfg=cfg
    )
    dist = process_a_study_ray(
        rd.from_pandas(study["data"]).repartition(8),
        study["subjects"], study["parameters"], cfg=cfg,
    )
    keys = ["timeseries_id", "subject_id", "feature"]
    fa = oracle["timeseries_features"].sort_values(keys).reset_index(drop=True)
    fb = dist["timeseries_features"].sort_values(keys).reset_index(drop=True)
    assert len(fa) == len(fb)
    np.testing.assert_allclose(
        fa["feature_value"].to_numpy(), fb["feature_value"].to_numpy(), rtol=1e-12
    )
    sk = ["timeseries_id", "feature", "ref_group", "entity"]
    sa = oracle["site_scores"].sort_values(sk).reset_index(drop=True)
    sb = dist["site_scores"].sort_values(sk).reset_index(drop=True)
    assert len(sa) == len(sb)
    np.testing.assert_allclose(
        sa["site_z"].to_numpy(dtype=float), sb["site_z"].to_numpy(dtype=float), rtol=1e-9
    )
