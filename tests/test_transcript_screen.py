"""Flagship composition: anomaly screen over transcripts vs the
driver-side mapping + single-process oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.config import StudyConfig
from ctas_ray.fixtures import generate_transcripts, transcripts_to_study_tables
from ctas_ray.oracle import process_a_study


@pytest.fixture(scope="module")
def tx():
    return generate_transcripts(n_conv=100, seed=17)


def test_distributed_screen_matches_oracle(tx, ray_session):
    import ray.data as rd
    from ctas_ray.pipelines.transcript_screen import screen_transcripts

    cfg = StudyConfig(max_share_missing=0.8, features="average;sd;range;autocorr")
    dist = screen_transcripts(rd.from_arrow(tx).repartition(6), cfg)

    tables = transcripts_to_study_tables(tx)
    oracle = process_a_study(
        tables["subjects"], tables["parameters"], tables["data"], cfg=cfg
    )
    a = oracle["timeseries"].sort_values("timeseries_id").reset_index(drop=True)
    b = dist["timeseries"].sort_values("timeseries_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["timeseries_id", "parameter_id", "baseline", "timepoint_combo", "timepoint_count"]],
        b[["timeseries_id", "parameter_id", "baseline", "timepoint_combo", "timepoint_count"]],
        check_dtype=False,
    )
    keys = ["timeseries_id", "subject_id", "feature"]
    fa = oracle["timeseries_features"].sort_values(keys).reset_index(drop=True)
    fb = dist["timeseries_features"].sort_values(keys).reset_index(drop=True)
    assert len(fa) == len(fb)
    np.testing.assert_allclose(
        fa["feature_value"].to_numpy(), fb["feature_value"].to_numpy(), rtol=1e-12
    )
    sk = ["timeseries_id", "feature", "ref_group", "site"]
    sa = oracle["site_scores"].sort_values(sk).reset_index(drop=True)
    sb = dist["site_scores"].sort_values(sk).reset_index(drop=True)
    assert len(sa) == len(sb)
    np.testing.assert_allclose(
        sa["fdr_corrected_pvalue_logp"].to_numpy(),
        sb["fdr_corrected_pvalue_logp"].to_numpy(),
        rtol=1e-9,
    )


def test_screen_vector_mode(tx, ray_session):
    import ray.data as rd
    from ctas_ray.pipelines.transcript_screen import screen_transcripts

    cfg = StudyConfig(max_share_missing=0.8, features="average")
    classic = screen_transcripts(rd.from_arrow(tx).repartition(6), cfg)
    vector = screen_transcripts(
        rd.from_arrow(tx).repartition(6), cfg, plan_mode="vector"
    )
    a = classic["timeseries"].sort_values("timeseries_id").reset_index(drop=True)
    b = vector["timeseries"].sort_values("timeseries_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_transcript_screen_iqr_query(ray_session):
    """The hash-verified flagship query: sane shape, gated features,
    binary signals, mod-12 site entities."""
    from ctas_ray.pipelines.queries import transcript_screen_iqr_sitescores

    out = transcript_screen_iqr_sitescores("/root/testdata/sf0.001")
    assert len(out) > 0
    assert set(out.columns) == {"timeseries_id", "feature", "entity", "is_signal"}
    assert set(out["is_signal"].unique()) <= {0, 1}
    assert out["entity"].str.match(r"site_\d+").all()
    assert out["feature"].isin(
        ["average", "range", "sd", "unique_value_count_relative", "autocorr"]
    ).all()
