"""Scale-path regressions for similarity search (VERDICT r01 items 4, 8)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_fit_centroids_sample_is_bounded(ray_session, monkeypatch):
    """The driver-side sample must be <= max_sample rows for ANY corpus
    size — the old fractional sample collected O(corpus) rows."""
    import ray.data as rd

    import ctas_ray.stages.similarity as sim

    rng = np.random.default_rng(3)
    emb = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(5000),
                "embedding": list(rng.normal(size=(5000, 8))),
            }
        )
    ).repartition(8)

    seen = {}
    orig_take_all = rd.Dataset.take_all

    def counting_take_all(self, *a, **kw):
        rows = orig_take_all(self, *a, **kw)
        seen["n"] = len(rows)
        return rows

    monkeypatch.setattr(rd.Dataset, "take_all", counting_take_all)
    cents = sim.fit_centroids(emb, n_centroids=4, max_sample=500)
    assert cents.shape == (4, 8)
    assert seen["n"] <= 500


def test_embedding_neardup_nonvacuous(ray_session):
    """Planted perturbed vectors guarantee a non-empty near-dup result;
    each planted vector clusters with its original."""
    from ctas_ray.pipelines.queries import (
        N_PLANTED_NEARDUP,
        PLANTED_ID_BASE,
        embedding_neardup,
    )

    out = embedding_neardup(SF)
    assert len(out) > 0
    planted = out[out["vec_id"] >= PLANTED_ID_BASE]
    assert len(planted) == N_PLANTED_NEARDUP
    # every planted vec clusters with its original (cluster root = the
    # original's component min, which is <= original id)
    assert (planted["cluster_id"] < PLANTED_ID_BASE).all()
    for vid, cid in zip(planted["vec_id"], planted["cluster_id"]):
        orig = vid - PLANTED_ID_BASE
        orig_row = out[out["vec_id"] == orig]
        assert len(orig_row) == 1 and orig_row["cluster_id"].iloc[0] == cid


def test_ivf_recall_target(ray_session):
    from ctas_ray.pipelines.queries import ivf_recall

    r = ivf_recall(SF)
    assert len(r) == 5
    assert r["recall_e6"].mean() >= 0.8e6
