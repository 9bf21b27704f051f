"""Regression tests for the round-2 ADVICE items.

- int8 top-k per-batch cut must use (score desc, id asc) so batch
  boundaries can't change the returned id set under integer ties.
- Misra-Gries non-tokenize path must drop nulls, not count 'None'.
- read_tier_asof must reject non-tier keys ('blobs') clearly.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_int8_topk_tie_break_batch_invariant(ray_session):
    from ctas_ray.stages.similarity import int8_topk_cosine

    # 40 identical unit vectors -> every integer score ties; the only
    # correct top-5 under (score desc, id asc) is the 5 smallest ids.
    n, dim = 40, 8
    vec = np.ones(dim) / np.sqrt(dim)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": [vec] * n}
    )
    qids = np.array([0], dtype=np.int64)
    qvecs = vec.reshape(1, -1)
    for nblocks in (1, 4, 13):
        ds = rd.from_pandas(df).repartition(nblocks)
        out = int8_topk_cosine(ds, qids, qvecs, k=5)
        assert list(out["vec_id"]) == [0, 1, 2, 3, 4], nblocks


def test_mg_non_tokenize_drops_nulls(ray_session):
    from ctas_ray.stages.sketches import heavy_hitters_mg

    df = pd.DataFrame({"tool": ["a", None, "a", None, "b", None, None]})
    out = heavy_hitters_mg(rd.from_pandas(df), "tool", k=8, tokenize=False)
    assert "None" not in set(out["item"])
    got = dict(zip(out["item"], out["mg_count"]))
    assert got["a"] == 2 and got["b"] == 1


def test_read_tier_asof_rejects_blobs_key(ray_session):
    from ctas_ray.pipelines.rollup import read_tier_asof

    with pytest.raises(ValueError, match="tier keys"):
        read_tier_asof({"blobs": "/tmp/nope"}, "blobs")
