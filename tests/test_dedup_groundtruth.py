"""Recall of the dedup pipelines against brute-force ground truth on
real driver testdata (sf0.001, 500 docs = 125k pairs).

This is the check that caught the mod-anchor recall loss: planted-dup
tests only prove the happy path, while ground truth proves the
*blocking* step (anchors / bands) does not silently drop true pairs on
a low-diversity corpus (the documents table shares a ~45-word
vocabulary — the hardest case for shingle-value blocking).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pd():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def true_pairs(docs_pd):
    """All (id_a < id_b) pairs with exact 5-gram Jaccard >= 0.9."""
    from ctas_ray.functions.text import char_shingles
    from ctas_ray.stages.dedup import jaccard

    sh = {r.doc_id: char_shingles(r.text, 5) for r in docs_pd.itertuples()}
    ids = sorted(sh)
    pairs = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if jaccard(sh[ids[i]], sh[ids[j]]) >= 0.9:
                pairs.add((ids[i], ids[j]))
    return pairs


def _covered_pairs(clusters: pd.DataFrame) -> set:
    covered = set()
    for _, members in clusters.groupby("cluster_id")["doc_id"].apply(list).items():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                covered.add((ms[i], ms[j]))
    return covered


def test_ngram_jaccard_full_recall(docs_pd, true_pairs, ray_session):
    """Exact-verify path must find EVERY true pair (bottom-k anchors
    miss a 0.9-Jaccard pair with prob ~1e-8)."""
    import ray.data as rd

    from ctas_ray.stages.dedup import ngram_jaccard_dedup

    out = ngram_jaccard_dedup(
        rd.from_pandas(docs_pd[["doc_id", "text"]]), threshold=0.9
    )
    covered = _covered_pairs(out)
    missing = true_pairs - covered
    assert not missing, f"ngram dedup lost {len(missing)} true pairs: {sorted(missing)[:5]}"


def test_minhash_recall_bound(docs_pd, true_pairs, ray_session):
    """Estimate-verify path: >= 80% of true 0.9-Jaccard pairs must fall
    in a common cluster (64-perm estimate noise ~1/8 can drop a
    borderline pair below the 0.9 cut; blocking itself should not)."""
    import ray.data as rd

    from ctas_ray.stages.dedup import minhash_lsh_dedup

    if not true_pairs:
        pytest.skip("corpus has no true pairs at 0.9")
    out = minhash_lsh_dedup(
        rd.from_pandas(docs_pd[["doc_id", "text"]]), threshold=0.9
    )
    covered = _covered_pairs(out)
    recall = len(true_pairs & covered) / len(true_pairs)
    assert recall >= 0.8, f"minhash recall {recall:.2f} over {len(true_pairs)} true pairs"
