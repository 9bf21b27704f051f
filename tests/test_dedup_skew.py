"""Skew-hardening regressions for the dedup stages (VERDICT r01 item 2).

- simhash vs brute force: pins the uint64-fingerprint transport fix
  (int64-wrapped fingerprints made hamming64 undercount -> phantom
  clusters, nondeterministic across block layouts).
- skew stress: 10^5 identical copies of one document + planted
  near-dups must finish (exact collapse keeps the identical mass out of
  the LSH buckets entirely; the old all-pairs bucket would be O(10^10)).
- distributed label-propagation components == driver union-find.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_simhash_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ctas_ray.functions.text import WS_RE, hamming64, simhash64
    from ctas_ray.stages.dedup import _connected_components, simhash_dedup

    docs_pd = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    fps = {
        r.doc_id: simhash64([t for t in WS_RE.split(r.text.strip()) if t])
        for r in docs_pd.itertuples()
    }
    ids = sorted(fps)
    oa, ob = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if hamming64(fps[ids[i]], fps[ids[j]]) <= 3:
                oa.append(ids[i])
                ob.append(ids[j])
    truth = _connected_components(pd.DataFrame({"id_a": oa, "id_b": ob}), "doc_id")
    got = simhash_dedup(
        rd.from_pandas(docs_pd), max_hamming=3, concurrency=2
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth.reset_index(drop=True))


def test_hamming64_masks_int64_wrapped_inputs():
    from ctas_ray.functions.text import hamming64

    fp = np.uint64(0x8000000000000001)  # wraps negative as int64
    wrapped = int(np.int64(np.uint64(fp)))
    assert wrapped < 0
    assert hamming64(wrapped, 0) == 2
    assert hamming64(int(fp), wrapped) == 0


@pytest.mark.slow
def test_minhash_skew_stress(ray_session):
    """10^5 identical docs + planted near-dups: must complete quickly
    (collapse) and still find the planted near-dup cluster."""
    import ray.data as rd

    from ctas_ray.stages.dedup import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base] * 100_000
    ids = list(range(100_000))
    # 50 unique docs
    for i in range(50):
        texts.append(f"completely unrelated document number {i} " * 3)
        ids.append(100_000 + i)
    # planted near-dup pair of the base text (one char changed)
    texts.append(base.replace("lazy", "hazy"))
    ids.append(200_000)
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64), "text": texts})
    ).repartition(8)
    # concurrency 2 (not 4): the pytest session has num_cpus=4, and an
    # actor pool holding every CPU starves the verify-join aggregators
    out = minhash_lsh_dedup(docs, threshold=0.6, concurrency=2)
    by_cluster = out.groupby("cluster_id")["doc_id"].apply(set)
    # the identical mass forms ONE cluster rooted at doc 0, including the
    # near-dup 200000
    assert 0 in by_cluster.index
    big = by_cluster.loc[0]
    assert len(big) >= 100_000
    assert 200_000 in big


def test_distributed_cc_matches_driver(ray_session):
    import ray.data as rd

    from ctas_ray.stages.dedup import (
        _connected_components,
        _connected_components_distributed,
    )

    rng = np.random.default_rng(5)
    # a few random components: chains + stars
    edges = []
    for comp in range(6):
        nodes = rng.choice(np.arange(comp * 100, comp * 100 + 50), size=20, replace=False)
        for a, b in zip(nodes[:-1], nodes[1:]):
            edges.append((int(min(a, b)), int(max(a, b))))
    pairs = pd.DataFrame(edges, columns=["id_a", "id_b"])
    want = _connected_components(pairs, "doc_id")
    got = _connected_components_distributed(
        rd.from_pandas(pairs).repartition(4), "doc_id", num_partitions=4
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
