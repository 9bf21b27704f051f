"""Exact prefix-filtered similarity join (stages/dedup.py:
jaccard_similarity_join): guaranteed recall vs brute force, oracle
parity, exact-duplicate expansion, threshold-boundary behavior."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _brute_pairs(texts: dict, threshold: float, k: int = 5) -> dict:
    from ctas_ray.functions.text import char_shingles
    from ctas_ray.stages.dedup import jaccard

    sh = {i: char_shingles(t, k) for i, t in texts.items()}
    ids = sorted(sh)
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = jaccard(sh[ids[i]], sh[ids[j]])
            if jac >= threshold:
                out[(ids[i], ids[j])] = jac
    return out


def test_join_matches_driver_oracle(ray_session):
    import __ray_entry__ as entry

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = entry.queries()["jaccard_neardup_pairs"](SF)
    want = con.execute(entry.oracle_sql()["jaccard_neardup_pairs"]).df()
    assert len(got) == len(want) and len(got) > 0
    for c in ("id_a", "id_b", "jaccard_e6"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_join_exact_vs_bruteforce_boundary(ray_session):
    """Synthetic corpus with pairs straddling the threshold, plus an
    exact-duplicate triple: the result must equal brute force exactly —
    prefix filtering is guaranteed-recall, not probabilistic."""
    from ctas_ray.stages.dedup import jaccard_similarity_join

    rng = np.random.default_rng(11)
    words = [f"w{i:03d}" for i in range(40)]
    base = " ".join(rng.choice(words, 60))
    texts = {0: base, 1: base, 2: base}  # exact-dup triple
    # graded perturbations: swap a growing suffix for new words
    for i in range(3, 23):
        parts = base.split(" ")
        cut = (i - 3) * 2
        if cut:
            parts[-cut:] = rng.choice(words, cut)
        texts[i] = " ".join(parts)
    # unrelated docs
    for i in range(23, 33):
        texts[i] = " ".join(rng.choice(words, 60))
    t = 0.8
    truth = _brute_pairs(texts, t)
    docs = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    out = jaccard_similarity_join(
        rd.from_pandas(docs).repartition(4), threshold=t
    )
    got = {(a, b): j for a, b, j in zip(out["id_a"], out["id_b"], out["jac"])}
    assert set(got) == set(truth), (
        set(truth) - set(got), set(got) - set(truth)
    )
    for k in truth:
        assert got[k] == truth[k], k
    # the dup triple is present with jaccard exactly 1.0
    for pair in [(0, 1), (0, 2), (1, 2)]:
        assert got[pair] == 1.0


def test_join_dup_member_expansion(ray_session):
    """A near-dup partner of a duplicated doc must pair with EVERY
    member of the exact-dup group, with the rep pair's jaccard."""
    from ctas_ray.stages.dedup import jaccard_similarity_join

    base = " ".join(f"tok{i:04d}" for i in range(60))
    near = " ".join(f"tok{i:04d}" for i in range(55))  # drop a suffix
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base, base, near]}
    )
    out = jaccard_similarity_join(rd.from_pandas(docs), threshold=0.5)
    pairs = {(a, b): j for a, b, j in zip(out["id_a"], out["id_b"], out["jac"])}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert pairs[(1, 3)] == pairs[(2, 3)] < 1.0


def test_join_no_pairs_below_threshold(ray_session):
    from ctas_ray.stages.dedup import jaccard_similarity_join

    rng = np.random.default_rng(5)
    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "text": [
                " ".join(rng.choice([f"u{i}{j}" for i in range(50)], 30))
                for j in range(10)
            ],
        }
    )
    out = jaccard_similarity_join(rd.from_pandas(docs), threshold=0.95)
    assert len(out) == 0


def test_join_df_order_same_result(ray_session):
    """The global token order (hash vs document-frequency) changes
    candidate volume only — the verified pair set must be identical."""
    import pyarrow.parquet as pq

    from ctas_ray.stages.dedup import jaccard_similarity_join

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[["doc_id", "text"]]
    ds = rd.from_pandas(docs).repartition(4)
    a = jaccard_similarity_join(ds, threshold=0.8, order="hash")
    b = jaccard_similarity_join(ds, threshold=0.8, order="df")
    assert len(a) == len(b) and len(a) > 0
    for c in ("id_a", "id_b", "jac"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def test_clusters_distributed_cc_matches_union_find(ray_session):
    """The distributed connected-components path (min-label propagation
    + pointer doubling) must produce exactly the driver union-find's
    clusters over the same exact pair set."""
    import pyarrow.parquet as pq

    from ctas_ray.stages.dedup import (
        _connected_components,
        _connected_components_distributed,
        jaccard_similarity_join,
    )

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[["doc_id", "text"]]
    pairs = jaccard_similarity_join(rd.from_pandas(docs), threshold=0.8)
    assert len(pairs) > 0
    ref = _connected_components(pairs, "doc_id")
    got = _connected_components_distributed(
        rd.from_pandas(pairs[["id_a", "id_b"]]).repartition(3),
        "doc_id",
        num_partitions=4,
    )
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (ref["doc_id"].to_numpy() == got["doc_id"].to_numpy()).all()
    assert (ref["cluster_id"].to_numpy() == got["cluster_id"].to_numpy()).all()


def test_join_dense_candidates_matches_bruteforce(ray_session):
    """Dense-candidate regime: 300 near-identical template docs force
    ~all-pairs candidates; the demand-routed verify must return exactly
    the brute-force pair set (and not blow up)."""
    from ctas_ray.stages.dedup import jaccard_similarity_join

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight ")
    texts = {}
    for i in range(300):
        # vary a small suffix so docs are near but not exact duplicates
        texts[i] = base * 3 + f"variant token {i % 7} tail {i % 3}"
    docs = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = jaccard_similarity_join(rd.from_pandas(docs).repartition(4),
                                  threshold=0.9)
    want = _brute_pairs(texts, 0.9)
    got = {(a, b): j for a, b, j in zip(out["id_a"], out["id_b"], out["jac"])}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
