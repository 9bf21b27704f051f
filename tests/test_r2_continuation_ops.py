"""Round-2 continuation operators: integer-exact k-means, early/late
KS drift, sequence packing, retention-pruned tier read — naive-numpy
oracle parity at sf0.001 plus structural invariants (the DuckDB hash
parity is exercised separately by scripts/check_contract.py and the
driver)."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _naive_kmeans(vecs: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Single-process transcription of stages/clustering.py semantics."""
    q = np.floor(vecs.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    cents = q[order[:k]].copy()
    for _ in range(iters):
        d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = q[m].sum(axis=0) // m.sum()
    d2 = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(q)), a]


def test_kmeans_matches_naive(ray_session):
    from ctas_ray.pipelines import queries as q

    got = q.kmeans_embedding_clusters(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vecs = np.stack(
        [np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    want_a, want_d = _naive_kmeans(vecs, ids, q.KMEANS_K, q.KMEANS_ITERS)
    want = (
        pd.DataFrame({"vec_id": ids, "cluster": want_a, "dist2": want_d})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (got["vec_id"].to_numpy() == want["vec_id"].to_numpy()).all()
    assert (got["cluster"].to_numpy() == want["cluster"].to_numpy()).all()
    assert (got["dist2"].to_numpy() == want["dist2"].to_numpy()).all()
    # non-degenerate: more than one cluster in use
    assert got["cluster"].nunique() > 1


def test_drift_split_ks_naive(ray_session):
    from ctas_ray.functions.stats import ks_test
    from ctas_ray.pipelines import queries as q

    got = q.drift_split_ks(SF)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev[ev["value"].notna()]
    for _, row in got.iterrows():
        g = ev[ev["event_type"] == row["parameter_id"]].sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        n = len(g)
        assert row["n_early"] == n // 2
        assert row["n_late"] == n - n // 2
        v = g["value"].to_numpy(np.float64)
        stat, _ = ks_test(v[: n // 2], v[n // 2:], "two.sided")
        assert row["ks_e6"] == int(np.floor(stat * 1e6 + 0.5))
    assert len(got) > 0


def test_pack_sequences_invariants(ray_session):
    from ctas_ray.pipelines import queries as q

    got = q.pack_sequences(SF)
    assert len(got) == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert (got["shard"].to_numpy() == got["doc_id"].to_numpy() % q.PACK_SHARDS).all()
    assert (got["tok"].to_numpy() <= q.PACK_CTX).all()
    # every bin's content fits the budget and offsets tile it exactly
    fill = got.groupby(["shard", "bin"])["tok"].sum()
    assert (fill <= q.PACK_CTX).all()
    for (_, _), grp in got.sort_values("doc_id").groupby(["shard", "bin"]):
        offs = grp["bin_offset"].to_numpy()
        toks = grp["tok"].to_numpy()
        assert offs[0] == 0
        assert (offs[1:] == (offs[:-1] + toks[:-1])).all()
    # greedy: a doc only opens a new bin when it did not fit the last one
    for _, grp in got.sort_values("doc_id").groupby("shard"):
        bins = grp["bin"].to_numpy()
        offs = grp["bin_offset"].to_numpy()
        toks = grp["tok"].to_numpy()
        opened = np.nonzero(np.diff(bins) > 0)[0] + 1
        prev_fill = offs[opened - 1] + toks[opened - 1]
        assert (prev_fill + toks[opened] > q.PACK_CTX).all()


def test_retention_is_filtered_rollup(ray_session):
    from ctas_ray.pipelines import queries as q

    full = q.rollup_1m(SF)
    horizon = q._retention_horizon_us(SF)
    want = (
        full[full["bucket"] >= horizon]
        .sort_values(["conv_id", "channel", "bucket"])
        .reset_index(drop=True)
    )
    got = q.rollup_1m_retention(SF)
    assert len(got) == len(want)
    assert 0 < len(got) < len(full)  # horizon actually drops something
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
