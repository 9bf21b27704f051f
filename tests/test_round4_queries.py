"""Round-4 query kernels: independent oracles + partition invariance.

The DuckDB contract (scripts/check_contract.py) is the primary gate for
these; here we pin the semantics against straight-line NumPy/Python
reimplementations (so an oracle-SQL bug can't hide a kernel bug) and
prove the exchanged kernels are invariant to the partition count.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _emb(columns):
    return pq.read_table(f"{SF}/embeddings.parquet", columns=columns).to_pandas()


def _quant(vecs):
    m = np.stack(list(vecs))
    return np.floor(m.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)


def test_mmr_matches_bruteforce_greedy(ray_session):
    from ctas_ray.pipelines import queries as q

    out = q.mmr_diverse_topk(SF)
    e = _emb(["vec_id", "embedding"]).sort_values("vec_id").reset_index(drop=True)
    qm = _quant(e["embedding"])
    ids = e["vec_id"].to_numpy(np.int64)
    qv = qm[0]  # min vec_id row after the sort
    rel = qm @ qv
    pool_ix = np.lexsort((ids, -rel))[: q.MMR_POOL]
    sims = qm[pool_ix] @ qm[pool_ix].T
    prel, pids = rel[pool_ix], ids[pool_ix]

    sel, expect = [], []
    remaining = list(range(len(pool_ix)))
    for rank in range(1, q.MMR_K + 1):
        best, score = None, None
        for i in remaining:
            s = 2 * prel[i] - (max(sims[i, j] for j in sel) if sel else 0)
            if best is None or s > score or (s == score and pids[i] < pids[best]):
                best, score = i, s
        sel.append(best)
        remaining.remove(best)
        expect.append((rank, int(pids[best]), int(score)))

    got = list(out.itertuples(index=False, name=None))
    assert got == expect


def test_hard_negatives_match_bruteforce(ray_session):
    from ctas_ray.pipelines import queries as q

    out = q.hard_negative_mining(SF)
    e = _emb(["vec_id", "embedding", "label"]).sort_values("vec_id")
    qm = _quant(e["embedding"])
    ids = e["vec_id"].to_numpy(np.int64)
    lbl = e["label"].to_numpy(np.int64)
    rows = []
    for alab in np.unique(lbl):
        aix = np.flatnonzero(lbl == alab)[0]  # min vec_id anchor (sorted)
        dots = qm @ qm[aix]
        mask = (lbl != alab) & (ids != ids[aix])
        order = np.lexsort((ids[mask], -dots[mask]))[: q.HARDNEG_K]
        for r, o in enumerate(order, 1):
            rows.append(
                (int(alab), r, int(ids[mask][o]), int(lbl[mask][o]),
                 int(dots[mask][o]))
            )
    assert list(out.itertuples(index=False, name=None)) == rows


def test_interval_coverage_matches_python_merge(ray_session):
    from ctas_ray.pipelines import queries as q

    out = q.interval_union_coverage(SF).set_index("user_id")
    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    ev["t"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    w = q.COVERAGE_WINDOW_US
    for uid, g in ev.groupby("user_id"):
        merged = []
        for t in sorted(g["t"]):
            if merged and t <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], t + w)
            else:
                merged.append([t, t + w])
        assert out.loc[uid, "n_intervals"] == len(merged)
        assert out.loc[uid, "covered_us"] == sum(e - s for s, e in merged)


@pytest.mark.parametrize("buckets_pair", [(2, 11)])
def test_round4_kernels_invariant_to_bucket_count(
    ray_session, monkeypatch, buckets_pair
):
    from ctas_ray.pipelines import queries as q

    def run(n):
        monkeypatch.setattr(q, "parts_for", lambda ds, **kw: n)
        monkeypatch.setattr(q, "adaptive_parts", lambda *a, **kw: n)
        return {
            "sess": q.session_transition_matrix(SF),
            "cover": q.interval_union_coverage(SF),
            "rare": q.rare_token_share(SF),
            "tri": q.trigram_novelty(SF),
            "q22": q.tpch_q22_idle_customers(SF),
        }

    a, b = (run(n) for n in buckets_pair)
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True)
        )
        assert len(a[k]) > 0, k


def test_q7_empty_result_keeps_schema(ray_session):
    from ctas_ray.pipelines import queries as q

    out = q.tpch_q7_volume_shipping(SF)  # no qualifying pairs at sf0.001
    assert list(out.columns) == [
        "supp_nation", "cust_nation", "l_year", "revenue_e4"
    ]
