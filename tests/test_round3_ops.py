"""Round-3 operators: PQ-ADC search, passage-window dedup, weekly tier."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def test_pq_adc_topk_matches_bruteforce_over_codes():
    """ADC ranking must equal brute force over the fitted codes: for
    every vector, dist = lut0[code0] + lut1[code1]; top-k by (dist, id)."""
    from ctas_ray.stages.clustering import (
        _kmeans_spans,
        _quantize,
        pq_adc_topk,
    )

    rng = np.random.default_rng(7)
    n, dim = 60, 8
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": list(emb)})
    ds = rd.from_pandas(df)

    got = pq_adc_topk(ds, dim=dim, k=4, iters=2, topk=10)

    codes, cents = _kmeans_spans(
        ds, [(0, dim // 2), (dim // 2, dim)], 4, 2, "vec_id", "embedding",
        return_centroids=True,
    )
    q = _quantize(
        pd.Series([df.sort_values("vec_id")["embedding"].iloc[0]])
    )
    spans = [(0, dim // 2), (dim // 2, dim)]
    luts = [((q[0][lo:hi][None, :] - cents[si]) ** 2).sum(axis=1)
            for si, (lo, hi) in enumerate(spans)]
    dist = (luts[0][codes["code_0"].to_numpy()]
            + luts[1][codes["code_1"].to_numpy()])
    order = np.lexsort((codes["vec_id"].to_numpy(), dist))[:10]
    want_ids = codes["vec_id"].to_numpy()[order]
    want_dist = dist[order]

    assert list(got["vec_id"]) == list(want_ids)
    assert list(got["adc_dist2"]) == list(want_dist)


def test_substring_duplicate_windows_ground_truth():
    """Planted shared passage: only docs containing it are flagged, and
    unique-text docs are not."""
    from ctas_ray.stages.dedup import substring_duplicate_windows

    rng = np.random.default_rng(3)
    passage = "the quick brown fox jumps over the lazy dog again and again"

    def noise(k):
        return "".join(rng.choice(list("abcdefgh ij"), size=k))

    rows = []
    for i in range(6):
        if i < 3:  # carriers: unique prefix + the shared passage
            rows.append((i, noise(40) + passage + noise(25)))
        else:      # non-carriers: unique text
            rows.append((i, noise(120)))
    docs = rd.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = substring_duplicate_windows(docs)
    flagged = set(out["doc_id"])
    assert flagged == {0, 1, 2}
    assert (out["n_shared_windows"] >= 1).all()


def test_substring_windows_empty_and_short_docs():
    from ctas_ray.stages.dedup import substring_duplicate_windows

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["short", "tiny"]})
    )
    out = substring_duplicate_windows(docs)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_shared_windows"]


def test_weekly_tier_cascade_equals_direct(tmp_path):
    """1w cascaded from 1d == direct weekly aggregation of the turns."""
    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import run_rollup_events

    rng = np.random.default_rng(11)
    n = 400
    uid = rng.integers(0, 12, n)
    ts = (np.int64(1_700_000_000_000_000)
          + rng.integers(0, 21 * 86_400_000_000, n).astype(np.int64))
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": uid.astype(np.int64),
            "event_type": "chat",
            "ts": ts.astype("datetime64[us]"),
            "value": rng.integers(1, 50, n).astype(np.float64),
            "props": ["x" * int(k) for k in rng.integers(1, 30, n)],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet")

    paths = run_rollup_events(
        str(sf), str(tmp_path / "out"),
        RollupConfig(tiers_s=(60, 3600, 86400, 604800)),
    )
    week = rd.read_parquet(paths["tier_1w"]).to_pandas()

    # direct: derive turns exactly like the engine (per-conv text_len
    # channel), aggregate straight to 604800s buckets
    g = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g["conv_id"] = "u" + g["user_id"].astype(str)
    g["text_len"] = g["props"].str.len().astype(float)
    g["bucket"] = (
        g["ts"].astype("datetime64[us]").astype(np.int64)
        // 604_800_000_000 * 604_800_000_000
    )
    direct = g.groupby(["conv_id", "bucket"]).agg(
        n=("text_len", "size"), s=("text_len", "sum"),
        mn=("text_len", "min"), mx=("text_len", "max"),
    ).reset_index()
    w = week[week["channel"] == "text_len"].sort_values(
        ["conv_id", "bucket"]).reset_index(drop=True)
    d = direct.sort_values(["conv_id", "bucket"]).reset_index(drop=True)
    assert len(w) == len(d)
    assert (w["count"].to_numpy(np.int64) == d["n"].to_numpy(np.int64)).all()
    assert (w["sum"].to_numpy(np.float64) == d["s"].to_numpy()).all()
    assert (w["min"].to_numpy(np.float64) == d["mn"].to_numpy()).all()
    assert (w["max"].to_numpy(np.float64) == d["mx"].to_numpy()).all()
