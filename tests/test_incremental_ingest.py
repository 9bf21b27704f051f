"""Incremental / late-data ingest (pipelines/rollup.py:
ingest_events_increment): folding a new batch into an existing rollup
at conversation granularity must be BIT-FOR-BIT equal to a
from-scratch rollup of the full history — tiers and Gorilla blobs, in
BOTH output modes (merge-on-read view and materialized rewrite)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def _split_events(tmp_path):
    """FULL history + a time-split: everything before the median ts is
    the prior batch, the rest is the late increment (so roughly every
    conversation gains late turns — the worst case for merging)."""
    ev = pq.read_table(f"{SF}/events.parquet")
    ts = ev["ts"].to_numpy(zero_copy_only=False)
    cut = np.quantile(ts.astype("datetime64[us]").astype(np.int64), 0.5)
    old = ev.filter(pa.array(ts.astype("datetime64[us]").astype(np.int64) <= cut))
    new = ev.filter(pa.array(ts.astype("datetime64[us]").astype(np.int64) > cut))
    d_old = tmp_path / "old"
    d_full = tmp_path / "full"
    os.makedirs(d_old)
    os.makedirs(d_full)
    pq.write_table(old, d_old / "events.parquet")
    pq.write_table(ev, d_full / "events.parquet")
    inc = tmp_path / "increment.parquet"
    pq.write_table(new, inc)
    assert old.num_rows > 0 and new.num_rows > 0
    return str(d_old), str(d_full), str(inc)


def _sorted(df, sort_cols):
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def _frame(paths, columns, sort_cols):
    import ray.data as rd

    return _sorted(rd.read_parquet(paths, columns=columns).to_pandas(), sort_cols)


@pytest.fixture(scope="module")
def ingested(ray_session, tmp_path_factory):
    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        run_rollup_events,
    )

    tmp_path = tmp_path_factory.mktemp("incr")
    d_old, d_full, inc = _split_events(tmp_path)
    cfg = RollupConfig()
    prior = run_rollup_events(d_old, str(tmp_path / "prior"), cfg)
    # materialize=True also writes the increment.json view, so one run
    # exercises BOTH output modes
    merged = ingest_events_increment(
        d_full, inc, prior, str(tmp_path / "merged"), cfg, materialize=True
    )
    scratch = run_rollup_events(d_full, str(tmp_path / "scratch"), cfg)
    return merged, scratch, tmp_path


TIER_COLS = ["conv_id", "channel", "bucket", "count", "sum", "min", "max",
             "sumsq", "first_ts", "first_val", "last_ts", "last_val"]
TIER_KEY = ["conv_id", "channel", "bucket"]


def _assert_tier_equal(a, b):
    assert len(a) == len(b) and len(a) > 0
    for c in TIER_COLS:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            # bit-for-bit: compare payloads, not tolerances
            assert (av.view(np.uint64) == bv.view(np.uint64)).all(), c
        else:
            assert (av == bv).all(), c


@pytest.mark.parametrize("tier", ["tier_1m", "tier_1h", "tier_1d"])
def test_materialized_equals_scratch_tier(ingested, tier):
    merged, scratch, _ = ingested
    a = _frame(merged[tier], TIER_COLS, TIER_KEY)
    b = _frame(scratch[tier], TIER_COLS, TIER_KEY)
    _assert_tier_equal(a, b)


@pytest.mark.parametrize("tier", ["tier_1m", "tier_1h", "tier_1d"])
def test_merge_on_read_equals_scratch_tier(ingested, tier):
    from ctas_ray.pipelines.rollup import read_increment_tier

    merged, scratch, tmp_path = ingested
    view_paths = {tier: {"increment_view": str(tmp_path / "merged"), "key": tier}}
    a = _sorted(
        read_increment_tier(view_paths, tier).to_pandas()[TIER_COLS], TIER_KEY
    )
    b = _frame(scratch[tier], TIER_COLS, TIER_KEY)
    _assert_tier_equal(a, b)


def test_incremental_equals_scratch_blobs(ingested):
    merged, scratch, _ = ingested
    cols = ["conv_id", "channel", "chunk", "n", "blob"]
    key = ["conv_id", "channel", "chunk"]
    a = _frame(merged["blobs"], cols, key)
    b = _frame(scratch["blobs"], cols, key)
    assert len(a) == len(b) and len(a) > 0
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()
    # Gorilla blobs byte-equal: the recompute re-encodes every affected
    # conversation from full history, untouched ones carry forward
    assert all(bytes(x) == bytes(y) for x, y in zip(a["blob"], b["blob"]))


def test_merge_on_read_blobs_equal(ingested):
    from ctas_ray.pipelines.rollup import read_increment_blobs

    merged, scratch, tmp_path = ingested
    key = ["conv_id", "channel", "chunk"]
    a = _sorted(
        read_increment_blobs(
            {"blobs": {"increment_view": str(tmp_path / "merged"), "key": "blobs"}}
        ).to_pandas()[["conv_id", "channel", "chunk", "n", "blob"]],
        key,
    )
    b = _frame(scratch["blobs"], ["conv_id", "channel", "chunk", "n", "blob"], key)
    assert len(a) == len(b) and len(a) > 0
    assert all(bytes(x) == bytes(y) for x, y in zip(a["blob"], b["blob"]))


def test_increment_manifest_row(ingested):
    import json

    merged, _, tmp_path = ingested
    mf = tmp_path / "merged" / "manifest.jsonl"
    rows = [json.loads(l) for l in open(mf)]
    inc_rows = [r for r in rows if r["partition_id"].startswith("increment:")]
    assert len(inc_rows) == 1
    assert inc_rows[0]["affected_conversations"] > 0


def test_chained_increments_resolve(ray_session, tmp_path):
    """Two successive merge-on-read increments (no rewrite anywhere)
    must still equal the from-scratch rollup of the final history —
    including a conversation touched by BOTH increments."""
    import ray.data as rd

    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        read_increment_tier,
        run_rollup_events,
    )

    ev = pq.read_table(f"{SF}/events.parquet")
    ts = ev["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    c1, c2 = np.quantile(ts, 0.4), np.quantile(ts, 0.7)
    parts = {
        "b0": ev.filter(pa.array(ts <= c1)),
        "b01": ev.filter(pa.array(ts <= c2)),
        "full": ev,
        "i1": ev.filter(pa.array((ts > c1) & (ts <= c2))),
        "i2": ev.filter(pa.array(ts > c2)),
    }
    dirs = {}
    for k in ("b0", "b01", "full"):
        d = tmp_path / k
        os.makedirs(d)
        pq.write_table(parts[k], d / "events.parquet")
        dirs[k] = str(d)
    for k in ("i1", "i2"):
        pq.write_table(parts[k], tmp_path / f"{k}.parquet")

    cfg = RollupConfig()
    prior = run_rollup_events(dirs["b0"], str(tmp_path / "r0"), cfg)
    v1 = ingest_events_increment(
        dirs["b01"], str(tmp_path / "i1.parquet"), prior, str(tmp_path / "m1"), cfg
    )
    v2 = ingest_events_increment(
        dirs["full"], str(tmp_path / "i2.parquet"), v1, str(tmp_path / "m2"), cfg
    )
    scratch = run_rollup_events(dirs["full"], str(tmp_path / "scratch"), cfg)
    a = _sorted(
        read_increment_tier(v2, "tier_1m").to_pandas()[TIER_COLS], TIER_KEY
    )
    b = _frame(scratch["tier_1m"], TIER_COLS, TIER_KEY)
    _assert_tier_equal(a, b)


def test_unaffected_conversations_not_recomputed(ray_session, tmp_path):
    """An increment touching ONE conversation must recompute only that
    conversation: the recompute dir's stage0 holds rows for exactly the
    affected conv, and the merge-on-read view still serves everyone."""
    import ray.data as rd

    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        read_increment_tier,
        run_rollup_events,
    )

    ev = pq.read_table(f"{SF}/events.parquet")
    uid = ev["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    target = int(uid[0])
    m = (uid == target) & (np.arange(len(uid)) % 2 == 1)
    old = ev.filter(pa.array(~m))
    inc = ev.filter(pa.array(m))
    d_old, d_full = tmp_path / "old", tmp_path / "full"
    os.makedirs(d_old)
    os.makedirs(d_full)
    pq.write_table(old, d_old / "events.parquet")
    pq.write_table(ev, d_full / "events.parquet")
    pq.write_table(inc, tmp_path / "inc.parquet")

    cfg = RollupConfig()
    prior = run_rollup_events(str(d_old), str(tmp_path / "prior"), cfg)
    merged = ingest_events_increment(
        str(d_full), str(tmp_path / "inc.parquet"), prior,
        str(tmp_path / "merged"), cfg,
    )
    # recompute dir: only the affected conversation's rows
    rec_dir = str(tmp_path / "merged" / "recompute" / "stage0" / "kind=tier")
    rec = rd.read_parquet(rec_dir, columns=["conv_id"]).to_pandas()
    assert set(rec["conv_id"]) == {f"u{target}"}
    # merged view still contains every conversation
    allc = read_increment_tier(merged, "tier_1m").to_pandas()["conv_id"]
    assert f"u{target}" in set(allc) and len(set(allc)) > 1


def test_partitioned_store_read_pruning(ray_session, tmp_path):
    """With a key-partitioned event store, the incremental recompute
    opens ONLY the affected buckets' directories — and the result still
    equals the from-scratch rollup."""
    import ray.data as rd

    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        read_increment_tier,
        run_rollup_events,
    )

    cfg = RollupConfig()
    ev = pq.read_table(f"{SF}/events.parquet")
    uid = ev["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = ev["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    # increment: late rows of the users in ONE salt bucket
    target_bucket = int(uid[0]) % cfg.salt_buckets
    cut = np.quantile(ts, 0.5)
    m = (uid % cfg.salt_buckets == target_bucket) & (ts > cut)
    assert m.any()
    d_old, d_full = tmp_path / "old", tmp_path / "full"
    os.makedirs(d_old)
    os.makedirs(d_full)
    pq.write_table(ev.filter(pa.array(~m)), d_old / "events.parquet")
    pq.write_table(ev, d_full / "events.parquet")
    pq.write_table(ev.filter(pa.array(m)), tmp_path / "inc.parquet")
    # hive-partitioned store: part=<uid % salt_buckets>/
    store = tmp_path / "events_by_part"
    full_pd = ev.to_pandas()
    full_pd["part"] = (full_pd["user_id"].to_numpy(np.int64) % cfg.salt_buckets)
    for b, g in full_pd.groupby("part"):
        os.makedirs(store / f"part={b}")
        pq.write_table(
            pa.Table.from_pandas(g.drop(columns=["part"]), preserve_index=False),
            store / f"part={b}" / "data.parquet",
        )

    prior = run_rollup_events(str(d_old), str(tmp_path / "prior"), cfg)
    merged = ingest_events_increment(
        str(d_full), str(tmp_path / "inc.parquet"), prior,
        str(tmp_path / "merged"), cfg,
        partitioned_events_dir=str(store),
    )
    scratch = run_rollup_events(str(d_full), str(tmp_path / "scratch"), cfg)
    a = _sorted(
        read_increment_tier(merged, "tier_1m").to_pandas()[TIER_COLS], TIER_KEY
    )
    b = _frame(scratch["tier_1m"], TIER_COLS, TIER_KEY)
    _assert_tier_equal(a, b)


def test_empty_increment_is_identity(ray_session, tmp_path):
    """An empty increment (no new rows) must leave the view identical
    to the prior rollup and not crash the recompute."""
    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        read_increment_tier,
        run_rollup_events,
    )

    ev = pq.read_table(f"{SF}/events.parquet")
    d_full = tmp_path / "full"
    os.makedirs(d_full)
    pq.write_table(ev, d_full / "events.parquet")
    pq.write_table(ev.slice(0, 0), tmp_path / "empty.parquet")

    cfg = RollupConfig()
    prior = run_rollup_events(str(d_full), str(tmp_path / "prior"), cfg)
    merged = ingest_events_increment(
        str(d_full), str(tmp_path / "empty.parquet"), prior,
        str(tmp_path / "merged"), cfg,
    )
    a = _sorted(
        read_increment_tier(merged, "tier_1m").to_pandas()[TIER_COLS], TIER_KEY
    )
    b = _frame(prior["tier_1m"], TIER_COLS, TIER_KEY)
    _assert_tier_equal(a, b)
