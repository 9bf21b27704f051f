"""Orphan-data-file GC over the tier store (pipelines/rollup.py:
gc_orphan_files): planted stray parquet files are removed, every file
reachable from the current view survives, and BOTH the merge-on-read
current view and the time-travel snapshot still resolve bit-for-bit
after GC.
"""

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
TIER_KEY = ["conv_id", "channel", "bucket"]


def _split_events(tmp_path):
    ev = pq.read_table(f"{SF}/events.parquet")
    ts = ev["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
    cut = np.quantile(ts.astype(np.int64), 0.5)
    old = ev.filter(pa.array(ts.astype(np.int64) <= cut))
    new = ev.filter(pa.array(ts.astype(np.int64) > cut))
    d_old, d_full = tmp_path / "old", tmp_path / "full"
    os.makedirs(d_old)
    os.makedirs(d_full)
    pq.write_table(old, d_old / "events.parquet")
    pq.write_table(ev, d_full / "events.parquet")
    inc = tmp_path / "increment.parquet"
    pq.write_table(new, inc)
    return str(d_old), str(d_full), str(inc)


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines.rollup import (
        ingest_events_increment,
        read_increment_tier,
        run_rollup_events,
    )

    tmp_path = tmp_path_factory.mktemp("gc")
    d_old, d_full, inc = _split_events(tmp_path)
    cfg = RollupConfig()
    prior = run_rollup_events(d_old, str(tmp_path / "prior"), cfg)
    merged = ingest_events_increment(
        d_full, inc, prior, str(tmp_path / "merged"), cfg
    )
    before = (
        read_increment_tier(merged, "tier_1m")
        .to_pandas()
        .sort_values(TIER_KEY, kind="mergesort")
        .reset_index(drop=True)
    )
    return tmp_path, merged, before


def test_gc_removes_orphans_keeps_views(ray_session, store):
    from ctas_ray.pipelines.rollup import (
        gc_orphan_files,
        read_increment_tier,
        read_tier_asof,
    )

    tmp_path, merged, before = store
    roots = [str(tmp_path / "prior"), str(tmp_path / "merged")]

    # plant orphans: a stray export and an "aborted recompute" file
    stray1 = tmp_path / "merged" / "stray_export.parquet"
    stray2 = tmp_path / "merged" / "recompute" / "aborted_task.parquet"
    for p in (stray1, stray2):
        pd.DataFrame({"x": [1]}).to_parquet(p)

    listed = gc_orphan_files(merged, roots, dry_run=True)
    assert str(stray1.resolve()) in listed and str(stray2.resolve()) in listed
    assert os.path.exists(stray1)  # dry run deletes nothing

    deleted = gc_orphan_files(merged, roots)
    assert str(stray1.resolve()) in deleted
    assert not os.path.exists(stray1) and not os.path.exists(stray2)

    # every reachable file survived: current view resolves bit-for-bit
    after = (
        read_increment_tier(merged, "tier_1m")
        .to_pandas()
        .sort_values(TIER_KEY, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)

    # ... and so does the time-travel snapshot (back=1 = the prior store)
    snap = read_tier_asof(merged, "tier_1m", back=1).to_pandas()
    assert len(snap) > 0

    # idempotent: a second sweep finds nothing
    assert gc_orphan_files(merged, roots) == []


def test_gc_never_touches_metadata(ray_session, store):
    tmp_path, merged, _ = store
    assert os.path.exists(tmp_path / "merged" / "increment.json")
    assert os.path.exists(tmp_path / "merged" / "tombstones.parquet")


def test_forget_conversations_erases_from_view(ray_session, store):
    from ctas_ray.pipelines.rollup import (
        forget_conversations,
        read_increment_blobs,
        read_increment_tier,
        read_tier_asof,
    )

    tmp_path, merged, before = store
    victim = before["conv_id"].iloc[0]
    erased = forget_conversations(merged, [victim], str(tmp_path / "erase"))

    view = read_increment_tier(erased, "tier_1m").to_pandas()
    assert victim not in set(view["conv_id"])
    # every OTHER conversation's rows are untouched
    keep = before[before["conv_id"] != victim].reset_index(drop=True)
    got = view.sort_values(
        ["conv_id", "channel", "bucket"], kind="mergesort"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(keep, got)

    blobs = read_increment_blobs(erased).to_pandas()
    assert victim not in set(blobs["conv_id"])

    # documented retention caveat: the pre-erase snapshot still has it
    snap = read_tier_asof(erased, "tier_1m", back=1).to_pandas()
    assert victim in set(snap["conv_id"])
