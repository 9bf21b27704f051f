"""partition_rollup (vectorized, production) vs conv_chunk_rollup
(straightforward per-group reference implementation) — identical rows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ctas_ray.fixtures import generate_transcripts
from ctas_ray.stages.rollup import (
    conv_chunk_rollup,
    extract_channels,
    partition_rollup,
)


@pytest.fixture(scope="module")
def channel_df():
    tx = generate_transcripts(n_conv=50, seed=21)
    tbl = extract_channels(tx, chunk_turns=30, salt_buckets=8)
    return tbl.to_pandas()


def _norm(df, kind):
    sub = df[df["kind"] == kind].copy()
    if kind == "t1":
        cols = ["conv_id", "channel", "bucket", "count", "sum", "min", "max",
                "sumsq", "first_ts", "first_val", "last_ts", "last_val"]
        return sub[cols].sort_values(
            ["conv_id", "channel", "bucket"], kind="mergesort"
        ).reset_index(drop=True)
    cols = ["conv_id", "channel", "chunk", "n", "first_ts", "last_ts"]
    out = sub[cols + ["blob"]].sort_values(
        ["conv_id", "channel", "chunk"], kind="mergesort"
    ).reset_index(drop=True)
    return out


def test_partition_rollup_equals_per_group_reference(channel_df):
    prod = partition_rollup(
        channel_df, tier1_s=60, with_codec=True, verify_roundtrip=False,
        inline_tiers_s=None, emit_partition_manifest=False,
    )
    ref_frames = []
    for (_, _), grp in channel_df.groupby(["conv_id", "chunk"], sort=False):
        ref_frames.append(
            conv_chunk_rollup(grp, tier1_s=60, with_codec=True, verify_roundtrip=False)
        )
    ref = pd.concat(ref_frames, ignore_index=True)

    a, b = _norm(prod, "t1"), _norm(ref, "t1")
    assert len(a) == len(b)
    for col in a.columns:
        np.testing.assert_array_equal(
            a[col].to_numpy(), b[col].to_numpy(), err_msg=col
        )
    ba, bb = _norm(prod, "blob"), _norm(ref, "blob")
    assert len(ba) == len(bb)
    for col in ("conv_id", "channel", "chunk", "n", "first_ts", "last_ts"):
        np.testing.assert_array_equal(ba[col].to_numpy(), bb[col].to_numpy(), err_msg=col)
    # identical bitstreams
    assert all(x == y for x, y in zip(ba["blob"], bb["blob"]))
