"""Per-turn text round-trip invariant (M10) + retention enforcement."""

from __future__ import annotations

import os

import numpy as np
import pytest

from ctas_ray.config import RollupConfig
from ctas_ray.fixtures import generate_transcripts
from ctas_ray.functions.codec import decode_text_block, encode_text_block


class TestTextBlockCodec:
    def test_roundtrip_unicode_and_empty(self):
        texts = ["hello", "", "héllo wörld", "emoji \U0001f600", "\x00null byte",
                 "tab\tnewline\n", "a" * 10_000]
        assert decode_text_block(encode_text_block(texts)) == texts

    def test_empty_list(self):
        assert decode_text_block(encode_text_block([])) == []

    def test_compresses(self):
        texts = ["the same sentence repeated many times"] * 500
        blob = encode_text_block(texts)
        raw = sum(len(t.encode()) for t in texts)
        assert len(blob) < raw / 10


class TestPipelineTextInvariant:
    def test_archive_text_byte_equal(self, ray_session, tmp_path):
        """The archived text blocks must reproduce every turn's text
        byte-equal under stable (conv_id, turn_idx) order — the per-row
        invariant from BASELINE.json input_hint."""
        import ray.data as rd
        from ctas_ray.pipelines.rollup import run_rollup

        tx = generate_transcripts(n_conv=60, seed=11)
        cfg = RollupConfig(archive_text=True, max_turns_per_chunk=40)
        paths = run_rollup(
            rd.from_arrow(tx), str(tmp_path / "out"), cfg, verify_roundtrip=True
        )
        assert "textblobs" in paths
        blobs = rd.read_parquet(paths["textblobs"]).to_pandas()
        assert bool(blobs["roundtrip_ok"].all())
        # decode all chunks in order and compare against the input
        df = tx.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
        blobs = blobs.sort_values(["conv_id", "chunk"], kind="mergesort")
        rebuilt: dict[str, list[str]] = {}
        for _, r in blobs.iterrows():
            rebuilt.setdefault(r["conv_id"], []).extend(decode_text_block(r["blob"]))
        for conv_id, grp in df.groupby("conv_id", sort=False):
            assert rebuilt[conv_id] == grp["text"].tolist(), conv_id

    def test_partition_manifest_rows(self, ray_session, tmp_path):
        import json

        import ray.data as rd
        from ctas_ray.pipelines.rollup import run_rollup

        tx = generate_transcripts(n_conv=40, seed=3)
        run_rollup(rd.from_arrow(tx), str(tmp_path / "o2"), RollupConfig())
        entries = [
            json.loads(l) for l in open(tmp_path / "o2" / "manifest.jsonl")
        ]
        parts = [e for e in entries if e["partition_id"].startswith("part")]
        assert parts and all("n_convs" in e for e in parts)
        # partitions collectively processed every turn exactly once
        assert sum(e["rows_in"] for e in parts) == tx.num_rows


class TestResumeWithoutInput:
    def test_tiers_rebuild_from_stage0_only(self, ray_session, tmp_path):
        """Kill-after-stage0 resume: rebuilding the tiers must need ONLY
        the persisted stage0 checkpoint — the raw input is never read
        (run_rollup is handed transcripts=None)."""
        import json

        import ray.data as rd
        from ctas_ray.pipelines.rollup import run_rollup

        tx = generate_transcripts(n_conv=40, seed=8)
        out = str(tmp_path / "res")
        cfg = RollupConfig()
        paths = run_rollup(rd.from_arrow(tx), out, cfg, transcripts_path="fp1")
        t1d_before = rd.read_parquet(paths["tier_1d"]).to_pandas()
        # simulate dying before the tiers step: drop its manifest entry + dir
        mpath = os.path.join(out, "manifest.jsonl")
        entries = [json.loads(l) for l in open(mpath)]
        keep = [e for e in entries if not e["partition_id"].startswith("tiers")]
        with open(mpath, "w") as fh:
            for e in keep:
                fh.write(json.dumps(e) + "\n")
        import shutil

        shutil.rmtree(os.path.join(out, "tiers"), ignore_errors=True)
        # resume WITHOUT the input dataset
        paths2 = run_rollup(None, out, cfg, transcripts_path="fp1")
        t1d_after = rd.read_parquet(paths2["tier_1d"]).to_pandas()
        key = ["conv_id", "channel", "bucket"]
        a = t1d_before.sort_values(key).reset_index(drop=True)
        b = t1d_after.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b)
        np.testing.assert_array_equal(a["sum"].to_numpy(), b["sum"].to_numpy())


class TestRetention:
    def test_old_buckets_dropped_per_policy(self, ray_session, tmp_path):
        import ray.data as rd
        from ctas_ray.pipelines.rollup import apply_retention, read_tier, run_rollup

        tx = generate_transcripts(n_conv=80, seed=5)
        out = str(tmp_path / "ret")
        run_rollup(rd.from_arrow(tx), out, RollupConfig())
        t1m = read_tier(out, "tier_1m", derived=False).to_pandas()
        lo, hi = t1m["bucket"].min(), t1m["bucket"].max()
        # cutoff in the middle of the data: 1m ages out, 1d kept forever
        now_us = int(hi)
        max_age_s = (hi - lo) / 2 / 1e6
        deleted = apply_retention(
            out, now_us, {"tier_1m": max_age_s, "tier_1h": None, "tier_1d": None}
        )
        assert deleted["tier_1m"] >= 0  # file-granular: may be 0 if one file
        survivors = read_tier(out, "tier_1m", derived=False).to_pandas()
        # never drops data newer than the cutoff
        cutoff = now_us - int(max_age_s * 1e6)
        assert survivors["bucket"].max() == hi
        kept_old = survivors[survivors["bucket"] < cutoff]
        # whatever was deleted was provably all-old; survivors superset of new
        new_rows = t1m[t1m["bucket"] >= cutoff]
        merged = survivors.merge(
            new_rows, on=["conv_id", "channel", "bucket"], how="right"
        )
        assert len(merged) == len(new_rows)

    def test_retention_logged_in_manifest(self, ray_session, tmp_path):
        import json

        import ray.data as rd
        from ctas_ray.pipelines.rollup import apply_retention, run_rollup

        tx = generate_transcripts(n_conv=30, seed=6)
        out = str(tmp_path / "ret2")
        run_rollup(rd.from_arrow(tx), out, RollupConfig())
        # force multi-file tier: rewrite tier_1m into several files
        import pyarrow.parquet as pq
        import pyarrow as pa

        from ctas_ray.pipelines.rollup import _tier_paths

        tdir = _tier_paths(out, "1m")[0]  # inline rows live under stage0
        files = [f for f in os.listdir(tdir) if f.endswith(".parquet")]
        tbl = pa.concat_tables([pq.read_table(os.path.join(tdir, f)) for f in files])
        for f in files:
            os.remove(os.path.join(tdir, f))
        df = tbl.to_pandas().sort_values("bucket")
        half = len(df) // 2
        pq.write_table(pa.Table.from_pandas(df.iloc[:half]), os.path.join(tdir, "old.parquet"))
        pq.write_table(pa.Table.from_pandas(df.iloc[half:]), os.path.join(tdir, "new.parquet"))
        old_max = df["bucket"].iloc[:half].max()
        cutoff_age = (df["bucket"].max() - old_max - 1) / 1e6
        deleted = apply_retention(
            out, int(df["bucket"].max()), {"tier_1m": cutoff_age}
        )
        assert deleted["tier_1m"] == 1
        assert not os.path.exists(os.path.join(tdir, "old.parquet"))
        assert os.path.exists(os.path.join(tdir, "new.parquet"))
        entries = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
        assert any(e["partition_id"].startswith("retention:tier_1m") for e in entries)
