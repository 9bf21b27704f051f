"""[graft] The rollup + downsample + retention pipeline over transcripts.

Dataset-level composition of the stage bodies in
:mod:`ctas_ray.stages.rollup`:

  transcripts -> extract_channels -> groupby(conv_id, chunk)       # shuffle 1
              -> ConvChunkRollup (tier-1m partials + Gorilla blobs)
              -> tier 1m merge   (chunk-boundary re-merge)          # shuffle 2
              -> tier 1h merge   (from 1m partials)                 # small
              -> tier 1d merge   (from 1h partials)                 # smaller
              -> write_parquet per tier + manifest entries

Skew: giant conversations are sub-split by ``chunk = turn_idx // C``
inside the group KEY itself — the salted-hash handling mandated by
BASELINE.json north_rule. Chunk results re-merge exactly because every
per-bucket aggregate is an associative partial (stages/rollup.py).

Resume: each tier write appends a manifest entry; ``run_rollup`` with
the same ``out_dir`` skips tiers whose entry exists and whose input
fingerprint matches (resume-by-skip, S2).
"""

from __future__ import annotations

import functools
import hashlib
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..config import RollupConfig
from ..state.manifest import ManifestWriter, load_completed, manifest_entry
from ..stages.rollup import (
    TIER_PARTIAL_COLUMNS,
    conv_chunk_rollup,
    extract_channels,
    merge_tier_partials,
    tier_select,
    with_derived_stats,
)

__all__ = ["rollup_datasets", "run_rollup", "read_tier"]

_TIER_NAMES = {60: "1m", 3600: "1h", 86400: "1d"}


def tier_name(width_s: int) -> str:
    return _TIER_NAMES.get(width_s, f"{width_s}s")


def rollup_datasets(
    transcripts: rd.Dataset,
    cfg: RollupConfig = RollupConfig(),
    verify_roundtrip: bool = False,
) -> dict[str, rd.Dataset]:
    """Build the lazy Dataset graph for all tiers + the codec blob table.

    Returns {"tier_1m": ds, "tier_1h": ds, "tier_1d": ds, "blobs": ds}.
    Nothing is executed until a consumer runs (streaming executor).
    """
    chan = transcripts.map_batches(
        functools.partial(extract_channels, chunk_turns=cfg.max_turns_per_chunk),
        batch_format="pyarrow",
    )
    tier1 = cfg.tiers_s[0]
    grouped = chan.groupby(["conv_id", "chunk"]).map_groups(
        functools.partial(
            conv_chunk_rollup,
            tier1_s=tier1,
            with_codec=True,
            verify_roundtrip=verify_roundtrip,
        ),
        batch_format="pandas",
    )
    blobs = grouped.map_batches(
        functools.partial(tier_select, kind="blob"), batch_format="pyarrow"
    )
    partials = grouped.map_batches(
        functools.partial(tier_select, kind="t1"), batch_format="pyarrow"
    )
    out: dict[str, rd.Dataset] = {"blobs": blobs}
    prev = partials
    for width in cfg.tiers_s:
        merged = prev.groupby(["conv_id", "channel"]).map_groups(
            functools.partial(merge_tier_partials, width_s=width),
            batch_format="pandas",
        )
        out[f"tier_{tier_name(width)}"] = merged
        prev = merged
    return out


def _fingerprint(transcripts_path: str | None, cfg: RollupConfig) -> str:
    h = hashlib.sha256(repr((transcripts_path, cfg)).encode()).hexdigest()[:16]
    return h


def run_rollup(
    transcripts: rd.Dataset,
    out_dir: str,
    cfg: RollupConfig = RollupConfig(),
    transcripts_path: str | None = None,
    verify_roundtrip: bool = False,
) -> dict[str, str]:
    """Execute and persist all tiers + blobs under ``out_dir``/<tier>/,
    with per-partition manifest entries (lineage + throughput). A rerun
    with the same out_dir resumes: tiers already recorded in
    ``out_dir/manifest.jsonl`` (matching fingerprint) are skipped.

    The tier CASCADE is honored on resume too: if tier_1m exists on disk
    but 1h/1d don't, the 1h tier is rebuilt FROM the persisted 1m
    parquet (never from raw) — A10's "higher tiers from lower partials".
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.jsonl")
    done = load_completed(manifest_path)
    fp = _fingerprint(transcripts_path, cfg)
    writer = ManifestWriter.remote(manifest_path)

    paths: dict[str, str] = {}
    tiers = [f"tier_{tier_name(w)}" for w in cfg.tiers_s]

    # figure out the first tier that needs computing
    todo = [t for t in tiers if f"{t}:{fp}" not in done]
    blobs_done = f"blobs:{fp}" in done

    datasets: dict[str, rd.Dataset] | None = None
    if (todo and todo[0] == tiers[0]) or not blobs_done:
        datasets = rollup_datasets(transcripts, cfg, verify_roundtrip)

    def _write(name: str, ds: rd.Dataset) -> None:
        t0 = time.perf_counter()
        path = os.path.join(out_dir, name)
        ds.write_parquet(path)
        wall = time.perf_counter() - t0
        persisted = rd.read_parquet(path)
        n = persisted.count()
        nbytes = sum(
            os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
        )
        writer.append.remote(
            manifest_entry(
                partition_id=f"{name}:{fp}",
                rows_in=n,
                rows_out=n,
                nbytes=nbytes,
                wall_s=wall,
                fingerprint=fp,
                extra={"path": path},
            )
        )
        paths[name] = path

    if not blobs_done and datasets is not None:
        _write("blobs", datasets["blobs"])
    else:
        paths["blobs"] = os.path.join(out_dir, "blobs")

    prev_path: str | None = None
    for i, (width, name) in enumerate(zip(cfg.tiers_s, tiers)):
        if f"{name}:{fp}" in done:
            paths[name] = os.path.join(out_dir, name)
            prev_path = paths[name]
            continue
        if datasets is not None and i == 0:
            _write(name, datasets[name])
        else:
            # cascade from the persisted lower tier (resume path)
            lower = rd.read_parquet(prev_path)
            merged = lower.groupby(["conv_id", "channel"]).map_groups(
                functools.partial(merge_tier_partials, width_s=width),
                batch_format="pandas",
            )
            _write(name, merged)
        prev_path = paths[name]
    ray.get(writer.flush.remote())
    return paths


def read_tier(out_dir: str, tier: str, derived: bool = True) -> rd.Dataset:
    """Read a persisted tier; optionally append derived mean/sd columns
    (exactness: derived at read from the partials, A10)."""
    ds = rd.read_parquet(os.path.join(out_dir, tier))
    if derived:
        ds = ds.map_batches(with_derived_stats, batch_format="pyarrow")
    return ds
