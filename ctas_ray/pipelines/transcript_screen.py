"""The flagship composition: the ctas anomaly screen OVER transcripts.

BASELINE.json north_star frames the engine as "reimplements ctas's
anomaly/outlier pipeline ... over Parquet transcript tables": this
module derives the reference's measurement model from a transcript
Dataset DISTRIBUTED (per-conversation channels -> measurement rows,
conversation-attribute table -> subjects) and runs the full study
screen on it.

Mapping (FIXTURES.md §A): conv_id -> subject_id, turn_idx+1 ->
timepoint_rank, channels text_len / turn_latency_s -> result under
derived parameter_ids, first-turn channel value -> baseline (enables
the change-from-baseline path), hashed site/country/region hierarchy.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

import ray.data as rd

from ..config import StudyConfig
from .study import process_a_study_ray

__all__ = ["transcript_measurements", "conversation_subjects",
           "conversation_subjects_ds", "screen_transcripts"]


def _conv_partition_to_measurements(g: pd.DataFrame) -> pd.DataFrame:
    """Whole salted partition of turns -> measurement rows for both
    derived channels (vectorized; latency needs the per-conv lag)."""
    g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    conv = g["conv_id"].to_numpy(dtype=object)
    newconv = np.r_[True, conv[1:] != conv[:-1]]
    ts = g["ts"].astype("int64").to_numpy()
    lat = np.diff(ts, prepend=ts[:1]).astype(np.float64) / 1e6
    lat[newconv] = np.nan
    tlen = g["text"].str.len().to_numpy(dtype=np.float64)
    rank = (g["turn_idx"].to_numpy(dtype=np.int64) + 1).astype(np.float64)
    tp1 = np.char.add("TURN ", rank.astype(np.int64).astype(str))
    frames = []
    for pid, series in (("text_len", tlen), ("turn_latency_s", lat)):
        # baseline := the conversation's first turn value for this channel
        first_val = series[newconv]
        seg_id = np.cumsum(newconv) - 1
        baseline = first_val[seg_id]
        frames.append(
            pd.DataFrame(
                {
                    "subject_id": conv,
                    "parameter_id": pid,
                    "timepoint_1_name": tp1,
                    "timepoint_2_name": "ND",
                    "timepoint_rank": rank,
                    "result": series,
                    "baseline": baseline,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def transcript_measurements(
    transcripts: rd.Dataset, salt_buckets: int = 64
) -> rd.Dataset:
    """Transcript Dataset -> ctas measurement Dataset (M9 channel
    extraction in the study data model), one salted exchange."""
    import zlib

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b[["conv_id", "turn_idx", "text", "ts"]].copy()
        b["part"] = [
            zlib.crc32(str(c).encode()) % salt_buckets for c in b["conv_id"]
        ]
        return b

    return (
        transcripts.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(
            lambda g: _conv_partition_to_measurements(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )


def conversation_subjects(
    conv_ids: list[str], n_sites: int = 12, site_mode: str = "crc32"
) -> pd.DataFrame:
    """Deterministic conversation-attribute table playing ``subjects``:
    3-level site/country/region hierarchy (FIXTURES.md §A).

    ``site_mode``: "crc32" hashes the conv id (default); "mod" takes the
    numeric tail of a "u<id>" conv id modulo n_sites — SQL-expressible,
    so the transcript screen can be hash-verified against DuckDB."""
    import zlib

    if site_mode == "mod":
        site_idx = np.array([int(str(c).lstrip("u")) % n_sites for c in conv_ids])
    else:
        site_idx = np.array([zlib.crc32(str(c).encode()) % n_sites for c in conv_ids])
    country_idx = site_idx % max(1, n_sites // 3)
    region_idx = country_idx % max(1, n_sites // 9)
    return pd.DataFrame(
        {
            "subject_id": conv_ids,
            "site": [f"site_{i}" for i in site_idx],
            "country": [f"country_{i}" for i in country_idx],
            "region": [f"region_{i}" for i in region_idx],
        }
    )


def conversation_subjects_ds(
    transcripts: rd.Dataset, n_sites: int = 12, site_mode: str = "crc32"
) -> rd.Dataset:
    """Distributed conversation-attribute table: per-batch local dedup
    of conv_ids -> hashed attributes, then a global one-row-per-subject
    groupby — the conversation ids never collect to the driver."""

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["conv_id"].drop_duplicates().tolist()
        out = conversation_subjects(ids, n_sites, site_mode)
        out["part"] = (
            pd.util.hash_array(out["subject_id"].to_numpy()) % np.uint64(64)
        ).astype(np.int64)
        return out

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized call per hash partition (never one Python call
        # per conversation id)
        return g.drop_duplicates(subset=["subject_id"]).drop(columns=["part"])

    return (
        transcripts.map_batches(per_batch, batch_format="pandas")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )


def _default_parameters() -> pd.DataFrame:
    pids = ["text_len", "turn_latency_s"]
    return pd.DataFrame(
        {
            "parameter_id": pids,
            "parameter_name": ["Turn text length", "Inter-turn latency (s)"],
            "parameter_category_1": "transcript",
            "parameter_category_2": None,
            "parameter_category_3": None,
            "time_point_count_min": np.nan,
            "subject_count_min": np.nan,
            "max_share_missing": np.nan,
            "generate_change_from_baseline": None,
            "timeseries_features_to_calculate": None,
            "use_only_custom_timeseries": None,
        }
    )


def screen_transcripts(
    transcripts: rd.Dataset,
    cfg: StudyConfig = StudyConfig(max_share_missing=0.8),
    n_sites: int = 12,
    parameters: pd.DataFrame | None = None,
    site_mode: str = "crc32",
    **study_kwargs,
) -> dict:
    """Transcripts in, the reference's four output frames out.

    Scale note: the conversation-attribute table is built DISTRIBUTED
    (conversation_subjects_ds) and handed to the study pipeline as a
    Dataset — decoration runs as a hash join, and the conversation ids
    never collect to the driver. The study pipeline itself falls back
    to one documented collect only when the feature set includes
    own_site_simil_score (per-series site map) or the max-sites
    optimisation is enabled; both are subject-count-bounded.

    PRODUCTION OUTPUT CONTRACT (VERDICT r4 item 8): pass
    ``features_as_dataset=True`` and consume ``timeseries_features`` /
    ``PCA_coordinates`` with ``.write_parquet(...)`` — those two frames
    scale with the corpus (rows ~ subjects x series x features), so at
    real scale they must leave the job as a distributed write, never a
    driver collect. ``site_scores`` / ``timeseries`` are
    O(sites x series) and stay pandas on every path. The pandas return
    (default) remains for the driver contract and small studies; the
    10M-conversation leg in BASELINE.md runs the dataset path
    end-to-end (scripts/stress_screen_1m_convs.py)."""
    measurements = transcript_measurements(transcripts)
    subjects = conversation_subjects_ds(transcripts, n_sites, site_mode)
    return process_a_study_ray(
        measurements,
        subjects,
        parameters if parameters is not None else _default_parameters(),
        cfg=cfg,
        **study_kwargs,
    )
