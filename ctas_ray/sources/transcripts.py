"""Transcript sources.

- ``read_transcripts``: the canonical Parquet source (input_hint schema),
  column-pruned at the read, schema-validated fail-fast (M8).
- ``transcripts_from_events``: deterministic derivation of a transcript
  table from the driver's ``events`` table (TESTDATA.md) so every
  pipeline is exercisable on the provided testdata without synthesising
  external inputs: conv_id = 'u<user_id>', turns ordered by
  (ts, event_id) within user, text = props. The same derivation is
  expressible in ANSI SQL (row_number window) for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from . import read_parquet_clean

from ..schemas import validate_transcripts_schema

__all__ = [
    "read_transcripts",
    "transcripts_from_events",
    "amplify_events",
    "EVENT_ROLES",
]

EVENT_ROLES = ("user", "assistant", "tool")


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the canonical transcript Parquet; prune columns at the read."""
    ds = read_parquet_clean(path, columns=columns)
    validate_transcripts_schema(pa.schema(ds.schema().base_schema))
    return ds


def _coerce_transcript_types(b: pd.DataFrame) -> pd.DataFrame:
    ts = b["ts"]
    if pd.api.types.is_integer_dtype(ts):
        ts = pd.to_datetime(ts, unit="us")  # integer timestamps = epoch us
    else:
        ts = pd.to_datetime(ts)
    out = pd.DataFrame(
        {
            "conv_id": b["conv_id"].astype(str),
            "turn_idx": b["turn_idx"].astype(np.int32),
            "role": b["role"].astype(str),
            "text": b["text"].astype(str),
            "tool": b["tool"].astype(str) if "tool" in b.columns else "",
            "ts": ts.astype("datetime64[us]"),
        }
    )
    return out


def read_transcripts_json(path: str) -> rd.Dataset:
    """Transcript source from JSON(L) files (same logical schema; types
    coerced — JSON has no timestamp type)."""
    return rd.read_json(path).map_batches(_coerce_transcript_types, batch_format="pandas")


def read_transcripts_csv(path: str) -> rd.Dataset:
    """Transcript source from CSV files (types coerced)."""
    return rd.read_csv(path).map_batches(_coerce_transcript_types, batch_format="pandas")


def _events_partition_to_turns(g: pd.DataFrame) -> pd.DataFrame:
    """Whole hash-partition (MANY users) -> turns in one vectorized pass
    (per-user UDF dispatch is the scale killer; see partition_rollup)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    turn_idx = g.groupby("user_id", sort=False).cumcount().to_numpy()
    roles = np.array(EVENT_ROLES, dtype=object)
    return pd.DataFrame(
        {
            "conv_id": "u" + g["user_id"].astype(str),
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles[turn_idx % 3],
            # null props -> '' (text_len 0), agreeing with
            # run_rollup_events (fillna(0) on lengths) and the oracle's
            # COALESCE(LENGTH(props), 0) — not the string 'None'
            "text": g["props"].fillna("").astype(str),
            "tool": np.where(turn_idx % 3 == 2, g["event_type"].astype(str), ""),
            "ts": g["ts"],
        }
    )


def transcripts_from_events(sf_dir: str, salt_buckets: int = 64) -> rd.Dataset:
    """events.parquet -> transcript Dataset (one conversation per user,
    turn order = (ts, event_id)). The exchange is keyed on
    hash(user_id) % salt_buckets — same partitioning family as the
    engine's shuffle #1 (conv == user), one vectorized UDF call per
    partition."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    # a single small parquet file reads as ONE block; split so the
    # downstream maps parallelise (no shuffle — block split only)
    ds = ds.repartition(salt_buckets)

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b["part"] = (b["user_id"].to_numpy() % np.int64(salt_buckets)).astype(np.int64)
        return b

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(_events_partition_to_turns, batch_format="pandas")
    )


def amplify_events(sf_dir: str, factor: int, salt_buckets: int = 64) -> rd.Dataset:
    """Deterministic input amplification for throughput/scaling runs:
    ``factor`` shifted replicas of the events table (user_id offset per
    replica => factor x as many conversations, same per-conversation
    shape). No external data — derived purely from the driver parquet."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    ).repartition(salt_buckets)
    max_user = 10_000_000

    def replicate(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k in range(factor):
            c = b.copy()
            c["user_id"] = c["user_id"] + k * max_user
            out.append(c)
        return pd.concat(out, ignore_index=True)

    ds = ds.map_batches(replicate, batch_format="pandas")

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b["part"] = (b["user_id"].to_numpy() % np.int64(salt_buckets)).astype(np.int64)
        return b

    return (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("part")
        .map_groups(_events_partition_to_turns, batch_format="pandas")
    )
