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

from ..schemas import validate_transcripts_schema

__all__ = ["read_transcripts", "transcripts_from_events", "EVENT_ROLES"]

EVENT_ROLES = ("user", "assistant", "tool")


def read_transcripts(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the canonical transcript Parquet; prune columns at the read."""
    ds = rd.read_parquet(path, columns=columns)
    validate_transcripts_schema(pa.schema(ds.schema().base_schema))
    return ds


def _events_group_to_turns(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["ts", "event_id"], kind="mergesort")
    n = len(g)
    roles = np.array(EVENT_ROLES, dtype=object)
    return pd.DataFrame(
        {
            "conv_id": "u" + g["user_id"].astype(str),
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": roles[np.arange(n) % 3],
            "text": g["props"].astype(str),
            "tool": np.where(np.arange(n) % 3 == 2, g["event_type"].astype(str), ""),
            "ts": g["ts"],
        }
    )


def transcripts_from_events(sf_dir: str) -> rd.Dataset:
    """events.parquet -> transcript Dataset (one conversation per user,
    turn order = (ts, event_id)). The groupby is the ingest shuffle; at
    scale it is keyed the same as shuffle #1 (conv == user), so the
    engine's salted repartition folds into it."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return ds.groupby("user_id").map_groups(_events_group_to_turns, batch_format="pandas")
