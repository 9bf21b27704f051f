"""[graft] Checkpoint / lineage manifest (S2, SURVEY.md §2.3).

Every written partition emits a JSONL record with lineage + throughput
metrics; a resumed run skips partitions already recorded. The reference
has no equivalent (it re-runs whole studies daily — paper p.5); mandated
by BASELINE.json north_rule ("resumable from checkpoint with
per-partition lineage + metrics").

The writer is a detached-by-name Ray actor so any task in the job can
append; the manifest itself is plain JSONL on disk so resume works
across processes without Ray state.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import ray

__all__ = ["ManifestWriter", "load_completed", "manifest_entry"]


def manifest_entry(
    partition_id: str,
    rows_in: int,
    rows_out: int,
    nbytes: int,
    wall_s: float,
    fingerprint: str,
    extra: dict[str, Any] | None = None,
) -> dict[str, Any]:
    e = {
        "partition_id": partition_id,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "bytes": nbytes,
        "wall_s": round(wall_s, 6),
        "throughput_rows_s": round(rows_in / wall_s, 3) if wall_s > 0 else None,
        "fingerprint": fingerprint,
        "completed_at": time.time(),
    }
    if extra:
        e.update(extra)
    return e


@ray.remote(num_cpus=0)
class ManifestWriter:
    """Append-only JSONL manifest actor. One logical writer per job
    (num_cpus=0: it only does tiny IO, never holds a CPU slot)."""

    def __init__(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._path = path
        self._fh = open(path, "a", buffering=1)
        self._seen: set[str] = set()

    def append(self, entry: dict[str, Any]) -> None:
        if entry["partition_id"] in self._seen:
            return
        self._seen.add(entry["partition_id"])
        self._fh.write(json.dumps(entry) + "\n")

    def append_many(self, entries: list[dict[str, Any]]) -> None:
        """One actor call for a batch of entries (driver-serial actor
        round-trips matter at small per-core workloads)."""
        for e in entries:
            self.append(e)

    def flush(self) -> int:
        self._fh.flush()
        os.fsync(self._fh.fileno())
        return len(self._seen)

    def completed(self) -> list[str]:
        return sorted(self._seen)


def load_completed(path: str) -> set[str]:
    """Partition ids already completed per the on-disk manifest —
    resume-by-skip filters these before read_parquet."""
    done: set[str] = set()
    if not os.path.exists(path):
        return done
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            try:
                done.add(json.loads(line)["partition_id"])
            except (json.JSONDecodeError, KeyError):
                continue  # torn tail write from a killed run — ignorable
    return done
