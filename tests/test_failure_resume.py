"""Failure-injection idempotence (VERDICT r4 item 4): kill worker
PROCESSES mid-rollup (os._exit inside a task — a real SIGKILL-grade
death, not a Python exception) and assert Ray's task retry plus the
manifest/idempotent tier writes produce tier and blob contents
identical to an uninterrupted run."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from ctas_ray.config import RollupConfig
from ctas_ray.fixtures import generate_transcripts


@pytest.fixture(scope="module")
def transcripts():
    return generate_transcripts(n_conv=80, seed=17)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form incl. binary columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
            )
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run(transcripts, out_dir: str, kill_tokens_dir: str | None, n_kills: int):
    """run_rollup with an identity pre-stage that kills its own worker
    process for the first ``n_kills`` tasks to claim a token (atomic
    rename = exactly-once per token even under concurrent tasks)."""
    import ray.data as rd
    from ctas_ray.pipelines.rollup import run_rollup

    ds = rd.from_arrow(transcripts)
    if kill_tokens_dir is not None:
        os.makedirs(kill_tokens_dir, exist_ok=True)
        for i in range(n_kills):
            with open(os.path.join(kill_tokens_dir, f"token{i}"), "w") as fh:
                fh.write("1")

        def maybe_die(b: pd.DataFrame) -> pd.DataFrame:
            for name in sorted(os.listdir(kill_tokens_dir)):
                if not name.startswith("token") or name.endswith(".used"):
                    continue
                src = os.path.join(kill_tokens_dir, name)
                try:
                    os.rename(src, src + ".used")
                except OSError:
                    continue  # another task claimed it
                os._exit(1)  # hard worker death — Ray must retry the task
            return b

        ds = ds.map_batches(maybe_die, batch_format="pandas", batch_size=200)
    return run_rollup(ds, out_dir, RollupConfig())


def _read_dir(path) -> pd.DataFrame:
    """path: a dir or list of dirs (run_rollup returns lists for tiers
    split across the inline-cascade and merge layouts)."""
    import pyarrow.parquet as pq

    roots = path if isinstance(path, (list, tuple)) else [path]
    files = sorted(
        os.path.join(root, f)
        for r in roots
        for root, _, fs in os.walk(r)
        for f in fs
        if f.endswith(".parquet")
    )
    assert files, f"no parquet under {path}"
    return pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )


def test_killed_workers_produce_identical_tiers(
    transcripts, ray_session, tmp_path
):
    clean_dir = str(tmp_path / "clean")
    kill_dir = str(tmp_path / "killed")
    tokens = str(tmp_path / "tokens")

    paths_clean = _run(transcripts, clean_dir, None, 0)
    paths_kill = _run(transcripts, kill_dir, tokens, n_kills=2)

    # the injection actually fired: every token was claimed
    used = [n for n in os.listdir(tokens) if n.endswith(".used")]
    assert len(used) == 2, "worker kills did not trigger"

    # both runs completed the same stages
    assert set(paths_clean) == set(paths_kill)

    # tier + blob CONTENT byte-identical (order-insensitive; blob bytes
    # compared via hex, so the Gorilla payloads must match exactly)
    for name in ("tier_1m", "tier_1h", "tier_1d", "blobs"):
        a = _canon(_read_dir(paths_clean[name]))
        b = _canon(_read_dir(paths_kill[name]))
        pd.testing.assert_frame_equal(a, b)

    # manifest of the killed run is complete and fingerprinted like the
    # clean one (same stage set; retries add no duplicate stage rows)
    def stages(d):
        entries = [
            json.loads(l) for l in open(os.path.join(d, "manifest.jsonl"))
        ]
        return sorted(
            e["partition_id"] for e in entries
            if not e["partition_id"].startswith("part")
        )

    assert stages(clean_dir) == stages(kill_dir)


def test_killed_run_resumes_as_noop(transcripts, ray_session, tmp_path):
    """After the failure-injected run completes, a plain rerun on the
    same out_dir is a pure resume: no new manifest entries, same paths."""
    kill_dir = str(tmp_path / "killed2")
    tokens = str(tmp_path / "tokens2")
    paths1 = _run(transcripts, kill_dir, tokens, n_kills=1)
    m1 = sum(1 for _ in open(os.path.join(kill_dir, "manifest.jsonl")))

    import ray.data as rd
    from ctas_ray.pipelines.rollup import run_rollup

    paths2 = run_rollup(
        rd.from_arrow(transcripts), kill_dir, RollupConfig()
    )
    m2 = sum(1 for _ in open(os.path.join(kill_dir, "manifest.jsonl")))
    assert set(paths1) == set(paths2)
    assert m1 == m2
