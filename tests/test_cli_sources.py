"""CLI entry points + alternative transcript sources (JSON/CSV)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest

from ctas_ray.fixtures import generate_transcripts


@pytest.fixture(scope="module")
def tx_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("txsrc")
    tx = generate_transcripts(n_conv=40, seed=13)
    path = str(d / "tx.parquet")
    pq.write_table(tx, path)
    return path


class TestCLI:
    def test_rollup_and_retain(self, tx_parquet, tmp_path):
        out_dir = str(tmp_path / "cli_rollup")
        res = subprocess.run(
            [sys.executable, "-m", "ctas_ray", "rollup", "--input", tx_parquet,
             "--out", out_dir, "--verify-roundtrip", "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        paths = json.loads(res.stdout.strip().splitlines()[-1])
        # tier paths are LISTS of dirs (stage0 inline + merge output)
        assert all(os.path.isdir(p) for p in paths["tier_1m"])
        assert os.path.isdir(paths["blobs"])
        res2 = subprocess.run(
            [sys.executable, "-m", "ctas_ray", "retain", "--out", out_dir,
             "--tier", "tier_1m:1", "--now-us", "9999999999999999"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert res2.returncode == 0, res2.stderr[-2000:]
        deleted = json.loads(res2.stdout.strip().splitlines()[-1])
        assert deleted["tier_1m"] >= 1  # everything is ancient vs that now

    def test_screen(self, tx_parquet, tmp_path):
        out_dir = str(tmp_path / "cli_screen")
        res = subprocess.run(
            [sys.executable, "-m", "ctas_ray", "screen", "--input", tx_parquet,
             "--out", out_dir, "--features", "average;sd", "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        written = json.loads(res.stdout.strip().splitlines()[-1])
        assert written["timeseries"]["rows"] > 0
        assert os.path.exists(written["site_scores"]["path"])


class TestAltSources:
    def test_json_source_matches_parquet(self, tx_parquet, tmp_path, ray_session):
        import pandas as pd

        from ctas_ray.sources.transcripts import read_transcripts, read_transcripts_json

        df = pq.read_table(tx_parquet).to_pandas()
        jpath = str(tmp_path / "tx.jsonl")
        out = df.copy()
        out["ts"] = out["ts"].astype("int64")  # epoch us in JSON
        out.to_json(jpath, orient="records", lines=True)

        # JSON loses the timestamp type; epoch-us ints coerce back
        a = read_transcripts(tx_parquet).to_pandas()
        b = read_transcripts_json(jpath).to_pandas()
        a = a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert (a["text"].to_numpy() == b["text"].to_numpy()).all()
        np.testing.assert_array_equal(
            a["ts"].astype("int64").to_numpy(), b["ts"].astype("int64").to_numpy()
        )

    def test_csv_source(self, tx_parquet, tmp_path, ray_session):
        from ctas_ray.sources.transcripts import read_transcripts_csv

        df = pq.read_table(tx_parquet).to_pandas()
        cpath = str(tmp_path / "tx.csv")
        df.to_csv(cpath, index=False)
        b = read_transcripts_csv(cpath).to_pandas()
        assert len(b) == len(df)
        assert set(b.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


class TestCLIIngest:
    def test_ingest_subcommand(self, tmp_path):
        """rollup over the early half of events, then `ingest` the late
        half: the merge-on-read view must cover the full history."""
        import pandas as pd
        import pyarrow as pa

        SF = "/root/testdata/sf0.001"
        ev = pq.read_table(f"{SF}/events.parquet")
        ts = ev["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        cut = np.quantile(ts, 0.5)
        d_old, d_full = tmp_path / "old", tmp_path / "full"
        os.makedirs(d_old)
        os.makedirs(d_full)
        pq.write_table(ev.filter(pa.array(ts <= cut)), d_old / "events.parquet")
        pq.write_table(ev, d_full / "events.parquet")
        pq.write_table(ev.filter(pa.array(ts > cut)), tmp_path / "inc.parquet")

        # prior rollup via the python API in a subprocess-compatible way:
        # use the rollup CLI on transcripts is the wrong source here, so
        # drive run_rollup_events through a -c one-liner (own Ray session)
        prior_dir = str(tmp_path / "prior")
        code = (
            "import ray, sys; sys.path.insert(0, '/root/repo');"
            "ray.init(address='local', num_cpus=4, include_dashboard=False,"
            " logging_level='ERROR');"
            "from ctas_ray.pipelines.rollup import run_rollup_events;"
            "from ctas_ray.config import RollupConfig;"
            f"run_rollup_events('{d_old}', '{prior_dir}', RollupConfig());"
            "ray.shutdown()"
        )
        res0 = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert res0.returncode == 0, res0.stderr[-2000:]

        out_dir = str(tmp_path / "merged")
        res = subprocess.run(
            [sys.executable, "-m", "ctas_ray", "ingest",
             "--full-events", str(d_full), "--increment", str(tmp_path / "inc.parquet"),
             "--prior", prior_dir, "--out", out_dir, "--num-cpus", "4"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert os.path.isfile(os.path.join(out_dir, "increment.json"))
        assert os.path.isfile(os.path.join(out_dir, "tombstones.parquet"))
        view = json.load(open(os.path.join(out_dir, "increment.json")))
        assert set(view) == {"prior", "delta", "tombstones"}
