"""Scale-stress evidence for the transcript screen (VERDICT r1 item 3's
"done =" criterion): run screen_transcripts over >= 10^6 conversations
and show the driver's RSS stays flat — i.e. no stage collects the
conversation ids or the measurement table to the driver.

Synthesizes 1,000,000 conversations x 6 turns = 6M turns directly as a
distributed Dataset (range -> flat_map batches; the generator itself
never materializes on the driver), then runs the full screen (vector
planning, KS scoring) and reports wall time and driver RSS before /
peak-after.

Usage: python scripts/stress_screen_1m_convs.py [n_convs] [num_cpus]
"""

from __future__ import annotations

import resource
import sys
import time

import numpy as np
import pandas as pd


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    turns_per_conv = 6

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from ctas_ray.config import StudyConfig
    from ctas_ray.pipelines.transcript_screen import screen_transcripts

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        cids = batch["id"].to_numpy(dtype=np.int64)
        k, n = turns_per_conv, len(cids)
        rng = np.random.default_rng(int(cids[0]) + 1)
        lat = rng.integers(1_000_000, 60_000_000, (n, k))
        ts = (
            np.int64(1_700_000_000_000_000)
            + cids[:, None] * np.int64(1_000_000)
            + np.cumsum(lat, axis=1)
        ).ravel()
        lens = rng.integers(5, 400, n * k)
        # varied-length texts without a per-row Python format loop
        blob = "x" * 400
        texts = pd.array([blob[:m] for m in lens], dtype="string")
        out = pd.DataFrame(
            {
                "conv_id": np.repeat(np.char.add("u", cids.astype(str)), k),
                "turn_idx": np.tile(np.arange(1, k + 1, dtype=np.int64), n),
                "role": np.tile(
                    np.where(np.arange(k) % 2 == 0, "user", "assistant"), n
                ),
                "text": texts.astype(object),
                "tool": None,
                "ts": ts.astype("datetime64[us]"),
            }
        )
        return out

    tx = rd.range(n_convs, override_num_blocks=max(64, ncpu * 4)).map_batches(
        gen, batch_format="pandas", batch_size=8192
    )

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    t0 = time.perf_counter()
    out = screen_transcripts(
        tx,
        cfg=StudyConfig(max_share_missing=0.8, features="average;sd;range"),
        site_mode="mod",
        n_sites=12,
        plan_mode="vector",
        features_as_dataset=True,
    )
    scores = out["site_scores"]
    n_scores = len(scores) if scores is not None else 0

    # production output contract (VERDICT r4 item 8): the per-subject
    # feature table scales with the corpus, so it leaves the job as a
    # DISTRIBUTED parquet write — never a driver collect. Row count
    # comes from parquet footers, not a plan execution.
    import os
    import tempfile

    import pyarrow.parquet as pq

    feat_dir = tempfile.mkdtemp(prefix="screen_features_")
    out["timeseries_features"].write_parquet(feat_dir)
    n_feat = sum(
        pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        for root, _, fs in os.walk(feat_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(
        {
            "n_convs": n_convs,
            "turns": n_convs * turns_per_conv,
            "num_cpus": ncpu,
            "wall_s": round(wall, 1),
            "turns_per_s": round(n_convs * turns_per_conv / wall),
            "site_score_rows": n_scores,
            "feature_rows_written": n_feat,
            "driver_rss_gb_before": round(rss0, 2),
            "driver_rss_gb_peak": round(rss1, 2),
        }
    )
    import shutil

    shutil.rmtree(feat_dir, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
