"""Scale-stress for the round-2 continuation kernels: amplify the
sf0.1 events ~30x (3M rows, 45k series) as a DISTRIBUTED Dataset (the
driver never holds the amplified data), write it to a temp parquet
events dir, then run each new per-series / frequency-map operator and
report wall time + driver RSS. Linear wall time and flat RSS are the
pass criteria (printed, judged by the reader).

Usage: python scripts/stress_new_kernels.py [amplify] [num_cpus]
"""

from __future__ import annotations

import os
import resource
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

AMPLIFY = int(sys.argv[1]) if len(sys.argv) > 1 else 30
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ctas_ray.pipelines import queries as q
    from ctas_ray.sources import read_parquet_clean

    base = read_parquet_clean(f"{SRC}/events.parquet")

    def amplify(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k in range(AMPLIFY):
            c = b.copy()
            c["user_id"] = c["user_id"] + k * 1_000_000
            c["event_id"] = c["event_id"] + k * 100_000_000
            out.append(c)
        return pd.concat(out, ignore_index=True)

    tmp = tempfile.mkdtemp(prefix="ctas_stress_events_")
    os.makedirs(f"{tmp}_dir", exist_ok=True)
    base.map_batches(amplify, batch_format="pandas").write_parquet(tmp)
    # queries read {sf_dir}/events.parquet: point a dir at the amplified set
    sf_dir = f"{tmp}_dir"
    os.symlink(tmp, f"{sf_dir}/events.parquet")

    n_rows = rd.read_parquet(tmp).count()
    print(f"amplified rows: {n_rows}  rss before: {rss_gb():.2f} GB")

    for name, fn in [
        ("series_shape_stats", q.series_shape_stats),
        ("slope_extrema", q.slope_extrema),
        ("sampling_gap_profile", q.sampling_gap_profile),
        ("daily_value_bands", q.daily_value_bands),
        ("global_midrank_values", q.global_midrank_values),
        ("cdc_latest_state", q.cdc_latest_state),
        ("session_concurrency_peak", q.session_concurrency_peak),
        ("sax_symbols", q.sax_symbols),
        # round-5 scan kernels
        ("ohlc_bars_1h", q.ohlc_bars_1h),
        ("user_value_drawdown", q.user_value_drawdown),
        ("user_cusum_alarms", q.user_cusum_alarms),
        ("mannwhitney_by_type", q.mannwhitney_by_type),
    ]:
        t0 = time.perf_counter()
        out = fn(sf_dir)
        wall = time.perf_counter() - t0
        print(
            f"{name:>24}: {wall:6.2f}s  rows_out={len(out):>9}  "
            f"rss={rss_gb():.2f} GB"
        )

    ray.shutdown()


if __name__ == "__main__":
    main()
