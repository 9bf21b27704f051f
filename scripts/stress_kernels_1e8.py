"""10^8-row scale leg for the heaviest continuation kernels (VERDICT r2
item 9): amplify the sf0.1 events 1000x (100M rows, 1.5M series) as a
DISTRIBUTED Dataset, persist to a temp parquet events dir, then run the
five heaviest per-series / frequency-map operators and report wall time
+ driver RSS. The driver RSS must stay flat (< RSS_LIMIT_GB) — these
operators exchange frequency maps / per-series partials, never rows —
and that is ASSERTED, not just printed.

The amplifier is a generator UDF (yields one ~250k-row frame per
replica chunk) so no task ever holds the full 1000x batch; Ray's
dynamic block splitting keeps output blocks at target size.

Usage: python scripts/stress_kernels_1e8.py [amplify] [num_cpus]
"""

from __future__ import annotations

import os
import resource
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

AMPLIFY = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
RSS_LIMIT_GB = 8.0


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ctas_ray.pipelines import queries as q
    from ctas_ray.sources import read_parquet_clean

    base = read_parquet_clean(f"{SRC}/events.parquet")

    def amplify(b: pd.DataFrame):
        # generator UDF: one replica chunk per yield, never the full
        # AMPLIFY x batch in task memory
        for k in range(AMPLIFY):
            c = b.copy()
            c["user_id"] = c["user_id"] + k * 1_000_000
            c["event_id"] = c["event_id"] + k * 100_000_000
            yield c

    tmp = tempfile.mkdtemp(prefix="ctas_stress_1e8_")
    sf_dir = tempfile.mkdtemp(prefix="ctas_stress_1e8_dir_")
    t0 = time.perf_counter()
    base.map_batches(
        amplify, batch_format="pandas", batch_size=25_000
    ).write_parquet(tmp)
    os.symlink(tmp, f"{sf_dir}/events.parquet")
    n_rows = rd.read_parquet(tmp).count()
    print(
        f"amplified rows: {n_rows}  write wall: "
        f"{time.perf_counter() - t0:.1f}s  rss: {rss_gb():.2f} GB",
        flush=True,
    )

    failures = []
    # per-row-output contracts (midranks / SAX / CDC) are consumed as
    # DATASETS here (count()), the way a 100-TB caller would — their
    # sf0.01 contract entries still collect, but collecting 10^8 result
    # rows to one driver is the CALLER's mistake, not the operator's
    for name, fn in [
        ("global_midranks", lambda d: q.global_midrank_values(d, as_dataset=True)),
        ("sax_symbols", lambda d: q.sax_symbols(d, as_dataset=True)),
        ("concurrency_peak", q.session_concurrency_peak),
        ("cdc_latest_state", lambda d: q.cdc_latest_state(d, as_dataset=True)),
        ("winsorized_totals", q.winsorized_totals),
        # round-5 scan kernels (drawdown/cusum collect one row per user
        # — 1.5M rows here; a 100-TB caller would write them out)
        ("ohlc_bars_1h", q.ohlc_bars_1h),
        ("user_value_drawdown", q.user_value_drawdown),
        ("user_cusum_alarms", q.user_cusum_alarms),
        ("mannwhitney_by_type", q.mannwhitney_by_type),
    ]:
        t0 = time.perf_counter()
        out = fn(sf_dir)
        checksum = None
        if os.environ.get("CTAS_STRESS_HASH"):
            # order-insensitive u64 checksum of the FULL result (sum of
            # per-row hashes over name-sorted columns, reduced per block)
            # — run the leg at two CTAS_RAY_TARGET_PARTITION_BYTES
            # settings and compare: identical checksums prove the
            # kernels are partition-count invariant at 10^8 rows
            def _blk_hash(b: pd.DataFrame) -> pd.DataFrame:
                h = pd.util.hash_pandas_object(
                    b[sorted(b.columns)], index=False
                ).to_numpy().sum(dtype=np.uint64)
                return pd.DataFrame({"h": [h]})

            if isinstance(out, rd.Dataset):
                hs = out.map_batches(_blk_hash, batch_format="pandas").to_pandas()
                checksum = int(hs["h"].to_numpy(np.uint64).sum(dtype=np.uint64))
                n_out = -1
            else:
                checksum = int(_blk_hash(out)["h"].iloc[0])
                n_out = len(out)
        else:
            n_out = out.count() if isinstance(out, rd.Dataset) else len(out)
        wall = time.perf_counter() - t0
        r = rss_gb()
        line = (
            f"{name:24s} wall {wall:7.1f}s  out_rows {n_out:>9}  "
            f"driver_rss {r:.2f} GB"
        )
        if checksum is not None:
            line += f"  checksum {checksum:#018x}"
        if r > RSS_LIMIT_GB:
            failures.append(name)
            line += f"  ** RSS over {RSS_LIMIT_GB} GB limit **"
        print(line, flush=True)

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(sf_dir, ignore_errors=True)
    ray.shutdown()
    if failures:
        print(f"FAIL: driver RSS exceeded limit in: {failures}")
        return 1
    print(f"PASS: driver RSS flat (< {RSS_LIMIT_GB} GB) across all kernels")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
