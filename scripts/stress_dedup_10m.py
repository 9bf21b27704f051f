"""10M-doc dedup stress leg (VERDICT r3 item 9): synthesize a
deterministic 10M-document corpus as a DISTRIBUTED Dataset (never on
the driver), persist it to temp parquet, then run the two headline
dedup operators — MinHash-LSH near-dup clustering and the
substring-window passage screen — and report wall time, throughput,
driver RSS (ASSERTED flat, like stress_kernels_1e8.py) and the
bucket-cap chain-fallback count the skew discipline logs.

Corpus shape (seeded per block, no Date.now/randomness leaks):
  - ~200-char lowercase docs;
  - ids with id % 101 == 0 carry one of 16 shared 64-char passages
    (substring-window targets, ~1% of docs);
  - ids with id % 199 < 2 are near-identical template pairs
    (MinHash targets);
  - ids with id % 503 == 0 duplicate the text of id-1 exactly
    (exact-collapse mass).

Usage: python scripts/stress_dedup_10m.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import logging
import os
import resource
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
RSS_LIMIT_GB = 8.0
DOC_LEN = 200
ALPHA = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _passages() -> list[str]:
    rng = np.random.default_rng(77)
    return [
        "".join(chr(c) for c in ALPHA[rng.integers(0, len(ALPHA), 64)])
        for _ in range(16)
    ]


PASSAGES = _passages()


def synth_block(b: pd.DataFrame) -> pd.DataFrame:
    ids = b["id"].to_numpy(np.int64)
    rng = np.random.default_rng(int(ids[0]) + 1)
    mat = ALPHA[rng.integers(0, len(ALPHA), size=(len(ids), DOC_LEN))]
    texts = [bytes(row).decode() for row in mat]
    out = []
    for i, did in enumerate(ids):
        t = texts[i]
        if did % 199 < 2:  # near-dup template pair (MinHash target)
            base = PASSAGES[did % 16] * 3
            t = base[:180] + t[:20] + ("x" if did % 199 == 1 else "y")
        elif did % 101 == 0:  # shared passage inside unique text
            t = t[:60] + PASSAGES[did % 16] + t[60 + 64 :]
        if did % 503 == 0 and i > 0:  # exact duplicate of the previous doc
            t = out[-1]
        out.append(t)
    return pd.DataFrame({"doc_id": ids, "text": out})


class _CapCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.n = 0

    def emit(self, record):
        if "emitting chain" in record.getMessage():
            self.n += 1


def main() -> int:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ctas_ray.sources import read_parquet_clean
    from ctas_ray.stages.dedup import (
        minhash_lsh_dedup,
        substring_duplicate_windows,
    )

    cap = _CapCounter()
    logging.getLogger("ctas_ray.stages.dedup").addHandler(cap)

    tmp = tempfile.mkdtemp(prefix="dedup10m_")
    try:
        t0 = time.perf_counter()
        rd.range(N_DOCS, override_num_blocks=max(64, NUM_CPUS * 4)).map_batches(
            synth_block, batch_format="pandas"
        ).write_parquet(tmp)
        t_gen = time.perf_counter() - t0
        print(f"corpus: {N_DOCS} docs in {t_gen:.1f}s  rss={rss_gb():.2f}GB",
              flush=True)

        results = {}

        docs = read_parquet_clean(tmp, columns=["doc_id", "text"])
        t0 = time.perf_counter()
        sub = substring_duplicate_windows(docs)
        wall = time.perf_counter() - t0
        results["substring_windows"] = {
            "wall_s": round(wall, 1),
            "docs_per_s": round(N_DOCS / wall),
            "flagged": int(len(sub)),
            "rss_gb": round(rss_gb(), 2),
        }
        print("substring_windows", results["substring_windows"], flush=True)
        assert len(sub) > 0, "planted passages not found"
        assert rss_gb() < RSS_LIMIT_GB, f"driver RSS {rss_gb():.2f} GB"

        docs = read_parquet_clean(tmp, columns=["doc_id", "text"])
        t0 = time.perf_counter()
        clusters = minhash_lsh_dedup(docs)
        wall = time.perf_counter() - t0
        results["minhash_lsh"] = {
            "wall_s": round(wall, 1),
            "docs_per_s": round(N_DOCS / wall),
            "clustered_docs": int(len(clusters)),
            "n_clusters": int(clusters["cluster_id"].nunique())
            if len(clusters) else 0,
            "bucket_cap_fallbacks": cap.n,
            "rss_gb": round(rss_gb(), 2),
        }
        print("minhash_lsh", results["minhash_lsh"], flush=True)
        assert len(clusters) > 0, "planted near-dups not found"
        assert rss_gb() < RSS_LIMIT_GB, f"driver RSS {rss_gb():.2f} GB"

        print("RSS verdict: PASS" if rss_gb() < RSS_LIMIT_GB else "FAIL",
              f"(peak {rss_gb():.2f} GB)")
        import json

        print(json.dumps({"n_docs": N_DOCS, "num_cpus": NUM_CPUS, **results}))
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
