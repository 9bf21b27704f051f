"""5M-vector embedding-analytics stress leg: synthesize a 5,000,000 x
64-dim float32 embedding table as a DISTRIBUTED Dataset (seeded per
block, never on the driver), persist to temp parquet, then run the
vector-analytics family — brute-force top-k, k-means, PQ codes,
integer covariance, MMR, hard-negative mining — reporting wall time,
vectors/s and driver RSS (ASSERTED flat, like the other stress legs).

Usage: python scripts/stress_embeddings_5m.py [n_vecs] [num_cpus]
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

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
DIM = 64
RSS_LIMIT_GB = 8.0


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def synth_block(b):
    import pyarrow as pa

    ids = b.column("id").to_numpy()
    rng = np.random.default_rng(int(ids[0]) + 11)
    m = rng.standard_normal((len(ids), DIM)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), DIM)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": emb.cast(pa.list_(pa.float32())),
            "label": pa.array(ids % 10, pa.int64()),
        }
    )


def main() -> int:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ctas_ray.pipelines import queries as q

    sf_dir = tempfile.mkdtemp(prefix="ctas_stress_emb_dir_")
    tmp = tempfile.mkdtemp(prefix="ctas_stress_emb_")
    t0 = time.perf_counter()
    (
        rd.range(N_VECS)
        .map_batches(synth_block, batch_format="pyarrow", batch_size=50_000)
        .write_parquet(tmp)
    )
    os.symlink(tmp, f"{sf_dir}/embeddings.parquet")
    print(
        f"synthesized {N_VECS} x {DIM} vectors  write wall: "
        f"{time.perf_counter() - t0:.1f}s  rss: {rss_gb():.2f} GB",
        flush=True,
    )

    failures = []
    results = {}
    for name, fn in [
        ("topk_similarity", q.topk_similarity),
        ("kmeans_clusters", getattr(q, "kmeans_embedding_clusters", None)),
        ("pq_codes", q.pq_codebook_assignments),
        ("pq_adc_topk", q.pq_adc_topk),
        ("embedding_covariance", q.embedding_covariance_upper),
        ("mmr_diverse_topk", q.mmr_diverse_topk),
        ("hard_negative_mining", q.hard_negative_mining),
    ]:
        if fn is None:
            continue
        t0 = time.perf_counter()
        out = fn(sf_dir)
        n_out = len(out)
        wall = time.perf_counter() - t0
        r = rss_gb()
        line = (
            f"{name:22s} wall {wall:7.1f}s  {N_VECS / wall:>10.0f} vec/s"
            f"  out_rows {n_out:>9}  driver_rss {r:.2f} GB"
        )
        if r > RSS_LIMIT_GB:
            failures.append(name)
            line += f"  ** RSS over {RSS_LIMIT_GB} GB limit **"
        print(line, flush=True)
        results[name] = {"wall_s": round(wall, 1), "out_rows": n_out,
                         "rss_gb": round(r, 2)}

    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(sf_dir, ignore_errors=True)
    ray.shutdown()
    if failures:
        print(f"FAIL: driver RSS exceeded limit in: {failures}")
        return 1
    import json

    print(json.dumps({"n_vecs": N_VECS, "num_cpus": NUM_CPUS, "dim": DIM,
                      "results": results}))
    print(f"PASS: driver RSS flat (< {RSS_LIMIT_GB} GB) across all kernels")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
