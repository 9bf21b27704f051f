"""Second-axis scaling evidence (round 4): the MinHash-LSH dedup
pipeline at two parallelism levels — same synthesized corpus, fresh
ray.init per level in subprocesses, throughput at both plus the
efficiency. Complements bench.py --scaling (rollup) so the N->4N
criterion is evidenced on an all-to-all-heavy pipeline family too.

Usage: python scripts/scaling_dedup.py [n_docs] [lo_cpus] [hi_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 8
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, __REPO__)
import numpy as np
import pandas as pd
import ray
import ray.data as rd

ncpu = int(sys.argv[1]); docs_dir = sys.argv[2]
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ctas_ray.stages.dedup import minhash_lsh_dedup
from ctas_ray.sources import read_parquet_clean

docs = read_parquet_clean(docs_dir)
t0 = time.perf_counter()
out = minhash_lsh_dedup(docs)
n = len(out)
wall = time.perf_counter() - t0
print(f"RESULT {wall:.3f} {n}")
ray.shutdown()
"""

SYNTH = r"""
import os, sys
sys.path.insert(0, __REPO__)
import numpy as np
import pandas as pd
import ray
import ray.data as rd

n_docs = int(sys.argv[1]); out = sys.argv[2]
ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
ALPHA = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8)
rng0 = np.random.default_rng(77)
PASSAGES = ["".join(chr(c) for c in ALPHA[rng0.integers(0, len(ALPHA), 64)])
            for _ in range(16)]

def synth(b):
    ids = b["id"].to_numpy(np.int64)
    rng = np.random.default_rng(int(ids[0]) + 1)
    mat = ALPHA[rng.integers(0, len(ALPHA), size=(len(ids), 200))]
    texts = [bytes(row).decode() for row in mat]
    docs = []
    for i, did in enumerate(ids):
        t = texts[i]
        if did % 199 < 2:
            base = PASSAGES[did % 16] * 3
            t = base[:180] + t[:20] + ("x" if did % 199 == 1 else "y")
        docs.append(t)
    return pd.DataFrame({"doc_id": ids, "text": docs})

rd.range(n_docs).map_batches(synth, batch_format="pandas",
                             batch_size=50_000).write_parquet(out)
ray.shutdown()
"""


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="ctas_scaling_dedup_")
    subprocess.run(
        [sys.executable, "-c", SYNTH.replace("__REPO__", repr(REPO)), str(N_DOCS), tmp],
        check=True, capture_output=True, text=True,
    )
    walls = {}
    for ncpu in (LO, HI):
        r = subprocess.run(
            [sys.executable, "-c", CHILD.replace("__REPO__", repr(REPO)), str(ncpu), tmp],
            check=True, capture_output=True, text=True,
        )
        line = [x for x in r.stdout.splitlines() if x.startswith("RESULT")][-1]
        walls[ncpu] = float(line.split()[1])
    eff = (walls[LO] / walls[HI]) / (HI / LO)
    out = {
        "metric": f"minhash-lsh dedup scaling efficiency (num_cpus {LO} -> {HI})",
        "n_docs": N_DOCS,
        f"sec_{LO}": round(walls[LO], 3),
        f"sec_{HI}": round(walls[HI], 3),
        f"docs_per_s_{LO}": round(N_DOCS / walls[LO], 1),
        f"docs_per_s_{HI}": round(N_DOCS / walls[HI], 1),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "scaling_dedup_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
