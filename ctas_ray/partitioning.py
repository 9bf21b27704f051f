"""Scale-aware partition sizing for the salted per-partition exchanges.

Every ``groupby("part").map_groups`` kernel in this package dispatches one
vectorized UDF call per hash PARTITION (never per group).  The partition
count therefore bounds BOTH the exchange parallelism and the per-task
memory: a fixed constant (32/64 in rounds 1-3) caps a 10^12-turn input at
32 concurrent tasks and hands each one ~1/32 of the dataset.  This module
derives the count from the input size instead:

    parts = clamp(ceil(input_bytes / TARGET_PARTITION_BYTES),
                  floor=cluster CPUs, cap=backstop)

so partitions stay ~128-256 MB at any scale and small inputs still fan out
to every core.  The kernels that use it are per-key exact (each series /
hash key lands wholly in one partition and is reduced with integer or
per-key-complete math), so the RESULT is invariant to the chosen count —
verified by ``tests/test_partitioning.py`` which runs the same kernels at
two forced bucket settings, and by the 10^8-row stress leg in BASELINE.md.

Mirrors the rollup engine's configurable ``RollupConfig.salt_buckets``
(config.py) for the contract/query kernels.
"""

from __future__ import annotations

import math
import os

# ~128-256 MB of in-memory input per partition: large enough to amortize
# per-task dispatch, small enough that one partition's pandas frame plus
# its groupby temporaries fits comfortably in a worker heap.
# CTAS_RAY_TARGET_PARTITION_BYTES overrides it (stress legs prove result
# invariance by running the same job at two settings).
TARGET_PARTITION_BYTES = int(
    os.environ.get("CTAS_RAY_TARGET_PARTITION_BYTES", 192 * 1024 * 1024)
)

# Backstop only — at 100 TB in-memory this still yields ~550k partitions
# of 192 MB, far below it.
MAX_PARTS = 1 << 20


def cluster_cpus(default: int = 8) -> int:
    """Total cluster CPUs (the parallelism floor for small inputs)."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
            if cpus > 0:
                return cpus
    except Exception:
        pass
    return os.cpu_count() or default


def adaptive_parts(
    nbytes: int | None = None,
    *,
    target_bytes: int = TARGET_PARTITION_BYTES,
    floor: int | None = None,
    cap: int = MAX_PARTS,
) -> int:
    """Partition count sized from input bytes.

    ``ceil(nbytes / target_bytes)`` floored at the cluster CPU count (so
    toy inputs still use every core) and capped by a runaway backstop.
    With ``nbytes`` unknown (``None``/0) returns the floor — correct but
    conservative; callers that CAN know their input size should pass it.
    """
    if floor is None:
        floor = cluster_cpus()
    floor = max(1, floor)
    if not nbytes or nbytes <= 0:
        return floor
    return int(min(cap, max(floor, math.ceil(nbytes / target_bytes))))


def dataset_nbytes(ds) -> int | None:
    """In-memory size known from READ metadata WITHOUT executing the plan.

    ``read_parquet`` infers it from file metadata (column pruning
    included); plans with transforms return None — callers then fall back
    to the CPU floor or pass an explicit estimate.
    """
    try:
        meta = ds._logical_plan.dag.infer_metadata()
        return meta.size_bytes
    except Exception:
        return None


def parts_for(ds, *, nbytes: int | None = None, **kw) -> int:
    """Adaptive partition count for a Dataset (metadata-known size when
    available, CPU floor otherwise)."""
    return adaptive_parts(
        nbytes if nbytes is not None else dataset_nbytes(ds), **kw
    )
