"""Scale-aware partition sizing (VERDICT r3 item 1).

Two claims: (a) the sizing math targets ~192 MB partitions with a CPU
floor and a backstop cap; (b) the salted kernels are per-key exact, so
their OUTPUT is invariant to the partition count — the property that
makes input-derived (environment-dependent) counts safe.
"""

import numpy as np
import pandas as pd
import pytest

from ctas_ray import partitioning as P

SF = "/root/testdata/sf0.001"


def test_adaptive_parts_math():
    floor = P.cluster_cpus()
    # unknown size -> floor
    assert P.adaptive_parts(None) == floor
    assert P.adaptive_parts(0) == floor
    # small input -> floor (never fewer than the cluster's cores)
    assert P.adaptive_parts(1024) == floor
    # big input -> ceil(bytes / target)
    tb = P.TARGET_PARTITION_BYTES
    assert P.adaptive_parts(10 * tb + 1, floor=4) == 11
    assert P.adaptive_parts(10 * tb, floor=4) == 10
    # 100 TB in-memory stays under the backstop cap
    assert P.adaptive_parts(100 * (1 << 40), floor=4) < P.MAX_PARTS
    # explicit floor wins over tiny inputs
    assert P.adaptive_parts(1, floor=13) == 13


def test_dataset_nbytes_known_for_reads(ray_session):
    from ctas_ray.sources import read_parquet_clean

    ds = read_parquet_clean(f"{SF}/events.parquet", columns=["event_id"])
    nb = P.dataset_nbytes(ds)
    assert nb is not None and nb > 0
    # transforms lose the metadata estimate -> None (callers fall back)
    assert P.dataset_nbytes(ds.map_batches(lambda b: b)) is None


@pytest.mark.parametrize("buckets_pair", [(3, 17)])
def test_salted_kernels_invariant_to_bucket_count(
    ray_session, monkeypatch, buckets_pair
):
    """The same kernels at two forced partition counts produce identical
    frames — the correctness precondition for environment-derived
    counts (different CPU counts / input sizes must not change results).
    """
    from ctas_ray.pipelines import queries as q
    from ctas_ray.stages import dedup as dd

    def run(n: int):
        monkeypatch.setattr(q, "parts_for", lambda ds, **kw: n)
        monkeypatch.setattr(q, "adaptive_parts", lambda *a, **kw: n)
        monkeypatch.setattr(dd, "parts_for", lambda ds, **kw: n)
        monkeypatch.setattr(dd, "adaptive_parts", lambda *a, **kw: n)
        out = {
            "elig": q.eligibility_counts(SF),
            "m4": q.m4_downsample(SF),
            "paa": q.paa_downsample(SF),
            "gaps": q.tier_gap_analysis(SF),
        }
        from ctas_ray.sources import read_parquet_clean

        docs = read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        out["sub"] = dd.substring_duplicate_windows(docs)
        return out

    a, b = (run(n) for n in buckets_pair)
    for k in a:
        pd.testing.assert_frame_equal(
            a[k].reset_index(drop=True), b[k].reset_index(drop=True)
        )
        assert len(a[k]) > 0, k
