"""PageRank stopping modes (VERDICT r4 item 5): the default fixed
iteration count matches the unrolled-SQL oracle; convergence mode
(tol_e9) stops on the exact integer L1 rank delta and is bounded by
max_iters. Geometric decay at d = 0.85 makes the delta trajectory
predictable, which is what these tests pin."""

from __future__ import annotations

import pandas as pd

from ctas_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"


def test_fixed_mode_ignores_tolerance_machinery(ray_session):
    """Default call (contract path) runs exactly PAGERANK_ITERS rounds
    and reports them; no sentinel rows can leak into the report."""
    stats: dict = {}
    out = q.supplier_pagerank(SF, stats=stats)
    assert stats["iters"] == q.PAGERANK_ITERS
    assert stats["final_delta_e9"] is None
    assert len(out) == 20
    assert (out["node"] >= 0).all()
    assert list(out.columns) == ["node", "entity_key", "is_supplier", "rank"]


def test_convergence_mode_stops_early_and_monotone(ray_session):
    """A loose tolerance stops well before max_iters; a tighter one
    runs strictly more iterations and ends with a smaller delta
    (geometric decay), both bounded by max_iters."""
    loose: dict = {}
    q.supplier_pagerank(SF, tol_e9=10_000_000_000, max_iters=40, stats=loose)
    assert loose["iters"] < 40
    assert loose["final_delta_e9"] <= 10_000_000_000

    tight: dict = {}
    q.supplier_pagerank(SF, tol_e9=1_000_000_000, max_iters=60, stats=tight)
    assert tight["iters"] > loose["iters"]
    assert tight["iters"] < 60
    assert tight["final_delta_e9"] <= 1_000_000_000
    assert tight["final_delta_e9"] < loose["final_delta_e9"]


def test_convergence_equals_fixed_at_same_iteration_count(ray_session):
    """Convergence mode is the SAME integer recurrence as fixed mode:
    stopping it after k rounds must reproduce iters=k bit-for-bit
    (the sentinel/delta machinery cannot perturb ranks)."""
    stats: dict = {}
    conv = q.supplier_pagerank(
        SF, tol_e9=10_000_000_000, max_iters=40, stats=stats
    )
    fixed = q.supplier_pagerank(SF, iters=stats["iters"])
    pd.testing.assert_frame_equal(
        conv.reset_index(drop=True), fixed.reset_index(drop=True)
    )
