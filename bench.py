"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(num_cpus=$RAY_GRAFT_CPUS)``
(default 32) and prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": T,
   "turns_per_s": T/sec}

``--scaling`` runs the headline pipeline twice in fresh subprocesses at
num_cpus=8 and 32 on the same input and reports both throughputs plus
the scaling efficiency (the sandbox stand-in for the N-vs-4N-node
criterion in BASELINE.json; see BASELINE.md).

All walls here are LOAD-SENSITIVE: a concurrent job on the box inflates
them 1.5-2x (observed round 3 vs the idle-box reruns in BASELINE.md).
Compare numbers only across runs taken on an idle box; the median-of-5
protocol in scripts/scaling_median.py exists for the same reason.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _scaling_main() -> None:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            # amplify the input so compute dominates fixed overheads —
            # the scaling criterion measures throughput scaling, which
            # at sf0.1's raw size (~26 MB) would only measure Ray's
            # constant costs. 150x (15M turns) since the round-2 kernel
            # optimisations cut per-core work ~3x (Amdahl: the same
            # fixed per-run costs need proportionally more useful work
            # to stay under ~6% of the fast leg; measured 0.69 at 50x
            # vs 0.80 at 150x on identical code)
            GRAFT_AMPLIFY=os.environ.get("GRAFT_AMPLIFY", "150"),
            GRAFT_HEADLINE_ONLY="1",
            GRAFT_BENCH_REPEAT=os.environ.get("GRAFT_BENCH_REPEAT", "3"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # primary pairing N=2 -> 4N=8: on this single-socket sandbox, DRAM
    # bandwidth saturates around 8 streaming workers, so 8->32 measures
    # the shared-memory ceiling rather than parallel scaling (a real
    # N->4N NODE cluster adds DRAM/disk/object-store per node). Both
    # pairings are reported; see BASELINE.md.
    lo, hi = int(os.environ.get("GRAFT_SCALE_LO", "2")), int(os.environ.get("GRAFT_SCALE_HI", "8"))
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    result = {
        "metric": f"rollup scaling efficiency (num_cpus {lo} -> {hi})",
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        "turns": r_lo["turns"],
        f"turns_per_s_{lo}": r_lo["turns_per_s"],
        f"turns_per_s_{hi}": r_hi["turns_per_s"],
        "scaling_efficiency": round(eff, 3),
    }
    if os.environ.get("GRAFT_SCALE_SECONDARY", "1") == "1" and (lo, hi) == (2, 8):
        r_32 = run(32)
        result["sec_32"] = r_32["value"]
        result["turns_per_s_32"] = r_32["turns_per_s"]
        result["scaling_efficiency_8_32"] = round(
            (r_hi["value"] / r_32["value"]) / 4, 3
        )
        result["note"] = (
            "8->32 on one socket is DRAM-bandwidth-bound (pure-CPU control "
            "scales 0.83 at 32 procs); 2->8 is the bandwidth-unsaturated "
            "N->4N evidence"
        )
    print(json.dumps(result))


def main() -> None:
    # set BEFORE ray.init so worker processes inherit it: expected-path
    # INFO chatter (dedup cap fallbacks, pair counts) stays out of the
    # benchmark record
    os.environ.setdefault("CTAS_RAY_QUIET", "1")
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None

    import ray

    ray.init(
        address="local", num_cpus=num_cpus,
        include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq

    import ray.data as rd
    from ctas_ray.config import RollupConfig
    from ctas_ray.pipelines import queries as q
    from ctas_ray.pipelines.rollup import rollup_datasets
    from ctas_ray.sources.transcripts import transcripts_from_events

    amplify = int(os.environ.get("GRAFT_AMPLIFY", "1"))
    headline_only = os.environ.get("GRAFT_HEADLINE_ONLY") == "1"
    turns = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows * amplify

    # warm the OS page cache (untimed) so we measure compute + shuffle;
    # read through the metadata-stripping reader so the warm-up itself
    # doesn't log "Failed to hash the schemas" (raw events.parquet
    # carries a pandas metadata dict)
    from ctas_ray.sources import read_parquet_clean

    read_parquet_clean(f"{sf_dir}/events.parquet").count()
    # warm the Ray worker pool (worker process spawn is a fixed cost that
    # would otherwise bill the first timed stage); the UDF imports the
    # library so workers also pay the ctas_ray/pandas import cost here,
    # not inside the first timed pipeline
    def _warm(b):
        import ctas_ray.stages.rollup  # noqa: F401
        import ctas_ray.study_core  # noqa: F401

        return b

    rd.range(num_cpus * 8, override_num_blocks=num_cpus * 8).map_batches(
        _warm, batch_format="pyarrow"
    ).materialize()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: full rollup engine — transcripts derivation, channel
    # extraction, salted per-conv grouping, Gorilla encode, 1m/1h/1d
    # cascade, all tiers + blobs persisted to parquet
    repeat = int(os.environ.get("GRAFT_BENCH_REPEAT", "1"))

    def rollup_e2e_once() -> float:
        from ctas_ray.pipelines.rollup import run_rollup_events

        out_dir = tempfile.mkdtemp(prefix="ctas_bench_")
        t0 = time.perf_counter()
        run_rollup_events(sf_dir, out_dir, RollupConfig(), amplify=amplify)
        wall = time.perf_counter() - t0
        shutil.rmtree(out_dir, ignore_errors=True)
        return wall

    timings["rollup_e2e"] = round(min(rollup_e2e_once() for _ in range(repeat)), 3)

    if not headline_only:
        # canonical-input path: the same engine fed from a transcript
        # parquet (schema per BASELINE.json input_hint) instead of the
        # fused events derivation
        def rollup_from_transcripts() -> None:
            from ctas_ray.pipelines.rollup import run_rollup
            from ctas_ray.sources.transcripts import read_transcripts

            tx_dir = tempfile.mkdtemp(prefix="ctas_txin_")
            transcripts_from_events(sf_dir).write_parquet(tx_dir)
            out2 = tempfile.mkdtemp(prefix="ctas_txout_")
            t0 = time.perf_counter()
            run_rollup(read_transcripts(tx_dir), out2, RollupConfig(), transcripts_path=tx_dir)
            timings["rollup_from_transcript_parquet"] = round(time.perf_counter() - t0, 3)
            shutil.rmtree(tx_dir, ignore_errors=True)
            shutil.rmtree(out2, ignore_errors=True)

        rollup_from_transcripts()

        # steady-state study_screen: min-of-2 COLD runs (both the screen
        # memo and its derivation cache are cleared between runs, so the
        # second run re-executes the full 12-stage pipeline) — the first
        # run in a session additionally pays one-time worker/kernel
        # warmup that is not the screen's cost. Same protocol note in
        # BASELINE.md; single-shot numbers on this box vary ~40%.
        def study_once() -> float:
            q._study_screen.cache_clear()
            q._events_study_tables.cache_clear()
            t0 = time.perf_counter()
            q.study_screen_sitescores(sf_dir)
            return time.perf_counter() - t0

        timings["study_screen"] = round(min(study_once() for _ in range(2)), 3)
        timed("series_features_basic", lambda: q.series_features_basic(sf_dir))
        timed("minhash_dedup", lambda: q.minhash_clusters(sf_dir))
        timed("topk_similarity", lambda: q.topk_similarity(sf_dir))
        timed("session_windows", lambda: q.session_windows(sf_dir))
        timed("asof_join", lambda: q.asof_join_clicks(sf_dir))
        timed("hopping_windows", lambda: q.hopping_window_stats(sf_dir))
        timed("global_quantiles", lambda: q.global_value_quantiles(sf_dir))
        timed("cusum_changepoint", lambda: q.cusum_changepoint(sf_dir))
        timed("ewma_last", lambda: q.ewma_last(sf_dir))
        timed("tfidf_top_terms", lambda: q.tfidf_top_terms(sf_dir))
        timed("event_cooccurrence", lambda: q.event_cooccurrence(sf_dir))
        timed("window_funnel", lambda: q.window_funnel(sf_dir))
        # downsample trio + robust fences (round-2 final session)
        timed("m4_downsample", lambda: q.m4_downsample(sf_dir))
        timed("lttb_downsample", lambda: q.lttb_downsample(sf_dir))
        timed("paa_downsample", lambda: q.paa_downsample(sf_dir))
        timed("mad_outlier_flags", lambda: q.mad_outlier_flags(sf_dir))
        # round-2 continuation surface (representative slice)
        timed("sax_symbols", lambda: q.sax_symbols(sf_dir))
        timed("daily_value_bands", lambda: q.daily_value_bands(sf_dir))
        timed("cdc_latest_state", lambda: q.cdc_latest_state(sf_dir))
        timed("pq_codes", lambda: q.pq_codebook_assignments(sf_dir))
        timed("concurrency_peak", lambda: q.session_concurrency_peak(sf_dir))
        timed("global_midranks", lambda: q.global_midrank_values(sf_dir))
        # round-3 surface (representative slice)
        timed("rollup_1w", lambda: q.rollup_1w(sf_dir))
        timed("pq_adc_topk", lambda: q.pq_adc_topk(sf_dir))
        timed("substring_dedup", lambda: q.substring_dup_windows(sf_dir))
        timed("late_event_stats", lambda: q.late_event_stats(sf_dir))
        # round-4 headline additions
        timed("supplier_pagerank", lambda: q.supplier_pagerank(sf_dir))
        timed("dtw_daily_volume", lambda: q.dtw_daily_volume(sf_dir))
        timed("trigram_novelty", lambda: q.trigram_novelty(sf_dir))
        timed("interval_coverage", lambda: q.interval_union_coverage(sf_dir))
        timed("bloom_audit", lambda: q.bloom_membership_audit(sf_dir))
        timed("mmr_diverse_topk", lambda: q.mmr_diverse_topk(sf_dir))
        # round-5 additions
        timed("semantic_dedup", lambda: q.semantic_dedup(sf_dir))
        timed("tpch_q8_market_share", lambda: q.tpch_q8_market_share(sf_dir))
        timed("ohlc_bars_1h", lambda: q.ohlc_bars_1h(sf_dir))
        timed("user_cusum_alarms", lambda: q.user_cusum_alarms(sf_dir))
        timed("lineitem_skyline", lambda: q.lineitem_skyline(sf_dir))
        timed("mixture_sample_plan", lambda: q.mixture_sample_plan(sf_dir))

    headline = timings["rollup_e2e"]
    print(
        json.dumps(
            {
                "metric": "end-to-end rollup+downsample (1m/1h/1d tiers + Gorilla blobs) wall time",
                "value": headline,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "num_cpus": num_cpus,
                "turns": turns,
                "turns_per_s": round(turns / headline, 1),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling_main()
    else:
        main()
