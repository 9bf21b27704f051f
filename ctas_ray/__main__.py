"""Command-line entry points for the two engines.

Usage (a Ray session is created here — the ONLY library-adjacent place
allowed to call ray.init besides bench/tests, per the driver contract):

  python -m ctas_ray rollup  --input tx.parquet --out /tmp/rollup [--archive-text]
  python -m ctas_ray screen  --input tx.parquet --out /tmp/screen [--scoring ks]
  python -m ctas_ray retain  --out /tmp/rollup --tier tier_1m --max-age-s 86400
  python -m ctas_ray ingest  --full-events /data/full --increment /data/new.parquet \
                             --prior /tmp/rollup --out /tmp/rollup_v2
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ctas_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("rollup", help="rollup+downsample+codec over transcripts")
    pr.add_argument("--input", required=True, help="transcript parquet path/dir")
    pr.add_argument("--out", required=True)
    pr.add_argument("--archive-text", action="store_true")
    pr.add_argument("--verify-roundtrip", action="store_true")
    pr.add_argument("--num-cpus", type=int, default=None)

    ps = sub.add_parser("screen", help="anomaly screen over transcripts")
    ps.add_argument("--input", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--scoring", default="ks", choices=["ks", "mixedeffects", "avg_feat_value"])
    ps.add_argument("--features", default=None)
    ps.add_argument("--max-share-missing", type=float, default=0.8)
    ps.add_argument("--plan-mode", default="vector", choices=["classic", "vector"],
                    help="vector (default) is the scale-safe planner; "
                         "classic mirrors the reference's subject-list walk")
    ps.add_argument("--num-cpus", type=int, default=None)

    pi = sub.add_parser(
        "ingest", help="fold a late event batch into an existing rollup "
                       "(merge-on-read delta; see ingest_events_increment)")
    pi.add_argument("--full-events", required=True,
                    help="dir holding the FULL history as events.parquet")
    pi.add_argument("--increment", required=True, help="new-batch parquet")
    pi.add_argument("--prior", required=True,
                    help="existing rollup out_dir (from `rollup`/previous ingest)")
    pi.add_argument("--out", required=True)
    pi.add_argument("--partitioned-events", default=None,
                    help="key-partitioned event store (part=<uid%%B>/) for read pruning")
    pi.add_argument("--materialize", action="store_true",
                    help="also rewrite a self-contained store (compaction)")
    pi.add_argument("--num-cpus", type=int, default=None)

    pt = sub.add_parser("retain", help="apply a retention policy to a rollup dir")
    pt.add_argument("--out", required=True)
    pt.add_argument("--tier", action="append", required=True,
                    help="tier=<name>:<max_age_s>, repeatable")
    pt.add_argument("--now-us", type=int, default=None)

    args = p.parse_args(argv)

    import os as _os

    import ray

    if not ray.is_initialized():
        # sandbox default is a local session (RAY_ADDRESS=local preset);
        # under `ray job submit` RAY_ADDRESS points at the cluster and
        # this driver joins it unchanged
        ray.init(
            address=_os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=getattr(args, "num_cpus", None),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "rollup":
            from ctas_ray.config import RollupConfig
            from ctas_ray.pipelines.rollup import run_rollup
            from ctas_ray.sources.transcripts import read_transcripts

            cfg = RollupConfig(archive_text=args.archive_text)
            paths = run_rollup(
                read_transcripts(args.input), args.out, cfg,
                transcripts_path=args.input,
                verify_roundtrip=args.verify_roundtrip,
            )
            print(json.dumps(paths))
        elif args.cmd == "screen":
            import os

            from ctas_ray.config import StudyConfig
            from ctas_ray.pipelines.transcript_screen import screen_transcripts
            from ctas_ray.sources.transcripts import read_transcripts

            kwargs = {"max_share_missing": args.max_share_missing,
                      "site_scoring_method": args.scoring}
            if args.features:
                kwargs["features"] = args.features
            out = screen_transcripts(
                read_transcripts(args.input), StudyConfig(**kwargs),
                plan_mode=args.plan_mode,
            )
            os.makedirs(args.out, exist_ok=True)
            written = {}
            for name, frame in out.items():
                if frame is None:
                    continue
                path = f"{args.out}/{name}.parquet"
                frame.to_parquet(path, index=False)
                written[name] = {"path": path, "rows": len(frame)}
            print(json.dumps(written))
        elif args.cmd == "ingest":
            from ctas_ray.config import RollupConfig
            from ctas_ray.pipelines.rollup import (
                ingest_events_increment,
                run_rollup_events,
                tier_name,
            )

            cfg = RollupConfig()
            # prior paths: reconstruct the run_rollup_events mapping from
            # the prior out_dir layout
            from ctas_ray.pipelines.rollup import _tier_paths

            prior = {"blobs": f"{args.prior}/stage0/kind=blob"}
            for width in cfg.tiers_s:
                name = tier_name(width)
                prior[f"tier_{name}"] = _tier_paths(args.prior, name)
            paths = ingest_events_increment(
                args.full_events, args.increment, prior, args.out, cfg,
                materialize=args.materialize,
                partitioned_events_dir=args.partitioned_events,
            )
            print(json.dumps({k: str(v) for k, v in paths.items()}))
        else:  # retain
            import time

            from ctas_ray.pipelines.rollup import apply_retention

            policy = {}
            for spec in args.tier:
                name, age = spec.split(":")
                policy[name] = None if age in ("none", "inf") else float(age)
            now_us = args.now_us or int(time.time() * 1e6)
            print(json.dumps(apply_retention(args.out, now_us, policy)))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
