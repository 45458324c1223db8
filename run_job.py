#!/usr/bin/env python
"""CLI entry for `ray job submit`: resumable tier rollup + gap fill.

    ray job submit -- python run_job.py \
        --input /data/sequences --out /data/tiers \
        --fill linear --max-gap 60 --tiers 1m,1h,1d --buckets 128

Re-running the same command resumes from the manifest (completed partials /
buckets are skipped — see pipelines/checkpoint.py). This script owns the Ray
session; library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", default=None, help="parquet file/dir of the contract table (not needed with --update)")
    ap.add_argument("--out", required=True, help="output dir (manifest + partials + tiers)")
    ap.add_argument("--fill", default="linear",
                    choices=["none", "locf", "linear", "spline", "mean", "model"])
    ap.add_argument("--max-gap", type=int, default=None)
    ap.add_argument("--fallback", choices=["simple"], default=None)
    ap.add_argument("--tiers", default="1m,1h,1d")
    ap.add_argument("--buckets", type=int, default=128,
                    help="checkpoint/shuffle partition count")
    ap.add_argument("--subbuckets", type=int, default=16,
                    help="streaming sub-partitions per bucket (memory bound)")
    ap.add_argument("--no-token-check", action="store_true")
    ap.add_argument("--emit", choices=["rows", "blobs"], default="rows",
                    help="tier rows, or Gorilla chunk blobs per (source, tier)")
    ap.add_argument("--update", metavar="NEW_INPUT", default=None,
                    help="fold NEW parquet into a completed --out "
                         "(incremental: only touched buckets recompute)")
    ap.add_argument("--update-mode", choices=["add", "replace"], default="add",
                    help="add: additive ingest (default); replace: upsert — "
                         "the update replaces every (source, minute) it touches")
    ap.add_argument("--deletes", metavar="KEYS_PARQUET", default=None,
                    help="parquet of doc_id/source keys to tombstone "
                         "(composable with --update, or alone)")
    ap.add_argument("--compact-updates", action="store_true",
                    help="after the run, fold committed updates into a new "
                         "base-partials epoch (checkpoint.compact_updates)")
    ap.add_argument("--retain-after", type=int, default=None,
                    help="keep buckets with ts >= this epoch second (all tiers)")
    ap.add_argument("--compact-target", type=int, default=None, metavar="BYTES",
                    help="after the run, merge small committed tier files "
                         "up to this byte target per output file "
                         "(retention.compact_small_files)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if args.input is None and args.update is None and args.deletes is None \
            and not args.compact_updates:
        ap.error("--input is required unless --update/--deletes/"
                 "--compact-updates is given")

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from datafiller_ray.config import FillConfig, RetentionConfig
    from datafiller_ray.pipelines.checkpoint import run_checkpointed

    tiers = tuple(t.strip() for t in args.tiers.split(",") if t.strip())
    cfg = FillConfig(
        strategy=None if args.fill == "none" else args.fill,
        max_gap=args.max_gap,
        fallback=args.fallback,
    )
    retention = (
        RetentionConfig(windows={t: (args.retain_after, None) for t in tiers})
        if args.retain_after is not None
        else None
    )
    t0 = time.perf_counter()
    if args.update is not None or args.deletes is not None:
        from datafiller_ray.pipelines.checkpoint import run_incremental

        summary = run_incremental(
            args.out,
            args.update,
            fill=cfg,
            mode=args.update_mode,
            deletes=args.deletes,
        )
    elif args.compact_updates and args.input is None:
        summary = {}
    else:
        summary = run_checkpointed(
            args.input,
            args.out,
            fill=cfg,
            tiers=tiers,
            retention=retention,
            check_tokens=not args.no_token_check,
            n_buckets=args.buckets,
            n_subbuckets=args.subbuckets,
            emit=args.emit,
        )
    if args.compact_updates:
        from datafiller_ray.pipelines.checkpoint import compact_updates

        summary["update_compaction"] = compact_updates(args.out)
    if args.compact_target is not None:
        from datafiller_ray.pipelines.retention import compact_small_files

        tiers_dir = os.path.join(args.out, "tiers")
        summary["compaction"] = compact_small_files(
            tiers_dir if os.path.isdir(tiers_dir) else args.out,
            target_bytes=args.compact_target,
        )
    summary["wall_sec"] = round(time.perf_counter() - t0, 2)
    summary.pop("manifest", None)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
