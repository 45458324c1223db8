"""Retention enforcement over committed tier outputs.

Retention at produce time is a filter (``RetentionConfig`` in the rollup
pipelines). This module is the maintenance side: prune already-committed
hive-partitioned tier outputs down to their retention windows, the way a
tiered TSDB expires old chunks.

Efficiency contract: files whose parquet footer says every row is inside
the window are untouched (no read, no rewrite); files entirely outside are
deleted; only straddling files are rewritten (atomic tmp + rename). The
footer min/max of ``bucket_ts`` makes this an O(files) metadata scan, not a
data scan — at 100 TB the pruning cost is proportional to the expired
fraction only.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from datafiller_ray.config import RetentionConfig


def _file_bounds(path: str) -> tuple[int, int] | None:
    md = pq.ParquetFile(path).metadata
    lo, hi = None, None
    schema_idx = None
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        if schema_idx is None:
            for ci in range(group.num_columns):
                if group.column(ci).path_in_schema == "bucket_ts":
                    schema_idx = ci
                    break
            if schema_idx is None:
                return None
        stats = group.column(schema_idx).statistics
        if stats is None or not stats.has_min_max:
            return None
        lo = stats.min if lo is None else min(lo, stats.min)
        hi = stats.max if hi is None else max(hi, stats.max)
    if lo is None:
        return None
    return int(lo), int(hi)


def enforce_retention(tiers_dir: str, retention: RetentionConfig) -> dict:
    """Prune tier outputs in place. Returns per-action file counts."""
    stats = {"kept": 0, "deleted": 0, "rewritten": 0, "rows_dropped": 0}
    for root, _dirs, files in os.walk(tiers_dir):
        tier = None
        for part in root.split(os.sep):
            if part.startswith("tier="):
                tier = part.split("=", 1)[1]
        if tier is None:
            continue
        lo, hi = retention.bounds(tier)
        if lo is None and hi is None:
            stats["kept"] += sum(f.endswith(".parquet") for f in files)
            continue
        for f in files:
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(root, f)
            bounds = _file_bounds(path)
            if bounds is None:
                bounds = None  # no stats: fall through to rewrite
            if bounds is not None:
                f_lo, f_hi = bounds
                inside = (lo is None or f_lo >= lo) and (hi is None or f_hi < hi)
                outside = (lo is not None and f_hi < lo) or (
                    hi is not None and f_lo >= hi
                )
                if inside:
                    stats["kept"] += 1
                    continue
                if outside:
                    os.unlink(path)
                    stats["deleted"] += 1
                    continue
            table = pq.read_table(path)
            import pyarrow.compute as pc

            keep = None
            col = table["bucket_ts"]
            if lo is not None:
                keep = pc.greater_equal(col, lo)
            if hi is not None:
                upper = pc.less(col, hi)
                keep = upper if keep is None else pc.and_(keep, upper)
            kept_table = table.filter(keep)
            stats["rows_dropped"] += table.num_rows - kept_table.num_rows
            tmp = path + ".tmp"
            if kept_table.num_rows:
                pq.write_table(kept_table, tmp)
                os.replace(tmp, path)
                stats["rewritten"] += 1
            else:
                os.unlink(path)
                stats["deleted"] += 1
    return stats


def compact_small_files(
    tiers_dir: str,
    *,
    target_bytes: int = 128 << 20,
    min_merge: int = 2,
) -> dict:
    """Compact the small-file tail of committed tier outputs: within each
    hive partition directory, greedily merge runs of parquet files (in
    sorted filename order — the commit order) whose COMBINED size stays
    under ``target_bytes``, rewriting each run as one file via atomic
    tmp + rename and deleting the inputs only after the replacement is
    durable.

    Why it exists: per-bucket atomic commits (pipelines/checkpoint.py) and
    incremental updates deliberately write MANY small files — correct for
    resume, hostile to scan throughput at 100 TB (footer-per-file overhead
    and tiny row groups). Compaction is the standard maintenance pass that
    restores read efficiency without touching the commit protocol: rows
    are preserved byte-for-byte (concatenation of the inputs in filename
    order; no re-sort, no re-encode of values), so downstream readers see
    the identical multiset of rows — pinned by the round-trip test.

    Files at or above ``target_bytes`` (or alone in their run) are left
    untouched; a crash mid-compaction leaves either the old files or the
    new file plus leftover ``.compact-tmp`` garbage, never a partial state
    (the same write-audit-publish discipline as the checkpoint sink).

    Returns {"merged_files": n_inputs_removed, "created": n_outputs,
    "kept": untouched_count, "bytes_before": ..., "bytes_after": ...}.
    """
    import pyarrow as pa

    stats = {
        "merged_files": 0,
        "created": 0,
        "kept": 0,
        "bytes_before": 0,
        "bytes_after": 0,
    }
    for root, _dirs, files in os.walk(tiers_dir):
        parts = sorted(f for f in files if f.endswith(".parquet"))
        if not parts:
            continue
        sizes = {f: os.path.getsize(os.path.join(root, f)) for f in parts}
        stats["bytes_before"] += sum(sizes.values())
        runs: "list[list[str]]" = []
        cur: "list[str]" = []
        cur_bytes = 0
        for f in parts:
            if sizes[f] >= target_bytes:
                if cur:
                    runs.append(cur)
                runs.append([f])
                cur, cur_bytes = [], 0
                continue
            if cur and cur_bytes + sizes[f] > target_bytes:
                runs.append(cur)
                cur, cur_bytes = [], 0
            cur.append(f)
            cur_bytes += sizes[f]
        if cur:
            runs.append(cur)
        for run in runs:
            if len(run) < max(min_merge, 2):
                stats["kept"] += len(run)
                continue
            tables = [pq.read_table(os.path.join(root, f)) for f in run]
            merged = pa.concat_tables(tables, promote_options="default")
            tmp = os.path.join(root, f"{run[0]}.compact-tmp")
            pq.write_table(merged, tmp)
            os.replace(tmp, os.path.join(root, run[0]))
            for f in run[1:]:
                os.unlink(os.path.join(root, f))
            stats["merged_files"] += len(run)
            stats["created"] += 1
    for root, _dirs, files in os.walk(tiers_dir):
        stats["bytes_after"] += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return stats
