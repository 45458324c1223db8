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
