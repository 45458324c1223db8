"""Rollup + gap-fill pipelines over the generic ``events`` stream table
(event_id, ts:timestamp, user_id, event_type, value, props).

Demonstrates that the engine's tier/gap-fill machinery is not bound to the
tokenized-sequence schema: any (key, timestamp, measure) stream goes through
the same partial-agg -> groupby(key) -> densify -> fill plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from datafiller_ray.functions.gapfill import fill_linear, fill_locf


def _bucket_partial(step: int):
    def fn(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())  # microseconds
        secs = pc.divide(ts, pa.scalar(1_000_000, pa.int64()))
        bucket = pc.multiply(
            pc.divide(secs, pa.scalar(step, pa.int64())), pa.scalar(step, pa.int64())
        )
        slim = pa.table(
            {
                "event_type": batch["event_type"],
                "bucket_ts": bucket,
                "value": batch["value"],
            }
        )
        agg = slim.group_by(["event_type", "bucket_ts"]).aggregate(
            [("value", "count"), ("value", "sum"), ("value", "min"), ("value", "max")]
        )
        return pa.table(
            {
                "event_type": agg["event_type"],
                "bucket_ts": agg["bucket_ts"],
                "n_events": agg["value_count"],
                "sum_value": agg["value_sum"],
                "min_value": agg["value_min"],
                "max_value": agg["value_max"],
            }
        )

    return fn


def _final_combine(g: pd.DataFrame) -> pd.DataFrame:
    agg = g.groupby("bucket_ts", sort=True).agg(
        n_events=("n_events", "sum"),
        sum_value=("sum_value", "sum"),
        min_value=("min_value", "min"),
        max_value=("max_value", "max"),
    )
    out = agg.reset_index()
    out.insert(0, "event_type", g["event_type"].iloc[0])
    out["sum_value"] = np.round(out["sum_value"], 6)
    return out


def events_rollup(
    events: "ray.data.Dataset", *, step: int = 60
) -> "ray.data.Dataset":
    """count/sum/min/max of ``value`` per (event_type, step-aligned bucket).
    Same partial+final algebra as the token rollup."""
    partial = events.map_batches(
        _bucket_partial(step), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return partial.groupby("event_type").map_groups(
        _final_combine, batch_format="pandas"
    )


def _gapfill_group(step: int, kernel):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("bucket_ts", sort=True).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        ts = agg.index.to_numpy(np.int64)
        grid = np.arange(ts[0], ts[-1] + step, step, dtype=np.int64)
        y = np.full(grid.size, np.nan)
        y[(ts - ts[0]) // step] = np.round(agg["sum_value"].to_numpy(np.float64), 6)
        n = np.zeros(grid.size, dtype=np.int64)
        n[(ts - ts[0]) // step] = agg["n_events"].to_numpy(np.int64)
        filled, _ = kernel(y, None)
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "bucket_ts": grid,
                "n_events": n,
                "fill_value": np.round(filled, 6),
            }
        )

    return fn


def events_gapfill_locf(
    events: "ray.data.Dataset", *, step: int = 60
) -> "ray.data.Dataset":
    """Dense per-event_type grid with LOCF-filled sum(value) — the events
    analogue of the tier gap fill (SQL-oracle-expressible via
    last_value IGNORE NULLS)."""
    partial = events.map_batches(
        _bucket_partial(step), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return partial.groupby("event_type").map_groups(
        _gapfill_group(step, fill_locf), batch_format="pandas"
    )


def events_sessions(
    events: "ray.data.Dataset", *, gap_seconds: int = 1800
) -> "ray.data.Dataset":
    """Session windows per user: consecutive events closer than
    ``gap_seconds`` belong to one session (the streaming-shaped operator of
    ray_guide.md: the log is partitioned by key and windowed inside sorted
    ``map_groups``; the ordering assumption is per-user, never global).

    Emits (user_id, session_start, n_events, duration_sec) — all integers,
    so the DuckDB oracle compares hash-exactly."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        s = np.sort(g["ts_s"].to_numpy(np.int64))
        brk = np.empty(s.size, dtype=bool)
        brk[0] = True
        np.greater(np.diff(s), gap_seconds, out=brk[1:])
        sid = np.cumsum(brk) - 1
        starts = s[brk]
        n = np.bincount(sid)
        ends = np.maximum.reduceat(s, np.flatnonzero(brk))
        return pd.DataFrame(
            {
                "user_id": np.int64(g["user_id"].iloc[0]),
                "session_start": starts,
                "n_events": n.astype(np.int64),
                "duration_sec": (ends - starts).astype(np.int64),
            }
        )

    def project(batch: pa.Table) -> pa.Table:
        secs = pc.divide(pc.cast(batch["ts"], pa.int64()), pa.scalar(1_000_000, pa.int64()))
        return pa.table({"user_id": batch["user_id"], "ts_s": secs})

    slim = events.map_batches(
        project, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return slim.groupby("user_id").map_groups(per_user, batch_format="pandas")


def events_gapfill_linear(
    events: "ray.data.Dataset", *, step: int = 60
) -> "ray.data.Dataset":
    """Linear-interpolated variant (reference interpolate_small_gaps
    semantics with unbounded max_gap; SQL oracle uses prev/next window
    anchors)."""
    partial = events.map_batches(
        _bucket_partial(step), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    )
    return partial.groupby("event_type").map_groups(
        _gapfill_group(step, fill_linear), batch_format="pandas"
    )
