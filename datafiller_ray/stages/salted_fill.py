"""Salted (range-partitioned) gap fill: the skew-handling path.

A Zipf-heavy source makes ``groupby(source)`` a straggler: one group can
hold ~10%+ of all buckets and serialize the fill stage (north rule: "Skewed
sources are salted and range-partitioned explicitly before the shuffle").
Measured at sf0.3 the unsalted fill stage scales 45s(8cpu) -> 36s(32cpu)
because the hottest source bounds the critical path.

Design (SURVEY.md §4 "Skew", §7 "ordering inside groups at scale"):

- only the **1m tier** is salted: coarser tiers have 60x/1440x fewer buckets
  per source and go through the ordinary per-source path with no straggler;
- each 1m partial row gets ``salt = bucket_ts // salt_span``; rows within
  ``margin = (max_gap + 1)`` buckets of a chunk boundary are REPLICATED into
  the neighbor chunk as ghost context rows (used for fill context, never
  emitted). For run-length-bounded kernels (locf / linear, ``max_gap = G``)
  this is EXACT:

  * a NaN run of length <= G that touches a chunk has both bounding observed
    values within G+1 buckets, hence inside the ghost window — the kernel
    sees the full run and fills it identically to the per-source pass;
  * a run longer than G is never filled by either path, and a chunk whose
    visible window shows >= G+1 leading/trailing NaNs proves the global run
    exceeds G (salt_span > (G+1) buckets is validated), so no false fill;
  * window-leading/trailing runs coincide with global series edges exactly
    when the window is clipped by the source's global [min, max] bounds,
    which are broadcast from a tiny pre-aggregate (``ray.put`` once).

- (source, salt) chunks with zero real rows still belong to the global
  grid (e.g. an all-gap interior day): groups holding only ghost rows emit
  their all-gap slice in place, and fully absent chunks are synthesized
  driver-side from the bounds table. Both are provably unfilled (any run
  covering a whole chunk exceeds G).

Bit-exactness vs the unsalted per-source path is pinned by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from datafiller_ray.config import (
    EngineValueError,
    FillConfig,
    RetentionConfig,
)
from datafiller_ray.functions import gapfill
from datafiller_ray.stages.fill import TIER_COLUMNS, apply_fill, combine_partials

STEP = 60  # the salted tier is always 1m
SALTABLE_STRATEGIES = ("locf", "linear", "spline")


def validate_salt_config(cfg: FillConfig, salt_span: int) -> int:
    """Returns the ghost margin in buckets."""
    if cfg.strategy is not None and cfg.strategy not in SALTABLE_STRATEGIES:
        raise EngineValueError(
            f"salted fill supports strategies {SALTABLE_STRATEGIES} or None; "
            f"{cfg.strategy!r} needs whole-series context (use the per-source path)"
        )
    if cfg.strategy is not None and cfg.max_gap is None:
        raise EngineValueError("salted fill requires a bounded max_gap")
    if cfg.strategy == "spline" and cfg.spline_knot_radius is None:
        raise EngineValueError(
            "salted spline requires a bounded spline_knot_radius (the ghost "
            "margin must cover every knot the kernel can read)"
        )
    if cfg.fallback is not None:
        raise EngineValueError(
            "salted fill cannot apply a per-series mean fallback (global stat)"
        )
    if salt_span % STEP:
        raise EngineValueError("salt_span must be a multiple of 60s")
    g = cfg.max_gap if cfg.strategy is not None else 0
    margin = (g or 0) + 1
    if cfg.strategy == "spline":
        margin += cfg.spline_knot_radius
    if salt_span // STEP <= margin:
        raise EngineValueError(
            f"salt_span ({salt_span}s) must exceed the ghost margin of "
            f"{margin} 1m buckets"
        )
    return margin


def make_salt_fn(salt_span: int, margin_buckets: int):
    """Batch fn over 1m partial rows: assign salt; replicate boundary rows
    into neighbor chunks as ghost context."""
    margin = margin_buckets * STEP

    def fn(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["bucket_ts"])
        salt = ts // salt_span
        offset = ts - salt * salt_span
        base = batch.append_column("salt", pa.array(salt, pa.int64()))
        tables = [base.append_column("ghost", pa.array(np.zeros(len(ts), bool)))]
        left = offset < margin
        if left.any():
            t = batch.filter(pa.array(left))
            t = t.append_column("salt", pa.array(salt[left] - 1, pa.int64()))
            tables.append(
                t.append_column("ghost", pa.array(np.ones(int(left.sum()), bool)))
            )
        right = offset >= salt_span - margin
        if right.any():
            t = batch.filter(pa.array(right))
            t = t.append_column("salt", pa.array(salt[right] + 1, pa.int64()))
            tables.append(
                t.append_column("ghost", pa.array(np.ones(int(right.sum()), bool)))
            )
        return pa.concat_tables(tables)

    return fn


def source_bounds(partials: "ray.data.Dataset") -> dict[str, tuple[int, int]]:
    """Per-source global [min, max] 1m bucket (tiny driver-side table)."""
    from ray.data.aggregate import Max, Min

    df = (
        partials.groupby("source")
        .aggregate(Min("bucket_ts", alias_name="lo"), Max("bucket_ts", alias_name="hi"))
        .to_pandas()
    )
    return {r.source: (int(r.lo), int(r.hi)) for r in df.itertuples()}


def _all_gap_frame(source: str, grid: np.ndarray) -> pd.DataFrame:
    n = grid.size
    return pd.DataFrame(
        {
            "source": np.full(n, source, dtype=object),
            "tier": np.full(n, "1m", dtype=object),
            "bucket_ts": grid,
            "count": np.zeros(n, np.int64),
            "sum": np.full(n, np.nan),
            "min": np.full(n, np.nan),
            "max": np.full(n, np.nan),
            "value": np.full(n, np.nan),
            "filled": np.zeros(n, bool),
            "fill_method": np.full(n, "none", dtype=object),
        }
    )


def chunk_grid_slice(
    src_lo: int, src_hi: int, c_lo: int, c_hi: int
) -> np.ndarray:
    """The source's global 1m grid restricted to chunk [c_lo, c_hi)."""
    # global grid points are src_lo + k*STEP; find those inside the chunk
    first = src_lo + ((max(c_lo, src_lo) - src_lo + STEP - 1) // STEP) * STEP
    last = min(src_hi, c_hi - 1)
    if first > last:
        return np.empty(0, np.int64)
    return np.arange(first, last + 1, STEP, dtype=np.int64)


def missing_chunk_rows(
    bounds: dict[str, tuple[int, int]],
    present: set[tuple[str, int]],
    salt_span: int,
) -> pd.DataFrame:
    """All-gap 1m rows for chunks no group will emit (no real AND no ghost
    rows)."""
    frames = []
    for source, (lo, hi) in bounds.items():
        for salt in range(lo // salt_span, hi // salt_span + 1):
            if (source, salt) in present:
                continue
            grid = chunk_grid_slice(lo, hi, salt * salt_span, (salt + 1) * salt_span)
            if grid.size:
                frames.append(_all_gap_frame(source, grid))
    if not frames:
        return pd.DataFrame(columns=TIER_COLUMNS)
    return pd.concat(frames, ignore_index=True)


def make_salted_fill_fn(
    cfg: FillConfig,
    salt_span: int,
    bounds_ref,
    retention: RetentionConfig | None = None,
    *,
    margin_buckets: int = 1,
):
    """map_groups fn over (source, salt) chunks emitting 1m tier rows."""

    lut = np.array(
        [gapfill.METHOD_NAMES[c] for c in range(len(gapfill.METHOD_NAMES))],
        dtype=object,
    )

    def apply_retention(df: pd.DataFrame) -> pd.DataFrame:
        if retention is not None:
            r_lo, r_hi = retention.bounds("1m")
            if r_lo is not None:
                df = df[df["bucket_ts"] >= r_lo]
            if r_hi is not None:
                df = df[df["bucket_ts"] < r_hi]
        return df

    def fill_chunk(g: pd.DataFrame) -> pd.DataFrame:
        if g["source"].nunique() != 1:  # skey hash collision: split
            return pd.concat(
                [fill_chunk(sub) for _, sub in g.groupby("source", sort=True)],
                ignore_index=True,
            )
        source = g["source"].iloc[0]
        salt = int(g["salt"].iloc[0])
        bounds = bounds_ref if isinstance(bounds_ref, dict) else ray.get(bounds_ref)
        src_lo, src_hi = bounds[source]
        c_lo, c_hi = salt * salt_span, (salt + 1) * salt_span

        in_chunk_grid = chunk_grid_slice(src_lo, src_hi, c_lo, c_hi)
        if in_chunk_grid.size == 0:  # chunk outside the source's span
            return pd.DataFrame(columns=TIER_COLUMNS)
        if not (~g["ghost"]).any():  # pure-ghost group: all-gap slice
            return apply_retention(_all_gap_frame(source, in_chunk_grid))

        observed = combine_partials(g.drop(columns=["salt", "ghost"], errors="ignore"))
        ts = observed["bucket_ts"].to_numpy(np.int64)
        # Kernel window: the chunk slice ALWAYS extended by the full ghost
        # margin (as NaNs where no ghost rows exist), clipped to the source's
        # global grid. The unconditional extension is what makes edge runs
        # exact: a run longer than max_gap that crosses the chunk edge shows
        # >= margin visible NaNs and is correctly left unfilled, while a
        # window clipped at the global bounds reproduces the true
        # leading/trailing-run semantics of the per-source pass.
        lo = max(src_lo, int(in_chunk_grid[0]) - margin_buckets * STEP)
        hi = min(src_hi, int(in_chunk_grid[-1]) + margin_buckets * STEP)
        lo = min(lo, int(ts.min()))
        hi = max(hi, int(ts.max()))
        grid = np.arange(lo, hi + STEP, STEP, dtype=np.int64)
        n = grid.size
        pos = (ts - lo) // STEP
        count = np.zeros(n, np.int64)
        y = np.full(n, np.nan)
        mn = np.full(n, np.nan)
        mx = np.full(n, np.nan)
        count[pos] = observed["count"].to_numpy(np.int64)
        y[pos] = observed["sum"].to_numpy(np.float64)
        mn[pos] = observed["min"].to_numpy(np.float64)
        mx[pos] = observed["max"].to_numpy(np.float64)

        value, codes = apply_fill(y, grid, cfg)
        filled = codes != 0
        rounded = np.round(value[filled])
        s = y.copy()
        s[filled] = rounded
        mn[filled] = rounded
        mx[filled] = rounded
        fm = lut[codes]
        fm[(count == 0) & ~filled] = "none"
        df = pd.DataFrame(
            {
                "source": np.full(n, source, dtype=object),
                "tier": np.full(n, "1m", dtype=object),
                "bucket_ts": grid,
                "count": count,
                "sum": s,
                "min": mn,
                "max": mx,
                "value": value,
                "filled": filled,
                "fill_method": fm,
            }
        )
        df = df[(df["bucket_ts"] >= c_lo) & (df["bucket_ts"] < c_hi)]
        return apply_retention(df)

    return fill_chunk
