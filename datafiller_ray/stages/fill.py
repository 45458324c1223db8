"""Per-source tier cascade + grid densification + gap fill.

Runs inside ``ds.groupby("source").map_groups(fn, batch_format="pandas")`` —
the ONE wide shuffle in the rollup pipeline, and it moves only the partial
aggregate rows (one per (source, minute, input-block)), never the token
payload.

Per source the fn:

1. final-combines the partials (count=Σcount, sum=Σsum, min=min, max=max —
   the exact algebra the reference uses to merge per-block accumulators,
   ``multivariate/_numba_utils.py:43-66``);
2. cascades 1m -> 1h -> 1d from OBSERVED rows only (sum-of-sums /
   min-of-mins, exact; SURVEY.md §2.9);
3. densifies each tier to its full regular grid between the source's first
   and last observed bucket — the engine analogue of ``_regularize_index``
   (``timeseries/imputer.py:215-223``): missing buckets become null rows to
   impute;
4. applies the configured gap-fill kernel to the per-bucket ``sum`` series,
   then the terminal fallback (``_apply_fallback`` semantics).

Filled buckets get ``sum/min/max = round(value)`` (the reference rounds
imputed values for integer columns and casts back,
``multivariate/imputer.py:344-354``); observed buckets pass through
bit-exact (``tests/test_multivariate.py:522-531`` pins the same invariant in
the reference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datafiller_ray.config import FillConfig, RetentionConfig, TIER_STEPS
from datafiller_ray.functions import gapfill
from datafiller_ray.functions.features import fill_model

TIER_COLUMNS = [
    "source",
    "tier",
    "bucket_ts",
    "count",
    "sum",
    "min",
    "max",
    "value",
    "filled",
    "fill_method",
]


def _reduce_sorted(
    keys: np.ndarray, count: np.ndarray, s: np.ndarray, mn: np.ndarray, mx: np.ndarray
) -> pd.DataFrame:
    """Grouped (sum, sum, min, max) over a SORTED key column via reduceat —
    the same partial-combine algebra as the reference's per-block
    accumulators (multivariate/_numba_utils.py:43-66), in O(n)."""
    bounds = np.flatnonzero(np.diff(keys)) + 1
    starts = np.concatenate([[0], bounds])
    return pd.DataFrame(
        {
            "bucket_ts": keys[starts],
            "count": np.add.reduceat(count, starts),
            "sum": np.add.reduceat(s, starts),
            "min": np.minimum.reduceat(mn, starts),
            "max": np.maximum.reduceat(mx, starts),
        }
    )


def combine_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Final combine of per-batch partial aggregates for one source."""
    ts = g["bucket_ts"].to_numpy(np.int64)
    order = np.argsort(ts, kind="stable")
    return _reduce_sorted(
        ts[order],
        g["count"].to_numpy(np.int64)[order],
        g["sum"].to_numpy(np.int64)[order],
        g["min"].to_numpy(np.int64)[order],
        g["max"].to_numpy(np.int64)[order],
    )


def cascade_tier(observed_1m: pd.DataFrame, step: int) -> pd.DataFrame:
    """Exact combine of 1m observed rows into a coarser tier (input sorted)."""
    if step == 60:
        return observed_1m
    ts = observed_1m["bucket_ts"].to_numpy(np.int64)
    return _reduce_sorted(
        ts - ts % step,
        observed_1m["count"].to_numpy(np.int64),
        observed_1m["sum"].to_numpy(np.int64),
        observed_1m["min"].to_numpy(np.int64),
        observed_1m["max"].to_numpy(np.int64),
    )


def apply_fill(
    y: np.ndarray, bucket_ts: np.ndarray, cfg: FillConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Dispatch the configured kernel + terminal fallback; returns
    (filled values, method codes)."""
    if cfg.strategy == "locf":
        out, codes = gapfill.fill_locf(y, cfg.max_gap)
    elif cfg.strategy == "nearest":
        out, codes = gapfill.fill_nearest(y, cfg.max_gap)
    elif cfg.strategy == "bfill":
        out, codes = gapfill.fill_bfill(y, cfg.max_gap)
    elif cfg.strategy == "linear":
        out, codes = gapfill.fill_linear(y, cfg.max_gap)
    elif cfg.strategy == "spline":
        out, codes = gapfill.fill_spline(
            y, cfg.max_gap, window=cfg.spline_window,
            knot_radius=cfg.spline_knot_radius,
        )
    elif cfg.strategy == "mean":
        out, codes = gapfill.fill_mean(y)
    elif cfg.strategy == "seasonal":
        out, codes = gapfill.fill_seasonal(y, bucket_ts, cfg.max_gap)
    elif cfg.strategy == "model":
        out, codes = fill_model(
            y,
            bucket_ts,
            lags=cfg.lags,
            alpha=cfg.alpha,
            min_samples_train=cfg.min_samples_train,
            max_gap=cfg.max_gap,
            estimator=cfg.estimator,
            use_optimask=cfg.optimask,
        )
    else:  # None: pure rollup
        out, codes = y.astype(np.float64, copy=True), np.zeros(y.size, np.int8)
    if cfg.fallback == "simple":
        # reference _apply_fallback (multivariate/imputer.py:745-770): the
        # fallback mean is over the ORIGINAL observed cells only — kernel-
        # imputed values must not shift it (matches impute_matrix and the
        # distributed model path's rec["mus"])
        still = np.isnan(out)
        obs = y[~np.isnan(y)]
        if still.any() and obs.size:
            out[still] = obs.mean()
            codes = np.where(still, np.int8(gapfill.METHOD_CODES["mean"]), codes)
    return out, codes


def densify_and_fill(
    observed: pd.DataFrame, source: str, tier: str, step: int, cfg: FillConfig
) -> pd.DataFrame:
    """Densify one tier of one source to its regular grid and gap-fill."""
    ts = observed["bucket_ts"].to_numpy(np.int64)
    lo, hi = ts[0], ts[-1]
    grid = np.arange(lo, hi + step, step, dtype=np.int64)
    n = grid.size
    pos = (ts - lo) // step

    count = np.zeros(n, dtype=np.int64)
    count[pos] = observed["count"].to_numpy(np.int64)
    y = np.full(n, np.nan)
    y[pos] = observed["sum"].to_numpy(np.float64)
    mn = np.full(n, np.nan)
    mn[pos] = observed["min"].to_numpy(np.float64)
    mx = np.full(n, np.nan)
    mx[pos] = observed["max"].to_numpy(np.float64)

    value, codes = apply_fill(y, grid, cfg)
    filled = codes != 0
    rounded = np.round(value[filled])
    s = y.copy()
    s[filled] = rounded
    mn[filled] = rounded
    mx[filled] = rounded

    lut = np.array(
        [gapfill.METHOD_NAMES[c] for c in range(len(gapfill.METHOD_NAMES))],
        dtype=object,
    )
    fill_method = lut[codes]
    gap_unfilled = (count == 0) & ~filled  # unfilled gap buckets
    fill_method[gap_unfilled] = "none"

    return pd.DataFrame(
        {
            "source": np.full(n, source, dtype=object),
            "tier": np.full(n, tier, dtype=object),
            "bucket_ts": grid,
            "count": count,
            "sum": s,
            "min": mn,
            "max": mx,
            "value": value,
            "filled": filled,
            "fill_method": fill_method,
        }
    )


def make_fill_group_fn(
    cfg: FillConfig,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    retention: RetentionConfig | None = None,
    emit: str = "rows",
):
    """Build the map_groups fn. ``emit="rows"`` yields tier rows;
    ``emit="blobs"`` Gorilla-encodes each (source, tier) chunk in place
    (same shuffle, different sink shape)."""
    # tiers may be names from TIER_STEPS or a {name: step_seconds} mapping
    # (custom steps, e.g. from infer_step)
    if isinstance(tiers, dict):
        steps = dict(tiers)
    else:
        steps = {t: TIER_STEPS[t] for t in tiers}

    def fill_one_source(g: pd.DataFrame, source: str) -> pd.DataFrame:
        observed_1m = combine_partials(g)
        outputs = []
        for tier, step in steps.items():
            observed = cascade_tier(observed_1m, step)
            tier_df = densify_and_fill(observed, source, tier, step, cfg)
            if retention is not None:
                lo, hi = retention.bounds(tier)
                if lo is not None:
                    tier_df = tier_df[tier_df["bucket_ts"] >= lo]
                if hi is not None:
                    tier_df = tier_df[tier_df["bucket_ts"] < hi]
            outputs.append(tier_df)
        return pd.concat(outputs, ignore_index=True)

    def fill_group(g: pd.DataFrame) -> pd.DataFrame:
        # groups are keyed by the int64 source hash (skey) for shuffle speed;
        # sub-group by the string so a hash collision cannot merge sources
        if g["source"].iloc[0] == g["source"].iloc[-1] and g["source"].nunique() == 1:
            result = fill_one_source(g, g["source"].iloc[0])
        else:
            result = pd.concat(
                [fill_one_source(sub, src) for src, sub in g.groupby("source", sort=True)],
                ignore_index=True,
            )
        if emit == "blobs":
            from datafiller_ray.stages.compress import encode_tier_chunks

            return encode_tier_chunks(result)
        return result

    return fill_group
