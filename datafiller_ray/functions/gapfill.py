"""Gap-fill kernels over a dense, regular, per-series grid.

All kernels take a float64 series ``y`` (NaN = gap bucket) positioned on a
regular grid and return ``(filled, method_codes)`` where ``method_codes`` is
an int8 array: 0 = observed / untouched, and a per-kernel positive code for
cells the kernel filled.

Semantics reproduce the reference exactly:

- ``fill_linear`` == ``interpolate_small_gaps``
  (``/root/reference/src/datafiller/timeseries/_utils.py:51-67``): pandas
  ``Series.interpolate()`` (linear over positions) restricted to NaN runs of
  length <= n. Pandas' default interpolate leaves leading NaN runs untouched
  and forward-fills trailing runs with the last observed value; both behaviors
  are reproduced (pinned by tests against a pandas oracle).
- ``fill_locf``: forward fill bounded by run length (engine strategy; the
  reference's LOCF analogue is interpolate with a one-sided limit).
- ``fill_mean``: per-series observed mean, the reference's ``fallback="simple"``
  (``/root/reference/src/datafiller/multivariate/imputer.py:744-770``).
- ``fill_spline``: local natural cubic spline through up to ``window`` observed
  knots on each side of the gap (scipy-free; deterministic).

Method codes: 1=locf, 2=linear, 3=spline, 4=mean, 5=model, 6=seasonal,
7=nearest, 8=bfill.
"""

from __future__ import annotations

import numpy as np

METHOD_NAMES = {
    0: "observed",
    1: "locf",
    2: "linear",
    3: "spline",
    4: "mean",
    5: "model",
    6: "seasonal",
    7: "nearest",
    8: "bfill",
}
METHOD_CODES = {v: k for k, v in METHOD_NAMES.items()}


def nan_runs(isnan: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run-length encode the NaN mask.

    Returns ``(starts, lengths, run_id)`` for the NaN runs only. ``run_id`` is
    an int64 array aligned with the series: -1 on observed cells, else the
    index into ``starts``/``lengths``. Vectorized via the diff-of-mask trick
    (the reference uses the equivalent ``(isna != isna.shift()).cumsum()``,
    ``timeseries/_utils.py:64-66``).
    """
    n = isnan.size
    if n == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(isnan[1:], isnan[:-1], out=change[1:])
    starts_all = np.flatnonzero(change)
    lengths_all = np.diff(np.append(starts_all, n))
    is_nan_run = isnan[starts_all]
    starts = starts_all[is_nan_run]
    lengths = lengths_all[is_nan_run]
    run_id = np.full(n, -1, dtype=np.int64)
    seg = np.cumsum(change) - 1  # segment index per cell
    nan_seg_to_run = np.full(starts_all.size, -1, dtype=np.int64)
    nan_seg_to_run[is_nan_run] = np.arange(starts.size)
    run_id = nan_seg_to_run[seg]
    return starts, lengths, run_id


def _eligible_mask(
    y: np.ndarray, max_gap: int | None, *, allow_leading: bool = False
) -> np.ndarray:
    """Boolean mask of NaN cells eligible for filling: run length <= max_gap
    (None = unbounded) and, unless ``allow_leading``, not in the leading run
    (no left neighbor to anchor on — pandas interpolate leaves it NaN)."""
    isnan = np.isnan(y)
    starts, lengths, run_id = nan_runs(isnan)
    if starts.size == 0:
        return np.zeros(y.size, dtype=bool)
    ok = np.ones(starts.size, dtype=bool)
    if max_gap is not None:
        ok &= lengths <= max_gap
    if not allow_leading and starts.size and starts[0] == 0:
        ok[0] = False
    eligible = np.zeros(y.size, dtype=bool)
    sel = run_id >= 0
    eligible[sel] = ok[run_id[sel]]
    return eligible


def fill_locf(
    y: np.ndarray, max_gap: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Forward-fill NaN runs of length <= max_gap with the last observed value."""
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap)
    if not eligible.any():
        return out, codes
    isnan = np.isnan(y)
    idx = np.arange(y.size)
    last_obs = np.where(~isnan, idx, -1)
    np.maximum.accumulate(last_obs, out=last_obs)
    fill_at = eligible & (last_obs >= 0)
    out[fill_at] = y[last_obs[fill_at]]
    codes[fill_at] = METHOD_CODES["locf"]
    return out, codes


def fill_nearest(
    y: np.ndarray, max_gap: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Fill NaN runs of length <= max_gap with the NEAREST observed value
    (grid distance; equidistant cells take the LEFT neighbor, the
    ``scipy.interpolate.interp1d(kind="nearest")`` tie rule). Leading runs
    stay NaN (no left anchor — same edge contract as ``fill_linear``);
    trailing runs clamp to the last observed value."""
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap)
    if not eligible.any():
        return out, codes
    isnan = np.isnan(y)
    idx = np.arange(y.size)
    prev = np.where(~isnan, idx, -1)
    np.maximum.accumulate(prev, out=prev)
    nxt = np.where(~isnan, idx, y.size)
    nxt = np.minimum.accumulate(nxt[::-1])[::-1]
    fill_at = eligible & (prev >= 0)
    use_next = fill_at & (nxt < y.size) & ((idx - prev) > (nxt - idx))
    pick = np.where(use_next, nxt, prev)
    out[fill_at] = y[pick[fill_at]]
    codes[fill_at] = METHOD_CODES["nearest"]
    return out, codes


def fill_bfill(
    y: np.ndarray, max_gap: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Backward-fill NaN runs of length <= max_gap with the NEXT observed
    value — the mirror of ``fill_locf``. Leading runs ARE fillable (their
    anchor is the next observation); trailing runs stay NaN (no right
    anchor, the terminal fallback handles them)."""
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap, allow_leading=True)
    if not eligible.any():
        return out, codes
    isnan = np.isnan(y)
    nxt = np.where(~isnan, np.arange(y.size), y.size)
    nxt = np.minimum.accumulate(nxt[::-1])[::-1]
    fill_at = eligible & (nxt < y.size)
    out[fill_at] = y[nxt[fill_at]]
    codes[fill_at] = METHOD_CODES["bfill"]
    return out, codes


def fill_linear(
    y: np.ndarray, max_gap: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Bounded linear interpolation == ``interpolate_small_gaps(series, n)``.

    ``np.interp`` over positions reproduces pandas ``Series.interpolate()``
    on interior gaps and its edge behavior on trailing gaps (clamped to the
    last observed value); leading gaps are masked out to match pandas.
    """
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap)
    if not eligible.any():
        return out, codes
    obs = ~np.isnan(y)
    if obs.sum() == 0:
        return out, codes
    x = np.arange(y.size, dtype=np.float64)
    interp = np.interp(x[eligible], x[obs], y[obs])
    out[eligible] = interp
    codes[eligible] = METHOD_CODES["linear"]
    return out, codes


def fill_mean(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Fill every remaining NaN with the mean of observed values
    (reference ``_apply_fallback``, ``multivariate/imputer.py:744-770``)."""
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    isnan = np.isnan(y)
    if isnan.all() or not isnan.any():
        return out, codes
    mean = np.nanmean(y)
    out[isnan] = mean
    codes[isnan] = METHOD_CODES["mean"]
    return out, codes


def fill_seasonal(
    y: np.ndarray,
    bucket_ts: np.ndarray,
    max_gap: int | None = None,
    slot_seconds: int = 3600,
) -> tuple[np.ndarray, np.ndarray]:
    """Fill NaN runs (of length <= max_gap) with the series' own
    hour-of-day mean: slot = (bucket_ts % 86400) // slot_seconds, fill =
    mean of OBSERVED values in that slot — the seasonal imputation that
    LOCF/linear can't express (a 3am gap gets the 3am level, not a bridge
    from 11pm to 6am). Slot sums accumulate integer-valued float64
    (exact while < 2^53, the engine-wide bound); the only float per slot
    is the single sum/count division. Slots with no observed value leave
    their gaps NaN (the terminal fallback handles them). On a tier
    coarser than a day every bucket lands in slot 0 and the kernel
    degrades to the observed mean."""
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap)
    obs = ~np.isnan(y)
    if not eligible.any() or not obs.any():
        return out, codes
    slot = ((bucket_ts % 86400) // slot_seconds).astype(np.int64)
    nslots = max(int(86400 // slot_seconds), 1)
    ssum = np.zeros(nslots, dtype=np.float64)
    scnt = np.zeros(nslots, dtype=np.int64)
    np.add.at(ssum, slot[obs], y[obs])
    np.add.at(scnt, slot[obs], 1)
    can = eligible & (scnt[slot] > 0)
    out[can] = ssum[slot[can]] / scnt[slot[can]]
    codes[can] = METHOD_CODES["seasonal"]
    return out, codes


def _natural_cubic_second_derivs(xk: np.ndarray, yk: np.ndarray) -> np.ndarray:
    """Second derivatives of the natural cubic spline through (xk, yk).

    Thomas-algorithm tridiagonal solve; knot windows are small (local spline)
    so the O(n) Python-free formulation uses numpy slices with a short scalar
    recurrence (window <= ~17 knots, cost negligible per gap run).
    """
    n = xk.size
    m = np.zeros(n, dtype=np.float64)
    if n < 3:
        return m
    h = np.diff(xk)
    # Tridiagonal system for interior knots 1..n-2
    a = h[:-1]  # sub-diagonal
    b = 2.0 * (h[:-1] + h[1:])  # diagonal
    c = h[1:]  # super-diagonal
    d = 6.0 * ((yk[2:] - yk[1:-1]) / h[1:] - (yk[1:-1] - yk[:-2]) / h[:-1])
    k = n - 2
    cp = np.empty(k)
    dp = np.empty(k)
    cp[0] = c[0] / b[0]
    dp[0] = d[0] / b[0]
    for i in range(1, k):
        denom = b[i] - a[i] * cp[i - 1]
        cp[i] = c[i] / denom
        dp[i] = (d[i] - a[i] * dp[i - 1]) / denom
    sol = np.empty(k)
    sol[-1] = dp[-1]
    for i in range(k - 2, -1, -1):
        sol[i] = dp[i] - cp[i] * sol[i + 1]
    m[1:-1] = sol
    return m


def _spline_eval(
    xk: np.ndarray, yk: np.ndarray, m: np.ndarray, x: np.ndarray
) -> np.ndarray:
    """Evaluate the cubic spline with knot second-derivatives ``m`` at ``x``."""
    i = np.clip(np.searchsorted(xk, x) - 1, 0, xk.size - 2)
    h = xk[i + 1] - xk[i]
    t = (x - xk[i]) / h
    a = (xk[i + 1] - x) / h
    return (
        a * yk[i]
        + t * yk[i + 1]
        + ((a**3 - a) * m[i] + (t**3 - t) * m[i + 1]) * h * h / 6.0
    )


def fill_spline(
    y: np.ndarray,
    max_gap: int | None = None,
    window: int = 8,
    knot_radius: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Local natural cubic spline fill, bounded like ``fill_linear``.

    For each eligible interior NaN run, fit a natural cubic spline through up
    to ``window`` observed knots on each side and evaluate at the gap
    positions. Trailing runs take the last observed value (matching the
    linear kernel's pandas-compatible edge rule). Interior runs with fewer
    than 3 total knots degrade to linear interpolation.

    ``knot_radius`` bounds the knot search to observed points within that
    many grid positions of the run's edges — required for the salted
    (chunked) path, whose ghost margin must cover every value the kernel can
    read (margin = max_gap + knot_radius + 1).
    """
    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap)
    if not eligible.any():
        return out, codes
    obs_idx = np.flatnonzero(~np.isnan(y))
    if obs_idx.size == 0:
        return out, codes
    isnan = np.isnan(y)
    starts, lengths, run_id = nan_runs(isnan)
    x = np.arange(y.size, dtype=np.float64)
    for r in range(starts.size):
        s, ln = int(starts[r]), int(lengths[r])
        if not eligible[s]:
            continue
        gap = np.arange(s, s + ln)
        # knots strictly before / after the run (searchsorted, not a scan —
        # a linear scan per run makes the kernel quadratic on long series)
        cut = np.searchsorted(obs_idx, s)
        lo_cut = max(0, cut - window)
        hi_cut = cut + window
        if knot_radius is not None:
            lo_cut = max(lo_cut, np.searchsorted(obs_idx, s - knot_radius))
            hi_cut = min(hi_cut, np.searchsorted(obs_idx, s + ln + knot_radius, side="right"))
        before = obs_idx[lo_cut:cut]
        after = obs_idx[cut:hi_cut]
        if after.size == 0:
            # trailing run: clamp to last observed (pandas interpolate rule);
            # an empty knot window (tiny knot_radius) leaves the run unfilled
            if before.size:
                out[gap] = y[before[-1]]
                codes[gap] = METHOD_CODES["spline"]
            continue
        knots = np.concatenate([before, after])
        if knots.size < 3:
            out[gap] = np.interp(gap.astype(np.float64), x[knots], y[knots])
        else:
            xk = knots.astype(np.float64)
            yk = y[knots]
            m = _natural_cubic_second_derivs(xk, yk)
            out[gap] = _spline_eval(xk, yk, m, gap.astype(np.float64))
        codes[gap] = METHOD_CODES["spline"]
    return out, codes
