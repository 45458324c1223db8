"""Feature construction + model-based gap fill for one series.

Reproduces the reference's univariate time-series model path:

- lag matrix: ``build_lag_matrix`` (``timeseries/_utils.py:8-48``) — columns
  ``[y, y.shift(l1), ..., y.shift(lk), time_features]``; out-of-range shifted
  positions are NaN.
- calendar features: ``_make_time_features`` (``timeseries/imputer.py:226-256``)
  — normalized trend + day/week sin/cos, float32.
- training path: group imputable rows by their observed-feature pattern
  (``multivariate/imputer.py:552-553``), train one ridge per pattern on rows
  complete on that pattern's features, threshold ``min_samples_train=20``
  (``imputer.py:164``); standardize columns on observed stats and rescale
  predictions (``imputer.py:421-451, 900-915``). Optimask rectangle search is
  intentionally not ported (SURVEY.md §7 "what's hard") — under-threshold
  patterns fall through to the terminal fallback.
"""

from __future__ import annotations

import numpy as np

from datafiller_ray.functions.gapfill import METHOD_CODES, _eligible_mask


def make_time_features(
    bucket_ts: np.ndarray,
    trend_t0: int | None = None,
    trend_t1: int | None = None,
) -> np.ndarray:
    """Calendar features from epoch-second bucket timestamps.

    Matches ``_make_time_features`` (``timeseries/imputer.py:226-256``):
    trend in [0,1], day sin/cos from hour-of-day (minute-resolved), week
    sin/cos from day-of-week; float32. Epoch seconds are UTC; day-of-week of
    the epoch (1970-01-01) is Thursday = 3 in pandas' Monday=0 convention.

    ``trend_t0``/``trend_t1`` pin the trend normalization to the SOURCE's
    global span — required when the series is processed in salted chunks so
    every chunk computes the same trend values as the whole-series pass.
    """
    ts = bucket_ts.astype(np.int64)
    n = ts.size
    t0 = int(ts[0]) if trend_t0 is None else trend_t0
    t1 = int(ts[-1]) if (trend_t1 is None and n) else (trend_t1 if trend_t1 is not None else 0)
    elapsed_days = (ts - t0) / 86400.0
    span_days = (t1 - t0) / 86400.0
    if n and span_days != 0:
        trend = (elapsed_days / span_days).astype(np.float32)
    else:
        trend = np.zeros(n, dtype=np.float32)
    secs_of_day = np.mod(ts, 86400)
    hour = (secs_of_day / 3600.0).astype(np.float32)
    day_angle = np.float32(2.0 * np.pi) * hour / np.float32(24.0)
    dow = (np.floor_divide(ts, 86400) + 3) % 7  # Monday=0 like pandas dayofweek
    week_angle = np.float32(2.0 * np.pi) * dow.astype(np.float32) / np.float32(7.0)
    return np.column_stack(
        [
            trend,
            np.sin(day_angle, dtype=np.float32),
            np.cos(day_angle, dtype=np.float32),
            np.sin(week_angle, dtype=np.float32),
            np.cos(week_angle, dtype=np.float32),
        ]
    ).astype(np.float32)


def build_lag_features(y: np.ndarray, lags: tuple[int, ...]) -> np.ndarray:
    """Shifted copies of ``y``: column t is ``y`` shifted by ``lags[t]``
    (positive = back in time, like the reference), out-of-range = NaN.

    Vectorized slicing instead of the reference's row-parallel Numba loop —
    Arrow/NumPy are columnar so the column-block layout is the fast one here.
    """
    n = y.size
    out = np.full((n, len(lags)), np.nan, dtype=np.float64)
    for t, lag in enumerate(lags):
        if lag >= 0:
            if lag < n:
                out[lag:, t] = y[: n - lag]
        else:
            k = -lag
            if k < n:
                out[: n - k, t] = y[k:]
    return out


def fill_model(
    y: np.ndarray,
    bucket_ts: np.ndarray,
    *,
    lags: tuple[int, ...] = (1, 2, 3, -1, -2, -3),
    alpha: float = 1e-2,
    min_samples_train: int = 20,
    max_gap: int | None = None,
    estimator: str | object = "ridge",
    use_optimask: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Model-based fill of NaN cells in ``y`` (see module docstring).

    Returns ``(filled, method_codes)``; cells whose pattern had fewer than
    ``min_samples_train`` complete training rows remain NaN (caller applies
    the fallback strategy).
    """
    from datafiller_ray.functions.ridge import FastRidge

    out = y.astype(np.float64, copy=True)
    codes = np.zeros(y.size, dtype=np.int8)
    eligible = _eligible_mask(y, max_gap, allow_leading=True)
    if not eligible.any():
        return out, codes

    lag_feats = build_lag_features(y, lags)
    time_feats = make_time_features(bucket_ts).astype(np.float64)
    X = np.concatenate([lag_feats, time_feats], axis=1)  # (n, L + 5)
    n_feats = X.shape[1]

    # Standardize on observed stats (reference `_standardization`,
    # multivariate/imputer.py:421-451): per-column mean/std over non-NaN cells.
    y_obs = ~np.isnan(y)
    y_mu = float(np.nanmean(y)) if y_obs.any() else 0.0
    y_sd = float(np.nanstd(y)) if y_obs.any() else 1.0
    if y_sd == 0.0 or not np.isfinite(y_sd):
        y_sd = 1.0
    mu = np.nanmean(X, axis=0)
    sd = np.nanstd(X, axis=0)
    mu = np.where(np.isfinite(mu), mu, 0.0)
    sd = np.where(np.isfinite(sd) & (sd > 0), sd, 1.0)
    Xs = (X - mu) / sd
    ys = (y - y_mu) / y_sd

    feat_obs = ~np.isnan(Xs)  # (n, n_feats)
    imputable = np.flatnonzero(eligible)
    # Bitmask per row of its observed-feature pattern (the reference packs
    # bool masks into uint64 words and tests subset membership bitwise,
    # multivariate/_gram.py:38-56, 301-346).
    bitpos = np.uint64(1) << np.arange(n_feats, dtype=np.uint64)
    masks = feat_obs @ bitpos  # (n,) uint64
    patt_keys = masks[imputable]
    trainable = np.flatnonzero(y_obs)
    if trainable.size == 0:
        return out, codes

    if estimator != "ridge":
        # generic fit/predict estimator per pattern — the reference's
        # ``regressor=`` hook (any object with fit/predict; "elm" builds the
        # reference's ExtremeLearningMachine). No Gram shortcut: the model
        # may be nonlinear.
        if estimator == "elm":
            from datafiller_ray.functions.elm import ExtremeLearningMachine

            est = ExtremeLearningMachine(alpha=alpha, seed=0)
        else:
            est = estimator
        train_masks_g = masks[trainable]
        for key in np.unique(patt_keys):
            rows = imputable[patt_keys == key]
            pattern = feat_obs[rows[0]]
            if not pattern.any():
                continue
            complete = (train_masks_g & key) == key
            train_rows = trainable[complete]
            if train_rows.size < min_samples_train:
                continue
            feats = np.flatnonzero(pattern)
            est.fit(Xs[np.ix_(train_rows, feats)], ys[train_rows])
            pred = np.asarray(est.predict(Xs[np.ix_(rows, feats)]), dtype=np.float64)
            out[rows] = pred * y_sd + y_mu
            codes[rows] = METHOD_CODES["model"]
        return out, codes

    # Per distinct trainable-row pattern, accumulate one Gram of the
    # augmented matrix Z = [X_std (unobserved zeroed), y_std, 1] — the
    # reference's group-Gram reuse (multivariate/_gram.py:80-118): the Gram
    # for a predict-pattern p is the SUM of group Grams over groups whose
    # mask covers p, sliced to p's columns. float64, mergeable across
    # blocks/chunks (the distributed-model-fill primitive).
    Xz = np.where(feat_obs, Xs, 0.0)
    Zt = np.column_stack(
        [Xz[trainable], ys[trainable], np.ones(trainable.size)]
    )  # (nt, k+2)
    train_masks = masks[trainable]
    uniq_masks, inv, group_counts = np.unique(
        train_masks, return_inverse=True, return_counts=True
    )
    k2 = n_feats + 2
    grams = np.zeros((uniq_masks.size, k2, k2))
    order = np.argsort(inv, kind="stable")
    bounds_idx = np.searchsorted(inv[order], np.arange(uniq_masks.size + 1))
    for gi in range(uniq_masks.size):
        Zg = Zt[order[bounds_idx[gi] : bounds_idx[gi + 1]]]
        grams[gi] = Zg.T @ Zg

    from datafiller_ray.functions.ridge import fit_ridge_from_gram

    for key in np.unique(patt_keys):
        rows = imputable[patt_keys == key]
        pattern = feat_obs[rows[0]]
        if not pattern.any():
            continue
        covering = (uniq_masks & key) == key
        n_train = int(group_counts[covering].sum())
        if n_train < min_samples_train:
            if not use_optimask:
                continue
            # complete rows -> optimask -> fallback (docs/algorithm.rst:22-32)
            from datafiller_ray.functions.optimask import optimask

            use0 = np.flatnonzero(pattern)
            sub_missing = ~feat_obs[np.ix_(trainable, use0)]
            r_keep, c_keep = optimask(sub_missing, min_rows=min_samples_train)
            if r_keep.size >= min_samples_train and c_keep.size > 0:
                tr = trainable[r_keep]
                uc = use0[c_keep]
                model = FastRidge(alpha=alpha, fit_intercept=True)
                model.fit(Xs[np.ix_(tr, uc)], ys[tr])
                pred = model.predict(Xs[np.ix_(rows, uc)]).astype(np.float64)
                out[rows] = pred * y_sd + y_mu
                codes[rows] = METHOD_CODES["model"]
            continue
        gram_full = grams[covering].sum(axis=0)
        feats = np.flatnonzero(pattern)
        idx = np.concatenate([feats, [n_feats, n_feats + 1]])
        gram_p = gram_full[np.ix_(idx, idx)]
        coef, intercept = fit_ridge_from_gram(gram_p, n_train, alpha)
        pred = Xs[np.ix_(rows, feats)] @ coef + intercept
        out[rows] = pred * y_sd + y_mu
        codes[rows] = METHOD_CODES["model"]
    return out, codes
