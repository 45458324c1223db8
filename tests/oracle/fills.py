"""Independent oracles for the iterative fill pipelines (model / spline /
kNN / categorical).

These back the driver-level ``oracle_sql()`` entries for the four queries
whose semantics no SQL engine can express (iterative solvers): the oracle
output is computed here at oracle-build time from the same parquet fixture
and served to DuckDB via ``read_parquet`` (the same literal-embedding
precedent as the LSH hyperplanes and minhash constants already in
``__ray_entry__.py``).

Independence policy (mirrors ``tests/oracle/reference.py``): everything is
re-derived from the *reference's documented semantics* — lag matrices via
``pandas.shift``, standardization via two-pass moments, ridge via
materialized centered normal equations (the engine solves from accumulated
Gram moments instead), spline second derivatives via a dense
``np.linalg.solve`` (the engine runs a Thomas recurrence), scoring via an
explicit masked-correlation formula. Two pieces necessarily match the
engine step-for-step and were pre-adjudicated as unavoidable algorithmic
matches, not copies (VERDICT round 2 "Copy-paste findings"): the optimask
pareto ordering (its tie-breaking is defined by ``np.argsort`` kinds —
``/root/reference/src/datafiller/_optimask.py:160-242``) and the float32
ridge normal equations (``estimators/ridge.py:42-111`` — canonical textbook
algebra the numerics are pinned to).

Float tolerance is absorbed by rounding both sides with the identical
``round_half_up`` formula; discrete outputs (labels, masks, row sets) must
match exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_up(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """floor(x*scale + 0.5)/scale — the only rounding that two engines can
    compute identically (np.round / DuckDB round() disagree within one ulp
    of half boundaries). The engine-side query projections use the same
    formula on their values."""
    return np.floor(x * scale + 0.5) / scale


# ---------------------------------------------------------------------------
# shared series plumbing


def minute_series(table, source_col: str = "source") -> dict[str, pd.DataFrame]:
    """(source -> dense minute frame with NaN gaps) from a fixture table,
    the pandas way (``doc_id`` ends in the 10-digit epoch minute)."""
    df = table
    if not isinstance(df, pd.DataFrame):
        df = table.select(["doc_id", "n_tok", source_col]).to_pandas()
    df = df.copy()
    df["ts"] = df["doc_id"].str[-10:].astype(np.int64) * 60
    agg = (
        df.groupby([source_col, "ts"])
        .agg(n_obs=("n_tok", "size"), total=("n_tok", "sum"))
        .reset_index()
    )
    out: dict[str, pd.DataFrame] = {}
    for src, g in agg.groupby(source_col, sort=True):
        g = g.sort_values("ts").set_index("ts")
        grid = np.arange(g.index[0], g.index[-1] + 60, 60, dtype=np.int64)
        g = g.reindex(grid)
        out[str(src)] = pd.DataFrame(
            {
                "bucket_ts": grid,
                "n_obs": g["n_obs"].fillna(0).astype(np.int64).to_numpy(),
                "y": g["total"].astype(np.float64).to_numpy(),
            }
        )
    return out


def _gap_runs(y: pd.Series) -> pd.DataFrame:
    """NaN runs of a series via the pandas diff-of-mask idiom
    (``reference timeseries/_utils.py:64-66``)."""
    is_nan = y.isna()
    seg = (is_nan != is_nan.shift()).cumsum()
    runs = []
    for _, idx in y.groupby(seg).groups.items():
        if is_nan.iloc[idx[0]]:
            runs.append((int(idx[0]), int(len(idx))))
    return pd.DataFrame(runs, columns=["start", "length"]) if runs else pd.DataFrame(
        columns=["start", "length"], dtype=np.int64
    )


# ---------------------------------------------------------------------------
# spline (dense formulation)


def _natural_cubic_dense(xk: np.ndarray, yk: np.ndarray) -> np.ndarray:
    """Second derivatives of the natural cubic spline through the knots,
    solved as one dense linear system (the engine runs a scalar Thomas
    recurrence instead — same math, different float path)."""
    n = xk.size
    m = np.zeros(n)
    if n < 3:
        return m
    h = np.diff(xk)
    k = n - 2
    A = np.zeros((k, k))
    rhs = np.zeros(k)
    for i in range(k):
        A[i, i] = 2.0 * (h[i] + h[i + 1])
        if i > 0:
            A[i, i - 1] = h[i]
        if i < k - 1:
            A[i, i + 1] = h[i + 1]
        rhs[i] = 6.0 * (
            (yk[i + 2] - yk[i + 1]) / h[i + 1] - (yk[i + 1] - yk[i]) / h[i]
        )
    m[1:-1] = np.linalg.solve(A, rhs)
    return m


def _cubic_eval(xk, yk, m, x):
    i = np.clip(np.searchsorted(xk, x) - 1, 0, xk.size - 2)
    h = xk[i + 1] - xk[i]
    t = (x - xk[i]) / h
    a = (xk[i + 1] - x) / h
    return (
        a * yk[i]
        + t * yk[i + 1]
        + ((a**3 - a) * m[i] + (t**3 - t) * m[i + 1]) * h * h / 6.0
    )


def spline_fill(y: np.ndarray, max_gap: int | None, window: int = 8) -> np.ndarray:
    """Local natural-cubic gap fill with the engine's contract: interior
    eligible runs (length <= max_gap, leading run never) take the spline
    through up to ``window`` observed knots per side; trailing eligible runs
    clamp to the last observed value; <3 knots degrade to linear."""
    out = y.astype(np.float64, copy=True)
    ser = pd.Series(y)
    runs = _gap_runs(ser)
    if runs.empty:
        return out
    obs = np.flatnonzero(~np.isnan(y))
    if obs.size == 0:
        return out
    for start, length in runs.itertuples(index=False):
        if start == 0:
            continue  # leading run is never filled
        if max_gap is not None and length > max_gap:
            continue
        gap = np.arange(start, start + length, dtype=np.int64)
        cut = int(np.searchsorted(obs, start))
        before = obs[max(0, cut - window) : cut]
        after = obs[cut : cut + window]
        if after.size == 0:
            out[gap] = y[before[-1]]
            continue
        knots = np.concatenate([before, after]).astype(np.float64)
        yk = y[knots.astype(np.int64)]
        xg = gap.astype(np.float64)
        if knots.size < 3:
            out[gap] = np.interp(xg, knots, yk)
        else:
            m = _natural_cubic_dense(knots, yk)
            out[gap] = _cubic_eval(knots, yk, m, xg)
    return out


# ---------------------------------------------------------------------------
# model fill (materialized centered ridge)


def _time_features(ts: np.ndarray) -> np.ndarray:
    """Reference calendar features (``timeseries/imputer.py:226-256``):
    float32 trend + day/week sin/cos. float32 is part of the reference
    contract, so the formulas run at that dtype here too."""
    ts = ts.astype(np.int64)
    t0, t1 = int(ts[0]), int(ts[-1])
    span = (t1 - t0) / 86400.0
    if span != 0:
        trend = (((ts - t0) / 86400.0) / span).astype(np.float32)
    else:
        trend = np.zeros(ts.size, dtype=np.float32)
    hour = ((ts % 86400) / 3600.0).astype(np.float32)
    day_angle = np.float32(2.0 * np.pi) * hour / np.float32(24.0)
    dow = ((ts // 86400) + 3) % 7
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


def _centered_ridge(A: np.ndarray, b: np.ndarray, alpha: float):
    """float64 ridge on materialized rows: center, normal equations, solve.
    (The engine derives the same moments from accumulated Grams.)"""
    xm = A.mean(axis=0)
    ym = b.mean()
    Ac = A - xm
    bc = b - ym
    normal = Ac.T @ Ac
    normal[np.diag_indices_from(normal)] += alpha
    coef = np.linalg.solve(normal, Ac.T @ bc)
    return coef, float(ym - xm @ coef)


def model_fill(
    y: np.ndarray,
    ts: np.ndarray,
    *,
    lags: tuple[int, ...] = (1, 2, 3, -1, -2, -3),
    alpha: float = 1e-2,
    min_samples_train: int = 20,
) -> np.ndarray:
    """Reference univariate model fill: lag matrix + calendar features,
    observed-stats standardization, per-observed-pattern ridge on complete
    training rows. Patterns under ``min_samples_train`` raise (the optimask
    fallback never fires on the fixture — asserted, so a future fixture
    change fails loudly instead of silently diverging)."""
    out = y.astype(np.float64, copy=True)
    nan_cells = np.isnan(y)
    if not nan_cells.any() or nan_cells.all():
        return out

    ser = pd.Series(y)
    lag_cols = {f"lag{l}": ser.shift(l) for l in lags}
    X = pd.DataFrame(lag_cols).to_numpy(np.float64)
    X = np.concatenate([X, _time_features(ts).astype(np.float64)], axis=1)

    y_mu = float(np.mean(ser.dropna()))
    y_sd = float(np.sqrt(np.mean((ser.dropna() - y_mu) ** 2)))
    if y_sd == 0.0 or not np.isfinite(y_sd):
        y_sd = 1.0
    mu = np.zeros(X.shape[1])
    sd = np.ones(X.shape[1])
    for j in range(X.shape[1]):
        col = X[:, j]
        seen = col[~np.isnan(col)]
        if seen.size:
            mu[j] = seen.mean()
            s = float(np.sqrt(np.mean((seen - mu[j]) ** 2)))
            if s > 0 and np.isfinite(s):
                sd[j] = s
    Xs = (X - mu) / sd
    ys = (y - y_mu) / y_sd

    feat_obs = ~np.isnan(Xs)
    trainable = np.flatnonzero(~np.isnan(y))
    gap_rows = np.flatnonzero(nan_cells)
    patterns: dict[bytes, list[int]] = {}
    for r in gap_rows:
        patterns.setdefault(feat_obs[r].tobytes(), []).append(int(r))
    for patt_bytes, rows in sorted(patterns.items()):
        pattern = np.frombuffer(patt_bytes, dtype=bool)
        if not pattern.any():
            continue
        feats = np.flatnonzero(pattern)
        complete = feat_obs[np.ix_(trainable, feats)].all(axis=1)
        train_rows = trainable[complete]
        if train_rows.size < min_samples_train:
            raise AssertionError(
                "model-fill oracle: pattern under min_samples_train — the "
                "optimask fallback path is live on this fixture; extend the "
                "oracle before trusting it"
            )
        coef, intercept = _centered_ridge(
            Xs[np.ix_(train_rows, feats)], ys[train_rows], alpha
        )
        pred = Xs[np.ix_(np.asarray(rows), feats)] @ coef + intercept
        out[np.asarray(rows)] = pred * y_sd + y_mu
    return out


# ---------------------------------------------------------------------------
# optimask + float32 ridge (adjudicated unavoidable matches — see module doc)


def oracle_optimask(missing: np.ndarray, min_rows: int = 1):
    """Largest NaN-free rectangle, reference ``_optimask.py:160-242``
    semantics. Tie-breaking is pinned to ``np.argsort`` kinds (quicksort
    first pass, stable after) — the one degree of freedom the algorithm
    does not define, so it cannot be re-derived differently."""
    m, n = missing.shape
    iy, ix = np.nonzero(missing)
    if iy.size == 0:
        return np.arange(m), np.arange(n)
    rows_nan, iyp = np.unique(iy, return_inverse=True)
    cols_nan, ixp = np.unique(ix, return_inverse=True)
    mr, nc = rows_nan.size, cols_nan.size

    def rank_histogram(keys, vals, k):
        h = np.zeros(k, dtype=np.int64)
        np.maximum.at(h, keys, vals + 1)
        return h

    hy = rank_histogram(iyp, ixp, mr)
    hx = rank_histogram(ixp, iyp, nc)
    p_rows, p_cols = np.arange(mr), np.arange(nc)
    ordered = False
    for step in range(16):
        kind = "stable" if step else "quicksort"
        if step % 2 == 0:
            p = np.argsort(-hy, kind=kind)
            rank = np.empty(mr, np.int64)
            rank[p] = np.arange(mr)
            iyp = rank[iyp]
            p_rows, hy = p_rows[p], hy[p]
            hx = rank_histogram(ixp, iyp, nc)
            ordered = bool((hx[:-1] >= hx[1:]).all()) if hx.size > 1 else True
        else:
            p = np.argsort(-hx, kind=kind)
            rank = np.empty(nc, np.int64)
            rank[p] = np.arange(nc)
            ixp = rank[ixp]
            p_cols, hx = p_cols[p], hx[p]
            hy = rank_histogram(iyp, ixp, mr)
            ordered = bool((hy[:-1] >= hy[1:]).all()) if hy.size > 1 else True
        if ordered:
            break
    if not ordered:
        raise AssertionError("optimask oracle: pareto ordering did not converge")

    heights = np.concatenate([hx, [0]]) if n > nc else hx
    rows_kept = m - heights
    areas = rows_kept * (n - np.arange(heights.size))
    i0 = None
    if min_rows > 1:
        feasible = np.where(rows_kept >= min_rows, areas, 0)
        if feasible.max() > 0:
            i0 = int(np.argmax(feasible))
    if i0 is None:
        i0 = int(np.argmax(areas))
    j0 = int(heights[i0])
    if areas[i0] == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    keep_rows = np.setdiff1d(np.arange(m), rows_nan[p_rows[:j0]])
    keep_cols = np.setdiff1d(np.arange(n), cols_nan[p_cols[:i0]])
    return keep_rows, keep_cols


def _f32_ridge_fit_predict(A, b, A_pred, alpha):
    """Reference float32 ridge (``estimators/ridge.py:42-111``): X'X − n·x̄x̄'
    normal equations at float32, alpha on the diagonal."""
    A = A.astype(np.float32)
    b = b.astype(np.float32)
    normal = A.T @ A
    rhs = A.T @ b
    col_mean = A.mean(axis=0)
    target_mean = b.mean()
    normal -= np.float32(A.shape[0]) * np.outer(col_mean, col_mean)
    rhs -= np.float32(A.shape[0]) * col_mean * target_mean
    normal.flat[:: normal.shape[0] + 1] += alpha
    coef = np.linalg.solve(normal, rhs)
    intercept = float(target_mean - col_mean @ coef)
    return (A_pred.astype(np.float32) @ coef + np.float32(intercept)).astype(
        np.float64
    )


# ---------------------------------------------------------------------------
# kNN panel fill (independent multivariate imputer)


def _panel_scores(x: np.ndarray) -> np.ndarray:
    """Reference feature scores (``multivariate/_scoring.py:62-77``):
    shared-observation fraction x |correlation of mean-imputed columns|,
    written as the explicit masked formula."""
    m, n = x.shape
    obs = ~np.isnan(x)
    counts = obs.sum(axis=0)
    means = np.array(
        [x[obs[:, j], j].mean() if counts[j] else 0.0 for j in range(n)]
    )
    z = np.where(obs, x - means, 0.0)
    std = np.sqrt((z * z).sum(axis=0) / m)
    std = np.where(counts == 0, np.nan, std)
    shared = obs.astype(np.float64).T @ obs.astype(np.float64)
    with np.errstate(all="ignore"):
        corr = (z.T @ z / m) / np.outer(std, std)
        return (shared / m) * np.abs(corr)


def knn_panel_fill(
    panel: np.ndarray,
    *,
    n_nearest_features: int | None,
    alpha: float = 1e-2,
    min_samples_train: int = 20,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference multivariate imputation of a (minutes x sources) panel:
    deterministic top-k neighbor selection, per-observed-pattern ridge on
    complete rows, optimask + float32 ridge under ``min_samples_train``.
    Returns (imputed, filled_mask)."""
    m, n = panel.shape
    obs = ~np.isnan(panel)
    counts = obs.sum(axis=0)
    means = np.array(
        [panel[obs[:, j], j].mean() if counts[j] else 0.0 for j in range(n)]
    )
    stds = np.empty(n)
    for j in range(n):
        if counts[j]:
            d = panel[obs[:, j], j] - means[j]
            stds[j] = np.sqrt((d * d).mean())
        else:
            stds[j] = 1.0
    stds = np.where((stds == 0) | ~np.isfinite(stds), 1.0, stds)
    xs = (panel - means) / stds

    nnf = (
        None
        if n_nearest_features is None
        else max(1, min(int(n_nearest_features), n))
    )
    scores = _panel_scores(panel) if nnf is not None else None

    out = panel.astype(np.float64, copy=True)
    filled = np.zeros_like(obs)
    for j in range(n):
        imputable = np.flatnonzero(~obs[:, j])
        if imputable.size == 0:
            continue
        cand = np.array([c for c in range(n) if c != j])
        if nnf is None:
            feats = cand
        else:
            fs = np.nan_to_num(scores[j][cand], nan=-np.inf)
            order = np.argsort(-fs, kind="stable")
            feats = np.sort(cand[order[: min(nnf, cand.size)]])
        if feats.size == 0:
            continue
        trainable = np.flatnonzero(obs[:, j])
        if trainable.size == 0:
            continue
        patt_groups: dict[bytes, list[int]] = {}
        for r in imputable:
            patt_groups.setdefault(obs[r, feats].tobytes(), []).append(int(r))
        train_obs = obs[np.ix_(trainable, feats)]
        for patt_bytes, rows_list in patt_groups.items():
            pattern = np.frombuffer(patt_bytes, dtype=bool)
            if not pattern.any():
                continue
            rows = np.asarray(rows_list)
            use = feats[pattern]
            complete = train_obs[:, pattern].all(axis=1)
            train_rows = trainable[complete]
            if train_rows.size >= min_samples_train:
                coef, intercept = _centered_ridge(
                    xs[np.ix_(train_rows, use)], xs[train_rows, j], alpha
                )
                pred = xs[np.ix_(rows, use)] @ coef + intercept
            else:
                sub_missing = ~obs[np.ix_(trainable, use)]
                r_keep, c_keep = oracle_optimask(
                    sub_missing, min_rows=min_samples_train
                )
                if r_keep.size < min_samples_train or c_keep.size == 0:
                    continue
                tr = trainable[r_keep]
                uc = use[c_keep]
                pred = _f32_ridge_fit_predict(
                    xs[np.ix_(tr, uc)], xs[tr, j], xs[np.ix_(rows, uc)], alpha
                )
            out[rows, j] = pred * stds[j] + means[j]
            filled[rows, j] = True
    return out, filled


# ---------------------------------------------------------------------------
# categorical label fill (depth-4 CART, the reference's default model shape)


def _cart_fit_predict(
    Xtr: np.ndarray,
    ytr: np.ndarray,
    Xpr: np.ndarray,
    max_depth: int = 4,
) -> np.ndarray:
    """Independent re-derivation of the engine's DOCUMENTED deterministic
    CART split rule (datafiller_ray/functions/cart.py module docstring):
    maximize the float64 expression S_L/n_L + S_R/n_R over midpoints of
    consecutive distinct sorted values, features in ascending order, strict
    ties-to-first; x <= thr goes left; leaves predict the majority class
    with ties to the smallest code. Implemented recursively over index
    arrays (the engine builds an explicit node tree)."""
    classes = np.unique(ytr)
    pred = np.empty(Xpr.shape[0], dtype=np.int64)

    def majority(rows: np.ndarray) -> int:
        vals, counts = np.unique(ytr[rows], return_counts=True)
        return int(vals[np.argmax(counts)])

    def grow(rows: np.ndarray, prows: np.ndarray, depth: int) -> None:
        if prows.size == 0:
            return
        if (
            depth >= max_depth
            or rows.size < 2
            or np.unique(ytr[rows]).size < 2
        ):
            pred[prows] = majority(rows)
            return
        best = None  # (score, feature, threshold)
        for f in range(Xtr.shape[1]):
            xv = np.sort(Xtr[rows, f], kind="stable")
            yv = ytr[rows][np.argsort(Xtr[rows, f], kind="stable")]
            cut = np.flatnonzero(xv[:-1] < xv[1:])
            if cut.size == 0:
                continue
            oh = (yv[:, None] == classes[None, :]).astype(np.int64)
            cs = oh.cumsum(axis=0)
            CL = cs[cut]
            nL = cut + 1
            CR = cs[-1][None, :] - CL
            nR = rows.size - nL
            score = (CL * CL).sum(axis=1) / nL + (CR * CR).sum(axis=1) / nR
            i = int(np.argmax(score))
            if best is None or score[i] > best[0]:
                best = (float(score[i]), f, (xv[cut[i]] + xv[cut[i] + 1]) / 2.0)
        if best is None:
            pred[prows] = majority(rows)
            return
        _, f, thr = best
        lt = Xtr[rows, f] <= thr
        lp = Xpr[prows, f] <= thr
        grow(rows[lt], prows[lp], depth + 1)
        grow(rows[~lt], prows[~lp], depth + 1)

    grow(np.arange(Xtr.shape[0]), np.arange(Xpr.shape[0]), 0)
    return pred


def lang_fill_labels(
    feats: pd.DataFrame,
    labels: pd.Series,
    masked: np.ndarray,
    *,
    min_samples_train: int = 5,
) -> np.ndarray:
    """Recover masked labels with the reference classifier path: a depth-4
    CART over RAW feature values (the reference's
    DecisionTreeClassifier(max_depth=4) default shape — it receives the
    unstandardized local matrix; raw values keep midpoint comparisons
    bit-reproducible, since independently-computed standardizations differ
    by ~1e-12 and the grid-valued stats land exactly on split midpoints),
    deterministic split rule re-derived in ``_cart_fit_predict``, fallback =
    most frequent observed code. Returns the filled label array (object
    dtype, None where unrecoverable)."""
    cats = sorted(pd.unique(labels[~masked].dropna()))
    code_of = {c: i for i, c in enumerate(cats)}
    X = feats.to_numpy(np.float64)

    train = np.flatnonzero(~masked)
    codes = labels.map(code_of).to_numpy()
    result = labels.astype(object).to_numpy().copy()
    if not cats:
        result[masked] = None
        return result
    train_codes = codes[train].astype(np.int64)
    if train.size >= min_samples_train:
        pred = _cart_fit_predict(X[train], train_codes, X[masked])
    else:
        vals, vc = np.unique(train_codes, return_counts=True)
        pred = np.full(int(masked.sum()), vals[np.argmax(vc)])
    result[np.flatnonzero(masked)] = [cats[int(c)] for c in pred]
    return result


def ewma_recursion(y: np.ndarray, alpha: float) -> np.ndarray:
    """Naive scalar unadjusted-EWMA recursion ``e_i = (1-a)*e_{i-1} + a*x_i``
    seeded with the first value — the operator's pinned definition. The
    engine computes the same recursion through pandas' C ewm kernel; this
    per-element float64 loop is the independent re-derivation."""
    out = np.empty(y.size, dtype=np.float64)
    if y.size == 0:
        return out
    b = 1.0 - alpha
    prev = float(y[0])
    out[0] = prev
    for i in range(1, y.size):
        prev = b * prev + alpha * float(y[i])
        out[i] = prev
    return out


def holt_recursion(y: np.ndarray, alpha: float):
    """Brown double-exponential smoothing, scalar re-derivation: two
    chained unadjusted-EWMA recursions (s1 over y, s2 over s1), then the
    pinned identities ``level = 2*s1 - s2``,
    ``trend = (alpha/(1-alpha)) * (s1 - s2)``, ``forecast = level + trend``
    — each evaluated per element in the SAME float64 op order the engine
    uses, so the comparison is bit-exact before the shared round6."""
    n = y.size
    level = np.empty(n, dtype=np.float64)
    trend = np.empty(n, dtype=np.float64)
    forecast = np.empty(n, dtype=np.float64)
    if n == 0:
        return level, trend, forecast
    b = 1.0 - alpha
    coef = alpha / (1.0 - alpha)
    s1 = float(y[0])
    s2 = s1
    level[0] = 2.0 * s1 - s2
    trend[0] = coef * (s1 - s2)
    forecast[0] = level[0] + trend[0]
    for i in range(1, n):
        s1 = b * s1 + alpha * float(y[i])
        s2 = b * s2 + alpha * s1
        level[i] = 2.0 * s1 - s2
        trend[i] = coef * (s1 - s2)
        forecast[i] = level[i] + trend[i]
    return level, trend, forecast


def lttb_select_loop(x: np.ndarray, y: np.ndarray, n_out: int) -> np.ndarray:
    """Per-point-loop LTTB (Steinarsson 2013) under the pinned arithmetic
    contract (integer bucket bounds ``1 + k*(n-2)//nb``; bucket means via
    ``np.sum``/count; area ``abs((ax-cx)*(yj-ay) - (ax-xj)*(cy-ay))``; ties
    keep the lowest index). The engine vectorizes the in-bucket argmax;
    this oracle walks points one by one."""
    n = x.size
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    nb = n_out - 2
    bounds = [1 + (k * (n - 2)) // nb for k in range(nb)] + [n - 1]
    out = [0]
    a = 0
    for k in range(nb):
        # bucket k = [bounds[k], bounds[k+1]); its "next" bucket is
        # [bounds[k+1], bounds[k+2]), or the lone final point for the last
        if k + 1 < nb:
            nlo, nhi = bounds[k + 1], bounds[k + 2]
        else:
            nlo, nhi = n - 1, n
        cnt = nhi - nlo
        cx = float(np.sum(x[nlo:nhi])) / cnt
        cy = float(np.sum(y[nlo:nhi])) / cnt
        ax, ay = float(x[a]), float(y[a])
        best_j, best_area = -1, -1.0
        for j in range(bounds[k], bounds[k + 1]):
            area = abs((ax - cx) * (float(y[j]) - ay) - (ax - float(x[j])) * (cy - ay))
            if area > best_area:
                best_area, best_j = area, j
        a = best_j
        out.append(a)
    out.append(n - 1)
    return np.asarray(out, dtype=np.int64)


def _splitmix64_scalar(x: int) -> int:
    """Public splitmix64 finalizer, scalar re-derivation (Steele et al.)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _string_hash64_scalar(s: str) -> int:
    """FNV-1a over the string's code points (the engine hashes the UTF-32
    view and skips NUL padding, which for real strings is exactly a
    per-character code-point fold), splitmix64-finalized."""
    h = 0xCBF29CE484222325
    for ch in s:
        h = ((h ^ ord(ch)) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return _splitmix64_scalar(h)


def hll_oracle_counts(
    keys: "np.ndarray", values: "np.ndarray", p: int = 12
) -> "pd.DataFrame":
    """Independent per-key HyperLogLog: scalar hash + per-element register
    loop under the pinned contract (index = top p bits; rank = 1-based
    first-one position of the remaining 64-p bits via integer bit_length;
    alpha_m m^2 / sum(2^-reg) with linear-counting small-range correction;
    floor(E + 0.5))."""
    m = 1 << p
    regs: dict[str, np.ndarray] = {}
    for k, v in zip(keys, values):
        h = _string_hash64_scalar(str(v))
        idx = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rank = (64 - p) - w.bit_length() + 1
        r = regs.setdefault(str(k), np.zeros(m, dtype=np.uint8))
        if rank > r[idx]:
            r[idx] = rank
    rows = []
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    for k in sorted(regs):
        r = regs[k]
        raw = alpha * m * m / float(np.sum(2.0 ** (-r.astype(np.float64))))
        zeros = int(np.count_nonzero(r == 0))
        if raw <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        else:
            est = raw
        rows.append((k, int(np.floor(est + 0.5))))
    return pd.DataFrame(rows, columns=["key", "approx_n"])


def bloom_absent_ids(
    history_vals: "np.ndarray",
    incoming_vals: "np.ndarray",
    m_bits: int = 1 << 20,
    k: int = 7,
) -> "np.ndarray":
    """Independent scalar Bloom filter under the pinned contract (double
    hashing pos_i = (low32 + i*(high32|1)) % m over the splitmix-finalized
    FNV string hash): returns a boolean keep-mask over ``incoming_vals``
    (True = definitely not in history, reproducing the engine's false
    positives bit-for-bit)."""
    bits = bytearray(m_bits // 8)
    for v in history_vals:
        h = _string_hash64_scalar(str(v))
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) | 1
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            bits[p >> 3] |= 1 << (p & 7)
    keep = np.empty(len(incoming_vals), dtype=bool)
    for j, v in enumerate(incoming_vals):
        h = _string_hash64_scalar(str(v))
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) | 1
        present = True
        for i in range(k):
            p = (h1 + i * h2) % m_bits
            if not (bits[p >> 3] >> (p & 7)) & 1:
                present = False
                break
        keep[j] = not present
    return keep


def pack_manifest_oracle(
    doc_ids: "np.ndarray",
    n_tok: "np.ndarray",
    sources: "np.ndarray",
    max_len: int,
) -> "pd.DataFrame":
    """Independent scalar greedy packer (ascending doc_id per source; a
    pack takes consecutive docs while the running total stays <= max_len;
    an oversize doc forms its own pack) — accumulation loop, no cumsum /
    searchsorted, reproducing the engine manifest bit-for-bit."""
    df = pd.DataFrame({"doc_id": doc_ids, "n_tok": n_tok, "source": sources})
    rows = []
    for src, g in df.groupby("source", sort=True):
        g = g.sort_values("doc_id", kind="stable")
        ids = g["doc_id"].tolist()
        toks = [int(t) for t in g["n_tok"]]
        pack_idx = 0
        i = 0
        while i < len(ids):
            total = toks[i]
            j = i + 1
            while j < len(ids) and total + toks[j] <= max_len:
                total += toks[j]
                j += 1
            if toks[i] > max_len:
                j = i + 1
                total = toks[i]
            rows.append(
                (
                    str(src),
                    pack_idx,
                    j - i,
                    total,
                    total > max_len,
                    float(np.floor(total / float(max_len) * 1e6 + 0.5) / 1e6),
                    ids[i],
                    ids[j - 1],
                )
            )
            pack_idx += 1
            i = j
        _ = pack_idx
    return pd.DataFrame(
        rows,
        columns=[
            "source", "pack_idx", "n_docs", "tok_filled", "oversize",
            "fill_ratio", "first_doc_id", "last_doc_id",
        ],
    )


def pack_tokens_oracle(
    doc_ids: "np.ndarray",
    tokens: "np.ndarray",
    sources: "np.ndarray",
    max_len: int,
) -> "pd.DataFrame":
    """Independent scalar packer that also materializes the blobs: per
    source in ascending doc_id order, greedily accumulate docs while the
    token total stays <= max_len, concatenating the token lists; each
    pack's blob is the little-endian int32 byte image of the
    concatenation."""
    df = pd.DataFrame({"doc_id": doc_ids, "tokens": tokens, "source": sources})
    rows = []
    for src, g in df.groupby("source", sort=True):
        g = g.sort_values("doc_id", kind="stable")
        toks = [np.asarray(t, dtype=np.int32) for t in g["tokens"]]
        pack_idx = 0
        i = 0
        while i < len(toks):
            total = int(toks[i].size)
            j = i + 1
            while j < len(toks) and total + toks[j].size <= max_len:
                total += int(toks[j].size)
                j += 1
            cat = (
                np.concatenate(toks[i:j])
                if total
                else np.empty(0, dtype=np.int32)
            )
            rows.append(
                (str(src), pack_idx, total, cat.astype("<i4").tobytes())
            )
            pack_idx += 1
            i = j
    return pd.DataFrame(
        rows, columns=["source", "pack_idx", "tok_filled", "tokens_blob"]
    )


def cusum_stats(y: np.ndarray, drift: float, min_points: int):
    """Scalar two-sided CUSUM statistics over one source's observed sums.

    Independent re-derivation of the operator's pinned definition:
    standardize by population mean/std from exact integer moments, then
    ``s_i = max(0, s_{i-1} + d_i)`` evaluated through the prefix identity
    ``s_i = p_i - min(0, min_{j<=i} p_j)`` with p accumulated sequentially
    (the same float op order as a sequential cumsum). Returns
    ``(s_up, s_dn)`` float64 arrays, or ``None`` when the series is too
    short or has no variance.
    """
    import math

    n = int(y.size)
    if n < min_points:
        return None
    S = 0
    Q = 0
    for v in y:
        iv = int(v)
        S += iv
        Q += iv * iv
    mean = S / n
    var = Q / n - mean * mean
    if not var > 0.0:
        return None
    std = math.sqrt(var)
    out = []
    for sign in (1.0, -1.0):
        p = 0.0
        m = 0.0
        s = np.empty(n, dtype=np.float64)
        for i in range(n):
            z = (float(y[i]) - mean) / std
            p += (sign * z if sign < 0 else z) - drift
            floored = p if p < 0.0 else 0.0
            if floored < m:
                m = floored
            s[i] = p - m
        out.append(s)
    return out[0], out[1]


def embedding_pca_frame(ids, M, n_components=2, scale_bits=16):
    """Independent PCA oracle: quantize to the 2^-scale_bits grid, exact
    Python-int Gram over the WHOLE matrix at once, pinned covariance
    C = (n*G - S S^T) / (n^2 * scale^2), eigh, top components by
    eigenvalue desc with sign fixed at the largest-|w| element (first
    index on ties), project (q/scale - mu) @ W, 6-dp floor-half-up."""
    import pandas as pd

    scale = float(1 << scale_bits)
    Qf = np.floor(np.asarray(M, dtype=np.float64) * scale + 0.5)
    Q = Qf.astype(object)  # arbitrary-precision integer arithmetic
    n, d = Q.shape
    S = Q.sum(axis=0)
    G = Q.T @ Q
    denom = float(n) * float(n) * scale * scale
    C = np.empty((d, d), dtype=np.float64)
    for i in range(d):
        for j in range(d):
            C[i, j] = float(n * G[i, j] - S[i] * S[j]) / denom
    evals, evecs = np.linalg.eigh(C)
    order = np.argsort(-evals, kind="stable")[:n_components]
    W = evecs[:, order].copy()
    for c in range(W.shape[1]):
        a = int(np.argmax(np.abs(W[:, c])))
        if W[a, c] < 0:
            W[:, c] = -W[:, c]
    mu = np.array([float(si) / (float(n) * scale) for si in S], dtype=np.float64)
    P = (Qf / scale - mu) @ W
    out = {"vec_id": np.asarray(ids, dtype=np.int64)}
    for c in range(n_components):
        out[f"pc{c + 1}"] = np.floor(P[:, c] * 1e6 + 0.5) / 1e6
    return pd.DataFrame(out)


def holt_winters_recursion(
    y: np.ndarray, m: int, alpha: float, beta: float, gamma: float
):
    """Additive Holt–Winters, scalar re-derivation of the operator's
    pinned definition: first-season-mean level (exact integer sum over m),
    season-over-season mean trend evaluated as one integer difference over
    m*m, first-season residual seasonals, then the classic three-recursion
    update with the one-step forecast emitted BEFORE the update sees y_t.
    Returns (forecast, level, trend) float64 arrays aligned to positions
    m..n-1, or None when n < 2*m."""
    n = int(y.size)
    if n < 2 * m:
        return None
    s0 = 0
    s1 = 0
    for i in range(m):
        s0 += int(y[i])
    for i in range(m, 2 * m):
        s1 += int(y[i])
    level = s0 / m
    trend = (s1 - s0) / (m * m)
    seasonal = [float(y[i]) - level for i in range(m)]
    fc = np.empty(n - m, dtype=np.float64)
    lv = np.empty(n - m, dtype=np.float64)
    tr = np.empty(n - m, dtype=np.float64)
    for t in range(m, n):
        j = t - (t // m) * m
        prior = level + trend
        fc[t - m] = prior + seasonal[j]
        yt = float(y[t])
        new_level = alpha * (yt - seasonal[j]) + (1.0 - alpha) * prior
        trend = beta * (new_level - level) + (1.0 - beta) * trend
        seasonal[j] = gamma * (yt - new_level) + (1.0 - gamma) * seasonal[j]
        level = new_level
        lv[t - m] = level
        tr[t - m] = trend
    return fc, lv, tr


def holt_damped_recursion(y: np.ndarray, alpha: float, beta: float, phi: float):
    """Damped-trend Holt (Gardner-McKenzie), scalar re-derivation of the
    operator's pinned definition: level = y_0, trend = y_1 - y_0 (exact
    integers), then per step the one-step forecast level + phi*trend is
    emitted BEFORE the update sees y_t, the level blends y_t against that
    forecast, and the trend is damped by phi inside the (1 - beta) term.
    Returns (forecast, level, trend) float64 arrays aligned to positions
    1..n-1, or None when n < 2."""
    n = int(y.size)
    if n < 2:
        return None
    level = float(int(y[0]))
    trend = float(int(y[1]) - int(y[0]))
    fc = np.empty(n - 1, dtype=np.float64)
    lv = np.empty(n - 1, dtype=np.float64)
    tr = np.empty(n - 1, dtype=np.float64)
    for t in range(1, n):
        prior = level + phi * trend
        fc[t - 1] = prior
        new_level = alpha * float(y[t]) + (1.0 - alpha) * prior
        trend = beta * (new_level - level) + (1.0 - beta) * (phi * trend)
        level = new_level
        lv[t - 1] = level
        tr[t - 1] = trend
    return fc, lv, tr


def km_curve(events_df, target_type="purchase"):
    """Kaplan-Meier oracle, independent per-user pandas derivation of the
    operator's documented semantics: per user, duration in floor-hours
    from first event to first target event (observed) or last event
    (censored); product-limit estimator with the standard tie convention,
    survival product in exact Fractions, one correctly-rounded float per
    curve row plus the 6-dp floor-half-up absorber."""
    from fractions import Fraction

    df = events_df.copy()
    df["us"] = df["ts"].astype("datetime64[us]").astype("int64")
    first = df.groupby("user_id")["us"].min()
    last = df.groupby("user_id")["us"].max()
    tgt = (
        df[df["event_type"] == target_type]
        .groupby("user_id")["us"]
        .min()
    )
    rows = []
    for uid in first.index:
        t0 = int(first[uid])
        if uid in tgt.index:
            rows.append(((int(tgt[uid]) - t0) // 3_600_000_000, True))
        else:
            rows.append(((int(last[uid]) - t0) // 3_600_000_000, False))
    out = {
        "dur_h": [],
        "n_risk": [],
        "n_events": [],
        "n_censored": [],
        "survival": [],
    }
    if not rows:
        return pd.DataFrame(out)
    times = sorted({t for t, _ in rows})
    s = Fraction(1)
    at_risk = len(rows)
    for t in times:
        d = sum(1 for tt, obs in rows if tt == t and obs)
        c = sum(1 for tt, obs in rows if tt == t and not obs)
        if d:
            s *= Fraction(at_risk - d, at_risk)
        out["dur_h"].append(t)
        out["n_risk"].append(at_risk)
        out["n_events"].append(d)
        out["n_censored"].append(c)
        out["survival"].append(
            float(np.floor(np.array([float(s)]) * 1e6 + 0.5)[0] / 1e6)
        )
        at_risk -= d + c
    res = pd.DataFrame(out)
    for col in ("dur_h", "n_risk", "n_events", "n_censored"):
        res[col] = res[col].astype(np.int64)
    res["survival"] = res["survival"].astype(np.float64)
    return res


def pagerank_exact(docs_tokens, k=20, n_iter=8, d=85):
    """Integer PageRank oracle over the bigram digraph, the pandas/global
    route (engine: per-batch multiplicity fold + distributed count
    exchange + per-iteration vocabulary folds): pack every adjacent pair
    of every document into one flat array, value_counts once, then run
    the documented integer recurrence

        S = 2**40, rank0 = S // n_active on active tokens
        share[a] = rank[a] // out_occ[a]
        teleport = (100-d)*S // (100*n_active)
        dang_share = d*dangling // (100*n_active)
        rank'[v] = teleport + dang_share + d*inflow[v] // 100

    and return the top-k (mass desc, token asc) as a DataFrame with
    columns (rank, token, pr_mass, out_occ)."""
    pairs = []
    for toks in docs_tokens:
        t = np.asarray(toks, dtype=np.int64)
        if t.size >= 2:
            pairs.append((t[:-1] << 32) | t[1:])
    cols = ["rank", "token", "pr_mass", "out_occ"]
    if not pairs:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    keys = np.concatenate(pairs)
    vc = pd.Series(keys).value_counts()
    kk = vc.index.to_numpy(np.int64)
    cc = vc.to_numpy(np.int64)
    a = kk >> 32
    b = kk & 0xFFFFFFFF
    nv = int(max(a.max(), b.max())) + 1
    out_occ = np.zeros(nv, dtype=np.int64)
    np.add.at(out_occ, a, cc)
    active = np.zeros(nv, dtype=bool)
    active[a] = True
    active[b] = True
    n_active = int(active.sum())
    S = 1 << 40
    rank = np.zeros(nv, dtype=np.int64)
    rank[active] = S // n_active
    teleport = ((100 - d) * S) // (100 * n_active)
    for _ in range(n_iter):
        share = np.zeros(nv, dtype=np.int64)
        m = out_occ > 0
        share[m] = rank[m] // out_occ[m]
        inflow = np.zeros(nv, dtype=np.int64)
        np.add.at(inflow, b, share[a] * cc)
        distributed = int((share[m] * out_occ[m]).sum())
        dangling = int(rank[active].sum()) - distributed
        dang_share = (d * dangling) // (100 * n_active)
        new_rank = np.zeros(nv, dtype=np.int64)
        new_rank[active] = teleport + dang_share + (d * inflow[active]) // 100
        rank = new_rank
    toks = np.flatnonzero(active)
    order = np.lexsort((toks, -rank[toks]))[:k]
    sel = toks[order]
    return pd.DataFrame(
        {
            "rank": np.arange(1, sel.size + 1, dtype=np.int64),
            "token": sel.astype(np.int64),
            "pr_mass": rank[sel],
            "out_occ": out_occ[sel],
        }
    )


def granger_f_exact(yv, av, bv):
    """Lag-1 Granger F oracle, independent residual-space derivation of
    the operator's documented semantics: orthogonalize the design columns
    with exact-rational Gram-Schmidt (Fractions), project y off the
    restricted span [1, A] and the unrestricted span [1, A, B], and form
    F = (RSS_r - RSS_u) * (n - 3) / RSS_u as a Fraction with ONE
    correctly-rounded float() at the end. Returns None on n < 4, a
    rank-deficient design, or a perfect unrestricted fit — the same
    omission rule the engine applies via Cramer determinants."""
    from fractions import Fraction

    n = len(yv)
    if n < 4:
        return None
    y = [Fraction(int(v)) for v in yv]

    def residual_ss(cols):
        basis = []
        for c in cols:
            v = [Fraction(int(x)) for x in c]
            for q in basis:
                qq = sum(t * t for t in q)
                coef = sum(a * b for a, b in zip(v, q)) / qq
                v = [a - coef * b for a, b in zip(v, q)]
            if sum(t * t for t in v) == 0:
                return None  # rank-deficient design
            basis.append(v)
        r = list(y)
        for q in basis:
            qq = sum(t * t for t in q)
            coef = sum(a * b for a, b in zip(r, q)) / qq
            r = [a - coef * b for a, b in zip(r, q)]
        return sum(t * t for t in r)

    ones = [1] * n
    rss_r = residual_ss([ones, av])
    rss_u = residual_ss([ones, av, bv])
    if rss_r is None or rss_u is None or rss_u <= 0:
        return None
    return float((rss_r - rss_u) * (n - 3) / rss_u)


def hourly_observed(fr, step=3600):
    """(hour_ts, hour_sum) int64 arrays of a minute_series frame's
    OBSERVED minutes aggregated to ``step`` buckets, the pandas way."""
    keep = fr["n_obs"].to_numpy() > 0
    ts = fr["bucket_ts"].to_numpy(np.int64)[keep]
    yv = fr["y"].to_numpy()[keep].astype(np.int64)
    h = ts - ts % step
    g = pd.DataFrame({"h": h, "y": yv}).groupby("h", sort=True)["y"].sum()
    return g.index.to_numpy(np.int64), g.to_numpy(np.int64)


def granger_align(x_ts, x_sum, y_ts, y_sum, step=3600):
    """Aligned (Y=y_t, A=y_{t-1}, B=x_{t-1}) int64 triples: the reference
    observed at t and t-step, the source at t-step (pandas merge route,
    independent of the engine's searchsorted alignment)."""
    yf = pd.DataFrame({"t": y_ts, "Y": y_sum})
    af = pd.DataFrame({"t": y_ts + step, "A": y_sum})
    bf = pd.DataFrame({"t": x_ts + step, "B": x_sum})
    m = yf.merge(af, on="t").merge(bf, on="t")
    return (
        m["Y"].to_numpy(np.int64),
        m["A"].to_numpy(np.int64),
        m["B"].to_numpy(np.int64),
    )


def harmonic_fit(ts, y):
    """Single 24h-harmonic OLS oracle: y ~ a + b*cos + c*sin with
    theta = 2*pi*(ts mod 86400)/86400, solved by Cramer on the 3x3
    normal equations. Every sum is math.fsum (exactly rounded and
    order-independent), so any correct implementation of the same
    documented semantics — whatever its partitioning or summation
    order — must produce bit-identical results. Returns
    (amplitude, peak_hour, r2) or None when degenerate."""
    import math

    n = int(ts.size)
    if n < 3:
        return None
    theta = (2.0 * np.pi) * ((ts % 86400).astype(np.float64) / 86400.0)
    c = np.cos(theta)
    s = np.sin(theta)
    yf = y.astype(np.float64)
    fs = math.fsum
    Sc, Ss = fs(c), fs(s)
    Scc, Sss, Scs = fs(c * c), fs(s * s), fs(c * s)
    Sy, Syc, Sys = fs(yf), fs(yf * c), fs(yf * s)

    def det3(a, b, cc, d, e, f, g, h, i):
        return a * (e * i - f * h) - b * (d * i - f * g) + cc * (d * h - e * g)

    D = det3(float(n), Sc, Ss, Sc, Scc, Scs, Ss, Scs, Sss)
    if D == 0.0:
        return None
    a0 = det3(Sy, Sc, Ss, Syc, Scc, Scs, Sys, Scs, Sss) / D
    b1 = det3(float(n), Sy, Ss, Sc, Syc, Scs, Ss, Sys, Sss) / D
    c1 = det3(float(n), Sc, Sy, Sc, Scc, Syc, Ss, Scs, Sys) / D
    amp = math.hypot(b1, c1)
    ph = math.atan2(c1, b1)
    if ph < 0.0:
        ph += 2.0 * math.pi
    peak_hour = ph * (12.0 / math.pi)
    resid = yf - (a0 + b1 * c + c1 * s)
    sse = fs(resid * resid)
    ybar = Sy / float(n)
    dev = yf - ybar
    sst = fs(dev * dev)
    if sst == 0.0:
        return None
    return amp, peak_hour, 1.0 - sse / sst


def kalman_rts(y: np.ndarray, lam: float) -> np.ndarray:
    """Local-level Kalman filter + Rauch-Tung-Striebel smoother over a
    dense series with NaN gaps, in measurement-noise units (r = 1,
    process noise lam = q/r). Scalar re-derivation of the textbook
    recursions (predict / gated update / backward smoothing pass); the
    operator pins its arithmetic to this exact op order. Init x = y[0]
    (callers guarantee the series starts observed), P = 1."""
    n = int(y.size)
    xf = np.empty(n)
    Pf = np.empty(n)
    xp = np.empty(n)
    Pp = np.empty(n)
    x = float(y[0])
    P = 1.0
    xf[0] = x
    Pf[0] = P
    xp[0] = x
    Pp[0] = P
    for t in range(1, n):
        px = x
        pP = P + lam
        xp[t] = px
        Pp[t] = pP
        yt = y[t]
        if yt == yt:  # observed
            K = pP / (pP + 1.0)
            x = px + K * (float(yt) - px)
            P = (1.0 - K) * pP
        else:
            x = px
            P = pP
        xf[t] = x
        Pf[t] = P
    xs = np.empty(n)
    xs[n - 1] = xf[n - 1]
    for t in range(n - 2, -1, -1):
        C = Pf[t] / Pp[t + 1]
        xs[t] = xf[t] + C * (xs[t + 1] - xp[t + 1])
    return xs


def pava_pools(bt: np.ndarray, y: np.ndarray):
    """Non-decreasing pool-adjacent-violators over (bucket_ts, integer
    sums): the textbook stack algorithm with EXACT integer
    cross-multiplied merge decisions (sum_prev * n_cur > sum_cur *
    n_prev) — no float mean anywhere. Returns (start_ts, end_ts, n_steps,
    pool_sum, fitted) lists; fitted is the single closing division."""
    n = int(y.size)
    pools: list[list[int]] = []
    for i in range(n):
        pools.append([int(y[i]), 1, i])
        while (
            len(pools) >= 2
            and pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):
            sm, cnt, _first = pools.pop()
            pools[-1][0] += sm
            pools[-1][1] += cnt
    start, end, ns, psum, fit = [], [], [], [], []
    for k, (sm, cnt, first) in enumerate(pools):
        start.append(int(bt[first]))
        last = pools[k + 1][2] - 1 if k + 1 < len(pools) else n - 1
        end.append(int(bt[last]))
        ns.append(cnt)
        psum.append(sm)
        fit.append(float(sm) / float(cnt))
    return start, end, ns, psum, fit


def binseg_points(y: np.ndarray, k: int, min_size: int):
    """Exact-arithmetic binary segmentation over integer sums: best split
    per segment by bigint cross-multiplication of
    val(t) = S_l^2/n_l + S_r^2/n_r (ties earliest t), best segment by
    exact Fraction gain, stop at k splits or gain <= 0. Returns
    (rank, idx, gain_float) lists; the gain is the single closing
    division per changepoint."""
    from fractions import Fraction

    n = int(y.size)
    S = [0]
    for v in y.tolist():
        S.append(S[-1] + int(v))

    def best_split(lo: int, hi: int):
        if hi - lo < 2 * min_size:
            return None
        best = None
        s_all = S[hi] - S[lo]
        for t in range(lo + min_size, hi - min_size + 1):
            nl = t - lo
            nr = hi - t
            sl = S[t] - S[lo]
            sr = s_all - sl
            num = sl * sl * nr + sr * sr * nl
            den = nl * nr
            if best is None or num * best[1] > best[0] * den:
                best = (num, den, t)
        return (best[2], best[0], best[1]) if best else None

    segs = [(0, n)]
    ranks, idxs, gains = [], [], []
    for rank in range(1, k + 1):
        best = None
        for si, (lo, hi) in enumerate(segs):
            r = best_split(lo, hi)
            if r is None:
                continue
            t, num, den = r
            s_all = S[hi] - S[lo]
            gain = Fraction(num, den) - Fraction(s_all * s_all, hi - lo)
            if best is None or gain > best[0] or (
                gain == best[0] and t < best[1]
            ):
                best = (gain, t, si)
        if best is None or best[0] <= 0:
            break
        gain, t, si = best
        lo, hi = segs.pop(si)
        segs.extend([(lo, t), (t, hi)])
        ranks.append(rank)
        idxs.append(t)
        gains.append(float(gain.numerator) / float(gain.denominator))
    return ranks, idxs, gains


def dtw_band(zx: np.ndarray, zy: np.ndarray, w: int) -> float:
    """Band-limited DTW oracle: full (n x m) cost matrix with +inf outside
    the Sakoe-Chiba band of effective radius max(w, |n-m|), L1 point cost,
    cell = cost + min(up, left, diag). Each cell is one float add on the
    min of three floats — no reassociation — so any evaluation order gives
    the same value; the engine's rolling-row scan matches bit-for-bit."""
    n, m = int(zx.size), int(zy.size)
    band = max(w, abs(n - m))
    D = np.full((n, m), np.inf)
    for i in range(n):
        for j in range(max(0, i - band), min(m, i + band + 1)):
            c = abs(float(zx[i]) - float(zy[j]))
            if i == 0 and j == 0:
                D[i, j] = c
                continue
            best = np.inf
            if i > 0 and D[i - 1, j] < best:
                best = D[i - 1, j]
            if j > 0 and D[i, j - 1] < best:
                best = D[i, j - 1]
            if i > 0 and j > 0 and D[i - 1, j - 1] < best:
                best = D[i - 1, j - 1]
            D[i, j] = c + best
    return float(D[n - 1, m - 1])


def znorm_moments(v: np.ndarray):
    """The engine's pinned z-normalization: mean = S/n, population var =
    (n*Q - S*S)/(n*n) on exact integers, z = (v - mean)/sqrt(var).
    None on zero variance."""
    import math

    n = int(v.size)
    S, Q = int(v.sum()), int(np.dot(v.astype(np.int64), v.astype(np.int64)))
    d = n * Q - S * S
    if d <= 0:
        return None
    mean = float(S) / float(n)
    sd = math.sqrt(float(d) / float(n * n))
    return (v.astype(np.float64) - mean) / sd


def croston_recursion(s: np.ndarray, iv: np.ndarray, alpha: float):
    """Croston SES pair, scalar re-derivation of the operator's pinned
    convention: z seeds with the first size, p with the first interval,
    then every subsequent demand i updates z with size_i and p with
    interval_{i-1} (so the seeding interval is also the first update).
    Returns (z, p)."""
    z = float(s[0])
    p = float(iv[0])
    for i in range(1, int(s.size)):
        z = alpha * float(s[i]) + (1.0 - alpha) * z
        p = alpha * float(iv[i - 1]) + (1.0 - alpha) * p
    return z, p


def haar_levels(y, levels: int):
    """Unnormalized Haar ladder detail energies, scalar re-derivation of
    the operator's pinned convention: truncate to the largest power-of-two
    prefix, each level pairs adjacent values as (a - b, a + b); detail
    numerators at depth k carry implicit denominator 2^k so the level's
    energy is the single float division sum(d^2) / 4^k. Returns
    [(level, n_coefs, energy_float)] using unbounded Python ints."""
    s = [int(v) for v in y]
    m = 1
    while m * 2 <= len(s):
        m *= 2
    s = s[:m]
    out = []
    for k in range(1, levels + 1):
        nxt = []
        e = 0
        for i in range(0, len(s), 2):
            d = s[i] - s[i + 1]
            e += d * d
            nxt.append(s[i] + s[i + 1])
        out.append((k, len(nxt), float(e) / float(4**k)))
        s = nxt
    return out


def page_hinkley_path(y, delta=0.0):
    """Page-Hinkley increase-detection path as the literal scalar
    recursion: running exact-int sum for the cumulative mean, float
    accumulator m_t = m_{t-1} + (y_t - S_t/t - delta), running min, and
    PH_t = m_t - min_{i<=t} m_i."""
    S = 0
    m = 0.0
    mn = 0.0
    out = []
    for i, v in enumerate(np.asarray(y).tolist(), start=1):
        S += int(v)
        m = m + (v - S / i - delta)
        if m < mn:
            mn = m
        out.append(m - mn)
    return np.asarray(out, dtype=np.float64)


def lomb_scargle_power(ts, y, period):
    """Variance-normalized Lomb-Scargle power at one candidate period
    over unevenly sampled points (Lomb 1976 / Scargle 1982 as in Press &
    Rybicki): the tau phase shift from the double-angle sums, then the
    cos/sin projections of the mean-centered values. Every sum is
    math.fsum (exactly rounded, order-independent), so any correct
    implementation of the same documented chain must agree bit-for-bit.
    Returns the power, or None when degenerate (n < 3, zero variance,
    zero cos/sin normal sum)."""
    import math

    n = int(ts.size)
    if n < 3:
        return None
    fs = math.fsum
    yf = y.astype(np.float64)
    ybar = fs(yf) / float(n)
    d = yf - ybar
    var = fs(d * d) / float(n - 1)
    if var == 0.0:
        return None
    w = 2.0 * math.pi / float(period)
    ang = w * (ts % period).astype(np.float64)
    s2, c2 = np.sin(2.0 * ang), np.cos(2.0 * ang)
    tau_ang = 0.5 * math.atan2(fs(s2), fs(c2))
    ct = np.cos(ang - tau_ang)
    st = np.sin(ang - tau_ang)
    CC, SS = fs(ct * ct), fs(st * st)
    if CC == 0.0 or SS == 0.0:
        return None
    Cd, Sd = fs(d * ct), fs(d * st)
    return 0.5 * (Cd * Cd / CC + Sd * Sd / SS) / var


def matrix_profile_brute(s, w, ez):
    """Exact matrix profile oracle over a dense series: scalar loops over
    diagonals with the documented STOMP dot-product recursion, per-window
    fsum means/sigmas, z-normalized Euclidean distances, pairs more than
    ``ez`` apart, zero-sigma windows excluded. The engine vectorizes
    across diagonals but each element's float chain is identical, so the
    two agree bit-for-bit. Returns (motif_i, motif_j, motif_dist,
    discord_i, discord_dist) or None when degenerate."""
    import math

    n = int(s.size)
    m = n - w + 1
    if m < 2:
        return None
    fs = math.fsum
    mu = [fs(s[i : i + w]) / float(w) for i in range(m)]
    sig = []
    for i in range(m):
        dev = s[i : i + w] - mu[i]
        sig.append(math.sqrt(fs(dev * dev) / float(w)))
    mp = [math.inf] * m
    best = (math.inf, -1, -1)
    for d in range(ez + 1, m):
        qt = fs(s[0:w] * s[d : d + w])
        for i in range(0, m - d):
            if i > 0:
                qt = (
                    qt
                    - s[i - 1] * s[i - 1 + d]
                    + s[i + w - 1] * s[i + d + w - 1]
                )
            j = i + d
            if sig[i] <= 0.0 or sig[j] <= 0.0:
                continue
            denom = (float(w) * sig[i]) * sig[j]
            d2 = 2.0 * float(w) * (
                1.0 - (qt - float(w) * mu[i] * mu[j]) / denom
            )
            dist = math.sqrt(max(d2, 0.0))
            if dist < best[0] or (
                dist == best[0]
                and (i < best[1] or (i == best[1] and j < best[2]))
            ):
                best = (dist, i, j)
            if dist < mp[i]:
                mp[i] = dist
            if dist < mp[j]:
                mp[j] = dist
    if best[1] < 0:
        return None
    di, dd = -1, -math.inf
    for i in range(m):
        if sig[i] > 0.0 and math.isfinite(mp[i]) and mp[i] > dd:
            di, dd = i, mp[i]
    if di < 0:
        return None
    return best[1], best[2], best[0], di, dd


def hourly_linear_filled(ts, y):
    """Dense hourly grid of exact-int hour sums with the pinned interior
    linear fill (``yL + (yR - yL) * k/(R - L)``) shared with the engine's
    matrix_profile prologue. Returns (grid_ts, series) or None when
    fewer than two observed hours exist."""
    hb = ts - ts % 3600
    agg: "dict[int, int]" = {}
    for t, v in zip(hb.tolist(), y.tolist()):
        agg[t] = agg.get(t, 0) + int(v)
    hu = np.array(sorted(agg), dtype=np.int64)
    if hu.size < 2:
        return None
    grid = np.arange(hu[0], hu[-1] + 3600, 3600, dtype=np.int64)
    s = np.full(grid.size, np.nan)
    idx = ((hu - hu[0]) // 3600).astype(np.int64)
    s[idx] = np.array([float(agg[t]) for t in hu.tolist()])
    for k in range(idx.size - 1):
        L, R = int(idx[k]), int(idx[k + 1])
        if R - L > 1:
            yL, yR = s[L], s[R]
            for kk in range(L + 1, R):
                s[kk] = yL + (yR - yL) * (float(kk - L) / float(R - L))
    return grid, s


def spectral_entropy_stats(ts, y, max_k=12):
    """Normalized DFT-power spectral entropy over the dense hourly grid
    (documented semantics of the engine's spectral_entropy): fold the
    active 1m buckets to hourly sums, take power at harmonics
    k = 1..min(max_k, (T-1)//2) of the T-slot grid (missing hours are
    exact zeros, so only active hours enter the projections), normalize,
    and report -sum p ln p / ln K plus the smallest-k power argmax.
    Every sum is math.fsum over the same pinned angle chain
    ((2*pi*k/T) * idx), so any correct implementation agrees
    bit-for-bit. Returns (n_slots, n_active, peak_k, entropy) or None
    when degenerate (fewer than two harmonics, zero AC power)."""
    import math

    hb = ts - ts % 3600
    uh, inv = np.unique(hb, return_inverse=True)
    x = np.bincount(inv, weights=y.astype(np.float64))
    t0 = int(uh[0])
    n_slots = int((int(uh[-1]) - t0) // 3600) + 1
    k_max = min(max_k, (n_slots - 1) // 2)
    if k_max < 2:
        return None
    idx = ((uh - t0) // 3600).astype(np.float64)
    fs = math.fsum
    powers = []
    for k in range(1, k_max + 1):
        ang = (2.0 * np.pi * float(k) / float(n_slots)) * idx
        cr = fs(x * np.cos(ang))
        ci = fs(x * np.sin(ang))
        powers.append(cr * cr + ci * ci)
    tot = fs(powers)
    # relative noise floor: constant hourly series have zero AC power in
    # exact math but fsum residues in floats — omit deterministically
    scale = fs(np.abs(x))
    if tot <= (1e-9 * scale) ** 2:
        return None
    pk = [pw / tot for pw in powers]
    ent = -fs(p * math.log(p) for p in pk if p > 0.0) / math.log(
        float(k_max)
    )
    best = 0
    for i in range(1, len(powers)):
        if powers[i] > powers[best]:
            best = i
    return (n_slots, int(uh.size), best + 1, ent)


def theta_forecast_fit(y, alpha=0.5, h=3):
    """Theta-method oracle (documented semantics of the engine's
    theta_forecast): OLS trend over the 0-based index via fsum moments,
    theta=2 line z = 2y - (a + bt), one unadjusted SES scalar recursion
    over z, forecasts 0.5*(a + b*(n-1+k)) + 0.5*ses_last for k=1..h.
    Returns (slope, [forecasts]) or None when n < 3."""
    import math

    yf = y.astype(np.float64)
    n = int(yf.size)
    if n < 3:
        return None
    t = np.arange(n, dtype=np.float64)
    fs = math.fsum
    st_, sy = fs(t), fs(yf)
    stt, sty = fs(t * t), fs(t * yf)
    den = float(n) * stt - st_ * st_
    b = (float(n) * sty - st_ * sy) / den
    a = (sy - b * st_) / float(n)
    s = None
    for i in range(n):
        z = 2.0 * yf[i] - (a + b * t[i])
        s = z if s is None else (1.0 - alpha) * s + alpha * z
    return b, [
        0.5 * (a + b * float(n - 1 + k)) + 0.5 * s for k in range(1, h + 1)
    ]


def pelt_points(y: np.ndarray, pen_mult: int, min_size: int):
    """Independent PELT replica over integer bucket sums: exact Fraction
    dynamic program with L2 cost and beta = pen_mult * population
    variance; prune a when F[a] + C(a, t) > F[t]. Returns the optimal
    changepoint index list (ties broken toward the earliest admissible
    previous changepoint, like the engine)."""
    from fractions import Fraction

    vals = [int(v) for v in y]
    n = len(vals)
    if n < 2 * min_size:
        return []
    ps = [0] * (n + 1)
    pq = [0] * (n + 1)
    for i, v in enumerate(vals):
        ps[i + 1] = ps[i] + v
        pq[i + 1] = pq[i] + v * v
    beta = Fraction(pen_mult * (n * pq[n] - ps[n] * ps[n]), n * n)

    def seg_cost(a, c):
        sv = ps[c] - ps[a]
        return Fraction((pq[c] - pq[a]) * (c - a) - sv * sv, c - a)

    F = {0: -beta}
    back = {}
    live = [0]
    for t in range(min_size, n + 1):
        scored = [
            (F[a] + seg_cost(a, t) + beta, a)
            for a in live
            if a in F and t - a >= min_size
        ]
        ft, at = min(scored, key=lambda p: (p[0], p[1]))
        F[t] = ft
        back[t] = at
        live = [
            a
            for a in live
            if a not in F or t - a < min_size or F[a] + seg_cost(a, t) <= ft
        ]
        live.append(t)
    cps = []
    t = n
    while t > 0:
        a = back.get(t, 0)
        if a > 0:
            cps.append(a)
        t = a
    return cps[::-1]


def sampen_counts(y: np.ndarray, m: int, r: float):
    """Independent sample-entropy match counter: full-matrix Chebyshev
    distances over sliding windows (vs the engine's blocked k-shifted
    pass). Returns (B, A) = matching pairs at template lengths m, m+1
    (i < j, self-matches excluded, tolerance <= r)."""
    from numpy.lib.stride_tricks import sliding_window_view

    y = np.asarray(y, dtype=np.int64)
    t = y.size - m
    if t < 2:
        return 0, 0
    w = sliding_window_view(y, m + 1)  # (n-m) x (m+1)
    d = np.abs(w[:, None, :] - w[None, :, :])
    iu = np.triu_indices(t, k=1)
    chebm = d[:, :, :m].max(axis=2)[iu]
    chebm1 = np.maximum(chebm, d[:, :, m][iu])
    return int(np.count_nonzero(chebm <= r)), int(
        np.count_nonzero(chebm1 <= r)
    )


def engle_granger_pair(x, y):
    """Independent Engle-Granger replica for one aligned (x=reference,
    y=source) integer pair: Fraction-exact OLS residuals scaled by the
    common denominator n*d1x into exact integers (vs the engine's direct
    numerator formula), then the drift-free DF(0) pinned float ending.
    Returns (beta, gamma, t) floats or None if the pair is degenerate."""
    import math
    from fractions import Fraction

    n = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    sxy = sum(a * b for a, b in zip(x, y))
    d1x = n * sxx - sx * sx
    if d1x <= 0:
        return None
    num1 = n * sxy - sx * sy
    b = Fraction(num1, d1x)
    a = Fraction(sy, n) - b * Fraction(sx, n)
    den = n * d1x
    r = [int((Fraction(yi) - a - b * xi) * den) for xi, yi in zip(x, y)]
    dr = [r[i + 1] - r[i] for i in range(len(r) - 1)]
    m = len(dr)
    if m < 3:
        return None
    A = sum(r[i] * dr[i] for i in range(m))
    B = sum(r[i] * r[i] for i in range(m))
    dd = sum(d * d for d in dr)
    if B <= 0:
        return None
    rrd = float(dd) * float(B) - float(A) * float(A)
    if not rrd > 0.0:
        return None
    return (
        float(num1) / float(d1x),
        float(A) / float(B),
        float(A) * math.sqrt(float(m - 1)) / math.sqrt(rrd),
    )


def coint_align(x_ts, x_sum, y_ts, y_sum):
    """Common-bucket alignment for cointegration (pandas merge route,
    independent of the engine's searchsorted): values of both series on
    the intersection of their observed grids."""
    m = pd.DataFrame({"t": x_ts, "x": x_sum}).merge(
        pd.DataFrame({"t": y_ts, "y": y_sum}), on="t"
    )
    return m["x"].to_numpy(np.int64), m["y"].to_numpy(np.int64)


def vopt_breaks(y, k):
    """Independent V-optimal DP replica: full 2-D table over all cells
    (vs the engine's rolling row + last-row pruning). Returns the break
    index list [0 = b_0 < ... < b_k = n] or None if n < k. All
    comparisons are exact Fractions; ties -> earliest split."""
    from fractions import Fraction

    vals = [int(v) for v in y]
    n = len(vals)
    if n < k:
        return None
    ps = [0] * (n + 1)
    pq = [0] * (n + 1)
    for i, v in enumerate(vals):
        ps[i + 1] = ps[i] + v
        pq[i + 1] = pq[i] + v * v

    def seg(a, c):
        sv = ps[c] - ps[a]
        return Fraction((pq[c] - pq[a]) * (c - a) - sv * sv, c - a)

    INF = None
    E = [[INF] * (n + 1) for _ in range(k + 1)]
    B = [[0] * (n + 1) for _ in range(k + 1)]
    E[0][0] = Fraction(0)
    for kk in range(1, k + 1):
        for t in range(kk, n + 1):
            cands = [
                (E[kk - 1][s] + seg(s, t), s)
                for s in range(kk - 1, t)
                if E[kk - 1][s] is not None
            ]
            e, s = min(cands, key=lambda p: (p[0], p[1]))
            E[kk][t] = e
            B[kk][t] = s
    bounds = [n]
    t = n
    for kk in range(k, 0, -1):
        t = B[kk][t]
        bounds.append(t)
    bounds.reverse()
    return bounds
