"""Multivariate matrix imputation — the reference's core numeric path.

Re-expresses ``MultivariateImputer``'s complete-rows algorithm
(``/root/reference/src/datafiller/multivariate/imputer.py:465-670`` and
``docs/algorithm.rst:22-32``) in pure NumPy:

1. standardize columns on observed-cell stats (``imputer.py:421-451``);
2. optional feature scoring: ``score[j,k] = shared_obs_fraction * |corr|``
   of the mean-pre-imputed matrix (``multivariate/_scoring.py:62-77``),
   then deterministic stable top-k selection per target
   (``imputer.py:274-286`` — NaN scores sink, ties break by column index);
3. group imputable rows of each target by their observed-feature pattern
   (``imputer.py:552-553``); per pattern train one ridge on rows complete
   on the pattern's features, threshold ``min_samples_train`` (default 20,
   ``imputer.py:164``);
4. rescale predictions; observed cells return bit-exact
   (``tests/test_multivariate.py:522-531``); remaining cells take the
   column-mean fallback (``imputer.py:744-770``) or stay NaN.

The optimask sub-rectangle search (``_optimask.py``) is intentionally not
ported (SURVEY.md §7): under-threshold patterns fall through to the
fallback.
"""

from __future__ import annotations

import numpy as np

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.ridge import FastRidge, fit_ridge_from_gram


def column_stats(
    x: np.ndarray, _obs: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-column observed (count, mean, std). std==0 or all-NaN -> 1.0
    scale so standardization is a no-op there (reference behavior).

    nansum-based single-pass formulation: the where(obs, ...) temporaries of
    the naive version cost 5+ full-matrix passes, which dominated wall time
    on wide panels (measured 12.8 s of a 31 s headline-workload call).
    ``_obs`` lets the caller share its own NaN mask (one less full pass)."""
    obs = ~np.isnan(x) if _obs is None else _obs
    counts = obs.sum(axis=0)
    denom = np.maximum(counts, 1)
    xz = np.where(obs, x, 0.0)  # one temp, reused for both moments
    sums = xz.sum(axis=0)
    means = np.where(counts == 0, 0.0, sums / denom)
    sumsq = np.einsum("ij,ij->j", xz, xz)  # no squared temp
    # E[x^2] - mu^2, clamped (cancellation can dip epsilon-negative)
    var = np.maximum(sumsq / denom - means * means, 0.0)
    stds = np.sqrt(var)
    stds = np.where((counts == 0) | (stds == 0) | ~np.isfinite(stds), 1.0, stds)
    return counts, means, stds


def scoring(
    x: np.ndarray,
    cols_to_impute: np.ndarray,
    *,
    _obs: np.ndarray | None = None,
    _counts: np.ndarray | None = None,
    _means: np.ndarray | None = None,
) -> np.ndarray:
    """Feature-selection scores, shape (len(cols), n_cols).

    Matches the reference's mean-pre-imputed formulation
    (``_scoring.py:62-77``): with z = where(observed, x - colmean, 0),
    score[j,k] = (shared_count[j,k]/m) * |(z_j.z_k/m) / (std_j std_k)|,
    std_j = sqrt(sum(z_j^2)/m); all-NaN columns yield NaN scores.

    The underscore kwargs let ``impute_matrix`` reuse its own stats pass —
    on wide panels the redundant full-matrix temporaries dominated wall.
    """
    m, n = x.shape
    cols = np.asarray(cols_to_impute, dtype=np.int64).ravel()
    obs = ~np.isnan(x) if _obs is None else _obs
    counts = obs.sum(axis=0) if _counts is None else _counts
    if _means is None:
        means = np.where(
            counts == 0,
            0.0,
            np.where(obs, x, 0.0).sum(axis=0) / np.maximum(counts, 1),
        )
    else:
        means = _means
    z = np.subtract(x, means)
    # unobserved cells are NaN - mean = NaN -> exact 0.0 (bit-identical to
    # nan_to_num, which wastes two extra full-matrix passes on inf checks)
    np.copyto(z, 0.0, where=~obs)
    if m < (1 << 24):  # counts fit float32 exactly below 2^24 rows
        obsf = obs.astype(np.float32)
    else:
        obsf = obs.astype(np.float64)
    shared = (obsf[:, cols].T @ obsf).astype(np.float64)
    cross = z[:, cols].T @ z
    sumsq = np.einsum("ij,ij->j", z, z)
    with np.errstate(all="ignore"):
        std = np.sqrt(sumsq / m)
        std = np.where(counts == 0, np.nan, std)
        corr = (cross / m) / np.outer(std[cols], std)
        return (shared / m) * np.abs(corr)


def select_features(
    n_features: int,
    col_to_impute: int,
    n_nearest_features: int | None,
    scores_row: np.ndarray | None,
) -> np.ndarray:
    """Deterministic top-k feature selection (``imputer.py:274-286``)."""
    candidates = np.arange(n_features)
    candidates = candidates[candidates != col_to_impute]
    if n_nearest_features is None:
        return candidates
    feature_scores = np.nan_to_num(scores_row[candidates], nan=-np.inf)
    k = min(n_nearest_features, candidates.size)
    ranking = np.argsort(-feature_scores, kind="stable")
    return np.sort(candidates[ranking[:k]])


def validate_impute_inputs(
    x: np.ndarray,
    rows_to_impute,
    cols_to_impute,
    n_nearest_features,
) -> int | None:
    """Validate ``impute_matrix`` inputs and resolve ``n_nearest_features``
    (float = fraction of columns) — the reference's ``_validate_input``
    surface (``multivariate/_utils.py:60-141``) with its error messages."""
    if x.ndim != 2:
        raise EngineValueError(f"x must be a 2D array, but got {x.ndim} dimensions")
    if not np.issubdtype(x.dtype, np.number):
        raise EngineValueError(f"x must have a numeric dtype, but got {x.dtype}")
    if np.isinf(x).any():
        raise EngineValueError("x cannot contain infinity")
    m, n = x.shape

    def check_index(sel, bound, name):
        if sel is None:
            return
        items = [sel] if isinstance(sel, (int, np.integer)) else sel
        if isinstance(items, np.ndarray):
            if not np.issubdtype(items.dtype, np.integer):
                raise EngineValueError(
                    f"{name} must have an integer dtype, but got {items.dtype}"
                )
            ok = bool(np.all(items >= 0) and np.all(items < bound))
        else:
            ok = all(isinstance(i, (int, np.integer)) for i in items) and all(
                0 <= i < bound for i in items
            )
        if not ok:
            raise EngineValueError(
                f"{name} must be a list of integers between 0 and {bound - 1}"
            )

    check_index(rows_to_impute, m, "rows_to_impute")
    check_index(cols_to_impute, n, "cols_to_impute")

    if n_nearest_features is None:
        return None
    if isinstance(n_nearest_features, float):
        if not (0 < n_nearest_features <= 1.0):
            raise EngineValueError(
                "If n_nearest_features is a float, it must be in (0, 1]"
            )
        n_nearest_features = int(n_nearest_features * n)
        if n_nearest_features == 0:
            raise EngineValueError("n_nearest_features resulted in 0 features to select")
    if not isinstance(n_nearest_features, (int, np.integer)):
        raise EngineValueError("n_nearest_features must be an int or float")
    if not (0 < n_nearest_features <= n):
        raise EngineValueError(f"n_nearest_features must be between 1 and {n}")
    return int(n_nearest_features)


def impute_matrix(
    x: np.ndarray,
    *,
    cols_to_impute: np.ndarray | None = None,
    rows_to_impute: np.ndarray | None = None,
    n_nearest_features: int | None = None,
    alpha: float = 1e-2,
    min_samples_train: int = 20,
    fallback: str | None = "simple",
    use_optimask: bool = True,
    categorical_cols: "set[int] | None" = None,
    classifier=None,
    scoring_fn="default",
    device: "str | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Impute NaN cells of a 2-D float matrix. Returns (imputed, filled_mask).

    ``rows_to_impute``/``cols_to_impute`` are index arrays restricting which
    cells are imputed (reference selector semantics,
    ``multivariate/_utils.py:10-59``: everything else passes through).

    Columns listed in ``categorical_cols`` hold integer label codes and are
    predicted with ``classifier`` (fit on RAW feature values + raw codes,
    like the reference, which hands the classifier its unstandardized local
    matrix — reference ``imputer.py:655-670``; raw values also keep the
    default CART's midpoint comparisons bit-reproducible across
    independently-computed standardizations); their fallback is the most
    frequent observed code (``imputer.py:744-770``).

    ``scoring_fn`` is the reference's ``scoring=`` hook (``imputer.py:
    116-121``): "default" uses the shared-fraction x |corr| formula; a
    callable must accept ``(x, cols_to_impute)`` and return a
    ``(len(cols), n_cols)`` score matrix; anything else raises.

    ``device`` is the reference's batched-solve opt-in (``imputer.py:
    186,932-941`` + ``multivariate/_gpu.py``): when set, every
    missingness pattern of a column is solved in ONE batched pass from
    the per-group Grams (``stages/gram_backend.py``) instead of the
    per-pattern loop; under-threshold patterns still fall through to
    the optimask branch, like the reference. ``"numpy"`` batches on
    CPU; any torch device string uses the lazy torch twin. Like the
    reference's GPU path, batched results match the sequential path
    numerically (~1e-8), not bit-exactly.
    """
    if scoring_fn != "default" and not callable(scoring_fn):
        raise EngineValueError(
            "scoring must be 'default' or a callable (x, cols_to_impute) -> scores"
        )
    from datafiller_ray.stages.gram_backend import resolve_gram_backend

    gram_backend = resolve_gram_backend(device)
    x = np.asarray(x)
    n_nearest_features = validate_impute_inputs(
        x, rows_to_impute, cols_to_impute, n_nearest_features
    )
    x = x.astype(np.float64, copy=True)
    m, n = x.shape
    cols = (
        np.arange(n)
        if cols_to_impute is None
        else np.unique(np.asarray(cols_to_impute, dtype=np.int64))
    )
    row_sel = np.zeros(m, dtype=bool)
    if rows_to_impute is None:
        row_sel[:] = True
    else:
        row_sel[np.asarray(rows_to_impute, dtype=np.int64)] = True

    obs = ~np.isnan(x)
    counts, means, stds = column_stats(x, _obs=obs)
    xs = np.subtract(x, means)  # NaN cells stay NaN
    np.divide(xs, stds, out=xs)  # in place: xs is the only wide temp

    if n_nearest_features is None:
        scores = None
    elif callable(scoring_fn):
        scores = np.asarray(scoring_fn(x, cols), dtype=np.float64)
        if scores.shape != (cols.size, n):
            raise EngineValueError(
                f"custom scoring must return shape {(cols.size, n)}, got {scores.shape}"
            )
    else:
        scores = scoring(x, cols, _obs=obs, _counts=counts, _means=means)

    out = x.copy()
    filled = np.zeros_like(obs)

    for si, j in enumerate(cols):
        imputable = np.flatnonzero(~obs[:, j] & row_sel)
        if imputable.size == 0:
            continue
        feats = select_features(
            n, j, n_nearest_features, scores[si] if scores is not None else None
        )
        if feats.size == 0:
            continue
        trainable = np.flatnonzero(obs[:, j])
        if trainable.size == 0:
            continue
        # group imputable rows by observed pattern over the selected features
        patt = obs[np.ix_(imputable, feats)]
        uniq, inv = np.unique(patt, axis=0, return_inverse=True)
        train_obs = obs[np.ix_(trainable, feats)]

        # Gram reuse (the reference's _gram.py:80-118 FLOP saver, ~28x on
        # its benchmarks): one Gram of Z=[X(zero-filled), y, 1] per distinct
        # trainable-row pattern, computed in a single pass; every predict
        # pattern then solves from the summed covering Grams instead of
        # refitting ridge on materialized rows. Algebraically identical
        # training sets (rows complete on the pattern's features == union
        # of covering groups), so only float summation order differs.
        k = feats.size
        use_gram = (
            k <= 64
            and not (categorical_cols and j in categorical_cols)
        )
        if use_gram:
            bitpos = np.uint64(1) << np.arange(k, dtype=np.uint64)
            t_masks = (train_obs @ bitpos).astype(np.uint64)
            Xz = np.where(train_obs, xs[np.ix_(trainable, feats)], 0.0)
            Z = np.column_stack(
                [Xz, xs[trainable, j], np.ones(trainable.size)]
            )
            order = np.argsort(t_masks, kind="stable")
            sm = t_masks[order]
            bnd = np.flatnonzero(np.diff(sm)) + 1
            starts = np.concatenate([[0], bnd])
            ends = np.concatenate([bnd, [sm.size]])
            group_masks = sm[starts]
            group_counts = (ends - starts).astype(np.int64)
            grams = np.empty((group_masks.size, k + 2, k + 2))
            for gi in range(group_masks.size):
                Zg = Z[order[starts[gi] : ends[gi]]]
                grams[gi] = Zg.T @ Zg
            total_gram = grams.sum(axis=0)
            total_n = int(group_counts.sum())

        # batched backend (reference _impute_col_gpu shape): all patterns of
        # the column solved in one pass; invalid ones fall through below
        batched = None
        if use_gram and gram_backend is not None:
            b_coef, b_icpt, _b_n, b_valid = gram_backend.solve_patterns(
                grams, group_masks, group_counts, uniq, alpha, min_samples_train
            )
            batched = b_valid

        for pi in range(uniq.shape[0]):
            pattern = uniq[pi]
            if not pattern.any():
                continue
            rows = imputable[inv == pi]
            use = feats[pattern]
            if use_gram and batched is not None:
                if batched[pi]:
                    pred = xs[np.ix_(rows, use)] @ b_coef[pi][pattern] + b_icpt[pi]
                    out[rows, j] = pred * stds[j] + means[j]
                    filled[rows, j] = True
                    continue
                # under threshold: same fallthrough as the sequential path
                pu = (pattern @ bitpos).astype(np.uint64)
                complete = (t_masks & pu) == pu
            elif use_gram:
                pu = (pattern @ bitpos).astype(np.uint64)
                covering = (group_masks & pu) == pu
                n_train = int(group_counts[covering].sum())
                if n_train >= min_samples_train:
                    miss_idx = np.flatnonzero(~covering)
                    if miss_idx.size <= covering.sum():
                        G = total_gram - grams[miss_idx].sum(axis=0)
                    else:
                        G = grams[covering].sum(axis=0)
                    sub = np.concatenate([np.flatnonzero(pattern), [k, k + 1]])
                    coef, intercept = fit_ridge_from_gram(
                        G[np.ix_(sub, sub)], n_train, alpha
                    )
                    pred = xs[np.ix_(rows, use)] @ coef + intercept
                    out[rows, j] = pred * stds[j] + means[j]
                    filled[rows, j] = True
                    continue
                # under threshold: fall through to the optimask branch below
                complete = (t_masks & pu) == pu
            else:
                complete = train_obs[:, pattern].all(axis=1)
            train_rows = trainable[complete]
            if train_rows.size < min_samples_train:
                if not use_optimask:
                    continue
                # complete rows -> optimask -> fallback (the reference's
                # fixed path, docs/algorithm.rst:22-32): search a NaN-free
                # sub-rectangle of (trainable x pattern features)
                from datafiller_ray.functions.optimask import optimask

                sub_missing = ~obs[np.ix_(trainable, use)]
                r_keep, c_keep = optimask(
                    sub_missing, min_rows=min_samples_train
                )
                if r_keep.size < min_samples_train or c_keep.size == 0:
                    continue
                train_rows = trainable[r_keep]
                use = use[c_keep]
            if categorical_cols and j in categorical_cols:
                if classifier is None:
                    continue
                model = classifier()
                model.fit(x[np.ix_(train_rows, use)], x[train_rows, j].astype(np.int64))
                out[rows, j] = model.predict(x[np.ix_(rows, use)]).astype(np.float64)
            else:
                model = FastRidge(alpha=alpha, fit_intercept=True)
                model.fit(xs[np.ix_(train_rows, use)], xs[train_rows, j])
                pred = model.predict(xs[np.ix_(rows, use)]).astype(np.float64)
                out[rows, j] = pred * stds[j] + means[j]
            filled[rows, j] = True

    if fallback == "simple":
        for j in cols:
            if counts[j] == 0:
                continue  # all-NaN column survives (test_timeseries.py:208-230)
            rest = ~obs[:, j] & row_sel & ~filled[:, j]
            if categorical_cols and j in categorical_cols:
                # most frequent observed code; ties -> smallest code
                values, vcounts = np.unique(x[obs[:, j], j], return_counts=True)
                out[rest, j] = values[np.argmax(vcounts)]
            else:
                out[rest, j] = means[j]
            filled[rest, j] = True
    return out, filled
