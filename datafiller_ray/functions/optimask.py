"""Largest NaN-free training rectangle (the reference's optimask).

When a pattern's complete-rows training set is smaller than
``min_samples_train``, the reference falls back to searching a large
NaN-free rectangular submatrix of (trainable rows x candidate features)
to train on (``docs/algorithm.rst:22-32``; ``_optimask.py:160-242``).

Algorithm (re-derived, pure NumPy): compress the NaN coordinates; compute
per-NaN-row the max (1-based) NaN-column rank ``hy`` and per-NaN-column the
max NaN-row rank ``hx``; alternately sort rows by -hy and columns by -hx
(recomputing the other histogram) until BOTH histograms are non-increasing
(a pareto ordering, <= 16 alternations); then the best split (i0, j0) over
the column histogram maximizes ``(m - h[i]) * (n - i)`` — preferring
candidates that keep at least ``min_rows`` rows — and the kept
(rows, columns) outside the first j0/i0 sorted NaN rows/cols form a
NaN-free rectangle.
"""

from __future__ import annotations

import numpy as np

from datafiller_ray.config import EngineValueError


def _groupby_max(keys: np.ndarray, vals: np.ndarray, k: int) -> np.ndarray:
    out = np.zeros(k, dtype=np.int64)
    np.maximum.at(out, keys, vals + 1)
    return out


def _is_nonincreasing(h: np.ndarray) -> bool:
    return bool((h[:-1] >= h[1:]).all()) if h.size > 1 else True


def optimask(
    missing: np.ndarray, *, min_rows: int = 1, max_steps: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Return (row_indices, col_indices) of a large NaN-free rectangle of
    the boolean ``missing`` mask (True = missing)."""
    m, n = missing.shape
    iy, ix = np.nonzero(missing)
    if iy.size == 0:
        return np.arange(m), np.arange(n)

    rows_nan, iyp = np.unique(iy, return_inverse=True)
    cols_nan, ixp = np.unique(ix, return_inverse=True)
    mr, nc = rows_nan.size, cols_nan.size
    hy = _groupby_max(iyp, ixp, mr)
    hx = _groupby_max(ixp, iyp, nc)
    p_rows = np.arange(mr)
    p_cols = np.arange(nc)

    ordered = False
    for step in range(max_steps):
        kind = "stable" if step else "quicksort"
        if step % 2 == 0:
            p = np.argsort(-hy, kind=kind)
            rank = np.empty(mr, np.int64)
            rank[p] = np.arange(mr)
            iyp = rank[iyp]
            p_rows, hy = p_rows[p], hy[p]
            hx = _groupby_max(ixp, iyp, nc)
            ordered = _is_nonincreasing(hx)
        else:
            p = np.argsort(-hx, kind=kind)
            rank = np.empty(nc, np.int64)
            rank[p] = np.arange(nc)
            ixp = rank[ixp]
            p_cols, hx = p_cols[p], hx[p]
            hy = _groupby_max(iyp, ixp, mr)
            ordered = _is_nonincreasing(hy)
        if ordered:
            break
    if not ordered:
        raise EngineValueError("optimask pareto ordering did not converge")

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

    drop_rows = rows_nan[p_rows[:j0]]
    drop_cols = cols_nan[p_cols[:i0]]
    keep_rows = np.setdiff1d(np.arange(m), drop_rows)
    keep_cols = np.setdiff1d(np.arange(n), drop_cols)
    return keep_rows, keep_cols
