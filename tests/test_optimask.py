"""Optimask rectangle search: property tests (NaN-free result, area vs a
brute-force small-case oracle) + integration with the model paths
(reference path: complete rows -> optimask -> fallback,
docs/algorithm.rst:22-32; tested semantics, not code, from
/root/reference/src/datafiller/_optimask.py:160-242)."""

import numpy as np
import pytest

from datafiller_ray.functions.multivariate import impute_matrix
from datafiller_ray.functions.optimask import optimask


def test_rectangle_is_nan_free_random():
    rng = np.random.default_rng(0)
    for trial in range(60):
        m, n = rng.integers(3, 40), rng.integers(2, 15)
        missing = rng.random((m, n)) < rng.uniform(0.05, 0.5)
        rows, cols = optimask(missing)
        if rows.size and cols.size:
            assert not missing[np.ix_(rows, cols)].any(), trial
        # no missing at all -> everything kept
        rows2, cols2 = optimask(np.zeros((m, n), bool))
        assert rows2.size == m and cols2.size == n


def test_reasonable_area_vs_bruteforce():
    """On small matrices, compare against the best over all column subsets
    (for each column subset, keep rows with no NaN in it)."""
    rng = np.random.default_rng(1)
    from itertools import combinations

    for trial in range(20):
        m, n = 12, 5
        missing = rng.random((m, n)) < 0.3
        rows, cols = optimask(missing)
        got_area = rows.size * cols.size
        best = 0
        for k in range(1, n + 1):
            for sub in combinations(range(n), k):
                ok_rows = (~missing[:, list(sub)]).all(axis=1).sum()
                best = max(best, ok_rows * k)
        # the pareto heuristic is not guaranteed optimal, but should be close
        assert got_area >= 0.5 * best, (trial, got_area, best)


def test_min_rows_preference():
    # a tall thin NaN-free option vs a wider shallower one
    missing = np.zeros((30, 4), bool)
    missing[10:, 3] = True  # col 3 only clean in first 10 rows
    rows, cols = optimask(missing, min_rows=20)
    assert rows.size >= 20
    assert not missing[np.ix_(rows, cols)].any()


def test_one_all_nan_column():
    missing = np.zeros((10, 3), bool)
    missing[:, 1] = True
    rows, cols = optimask(missing)
    assert 1 not in cols.tolist()
    assert rows.size == 10 and cols.size == 2


def test_optimask_unlocks_training_in_impute_matrix():
    """Complete rows are scarce, but a large NaN-free rectangle exists:
    optimask=True trains models where optimask=False falls to the mean."""
    rng = np.random.default_rng(2)
    m = 300
    F = rng.standard_normal((m, 2))
    W = rng.standard_normal((2, 6))
    x = F @ W + 0.01 * rng.standard_normal((m, 6))
    full = x.copy()
    # column 5 is missing everywhere except a handful of rows -> almost no
    # complete rows for patterns that include it
    x[10:, 5] = np.nan
    # target column 0 gaps
    x[rng.random(m) < 0.2, 0] = np.nan

    out_no, filled_no = impute_matrix(
        x, cols_to_impute=np.array([0]), min_samples_train=20,
        fallback=None, use_optimask=False,
    )
    out_yes, filled_yes = impute_matrix(
        x, cols_to_impute=np.array([0]), min_samples_train=20,
        fallback=None, use_optimask=True,
    )
    gaps = np.isnan(x[:, 0])
    # with optimask the under-threshold pattern (all features incl col 5
    # observed only in 10 rows... pattern uses col 5) gets a model
    assert filled_yes[gaps, 0].sum() >= filled_no[gaps, 0].sum()
    err = np.abs(out_yes[gaps, 0] - full[gaps, 0])
    assert np.median(err[filled_yes[gaps, 0]]) < 0.2
