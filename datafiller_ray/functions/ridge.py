"""Closed-form ridge regression (normal equations).

Numerically reproduces the reference's ``FastRidge``
(``/root/reference/src/datafiller/estimators/ridge.py:42-111``: float32
working dtype, centered normal equations, alpha on the diagonal) and its
Gram-matrix solver (``estimators/ridge.py:4-39``). Written from the
textbook formulation — for data matrix X and target y with means x̄, ȳ:

    (Xᶜ'Xᶜ + αI) β = Xᶜ'yᶜ      with Xᶜ = X - x̄, yᶜ = y - ȳ
    intercept = ȳ - x̄'β

computed without materializing the centered copies:
Xᶜ'Xᶜ = X'X - n·x̄x̄' and Xᶜ'yᶜ = X'y - n·x̄ȳ.
"""

from __future__ import annotations

import numpy as np


class FastRidge:
    """Minimal fit/predict ridge, float32 like the reference."""

    def __init__(self, alpha: float = 1e-2, fit_intercept: bool = True):
        self.alpha = alpha
        self.fit_intercept = fit_intercept
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "FastRidge":
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)
        n_rows = X.shape[0]
        normal = X.T @ X
        rhs = X.T @ y
        if self.fit_intercept:
            col_mean = X.mean(axis=0)
            target_mean = y.mean()
            normal -= np.float32(n_rows) * np.outer(col_mean, col_mean)
            rhs -= np.float32(n_rows) * col_mean * target_mean
        normal.flat[:: normal.shape[0] + 1] += self.alpha
        self.coef_ = np.linalg.solve(normal, rhs)
        if self.fit_intercept:
            self.intercept_ = float(target_mean - col_mean @ self.coef_)
        else:
            self.intercept_ = 0.0
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float32)
        return X @ self.coef_ + np.float32(self.intercept_)


def fit_ridge_from_gram(
    gram: np.ndarray, n_samples: int, alpha: float, fit_intercept: bool = True
) -> tuple[np.ndarray, float]:
    """Solve the same problem from the Gram of the augmented matrix
    ``Z = [X, y, 1]`` (``gram = Z'Z``, float64).

    The Gram carries every moment the centered normal equations need:
    ``gram[:k,:k]`` = X'X, ``gram[:k,k]`` = X'y, ``gram[:k,k+1]`` = column
    sums, ``gram[k,k+1]`` = Σy. Grams accumulated over row blocks sum
    exactly — the engine's partial+final pattern for distributed fitting
    (stages/distributed_model.py builds on this).
    """
    k = gram.shape[0] - 2
    xtx = gram[:k, :k]
    xty = gram[:k, k]
    if fit_intercept:
        col_sums = gram[:k, k + 1]
        y_sum = gram[k, k + 1]
        normal = xtx - np.outer(col_sums, col_sums) / n_samples
        rhs = xty - col_sums * (y_sum / n_samples)
    else:
        normal = xtx.copy()
        rhs = xty
    normal.flat[:: k + 1] += alpha
    coef = np.linalg.solve(normal, rhs)
    if fit_intercept:
        intercept = float(y_sum / n_samples - (col_sums / n_samples) @ coef)
    else:
        intercept = 0.0
    return coef, intercept
