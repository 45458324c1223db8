"""Closed-form ridge regression, numerically matching the reference.

Reproduces ``FastRidge`` (``/root/reference/src/datafiller/estimators/ridge.py:42-111``):
float32 working dtype, normal equations ``(X'X - n·x̄x̄' + αI) β = X'y - n·x̄ȳ``,
intercept ``ȳ - x̄'β``. Also the Gram-path solver
(``estimators/ridge.py:4-39``) used when a Gram of ``[X, y, 1]`` is
accumulated batch-wise (float64, ``multivariate/_gram.py:30-35``).

Written from the published normal-equations formulation; not copied.
"""

from __future__ import annotations

import numpy as np


class FastRidge:
    """Minimal ridge regressor (fit/predict), float32 like the reference."""

    def __init__(self, alpha: float = 1e-2, fit_intercept: bool = True):
        self.alpha = alpha
        self.fit_intercept = fit_intercept
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0

    def fit(self, X: np.ndarray, y: np.ndarray) -> "FastRidge":
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)
        n = X.shape[0]
        if self.fit_intercept:
            xm = X.mean(axis=0)
            ym = y.mean()
            A = X.T @ X - np.float32(n) * np.outer(xm, xm)
            b = X.T @ y - np.float32(n) * xm * ym
        else:
            xm, ym = None, np.float32(0.0)
            A = X.T @ X
            b = X.T @ y
        A.flat[:: A.shape[0] + 1] += self.alpha
        self.coef_ = np.linalg.solve(A, b)
        self.intercept_ = float(ym - xm @ self.coef_) if self.fit_intercept else 0.0
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float32)
        return X @ self.coef_ + np.float32(self.intercept_)


def fit_ridge_from_gram(
    gram: np.ndarray, n_samples: int, alpha: float, fit_intercept: bool = True
) -> tuple[np.ndarray, float]:
    """Solve the same ridge from the Gram of the augmented matrix
    ``Z = [X, y, 1]`` (``gram = Z.T @ Z``, float64).

    This is the mergeable form: Grams accumulated over batches sum exactly
    (the engine's partial+final pattern for distributed model fitting).
    """
    k = gram.shape[0] - 2
    sxx = gram[:k, :k]
    sxy = gram[:k, k]
    if fit_intercept:
        sx = gram[:k, k + 1]
        sy = gram[k, k + 1]
        A = sxx - np.outer(sx, sx) / n_samples
        b = sxy - sx * (sy / n_samples)
    else:
        A = sxx.copy()
        b = sxy
    A.flat[:: k + 1] += alpha
    coef = np.linalg.solve(A, b)
    intercept = float(sy / n_samples - (sx / n_samples) @ coef) if fit_intercept else 0.0
    return coef, intercept
