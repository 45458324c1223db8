"""Extreme Learning Machine regressor (pure NumPy).

Reproduces the reference's optional nonlinear regressor
(``/root/reference/src/datafiller/estimators/elm.py:10-204``): a seeded
random projection + ReLU hidden layer solved by ridge on the hidden
features. Reference behaviors kept:

- hidden width capped at ``n_samples // min_samples_per_feature`` so small
  training sets cannot overfit the random features;
- per-width projection matrices cached on the instance (an actor holding
  the estimator pays the RNG cost once);
- fits beyond ``chunk_rows`` rows accumulate the hidden-layer Gram in
  chunks instead of materializing the full hidden matrix (bounded memory;
  equivalence with the single-shot fit is pinned by tests, the reference's
  own test pattern ``tests/test_estimators.py:87-97``).
"""

from __future__ import annotations

import numpy as np

from datafiller_ray.functions.ridge import fit_ridge_from_gram


class ExtremeLearningMachine:
    def __init__(
        self,
        width: int = 128,
        alpha: float = 1e-2,
        *,
        min_samples_per_feature: int = 4,
        chunk_rows: int = 65_536,
        seed: int = 0,
    ) -> None:
        self.width = width
        self.alpha = alpha
        self.min_samples_per_feature = min_samples_per_feature
        self.chunk_rows = chunk_rows
        self.seed = seed
        self._projections: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0
        self._fit_width: int = 0

    def _projection(self, n_feats: int, width: int) -> tuple[np.ndarray, np.ndarray]:
        key = (n_feats, width)
        if key not in self._projections:
            rng = np.random.default_rng(self.seed)
            W = rng.standard_normal((n_feats, width)).astype(np.float32)
            b = rng.standard_normal(width).astype(np.float32)
            self._projections[key] = (W, b)
        return self._projections[key]

    def _hidden(self, X: np.ndarray, width: int) -> np.ndarray:
        W, b = self._projection(X.shape[1], width)
        return np.maximum(X.astype(np.float32) @ W + b, 0.0)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "ExtremeLearningMachine":
        X = np.asarray(X, dtype=np.float32)
        y = np.asarray(y, dtype=np.float32)
        n = X.shape[0]
        width = max(1, min(self.width, n // self.min_samples_per_feature))
        self._fit_width = width
        k2 = width + 2
        gram = np.zeros((k2, k2), dtype=np.float64)
        for start in range(0, n, self.chunk_rows):
            Xc = X[start : start + self.chunk_rows]
            yc = y[start : start + self.chunk_rows]
            H = self._hidden(Xc, width)
            Z = np.column_stack(
                [H.astype(np.float64), yc.astype(np.float64), np.ones(len(H))]
            )
            gram += Z.T @ Z
        self.coef_, self.intercept_ = fit_ridge_from_gram(gram, n, self.alpha)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        H = self._hidden(np.asarray(X, dtype=np.float32), self._fit_width)
        return H.astype(np.float64) @ self.coef_ + self.intercept_
