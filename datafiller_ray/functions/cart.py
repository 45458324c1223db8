"""Pure-NumPy depth-limited CART classifier.

The reference's default categorical model is
``sklearn.tree.DecisionTreeClassifier(max_depth=4, random_state=rng)``
(``/root/reference/src/datafiller/multivariate/imputer.py:206,661-666``);
sklearn is absent from this environment, so this is an independent CART
with a fully DETERMINISTIC split rule (no RNG), shared verbatim by the
test oracle so both sides agree bit-for-bit:

- Gini criterion, expressed as maximizing ``S_L/n_L + S_R/n_R`` where
  ``S`` is the sum of squared class counts in a child (algebraically
  identical to minimizing the weighted child Gini, since the weighted sum
  equals ``n - S_L/n_L - S_R/n_R``). The score is computed as exactly that
  float64 expression from integer counts, so independent implementations
  produce bit-identical scores.
- Candidate thresholds are midpoints ``(v_i + v_{i+1}) / 2`` between
  consecutive DISTINCT sorted feature values; a row goes LEFT when
  ``x <= threshold`` (sklearn's convention).
- Ties in the score: first candidate wins, scanning features in ascending
  index order and thresholds in ascending value order (strict ``>`` on
  updates).
- A node splits only while ``depth < max_depth``, it has >= 2 samples and
  is impure; leaves predict the majority class, ties to the SMALLEST class
  code.
"""

from __future__ import annotations

import numpy as np


class _Node:
    __slots__ = ("feature", "threshold", "left", "right", "value")

    def __init__(self, value: int, feature: int = -1, threshold: float = 0.0):
        self.value = value
        self.feature = feature
        self.threshold = threshold
        self.left: "_Node | None" = None
        self.right: "_Node | None" = None


class DecisionTreeClassifier:
    """Deterministic depth-limited CART (see module docstring for the exact
    split rule). sklearn-shaped ``fit(X, y)`` / ``predict(X)`` over integer
    class codes — the engine's default categorical imputation model."""

    def __init__(self, max_depth: int = 4) -> None:
        self.max_depth = max_depth

    def fit(self, X: np.ndarray, y: np.ndarray) -> "DecisionTreeClassifier":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        self.classes_ = np.unique(y)
        codes = np.searchsorted(self.classes_, y)
        self._root = self._build(X, codes, depth=0)
        return self

    def _leaf_value(self, counts: np.ndarray) -> int:
        # majority class; argmax ties -> first -> smallest class code
        return int(np.argmax(counts))

    def _build(self, X: np.ndarray, codes: np.ndarray, depth: int) -> _Node:
        K = self.classes_.size
        counts = np.bincount(codes, minlength=K)
        node = _Node(self._leaf_value(counts))
        n = codes.size
        if depth >= self.max_depth or n < 2 or np.count_nonzero(counts) < 2:
            return node
        best_score = -np.inf
        best_f = -1
        best_thr = 0.0
        for f in range(X.shape[1]):
            xf = X[:, f]
            order = np.argsort(xf, kind="stable")
            xv = xf[order]
            yv = codes[order]
            cut = np.flatnonzero(xv[:-1] < xv[1:])  # split AFTER position i
            if cut.size == 0:
                continue
            onehot = (yv[:, None] == np.arange(K)[None, :]).astype(np.int64)
            csum = onehot.cumsum(axis=0)
            CL = csum[cut]
            nL = (cut + 1).astype(np.int64)
            CR = csum[-1][None, :] - CL
            nR = n - nL
            S_L = (CL * CL).sum(axis=1)
            S_R = (CR * CR).sum(axis=1)
            score = S_L / nL + S_R / nR  # the documented float64 expression
            i = int(np.argmax(score))
            if score[i] > best_score:  # strict: first candidate wins ties
                best_score = float(score[i])
                best_f = f
                best_thr = (xv[cut[i]] + xv[cut[i] + 1]) / 2.0
        if best_f < 0:
            return node
        left = X[:, best_f] <= best_thr
        node.feature = best_f
        node.threshold = best_thr
        node.left = self._build(X[left], codes[left], depth + 1)
        node.right = self._build(X[~left], codes[~left], depth + 1)
        return node

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        out = np.empty(X.shape[0], dtype=np.int64)

        def walk(node: _Node, idx: np.ndarray) -> None:
            if node.left is None:
                out[idx] = node.value
                return
            left = X[idx, node.feature] <= node.threshold
            walk(node.left, idx[left])
            walk(node.right, idx[~left])

        walk(self._root, np.arange(X.shape[0]))
        return self.classes_[out]
