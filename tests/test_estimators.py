"""ELM estimator + pluggable-regressor hook (reference test patterns:
chunked-vs-single-shot equivalence, tests/test_estimators.py:87-97; the
``regressor=`` extension surface, multivariate/imputer.py:92-95)."""

import numpy as np
import pytest

from datafiller_ray.config import EngineValueError, FillConfig
from datafiller_ray.functions.elm import ExtremeLearningMachine
from datafiller_ray.functions.features import fill_model


def _regression(n, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 4))
    y = np.sin(X[:, 0]) + 0.5 * X[:, 1] * X[:, 2] + 0.05 * rng.standard_normal(n)
    return X, y


def test_elm_fits_nonlinear_function():
    X, y = _regression(4000)
    m = ExtremeLearningMachine(width=128, seed=1).fit(X[:3000], y[:3000])
    pred = m.predict(X[3000:])
    ss_res = np.sum((y[3000:] - pred) ** 2)
    ss_tot = np.sum((y[3000:] - y[3000:].mean()) ** 2)
    assert 1 - ss_res / ss_tot > 0.9


def test_elm_chunked_equals_single_shot():
    X, y = _regression(5000)
    a = ExtremeLearningMachine(width=64, seed=2, chunk_rows=100_000).fit(X, y)
    b = ExtremeLearningMachine(width=64, seed=2, chunk_rows=512).fit(X, y)
    np.testing.assert_allclose(a.coef_, b.coef_, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(a.intercept_, b.intercept_, rtol=1e-6, atol=1e-8)


def test_elm_width_cap():
    X, y = _regression(40)
    m = ExtremeLearningMachine(width=128, min_samples_per_feature=4).fit(X, y)
    assert m._fit_width == 10  # 40 // 4
    assert m.predict(X).shape == (40,)


def test_elm_deterministic():
    X, y = _regression(500)
    a = ExtremeLearningMachine(width=32, seed=7).fit(X, y).predict(X)
    b = ExtremeLearningMachine(width=32, seed=7).fit(X, y).predict(X)
    np.testing.assert_array_equal(a, b)


def test_fill_model_with_elm_estimator():
    t = np.arange(3000, dtype=np.int64) * 60
    sig = 100 + 50 * np.sin(2 * np.pi * (t % 86400) / 86400)
    rng = np.random.default_rng(3)
    y = sig.copy()
    y[rng.random(3000) < 0.1] = np.nan
    out, codes = fill_model(y, t, estimator="elm")
    gaps = np.isnan(y)
    assert (codes[gaps] == 5).all()
    assert np.abs(out[gaps] - sig[gaps]).max() < 5.0
    # observed cells untouched
    np.testing.assert_array_equal(out[~gaps], y[~gaps])


def test_fill_model_with_custom_estimator_object():
    class MeanModel:
        def fit(self, X, y):
            self.mu = float(np.mean(y))
            return self

        def predict(self, X):
            return np.full(len(X), self.mu)

    t = np.arange(200, dtype=np.int64) * 60
    y = np.full(200, 42.0)
    y[50:53] = np.nan
    out, codes = fill_model(y, t, estimator=MeanModel())
    np.testing.assert_allclose(out[50:53], 42.0, atol=1e-5)


def test_estimator_config_validation():
    with pytest.raises(EngineValueError, match="estimator"):
        FillConfig(strategy="model", estimator="bogus")
    FillConfig(strategy="model", estimator="elm")
