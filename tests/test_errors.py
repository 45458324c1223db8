"""User-facing validation error pins — engine mirror of the reference's
``tests/test_errors.py`` policy: every input-validation error path has a
test asserting the exception type and the message shape."""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.config import (
    EngineError,
    EngineTypeError,
    EngineValueError,
    FillConfig,
)
from datafiller_ray.frame import TimeSeriesFiller
from datafiller_ray.functions.categorical import impute_mixed
from datafiller_ray.functions.multivariate import impute_matrix


@pytest.fixture
def x_valid():
    x = np.random.default_rng(0).standard_normal((10, 3))
    x[0, 0] = np.nan
    return x


def test_exception_hierarchy():
    assert issubclass(EngineValueError, EngineError)
    assert issubclass(EngineValueError, ValueError)
    assert issubclass(EngineTypeError, EngineError)
    assert issubclass(EngineTypeError, TypeError)


def test_validation_errors_are_catchable_as_engine_error():
    with pytest.raises(EngineError):
        impute_matrix(np.array([1.0, 2.0]))
    with pytest.raises(EngineError):
        TimeSeriesFiller()(pd.DataFrame({"a": [1.0, 2.0]}))


@pytest.mark.parametrize(
    "x, match",
    [
        (np.array([1.0, 2.0, 3.0]), "2D array"),
        (np.array([["a", "b"], ["c", "d"]]), "numeric dtype"),
        (np.array([[1.0, np.inf], [2.0, 3.0]]), "infinity"),
    ],
)
def test_impute_matrix_invalid_x_raises(x, match):
    with pytest.raises(EngineValueError, match=match):
        impute_matrix(x)


@pytest.mark.parametrize(
    "rows, match",
    [
        (np.array([0.5, 1.5]), "integer dtype"),
        (np.array([0, 100]), "between 0 and 9"),
        ([0, 100], "between 0 and 9"),
        (["a"], "between 0 and 9"),
    ],
)
def test_impute_matrix_invalid_rows_to_impute_raises(x_valid, rows, match):
    with pytest.raises(EngineValueError, match=match):
        impute_matrix(x_valid, rows_to_impute=rows)


@pytest.mark.parametrize("cols", [[10], [-1], ["a"]])
def test_impute_matrix_invalid_cols_to_impute_raises(x_valid, cols):
    with pytest.raises(
        EngineValueError, match="cols_to_impute must be a list of integers between 0 and 2"
    ):
        impute_matrix(x_valid, cols_to_impute=cols)


@pytest.mark.parametrize(
    "n_nearest_features, match",
    [
        (1.5, r"in \(0, 1\]"),
        (0.0, r"in \(0, 1\]"),
        (0.05, "resulted in 0 features"),
        ("two", "int or float"),
        (0, "between 1 and 3"),
        (10, "between 1 and 3"),
    ],
)
def test_impute_matrix_invalid_n_nearest_features_raises(x_valid, n_nearest_features, match):
    with pytest.raises(EngineValueError, match=match):
        impute_matrix(x_valid, n_nearest_features=n_nearest_features)


def test_n_nearest_features_float_fraction_resolves(x_valid):
    # 0.99 of 3 columns -> 2 features; runs without error
    out, _ = impute_matrix(x_valid, n_nearest_features=0.99, min_samples_train=3)
    assert not np.isnan(out).all()


def test_impute_mixed_unknown_column_label_raises():
    df = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    with pytest.raises(EngineValueError, match=r"Column labels not found in columns: \['c'\]"):
        impute_mixed(df, cols_to_impute=["c"])


def test_frame_unknown_row_label_raises():
    df = pd.DataFrame(
        {"a": [1.0, np.nan, 3.0]},
        index=pd.date_range("2024-01-01", periods=3, freq="h"),
    )
    with pytest.raises(EngineValueError, match="Row labels not found in index"):
        TimeSeriesFiller(min_samples_train=1)(df, rows_to_impute=["2030-01-01"])


def test_frame_unknown_column_label_raises():
    df = pd.DataFrame(
        {"a": [1.0, np.nan, 3.0]},
        index=pd.date_range("2024-01-01", periods=3, freq="h"),
    )
    with pytest.raises(EngineValueError, match=r"Column labels not found in columns: \['c'\]"):
        TimeSeriesFiller(min_samples_train=1)(df, cols_to_impute=["c"])


@pytest.mark.parametrize("lags", [1, ["a"], [1.5]])
def test_frame_lags_must_be_iterable_of_ints(lags):
    with pytest.raises(EngineValueError, match="lags must be an iterable of integers"):
        TimeSeriesFiller(lags=lags)


def test_frame_time_column_must_be_string_or_none():
    with pytest.raises(EngineValueError, match="time_column must be a string or None"):
        TimeSeriesFiller(time_column=7)


@pytest.mark.parametrize(
    "kwargs, exc, match",
    [
        ({"strategy": "bogus"}, EngineValueError, "strategy"),
        ({"max_gap": -1}, EngineTypeError, "max_gap"),
        ({"max_gap": 1.5}, EngineTypeError, "max_gap"),
        ({"fallback": "median"}, EngineValueError, "fallback"),
        ({"estimator": "forest"}, EngineValueError, "estimator"),
        ({"spline_window": 0}, EngineValueError, "spline_window"),
        ({"strategy": "spline", "spline_knot_radius": 0}, EngineValueError, "spline_knot_radius"),
    ],
)
def test_fill_config_validation(kwargs, exc, match):
    with pytest.raises(exc, match=match):
        FillConfig(**kwargs)


def test_invalid_scoring_raises(x_valid):
    with pytest.raises(EngineValueError, match="scoring"):
        impute_matrix(x_valid, scoring_fn="mse")


def test_custom_scoring_callable_drives_feature_selection(x_valid):
    calls = []

    def my_scores(x, cols):
        calls.append(x.shape)
        return np.ones((len(cols), x.shape[1]))

    out, _ = impute_matrix(
        x_valid, n_nearest_features=2, min_samples_train=3, scoring_fn=my_scores
    )
    assert calls == [x_valid.shape]
    assert not np.isnan(out).all()


def test_custom_scoring_bad_shape_raises(x_valid):
    with pytest.raises(EngineValueError, match="shape"):
        impute_matrix(
            x_valid, n_nearest_features=2, scoring_fn=lambda x, c: np.ones((1, 1))
        )
