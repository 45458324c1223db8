"""Mixed-dtype imputation: engine analogues of the reference categorical
suites (``reference/tests/test_multivariate.py`` categorical/boolean/
fallback-mode tests and ``test_multivariate_polars.py:9-26``)."""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.categorical import (
    NearestCentroidClassifier,
    encode_frame,
    impute_mixed,
)


@pytest.fixture
def mixed_df():
    rng = np.random.default_rng(0)
    n = 120
    sex = rng.choice(["male", "female"], n).astype(object)
    age = np.where(sex == "male", 40.0, 25.0) + rng.normal(0, 3, n)
    fare = np.where(sex == "male", 10.0, 60.0) + rng.normal(0, 5, n)
    df = pd.DataFrame({"sex": sex, "age": age, "fare": fare})
    miss = rng.choice(n, 20, replace=False)
    df.loc[miss[:10], "sex"] = None
    df.loc[miss[10:], "age"] = np.nan
    return df


def test_encode_frame_layout(mixed_df):
    enc = encode_frame(mixed_df)
    # main code col + 2 dummies + age + fare
    assert enc["data"].shape == (len(mixed_df), 5)
    assert enc["encoded_feature_names"][:3] == ["sex", "sex_female", "sex_male"]
    assert list(enc["main_column_indices"]) == [0, 3, 4]
    assert enc["categorical_targets"] == {0: ["female", "male"]}
    # missing categoricals are NaN in codes AND in dummies
    nan_rows = mixed_df["sex"].isna().to_numpy()
    assert np.isnan(enc["data"][nan_rows, 0]).all()
    assert np.isnan(enc["data"][nan_rows, 1]).all()


def test_categorical_dataframe_support(mixed_df):
    out = impute_mixed(mixed_df, min_samples_train=5)
    assert list(out.columns) == list(mixed_df.columns)
    assert out["sex"].isna().sum() == 0
    assert out["age"].isna().sum() == 0
    assert set(out["sex"].dropna().unique()).issubset({"male", "female"})
    # observed cells pass through exactly
    obs = mixed_df["sex"].notna()
    assert (out.loc[obs, "sex"] == mixed_df.loc[obs, "sex"]).all()
    np.testing.assert_array_equal(
        out.loc[mixed_df["fare"].notna(), "fare"],
        mixed_df.loc[mixed_df["fare"].notna(), "fare"],
    )


def test_classifier_learns_separable_classes(mixed_df):
    # age/fare separate the classes cleanly -> predictions should beat mode
    out = impute_mixed(mixed_df, min_samples_train=5)
    miss = mixed_df["sex"].isna()
    expected = np.where(mixed_df.loc[miss, "age"] > 32, "male", "female")
    got = out.loc[miss, "sex"].to_numpy()
    # NaN-age rows may fall back; check rows with observed age
    has_age = mixed_df.loc[miss, "age"].notna().to_numpy()
    assert (got[has_age] == expected[has_age]).mean() >= 0.8


def test_fallback_mode_for_categoricals():
    # reference test_multivariate_imputer_fallback_mode_for_categoricals
    n = 12
    df = pd.DataFrame(
        {
            "cat": pd.Categorical(
                ["a", "a", "a", "b", None, "a", "a", None, "b", "a", "a", "a"]
            ),
            "value": np.arange(n, dtype=float),
        }
    )
    df.loc[3, "value"] = np.nan
    out = impute_mixed(df, min_samples_train=n + 1)
    assert out["cat"].isna().sum() == 0
    assert (out.loc[[4, 7], "cat"] == "a").all()
    assert isinstance(out["cat"].dtype, pd.CategoricalDtype)


def test_boolean_support():
    rng = np.random.default_rng(1)
    n = 60
    flag = rng.random(n) > 0.5
    x = np.where(flag, 5.0, -5.0) + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"flag": pd.array(flag, dtype="boolean"), "x": x})
    df.loc[::7, "flag"] = pd.NA
    out = impute_mixed(df, min_samples_train=5)
    assert out["flag"].isna().sum() == 0
    assert out["flag"].dtype.name == "boolean"
    obs = df["flag"].notna()
    assert (out.loc[obs, "flag"] == df.loc[obs, "flag"]).all()


def test_integer_column_round_trip():
    rng = np.random.default_rng(2)
    base = pd.Series(rng.integers(0, 100, 50).astype(np.float64))
    df = pd.DataFrame({"i": base, "j": base * 2 + 1})
    df.loc[5, "i"] = np.nan
    df = df.astype({"j": np.int64})
    out = impute_mixed(df, min_samples_train=5)
    # float col with int values stays float; int col dtype preserved
    assert out["j"].dtype == np.int64
    assert not out["i"].isna().any()


def test_string_dtype_restored():
    df = pd.DataFrame(
        {
            "s": pd.array(["x", "y", "x", None, "x", "y", "x", "x"], dtype="string"),
            "v": [1.0, 2.0, 1.0, 1.0, 1.0, 2.0, 1.0, np.nan],
        }
    )
    out = impute_mixed(df, min_samples_train=3)
    assert out["s"].dtype.name == "string"
    assert out["s"].isna().sum() == 0


def test_polars_round_trip():
    pl = pytest.importorskip("polars")
    df = pl.DataFrame(
        {
            "cat": ["a", "b", None, "a", "a", "b", "a", "a"],
            "v": [1.0, 5.0, 1.0, None, 1.0, 5.0, 1.0, 1.0],
        }
    )
    out = impute_mixed(df, min_samples_train=3)
    assert isinstance(out, pl.DataFrame)
    assert out["cat"].null_count() == 0
    assert out["v"].null_count() == 0
    with pytest.raises(EngineValueError, match="LazyFrame"):
        impute_mixed(df.lazy())


def test_reproducible(mixed_df):
    a = impute_mixed(mixed_df, min_samples_train=5, n_nearest_features=2)
    b = impute_mixed(mixed_df, min_samples_train=5, n_nearest_features=2)
    pd.testing.assert_frame_equal(a, b)


def test_rejects_datetime_columns():
    df = pd.DataFrame({"a": [1.0, 2.0]})
    df["when"] = pd.to_datetime(["2024-01-01", "2024-01-02"])
    with pytest.raises(EngineValueError, match="numeric columns"):
        impute_mixed(df)


def test_nearest_centroid_deterministic_ties():
    clf = NearestCentroidClassifier()
    X = np.array([[0.0], [0.0], [2.0], [2.0]])
    y = np.array([0, 0, 1, 1])
    clf.fit(X, y)
    # midpoint is equidistant -> smaller class code wins
    assert clf.predict(np.array([[1.0]]))[0] == 0
    np.testing.assert_array_equal(clf.predict(np.array([[-1.0], [3.0]])), [0, 1])


def test_cart_classifier_basics():
    from datafiller_ray.functions.cart import DecisionTreeClassifier

    rng = np.random.default_rng(3)
    # axis-aligned separable classes: a depth-4 tree must fit exactly
    X = rng.uniform(-1, 1, size=(200, 3))
    y = (X[:, 0] > 0).astype(np.int64) + 2 * (X[:, 1] > 0.3).astype(np.int64)
    clf = DecisionTreeClassifier(max_depth=4).fit(X, y)
    assert np.array_equal(clf.predict(X), y)
    # non-contiguous class codes survive the round trip
    y2 = np.where(y == 0, 7, np.where(y == 1, 3, 11))
    clf2 = DecisionTreeClassifier(max_depth=4).fit(X, y2)
    assert set(np.unique(clf2.predict(X))) <= {3, 7, 11}
    # single-class node predicts that class
    clf3 = DecisionTreeClassifier().fit(X[:5], np.full(5, 9))
    assert np.array_equal(clf3.predict(X[:3]), [9, 9, 9])
    # constant features -> no split -> majority with ties to smallest code
    Xc = np.zeros((4, 2))
    clf4 = DecisionTreeClassifier().fit(Xc, np.array([5, 5, 2, 2]))
    assert np.array_equal(clf4.predict(Xc[:1]), [2])


def test_cart_matches_independent_oracle_rederivation():
    """The engine CART and the test oracle's recursive re-derivation follow
    the same documented split spec; on random (tie-heavy, grid-valued)
    data they must agree bit-for-bit."""
    import sys

    sys.path.insert(0, "tests")
    from oracle.fills import _cart_fit_predict

    from datafiller_ray.functions.cart import DecisionTreeClassifier

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(10, 120))
        d = int(rng.integers(1, 5))
        # grid-valued features make score ties and exact midpoints common
        X = rng.integers(0, 6, size=(n, d)).astype(np.float64) / 4.0
        y = rng.integers(0, 4, size=n).astype(np.int64)
        Xp = rng.integers(0, 6, size=(30, d)).astype(np.float64) / 4.0
        got = DecisionTreeClassifier(max_depth=4).fit(X, y).predict(Xp)
        want = _cart_fit_predict(X, y, Xp, max_depth=4)
        assert np.array_equal(got, want), trial
