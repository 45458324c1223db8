"""DataFrame-level TimeSeriesFiller: reference API-surface parity pins
(``reference/tests/test_errors.py:165-200`` and the TimeSeriesImputer basic
suites)."""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.config import EngineTypeError, EngineValueError
from datafiller_ray.frame import TimeSeriesFiller, infer_index_frequency


def _ts_frame(n=60, seed=3):
    rng = np.random.default_rng(seed)
    idx = pd.date_range("2024-01-01", periods=n, freq="h")
    a = np.cumsum(rng.standard_normal(n)) + 50
    b = a * 2 + rng.standard_normal(n) * 0.1
    df = pd.DataFrame({"a": a, "b": b}, index=idx)
    df.iloc[5:8, 0] = np.nan
    df.iloc[20, 1] = np.nan
    return df


def test_rejects_non_dataframe():
    with pytest.raises(EngineTypeError, match="pandas or eager Polars"):
        TimeSeriesFiller()(np.zeros((5, 2)))


def test_rejects_non_datetime_index():
    with pytest.raises(EngineTypeError, match="DatetimeIndex"):
        TimeSeriesFiller()(pd.DataFrame({"a": [1.0, 2.0]}))


@pytest.mark.parametrize(
    "timestamps, match",
    [
        (["2024-01-01"], "at least two timestamps"),
        (["2024-01-02", "2024-01-01"], "sorted in increasing order"),
        (["2024-01-01", "2024-01-01"], "duplicate timestamps"),
        (["2024-01-01", "2024-01-02", "2024-01-03 12:00"], "irregular timestamp gaps"),
    ],
)
def test_invalid_index_raises(timestamps, match):
    index = pd.DatetimeIndex(timestamps)
    df = pd.DataFrame({"a": np.ones(len(index))}, index=index)
    with pytest.raises(EngineValueError, match=match):
        TimeSeriesFiller()(df)


def test_invalid_cols_to_impute_type_raises():
    with pytest.raises(EngineValueError, match="int, str, or an iterable"):
        TimeSeriesFiller()(_ts_frame(), cols_to_impute=[1.5])


def test_rejects_datetime_data_columns():
    df = _ts_frame()
    df["when"] = df.index
    with pytest.raises(EngineValueError, match="numeric columns"):
        TimeSeriesFiller()(df)


def test_basic_fill_and_regularization():
    df = _ts_frame()
    # drop two interior timestamps: they must come back as imputed rows
    df = df.drop(df.index[[10, 11]])
    out = TimeSeriesFiller(min_samples_train=5)(df)
    assert len(out) == 60
    assert not out.isna().any().any()
    # observed cells pass through exactly
    common = df.index
    np.testing.assert_array_equal(
        out.loc[common, "b"].iloc[:5].to_numpy(), df["b"].iloc[:5].to_numpy()
    )


def test_correlated_column_fill_beats_mean():
    df = _ts_frame(n=200)
    truth = df["a"].copy()
    df.iloc[50:55, 0] = np.nan
    out = TimeSeriesFiller(min_samples_train=10, fallback=None)(df)
    err = np.abs(out["a"].iloc[50:55] - truth.iloc[50:55]).mean()
    assert err < 0.5  # b = 2a + noise predicts a well


def test_mixed_dtypes_in_frame():
    n = 100
    rng = np.random.default_rng(0)
    idx = pd.date_range("2024-01-01", periods=n, freq="D")
    flag = rng.choice(["on", "off"], n).astype(object)
    x = np.where(flag == "on", 10.0, -10.0) + rng.normal(0, 0.5, n)
    df = pd.DataFrame({"flag": flag, "x": x}, index=idx)
    df.loc[df.index[::9], "flag"] = None
    out = TimeSeriesFiller(min_samples_train=5)(df)
    assert out["flag"].isna().sum() == 0
    assert set(out["flag"].unique()).issubset({"on", "off"})
    masked = df["flag"].isna()
    expected = np.where(df.loc[masked, "x"] > 0, "on", "off")
    assert (out.loc[masked, "flag"].to_numpy() == expected).mean() > 0.8


def test_before_after_row_selectors():
    df = _ts_frame()
    cut = df.index[30]
    out = TimeSeriesFiller(min_samples_train=5)(df, before=cut)
    # gaps before the cut are filled, the one at position 20 of col b... all
    # na cells in rows >= cut stay; rows 5:8 (col a) are < cut -> filled
    assert not out["a"].iloc[5:8].isna().any()
    out2 = TimeSeriesFiller(min_samples_train=5)(df, after=cut)
    assert out2["a"].iloc[5:8].isna().all()


def test_interpolate_gaps_less_than_pre_pass():
    df = _ts_frame()
    out = TimeSeriesFiller(
        min_samples_train=10_000, fallback=None, interpolate_gaps_less_than=5
    )(df)
    # model cannot train (threshold too high), but the linear pre-pass fills
    # the 3-long interior gap
    assert not out["a"].iloc[5:8].isna().any()


def test_polars_round_trip():
    pl = pytest.importorskip("polars")
    idx = pd.date_range("2024-01-01", periods=40, freq="h")
    a = np.linspace(0, 10, 40)
    pdf = pd.DataFrame({"t": idx, "a": a, "b": a * 3})
    pdf.loc[7, "a"] = np.nan
    df = pl.from_pandas(pdf)
    filler = TimeSeriesFiller(time_column="t", min_samples_train=5)
    out = filler(df)
    assert isinstance(out, pl.DataFrame)
    assert out["a"].null_count() == 0 and not np.isnan(out["a"].to_numpy()).any()
    with pytest.raises(EngineTypeError, match="LazyFrame"):
        filler(df.lazy())
    with pytest.raises(EngineValueError, match="time_column"):
        TimeSeriesFiller()(df)


def test_infer_index_frequency_calendar():
    # month-start cadence: pd.infer_freq path (no fixed timedelta exists)
    idx = pd.date_range("2024-01-01", periods=6, freq="MS")
    assert infer_index_frequency(idx) is not None
    df = pd.DataFrame({"v": [1.0, np.nan, 3.0, 4.0, 5.0, 6.0]}, index=idx)
    out = TimeSeriesFiller(min_samples_train=3, lags=(1, -1))(df)
    assert not out["v"].isna().any()


def test_transformer_protocol_fit_transform():
    """Engine analogue of reference/tests/test_pipeline_imputers.py — the
    sklearn transformer duck protocol without sklearn present."""
    from datafiller_ray.frame import MultivariateFiller

    X = np.array([[1.0, 2.0, 3.0], [4.0, np.nan, 6.0], [7.0, 8.0, 9.0]])
    imp = MultivariateFiller(min_samples_train=2)
    out = imp.fit_transform(X)
    assert out.shape == X.shape and not np.isnan(out).any()
    assert imp.fit(X) is imp
    np.testing.assert_array_equal(imp.transform(X), out)

    df = _ts_frame()
    filler = TimeSeriesFiller(min_samples_train=5)
    out_df = filler.fit_transform(df)
    assert isinstance(out_df, pd.DataFrame)
    assert out_df.shape[0] == 60 and not out_df.isna().any().any()


def test_transformer_protocol_params():
    from datafiller_ray.frame import MultivariateFiller

    imp = MultivariateFiller(alpha=0.5)
    assert imp.get_params()["alpha"] == 0.5
    imp.set_params(alpha=0.25, min_samples_train=7)
    assert imp.alpha == 0.25 and imp.min_samples_train == 7
    with pytest.raises(EngineValueError, match="unknown parameters"):
        imp.set_params(bogus=1)
    f = TimeSeriesFiller(lags=(1, 2))
    f.set_params(lags=(3,))
    assert f.lags == (3,) and f.get_params()["lags"] == (3,)


def test_multivariate_filler_dataframe_path():
    from datafiller_ray.frame import MultivariateFiller

    df = pd.DataFrame(
        {"cat": ["a", "b", None, "a", "a", "b", "a", "a"],
         "v": [1.0, 5.0, 1.0, np.nan, 1.0, 5.0, 1.0, 1.0]}
    )
    out = MultivariateFiller(min_samples_train=3)(df)
    assert out["cat"].isna().sum() == 0 and not out["v"].isna().any()


def test_polars_fallback_none_preserves_null_vs_nan():
    """Reference test_multivariate_imputer_polars_fallback_none_preserves_
    null_and_nan: a cell that was polars NULL and stays unfilled decodes
    back to null; a NaN-originated one stays NaN."""
    pl = pytest.importorskip("polars")
    from datafiller_ray.functions.categorical import impute_mixed

    df = pl.DataFrame(
        {"value": [1.0, None, np.nan, 4.0], "feature": [1.0, 2.0, 3.0, 4.0]}
    )
    out = impute_mixed(df, min_samples_train=10, fallback=None)
    assert out["value"][1] is None
    assert np.isnan(out["value"][2])


def test_polars_frame_null_restore_through_regularization():
    pl = pytest.importorskip("polars")
    idx = pd.date_range("2024-01-01", periods=8, freq="h")
    df = pl.DataFrame(
        {
            "t": list(idx.to_pydatetime()),
            "a": [1.0, None, float("nan"), 4.0, 5.0, 6.0, 7.0, 8.0],
        }
    )
    # with an untrainable model and no fallback, both gaps stay unfilled:
    # row 1 (null-originated) must return null, row 2 (NaN) must return NaN
    filler = TimeSeriesFiller(min_samples_train=10_000, fallback=None, time_column="t")
    out = filler(df)
    assert out["a"][1] is None
    assert np.isnan(out["a"][2])


def test_all_nan_original_column_survives_frame():
    # reference test_timeseries_imputer_keeps_fully_missing_original_column
    df = _ts_frame()
    df["empty"] = np.nan
    out = TimeSeriesFiller(min_samples_train=5)(df)
    assert out["empty"].isna().all()
    assert not out["a"].isna().any()


def test_frame_cols_to_impute_restricts():
    df = _ts_frame()
    out = TimeSeriesFiller(min_samples_train=5)(df, cols_to_impute=["b"])
    assert out["a"].isna().sum() == df["a"].isna().sum()  # untouched
    assert not out["b"].isna().any()
