"""Dataset-surface tests (reference ``tests/test_datasets_misc.py`` semantics).

Pure pandas surface — no Ray needed.
"""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.config import EngineValueError
from datafiller_ray.datasets import (
    add_contiguous_missing,
    add_mar,
    load_pems_bay,
    load_titanic,
    synthetic_pems_bay,
    synthetic_titanic,
)


@pytest.fixture
def df():
    gen = np.random.default_rng(0)
    return pd.DataFrame(gen.normal(size=(200, 8)), columns=[f"col_{i}" for i in range(8)])


# -- add_mar ----------------------------------------------------------------


@pytest.mark.parametrize("nan_ratio", [-0.1, 1.5])
def test_add_mar_invalid_ratio_raises(df, nan_ratio):
    with pytest.raises(EngineValueError, match="nan_ratio must be between 0 and 1"):
        add_mar(df, nan_ratio=nan_ratio)


def test_add_mar_is_valueerror_subclass(df):
    # reference raises a ValueError subclass; ours must be catchable the same way
    with pytest.raises(ValueError):
        add_mar(df, nan_ratio=2.0)


def test_add_mar_hits_requested_ratio(df):
    out = add_mar(df, nan_ratio=0.3, rng=0)
    assert out.isna().to_numpy().mean() == pytest.approx(0.3, abs=0.05)
    assert not df.isna().any().any(), "input must not be modified"


@pytest.mark.parametrize("nan_ratio, expected", [(0.0, 0.0), (1.0, 1.0)])
def test_add_mar_boundary_ratios(df, nan_ratio, expected):
    out = add_mar(df, nan_ratio=nan_ratio, rng=0)
    assert out.isna().to_numpy().mean() == expected


def test_add_mar_reproducible_with_seed(df):
    pd.testing.assert_frame_equal(
        add_mar(df, nan_ratio=0.2, rng=42), add_mar(df, nan_ratio=0.2, rng=42)
    )


def test_add_mar_mixed_dtypes():
    # object/categorical columns must take NaN without dtype errors
    base = synthetic_titanic(n_rows=120, rng=3)
    out = add_mar(base[["age", "sex", "class"]].copy(), nan_ratio=0.5, rng=1)
    assert out.isna().to_numpy().mean() == pytest.approx(0.5, abs=0.1)


# -- add_contiguous_missing -------------------------------------------------


@pytest.mark.parametrize("frac_columns", [-0.1, 1.5])
def test_contiguous_invalid_frac_raises(df, frac_columns):
    with pytest.raises(EngineValueError, match="frac_columns must be between 0 and 1"):
        add_contiguous_missing(df, frac_columns=frac_columns, length=10)


def test_contiguous_int_length(df):
    out = add_contiguous_missing(df, frac_columns=0.5, length=10, rng=0)
    modified = [c for c in df.columns if out[c].isna().any()]
    assert len(modified) == 4
    assert not df.isna().any().any(), "input must not be modified"
    for col in modified:
        pos = np.flatnonzero(out[col].isna().to_numpy())
        assert len(pos) == 10
        assert np.array_equal(pos, np.arange(pos[0], pos[0] + 10)), f"{col} block not contiguous"


def test_contiguous_float_length(df):
    out = add_contiguous_missing(df, frac_columns=0.25, length=0.1, rng=0)
    modified = [c for c in df.columns if out[c].isna().any()]
    assert len(modified) == 2
    for col in modified:
        assert out[col].isna().sum() == 20  # 10% of 200 rows


def test_contiguous_length_capped(df):
    out = add_contiguous_missing(df, frac_columns=1.0, length=10_000, rng=0)
    assert out.isna().all().all()


def test_contiguous_reproducible_with_seed(df):
    pd.testing.assert_frame_equal(
        add_contiguous_missing(df, frac_columns=0.5, length=15, rng=7),
        add_contiguous_missing(df, frac_columns=0.5, length=15, rng=7),
    )


# -- loaders ----------------------------------------------------------------


@pytest.mark.parametrize("loader", [load_titanic, load_pems_bay])
def test_download_loaders_lazy_import_contract(loader):
    # no pooch in-sandbox: the reference's lazy-import ImportError must fire
    try:
        import pooch  # noqa: F401

        pytest.skip("pooch present; download path not exercised offline")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pooch is required"):
        loader()


def test_synthetic_titanic_shape_contract():
    df1 = synthetic_titanic(rng=0)
    df2 = synthetic_titanic(rng=0)
    pd.testing.assert_frame_equal(df1, df2)  # deterministic
    assert len(df1) == 891
    # mixed-dtype profile with NaNs in both numeric and categorical columns
    assert df1["age"].isna().any() and pd.api.types.is_float_dtype(df1["age"])
    assert df1["deck"].isna().any() and df1["deck"].dtype == object
    assert df1["embarked"].isna().any()
    assert isinstance(df1["class"].dtype, pd.CategoricalDtype)
    assert df1["adult_male"].dtype == bool


def test_synthetic_pems_bay_shape_contract():
    df = synthetic_pems_bay(n_sensors=4, n_steps=288, rng=1)
    assert df.index.name == "time"
    assert df.columns.name == "sensor_id"
    assert pd.infer_freq(df.index) in ("5min", "5T")
    assert df.shape == (288, 4)
    assert df.dtypes.map(pd.api.types.is_float_dtype).all()
    pd.testing.assert_frame_equal(df, synthetic_pems_bay(n_sensors=4, n_steps=288, rng=1))


# -- end-to-end demos -------------------------------------------------------


def test_impute_mixed_on_synthetic_titanic():
    from datafiller_ray.functions.categorical import impute_mixed

    df = synthetic_titanic(n_rows=400, rng=5)
    out = impute_mixed(df, min_samples_train=20)
    assert out.shape == df.shape
    assert not out["age"].isna().any()
    assert not out["deck"].isna().any()
    # filled categorical values come from the observed category set
    assert set(out["deck"].unique()) <= set("ABCDEFG")
    # observed cells are untouched
    obs = df["fare"].notna()
    np.testing.assert_allclose(out.loc[obs, "fare"], df.loc[obs, "fare"])


def test_timeseries_filler_on_synthetic_pems_bay():
    from datafiller_ray.frame import TimeSeriesFiller

    panel = synthetic_pems_bay(n_sensors=6, n_steps=576, rng=2)
    holed = add_contiguous_missing(panel, frac_columns=0.5, length=24, rng=3)
    holed = add_mar(holed, nan_ratio=0.02, rng=4)
    out = TimeSeriesFiller(lags=(1, 2, 3, -1, -2, -3), min_samples_train=30)(holed)
    assert out.shape == panel.shape
    assert out.isna().sum().sum() < holed.isna().sum().sum()
    # fills should be in a plausible speed range, not wild extrapolations
    filled_mask = holed.isna() & out.notna()
    vals = out.to_numpy()[filled_mask.to_numpy()]
    assert len(vals) > 0
    assert np.all(vals > 0) and np.all(vals < 150)
