"""Mixed-dtype (categorical / string / boolean) imputation.

Engine analogue of the reference's encode -> impute -> decode path
(``/root/reference/src/datafiller/multivariate/imputer.py:288-402``):

- ``encode_frame``: each categorical/string/bool column becomes a main
  column of float label codes (NaN for missing) plus masked one-hot helper
  columns; numeric columns pass through. (``_encode_dataframe``)
- categorical targets are predicted by a CLASSIFIER over the standardized
  features; the default matches the reference's shape — a depth-4 CART
  (``DecisionTreeClassifier(max_depth=4)`` there, a deterministic pure-NumPy
  re-derivation in ``functions/cart.py`` here, since the sandbox has no
  sklearn). ``NearestCentroidClassifier`` remains a pluggable option via
  the same ``classifier=`` hook.
- fallback fills remaining categorical cells with the most frequent
  observed category, numeric cells with the column mean
  (``_apply_fallback``, ``imputer.py:744-770``).
- ``decode_frame``: codes map back to category values and the original
  dtype is restored — Categorical (categories + ordered), pandas "string",
  nullable "boolean", integers via round + cast with Int64 fallback
  (``_decode_dataframe`` / ``_cast_series_to_dtype``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pandas.api.types import (
    is_bool_dtype,
    is_float_dtype,
    is_integer_dtype,
    is_object_dtype,
    is_string_dtype,
)

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.cart import DecisionTreeClassifier


def is_categorical_series(series: pd.Series) -> bool:
    """The reference's categorical rule (``imputer.py:298-306``)."""
    return (
        isinstance(series.dtype, pd.CategoricalDtype)
        or is_object_dtype(series.dtype)
        or is_string_dtype(series.dtype)
        or is_bool_dtype(series.dtype)
    )


class NearestCentroidClassifier:
    """Deterministic pure-NumPy classifier for categorical targets: class
    centroids in (standardized) feature space, predict = nearest centroid,
    ties to the smaller class code."""

    def fit(self, X: np.ndarray, y: np.ndarray) -> "NearestCentroidClassifier":
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.int64)
        self.classes_ = np.unique(y)
        self.centroids_ = np.stack([X[y == c].mean(axis=0) for c in self.classes_])
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        # squared distance to each centroid; argmin ties -> first (= smaller
        # class code, classes_ sorted by np.unique)
        d = ((X[:, None, :] - self.centroids_[None, :, :]) ** 2).sum(axis=2)
        return self.classes_[np.argmin(d, axis=1)]


def encode_frame(df: pd.DataFrame) -> dict:
    """Encode a mixed-dtype DataFrame into a float matrix + metadata."""
    # all-numeric fast path: one block conversion instead of 2 copies per
    # column (dominant on wide panels)
    if all(
        (is_integer_dtype(d) or is_float_dtype(d)) and not is_bool_dtype(d)
        for d in df.dtypes
    ):
        return {
            "data": df.to_numpy(dtype=np.float64),
            "main_column_indices": np.arange(df.shape[1], dtype=np.int64),
            "encoded_feature_names": [str(c) for c in df.columns],
            "categorical_targets": {},
            "original_dtypes": df.dtypes.to_dict(),
        }
    arrays: list[np.ndarray] = []
    names: list[str] = []
    main_idx: list[int] = []
    categorical_targets: dict[int, list] = {}

    for col in df.columns:
        series = df[col]
        idx = len(names)
        main_idx.append(idx)
        names.append(str(col))
        if is_categorical_series(series):
            if isinstance(series.dtype, pd.CategoricalDtype):
                categories = series.cat.categories.tolist()
            else:
                categories = pd.Categorical(series.dropna()).categories.tolist()
            cat = pd.Categorical(series, categories=categories)
            codes = cat.codes.astype(np.float64)
            codes[codes == -1] = np.nan
            categorical_targets[idx] = categories
            arrays.append(codes.reshape(-1, 1))
            dummies = pd.get_dummies(series, prefix=str(col), dummy_na=False)
            if len(dummies.columns):
                if series.isna().any():
                    dummies = dummies.mask(series.isna())
                names.extend(str(c) for c in dummies.columns)
                arrays.append(dummies.to_numpy(dtype=np.float64))
        else:
            if not (is_integer_dtype(series.dtype) or is_float_dtype(series.dtype)):
                raise EngineValueError(
                    f"column {col!r}: imputation requires numeric columns or "
                    "categorical/string/boolean ones"
                )
            arrays.append(series.to_numpy(dtype=np.float64).reshape(-1, 1))

    return {
        "data": np.concatenate(arrays, axis=1),
        "main_column_indices": np.asarray(main_idx, dtype=np.int64),
        "encoded_feature_names": names,
        "categorical_targets": categorical_targets,
        "original_dtypes": df.dtypes.to_dict(),
    }


def _cast_back(series: pd.Series, dtype) -> pd.Series:
    if is_integer_dtype(dtype):
        rounded = series.round()
        try:
            return rounded.astype(dtype)
        except (TypeError, ValueError):
            return rounded.astype(pd.Int64Dtype())
    return series.astype(dtype)


def decode_frame(
    x_imputed: np.ndarray,
    index: pd.Index,
    columns: pd.Index,
    main_column_indices: np.ndarray,
    categorical_targets: dict[int, list],
    original_dtypes: dict,
) -> pd.DataFrame:
    """Decode the imputed matrix back to the original layout and dtypes."""
    data = {}
    for i, col in enumerate(columns):
        j = int(main_column_indices[i])
        col_data = x_imputed[:, j]
        dtype = original_dtypes[col]
        if j in categorical_targets:
            categories = categorical_targets[j]
            mask = np.isnan(col_data)
            decoded = np.full(len(col_data), np.nan, dtype=object)
            if len(categories) and np.any(~mask):
                cat_vals = np.array(categories, dtype=object)
                decoded[~mask] = cat_vals[col_data[~mask].astype(np.int64)]
            if is_bool_dtype(dtype):
                series = pd.Series(decoded, index=index, dtype="boolean")
            elif isinstance(dtype, pd.CategoricalDtype):
                series = pd.Series(
                    pd.Categorical(
                        decoded,
                        categories=dtype.categories
                        if dtype.categories is not None
                        else categories,
                        ordered=getattr(dtype, "ordered", False),
                    ),
                    index=index,
                )
            elif is_string_dtype(dtype) and not is_object_dtype(dtype):
                series = pd.Series(decoded, index=index, dtype="string")
            else:
                series = pd.Series(decoded, index=index)
        else:
            series = _cast_back(pd.Series(col_data, index=index), dtype)
        data[col] = series
    return pd.DataFrame(data, index=index, columns=columns)


def impute_mixed(
    df: pd.DataFrame,
    *,
    cols_to_impute=None,
    rows_to_impute=None,
    n_nearest_features: int | None = None,
    alpha: float = 1e-2,
    min_samples_train: int = 20,
    fallback: str | None = "simple",
    use_optimask: bool = True,
    classifier=DecisionTreeClassifier,
    device: "str | None" = None,
) -> pd.DataFrame:
    """DataFrame-level mixed-dtype imputation (encode -> impute -> decode).

    ``cols_to_impute`` names original columns (str) or positions (int);
    helper one-hot columns are only ever features. Polars DataFrames are
    accepted and returned as polars (null <-> NaN round trip)."""
    pl_frame = False
    null_masks: dict = {}
    try:  # optional polars support, mirrors the reference's _polars.py
        import polars as pl

        if isinstance(df, pl.DataFrame):
            pl_frame = True
            # polars distinguishes null from NaN; pandas cannot. Record the
            # null cells so unfilled ones decode back to null, not NaN
            # (reference _polars.py:83,151-157 round-trip semantics)
            null_masks = {c: df.get_column(c).is_null().to_numpy() for c in df.columns}
            df = df.to_pandas()
        elif isinstance(df, pl.LazyFrame):
            raise EngineValueError(
                "LazyFrame input is not supported; collect() it first"
            )
    except ImportError:  # pragma: no cover
        pass
    if not isinstance(df, pd.DataFrame):
        raise EngineValueError("impute_mixed expects a pandas or polars DataFrame")

    from datafiller_ray.functions.multivariate import impute_matrix

    enc = encode_frame(df)
    main = enc["main_column_indices"]
    if cols_to_impute is None:
        target_cols = main
    else:
        items = (
            [cols_to_impute] if isinstance(cols_to_impute, (int, str)) else list(cols_to_impute)
        )
        unknown = [c for c in items if isinstance(c, str) and c not in df.columns]
        if unknown:
            raise EngineValueError(f"Column labels not found in columns: {unknown}")
        positions = []
        for c in items:
            if isinstance(c, str):
                positions.append(int(main[list(df.columns).index(c)]))
            elif isinstance(c, (int, np.integer)):
                positions.append(int(main[int(c)]))
            else:
                raise EngineValueError(
                    "cols_to_impute must be an int, str, or an iterable of those"
                )
        target_cols = np.asarray(positions, dtype=np.int64)

    out, _ = impute_matrix(
        enc["data"],
        cols_to_impute=target_cols,
        rows_to_impute=rows_to_impute,
        n_nearest_features=n_nearest_features,
        alpha=alpha,
        min_samples_train=min_samples_train,
        fallback=fallback,
        use_optimask=use_optimask,
        categorical_cols=set(int(i) for i in enc["categorical_targets"]),
        classifier=classifier,
        device=device,
    )
    decoded = decode_frame(
        out,
        df.index,
        df.columns,
        main,
        enc["categorical_targets"],
        enc["original_dtypes"],
    )
    if pl_frame:
        return restore_polars_nulls(decoded, null_masks)
    return decoded


def restore_polars_nulls(decoded: pd.DataFrame, null_masks: dict):
    """pandas -> polars with null-vs-NaN distinction restored for float
    columns: a cell is null only if it was ORIGINALLY null and is still
    unfilled; NaN-originated unfilled cells stay NaN (reference
    ``_polars.py:151-157``)."""
    import polars as pl

    out = pl.from_pandas(decoded)
    fixes = []
    for c in out.columns:
        if out[c].dtype.is_float() and c in null_masks and null_masks[c].any():
            vals = out[c].to_numpy()
            make_null = null_masks[c] & np.isnan(vals)
            if make_null.any():
                fixes.append(
                    pl.Series(
                        c,
                        [None if m else v for v, m in zip(vals, make_null)],
                        dtype=out[c].dtype,
                    )
                )
    if fixes:
        out = out.with_columns(fixes)
    return out
