"""DataFrame-level time-series fill API.

``TimeSeriesFiller`` is the engine's analogue of the reference's
``TimeSeriesImputer`` surface (``/root/reference/src/datafiller/timeseries/
imputer.py:93-530``): a pandas DataFrame with a DatetimeIndex (or an eager
polars DataFrame with ``time_column``) is regularized onto its inferred
grid, optionally small-gap interpolated, lag/calendar features are built
jointly over all columns, and gaps are imputed with the engine's
multivariate machinery (ridge for numeric targets, a deterministic
pure-NumPy depth-4 CART for categorical ones — the reference's
DecisionTreeClassifier(max_depth=4) default, re-derived without sklearn).

This is the single-machine convenience wrapper; the distributed story for
the same semantics is ``pipelines.panel.knn_fill(lags=...)`` and the rollup
fills. A cohort-sized frame is the intended input.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from datafiller_ray.config import EngineTypeError, EngineValueError
from datafiller_ray.functions.cart import DecisionTreeClassifier
from datafiller_ray.functions.categorical import (
    decode_frame,
    encode_frame,
)
from datafiller_ray.functions.gapfill import fill_linear
from datafiller_ray.functions.multivariate import impute_matrix


def infer_index_frequency(index: pd.DatetimeIndex):
    """Infer the regular frequency of a DatetimeIndex — reference
    ``_infer_frequency`` semantics (``timeseries/imputer.py:188-213``):
    declared freq wins; calendar frequencies via ``pd.infer_freq``; else the
    min-positive-delta + divisibility rule with the reference's errors."""
    if index.freq is not None:
        return index.freq
    if len(index) < 2:
        raise EngineValueError(
            "DataFrame index must have a frequency or at least two timestamps to infer one"
        )
    if len(index) >= 3:
        inferred = pd.infer_freq(index)
        if inferred is not None:
            return inferred
    if not index.is_monotonic_increasing:
        raise EngineValueError("DataFrame index must be sorted in increasing order")
    if index.has_duplicates:
        raise EngineValueError("DataFrame index must not contain duplicate timestamps")
    ns = index.asi8
    deltas = np.diff(ns)
    positive = deltas[deltas > 0]
    if not positive.size:
        raise EngineValueError("DataFrame index frequency could not be inferred")
    base = positive.min()
    if np.any(positive % base != 0):
        raise EngineValueError(
            "DataFrame index frequency could not be inferred from irregular timestamp gaps"
        )
    return pd.Timedelta(int(base), unit="ns")


def regularize_index(df: pd.DataFrame) -> pd.DataFrame:
    """Reindex onto the complete regular grid (``_regularize_index``)."""
    freq = infer_index_frequency(df.index)
    full = pd.date_range(df.index[0], df.index[-1], freq=freq, name=df.index.name)
    if len(full) == len(df.index) and full.equals(df.index):
        return df
    return df.reindex(full)


class TimeSeriesFiller:
    """Fill gaps in a (cohort-sized) time-indexed DataFrame.

    Args mirror the reference's knobs that are meaningful without sklearn:
    ``lags`` (positive = lags, negative = leads), ``alpha`` /
    ``min_samples_train`` / ``fallback`` for the ridge path, ``classifier``
    for categorical targets, ``interpolate_gaps_less_than`` for the linear
    pre-pass, ``add_time_features``, and ``time_column`` for polars input.
    """

    def __init__(
        self,
        *,
        lags: Iterable[int] = (1,),
        alpha: float = 1e-2,
        min_samples_train: int = 20,
        fallback: str | None = "simple",
        interpolate_gaps_less_than: int | None = None,
        add_time_features: bool = True,
        time_column: str | None = None,
        classifier=DecisionTreeClassifier,
        use_optimask: bool = True,
        device: str | None = None,
    ) -> None:
        if isinstance(lags, (int, np.integer, str)) or not all(
            isinstance(l, (int, np.integer)) for l in lags
        ):
            raise EngineValueError("lags must be an iterable of integers")
        self.lags = tuple(int(l) for l in lags)
        if time_column is not None and not isinstance(time_column, str):
            raise EngineValueError("time_column must be a string or None")
        self.alpha = alpha
        self.min_samples_train = min_samples_train
        if fallback not in (None, "simple"):
            raise EngineValueError("fallback must be 'simple' or None")
        self.fallback = fallback
        self.interpolate_gaps_less_than = interpolate_gaps_less_than
        self.add_time_features = add_time_features
        self.time_column = time_column
        self.classifier = classifier
        self.use_optimask = use_optimask
        self.device = device
        self._params = dict(
            lags=self.lags,
            alpha=alpha,
            min_samples_train=min_samples_train,
            fallback=fallback,
            interpolate_gaps_less_than=interpolate_gaps_less_than,
            add_time_features=add_time_features,
            time_column=time_column,
            classifier=classifier,
            use_optimask=use_optimask,
            device=device,
        )

    # -- input/output conversion -------------------------------------------

    def _from_polars(self, df):
        import polars as pl

        if self.time_column is None:
            raise EngineValueError(
                "time_column must be set for a Polars DataFrame input"
            )
        if self.time_column not in df.columns:
            raise EngineValueError(
                f"time_column {self.time_column!r} not found in the DataFrame"
            )
        # null-vs-NaN round trip: record which cells were polars NULLs (by
        # timestamp — regularization reinserts rows, so positions shift)
        null_ts = {
            c: df.get_column(self.time_column).filter(df.get_column(c).is_null()).to_numpy()
            for c in df.columns
            if c != self.time_column
        }
        pdf = df.to_pandas()
        pdf = pdf.set_index(self.time_column)
        if not isinstance(pdf.index, pd.DatetimeIndex):
            raise EngineTypeError(
                "the Polars time_column must be a Date or Datetime column"
            )
        return pdf, null_ts

    def _to_polars(self, pdf: pd.DataFrame, null_ts: dict):
        from datafiller_ray.functions.categorical import restore_polars_nulls

        out = pdf.reset_index(names=self.time_column)
        masks = {
            c: pdf.index.isin(ts).to_numpy()
            if hasattr(pdf.index.isin(ts), "to_numpy")
            else np.asarray(pdf.index.isin(ts))
            for c, ts in null_ts.items()
        }
        return restore_polars_nulls(out, masks)

    # -- main entry ---------------------------------------------------------

    def __call__(
        self,
        df,
        rows_to_impute=None,
        cols_to_impute=None,
        n_nearest_features: int | None = None,
        before=None,
        after=None,
    ):
        try:
            import polars as pl

            if isinstance(df, pl.LazyFrame):
                raise EngineTypeError(
                    "Polars LazyFrame input is not supported; call collect() first"
                )
            is_pl = isinstance(df, pl.DataFrame)
        except ImportError:  # pragma: no cover
            is_pl = False
        null_ts: dict = {}
        if is_pl:
            df, null_ts = self._from_polars(df)
        elif not isinstance(df, pd.DataFrame):
            raise EngineTypeError("input must be a pandas or eager Polars DataFrame")
        elif not isinstance(df.index, pd.DatetimeIndex):
            raise EngineTypeError("DataFrame index must be a DatetimeIndex")

        df = regularize_index(df)
        index = df.index

        # linear small-gap pre-pass on numeric columns (reference
        # interpolate_gaps_less_than)
        if self.interpolate_gaps_less_than is not None:
            df = df.copy()
            for col in df.columns:
                s = df[col]
                if pd.api.types.is_numeric_dtype(s.dtype) and not pd.api.types.is_bool_dtype(s.dtype):
                    out, _ = fill_linear(
                        s.to_numpy(np.float64), self.interpolate_gaps_less_than
                    )
                    df[col] = out

        enc = encode_frame(df)
        main = enc["main_column_indices"]
        panel = enc["data"]
        n_enc = panel.shape[1]

        # joint lag blocks + calendar features over the ENCODED matrix
        # (reference lags categorical copies as features too,
        # timeseries/imputer.py:541-553)
        from datafiller_ray.pipelines.panel import build_panel_features

        grid_s = (index.asi8 // 1_000_000_000).astype(np.int64)
        matrix = build_panel_features(panel, grid_s, self.lags, self.add_time_features)
        # all-NaN generated columns are NOT dropped (the reference drops them
        # purely as an optimization): an all-NaN feature is unobserved in
        # every row pattern, so it can never be selected for training, and
        # with n_nearest_features its NaN scores sink in the ranking. Skipping
        # the drop avoids a full isnan pass + fancy-index copy of the widest
        # matrix in the engine.

        target_cols = self._resolve_cols(df, main, cols_to_impute)
        row_sel = self._resolve_rows(index, rows_to_impute, before, after)

        out, _ = impute_matrix(
            matrix,
            cols_to_impute=target_cols,
            rows_to_impute=row_sel,
            n_nearest_features=n_nearest_features,
            alpha=self.alpha,
            min_samples_train=self.min_samples_train,
            fallback=self.fallback,
            use_optimask=self.use_optimask,
            categorical_cols=set(int(i) for i in enc["categorical_targets"]),
            classifier=self.classifier,
            device=self.device,
        )
        decoded = decode_frame(
            out[:, :n_enc],
            index,
            df.columns,
            main,
            enc["categorical_targets"],
            enc["original_dtypes"],
        )
        return self._to_polars(decoded, null_ts) if is_pl else decoded

    # -- selector resolution ------------------------------------------------

    def _resolve_cols(self, df, main, cols_to_impute):
        if cols_to_impute is None:
            return main
        items = (
            [cols_to_impute]
            if isinstance(cols_to_impute, (int, str, np.integer))
            else list(cols_to_impute)
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
        return np.asarray(positions, dtype=np.int64)

    def _resolve_rows(self, index, rows_to_impute, before, after):
        sel = np.ones(len(index), dtype=bool)
        if before is not None:
            sel &= index < pd.to_datetime(str(before))
        if after is not None:
            sel &= index > pd.to_datetime(str(after))
        if rows_to_impute is not None:
            explicit = np.zeros(len(index), dtype=bool)
            items = (
                [rows_to_impute]
                if not isinstance(rows_to_impute, Iterable)
                or isinstance(rows_to_impute, str)
                else list(rows_to_impute)
            )
            missing = []
            for r in items:
                if isinstance(r, (int, np.integer)):
                    explicit[int(r)] = True
                else:
                    loc = index.get_indexer([pd.to_datetime(str(r))])
                    if loc[0] >= 0:
                        explicit[loc[0]] = True
                    else:
                        missing.append(r)
            if missing:
                raise EngineValueError(f"Row labels not found in index: {missing}")
            sel &= explicit
        if sel.all():
            return None
        return np.flatnonzero(sel)


class _SklearnProtocolMixin:
    """Duck-typed sklearn transformer protocol (fit/transform/fit_transform/
    get_params/set_params) — the reference subclasses sklearn's BaseEstimator
    + TransformerMixin (``timeseries/imputer.py:93``, pinned by
    ``reference/tests/test_pipeline_imputers.py``); sklearn is absent here,
    so the same protocol is provided directly. The imputers are stateless
    transformers: ``fit`` is a no-op returning self."""

    def fit(self, X, y=None):
        return self

    def transform(self, X):
        return self(X)

    def fit_transform(self, X, y=None, **fit_params):
        return self.fit(X, y).transform(X)

    def get_params(self, deep: bool = True) -> dict:
        return dict(self._params)

    def set_params(self, **params):
        unknown = set(params) - set(self._params)
        if unknown:
            raise EngineValueError(f"unknown parameters: {sorted(unknown)}")
        merged = {**self._params, **params}
        self.__init__(**merged)
        return self


class MultivariateFiller(_SklearnProtocolMixin):
    """Thin estimator-style wrapper over :func:`functions.multivariate.
    impute_matrix` — the engine analogue of ``MultivariateImputer``'s
    callable/transformer surface for ndarray and DataFrame inputs."""

    def __init__(
        self,
        *,
        n_nearest_features=None,
        alpha: float = 1e-2,
        min_samples_train: int = 20,
        fallback: str | None = "simple",
        use_optimask: bool = True,
        scoring="default",
        device: str | None = None,
    ) -> None:
        self._params = dict(
            n_nearest_features=n_nearest_features,
            alpha=alpha,
            min_samples_train=min_samples_train,
            fallback=fallback,
            use_optimask=use_optimask,
            scoring=scoring,
            device=device,
        )
        for k, v in self._params.items():
            setattr(self, k, v)

    def __call__(self, x, rows_to_impute=None, cols_to_impute=None):
        from datafiller_ray.functions.categorical import impute_mixed
        from datafiller_ray.functions.multivariate import impute_matrix

        if isinstance(x, pd.DataFrame) or type(x).__module__.startswith("polars"):
            return impute_mixed(
                x,
                rows_to_impute=rows_to_impute,
                cols_to_impute=cols_to_impute,
                n_nearest_features=self.n_nearest_features,
                alpha=self.alpha,
                min_samples_train=self.min_samples_train,
                fallback=self.fallback,
                use_optimask=self.use_optimask,
                device=self.device,
            )
        out, _ = impute_matrix(
            np.asarray(x),
            rows_to_impute=rows_to_impute,
            cols_to_impute=cols_to_impute,
            n_nearest_features=self.n_nearest_features,
            alpha=self.alpha,
            min_samples_train=self.min_samples_train,
            fallback=self.fallback,
            use_optimask=self.use_optimask,
            scoring_fn=self.scoring,
            device=self.device,
        )
        return out


# retrofit the transformer protocol (mixin defined below the class)
for _m in ("fit", "transform", "fit_transform", "get_params", "set_params"):
    setattr(TimeSeriesFiller, _m, getattr(_SklearnProtocolMixin, _m))
