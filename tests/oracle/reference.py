"""Pure-pandas oracle re-implementing the reference semantics (SURVEY.md §5).

Deliberately written in idiomatic pandas (DatetimeIndex-free, but using
``Series.interpolate`` / ``groupby`` / ``reindex``) so it shares no code path
with the engine's NumPy kernels. ``interpolate_small_gaps`` is re-derived
from ``/root/reference/src/datafiller/timeseries/_utils.py:51-67``;
the grid densification mirrors ``_regularize_index``
(``timeseries/imputer.py:215-223``); the mean fallback mirrors
``_apply_fallback`` (``multivariate/imputer.py:744-770``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def interpolate_small_gaps(series: pd.Series, n: int | None) -> pd.Series:
    """Verbatim semantics of the reference helper (timeseries/_utils.py:51-67)."""
    if n is None:
        n = len(series) + 1
    is_nan = series.isna()
    gaps = (is_nan != is_nan.shift()).cumsum()
    mask = series.groupby(gaps).transform("size") <= n
    return series.interpolate().where(mask, series)


def locf_small_gaps(series: pd.Series, n: int | None) -> pd.Series:
    """LOCF restricted to NaN runs of length <= n (engine's locf contract)."""
    if n is None:
        n = len(series) + 1
    is_nan = series.isna()
    gaps = (is_nan != is_nan.shift()).cumsum()
    mask = series.groupby(gaps).transform("size") <= n
    return series.ffill().where(mask, series)


def oracle_tier_rows(
    table: pa.Table,
    *,
    tiers: dict[str, int],
    strategy: str | None = "linear",
    max_gap: int | None = None,
    fallback: str | None = None,
) -> pd.DataFrame:
    """Expected tier rows for an input table, computed the pandas way."""
    df = table.select(["doc_id", "n_tok", "source"]).to_pandas()
    df["minute"] = df["doc_id"].str.rsplit(":", n=1).str[-1].astype(np.int64)
    df["ts"] = df["minute"] * 60

    out_frames = []
    for tier, step in tiers.items():
        b = (df["ts"] // step) * step
        agg = (
            df.groupby(["source", b])
            .agg(count=("n_tok", "size"), sum=("n_tok", "sum"),
                 min=("n_tok", "min"), max=("n_tok", "max"))
            .rename_axis(["source", "bucket_ts"])
            .reset_index()
        )
        for source, g in agg.groupby("source"):
            g = g.sort_values("bucket_ts").set_index("bucket_ts")
            full = np.arange(g.index[0], g.index[-1] + step, step)
            g = g.reindex(full)
            g["count"] = g["count"].fillna(0).astype(np.int64)
            y = g["sum"].astype(float)
            if strategy == "linear":
                filled = interpolate_small_gaps(y, max_gap)
            elif strategy == "locf":
                filled = locf_small_gaps(y, max_gap)
            elif strategy == "mean":
                filled = y.fillna(y.mean()) if y.notna().any() else y
            elif strategy is None:
                filled = y
            else:
                raise NotImplementedError(strategy)
            if fallback == "simple" and filled.notna().any():
                filled = filled.fillna(y.mean())
            was_gap = y.isna()
            newly = was_gap & filled.notna()
            res = pd.DataFrame(
                {
                    "source": source,
                    "tier": tier,
                    "bucket_ts": g.index,
                    "count": g["count"].to_numpy(),
                    "sum": np.where(newly, np.round(filled), y),
                    "min": np.where(newly, np.round(filled), g["min"].astype(float)),
                    "max": np.where(newly, np.round(filled), g["max"].astype(float)),
                    "value": filled.to_numpy(),
                    "filled": newly.to_numpy(),
                }
            )
            out_frames.append(res)
    return pd.concat(out_frames, ignore_index=True)


def sort_tier_rows(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )


def assert_tier_rows_equal(engine: pd.DataFrame, oracle: pd.DataFrame) -> None:
    e = sort_tier_rows(engine)[["source", "tier", "bucket_ts", "count", "sum", "min", "max", "value", "filled"]]
    o = sort_tier_rows(oracle)[e.columns.tolist()]
    assert len(e) == len(o), f"row count {len(e)} != {len(o)}"
    for col in ["source", "tier"]:
        assert (e[col].to_numpy() == o[col].to_numpy()).all(), col
    for col in ["bucket_ts", "count", "filled"]:
        assert np.array_equal(e[col].to_numpy(), o[col].to_numpy()), col
    for col in ["sum", "min", "max", "value"]:
        a = e[col].to_numpy(np.float64)
        b = o[col].to_numpy(np.float64)
        both_nan = np.isnan(a) & np.isnan(b)
        close = np.isclose(a, b, rtol=0, atol=1e-9)
        assert (both_nan | close).all(), (
            col,
            np.flatnonzero(~(both_nan | close))[:5],
        )
