"""Cross-source (panel / kNN-regression) gap fill.

The per-source fill strategies use only a source's own history. This
pipeline implements the north star's "optional kNN fill": sources are
grouped into cohorts, each cohort's 1m series are pivoted into a dense
panel matrix (sources = columns, minutes = rows — exactly the reference's
data model, SURVEY.md §1.4), and gaps are imputed by the multivariate
complete-rows path with reference scoring + deterministic top-k neighbor
selection (``n_nearest_features``).

Partitioning assumption (documented per the custom-operator rule): a
cohort's panel must fit one worker's memory — cohorts are the unit of
parallelism and should group related sources (here: hash buckets; in
production: tenant / topic / shard families). The cohort pivot is the ONE
place the engine materializes a dense matrix, and its size is
(span minutes x cohort sources), bounded by retention x cohort size, not
by corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from datafiller_ray.functions.multivariate import impute_matrix
from datafiller_ray.pipelines.rollup import partial_aggregates
from datafiller_ray.stages.fill import combine_partials


def _add_cohort(n_cohorts: int):
    def fn(t: pa.Table) -> pa.Table:
        skey = np.asarray(t["skey"]).view(np.uint64)
        cohort = (skey % np.uint64(n_cohorts)).astype(np.int64)
        return t.append_column("cohort", pa.array(cohort, pa.int64()))

    return fn


def build_panel_features(
    panel: np.ndarray,
    grid: np.ndarray,
    lags: tuple[int, ...],
    add_time_features: bool,
) -> np.ndarray:
    """Joint autoregressive feature matrix over a cohort panel — the
    reference's ``build_lag_matrix`` column layout
    (``timeseries/_utils.py:8-48``): [series | one block per lag of ALL
    series | calendar features]. Positive lags shift back in time;
    out-of-range rows are NaN."""
    n, s = panel.shape
    n_time = 0
    time_block = None
    if add_time_features:
        from datafiller_ray.functions.features import make_time_features

        time_block = make_time_features(grid).astype(np.float64)
        n_time = time_block.shape[1]
    # one allocation, slices written in place (a blocks-list + concatenate
    # doubles the memory traffic of the widest matrix in the engine)
    out = np.empty((n, s * (1 + len(lags)) + n_time))
    out[:, :s] = panel
    for t, lag in enumerate(lags):
        dst = out[:, s * (t + 1) : s * (t + 2)]
        if lag > 0:
            dst[:lag] = np.nan
            dst[lag:] = panel[: n - lag]
        elif lag < 0:
            dst[lag:] = np.nan
            dst[:lag] = panel[-lag:]
        else:
            dst[:] = panel
    if time_block is not None:
        out[:, s * (1 + len(lags)) :] = time_block
    return out


def _make_panel_fill_fn(
    n_nearest_features: int | None,
    alpha: float,
    min_samples_train: int,
    fallback: str | None,
    lags: tuple[int, ...] = (),
    add_time_features: bool = False,
):
    def fill_cohort(g: pd.DataFrame) -> pd.DataFrame:
        # final-combine partials per source, then pivot to the cohort panel
        per_source = {
            src: combine_partials(sub)
            for src, sub in g.groupby("source", sort=True)
        }
        lo = min(df["bucket_ts"].iloc[0] for df in per_source.values())
        hi = max(df["bucket_ts"].iloc[-1] for df in per_source.values())
        grid = np.arange(lo, hi + 60, 60, dtype=np.int64)
        sources = sorted(per_source)
        panel = np.full((grid.size, len(sources)), np.nan)
        for k, src in enumerate(sources):
            df = per_source[src]
            pos = (df["bucket_ts"].to_numpy(np.int64) - lo) // 60
            panel[pos, k] = df["sum"].to_numpy(np.float64)

        n_series = panel.shape[1]
        if lags or add_time_features:
            matrix = build_panel_features(panel, grid, tuple(lags), add_time_features)
            # dropna(how="all", axis=1) on GENERATED features only — the
            # original columns always keep their slots (reference
            # timeseries/imputer.py:556-562)
            keep = ~np.isnan(matrix).all(axis=0)
            keep[:n_series] = True
            matrix = matrix[:, keep]
        else:
            matrix = panel

        # cohort width varies run to run: clamp the neighbor count to the
        # available feature columns (direct impute_matrix callers get the
        # strict reference validation instead)
        nnf = (
            None
            if n_nearest_features is None
            else max(1, min(int(n_nearest_features), matrix.shape[1]))
        )
        imputed_full, filled_full = impute_matrix(
            matrix,
            cols_to_impute=np.arange(n_series),
            n_nearest_features=nnf,
            alpha=alpha,
            min_samples_train=min_samples_train,
            fallback=fallback,
        )
        imputed = imputed_full[:, :n_series]
        filled = filled_full[:, :n_series]

        frames = []
        for k, src in enumerate(sources):
            # emit only the source's own span (outside it the panel rows
            # belong to other sources' grids)
            df = per_source[src]
            s_lo = df["bucket_ts"].iloc[0]
            s_hi = df["bucket_ts"].iloc[-1]
            sel = (grid >= s_lo) & (grid <= s_hi)
            frames.append(
                pd.DataFrame(
                    {
                        "source": src,
                        "bucket_ts": grid[sel],
                        "value": imputed[sel, k],
                        "observed": ~np.isnan(panel[sel, k]),
                        "filled": filled[sel, k],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return fill_cohort


def knn_fill(
    input_path: "str | ray.data.Dataset",
    *,
    n_cohorts: int = 4,
    n_nearest_features: int | None = 10,
    alpha: float = 1e-2,
    min_samples_train: int = 20,
    fallback: str | None = None,
    check_tokens: bool = False,
    lags: tuple[int, ...] = (),
    add_time_features: bool = False,
) -> "ray.data.Dataset":
    """kNN-regression gap fill over the 1m rollup: per cohort, each gap is
    predicted from the k highest-scoring neighbor sources. ``lags`` adds
    joint autoregressive blocks of every cohort series (+ optional calendar
    features) to the candidate pool, matching the reference
    TimeSeriesImputer's panel semantics (``timeseries/imputer.py:541-553``)."""
    partials = partial_aggregates(input_path, check_tokens=check_tokens)
    with_cohort = partials.map_batches(
        _add_cohort(n_cohorts), batch_format="pyarrow"
    )
    fn = _make_panel_fill_fn(
        n_nearest_features, alpha, min_samples_train, fallback,
        lags=lags, add_time_features=add_time_features,
    )
    return with_cohort.groupby("cohort").map_groups(fn, batch_format="pandas")
