"""Frequency (base step) inference over a timestamp column.

Engine analogue of the reference's ``_infer_frequency``
(``/root/reference/src/datafiller/timeseries/imputer.py:188-213``): declared
frequency wins; otherwise the base step is the minimum positive delta of the
sorted timestamps, valid only when every delta is a multiple of it. Error
surface mirrors ``reference/tests/test_errors.py:175-188`` (fewer than two
timestamps / duplicate timestamps / irregular gaps). Calendar frequencies
(month-start etc., the reference's ``pd.infer_freq`` fast path) have no
meaning for an epoch-seconds engine; the min-delta rule is the engine-wide
contract.

Distribution: timestamps are projected per key and each key's series is
inferred inside one vectorized ``map_groups`` task (only (skey, ts) pairs
cross the shuffle); the global step is the gcd of the per-key bases, which
every key's deltas are then guaranteed to divide.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from datafiller_ray.config import EngineValueError


def infer_step_array(ts: np.ndarray, *, sort: bool = True) -> int:
    """Base step (seconds) of one key's timestamps — the reference's
    min-positive-delta + divisibility rule with its error messages."""
    ts = np.asarray(ts, dtype=np.int64)
    if ts.size < 2:
        raise EngineValueError(
            "series must have a declared step or at least two timestamps to infer one"
        )
    if sort:
        ts = np.sort(ts)
    elif np.any(np.diff(ts) < 0):
        raise EngineValueError("series timestamps must be sorted in increasing order")
    deltas = np.diff(ts)
    if np.any(deltas == 0):
        raise EngineValueError("series must not contain duplicate timestamps")
    base = int(deltas.min())
    if np.any(deltas % base != 0):
        raise EngineValueError(
            "series step could not be inferred from irregular timestamp gaps"
        )
    return base


def infer_step(
    ds_or_path, *, ts_column: str = "bucket_ts", key_column: str | None = "source"
) -> int:
    """Distributed step inference over a Dataset (or parquet path).

    Per-key bases are inferred in parallel ``map_groups`` tasks; the global
    step is their gcd (each key's deltas are multiples of its base, hence of
    the gcd). With ``key_column=None`` the whole column is one series."""
    import ray.data

    ds = (
        ds_or_path
        if isinstance(ds_or_path, ray.data.Dataset)
        else ray.data.read_parquet(
            ds_or_path,
            columns=[c for c in (key_column, ts_column) if c is not None],
        )
    )
    if key_column is None:
        # single series: collect only the (small) timestamp column
        ts = ds.select_columns([ts_column]).to_pandas()[ts_column].to_numpy(np.int64)
        return infer_step_array(ts)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        if g[key_column].nunique() != 1:
            return pd.concat(
                [per_key(sub) for _, sub in g.groupby(key_column, sort=True)],
                ignore_index=True,
            )
        # partial-aggregate rows legitimately repeat a (key, bucket_ts) across
        # blocks pre-combine; dedupe before inference (the strict duplicate
        # check stays on the direct infer_step_array API)
        ts = np.unique(g[ts_column].to_numpy(np.int64))
        if ts.size < 2:
            # a singleton key has no deltas: it abstains (any step densifies
            # it to itself); only an all-singleton input is uninferrable
            return pd.DataFrame({key_column: [], "step": []})
        base = infer_step_array(ts)
        return pd.DataFrame({key_column: [g[key_column].iloc[0]], "step": [base]})

    per = (
        ds.select_columns([key_column, ts_column])
        .groupby(key_column)
        .map_groups(per_key, batch_format="pandas")
        .to_pandas()
    )
    if per.empty:
        raise EngineValueError(
            "series must have a declared step or at least two timestamps to infer one"
        )
    return math.gcd(*(int(s) for s in per["step"]))
