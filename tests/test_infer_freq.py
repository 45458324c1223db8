"""Frequency inference: reference error pins + inferred-step rollup.

Mirrors ``reference/tests/test_errors.py:175-188`` (single timestamp /
unsorted / duplicates / irregular) on the engine's epoch-seconds analogue,
and checks the distributed per-key inference + gcd combine."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from datafiller_ray.config import EngineValueError, FillConfig
from datafiller_ray.stages.infer_freq import infer_step, infer_step_array


@pytest.mark.parametrize(
    "ts, match",
    [
        ([100], "at least two timestamps"),
        ([100, 100], "duplicate timestamps"),
        ([0, 86400, 86400 + 129600], "irregular timestamp gaps"),
    ],
)
def test_infer_step_array_errors(ts, match):
    with pytest.raises(EngineValueError, match=match):
        infer_step_array(np.asarray(ts, np.int64))


def test_infer_step_array_unsorted_rejected_when_sort_disabled():
    with pytest.raises(EngineValueError, match="sorted in increasing order"):
        infer_step_array(np.asarray([200, 100], np.int64), sort=False)


def test_infer_step_array_allows_regular_gaps():
    # 300s base with missing points: deltas 300, 900, 300 -> base 300
    assert infer_step_array(np.asarray([0, 300, 1200, 1500], np.int64)) == 300


def test_infer_step_distributed_gcd(ray_session):
    # two keys at different (compatible) cadences: gcd(600, 900) = 300
    rows = []
    for src, step, n in [("a", 600, 50), ("b", 900, 40)]:
        for i in range(n):
            rows.append({"source": src, "bucket_ts": 1_000_000 + i * step})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    assert infer_step(ds) == 300


def test_infer_step_singleton_key_abstains(ray_session):
    rows = [{"source": "solo", "bucket_ts": 42}]
    rows += [{"source": "a", "bucket_ts": 1_000_000 + i * 300} for i in range(10)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    assert infer_step(ds) == 300


def test_infer_step_all_singletons_raises(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame([{"source": "x", "bucket_ts": 1}, {"source": "y", "bucket_ts": 2}])
    )
    with pytest.raises(EngineValueError, match="at least two timestamps"):
        infer_step(ds)


def test_rollup_tiers_inferred_five_minute_stream(ray_session, tmp_path):
    """A 5-minute stream (with gaps) densifies to a 300s grid, not 60s."""
    from datafiller_ray.fixtures import generate_input_table
    from datafiller_ray.pipelines.rollup import rollup_tiers_inferred

    table = generate_input_table(2000, 3, seed=5)
    minute = (
        pd.Series(table["doc_id"].to_pylist()).str.rsplit(":", n=1).str[-1].astype(np.int64)
    )
    keep = (minute % 5 == 0).to_numpy()
    sub = table.filter(pa.array(keep))
    out = rollup_tiers_inferred(
        ray.data.from_arrow(sub), fill=FillConfig(strategy="linear", max_gap=3)
    ).to_pandas()
    assert set(out["tier"]) == {"300s"}
    ts = np.sort(out[out["source"] == out["source"].iloc[0]]["bucket_ts"].to_numpy())
    assert (np.diff(ts) == 300).all()
    # observed rows pass through; gaps within max_gap are linear-filled
    assert (out["count"] > 0).any() and out["filled"].any()
