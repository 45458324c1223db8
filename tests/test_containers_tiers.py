"""In-memory input containers (reference's ndarray/pandas/polars trio ->
engine's pyarrow/pandas/polars) + custom tier steps."""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.config import EngineValueError, FillConfig, TIER_STEPS
from datafiller_ray.fixtures import generate_input_table
from datafiller_ray.pipelines.rollup import read_input, rollup_tiers


@pytest.fixture(scope="module")
def table():
    return generate_input_table(1200, 3, seed=5)


def test_arrow_pandas_polars_inputs_agree(ray_session, table):
    import polars as pl

    cfg = FillConfig(strategy=None)
    key = ["tier", "source", "bucket_ts"]
    outs = []
    for container in (table, table.to_pandas(), pl.from_arrow(table)):
        df = rollup_tiers(
            container, fill=cfg, tiers=("1h",), check_tokens=False
        ).to_pandas()
        outs.append(df.sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_container_missing_columns(ray_session):
    with pytest.raises(EngineValueError, match="missing contract columns"):
        read_input(pd.DataFrame({"x": [1]}), with_tokens=False)
    with pytest.raises(EngineValueError, match="unsupported input container"):
        read_input(42, with_tokens=False)


def test_custom_tiers_cascade_exactly(ray_session, table):
    cfg = FillConfig(strategy=None)
    out = rollup_tiers(
        table, fill=cfg, tiers=("1m", "5m", "15m", "6h", "1w"), check_tokens=False
    ).to_pandas()
    assert set(out.tier.unique()) == {"1m", "5m", "15m", "6h", "1w"}
    m1 = out[(out.tier == "1m") & (out["count"] > 0)]
    for tier in ("5m", "15m", "6h", "1w"):
        step = TIER_STEPS[tier]
        want = (
            m1.assign(b=(m1.bucket_ts // step) * step)
            .groupby(["source", "b"])
            .agg(count=("count", "sum"), sum=("sum", "sum"),
                 min=("min", "min"), max=("max", "max"))
            .reset_index()
        )
        got = out[(out.tier == tier) & (out["count"] > 0)].sort_values(
            ["source", "bucket_ts"]
        )
        np.testing.assert_array_equal(
            got["bucket_ts"].to_numpy(), want.sort_values(["source", "b"])["b"].to_numpy()
        )
        np.testing.assert_array_equal(
            got["sum"].to_numpy(np.float64),
            want.sort_values(["source", "b"])["sum"].to_numpy(np.float64),
        )
