"""Salted fill must be bit-identical to the per-source path (the engine's
determinism claim: fills are order/partitioning-independent, SURVEY.md §4)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import EngineValueError, FillConfig, RetentionConfig
from datafiller_ray.fixtures import generate_input_table, tiny_edge_case_table
from datafiller_ray.pipelines.rollup import rollup_tiers, rollup_tiers_salted
from datafiller_ray.stages.salted_fill import validate_salt_config


@pytest.fixture(scope="module")
def skewed_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("salt") / "in.parquet"
    pq.write_table(generate_input_table(6000, 5, seed=3), path)
    return str(path)


@pytest.fixture(scope="module")
def edge_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("saltedge") / "in.parquet"
    pq.write_table(tiny_edge_case_table(), path)
    return str(path)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["source", "tier", "bucket_ts", "count", "sum", "min", "max", "value", "filled", "fill_method"]
    return df[cols].sort_values(["tier", "source", "bucket_ts"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "strategy,max_gap,salt_span,knot_radius",
    [
        ("linear", 5, 3600, None),
        ("linear", 30, 7200, None),
        ("locf", 3, 3600, None),
        ("locf", 10, 86400, None),
        ("spline", 5, 3600, 20),
        ("spline", 12, 7200, 30),
        (None, None, 3600, None),
    ],
)
def test_salted_equals_per_source(
    ray_session, skewed_input, strategy, max_gap, salt_span, knot_radius
):
    cfg = FillConfig(
        strategy=strategy, max_gap=max_gap, spline_knot_radius=knot_radius
    )
    a = _norm(rollup_tiers(skewed_input, fill=cfg, check_tokens=False).to_pandas())
    b = _norm(
        rollup_tiers_salted(
            skewed_input, fill=cfg, check_tokens=False, salt_span=salt_span
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_salted_edge_cases_including_empty_interior_day(ray_session, edge_input):
    # edge_daygap spans two observed days with a fully-empty interior day:
    # exercises the synthesized-missing-chunk path at salt_span=1d
    cfg = FillConfig(strategy="linear", max_gap=4)
    a = _norm(rollup_tiers(edge_input, fill=cfg, check_tokens=False).to_pandas())
    b = _norm(
        rollup_tiers_salted(
            edge_input, fill=cfg, check_tokens=False, salt_span=86400
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_salted_with_retention(ray_session, skewed_input):
    cfg = FillConfig(strategy="locf", max_gap=5)
    full = rollup_tiers(skewed_input, fill=cfg, check_tokens=False).to_pandas()
    lo = int(full[full.tier == "1m"]["bucket_ts"].quantile(0.4))
    ret = RetentionConfig(windows={"1m": (lo, None)})
    a = _norm(rollup_tiers(skewed_input, fill=cfg, retention=ret, check_tokens=False).to_pandas())
    b = _norm(
        rollup_tiers_salted(
            skewed_input, fill=cfg, retention=ret, check_tokens=False, salt_span=3600
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_salt_config_validation():
    with pytest.raises(EngineValueError, match="bounded max_gap"):
        validate_salt_config(FillConfig(strategy="linear", max_gap=None), 3600)
    with pytest.raises(EngineValueError, match="supports strategies"):
        validate_salt_config(FillConfig(strategy="model"), 3600)
    with pytest.raises(EngineValueError, match="fallback"):
        validate_salt_config(FillConfig(strategy="locf", max_gap=2, fallback="simple"), 3600)
    with pytest.raises(EngineValueError, match="salt_span"):
        validate_salt_config(FillConfig(strategy="locf", max_gap=59), 3600)
    with pytest.raises(EngineValueError, match="spline_knot_radius"):
        validate_salt_config(FillConfig(strategy="spline", max_gap=5), 3600)
    assert validate_salt_config(FillConfig(strategy="linear", max_gap=5), 3600) == 6
    assert (
        validate_salt_config(
            FillConfig(strategy="spline", max_gap=5, spline_knot_radius=10), 3600
        )
        == 16
    )


def test_choose_fill_path_crossover():
    from datafiller_ray.config import FillConfig
    from datafiller_ray.pipelines.rollup import choose_fill_path

    short = {"a": (0, 60 * 1000)}
    mega = {"a": (0, 60 * 3_000_000), "b": (0, 60 * 100)}
    lin = FillConfig(strategy="linear", max_gap=30)
    assert choose_fill_path(short, lin) == "plain"
    assert choose_fill_path(mega, lin) == "salted"
    # unbounded kernels cannot chunk
    assert choose_fill_path(mega, FillConfig(strategy="linear")) == "plain"
    # model path chunks with or without optimask (histogram rectangle
    # search runs at the solve step)
    assert choose_fill_path(mega, FillConfig(strategy="model")) == "salted"
    assert (
        choose_fill_path(mega, FillConfig(strategy="model", optimask=False))
        == "salted"
    )
    assert choose_fill_path({}, lin) == "plain"


def test_rollup_tiers_auto_matches_plain(ray_session, skewed_input):
    from datafiller_ray.pipelines.rollup import rollup_tiers, rollup_tiers_auto

    cfg = FillConfig(strategy="linear", max_gap=10)
    a = rollup_tiers(skewed_input, fill=cfg, check_tokens=False).to_pandas()
    # crossover_buckets=1 forces the salted path on the same input
    b = rollup_tiers_auto(
        skewed_input, fill=cfg, check_tokens=False, crossover_buckets=1,
        salt_span=7200,
    ).to_pandas()
    key = ["tier", "source", "bucket_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f":
            assert ((np.isnan(x) & np.isnan(y)) | (x == y)).all(), c
        else:
            np.testing.assert_array_equal(x, y, err_msg=c)
