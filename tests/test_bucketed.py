"""Bucketed (explicit hash-shuffle) path must equal the pure-Ray-Data path."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import FillConfig
from datafiller_ray.fixtures import generate_input_table
from datafiller_ray.pipelines.rollup import rollup_tiers, rollup_tiers_bucketed


@pytest.fixture(scope="module")
def small_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("bucketed") / "in.parquet"
    pq.write_table(generate_input_table(5000, 9, seed=11), path)
    return str(path)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["source", "tier", "bucket_ts", "count", "sum", "min", "max", "value", "filled", "fill_method"]
    return df[cols].sort_values(["tier", "source", "bucket_ts"]).reset_index(drop=True)


@pytest.mark.parametrize(
    "cfg",
    [
        FillConfig(strategy="linear", max_gap=8),
        FillConfig(strategy="model", fallback="simple"),
        FillConfig(strategy=None),
    ],
    ids=["linear", "model", "none"],
)
def test_bucketed_equals_plain(ray_session, small_input, tmp_path, cfg):
    a = _norm(rollup_tiers(small_input, fill=cfg, check_tokens=False).to_pandas())
    b = _norm(
        rollup_tiers_bucketed(
            small_input,
            fill=cfg,
            check_tokens=False,
            n_buckets=7,
            scratch_dir=str(tmp_path / "scratch"),
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_blob_emit(ray_session, small_input, tmp_path):
    cfg = FillConfig(strategy="linear", max_gap=8)
    blobs = rollup_tiers_bucketed(
        small_input, fill=cfg, check_tokens=False, emit="blobs",
        n_buckets=5, scratch_dir=str(tmp_path / "s2"),
    ).to_pandas()
    rows = rollup_tiers(small_input, fill=cfg, check_tokens=False).to_pandas()
    assert len(blobs) == rows.groupby(["source", "tier"]).ngroups
