"""Distributed (salted, Gram-merge) model fill vs the per-source path.

Equivalence standard is the reference's own: Gram-path vs materialized fit
agree to a sigma-scaled tolerance (tests/test_multivariate.py:375-388);
counts, flags and eligibility are exact.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import EngineValueError, FillConfig
from datafiller_ray.fixtures import generate_input_table, tiny_edge_case_table
from datafiller_ray.pipelines.rollup import rollup_tiers, rollup_tiers_salted

CFG = FillConfig(strategy="model", fallback="simple", optimask=False)


@pytest.fixture(scope="module")
def skewed_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("dmodel") / "in.parquet"
    pq.write_table(generate_input_table(6000, 5, seed=13), path)
    return str(path)


def _norm(df):
    key = ["tier", "source", "bucket_ts"]
    return df.sort_values(key).reset_index(drop=True)


def assert_model_equiv(a: pd.DataFrame, b: pd.DataFrame):
    a, b = _norm(a), _norm(b)
    assert len(a) == len(b)
    for c in ["source", "tier", "bucket_ts", "count", "filled", "fill_method"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), err_msg=c)
    for c in ["sum", "min", "max", "value"]:
        x = a[c].to_numpy(np.float64)
        y = b[c].to_numpy(np.float64)
        both_nan = np.isnan(x) & np.isnan(y)
        scale = np.nanstd(x) or 1.0
        close = np.abs(x - y) <= 1e-4 * scale + 1e-6
        bad = ~(both_nan | close)
        assert not bad.any(), (c, np.flatnonzero(bad)[:5], x[bad][:5], y[bad][:5])


@pytest.mark.parametrize("salt_span", [3600, 86400])
def test_salted_model_equals_per_source(ray_session, skewed_input, salt_span):
    a = rollup_tiers(skewed_input, fill=CFG, check_tokens=False).to_pandas()
    b = rollup_tiers_salted(
        skewed_input, fill=CFG, check_tokens=False, salt_span=salt_span
    ).to_pandas()
    assert_model_equiv(a, b)


def test_salted_model_edge_cases(ray_session, tmp_path):
    path = tmp_path / "edge.parquet"
    pq.write_table(tiny_edge_case_table(), path)
    a = rollup_tiers(str(path), fill=CFG, check_tokens=False).to_pandas()
    b = rollup_tiers_salted(
        str(path), fill=CFG, check_tokens=False, salt_span=86400
    ).to_pandas()
    assert_model_equiv(a, b)


def test_salted_model_bounded_max_gap(ray_session, skewed_input):
    cfg = FillConfig(strategy="model", max_gap=10, optimask=False)
    a = rollup_tiers(skewed_input, fill=cfg, check_tokens=False).to_pandas()
    b = rollup_tiers_salted(
        skewed_input, fill=cfg, check_tokens=False, salt_span=3600
    ).to_pandas()
    assert_model_equiv(a, b)


def test_salted_model_fallback_spans_all_nan_windows(ray_session, tmp_path):
    """A gap longer than salt_span + 2*margin makes entire chunk windows
    all-NaN; the simple fallback must still fill them with the SOURCE's
    observed mean (gate on global n_obs, not the window-local NaN check)."""
    path = tmp_path / "daygap.parquet"
    pq.write_table(tiny_edge_case_table(), path)
    cfg = FillConfig(strategy="model", max_gap=10, fallback="simple", optimask=False)
    a = rollup_tiers(str(path), fill=cfg, check_tokens=False).to_pandas()
    b = rollup_tiers_salted(
        str(path), fill=cfg, check_tokens=False, salt_span=3600
    ).to_pandas()
    assert_model_equiv(a, b)
    # the interior all-gap day must actually be mean-filled, not left NaN
    day = b[(b["source"] == "edge_daygap") & (b["tier"] == "1m")]
    interior = day[day["count"] == 0]
    assert len(interior) > 0 and interior["filled"].all()


def test_salted_model_optimask_matches_per_source(ray_session, tmp_path):
    """Short, heavily-missing series push predict patterns under
    min_samples_train; the distributed solve's histogram rectangle search
    must recover the same fills as the per-source pareto optimask
    (accuracy standard: same filled cells, values at the module's
    sigma-scaled tolerance)."""
    path = tmp_path / "short.parquet"
    pq.write_table(generate_input_table(400, 6, seed=7, mar_ratio=0.35), path)
    cfg_on = FillConfig(strategy="model", optimask=True)
    cfg_off = FillConfig(strategy="model", optimask=False)
    a = rollup_tiers(
        str(path), fill=cfg_on, tiers=("1m",), check_tokens=False
    ).to_pandas()
    b = rollup_tiers_salted(
        str(path), fill=cfg_on, tiers=("1m",), check_tokens=False, salt_span=3600
    ).to_pandas()
    b_off = rollup_tiers_salted(
        str(path), fill=cfg_off, tiers=("1m",), check_tokens=False, salt_span=3600
    ).to_pandas()
    # the rectangle search must actually fire on this fixture
    assert (_norm(b)["fill_method"] == "model").sum() > (
        _norm(b_off)["fill_method"] == "model"
    ).sum()
    assert_model_equiv(a, b)


def test_salt_span_must_exceed_margin():
    with pytest.raises(EngineValueError, match="ghost margin"):
        rollup_tiers_salted(
            "/nonexistent", fill=FillConfig(strategy="model", max_gap=100, optimask=False),
            salt_span=3600,
        )
