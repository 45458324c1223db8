"""Checkpoint/resume tests (SURVEY.md §5: kill after partial commit, rerun,
assert skipped partitions + final equality with a single-pass run)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import FillConfig
from datafiller_ray.pipelines.checkpoint import read_tier_output, run_checkpointed
from datafiller_ray.pipelines.rollup import rollup_tiers
from datafiller_ray.fixtures import generate_input_table
from datafiller_ray.state import lineage


@pytest.fixture(scope="module")
def small_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "input.parquet"
    pq.write_table(generate_input_table(4000, 7, seed=9), path)
    return str(path)


CFG = FillConfig(strategy="linear", max_gap=5)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["source", "tier", "bucket_ts", "count", "sum", "min", "max", "value", "filled"]
    return df[cols].sort_values(["tier", "source", "bucket_ts"]).reset_index(drop=True)


def test_crash_resume_equals_single_pass(ray_session, small_input, tmp_path):
    out = str(tmp_path / "out")
    # crash after 2 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            small_input, out, fill=CFG, n_buckets=4, fail_after_buckets=2
        )
    m1 = lineage.read_manifest(out)
    assert sum(r.kind == "bucket" for r in m1) == 2
    assert sum(r.kind == "partials" for r in m1) == 1

    # resume: partials + 2 buckets skipped, remaining 2 completed
    summary = run_checkpointed(small_input, out, fill=CFG, n_buckets=4)
    assert summary["skipped_partials"] is True
    assert len(summary["skipped_buckets"]) == 2
    assert summary["completed_buckets"] == 2

    got = _norm(read_tier_output(out).to_pandas())
    want = _norm(rollup_tiers(small_input, fill=CFG).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_rerun_is_fully_skipped(ray_session, small_input, tmp_path):
    out = str(tmp_path / "out2")
    run_checkpointed(small_input, out, fill=CFG, n_buckets=3)
    summary = run_checkpointed(small_input, out, fill=CFG, n_buckets=3)
    assert summary["skipped_partials"] is True
    assert summary["completed_buckets"] == 0
    assert sorted(summary["skipped_buckets"]) == [0, 1, 2]


def test_manifest_lineage_fields(ray_session, small_input, tmp_path):
    out = str(tmp_path / "out3")
    run_checkpointed(small_input, out, fill=CFG, n_buckets=2)
    records = lineage.read_manifest(out)
    partials = [r for r in records if r.kind == "partials"][0]
    assert partials.input_fragments == [small_input]
    assert partials.row_count > 0
    assert len(partials.checksum) == 16
    buckets = [r for r in records if r.kind == "bucket"]
    assert {r.partition_id for r in buckets} == {0, 1}
    for r in buckets:
        assert r.output_path.endswith(f"bucket={r.partition_id}")


def test_rows_checksum_order_independent():
    a = {
        "x": np.array([1, 2, 3], dtype=np.int64),
        "s": np.array(["p", "q", "r"]),
        "v": np.array([1.5, np.nan, -2.0]),
    }
    perm = [2, 0, 1]
    b = {k: v[perm] for k, v in a.items()}
    assert lineage.rows_checksum(a) == lineage.rows_checksum(b)
    # sensitive to cross-column row alignment
    c = dict(a)
    c["x"] = a["x"][[1, 0, 2]]
    assert lineage.rows_checksum(a) != lineage.rows_checksum(c)
