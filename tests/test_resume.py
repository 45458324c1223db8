"""Checkpoint/resume tests (SURVEY.md §5: kill after partial commit, rerun,
assert skipped partitions + final equality with a single-pass run)."""

import numpy as np
import pandas as pd
import pyarrow as pa
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


def test_checkpointed_blob_sink_resume_and_incremental(ray_session, tmp_path):
    """emit="blobs": the compressed sink shares the bucket commit/resume/
    incremental granularity, blobs decode bit-exactly, and an incremental
    update recompresses only touched buckets."""
    import pyarrow.parquet as pq_mod

    from datafiller_ray.config import FillConfig
    from datafiller_ray.fixtures import generate_input_table
    from datafiller_ray.pipelines.checkpoint import (
        read_tier_output,
        run_checkpointed,
        run_incremental,
    )
    from datafiller_ray.pipelines.rollup import rollup_tiers
    from datafiller_ray.stages.compress import decode_tier_chunk

    base = tmp_path / "in.parquet"
    pq_mod.write_table(generate_input_table(3000, 4, seed=21), base)
    out = str(tmp_path / "out")
    cfg = FillConfig(strategy="linear", max_gap=5)

    # crash after 1 bucket, resume
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed(
            str(base), out, fill=cfg, n_buckets=4, emit="blobs",
            fail_after_buckets=1,
        )
    summary = run_checkpointed(str(base), out, fill=cfg, n_buckets=4, emit="blobs")
    assert len(summary["skipped_buckets"]) == 1

    blobs = read_tier_output(out).to_pandas()
    assert {"source", "start_ts", "n_points", "ts_blob"} <= set(blobs.columns)
    decoded = pd.concat(
        [decode_tier_chunk(r) for _, r in blobs.iterrows()], ignore_index=True
    )
    want = rollup_tiers(str(base), fill=cfg).to_pandas()
    key = ["tier", "source", "bucket_ts"]
    d = decoded.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(d) == len(w)
    for c in ("count", "sum", "value"):
        a, b = d[c].to_numpy(np.float64), w[c].to_numpy(np.float64)
        assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all(), c

    # incremental: new rows for ONE source -> only its bucket recompressed
    upd = tmp_path / "upd.parquet"
    t = generate_input_table(400, 4, seed=22)
    one = t.filter(pa.compute.equal(t["source"], t["source"][0]))
    pq_mod.write_table(one, upd)
    res = run_incremental(out, str(upd))
    assert 1 <= len(res["touched_buckets"]) < 4
    blobs2 = read_tier_output(out).to_pandas()
    # untouched chunks identical; decode of the whole output still matches
    # a from-scratch run over base+update
    merged = tmp_path / "merged"
    merged.mkdir()
    pq_mod.write_table(pq_mod.read_table(base), merged / "a.parquet")
    pq_mod.write_table(one, merged / "b.parquet")
    want2 = rollup_tiers(str(merged), fill=cfg).to_pandas()
    decoded2 = pd.concat(
        [decode_tier_chunk(r) for _, r in blobs2.iterrows()], ignore_index=True
    )
    d2 = decoded2.sort_values(key).reset_index(drop=True)
    w2 = want2.sort_values(key).reset_index(drop=True)
    assert len(d2) == len(w2)
    for c in ("count", "sum", "value"):
        a, b = d2[c].to_numpy(np.float64), w2[c].to_numpy(np.float64)
        assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all(), c


def test_rows_checksum_merges_exactly():
    """Per-sub checksums must combine to the whole-set checksum (the
    sub-streamed finalize depends on it)."""
    import numpy as np

    from datafiller_ray.state import lineage

    rng = np.random.default_rng(3)
    cols = {
        "source": np.array([f"s{i%7}" for i in range(1000)]),
        "bucket_ts": rng.integers(0, 10**9, 1000),
        "count": rng.integers(0, 50, 1000),
        "sum": rng.random(1000) * 1e4,
    }
    whole = lineage.rows_checksum(cols)
    parts = []
    for lo, hi in [(0, 137), (137, 400), (400, 1000)]:
        parts.append(
            lineage.rows_checksum({k: v[lo:hi] for k, v in cols.items()})
        )
    assert lineage.merge_checksums(parts) == whole
    # order-independent too
    assert lineage.merge_checksums(parts[::-1]) == whole
