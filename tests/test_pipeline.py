"""End-to-end pipeline tests against the pandas oracle and duckdb
(independent aggregation oracle, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import FillConfig, RetentionConfig, TIER_STEPS

DEFAULT_TIERS = {t: TIER_STEPS[t] for t in ("1m", "1h", "1d")}
from datafiller_ray.fixtures import generate_input_table, tiny_edge_case_table
from datafiller_ray.pipelines.rollup import rollup_tiers
from datafiller_ray.stages.compress import decode_tier_chunk
from tests.oracle.reference import assert_tier_rows_equal, oracle_tier_rows


@pytest.fixture(scope="module")
def tiny_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("input") / "tiny.parquet"
    table = generate_input_table(3000, 6, seed=42)
    pq.write_table(table, path)
    return str(path), table


@pytest.fixture(scope="module")
def edge_input(tmp_path_factory):
    path = tmp_path_factory.mktemp("edge") / "edge.parquet"
    table = tiny_edge_case_table()
    pq.write_table(table, path)
    return str(path), table


@pytest.mark.parametrize(
    "strategy,max_gap,fallback",
    [
        (None, None, None),
        ("locf", 3, None),
        ("linear", 5, None),
        ("linear", None, "simple"),
        ("mean", None, None),
    ],
)
def test_pipeline_matches_pandas_oracle(ray_session, tiny_input, strategy, max_gap, fallback):
    path, table = tiny_input
    cfg = FillConfig(strategy=strategy, max_gap=max_gap, fallback=fallback)
    engine = rollup_tiers(path, fill=cfg).to_pandas()
    oracle = oracle_tier_rows(
        table, tiers=DEFAULT_TIERS, strategy=strategy, max_gap=max_gap, fallback=fallback
    )
    assert_tier_rows_equal(engine, oracle)


def test_pipeline_edge_cases_match_oracle(ray_session, edge_input):
    path, table = edge_input
    cfg = FillConfig(strategy="linear", max_gap=3)
    engine = rollup_tiers(path, fill=cfg).to_pandas()
    oracle = oracle_tier_rows(table, tiers=DEFAULT_TIERS, strategy="linear", max_gap=3)
    assert_tier_rows_equal(engine, oracle)
    # the single-row source yields exactly one bucket per tier
    single = engine[engine.source == "edge_single"]
    assert (single.groupby("tier").size() == 1).all()


def test_observed_rollup_matches_duckdb(ray_session, tiny_input):
    import duckdb

    path, _ = tiny_input
    engine = rollup_tiers(path, fill=FillConfig(strategy=None)).to_pandas()
    con = duckdb.connect()
    for tier, step in DEFAULT_TIERS.items():
        got = (
            engine[(engine.tier == tier) & (engine["count"] > 0)]
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        want = con.sql(
            f"""
            SELECT source,
                   (CAST(substr(doc_id, length(doc_id) - 9, 10) AS BIGINT) * 60
                    // {step}) * {step} AS bucket_ts,
                   COUNT(*) AS count, SUM(n_tok) AS sum,
                   MIN(n_tok) AS min, MAX(n_tok) AS max
            FROM read_parquet('{path}')
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).df()
        np.testing.assert_array_equal(got["bucket_ts"], want["bucket_ts"])
        np.testing.assert_array_equal(got["count"], want["count"])
        np.testing.assert_array_equal(got["sum"].astype(np.int64), want["sum"].astype(np.int64))
        np.testing.assert_array_equal(got["min"].astype(np.int64), want["min"].astype(np.int64))
        np.testing.assert_array_equal(got["max"].astype(np.int64), want["max"].astype(np.int64))


def test_retention_window(ray_session, tiny_input):
    path, table = tiny_input
    full = rollup_tiers(path, fill=FillConfig(strategy=None)).to_pandas()
    lo = int(full[full.tier == "1m"]["bucket_ts"].quantile(0.5))
    ret = RetentionConfig(windows={"1m": (lo, None)})
    kept = rollup_tiers(path, fill=FillConfig(strategy=None), retention=ret).to_pandas()
    assert (kept[kept.tier == "1m"]["bucket_ts"] >= lo).all()
    # other tiers untouched
    assert len(kept[kept.tier == "1d"]) == len(full[full.tier == "1d"])


def test_token_invariant_violation_detected(ray_session, tmp_path):
    from datafiller_ray.config import EngineValueError

    table = generate_input_table(500, 3, seed=1)
    # corrupt one token value
    tok = table["tokens"].combine_chunks()
    values = tok.values.to_numpy(zero_copy_only=False).copy()
    values[5] += 1
    corrupted = pa.ListArray.from_arrays(tok.offsets, pa.array(values, pa.int32()))
    bad = table.set_column(1, "tokens", corrupted)
    path = tmp_path / "bad.parquet"
    pq.write_table(bad, path)
    with pytest.raises(Exception) as ei:
        rollup_tiers(str(path)).to_pandas()
    assert "token-array invariant" in str(ei.value)


def test_blob_emit_roundtrips_to_tier_rows(ray_session, tiny_input):
    path, _ = tiny_input
    cfg = FillConfig(strategy="linear", max_gap=5)
    rows = rollup_tiers(path, fill=cfg).to_pandas()
    blobs = rollup_tiers(path, fill=cfg, emit="blobs").to_pandas()
    n_chunks = rows.groupby(["source", "tier"]).ngroups
    assert len(blobs) == n_chunks
    for _, blob in blobs.iterrows():
        dec = decode_tier_chunk(blob)
        sub = rows[(rows.source == blob["source"]) & (rows.tier == blob["tier"])]
        sub = sub.sort_values("bucket_ts").reset_index(drop=True)
        np.testing.assert_array_equal(dec["bucket_ts"], sub["bucket_ts"])
        for col in ["count", "sum", "min", "max", "value"]:
            np.testing.assert_array_equal(
                dec[col].to_numpy(np.float64).view(np.uint64),
                sub[col].to_numpy(np.float64).view(np.uint64),
            )


def test_determinism_across_block_layouts(ray_session, tiny_input):
    """Distributed analogue of the reference's reproducibility test
    (tests/test_multivariate.py:154-167): results are identical regardless of
    how the input is split into blocks (fills are per-group local)."""
    import ray.data

    path, _ = tiny_input
    cfg = FillConfig(strategy="linear", max_gap=5)
    a = rollup_tiers(path, fill=cfg).to_pandas()
    ds = ray.data.read_parquet(path).repartition(13)
    b = rollup_tiers(ds, fill=cfg).to_pandas()
    key = ["tier", "source", "bucket_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
