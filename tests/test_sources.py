"""Source formats + input validation error paths (the reference pins every
user-facing validation error, tests/test_errors.py:1-6)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import EngineValueError, FillConfig
from datafiller_ray.fixtures import generate_input_table
from datafiller_ray.pipelines.rollup import read_input, rollup_tiers


def test_csv_source_roundtrip(ray_session, tmp_path):
    table = generate_input_table(1500, 4, seed=8, with_tokens=False)
    csv_path = tmp_path / "input.csv"
    table.to_pandas().to_csv(csv_path, index=False)
    pq_path = tmp_path / "input.parquet"
    pq.write_table(table, pq_path)

    ds = read_input(str(csv_path), with_tokens=False, format="csv")
    a = rollup_tiers(ds, fill=FillConfig(strategy=None), check_tokens=False).to_pandas()
    b = rollup_tiers(str(pq_path), fill=FillConfig(strategy=None), check_tokens=False).to_pandas()
    key = ["tier", "source", "bucket_ts"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_csv_with_tokens_rejected():
    with pytest.raises(EngineValueError, match="token payload"):
        read_input("/tmp/whatever.csv", with_tokens=True, format="csv")


def test_unknown_format_rejected():
    with pytest.raises(EngineValueError, match="unsupported input format"):
        read_input("/tmp/x", format="avro")


def test_missing_contract_columns_engine_error(ray_session, tmp_path):
    path = tmp_path / "bad.parquet"
    pq.write_table(pa.table({"x": [1, 2]}), path)
    with pytest.raises(EngineValueError, match="missing contract columns"):
        read_input(str(path), with_tokens=False)


def test_length_mismatch_detected(ray_session, tmp_path):
    table = generate_input_table(300, 3, seed=2)
    bad_n = pa.array(
        np.asarray(table["n_tok"]).astype(np.int32) + 1, pa.int32()
    )
    bad = table.set_column(2, "n_tok", bad_n)
    path = tmp_path / "bad2.parquet"
    pq.write_table(bad, path)
    with pytest.raises(Exception, match="n_tok != len"):
        rollup_tiers(str(path)).to_pandas()


def test_jsonl_source_roundtrip_with_tokens(ray_session, tmp_path):
    """JSONL carries the FULL contract including the token lists; the
    rollup over the JSONL read (token check on) must equal the parquet
    path bit-for-bit, proving the int64→int32 cast restores the contract
    dtypes and the token-array invariant survives the format."""
    table = generate_input_table(1200, 4, seed=15)
    pq_path = tmp_path / "input.parquet"
    pq.write_table(table, pq_path)
    jl_path = tmp_path / "input.jsonl"
    df = table.to_pandas()
    df["tokens"] = df["tokens"].apply(lambda a: np.asarray(a).tolist())
    df.to_json(jl_path, orient="records", lines=True)

    ds = read_input(str(jl_path), with_tokens=True, format="jsonl")
    a = rollup_tiers(ds, fill=FillConfig(strategy=None), check_tokens=True).to_pandas()
    b = rollup_tiers(str(pq_path), fill=FillConfig(strategy=None), check_tokens=True).to_pandas()
    key = ["tier", "source", "bucket_ts"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
