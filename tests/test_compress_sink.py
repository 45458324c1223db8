"""Standalone compression sink: tier parquet -> blobs -> tier rows."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from datafiller_ray.config import FillConfig
from datafiller_ray.fixtures import generate_input_table
from datafiller_ray.pipelines.compress_sink import compress_tiers, decompress_blobs
from datafiller_ray.pipelines.rollup import rollup_tiers, write_tiers


def test_sink_roundtrip(ray_session, tmp_path):
    src = tmp_path / "in.parquet"
    pq.write_table(generate_input_table(2500, 4, seed=21), src)
    cfg = FillConfig(strategy="linear", max_gap=5)
    rows_ds = rollup_tiers(str(src), fill=cfg, check_tokens=False)
    out = tmp_path / "tiers"
    write_tiers(rows_ds, str(out))

    blobs = compress_tiers(str(out))
    decoded = decompress_blobs(blobs).to_pandas()
    original = rollup_tiers(str(src), fill=cfg, check_tokens=False).to_pandas()

    key = ["tier", "source", "bucket_ts"]
    a = original.sort_values(key).reset_index(drop=True)
    b = decoded.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for c in ["source", "tier", "bucket_ts", "count"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())
    for c in ["sum", "min", "max", "value"]:
        np.testing.assert_array_equal(
            a[c].to_numpy(np.float64).view(np.uint64),
            b[c].to_numpy(np.float64).view(np.uint64),
        )
