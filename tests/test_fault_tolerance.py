"""Task-level fault tolerance: a worker dying mid-pipeline is retried by
Ray core and the pipeline's output is unchanged — the in-sandbox analogue
of losing a node on the real cluster (checkpoint/manifest-level recovery
is covered separately by test_resume.py)."""

import os

import numpy as np
import pytest
import ray.data


@pytest.fixture()
def small_input(tmp_path):
    import pyarrow.parquet as pq

    from datafiller_ray.fixtures import generate_input_table

    path = tmp_path / "in.parquet"
    pq.write_table(generate_input_table(3000, 6, seed=5), path)
    return str(path)


def _kill_once(flag_path):
    def fn(batch):
        try:
            fd = os.open(flag_path, os.O_CREAT | os.O_EXCL)
            os.close(fd)
            # simulated machine loss: hard-kill the worker process. Ray
            # treats this as a system failure and reschedules the task
            # (max_retries default); the retry sees the flag and passes.
            os._exit(1)
        except FileExistsError:
            pass
        return batch

    return fn


def test_worker_death_mid_pipeline_is_retried(ray_session, small_input, tmp_path):
    from datafiller_ray.config import FillConfig
    from datafiller_ray.pipelines.rollup import rollup_tiers

    cfg = FillConfig(strategy="linear", max_gap=5)
    clean = (
        rollup_tiers(small_input, fill=cfg, check_tokens=False)
        .to_pandas()
        .sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )

    flag = str(tmp_path / "killed_once")
    faulty_in = ray.data.read_parquet(small_input).map_batches(
        _kill_once(flag), batch_format="pyarrow"
    )
    faulty = (
        rollup_tiers(faulty_in, fill=cfg, check_tokens=False)
        .to_pandas()
        .sort_values(["tier", "source", "bucket_ts"])
        .reset_index(drop=True)
    )
    assert os.path.exists(flag), "the fault was never injected"
    import pandas as pd

    pd.testing.assert_frame_equal(clean, faulty)
