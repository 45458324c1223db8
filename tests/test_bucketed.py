"""Bucketed (explicit hash-shuffle) path must equal the pure-Ray-Data path."""

import numpy as np
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


def test_grouped_topk_matches_brute_force(ray_session):
    import ray.data

    from datafiller_ray.stages.exchange import grouped_topk

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], 400),
            "h": rng.integers(0, 3, 400),
            "v": rng.integers(0, 40, 400),
            "id": [f"r{i:04d}" for i in range(400)],
        }
    )
    for nparts in (1, 7):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = (
            grouped_topk(ds, ["g", "h"], "v", ["id"], 2, n_buckets=8)
            .to_pandas()
            .sort_values(["g", "h", "rnk"])
            .reset_index(drop=True)
        )
        bf = (
            df.sort_values(["g", "h", "v", "id"], ascending=[True, True, False, True])
            .groupby(["g", "h"])
            .head(2)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["g", "h", "v", "id"]], bf)

    # ascending variant: first row per group by (v ASC, id ASC)
    ds = ray.data.from_pandas(df).repartition(5)
    out = grouped_topk(
        ds, "g", "v", ["id"], 1, descending=False
    ).to_pandas()
    bf = (
        df.sort_values(["g", "v", "id"]).groupby("g").head(1).sort_values("g")
    )
    assert out.sort_values("g")["id"].tolist() == bf["id"].tolist()


def test_grouped_topk_guards():
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.stages.exchange import grouped_topk

    with pytest.raises(EngineValueError):
        grouped_topk(None, "g", "v", [], 0)
    with pytest.raises(EngineValueError):
        grouped_topk(None, "_gk", "v", [], 1)


def test_grouped_agg_mixed_reductions_match_pandas(ray_session):
    import ray.data

    from datafiller_ray.stages.exchange import grouped_agg

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k1": rng.integers(0, 40, 5000).astype(np.int64),
            "k2": rng.choice(["a", "b", "c"], 5000).astype(object),
            "s": rng.integers(-100, 100, 5000).astype(np.int64),
            "mn": rng.integers(0, 10**9, 5000).astype(np.int64),
            "mx": rng.integers(-(10**9), 0, 5000).astype(np.int64),
        }
    )
    got = (
        grouped_agg(
            ray.data.from_pandas(df).repartition(7),
            ["k1", "k2"],
            {"s": "sum", "mn": "min", "mx": "max"},
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg({"s": "sum", "mn": "min", "mx": "max"})
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "s", "mn", "mx"]], want, check_dtype=False
    )


def test_grouped_agg_guards(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.stages.exchange import grouped_agg

    with pytest.raises(EngineValueError):
        grouped_agg(None, [], {"v": "sum"})
    with pytest.raises(EngineValueError):
        grouped_agg(None, "k", {})
    with pytest.raises(EngineValueError):
        grouped_agg(None, "k", {"v": "mean"})  # non-associative
    with pytest.raises(EngineValueError):
        grouped_agg(None, "_gk", {"v": "sum"})


def test_sql_ntile_matches_duckdb():
    import duckdb

    from __ray_entry__ import _sql_ntile

    rng = np.random.default_rng(5)
    for n in (1, 4, 5, 7, 23, 100):
        v = rng.integers(0, 10, n).astype(np.int64)
        ids = np.arange(n, dtype=np.int64)
        df = pd.DataFrame({"id": ids, "v": v})
        want = duckdb.sql(
            "SELECT id, NTILE(5) OVER (ORDER BY v DESC, id) AS t FROM df"
        ).df()
        order = np.lexsort((ids, -v))
        rank0 = np.empty(n, dtype=np.int64)
        rank0[order] = np.arange(n)
        got = _sql_ntile(rank0, n, 5)
        assert got.tolist() == want.sort_values("id")["t"].tolist()
