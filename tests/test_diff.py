"""Snapshot diff (pipelines/diff.py): literal pins at the group-kernel and
library surface; SQL-oracle parity is covered by test_entry_contract
(``snapshot_diff``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from datafiller_ray.config import EngineValueError


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_snapshot_diff_literal(ray_session):
    from datafiller_ray.pipelines.diff import snapshot_diff

    old = _ds(
        [
            {"doc_id": "a", "source": "s1", "n_tok": 10},
            {"doc_id": "b", "source": "s1", "n_tok": 20},
            {"doc_id": "c", "source": "s2", "n_tok": 30},
        ]
    )
    new = _ds(
        [
            {"doc_id": "b", "source": "s1", "n_tok": 21},  # changed
            {"doc_id": "c", "source": "s2", "n_tok": 30},  # unchanged
            {"doc_id": "d", "source": "s3", "n_tok": 40},  # added
        ]
    )
    out = (
        snapshot_diff(old, new, key="doc_id", value="n_tok")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == ["a", "b", "d"]
    assert out["status"].tolist() == ["removed", "changed", "added"]
    assert out["old_n_tok"].tolist() == [10, 20, -1]
    assert out["new_n_tok"].tolist() == [-1, 21, 40]
    # carry coalesces new-side-first, falls back to old for removed rows
    assert out["source"].tolist() == ["s1", "s1", "s3"]


def test_snapshot_diff_empty_delta(ray_session):
    from datafiller_ray.pipelines.diff import snapshot_diff

    rows = [{"doc_id": f"d{i}", "source": "s", "n_tok": i} for i in range(50)]
    out = snapshot_diff(_ds(rows), _ds(rows)).to_pandas()
    assert len(out) == 0


def test_snapshot_diff_duplicate_key_raises(ray_session):
    from datafiller_ray.pipelines.diff import snapshot_diff

    old = _ds(
        [
            {"doc_id": "a", "source": "s", "n_tok": 1},
            {"doc_id": "a", "source": "s", "n_tok": 2},
        ]
    )
    new = _ds([{"doc_id": "a", "source": "s", "n_tok": 1}])
    with pytest.raises(Exception) as exc_info:
        snapshot_diff(old, new).to_pandas()
    assert "unique" in str(exc_info.value)


def test_snapshot_diff_param_guards():
    from datafiller_ray.pipelines.diff import snapshot_diff

    with pytest.raises(EngineValueError):
        snapshot_diff(None, None, key="k", value="k")
    with pytest.raises(EngineValueError):
        snapshot_diff(None, None, key="k", value="v", n_buckets=0)


def test_snapshot_diff_groups_never_split(ray_session):
    """Every key lands in exactly one coarse bucket: diff of A vs A+delta
    over many buckets reports exactly the delta keys."""
    from datafiller_ray.pipelines.diff import snapshot_diff

    rng = np.random.default_rng(3)
    n = 500
    old_rows = [
        {"doc_id": f"doc_{i:05d}", "source": f"s{i % 7}", "n_tok": int(v)}
        for i, v in enumerate(rng.integers(1, 100, n))
    ]
    changed = set(rng.choice(n, 40, replace=False).tolist())
    removed = set(rng.choice(n, 25, replace=False).tolist()) - changed
    new_rows = [
        dict(r, n_tok=r["n_tok"] + 1) if i in changed else r
        for i, r in enumerate(old_rows)
        if i not in removed
    ] + [{"doc_id": f"new_{j}", "source": "sx", "n_tok": 5} for j in range(10)]
    out = snapshot_diff(_ds(old_rows), _ds(new_rows), n_buckets=16).to_pandas()
    counts = out["status"].value_counts()
    assert counts.get("changed", 0) == len(changed)
    assert counts.get("removed", 0) == len(removed)
    assert counts.get("added", 0) == 10


def test_upsert_merge_semantics(ray_session):
    import ray.data

    from datafiller_ray.pipelines.diff import upsert_merge

    base = pd.DataFrame(
        {"doc_id": ["a", "b", "c", "d"], "n_tok": [1, 2, 3, 4],
         "source": ["s"] * 4}
    )
    upd = pd.DataFrame(
        {
            "doc_id": ["b", "c", "c", "e", "a"],
            "n_tok": [20, 30, 31, 50, 10],
            "source": ["s"] * 5,
            "version": [1, 1, 2, 1, 0],
            "is_delete": [0, 0, 1, 0, 0],
        }
    )
    out = (
        upsert_merge(ray.data.from_pandas(base), ray.data.from_pandas(upd))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # a: update at version 0 beats base at version 0 (side tie-break)
    assert out["doc_id"].tolist() == ["a", "b", "d", "e"]
    assert out["n_tok"].tolist() == [10, 20, 4, 50]
    assert out["version"].tolist() == [0, 1, 0, 1]


def test_upsert_merge_duplicate_key_version_raises(ray_session):
    import ray.data

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.diff import upsert_merge

    base = pd.DataFrame(
        {"doc_id": ["a"], "n_tok": [1], "source": ["s"]}
    )
    upd = pd.DataFrame(
        {
            "doc_id": ["a", "a"],
            "n_tok": [2, 3],
            "source": ["s", "s"],
            "version": [1, 1],
            "is_delete": [0, 0],
        }
    )
    with pytest.raises((EngineValueError, Exception)) as exc_info:
        upsert_merge(
            ray.data.from_pandas(base), ray.data.from_pandas(upd)
        ).to_pandas()
    assert "unique" in str(exc_info.value)


def test_upsert_merge_validates_columns(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.diff import upsert_merge

    with pytest.raises(EngineValueError):
        upsert_merge(None, None, key="x", version="x")
    with pytest.raises(EngineValueError):
        upsert_merge(None, None, n_buckets=0)
