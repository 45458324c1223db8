"""HyperLogLog sketch (pipelines/sketches.py): exact-integer rank math,
split-invariant merging, and estimate accuracy. Engine-vs-oracle hash
parity is covered by test_entry_contract[approx_distinct_docs]."""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.pipelines.sketches import (
    HLL_M,
    _registers_per_key,
    bit_length_u64,
    hll_estimate,
    hll_ranks,
)


def test_bit_length_exact():
    vals = np.array(
        [0, 1, 2, 3, 4, 255, 256, (1 << 52) - 1, 1 << 52, (1 << 63) + 5],
        dtype=np.uint64,
    )
    expect = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    np.testing.assert_array_equal(bit_length_u64(vals), expect)


def test_ranks_boundaries():
    # all-zero rest ranks 53 (64-12+1); a rest with top bit set ranks 1
    h_zero_rest = np.array([0xFFF << 52], dtype=np.uint64)
    idx, rank = hll_ranks(h_zero_rest)
    assert idx[0] == 0xFFF and rank[0] == 53
    h_top_rest = np.array([(1 << 51)], dtype=np.uint64)  # idx 0, first bit of rest
    _, rank2 = hll_ranks(h_top_rest)
    assert rank2[0] == 1


def test_registers_split_invariant():
    """Registers from one pass == elementwise max of any block split —
    the merge correctness property the shuffle relies on."""
    from datafiller_ray.functions.hashing import string_hash64

    rng = np.random.default_rng(8)
    keys = np.array(["a"] * 5000 + ["b"] * 3000)
    vals = np.array([f"doc{int(i)}" for i in rng.integers(0, 10**9, 8000)])
    h = string_hash64(vals)
    uk_all, regs_all = _registers_per_key(keys, h)

    cut = 2900  # splits both key runs unevenly
    uk1, r1 = _registers_per_key(keys[:cut], h[:cut])
    uk2, r2 = _registers_per_key(keys[cut:], h[cut:])
    merged = {}
    for uk, rr in ((uk1, r1), (uk2, r2)):
        for k, r in zip(uk, rr):
            merged[k] = np.maximum(merged.get(k, np.zeros(HLL_M, np.uint8)), r)
    for k, r in zip(uk_all, regs_all):
        np.testing.assert_array_equal(r, merged[k])


def test_estimate_accuracy():
    from datafiller_ray.functions.hashing import string_hash64

    for true_n in (500, 20_000, 300_000):
        vals = np.array([f"item-{i}" for i in range(true_n)])
        keys = np.zeros(true_n, dtype="U1")
        _, regs = _registers_per_key(keys, string_hash64(vals))
        est = hll_estimate(regs[0])
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_approx_distinct_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from datafiller_ray.fixtures import generate_input_table
    from datafiller_ray.pipelines.sketches import approx_distinct

    path = tmp_path / "in.parquet"
    pq.write_table(generate_input_table(8000, 7, seed=3), path)
    ds = ray.data.read_parquet(str(path), columns=["doc_id", "source"])
    out = approx_distinct(ds, key_col="source", value_col="doc_id").to_pandas()
    truth = (
        pq.read_table(path, columns=["doc_id", "source"])
        .to_pandas()
        .groupby("source")["doc_id"]
        .nunique()
    )
    assert set(out["source"]) == set(truth.index)
    for _, row in out.iterrows():
        t = truth[row["source"]]
        assert abs(row["approx_n"] - t) / t < 0.10, (row["source"], row["approx_n"], t)


def test_bloom_positions_pinned():
    from datafiller_ray.pipelines.sketches import _bloom_positions

    h = np.array([0x123456789ABCDEF0], dtype=np.uint64)
    pos = _bloom_positions(h, 1 << 10, 3)[0]
    h1, h2 = 0x9ABCDEF0, (0x12345678 | 1)
    assert pos.tolist() == [(h1 + i * h2) % (1 << 10) for i in range(3)]


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    import pyarrow as pa
    import ray.data

    from datafiller_ray.pipelines.sketches import bloom_filter_absent, build_bloom

    seen = [f"seen-{i}" for i in range(5000)]
    new = [f"new-{i}" for i in range(5000)]
    ds_seen = ray.data.from_arrow(pa.table({"doc_id": seen}))
    bloom = build_bloom(ds_seen, value_col="doc_id", m_bits=1 << 16, k=5)

    ds_all = ray.data.from_arrow(pa.table({"doc_id": seen + new}))
    kept = bloom_filter_absent(ds_all, bloom, value_col="doc_id", k=5).to_pandas()
    kept_ids = set(kept["doc_id"])
    # no false negatives: every seen id is filtered out
    assert not (kept_ids & set(seen))
    # false-positive rate drops a bounded fraction of genuinely-new ids
    dropped_new = len(new) - len(kept_ids & set(new))
    assert dropped_new / len(new) < 0.05, dropped_new


def test_bloom_engine_matches_scalar_oracle():
    from datafiller_ray.pipelines.sketches import _bloom_positions
    from datafiller_ray.functions.hashing import string_hash64

    o = _oracle_fills_sk()
    rng = np.random.default_rng(11)
    hist = np.array([f"h{int(i)}" for i in rng.integers(0, 10**6, 2000)])
    inc = np.array([f"h{int(i)}" for i in rng.integers(0, 10**6, 3000)])
    m_bits, k = 1 << 14, 5  # small filter => real false positives
    keep_oracle = o.bloom_absent_ids(hist, inc, m_bits=m_bits, k=k)

    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = _bloom_positions(string_hash64(hist), m_bits, k).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    qpos = _bloom_positions(string_hash64(inc), m_bits, k)
    hit = (bits[qpos >> 3] & (np.uint8(1) << (qpos & 7).astype(np.uint8))) != 0
    keep_engine = ~hit.all(axis=1)
    np.testing.assert_array_equal(keep_engine, keep_oracle)


def _oracle_fills_sk():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "oracle_fills_sk", "tests/oracle/fills.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_hll_checkpoint_folds_equal_one_shot(ray_session, tmp_path):
    """Three arriving shards folded incrementally == the one-shot sketch of
    the union, register-for-register; replaying a shard is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from datafiller_ray.pipelines.sketches import approx_distinct, hll_checkpoint

    rng = np.random.default_rng(17)
    all_ids = [f"doc{int(i)}" for i in rng.integers(0, 10**8, 9000)]
    srcs = [f"s{int(i) % 4}" for i in rng.integers(0, 10, 9000)]
    tab = pa.table({"doc_id": all_ids, "source": srcs})

    out_dir = str(tmp_path / "ckpt")
    waves = [slice(0, 2500), slice(2500, 6000), slice(6000, 9000)]
    for w in waves:
        shard = ray.data.from_arrow(tab.slice(w.start, w.stop - w.start))
        res = hll_checkpoint(out_dir, shard)

    one_shot = (
        approx_distinct(ray.data.from_arrow(tab))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    res = res.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(res, one_shot)

    # register-level equality (stronger than estimate equality)
    state = pq.read_table(f"{out_dir}/hll/registers.parquet")
    assert state.num_rows == one_shot.shape[0]

    # replay: same shard again -> identical state file bytes
    before = open(f"{out_dir}/hll/registers.parquet", "rb").read()
    hll_checkpoint(out_dir, ray.data.from_arrow(tab.slice(0, 2500)))
    after = open(f"{out_dir}/hll/registers.parquet", "rb").read()
    assert before == after


# -- count-min heavy hitters -------------------------------------------------


def test_cms_upper_bounds_and_no_collision_equality(ray_session):
    import ray.data

    from datafiller_ray.pipelines.sketches import cms_heavy_hitters

    rng = np.random.default_rng(8)
    rows = [rng.integers(0, 50, size=rng.integers(1, 40)).astype(np.int32)
            for _ in range(400)]
    ds = ray.data.from_pandas(pd.DataFrame({"tokens": [list(r) for r in rows]}))
    out = cms_heavy_hitters(ds, k=10, depth=4, width=64, seed=3)
    # the estimate can only overcount (collisions add, never subtract)
    assert (out["cms_cnt"] >= out["exact_cnt"]).all()
    # exact counts match a brute-force bincount
    flat = np.concatenate(rows)
    bc = np.bincount(flat, minlength=50)
    for t, c in zip(out["tok"], out["exact_cnt"]):
        assert bc[t] == c
    # rank order: exact desc, tok asc
    assert list(out["exact_cnt"]) == sorted(out["exact_cnt"], reverse=True)
    # with a wide sketch (few tokens per cell) estimates become exact
    wide = cms_heavy_hitters(ds, k=10, depth=4, width=65536, seed=3)
    assert (wide["cms_cnt"] == wide["exact_cnt"]).all()


def test_cms_block_split_invariance(ray_session):
    import ray.data

    from datafiller_ray.pipelines.sketches import cms_heavy_hitters

    rng = np.random.default_rng(9)
    rows = [rng.integers(0, 30, size=20).astype(np.int32) for _ in range(300)]
    df = pd.DataFrame({"tokens": [list(r) for r in rows]})
    one = cms_heavy_hitters(
        ray.data.from_pandas(df), k=8, depth=3, width=32, seed=1
    )
    many = cms_heavy_hitters(
        ray.data.from_pandas([df.iloc[:70], df.iloc[70:150], df.iloc[150:]]),
        k=8, depth=3, width=32, seed=1,
    )
    pd.testing.assert_frame_equal(one, many)


def test_cms_validation(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.sketches import cms_heavy_hitters

    with pytest.raises(EngineValueError):
        cms_heavy_hitters(None, k=0)
    with pytest.raises(EngineValueError):
        cms_heavy_hitters(None, width=1)
