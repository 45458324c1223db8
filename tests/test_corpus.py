"""pipelines/corpus.py unit tests: stratified sampling, vocab top-k,
per-source quantiles."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from datafiller_ray.config import EngineValueError
from datafiller_ray.pipelines.corpus import (
    sample_threshold,
    source_quantiles,
    stratified_sample,
    vocab_topk,
)


def _docs(n=2000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "c"], size=n).astype(object),
            "n_chars": rng.integers(10, 5000, size=n),
        }
    )


def test_sample_threshold_contract():
    assert sample_threshold(0.0) == 0
    assert sample_threshold(1.0) == 1 << 64
    assert sample_threshold(0.5) == 1 << 63
    with pytest.raises(EngineValueError, match="between 0 and 1"):
        sample_threshold(1.5)
    with pytest.raises(EngineValueError, match="between 0 and 1"):
        sample_threshold(-0.1)


def test_stratified_sample_rates_and_determinism(ray_session):
    df = _docs()
    ds = ray.data.from_pandas(df)
    out = stratified_sample(ds, rate=0.5, rates={"a": 0.1, "b": 1.0}, seed=3).to_pandas()
    out2 = stratified_sample(ds, rate=0.5, rates={"a": 0.1, "b": 1.0}, seed=3).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id), "deterministic"
    by = out.groupby("source").size()
    n_by = df.groupby("source").size()
    assert by["b"] == n_by["b"], "rate 1.0 keeps everything"
    assert by["a"] / n_by["a"] == pytest.approx(0.1, abs=0.05)
    assert by["c"] / n_by["c"] == pytest.approx(0.5, abs=0.06)


def test_stratified_sample_nested(ray_session):
    # the sample at rate r1 < r2 must be a SUBSET of the rate-r2 sample
    ds = ray.data.from_pandas(_docs())
    small = set(stratified_sample(ds, rate=0.2, seed=9).to_pandas().doc_id)
    big = set(stratified_sample(ds, rate=0.6, seed=9).to_pandas().doc_id)
    assert small <= big
    assert len(small) < len(big)


def test_stratified_sample_seed_changes_sample(ray_session):
    ds = ray.data.from_pandas(_docs())
    s1 = set(stratified_sample(ds, rate=0.3, seed=1).to_pandas().doc_id)
    s2 = set(stratified_sample(ds, rate=0.3, seed=2).to_pandas().doc_id)
    assert s1 != s2


def test_stratified_sample_requires_rate(ray_session):
    ds = ray.data.from_pandas(_docs(50))
    with pytest.raises(EngineValueError, match="rate"):
        stratified_sample(ds)


def test_vocab_topk_counts_and_ties(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["b a a! c b", "a c. b", "z z z z"],
        }
    )
    out = (
        vocab_topk(ray.data.from_pandas(docs), k=3)
        .to_pandas()
        .sort_values(["cnt", "tok"], ascending=[False, True])
        .reset_index(drop=True)
    )
    # counts: z=4, a=3, b=3, c=2, !=1, .=1 -> top3 = z, a, b (tie a<b)
    assert out["tok"].tolist() == ["z", "a", "b"]
    assert out["cnt"].tolist() == [4, 3, 3]


def test_vocab_topk_k_validation(ray_session):
    with pytest.raises(EngineValueError, match="k must be positive"):
        vocab_topk(ray.data.from_pandas(_docs(5)), k=0)


def test_vocab_topk_empty_text(ray_session):
    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["", "   "]})
    out = vocab_topk(ray.data.from_pandas(docs), k=5)
    assert out.count() == 0


def test_source_quantiles_matches_numpy(ray_session):
    df = _docs(500, seed=4)
    out = (
        source_quantiles(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    for src, g in df.groupby("source"):
        for q, col in [(0.25, "q0_25"), (0.5, "q0_5"), (0.99, "q0_99")]:
            exp = np.quantile(g["n_chars"].to_numpy(np.float64), q)
            exp = np.floor(exp * 1e6 + 0.5) / 1e6
            assert out.loc[src, col] == pytest.approx(exp, abs=2e-6)


def test_source_quantiles_single_row_group(ray_session):
    df = pd.DataFrame({"doc_id": [0], "source": ["only"], "n_chars": [42]})
    out = source_quantiles(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 1
    assert (out[[c for c in out.columns if c.startswith("q")]] == 42.0).all().all()


def test_sample_fixed_k_exact_size_and_determinism(ray_session):
    from datafiller_ray.pipelines.corpus import sample_fixed_k

    df = _docs(1200, seed=8)
    ds = ray.data.from_pandas(df)
    out = sample_fixed_k(ds, k=25, seed=4).to_pandas()
    out2 = sample_fixed_k(ds, k=25, seed=4).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)
    sizes = out.groupby("source").size()
    assert (sizes == 25).all(), sizes
    assert "_h" not in out.columns


def test_sample_fixed_k_small_stratum_keeps_all(ray_session):
    from datafiller_ray.pipelines.corpus import sample_fixed_k

    df = _docs(60, seed=2)
    out = sample_fixed_k(ray.data.from_pandas(df), k=1000, seed=0).to_pandas()
    assert len(out) == 60


def test_sample_fixed_k_matches_bruteforce(ray_session):
    from datafiller_ray.functions.hashing import splitmix64
    from datafiller_ray.pipelines.corpus import sample_fixed_k

    df = _docs(800, seed=5)
    k, seed = 10, 3
    out = sample_fixed_k(ray.data.from_pandas(df), k=k, seed=seed).to_pandas()
    seed_mix = int(splitmix64(np.array([seed], dtype=np.uint64))[0])
    h = splitmix64(df.doc_id.to_numpy(np.uint64) ^ np.uint64(seed_mix))
    df2 = df.assign(h=h)
    exp = (
        df2.sort_values(["h", "doc_id"]).groupby("source").head(k).doc_id
    )
    assert sorted(out.doc_id) == sorted(exp)


def test_sample_fixed_k_validation(ray_session):
    from datafiller_ray.pipelines.corpus import sample_fixed_k

    with pytest.raises(EngineValueError, match="k must be positive"):
        sample_fixed_k(ray.data.from_pandas(_docs(5)), k=0)


def test_global_quantiles_matches_numpy(ray_session):
    from datafiller_ray.pipelines.corpus import global_quantiles

    df = _docs(3000, seed=6)
    out = global_quantiles(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 1
    for q, col in [(0.25, "q0_25"), (0.5, "q0_5"), (0.9, "q0_9"), (0.99, "q0_99")]:
        exp = np.quantile(df.n_chars.to_numpy(np.float64), q)
        exp = np.floor(exp * 1e6 + 0.5) / 1e6
        assert out[col].iloc[0] == pytest.approx(exp, abs=2e-6)


def test_budget_sample_prefix_property(ray_session):
    """Kept set per source = hash-order prefix within budget; totals never
    exceed the budget; adding the next doc in hash order would exceed it."""
    import numpy as np

    from datafiller_ray.functions.hashing import splitmix64
    from datafiller_ray.pipelines.corpus import budget_sample

    full = _docs(1500, seed=4)
    ds = ray.data.from_pandas(full)
    out = budget_sample(
        ds, budget=30_000, weight_col="n_chars", seed=5
    ).to_pandas()
    assert (out.groupby("source")["n_chars"].sum() <= 30_000).all()

    seed_mix = int(splitmix64(np.array([5], dtype=np.uint64))[0])
    for src, g in full.groupby("source"):
        h = splitmix64(
            g["doc_id"].to_numpy().astype(np.uint64) ^ np.uint64(seed_mix)
        )
        order = np.lexsort((g["doc_id"].to_numpy(), h))
        w = g["n_chars"].to_numpy(np.int64)[order]
        run = np.cumsum(w)
        expect_ids = set(g["doc_id"].to_numpy()[order][run <= 30_000])
        got_ids = set(out.loc[out["source"] == src, "doc_id"])
        assert got_ids == expect_ids, src


def test_budget_sample_requires_budget(ray_session):
    import pytest as _pytest

    from datafiller_ray.pipelines.corpus import budget_sample

    with _pytest.raises(EngineValueError):
        budget_sample(ray.data.from_pandas(_docs(50)))
