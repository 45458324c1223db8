"""ANN: brute-force exactness (vs numpy oracle) + LSH recall."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from datafiller_ray.pipelines.ann import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def embeddings(ray_session):
    # clustered embeddings (the realistic ANN setting): 16 centers + noise,
    # so near neighbors actually share LSH sign buckets
    rng = np.random.default_rng(0)
    n, d, n_clusters = 800, 32, 16
    centers = rng.standard_normal((n_clusters, d)) * 3
    assign = rng.integers(0, n_clusters, n)
    M = (centers[assign] + 0.3 * rng.standard_normal((n, d))).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64)})
    df["embedding"] = list(M)
    return ray.data.from_pandas(df), M


def _oracle_topk(M, qids, k):
    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    out = {}
    for q in qids:
        s = np.round(Mn @ Mn[q], 6)
        order = np.lexsort((np.arange(len(M)), -s))[:k]
        out[q] = list(order)
    return out


def test_brute_force_matches_numpy_oracle(embeddings):
    ds, M = embeddings
    qids = np.array([0, 5, 17])
    got = brute_force_topk(ds, qids, M[qids], k=10).to_pandas()
    want = _oracle_topk(M, qids, 10)
    for q in qids:
        sub = got[got.query_id == q].sort_values("rank")
        assert sub["vec_id"].tolist() == want[q]


def test_lsh_topk_recall(embeddings):
    ds, M = embeddings
    qids = np.array([1, 2, 3, 4])
    exact = _oracle_topk(M, qids, 10)
    approx = lsh_topk(ds, qids, M[qids], k=10, n_planes=4).to_pandas()
    recalls = []
    for q in qids:
        got = set(approx[approx.query_id == q]["vec_id"].tolist())
        recalls.append(len(got & set(exact[q])) / 10)
    # clustered data: a query's top-10 live in its cluster, which lands in
    # its sign bucket with high probability
    assert np.mean(recalls) >= 0.6, recalls
    # the query itself (sim 1.0) is always in its own bucket
    for q in qids:
        top = approx[approx.query_id == q].sort_values("rank").iloc[0]
        assert top.vec_id == q


def test_ivf_topk_recall(embeddings):
    from datafiller_ray.pipelines.ann import ivf_topk

    ds, M = embeddings
    qids = np.array([1, 2, 3, 4])
    exact = _oracle_topk(M, qids, 10)
    approx = ivf_topk(ds, qids, M[qids], k=10, n_cells=8, n_probe=3).to_pandas()
    recalls = []
    for q in qids:
        got = set(approx[approx.query_id == q]["vec_id"].tolist())
        recalls.append(len(got & set(exact[q])) / 10)
    # clustered data: a query's neighborhood maps to few k-means cells, and
    # probing 3 of 8 covers it
    assert np.mean(recalls) >= 0.7, recalls
    for q in qids:
        top = approx[approx.query_id == q].sort_values("rank").iloc[0]
        assert top.vec_id == q


def test_embedding_near_dup_lsh_recall_vs_brute(embeddings):
    from datafiller_ray.pipelines.ann import embedding_near_dup, embedding_near_dup_lsh

    ds, M = embeddings
    exact = embedding_near_dup(ds, threshold=0.8).to_pandas()
    approx = embedding_near_dup_lsh(
        ds, dim=M.shape[1], threshold=0.8, n_planes=4, n_tables=8
    ).to_pandas()
    exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
    approx_pairs = set(zip(approx["vec_a"], approx["vec_b"]))
    assert exact_pairs, "fixture must contain high-cosine pairs"
    # every reported pair is exact-verified, so no false positives...
    assert approx_pairs <= exact_pairs
    # ...and multi-table recall on near-identical pairs is high
    assert len(approx_pairs) / len(exact_pairs) >= 0.8
