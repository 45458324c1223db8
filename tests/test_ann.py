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


def test_ivf_training_sample_is_bounded_and_deterministic(embeddings):
    from datafiller_ray.pipelines.ann import (
        ivf_sample_threshold,
        ivf_training_sample,
    )

    ds, M = embeddings
    # n=800 > n_train=64: the sample must be hash-bounded, not the corpus
    S1 = ivf_training_sample(ds, n_train=64)
    S2 = ivf_training_sample(ds, n_train=64)
    assert np.array_equal(S1, S2)
    assert S1.shape[0] < 800
    # expected size ~ n_train; the 2^16-granular threshold keeps it close
    assert 16 <= S1.shape[0] <= 256
    # keep-all when the corpus fits the budget
    assert ivf_sample_threshold(500, 1024) == 1 << 16
    S_all = ivf_training_sample(ds, n_train=1024)
    assert S_all.shape[0] == 800


def test_ivf_index_prunes_partitions_and_matches_scan(embeddings, tmp_path):
    """The cell-partitioned index must (a) read strictly fewer partitions
    than exist (I/O pruning, the 100-TB shape) and (b) return exactly the
    scan path's rows — same centroids, candidates, round-6 ranking."""
    from datafiller_ray.pipelines.ann import (
        build_ivf_index,
        ivf_index_query_paths,
        ivf_topk,
        ivf_topk_indexed,
    )

    ds, M = embeddings
    index_dir = str(tmp_path / "ivf_index")
    build_ivf_index(ds, index_dir, n_cells=8, n_train=1024)
    qids = np.array([1, 2, 3, 4])
    probes, paths = ivf_index_query_paths(index_dir, M[qids], n_probe=3)
    import os

    all_cells = [d for d in os.listdir(index_dir) if d.startswith("cell=")]
    assert len(all_cells) > 3  # clustered fixture spreads over many cells
    assert 0 < len(paths) < len(all_cells)  # pruning is real
    assert probes.shape == (4, 3)

    scan = (
        ivf_topk(ds, qids, M[qids], k=10, n_cells=8, n_probe=3, n_train=1024)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    idx = (
        ivf_topk_indexed(index_dir, qids, M[qids], k=10, n_probe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        scan[["query_id", "vec_id", "sim", "rank"]],
        idx[["query_id", "vec_id", "sim", "rank"]],
    )


def test_embedding_clusters_assignment(embeddings):
    from datafiller_ray.pipelines.ann import (
        _assign_cells,
        embedding_clusters,
        ivf_training_sample,
        train_ivf_centroids,
    )

    ds, M_all = embeddings
    out = (
        embedding_clusters(ds, n_cells=8, n_train=256)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == M_all.shape[0]
    assert out["cell"].between(0, 7).all()
    # brute-force re-derivation: same sample -> same centroids -> same cells
    S = ivf_training_sample(ds, n_train=256)
    C = train_ivf_centroids(S, n_cells=8)
    exp = _assign_cells(M_all.astype(np.float64), C)
    np.testing.assert_array_equal(out["cell"].to_numpy(np.int64), exp)
    # block-layout invariance
    out2 = (
        embedding_clusters(ds.repartition(5), n_cells=8, n_train=256)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        out["cell"].to_numpy(), out2["cell"].to_numpy()
    )


def test_embedding_pca_contract(ray_session):
    """Top component carries the most variance; output is block-layout
    invariant; bad n_components raises."""
    import numpy as np

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import embedding_pca

    rng = np.random.default_rng(3)
    # anisotropic cloud: x-axis 10x the spread of the rest
    M = rng.standard_normal((300, 8)) * 0.01
    M[:, 0] += rng.standard_normal(300) * 0.1
    df = pd.DataFrame(
        {"vec_id": np.arange(300), "embedding": [row.tolist() for row in M]}
    )
    out = (
        embedding_pca(ray.data.from_pandas(df), n_components=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["vec_id", "pc1", "pc2"]
    assert out["pc1"].var() > out["pc2"].var() * 5
    # pc1 must essentially be the x-axis (sign fixed positive at max-|w|)
    assert abs(np.corrcoef(out["pc1"], M[:, 0])[0, 1]) > 0.99

    out2 = (
        embedding_pca(ray.data.from_pandas(df).repartition(11), n_components=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)

    with pytest.raises(EngineValueError):
        embedding_pca(ray.data.from_pandas(df), n_components=0)
    with pytest.raises(EngineValueError):
        embedding_pca(ray.data.from_pandas(df), n_components=9)


def test_kmeans_quality_contract(ray_session):
    """n_vecs sums to corpus size; inertia is layout-invariant (integer
    micro-unit sums); tight clusters yield near-zero inertia."""
    import numpy as np

    from datafiller_ray.pipelines.ann import embedding_clusters, kmeans_quality

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 16)) * 5.0
    M = np.repeat(centers, 50, axis=0) + rng.standard_normal((200, 16)) * 1e-4
    df = pd.DataFrame(
        {"vec_id": np.arange(200), "embedding": [r.tolist() for r in M]}
    )
    ds = ray.data.from_pandas(df)
    out = kmeans_quality(ds, n_cells=4).to_pandas().sort_values("cell")
    assert out["n_vecs"].sum() == 200
    assert (out["inertia"] >= 0).all()

    # pin against a direct single-pass recomputation with the same centroids
    from datafiller_ray.pipelines.ann import (
        _assign_cells,
        ivf_training_sample,
        train_ivf_centroids,
    )

    C = train_ivf_centroids(
        ivf_training_sample(ds, n_train=1024), n_cells=4, n_iters=5, seed=7
    )
    cells = _assign_cells(M.astype(np.float64), C)
    sq = (
        (M * M).sum(axis=1)
        - 2.0 * np.einsum("ij,ij->i", M, C[cells])
        + (C * C).sum(axis=1)[cells]
    )
    usq = np.floor(sq * 1e6 + 0.5).astype(np.int64)
    want_inertia = {
        int(c): float(usq[cells == c].sum()) / 1e6 for c in np.unique(cells)
    }
    assert out.set_index("cell")["inertia"].to_dict() == want_inertia

    out2 = (
        kmeans_quality(ds.repartition(13), n_cells=4)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out.reset_index(drop=True), out2)

    # same cells as embedding_clusters: per-cell counts agree
    assign = embedding_clusters(ds, n_cells=4).to_pandas()
    want = assign.groupby("cell").size()
    got = out.set_index("cell")["n_vecs"]
    assert got.to_dict() == want.to_dict()


def test_label_centroid_similarity_contract(ray_session):
    """Identical-label populations -> cos ~ 1 for aligned centroids;
    layout-invariant; counts correct."""
    import numpy as np

    from datafiller_ray.pipelines.ann import label_centroid_similarity

    rng = np.random.default_rng(9)
    # label 0 and 1 share a direction, label 2 is orthogonal-ish
    base = rng.standard_normal(8)
    M0 = base + rng.standard_normal((40, 8)) * 0.01
    M1 = base + rng.standard_normal((30, 8)) * 0.01
    M2 = np.roll(base, 4) + rng.standard_normal((30, 8)) * 0.01
    df = pd.DataFrame(
        {
            "vec_id": np.arange(100),
            "embedding": [r.tolist() for r in np.vstack([M0, M1, M2])],
            "label": np.repeat([0, 1, 2], [40, 30, 30]).astype(np.int32),
        }
    )
    ds = ray.data.from_pandas(df)
    out = label_centroid_similarity(ds).to_pandas()
    assert set(zip(out["label_a"], out["label_b"])) == {(0, 1), (0, 2), (1, 2)}
    sim01 = float(out.set_index(["label_a", "label_b"]).loc[(0, 1), "cos_sim"])
    assert sim01 > 0.999
    assert out.set_index(["label_a", "label_b"]).loc[(0, 1), "n_a"] == 40

    out2 = label_centroid_similarity(ds.repartition(9)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["label_a", "label_b"]).reset_index(drop=True),
        out2.sort_values(["label_a", "label_b"]).reset_index(drop=True),
    )


def test_filtered_topk_matches_label_restricted_brute(embeddings):
    from datafiller_ray.pipelines.ann import filtered_topk

    ds, M = embeddings
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, len(M)).astype(np.int64)

    df = ds.to_pandas()
    df["label"] = labels
    lds = ray.data.from_pandas(df)

    qids = np.array([0, 5, 17, 40])
    got = filtered_topk(lds, qids, M[qids], labels[qids], k=7).to_pandas()

    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    for q in qids:
        sel = np.flatnonzero(labels == labels[q])
        s = np.round(Mn[sel] @ Mn[q], 6)
        order = np.lexsort((sel, -s))[:7]
        want = sel[order].tolist()
        g = got[got.query_id == q].sort_values("rank")
        assert g["vec_id"].tolist() == want, q
        # the query itself carries its own label: rank 1 is always self
        assert g["vec_id"].iloc[0] == q

    # a query label absent from the corpus emits no rows (inner-join shape)
    only = filtered_topk(
        lds, np.array([0]), M[[0]], np.array([99], dtype=np.int64), k=5
    ).to_pandas()
    assert len(only) == 0


def test_centroid_silhouette_separated_blobs(ray_session):
    import ray.data

    from datafiller_ray.pipelines.ann import centroid_silhouette

    rng = np.random.default_rng(0)
    # two far-apart tight blobs -> with n_cells=2 silhouette ~ 1
    a = rng.normal(0, 0.01, size=(200, 8)) + 10.0
    b = rng.normal(0, 0.01, size=(200, 8)) - 10.0
    M = np.vstack([a, b])
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(400, dtype=np.int64), "embedding": list(M)}
        )
    )
    out = centroid_silhouette(ds, n_cells=2, n_train=400).to_pandas()
    assert len(out) == 2
    assert int(out["n_vecs"].sum()) == 400
    assert (out["mean_sil"] > 0.99).all()

    # one blob split into 2 cells -> boundary-heavy, silhouette well below
    M2 = rng.normal(0, 1.0, size=(400, 8))
    ds2 = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(400, dtype=np.int64), "embedding": list(M2)}
        )
    )
    out2 = centroid_silhouette(ds2, n_cells=2, n_train=400).to_pandas()
    assert (out2["mean_sil"] < 0.6).all()


def test_centroid_silhouette_validation(ray_session):
    import ray.data

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import centroid_silhouette

    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": [1], "embedding": [np.zeros(4)]})
    )
    with pytest.raises(EngineValueError):
        centroid_silhouette(ds, n_cells=1)


def test_semantic_dedup_flags_planted_duplicates(ray_session):
    from datafiller_ray.pipelines.ann import semantic_dedup

    rng = np.random.default_rng(3)
    n, d = 120, 16
    M = rng.standard_normal((n, d))
    # plant exact copies: 100->0, 101->1 (cosine 1.0 regardless of cell
    # geometry; copies land in the copied vector's cell by construction)
    M[100] = M[0]
    M[101] = M[1]
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64)})
    df["embedding"] = list(M.astype(np.float32))
    out = (
        semantic_dedup(
            ray.data.from_pandas(df), tau=0.999, n_cells=4, n_train=64
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(out) == n
    flagged = set(out.loc[out["is_dup"] == 1, "vec_id"])
    # keep-lowest-id: originals survive, planted copies are the dups
    assert {100, 101} <= flagged
    assert 0 not in flagged and 1 not in flagged

    # brute oracle at the operator's own tau/cell assignment
    got = dict(zip(out["vec_id"], out["is_dup"]))
    cells = dict(zip(out["vec_id"], out["cell"]))
    Md = M.astype(np.float32).astype(np.float64)
    nrm = np.maximum(np.sqrt((Md * Md).sum(axis=1)), 1e-300)
    for j in range(n):
        dup = 0
        for i in range(j):
            if cells[i] != cells[j]:
                continue
            sim = float(Md[i] @ Md[j]) / (nrm[i] * nrm[j])
            if np.floor(sim * 1e6 + 0.5) >= 999000:
                dup = 1
                break
        assert got[j] == dup, j


def test_semantic_dedup_validation(ray_session):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import semantic_dedup

    df = pd.DataFrame({"vec_id": [0], "embedding": [[0.0, 1.0]]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(EngineValueError):
        semantic_dedup(ds, tau=0.0)
    with pytest.raises(EngineValueError):
        semantic_dedup(ds, n_cells=0)


def test_pq_topk_cluster_precision_vs_brute(embeddings):
    # PQ resolves at codeword granularity: on this fixture every cluster
    # collapses to one codeword, so intra-cluster ranking falls back to the
    # vec_id tiebreak and exact recall@10 is NOT the right bar. What PQ does
    # guarantee is that every returned neighbor is a genuine cluster-mate
    # (exact cosine ~0.95 in-cluster vs ~0 across clusters) and that the LUT
    # sim approximates the exact cosine.
    from datafiller_ray.pipelines.ann import pq_topk

    ds, M = embeddings
    qids = np.array([0, 5, 17, 101])
    got = pq_topk(ds, qids, M[qids], k=10, n_sub=4, n_codes=16).to_pandas()
    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    for q in qids:
        sub = got[got.query_id == q]
        assert len(sub) == 10
        cos = Mn[sub["vec_id"].to_numpy()] @ Mn[q]
        assert cos.min() >= 0.8, (q, cos.min())  # all true cluster-mates
        # LUT sim tracks the exact cosine to within quantization error
        assert float(np.median(np.abs(sub["sim"].to_numpy() - cos))) <= 0.15
    # deterministic end-to-end: seeded Lloyd, pinned ties, stable ranking
    again = pq_topk(ds, qids, M[qids], k=10, n_sub=4, n_codes=16).to_pandas()
    lhs = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    rhs = again.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)


def test_pq_encode_deterministic_and_compact(embeddings):
    from datafiller_ray.pipelines.ann import (
        pq_encode,
        train_pq_codebooks,
    )

    _, M = embeddings
    books = train_pq_codebooks(M[:200], n_sub=4, n_codes=16)
    books2 = train_pq_codebooks(M[:200], n_sub=4, n_codes=16)
    for a, b in zip(books, books2):
        assert np.array_equal(a, b)
    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    codes = pq_encode(Mn, books)
    assert codes.shape == (len(M), 4)
    assert codes.min() >= 0 and codes.max() < 16
    # reconstruction approximates the unit vector: cosine(recon, v) high
    recon = np.concatenate(
        [books[m][codes[:, m]] for m in range(4)], axis=1
    )
    cos = (recon * Mn).sum(axis=1) / np.maximum(
        np.linalg.norm(recon, axis=1), 1e-300
    )
    assert float(np.median(cos)) > 0.8


def test_pq_validation():
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import train_pq_codebooks

    with pytest.raises(EngineValueError):
        train_pq_codebooks(np.zeros((10, 30)), n_sub=4)


def test_mmr_select_brute_semantics():
    # hand-checkable: relevance favors 1, but 1 is near-duplicate of 0
    from datafiller_ray.pipelines.ann import _mmr_select

    rel = np.array([0.95, 0.94, 0.60, 0.55])
    vids = np.array([10, 11, 12, 13], dtype=np.int64)
    cc = np.array(
        [
            [1.00, 0.99, 0.10, 0.05],
            [0.99, 1.00, 0.12, 0.07],
            [0.10, 0.12, 1.00, 0.20],
            [0.05, 0.07, 0.20, 1.00],
        ]
    )
    picks, scores = _mmr_select(rel, cc, vids, k=3, lam=0.7)
    # rank1 = most relevant (10); rank2 skips the near-dup 11 for 12;
    # rank3 re-admits 11 (0.658-0.3*0.99=0.361 beats 13's 0.385-0.06=0.325)
    assert vids[picks].tolist() == [10, 12, 11]
    assert scores[0] == np.round(0.7 * 0.95, 6)
    assert scores[1] == np.round(0.7 * 0.60 - 0.3 * 0.10, 6)
    assert scores[2] == np.round(0.7 * 0.94 - 0.3 * 0.99, 6)


def test_mmr_lam_one_is_pure_relevance(embeddings):
    from datafiller_ray.pipelines.ann import brute_force_topk, mmr_rerank

    ds, M = embeddings
    qids = np.array([0, 17])
    plain = brute_force_topk(ds, qids, M[qids], k=5).to_pandas()
    mmr = mmr_rerank(ds, qids, M[qids], k=5, n_cand=20, lam=1.0).to_pandas()
    for q in qids:
        a = plain[plain.query_id == q].sort_values("rank")["vec_id"].tolist()
        b = mmr[mmr.query_id == q].sort_values("rank")["vec_id"].tolist()
        assert a == b, (q, a, b)


def test_mmr_matches_independent_replica(embeddings):
    # end-to-end vs a from-scratch numpy MMR over the same candidate rule
    from datafiller_ray.pipelines.ann import mmr_rerank

    ds, M = embeddings
    qids = np.array([0, 101])
    lam, k, n_cand = 0.5, 10, 50
    got = mmr_rerank(ds, qids, M[qids], k=k, n_cand=n_cand, lam=lam).to_pandas()
    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    vids_all = np.arange(len(M), dtype=np.int64)
    for q in qids:
        sims = np.round(Mn @ Mn[q], 6)
        cand = np.lexsort((vids_all, -sims))[:n_cand]
        rel, cvid = sims[cand], vids_all[cand]
        cc = np.round(Mn[cand] @ Mn[cand].T, 6)
        chosen = []
        for _ in range(k):
            best = None
            for pos in range(n_cand):
                if pos in chosen:
                    continue
                pen = max((cc[pos][c] for c in chosen), default=0.0)
                sc = float(np.round(lam * rel[pos] - (1 - lam) * pen, 6))
                key = (-sc, int(cvid[pos]))
                if best is None or key < best:
                    best, bpos = key, pos
            chosen.append(bpos)
        sub = got[got.query_id == q].sort_values("rank")
        assert sub["vec_id"].tolist() == [int(cvid[p]) for p in chosen]
        # rank1 is the query itself (sim 1.0 dominates at any lam > 0)
        assert sub["vec_id"].iloc[0] == q
        # greedy max with a growing penalty: selected scores non-increasing
        s = sub["mmr_score"].to_numpy()
        assert (np.diff(s) <= 1e-9).all()


def test_mmr_validation(embeddings):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import mmr_rerank

    ds, M = embeddings
    q = np.array([0])
    with pytest.raises(EngineValueError):
        mmr_rerank(ds, q, M[q], k=0)
    with pytest.raises(EngineValueError):
        mmr_rerank(ds, q, M[q], k=10, n_cand=5)
    with pytest.raises(EngineValueError):
        mmr_rerank(ds, q, M[q], lam=0.0)


def test_mutual_knn_properties(embeddings):
    from datafiller_ray.pipelines.ann import mutual_knn

    ds, M = embeddings
    got = mutual_knn(ds, k=5).to_pandas()
    assert len(got) > 0
    # canonical orientation, valid ranks
    assert (got["vec_a"] < got["vec_b"]).all()
    assert got["rank_ab"].between(1, 5).all()
    assert got["rank_ba"].between(1, 5).all()
    # no duplicate pairs survive the exchange
    assert not got.duplicated(["vec_a", "vec_b"]).any()
    # brute-force mutuality replica
    Mn = M.astype(np.float64)
    Mn = Mn / np.linalg.norm(Mn, axis=1, keepdims=True)
    S = np.round(Mn @ Mn.T, 6)
    np.fill_diagonal(S, -np.inf)
    n = len(M)
    vids = np.arange(n)
    tops = [set(np.lexsort((vids, -S[i]))[:5].tolist()) for i in range(n)]
    expect = {
        (i, j)
        for i in range(n)
        for j in tops[i]
        if i < j and i in tops[j]
    }
    assert set(zip(got["vec_a"], got["vec_b"])) == expect
    # mutual edges connect genuinely near vectors on the clustered fixture
    sims = S[got["vec_a"].to_numpy(), got["vec_b"].to_numpy()]
    np.testing.assert_allclose(got["sim"].to_numpy(), sims)
    # block-layout invariance of the whole graph
    again = mutual_knn(ds.repartition(5), k=5).to_pandas()
    lhs = got.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    rhs = again.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)


def test_mutual_knn_validation(embeddings):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import mutual_knn

    ds, _ = embeddings
    with pytest.raises(EngineValueError):
        mutual_knn(ds, k=0)


def test_knn_outlier_flags_injected_novelty(embeddings):
    from datafiller_ray.pipelines.ann import knn_outlier

    ds, M = embeddings
    # inject one vector orthogonal-ish to every cluster
    rng = np.random.default_rng(99)
    novel = rng.standard_normal(32).astype(np.float32) * 50
    df = pd.DataFrame({"vec_id": [9999]})
    df["embedding"] = [novel]
    ds2 = ds.union(ray.data.from_pandas(df))
    out = knn_outlier(ds2, k=5).to_pandas().set_index("vec_id")
    assert len(out) == 801
    # scores in [0, 2] (cosine range), round6
    assert out["score"].between(0, 2).all()
    # the injected vector has (near-)max score: in-cluster members have a
    # 5th NN at cos ~0.95 -> score ~0.05; the novel point does not
    med = float(out.drop(9999)["score"].median())
    assert out.loc[9999, "score"] > med + 0.3
    # layout invariance
    again = knn_outlier(ds2.repartition(6), k=5).to_pandas().set_index("vec_id")
    pd.testing.assert_frame_equal(
        out.sort_index(), again.sort_index()
    )


def test_knn_outlier_validation(embeddings):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import knn_outlier

    ds, _ = embeddings
    with pytest.raises(EngineValueError):
        knn_outlier(ds, k=0)
    small = ray.data.from_pandas(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [[1.0, 0.0], [0.0, 1.0]]})
    )
    with pytest.raises(EngineValueError):
        knn_outlier(small, k=5)


# ---------------------------------------------------------------------------
# blockwise (bounded-memory) exact siblings == brute broadcast, bit-for-bit


def test_embedding_near_dup_blockwise_matches_brute(embeddings):
    from datafiller_ray.pipelines.ann import embedding_near_dup

    ds, _ = embeddings
    brute = (
        embedding_near_dup(ds, threshold=0.8)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    # max_broadcast_rows=0 forces the shard-pair exchange path
    blockwise = (
        embedding_near_dup(ds, threshold=0.8, max_broadcast_rows=0, n_shards=4)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    assert len(brute) > 0
    pd.testing.assert_frame_equal(brute, blockwise[brute.columns.tolist()])


def test_mutual_knn_blockwise_matches_brute(embeddings):
    from datafiller_ray.pipelines.ann import mutual_knn

    ds, _ = embeddings
    cols = ["vec_a", "vec_b"]
    brute = mutual_knn(ds, k=5).to_pandas().sort_values(cols).reset_index(drop=True)
    blockwise = (
        mutual_knn(ds, k=5, max_broadcast_rows=0, n_shards=4)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(brute) > 0
    pd.testing.assert_frame_equal(brute, blockwise[brute.columns.tolist()])


def test_knn_outlier_blockwise_matches_brute(embeddings):
    from datafiller_ray.pipelines.ann import knn_outlier

    ds, _ = embeddings
    brute = knn_outlier(ds, k=5).to_pandas().sort_values("vec_id").reset_index(drop=True)
    blockwise = (
        knn_outlier(ds, k=5, max_broadcast_rows=0, n_shards=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(brute) == 800
    pd.testing.assert_frame_equal(brute, blockwise[brute.columns.tolist()])


def test_blockwise_knn_edges_layout_invariant(embeddings):
    from datafiller_ray.pipelines.ann import _blockwise_knn_edges

    ds, _ = embeddings
    cols = ["src", "rank"]
    e1 = (
        _blockwise_knn_edges(ds, k=3, n_shards=4)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    e2 = (
        _blockwise_knn_edges(ds.repartition(7), k=3, n_shards=2)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(e1) == 800 * 3
    pd.testing.assert_frame_equal(e1, e2[e1.columns.tolist()])


def test_embedding_near_dup_lsh_candidate_guard(embeddings):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.ann import embedding_near_dup_lsh

    ds, M = embeddings
    with pytest.raises(EngineValueError, match="max_candidates"):
        embedding_near_dup_lsh(
            ds, dim=M.shape[1], threshold=0.8, max_candidates=1
        ).to_pandas()
