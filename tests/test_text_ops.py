"""Training-data ops: dedup, minhash verify/cluster, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from datafiller_ray.pipelines import multimodal
from datafiller_ray.pipelines.text import (
    exact_dedup,
    minhash_near_dup,
    near_dup_clusters,
    ngram_jaccard,
    verify_near_dup_pairs,
)


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    base = "the quick brown fox jumps over the lazy dog and runs far away "
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": f"unique document number {i} " + "x" * i})
    # exact duplicates
    rows.append({"doc_id": 100, "text": base * 4})
    rows.append({"doc_id": 101, "text": base * 4})
    # near duplicates (one word changed)
    rows.append({"doc_id": 102, "text": base * 3 + "suffix one two three"})
    rows.append({"doc_id": 103, "text": base * 3 + "suffix one two four"})
    df = pd.DataFrame(rows)
    df["source"] = "t"
    df["n_chars"] = df["text"].str.len()
    df["lang"] = "en"
    return ray.data.from_pandas(df)


def test_exact_dedup_keeps_min_doc_id(dup_docs):
    out = exact_dedup(dup_docs).to_pandas()
    assert 100 in set(out.doc_id) and 101 not in set(out.doc_id)
    assert len(out) == 33  # 30 unique + one of (100,101) + 102 + 103


def test_minhash_finds_near_dups_and_verify_clusters(dup_docs):
    pairs = minhash_near_dup(dup_docs)
    verified = verify_near_dup_pairs(dup_docs, pairs, threshold=0.8).to_pandas()
    edges = {tuple(sorted((int(a), int(b)))) for a, b in zip(verified.doc_a, verified.doc_b)}
    assert (100, 101) in edges
    assert (102, 103) in edges
    clusters = near_dup_clusters(verified)
    cl = dict(zip(clusters.doc_id, clusters.cluster_id))
    assert cl[101] == 100 and cl[103] == 102


def test_minhash_batch_signatures_match_per_doc():
    from datafiller_ray.pipelines.text import MinHasher

    mh = MinHasher()
    texts = pd.Series(
        [
            "the quick brown fox jumps over the lazy dog",
            "",  # empty -> skipped
            "abcd",  # shorter than K -> skipped
            "aaaaaaaaaaaaaaaa",  # duplicate shingles
            "Unicode é ü ß text with Mixed CASE and 1234 numbers",
            "x" * 4 + "y",  # exactly K bytes
        ]
    )
    keep, sig = mh.signatures_batch(texts)
    expected_keep = [i for i, t in enumerate(texts) if mh.signature(t) is not None]
    assert keep.tolist() == expected_keep
    for row, i in enumerate(keep):
        np.testing.assert_array_equal(sig[row], mh.signature(texts[i]), err_msg=str(i))


def test_ngram_jaccard_kernel():
    assert ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0
    assert 0.0 < ngram_jaccard("abcdefgh", "abcdefgx") < 1.0
    assert ngram_jaccard("", "") == 1.0
    assert ngram_jaccard("abc", "") in (0.0, 1.0)


def test_media_feature_plumbing(ray_session):
    table = multimodal.synthesize_media_table(50)
    ds = ray.data.from_arrow(table)
    out = multimodal.media_features(ds).to_pandas()
    assert len(out) == 50
    feats = np.stack(out["features"])
    assert feats.shape == (50, multimodal.MediaFeatureExtractor.FEATURE_DIM)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, atol=1e-5)
    # deterministic: same input -> same features
    out2 = multimodal.media_features(ray.data.from_arrow(table)).to_pandas()
    np.testing.assert_array_equal(np.stack(out2["features"]), feats)


def test_media_real_decoder_raises():
    with pytest.raises(NotImplementedError, match="decoder"):
        multimodal.MediaFeatureExtractor(decoder="pillow")


def test_lsh_index_prunes_partitions_and_matches_scan(ray_session, tmp_path):
    """The bucket-partitioned index must (a) read only matching partitions
    and (b) return exactly what the full-scan LSH path returns."""
    import os

    import pyarrow.parquet as pq

    from datafiller_ray.pipelines.ann import (
        build_lsh_index,
        lsh_index_query_paths,
        lsh_topk,
        lsh_topk_indexed,
    )

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ds = ray.data.from_arrow(t)
    qt = t.slice(0, 4)
    qids = np.asarray(qt["vec_id"])
    qmat = np.stack(qt["embedding"].to_pylist()).astype(np.float64)

    index_dir = str(tmp_path / "lsh_index")
    build_lsh_index(ds, index_dir, dim=64, n_planes=6)

    all_parts = {d for d in os.listdir(index_dir) if d.startswith("bucket=")}
    qbuckets, paths = lsh_index_query_paths(index_dir, qmat)
    read_parts = {os.path.basename(p) for p in paths}
    # pruning: the query run touches a strict subset of the partitions
    assert read_parts and read_parts < all_parts
    assert len(read_parts) <= len(set(qbuckets.tolist()))

    got = (
        lsh_topk_indexed(index_dir, qids, qmat, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        lsh_topk(ray.data.from_arrow(t), qids, qmat, k=5, n_planes=6)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "vec_id"]], want[["query_id", "rank", "vec_id"]]
    )


def test_media_resize_plumbing(ray_session):
    table = multimodal.synthesize_media_table(40)
    out = multimodal.media_resize(ray.data.from_arrow(table), 32, 24).to_pandas()
    assert len(out) == 40
    assert (out["width"] == 32).all() and (out["height"] == 24).all()
    assert all(len(p) == 32 * 24 for p in out["payload"])
    # deterministic
    out2 = multimodal.media_resize(ray.data.from_arrow(table), 32, 24).to_pandas()
    assert list(out["payload"]) == list(out2["payload"])


def test_frame_sample_plumbing(ray_session):
    table = multimodal.synthesize_video_table(20)
    ds = ray.data.from_arrow(table)
    out = multimodal.frame_sample(ds, every_k=4).to_pandas()
    import math

    want_rows = sum(math.ceil(int(nf) / 4) for nf in table["n_frames"].to_pylist())
    assert len(out) == want_rows
    # each sampled frame is exactly frame_bytes long and matches the payload slice
    meta = {int(i): (int(nf), int(fb), bytes(p)) for i, nf, fb, p in zip(
        table["media_id"].to_pylist(), table["n_frames"].to_pylist(),
        table["frame_bytes"].to_pylist(), table["payload"].to_pylist())}
    for r in out.itertuples():
        nf, fb, payload = meta[int(r.media_id)]
        assert len(r.frame) == fb
        assert r.frame == payload[r.frame_idx * fb : (r.frame_idx + 1) * fb]


def test_audio_resample_and_features(ray_session):
    import numpy as np

    table = multimodal.synthesize_audio_table(24)
    ds = ray.data.from_arrow(table)
    res = multimodal.audio_resample(ds, target_rate=16_000).to_pandas()
    assert (res["sample_rate"] == 16_000).all()
    src = table.to_pandas().set_index("audio_id")
    for r in res.itertuples():
        n_in = int(src.loc[r.audio_id, "n_samples"])
        rate_in = int(src.loc[r.audio_id, "sample_rate"])
        assert r.n_samples == max(1, round(n_in * 16_000 / rate_in))
        assert len(bytes(r.payload)) == 2 * r.n_samples
    # linear resampling preserves signal energy approximately: compare RMS
    # before and after on the same clips (sine + small noise fixture)
    f_in = multimodal.audio_features(ds).to_pandas().set_index("audio_id")
    f_out = (
        multimodal.audio_features(ray.data.from_pandas(res))
        .to_pandas()
        .set_index("audio_id")
    )
    ratio = (f_out["rms"] / f_in["rms"]).to_numpy()
    assert (ratio > 0.7).all() and (ratio < 1.3).all()
    # determinism
    res2 = multimodal.audio_resample(ds, target_rate=16_000).to_pandas()
    a = res.sort_values("audio_id").reset_index(drop=True)
    b = res2.sort_values("audio_id").reset_index(drop=True)
    assert all(bytes(x) == bytes(y) for x, y in zip(a["payload"], b["payload"]))


def test_audio_real_decoder_raises():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.AudioResampler(16_000, decoder="ffmpeg")


def test_distributed_clusters_match_union_find(ray_session):
    """Min-label propagation (the at-scale path) must produce exactly the
    driver union-find's (doc_id, cluster_id) table — including multi-hop
    chains, where components merge only through propagation."""
    from datafiller_ray.pipelines.text import near_dup_clusters_distributed

    edges = pd.DataFrame(
        {
            # chain 1-2-3-4 (multi-hop), clique 10-11-12, pair (20, 7)
            "doc_a": [2, 3, 4, 10, 10, 11, 20],
            "doc_b": [1, 2, 3, 11, 12, 12, 7],
        }
    )
    want = near_dup_clusters(edges)
    got = near_dup_clusters_distributed(ray.data.from_pandas(edges))
    pd.testing.assert_frame_equal(
        got, want.sort_values("doc_id").reset_index(drop=True), check_dtype=False
    )
    # empty edge set -> empty table, no crash
    empty = near_dup_clusters_distributed(
        ray.data.from_pandas(edges.iloc[:0])
    )
    assert len(empty) == 0


def test_fimg_container_roundtrip_and_metadata(ray_session):
    """FIMG header encode/parse round-trip + the EXIF-style extraction
    stage: metadata columns come from the header only (pixels untouched),
    bad payloads degrade to parse_ok=False rows."""
    tags = {"camera_make": "acme", "timestamp_utc": "1700000123", "orientation": "6"}
    payload = multimodal.encode_fimg(40, 30, 1, tags, b"\x00" * (40 * 30))
    m = multimodal.parse_fimg(payload)
    assert (m["width"], m["height"], m["channels"]) == (40, 30, 1)
    assert m["tags"] == tags
    assert len(payload) - m["pixel_offset"] == 40 * 30

    table = multimodal.synthesize_fimg_table(20)
    ds = ray.data.from_arrow(table)
    out = (
        multimodal.media_metadata(ds)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert out["parse_ok"].all()
    assert out["n_tags"].eq(3).all()
    assert out.loc[0, "camera_make"] == "acme"
    assert set(out["orientation"].astype(int)) <= set(range(1, 9))
    assert (np.diff(out["timestamp_utc"].astype(np.int64)) == 60).all()

    # a corrupt payload yields a null row, not a failed batch
    import pyarrow as pa

    bad = pa.table(
        {
            "media_id": pa.array([99], pa.int64()),
            "media_type": pa.array(["image"], pa.string()),
            "payload": pa.array([b"JUNKJUNK"], pa.large_binary()),
        }
    )
    row = multimodal.media_metadata(ray.data.from_arrow(bad)).to_pandas()
    assert not row["parse_ok"].iloc[0] and row["n_tags"].iloc[0] == 0


def test_image_decoder_seam(ray_session):
    """decoder='auto' must run with or without Pillow: absent -> identical
    output to the fake decode; present -> the real backend is selected."""
    kind, backend = multimodal.resolve_image_decoder("auto")
    table = multimodal.synthesize_media_table(12)
    out_auto = multimodal.media_features(
        ray.data.from_arrow(table), decoder="auto"
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    if kind == "fake":
        assert backend is None
        out_fake = multimodal.media_features(
            ray.data.from_arrow(table), decoder="fake"
        ).to_pandas().sort_values("media_id").reset_index(drop=True)
        assert all(
            np.array_equal(a, b)
            for a, b in zip(out_auto["features"], out_fake["features"])
        )
        with pytest.raises(NotImplementedError):
            multimodal.resolve_image_decoder("pillow")
    else:  # pragma: no cover - Pillow not in this container
        assert backend is not None
        assert len(out_auto) == 12
    with pytest.raises(ValueError):
        multimodal.resolve_image_decoder("bogus")


def test_normalized_dedup_catches_reformatted_duplicates(ray_session):
    from datafiller_ray.pipelines.text import exact_dedup, normalized_dedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["s"] * 6,
            "text": [
                "the quick brown fox",
                "The  Quick   Brown Fox",      # case + runs: dup of 0
                "\tthe quick brown fox \n",    # padding: dup of 0
                "the quick brown foxes",       # distinct
                "THE QUICK BROWN FOXES",       # case: dup of 3
                "a different document",
            ],
            "n_chars": np.arange(6, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df)
    norm = normalized_dedup(ds).to_pandas()
    assert sorted(norm.doc_id) == [0, 3, 5]
    # byte-exact dedup keeps everything here — the operators differ
    assert len(exact_dedup(ds).to_pandas()) == 6


def test_normalize_series_ascii_whitespace_only():
    from datafiller_ray.pipelines.text import _normalize_series

    s = pd.Series(["A  B"])  # NBSP is NOT \s under the ASCII pin
    assert _normalize_series(s).iloc[0] == "a  b"


def test_normalize_series_keeps_unicode_whitespace_like_sql_trim():
    from datafiller_ray.pipelines.text import _normalize_series

    # NBSP is neither collapsed (ASCII-pinned class) nor stripped
    # (strip(" ") == DuckDB trim) — engine and oracle agree on keeping it
    s = pd.Series([" hello world", " hello world "])
    out = _normalize_series(s)
    assert out.iloc[0] == " hello world"
    assert out.iloc[1] == "hello world"


def test_near_dup_keep_best(ray_session):
    """Keep the longest doc per cluster (ties -> smallest doc_id); pass
    un-clustered docs through; empty clusters == identity."""
    from datafiller_ray.pipelines.text import near_dup_keep_best

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 10, 11, 50],
            "text": ["a", "b", "c", "d", "e", "f"],
            "lang": ["en"] * 6,
            "source": ["s1"] * 6,
            # cluster {1,2,3}: 2 and 3 tie at max length -> doc 2 wins
            "n_chars": [5, 9, 9, 4, 4, 7],
        }
    )
    clusters = pd.DataFrame(
        {"doc_id": [1, 2, 3, 10, 11], "cluster_id": [1, 1, 1, 10, 10]}
    )
    out = (
        near_dup_keep_best(ray.data.from_pandas(docs), clusters)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [2, 10, 50]
    # ties inside cluster 10 (both n_chars=4) -> smallest doc_id kept
    assert 10 in out["doc_id"].tolist() and 11 not in out["doc_id"].tolist()

    # empty clusters: identity projection
    ident = near_dup_keep_best(
        ray.data.from_pandas(docs), clusters.iloc[:0]
    ).to_pandas()
    assert sorted(ident["doc_id"].tolist()) == docs["doc_id"].tolist()


def test_corpus_prepare_reasons_and_staged_equivalence(ray_session):
    from datafiller_ray.pipelines.text import corpus_prepare

    en = "the and is of to in that it was for on are as with his they at be "
    rows = [
        # quality drop: too few tokens
        {"doc_id": 1, "text": "one two"},
        # quality drop: digit-heavy
        {"doc_id": 2, "text": "1234567890 " * 8 + "word " * 4},
        # lang drop: passes quality but no english stopwords
        {"doc_id": 3, "text": "zzz qqq vvv kkk yyy www " * 10},
        # survivors: 4/5 exact dups (min doc_id kept), 6 unique
        {"doc_id": 4, "text": en * 3},
        {"doc_id": 5, "text": en * 3},
        {"doc_id": 6, "text": en * 3 + "tail words here now"},
        # quality-dropped doc whose text equals a survivor's: must NOT
        # participate in dedup (reason stays 'quality', 4 still 'kept')
        {"doc_id": 7, "text": "12345 " * 40 + en},
    ]
    df = pd.DataFrame(rows)
    df["source"] = "t"
    df["n_chars"] = df["text"].str.len()
    df["lang"] = "en"
    ds = ray.data.from_pandas(df)

    out = corpus_prepare(ds).to_pandas().set_index("doc_id")["reason"]
    assert out[1] == "quality" and out[2] == "quality"
    assert out[3] == "lang"
    assert out[4] == "kept" and out[5] == "duplicate"
    assert out[6] == "kept"
    assert out[7] == "quality"

    # staged equivalence: quality -> lang -> exact dedup run as separate
    # pipeline stages must attribute identically
    from datafiller_ray.pipelines.text import exact_dedup, lang_id, quality_filter

    q_ids = set(quality_filter(ds).to_pandas()["doc_id"])
    lang_pred = lang_id(ds).to_pandas().set_index("doc_id")["lang_pred"]
    lang_ids = {i for i in q_ids if lang_pred[i] == "en"}
    surv = ds.filter(lambda r: r["doc_id"] in lang_ids)
    kept = set(exact_dedup(surv).to_pandas()["doc_id"])
    for doc in df["doc_id"]:
        expect = (
            "quality"
            if doc not in q_ids
            else "lang"
            if doc not in lang_ids
            else "kept"
            if doc in kept
            else "duplicate"
        )
        assert out[doc] == expect, doc


def test_phash_deterministic_and_sensitive():
    from datafiller_ray.pipelines import multimodal as mm

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    dct = mm._dct_matrix(mm.PHASH_GRID)
    h1 = mm.phash_pixels(img, dct)
    h2 = mm.phash_pixels(img.copy(), dct)
    assert h1 == h2 and 0 <= h1 < (1 << 63)
    # a small local perturbation moves few bits; an unrelated image many
    pert = img.copy()
    pert[3:6, 4:7] = 255 - pert[3:6, 4:7]
    other = rng.integers(0, 256, (40, 56), dtype=np.uint8)

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(h1, mm.phash_pixels(pert, dct)) <= 12
    assert ham(h1, mm.phash_pixels(other, dct)) >= 16


def test_media_phash_pipeline_and_near_dup(ray_session):
    import ray.data

    from datafiller_ray.pipelines import multimodal as mm

    table = mm.synthesize_fimg_table(24)
    # plant a near-duplicate of media 0 as media 100: same pixels with a
    # tiny patch flipped; and one corrupted payload as media 101
    raw0 = bytes(table["payload"][0].as_py())
    m = mm.parse_fimg(raw0)
    w, h = m["width"], m["height"]
    px = np.frombuffer(raw0, np.uint8, count=w * h, offset=m["pixel_offset"]).copy()
    px[: max(1, (w * h) // 200)] ^= 0x01
    dup = mm.encode_fimg(w, h, 1, m["tags"], px.tobytes())
    import pyarrow as pa

    extra = pa.table(
        {
            "media_id": pa.array([100, 101], pa.int64()),
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array([dup, b"not an image"], pa.large_binary()),
        }
    )
    full = pa.concat_tables([table, extra])
    ds = ray.data.from_arrow(full)
    hashed = mm.media_phash(ds).to_pandas()
    assert len(hashed) == 26
    assert not hashed.loc[hashed["media_id"] == 101, "parse_ok"].iloc[0]
    assert hashed.loc[hashed["media_id"] == 100, "parse_ok"].iloc[0]

    pairs = mm.media_phash_near_dup(
        ray.data.from_arrow(full), max_hamming=10
    ).to_pandas()
    hit = pairs[(pairs["media_a"] == 0) & (pairs["media_b"] == 100)]
    assert len(hit) == 1  # the planted near-dup is found, once (deduped)
    assert int(hit["hamming"].iloc[0]) <= 10
    # corrupted payloads never pair
    assert not ((pairs["media_a"] == 101) | (pairs["media_b"] == 101)).any()


def test_readability_literal():
    import numpy as np
    import pandas as pd

    from datafiller_ray.pipelines.text import Readability

    b = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                "The cat sat. It was happy!",
                "fragment with no terminator",
                "",
            ],
        }
    )
    out = Readability()(b)
    # doc 3 has zero words -> filtered; doc 2 clamps to one sentence
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_sents"].tolist() == [2, 1]
    r0 = out.iloc[0]
    assert r0["n_words"] == 6 and r0["n_syll"] == 7
    expect = 0.39 * (6 / 2) + 11.8 * (7 / 6) - 15.59
    assert abs(r0["fk_grade"] - expect) < 1e-6


@pytest.fixture(scope="module")
def quality_docs(ray_session):
    rng = np.random.default_rng(11)
    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(120):
        if i % 3 == 0:
            # junk: digit-heavy / too short
            rows.append({"doc_id": i, "text": "12345 678 " * (1 + i % 2)})
        else:
            k = 6 + int(rng.integers(0, 20))
            rows.append(
                {"doc_id": i, "text": " ".join(rng.choice(words, k))}
            )
    df = pd.DataFrame(rows)
    df["source"] = "t"
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len()
    return ray.data.from_pandas(df), df


def test_logistic_quality_learns_rule_and_is_layout_invariant(quality_docs):
    from datafiller_ray.pipelines.text import fit_logistic_irls, logistic_quality

    ds, df = quality_docs
    out = logistic_quality(ds).to_pandas().sort_values("doc_id")
    assert len(out) == len(df)
    # separable rule-labeled data: the model replicates the rule
    acc = float((out["pred"] == out["label"]).mean())
    assert acc >= 0.95, acc
    assert out["prob"].between(0, 1).all()
    # fixed-point integer partials: betas identical under any block layout
    b1 = fit_logistic_irls(ds)
    b2 = fit_logistic_irls(ds.repartition(7))
    np.testing.assert_array_equal(b1, b2)


def test_logistic_sigmoid_stable():
    from datafiller_ray.pipelines.text import _sigmoid

    z = np.array([-800.0, -30.0, 0.0, 30.0, 800.0])
    with np.errstate(over="raise"):
        p = _sigmoid(z)
    assert p[0] == 0.0 and p[-1] == 1.0
    assert abs(p[2] - 0.5) == 0.0
    assert (np.diff(p) >= 0).all()


def test_logistic_quality_validation(quality_docs):
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.pipelines.text import fit_logistic_irls

    ds, _ = quality_docs
    with pytest.raises(EngineValueError):
        fit_logistic_irls(ds, n_iters=0)
    with pytest.raises(EngineValueError):
        fit_logistic_irls(ds, ridge=0.0)
