"""Inverted text index: build -> partition-pruned boolean / ranked search
(pipelines/text_index). Oracle: brute-force pandas tokenization of the same
documents with the shared ``(?a)\\w+|[^\\w\\s]`` rule."""

import os
import re

import numpy as np
import pandas as pd
import pytest

import ray.data

from datafiller_ray.config import EngineValueError
from datafiller_ray.pipelines.text_index import (
    build_text_index,
    text_index_query_paths,
    text_index_search,
    text_index_topk,
)

_PAT = r"(?a)\w+|[^\w\s]"


@pytest.fixture(scope="module")
def docs_df(ray_session):
    rng = np.random.default_rng(11)
    vocab = [
        "fast", "hash", "join", "sort", "merge", "scan", "table", "row",
        "batch", "stream", "spark", "window", "filter", "key", "data",
    ]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 40)))
        for _ in range(400)
    ]
    texts.append("")  # empty doc: no postings
    texts.append("fast fast fast hash join")  # guaranteed AND hit
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


@pytest.fixture(scope="module")
def index_dir(docs_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("textidx") / "idx")
    ds = ray.data.from_pandas(docs_df).repartition(7)
    build_text_index(ds, d, n_partitions=16)
    return d


def brute(docs_df: pd.DataFrame, terms: "list[str]") -> pd.DataFrame:
    rows = []
    for _, r in docs_df.iterrows():
        toks = re.findall(_PAT, r["text"])
        hits = {t: toks.count(t) for t in terms if t in toks}
        rows.append((r["doc_id"], len(hits), sum(hits.values())))
    return pd.DataFrame(rows, columns=["doc_id", "n_hit", "total_tf"])


def test_search_and_semantics(index_dir, docs_df):
    got = (
        text_index_search(index_dir, "fast hash join")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = brute(docs_df, ["fast", "hash", "join"])
    want = (
        b[b["n_hit"] == 3][["doc_id", "total_tf"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_topk_or_semantics(index_dir, docs_df):
    got = text_index_topk(index_dir, "fast hash join", k=15).to_pandas()
    b = brute(docs_df, ["fast", "hash", "join"])
    b = b[b["n_hit"] > 0]
    want = (
        b.sort_values(["total_tf", "doc_id"], ascending=[False, True])
        .head(15)[["doc_id", "total_tf"]]
        .reset_index(drop=True)
    )
    want["rank"] = np.arange(1, len(want) + 1, dtype=np.int64)
    pd.testing.assert_frame_equal(
        got[["doc_id", "total_tf", "rank"]], want, check_dtype=False
    )


def test_partition_pruning_is_real(index_dir):
    """A 3-term query must read strictly fewer partitions than exist — the
    I/O-pruning contract (the build_lsh_index / build_ivf_index shape)."""
    terms, paths = text_index_query_paths(index_dir, "fast hash join")
    assert terms == ["fast", "hash", "join"]
    all_parts = [d for d in os.listdir(index_dir) if d.startswith("part=")]
    assert 0 < len(paths) <= 3 < len(all_parts)


def test_no_match_and_edge_cases(index_dir):
    out = text_index_search(index_dir, "zzznope")
    # NOTE: to_pandas() on a 0-row Ray dataset drops columns; assert on the
    # dataset schema, which is what downstream stages consume
    assert out.schema().names == ["doc_id", "total_tf"]
    assert out.count() == 0
    with pytest.raises(EngineValueError):
        text_index_search(index_dir, "   ")
    with pytest.raises(EngineValueError):
        text_index_topk(index_dir, "fast", k=0)


def test_empty_doc_has_no_postings(index_dir, docs_df):
    """The all-empty document contributes nothing: OR search for every
    vocab word never returns it."""
    empty_id = int(docs_df[docs_df["text"] == ""]["doc_id"].iloc[0])
    got = text_index_topk(
        index_dir, " ".join(sorted(set(" ".join(docs_df["text"]).split()))),
        k=len(docs_df),
    ).to_pandas()
    assert empty_id not in set(got["doc_id"])
