"""Persisted inverted text index (term -> postings) with partition-pruned
boolean / ranked search.

The reference engine has no lexical index; this is part of the
beyond-reference training-data toolkit, the text-side sibling of the
storage-partitioned ANN indexes (``pipelines/ann.py`` ``build_lsh_index`` /
``build_ivf_index``): pay one corpus pass to build, then every query reads
ONLY the partitions that can contain its terms.

Layout: ``index_dir/part=P/*.parquet`` with rows ``(term, doc_id, tf)``
where ``P = string_hash64(term) % n_partitions``, plus
``_text_index_manifest.json`` recording ``n_partitions``. A query
tokenizes with the SAME ``(?a)\\w+|[^\\w\\s]`` rule as
``corpus.bm25_topk`` (and the DuckDB oracles), maps its terms to their
partitions, and reads just those directories — at corpus scale the read
fan-in is ``|query terms| / n_partitions`` of the postings table, then
parquet predicate pushdown on ``term`` prunes row groups inside each
partition. Scores are integer term frequencies throughout, so results are
bit-exact under any merge order.

Scale posture: the postings build is one ``map_batches`` pass (vectorized
pandas explode + groupby per batch — no exchange; ``write_parquet``'s
partition_cols performs the scatter) and each search is one bounded
coarse-key ``grouped_sum`` exchange over ONLY the matched postings.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pandas as pd

import ray.data

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.hashing import string_hash64

# shared with corpus.bm25_topk and every tokenizing SQL oracle
_TOKEN_PATTERN = r"(?a)\w+|[^\w\s]"
_MANIFEST = "_text_index_manifest.json"


def _query_terms(query: str) -> list[str]:
    terms = sorted(set(re.findall(_TOKEN_PATTERN, query)))
    if not terms:
        raise EngineValueError(f"query has no tokens: {query!r}")
    return terms


def _term_partitions(terms: "list[str]", n_partitions: int) -> np.ndarray:
    h = string_hash64(np.asarray(terms, dtype="U"))
    return (h % np.uint64(n_partitions)).astype(np.int64)


def _postings_fn(n_partitions: int):
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("").reset_index(drop=True)
        ids = batch["doc_id"].to_numpy(np.int64)
        toks = texts.str.findall(_TOKEN_PATTERN).explode().dropna()
        if toks.empty:
            return pd.DataFrame(
                {
                    "term": pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "tf": pd.Series([], dtype=np.int64),
                    "part": pd.Series([], dtype=np.int64),
                }
            )
        flat = pd.DataFrame(
            {
                "term": toks.to_numpy(dtype=object),
                "doc_id": ids[toks.index.to_numpy(np.int64)],
            }
        )
        tf = (
            flat.groupby(["term", "doc_id"], sort=True)
            .size()
            .rename("tf")
            .reset_index()
        )
        tf["tf"] = tf["tf"].astype(np.int64)
        terms = tf["term"].to_numpy(dtype="U")
        tf["part"] = (
            string_hash64(terms) % np.uint64(n_partitions)
        ).astype(np.int64)
        return tf

    return fn


def build_text_index(
    documents: "ray.data.Dataset",
    index_dir: str,
    *,
    n_partitions: int = 64,
) -> str:
    """Build the inverted index: one streaming pass over ``documents``
    (columns ``doc_id``, ``text``) -> term-hash-partitioned postings under
    ``index_dir``. Postings rows are unique per (term, doc_id) WITHIN a
    batch; cross-batch duplicates of a (term, doc_id) pair cannot occur
    because a document lives in exactly one batch."""
    if n_partitions < 1:
        raise EngineValueError(
            f"n_partitions must be >= 1, got {n_partitions}"
        )
    documents.map_batches(
        _postings_fn(n_partitions), batch_format="pandas"
    ).write_parquet(index_dir, partition_cols=["part"])
    with open(os.path.join(index_dir, _MANIFEST), "w") as f:
        json.dump({"n_partitions": n_partitions}, f)
    return index_dir


def text_index_query_paths(
    index_dir: str, query: str
) -> "tuple[list[str], list[str]]":
    """Terms of ``query`` plus the partition directories a search will
    read — exposed separately so tests can assert the pruning (the
    ``lsh_index_query_paths`` contract)."""
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    terms = _query_terms(query)
    parts = _term_partitions(terms, int(manifest["n_partitions"]))
    paths = [
        os.path.join(index_dir, f"part={p}")
        for p in sorted(set(int(p) for p in parts))
    ]
    return terms, [p for p in paths if os.path.isdir(p)]


def _matched_postings(index_dir: str, query: str):
    """Read only the query terms' partitions, filter to exactly those terms
    (parquet row-group pushdown first, then an exact Arrow mask)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import glob

    terms, paths = text_index_query_paths(index_dir, query)
    files = sorted(
        f for p in paths for f in glob.glob(os.path.join(p, "*.parquet"))
    )
    if not files:
        return terms, None
    value_set = pa.array(terms, type=pa.string())

    def keep(t: "pa.Table") -> "pa.Table":
        return t.filter(pc.is_in(t["term"], value_set=value_set))

    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        files,
        columns=["term", "doc_id", "tf"],
        filter=pads.field("term").isin(terms),
    )
    return terms, ds.map_batches(keep, batch_format="pyarrow")


def _empty_result(columns: "dict[str, object]"):
    return ray.data.from_pandas(pd.DataFrame(columns))


def text_index_search(index_dir: str, query: str) -> "ray.data.Dataset":
    """Conjunctive (AND) boolean search: documents containing EVERY query
    term, with the summed term frequency. Output ``(doc_id, total_tf)``.

    Plan: pruned postings read -> per-doc ``grouped_sum`` over (tf, hit)
    — postings are unique per (term, doc), so the hit sum counts DISTINCT
    matched terms — -> keep rows where every term hit. One bounded
    exchange over matched postings only; all integers, bit-exact."""
    from datafiller_ray.stages.exchange import grouped_sum

    terms, postings = _matched_postings(index_dir, query)
    if postings is None:
        return _empty_result(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "total_tf": pd.Series([], dtype=np.int64),
            }
        )
    n_terms = len(terms)

    def add_hit(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id", "tf"]].copy()
        out["hit"] = np.int64(1)
        return out

    # sentinel row (hit=0 can never reach n_terms >= 1): keeps the reduce
    # side non-empty, so a query whose terms all miss still yields a typed
    # empty result instead of a schemaless zero-block dataset
    sentinel = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series([-1], dtype=np.int64),
                "tf": pd.Series([0], dtype=np.int64),
                "hit": pd.Series([0], dtype=np.int64),
            }
        )
    )
    sums = grouped_sum(
        postings.map_batches(add_hit, batch_format="pandas").union(sentinel),
        "doc_id",
        ["tf", "hit"],
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["hit"] == n_terms]
        out = out[["doc_id", "tf"]].rename(columns={"tf": "total_tf"})
        return out.sort_values("doc_id").reset_index(drop=True)

    return sums.map_batches(finish, batch_format="pandas")


def text_index_topk(
    index_dir: str, query: str, *, k: int = 20
) -> "ray.data.Dataset":
    """Disjunctive (OR) ranked search: top-k documents by total term
    frequency over the query's terms (integer scores -> exact under any
    merge order; ties broken by doc_id asc). Output
    ``(doc_id, total_tf, rank)``."""
    from datafiller_ray.stages.exchange import grouped_sum, topk_block_fn

    if k < 1:
        raise EngineValueError(f"k must be >= 1, got {k}")
    _, postings = _matched_postings(index_dir, query)
    if postings is None:
        return _empty_result(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "total_tf": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
            }
        )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id", "tf"]].rename(columns={"tf": "total_tf"})
        return out

    # tf=0 sentinel: real matches always have total_tf >= 1, so add_rank's
    # total_tf > 0 filter removes it while keeping the reduce side typed
    sentinel = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series([-1], dtype=np.int64),
                "total_tf": pd.Series([0], dtype=np.int64),
            }
        )
    )
    sums = grouped_sum(
        postings.map_batches(project, batch_format="pandas").union(sentinel),
        "doc_id",
        "total_tf",
    )
    prune = topk_block_fn(k, "total_tf", ["doc_id"])
    pruned = sums.map_batches(prune, batch_format="pyarrow")
    final = pruned.repartition(1).map_batches(prune, batch_format="pyarrow")

    def add_rank(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[batch["total_tf"] > 0]
        out = out.sort_values(
            ["total_tf", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return final.map_batches(add_rank, batch_format="pandas")
