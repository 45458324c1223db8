"""Coarse-keyed exact groupby-sum — the engine's replacement for Ray Data's
``groupby(...).sum(...)`` aggregate operator.

Why: Ray's ``Aggregate`` plans ``DataContext.min_parallelism`` (default 200)
reduce partitions regardless of data size; on a loaded box each partition
carries ~0.1 s of task overhead, so even a 21k-row sum costs ~25 s of pure
scheduling (measured — ``groupby().map_groups`` over the same rows is ~3 s,
and a 64-group coarse exchange is sub-second). The fix is the engine's
standing pattern (minhash gkey, skey sub-grouping): route rows through ONE
sort exchange on a BOUNDED coarse key (``hash(key) % n_buckets`` — at most
``n_buckets`` groups, so the reduce side is bounded and dense), then compute
the exact per-key sums VECTORIZED inside each coarse group with a pandas
groupby. Results are bit-identical to the aggregate operator: integer sums
stay int64, groups never split across coarse buckets because the bucket is
a pure function of the full key.

Scale posture: the shuffle carries the same (key, partial) rows either way;
``n_buckets`` bounds reduce-task count, and per-task memory is
``|rows| / n_buckets`` on average — raise ``n_buckets`` when a single
bucket's rows would not fit a task (the callers' rows are pre-aggregated
partials, orders of magnitude smaller than their inputs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from datafiller_ray.config import EngineValueError
from datafiller_ray.functions.hashing import splitmix64, string_hash64

_GK = "_gk"


def _hash_column(col: pd.Series) -> np.ndarray:
    vals = col.to_numpy()
    if np.issubdtype(vals.dtype, np.integer):
        return splitmix64(vals.astype(np.int64).view(np.uint64))
    return string_hash64(col.astype(str).to_numpy(dtype="U"))


def grouped_sum(
    ds,
    keys: "list[str] | str",
    values: "list[str] | str",
    *,
    n_buckets: int = 64,
    how: str = "sum",
    pre_coalesce: "int | None" = None,
):
    """Exact per-key sums (or, via ``how``, min/max — any associative pandas
    reduction with the same partial+final algebra) of ``values`` grouped by
    ``keys``, returned as a Dataset with the key columns plus the value
    columns UNDER THEIR OWN NAMES (no ``sum(x)`` renaming dance).

    Semantics match ``ds.groupby(keys).sum(values)`` exactly; the physical
    plan is one bounded coarse-key sort exchange + a vectorized pandas sum
    per bucket (see module docstring for why this is ~25 s faster per call
    than Ray's aggregate operator on this substrate).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    values = [values] if isinstance(values, str) else list(values)
    if not keys or not values:
        raise EngineValueError("keys and values must be non-empty")
    if _GK in keys or _GK in values:
        raise EngineValueError(f"column name {_GK!r} is reserved")
    if n_buckets < 1:
        raise EngineValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if how not in ("sum", "min", "max"):
        raise EngineValueError(f"how must be sum/min/max, got {how!r}")

    def add_gk(t: "pa.Table") -> "pa.Table":
        # ARROW block in/out: the sort exchange then moves zero-copy Arrow
        # payloads instead of pickled pandas frames (measured ~10x lower
        # scheduling cost on this substrate — COVERAGE.md "Exchange
        # infrastructure"); only the key columns take a cheap per-column
        # pandas hop for the shared hash
        h = _hash_column(t[keys[0]].to_pandas())
        for k in keys[1:]:
            # order-sensitive mix: re-scramble the accumulator BEFORE adding
            # the next key's hash, so (a, b) and (b, a) land differently
            # (splitmix64(h_a + h_b) alone is commutative)
            h = splitmix64(h) + _hash_column(t[k].to_pandas())
        gk = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.select(keys + values).append_column(
            _GK, pa.array(gk, type=pa.int64())
        )

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: null keys form a group like Ray's aggregate (the
        # pandas default silently DROPS their rows)
        out = g.drop(columns=[_GK]).groupby(
            keys, sort=True, as_index=False, dropna=False
        )[values].agg(how)
        return out

    mapped = ds.map_batches(add_gk, batch_format="pyarrow")
    if pre_coalesce:
        # opt-in for DIMENSION-BOUNDED partial streams (the caller's plan
        # must already assert the keyspace is small, e.g. a later
        # broadcast hop on the same key): Ray's sort exchange cost grows
        # with input block count, and coalescing a many-tiny-blocks
        # stream first is ~3x faster (measured 1.0 s -> 0.32 s on a 128
        # x 1.5k-row stream). NEVER set it on unbounded streams — the
        # coalesced blocks must fit worker memory.
        mapped = mapped.repartition(pre_coalesce)
    return mapped.groupby(_GK).map_groups(sum_bucket, batch_format="pandas")


def topk_block_fn(k: int, rank_col: str, tie_cols: "list[str]"):
    """Per-block partial top-k pruner shared by the ranked-reduction
    pipelines (vocab_topk, bm25_topk, transition_topk): keep the k best
    rows by (``rank_col`` desc, ``tie_cols`` asc), preserving the block's
    row order so a final single-block pass applies the identical rule.
    Deterministic: the tie columns must totally order equal-rank rows."""
    import pyarrow as pa

    def fn(t: "pa.Table") -> "pa.Table":
        if t.num_rows <= k:
            return t
        rank = t[rank_col].to_numpy(zero_copy_only=False)
        keys = [
            np.asarray(t[c].to_pylist(), dtype=object) for c in tie_cols
        ]
        order = np.lexsort((*reversed(keys), -rank))[:k]
        return t.take(pa.array(np.sort(order), type=pa.int64()))

    return fn


def grouped_topk(
    ds,
    group: "str | list[str]",
    rank_col: str,
    tie_cols: "list[str]",
    k: int,
    *,
    rank_name: str = "rnk",
    descending: bool = True,
    n_buckets: int = 64,
):
    """Per-group top-k ROWS (payload preserved) by (``rank_col`` DESC —
    or ASC with ``descending=False`` — then ``tie_cols`` ASC), with a
    dense 1..k rank column appended — the row-level sibling of
    :func:`topk_block_fn`'s global prune.

    Physical plan: per-BLOCK prune first (each block keeps at most k rows
    per group it sees, so the exchange carries O(groups_per_block * k)
    rows, never the corpus), then the grouped_sum coarse-key exchange and
    the identical prune per group. Deterministic: ``tie_cols`` must
    totally order equal-rank rows.
    """
    group = [group] if isinstance(group, str) else list(group)
    if k < 1:
        raise EngineValueError(f"k must be >= 1, got {k}")
    if _GK in (*group, rank_col, *tie_cols, rank_name):
        raise EngineValueError(f"column name {_GK!r} is reserved")

    def prune(df: pd.DataFrame, *, final: bool) -> pd.DataFrame:
        by = [*group, rank_col, *tie_cols]
        asc = [True] * len(group) + [not descending] + [True] * len(tie_cols)
        out = df.sort_values(by, ascending=asc, kind="mergesort")
        out = out.groupby(group, sort=False, dropna=False).head(k)
        if final:
            out = out.reset_index(drop=True)
            out[rank_name] = out.groupby(group, sort=False, dropna=False).cumcount() + 1
        return out

    def block_prune(df: pd.DataFrame) -> "pa.Table":
        df = prune(df, final=False).copy()
        h = _hash_column(df[group[0]])
        for g in group[1:]:
            h = splitmix64(h) + _hash_column(df[g])
        df[_GK] = (h % np.uint64(n_buckets)).astype(np.int64)
        # pruned partials ship as ARROW blocks so the sort exchange moves
        # zero-copy payloads (callers' columns are scalars by contract)
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_prune(g: pd.DataFrame) -> pd.DataFrame:
        return prune(g.drop(columns=[_GK]), final=True)

    return (
        ds.map_batches(block_prune, batch_format="pandas")
        .groupby(_GK)
        .map_groups(final_prune, batch_format="pandas")
    )


def grouped_agg(
    ds,
    keys: "list[str] | str",
    aggs: "dict[str, str]",
    *,
    n_buckets: int = 64,
    pre_coalesce: "int | None" = None,
):
    """Mixed per-column reductions through ONE bounded coarse-key exchange
    — ``grouped_sum`` generalized to a per-value ``how`` map (``{"n":
    "sum", "last_ts": "max"}``). Same partial+final algebra contract:
    every reduction must be associative/commutative (sum/min/max), so the
    per-batch pre-aggregation below is exact under any block layout."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys or not aggs:
        raise EngineValueError("keys and aggs must be non-empty")
    if _GK in keys or _GK in aggs:
        raise EngineValueError(f"column name {_GK!r} is reserved")
    if n_buckets < 1:
        raise EngineValueError(f"n_buckets must be >= 1, got {n_buckets}")
    bad = {h for h in aggs.values() if h not in ("sum", "min", "max")}
    if bad:
        raise EngineValueError(f"aggs must be sum/min/max, got {sorted(bad)}")
    values = list(aggs)

    def partial(batch: pd.DataFrame) -> "pa.Table":
        # pre-aggregate inside the batch BEFORE the exchange (the combiner
        # step): exact for associative reductions, shrinks the shuffle to
        # <= |distinct keys in batch| rows; the partial ships as an ARROW
        # block so the sort exchange moves zero-copy payloads, not pickled
        # pandas frames
        out = batch.groupby(keys, sort=False, as_index=False, dropna=False)[
            values
        ].agg(aggs)
        h = _hash_column(out[keys[0]])
        for k in keys[1:]:
            h = splitmix64(h) + _hash_column(out[k])
        out[_GK] = (h % np.uint64(n_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=True, as_index=False, dropna=False)[
            values
        ].agg(aggs)

    mapped = ds.map_batches(partial, batch_format="pandas")
    if pre_coalesce:
        # see grouped_sum: only for dimension-bounded partial streams
        mapped = mapped.repartition(pre_coalesce)
    return mapped.groupby(_GK).map_groups(final_bucket, batch_format="pandas")
