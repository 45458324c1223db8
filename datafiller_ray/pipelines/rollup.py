"""The flagship pipeline: tokenized-sequence Parquet -> tier tables / blobs.

Physical plan (SURVEY.md §3.4):

    read_parquet (columns pruned to the 4 contract columns)
      -> map_batches(validate + bucketize + per-batch partial agg)   [stateless tasks, Arrow zero-copy]
      -> groupby("source")                                            [THE shuffle — partial rows only]
      -> map_groups(combine -> cascade 1m/1h/1d -> densify -> gap-fill [-> Gorilla])
      -> Dataset of tier rows (or blob rows) -> write_parquet

The heavy token payload never crosses the shuffle: the partial-agg stage
reduces each input block to one row per (source, minute) before the exchange.
All per-group work is vectorized NumPy on series that are tiny relative to
the input (one row per source-minute).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import ray.data

from datafiller_ray.config import FillConfig, RetentionConfig
from datafiller_ray.stages.fill import make_fill_group_fn
from datafiller_ray.stages.validate import make_partial_agg_fn

if TYPE_CHECKING:
    from ray.data import Dataset

INPUT_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def read_input(input_path: str | list[str], *, with_tokens: bool = True) -> "Dataset":
    """Read the contract table, pruning columns at the read. When the token
    invariant is not being checked, the (dominant) ``tokens`` column never
    leaves storage."""
    cols = INPUT_COLUMNS if with_tokens else ["doc_id", "n_tok", "source"]
    return ray.data.read_parquet(input_path, columns=cols)


def partial_aggregates(
    ds_or_path: "Dataset | str", *, check_tokens: bool = True
) -> "Dataset":
    """Stage 1: validation + bucketization + per-batch partial rollup."""
    ds = (
        read_input(ds_or_path, with_tokens=check_tokens)
        if isinstance(ds_or_path, (str, list))
        else ds_or_path
    )
    return ds.map_batches(
        make_partial_agg_fn(check_tokens=check_tokens),
        batch_format="pyarrow",
        batch_size=None,  # whole blocks: maximal pre-aggregation before the shuffle
        zero_copy_batch=True,
    )


def rollup_tiers(
    input_path: "str | Dataset",
    *,
    fill: FillConfig | None = None,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    retention: RetentionConfig | None = None,
    check_tokens: bool = True,
    emit: str = "rows",
) -> "Dataset":
    """Full rollup + gap-fill pipeline. Returns a lazy Dataset of tier rows
    (``emit="rows"``) or Gorilla blob rows (``emit="blobs"``)."""
    cfg = fill if fill is not None else FillConfig()
    partials = partial_aggregates(input_path, check_tokens=check_tokens)
    # Coalesce the (tiny) partial rows into ~2 blocks per CPU before the
    # groupby: the sort-based shuffle cost scales with block count, and the
    # input stage produced one block per parquet row group. Scales with the
    # cluster (shuffle partitions ∝ CPUs, SURVEY.md §4).
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    partials = partials.repartition(max(16, 2 * cpus))
    fn = make_fill_group_fn(cfg, tiers=tiers, retention=retention, emit=emit)
    return partials.groupby("source").map_groups(fn, batch_format="pandas")


def write_tiers(tier_ds: "Dataset", out_dir: str) -> None:
    """Partitioned Parquet sink: one directory per tier so a consumer (and a
    resumed run) can address tiers independently."""
    tier_ds.write_parquet(out_dir, partition_cols=["tier"])
