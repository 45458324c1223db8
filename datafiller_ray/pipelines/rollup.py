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

import os
from typing import TYPE_CHECKING

import ray.data

from datafiller_ray.config import FillConfig, RetentionConfig
from datafiller_ray.stages.fill import make_fill_group_fn
from datafiller_ray.stages.validate import make_partial_agg_fn

if TYPE_CHECKING:
    from ray.data import Dataset

INPUT_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def read_input(
    input_path: str | list[str],
    *,
    with_tokens: bool = True,
    format: str = "parquet",
) -> "Dataset":
    """Read the contract table, pruning columns at the read. When the token
    invariant is not being checked, the (dominant) ``tokens`` column never
    leaves storage. ``format="csv"`` supports the 3-column form (CSV cannot
    carry the list<int32> token payload) — the engine analogue of the
    reference's CSV dataset loaders (``datasets/_datasets.py:6-72``)."""
    from datafiller_ray.config import EngineValueError

    cols = INPUT_COLUMNS if with_tokens else ["doc_id", "n_tok", "source"]
    # in-memory containers (the reference accepts ndarray / pandas / polars,
    # multivariate/imputer.py:864-870, 288-342, _polars.py:74-131 — the
    # engine analogues are pandas / polars / pyarrow in-memory tables)
    if not isinstance(input_path, (str, list)):
        obj = input_path
        if hasattr(obj, "to_arrow"):  # polars DataFrame
            obj = obj.to_arrow()
        import pandas as pd
        import pyarrow as pa

        if isinstance(obj, pa.Table):
            missing = [c for c in cols if c not in obj.column_names]
            if missing:
                raise EngineValueError(
                    f"input table missing contract columns: {missing}"
                )
            return ray.data.from_arrow(obj.select(cols))
        if isinstance(obj, pd.DataFrame):
            missing = [c for c in cols if c not in obj.columns]
            if missing:
                raise EngineValueError(
                    f"input table missing contract columns: {missing}"
                )
            return ray.data.from_pandas(obj[cols])
        raise EngineValueError(
            f"unsupported input container {type(obj).__name__}"
        )
    if format == "csv":
        if with_tokens:
            raise EngineValueError(
                "CSV input carries no token payload; use with_tokens=False"
            )
        ds = ray.data.read_csv(input_path)
        return ds.select_columns(cols)
    if format in ("json", "jsonl"):
        # JSONL carries the full contract incl. the token lists; JSON
        # integers arrive as int64, so cast back to the contract dtypes
        ds = ray.data.read_json(input_path)

        def to_contract(t):
            import pyarrow as pa

            arrays = []
            for c in cols:
                a = t[c]
                if c == "tokens":
                    a = a.cast(pa.list_(pa.int32()))
                elif c == "n_tok":
                    a = a.cast(pa.int32())
                arrays.append(a)
            return pa.table(dict(zip(cols, arrays)))

        return ds.map_batches(to_contract, batch_format="pyarrow")
    if format != "parquet":
        raise EngineValueError(f"unsupported input format {format!r}")
    # fail fast with an engine error when contract columns are absent
    # (otherwise the pruned read surfaces a raw KeyError inside read tasks)
    if isinstance(input_path, (str, list)):
        import pyarrow.dataset as pds

        try:
            schema = pds.dataset(input_path).schema
        except Exception:
            schema = None
        if schema is not None:
            missing = [c for c in cols if c not in schema.names]
            if missing:
                raise EngineValueError(
                    f"input table missing contract columns: {missing}"
                )
    return ray.data.read_parquet(input_path, columns=cols)


def partial_aggregates(
    ds_or_path: "Dataset | str", *, check_tokens: bool = True
) -> "Dataset":
    """Stage 1: validation + bucketization + per-batch partial rollup."""
    ds = (
        ds_or_path
        if isinstance(ds_or_path, ray.data.Dataset)
        else read_input(ds_or_path, with_tokens=check_tokens)
    )
    return ds.map_batches(
        make_partial_agg_fn(check_tokens=check_tokens),
        batch_format="pyarrow",
        batch_size=None,  # whole blocks: maximal pre-aggregation before the shuffle
        zero_copy_batch=True,
    )


def coalesce_partials(partials: "Dataset", input_path) -> "Dataset":
    """Conditionally coalesce partial rows to ~4 shuffle partitions per CPU
    before a sort-based groupby. The sort cost scales with block count, but
    too-few partitions make the downstream group stage wave-imbalanced, so
    4x/CPU gives the scheduler room to level load. Repartition is itself an
    all-to-all BARRIER: when the read already lands in the band (one
    pre-aggregated block per input file), inserting it costs ~10% of the
    25M-row wall for nothing (measured: 200 natural blocks, skipping it
    32.9s -> 29.4s), so only repartition when the natural block count is
    far from the target. Shared by the flagship and the window family —
    one tuning point (SURVEY.md §4)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    target = max(32, 4 * cpus)
    nblocks = None
    if isinstance(input_path, str):
        try:
            import pyarrow.dataset as pds

            nblocks = len(pds.dataset(input_path).files)
        except Exception:
            nblocks = None
    if nblocks is None or nblocks < target or nblocks > 4 * target:
        partials = partials.repartition(target)
    return partials


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
    partials = coalesce_partials(partials, input_path)
    fn = make_fill_group_fn(cfg, tiers=tiers, retention=retention, emit=emit)
    # shuffle on the int64 hash key (sorts ~3x faster than the string; the
    # group fn sub-groups by the string for collision safety)
    return partials.groupby("skey").map_groups(fn, batch_format="pandas")


def rollup_tiers_inferred(
    input_path: "str | Dataset",
    *,
    fill: FillConfig | None = None,
    retention: RetentionConfig | None = None,
    check_tokens: bool = True,
) -> "Dataset":
    """Rollup at the input's own cadence: the base step is inferred from the
    observed bucket timestamps (stages/infer_freq.py — the engine analogue
    of the reference's ``_infer_frequency``, ``timeseries/imputer.py:
    188-213``), then a single tier at that step is rolled up and gap-filled.
    A 5-minute stream densifies to a 5-minute grid, not the fixed 1m one."""
    import ray

    from datafiller_ray.config import EngineValueError
    from datafiller_ray.stages.infer_freq import infer_step

    cfg = fill if fill is not None else FillConfig()
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    partials = partial_aggregates(input_path, check_tokens=check_tokens)
    partials = partials.repartition(max(32, 4 * cpus)).materialize()
    step = infer_step(partials, ts_column="bucket_ts", key_column="source")
    if step % 60 != 0:
        raise EngineValueError(
            f"inferred step {step}s is finer than the 60s partial-aggregate "
            "resolution of the contract table"
        )
    fn = make_fill_group_fn(cfg, tiers={f"{step}s": step}, retention=retention)
    return partials.groupby("skey").map_groups(fn, batch_format="pandas")


def rollup_tiers_bucketed(
    input_path: "str | Dataset",
    *,
    fill: FillConfig | None = None,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    retention: RetentionConfig | None = None,
    check_tokens: bool = True,
    emit: str = "rows",
    n_buckets: int = 128,
    n_subbuckets: int = 16,
    scratch_dir: str | None = None,
) -> "Dataset":
    """Explicit hash-partitioned variant of :func:`rollup_tiers` — the
    production path for large runs.

    Ray Data's sort-based groupby executes its map/reduce suboperators with
    poor parallelism on this workload (measured: 25M partial rows spend
    ~20s near-serial in Sort at 32 CPUs). This variant shuffles explicitly
    through storage instead: partial rows are written once, hive-partitioned
    by ``bucket = hash(source) % n_buckets`` (a streaming, fully parallel
    hash exchange), then one task per bucket reads its partition and runs
    the per-source fill — 2.8x faster at 32 CPUs and the same layout the
    resumable checkpoint runner commits. Output rows match
    :func:`rollup_tiers` exactly (pinned by tests).

    On a multi-node cluster the scratch directory must be shared storage
    (object store / DFS); ``n_buckets`` is the shuffle fan-in and the unit
    of retry/resume.
    """
    cfg = fill if fill is not None else FillConfig()
    partials = partial_aggregates(input_path, check_tokens=check_tokens)
    fn = make_fill_group_fn(cfg, tiers=tiers, retention=retention, emit=emit)
    return bucketed_map_groups(
        partials,
        fn,
        n_buckets=n_buckets,
        n_subbuckets=n_subbuckets,
        scratch_dir=scratch_dir,
    )


def bucketed_map_groups(
    partials: "Dataset",
    fn,
    *,
    n_buckets: int = 128,
    n_subbuckets: int = 16,
    scratch_dir: str | None = None,
) -> "Dataset":
    """The engine's explicit hash-partitioned exchange, generalized: apply
    a per-skey-group pandas fn (the same signature as
    ``groupby("skey").map_groups``) through a storage shuffle instead of
    Ray Data's sort-based one. Any pipeline built on the (skey, source,
    bucket_ts, ...) partial-row contract — tier fill, sliding windows,
    profiles, smoothing — reuses this one partitioning key and layout.

    On a multi-node cluster the scratch directory must be shared storage
    (object store / DFS); ``n_buckets`` is the shuffle fan-in and the unit
    of retry/resume.
    """
    import glob
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    scratch = scratch_dir or tempfile.mkdtemp(prefix="datafiller_ray_shuffle_")
    partials_dir = os.path.join(scratch, "partials")
    shutil.rmtree(partials_dir, ignore_errors=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        skey = np.asarray(t["skey"]).view(np.uint64)
        bucket = (skey % np.uint64(n_buckets)).astype(np.int64)
        sub = ((skey // np.uint64(n_buckets)) % np.uint64(n_subbuckets)).astype(
            np.int64
        )
        t = t.append_column("bucket", pa.array(bucket, pa.int64()))
        return t.append_column("sub", pa.array(sub, pa.int64()))

    partials.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        partials_dir, partition_cols=["bucket", "sub"]
    )

    dirs = sorted(glob.glob(os.path.join(partials_dir, "bucket=*")))

    def process_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc
        import pyarrow.dataset as pds

        out = []
        for d in batch["item"]:
            # stream the bucket sub-partition by sub-partition: only ONE
            # sub (1/n_subbuckets of the bucket, columnar Arrow) is resident
            # at a time, and only ONE source's rows are in pandas at a time.
            # Peak task memory is (#sources / (n_buckets*n_subbuckets)) x
            # retention minutes of partial rows — one source's span for
            # typical layouts; a single mega-series beyond worker memory is
            # the salted path's job (choose_fill_path / rollup_tiers_auto).
            for sd in sorted(glob.glob(os.path.join(d, "sub=*"))):
                t = pds.dataset(sd).to_table()
                t = t.take(pc.sort_indices(t, sort_keys=[("skey", "ascending")]))
                skeys = np.asarray(t["skey"])
                bounds = np.flatnonzero(np.diff(skeys)) + 1
                starts = np.concatenate([[0], bounds])
                ends = np.concatenate([bounds, [skeys.size]])
                for s, e in zip(starts, ends):
                    out.append(fn(t.slice(s, e - s).to_pandas()))
        return pd.concat(out, ignore_index=True)

    return ray.data.from_items(dirs).map_batches(
        process_bucket, batch_size=1, batch_format="pandas"
    )


def _distinct_salt_presence(partials, salt_span: int, margin: int) -> set:
    """Distributed distinct (source, salt-chunk) presence. Must EXACTLY
    mirror make_salt_fn's ghost-receiver margin windows: a chunk is present
    when it has a real row OR a row falls inside its ghost margin window.
    Runs as a tiny per-batch pyarrow aggregate; only the distinct chunk list
    (bounded by chunk count, not row count) reaches the driver."""
    import numpy as np
    import pyarrow as pa

    margin_secs = margin * 60

    def distinct_salts(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["bucket_ts"])
        salt = ts // salt_span
        offset = ts - salt * salt_span
        src = np.asarray(t["source"].to_pandas(), dtype=object)
        srcs = [src, src[offset < margin_secs], src[offset >= salt_span - margin_secs]]
        salts = [salt, salt[offset < margin_secs] - 1, salt[offset >= salt_span - margin_secs] + 1]
        proj = pa.table(
            {
                "source": pa.array(np.concatenate(srcs), pa.string()),
                "salt": pa.array(np.concatenate(salts), pa.int64()),
            }
        )
        return proj.group_by(["source", "salt"]).aggregate([])

    distinct = (
        partials.map_batches(distinct_salts, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    return {(r.source, int(r.salt)) for r in distinct.itertuples()}


def _salted_model_1m(
    partials, cfg, tiers, retention, salt_span, margin, bounds, bounds_ref
):
    """Distributed model fill for the 1m tier (stages/distributed_model.py):
    pass 1 emits mergeable stats/Gram partials per (source, salt) chunk, a
    tiny per-source solve yields the models (broadcast via ray.put), pass 2
    predicts per chunk. Coarse tiers keep the per-source path."""
    import pickle

    import numpy as np
    import pandas as pd

    import ray

    from datafiller_ray.functions.hashing import string_hash64
    from datafiller_ray.stages.distributed_model import (
        make_predict_fn,
        make_solve_fn,
        make_stats_grams_fn,
    )
    from datafiller_ray.stages.salted_fill import make_salt_fn

    # marker partial rows so chunks with zero observations (all-gap interior
    # ranges — still predictable from calendar features) form groups;
    # presence comes from the distributed distinct aggregate (no driver-side
    # row loop over the partials)
    present = _distinct_salt_presence(partials, salt_span, margin)
    # vectorized over the (source x salt-chunk) range table — no Python
    # loop over the chunk range (mega-tenant layouts make it millions)
    srcs = np.array(sorted(bounds), dtype=object)
    base = partials
    if srcs.size:
        los = np.array([bounds[s][0] for s in srcs], np.int64)
        his = np.array([bounds[s][1] for s in srcs], np.int64)
        lo_salt = los // salt_span
        n_chunks = his // salt_span - lo_salt + 1
        total = int(n_chunks.sum())
        seg = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        idx = np.repeat(np.arange(srcs.size), n_chunks)
        salts = np.repeat(lo_salt, n_chunks) + (
            np.arange(total) - np.repeat(seg, n_chunks)
        )
        rep_lo, rep_hi = los[idx], his[idx]
        # first global-grid point inside each chunk (chunk_grid_slice
        # algebra, vectorized); empty slices drop out via first > last
        c_lo = salts * salt_span
        first = rep_lo + (
            (np.maximum(c_lo, rep_lo) - rep_lo + 59) // 60
        ) * 60
        last = np.minimum(rep_hi, (salts + 1) * salt_span - 1)
        cand = pd.DataFrame(
            {"source": srcs[idx], "salt": salts, "bucket_ts": first}
        )[first <= last]
        if present:
            pres = pd.DataFrame(
                sorted(present), columns=["source", "salt"]
            ).assign(_p=1)
            cand = cand.merge(pres, on=["source", "salt"], how="left")
            cand = cand[cand["_p"].isna()]
        if len(cand):
            skeys = string_hash64(
                np.asarray(cand["source"].to_numpy(), dtype="U")
            ).view(np.int64)
            markers = pd.DataFrame(
                {
                    "source": cand["source"].to_numpy(),
                    "skey": skeys,
                    "bucket_ts": cand["bucket_ts"].to_numpy(np.int64),
                    "count": 0,
                    "sum": 0,
                    "min": 0,
                    "max": 0,
                }
            )
            base = partials.union(ray.data.from_pandas(markers))

    salted = base.map_batches(
        make_salt_fn(salt_span, margin), batch_format="pyarrow"
    ).materialize()

    pass1 = salted.groupby(["skey", "salt"]).map_groups(
        make_stats_grams_fn(cfg, salt_span, bounds_ref), batch_format="pandas"
    )
    solved = (
        pass1.groupby("skey")
        .map_groups(make_solve_fn(cfg), batch_format="pandas")
        .to_pandas()
    )
    models = {r.source: pickle.loads(bytes(r.payload)) for r in solved.itertuples()}
    models_ref = ray.put(models)

    rows_1m = salted.groupby(["skey", "salt"]).map_groups(
        make_predict_fn(cfg, salt_span, bounds_ref, models_ref, retention),
        batch_format="pandas",
    )
    pieces = [rows_1m] if "1m" in tiers else []
    coarse = tuple(t for t in tiers if t != "1m")
    if coarse:
        fn = make_fill_group_fn(cfg, tiers=coarse, retention=retention)
        pieces.append(partials.groupby("skey").map_groups(fn, batch_format="pandas"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def rollup_tiers_salted(
    input_path: "str | Dataset",
    *,
    fill: FillConfig | None = None,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    retention: RetentionConfig | None = None,
    check_tokens: bool = True,
    salt_span: int = 86400,
    _partials: "Dataset | None" = None,
) -> "Dataset":
    """Skew-resistant variant of :func:`rollup_tiers` (see
    stages/salted_fill.py): the 1m tier is processed per (source,
    time-range-salt) chunk with exact ghost overlap, so the hottest source
    no longer bounds the critical path; coarser tiers (60x/1440x smaller)
    keep the per-source path. Output rows are bit-identical to
    :func:`rollup_tiers` (pinned by tests)."""
    import pandas as pd

    import ray

    from datafiller_ray.stages.salted_fill import (
        make_salt_fn,
        make_salted_fill_fn,
        missing_chunk_rows,
        source_bounds,
        validate_salt_config,
    )

    cfg = fill if fill is not None else FillConfig()
    if cfg.strategy == "model":
        from datafiller_ray.config import EngineValueError
        from datafiller_ray.stages.distributed_model import margin_for

        # optimask runs distributed as the histogram rectangle search at
        # the solve step (stages/distributed_model.py:_histogram_optimask)
        margin = margin_for(cfg)
        if salt_span // 60 <= margin:
            raise EngineValueError(
                "salt_span must exceed the model ghost margin "
                f"({margin} 1m buckets)"
            )
    else:
        margin = validate_salt_config(cfg, salt_span)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8

    if _partials is not None:  # precomputed by rollup_tiers_auto
        partials = _partials
    else:
        partials = partial_aggregates(input_path, check_tokens=check_tokens)
        partials = partials.repartition(max(16, 2 * cpus)).materialize()

    bounds = source_bounds(partials)
    bounds_ref = ray.put(bounds)

    if cfg.strategy == "model":
        return _salted_model_1m(
            partials, cfg, tiers, retention, salt_span, margin, bounds, bounds_ref
        )

    # 1m tier: salted chunks
    salted = partials.map_batches(
        make_salt_fn(salt_span, margin), batch_format="pyarrow"
    )
    fill_1m = make_salted_fill_fn(
        cfg, salt_span, bounds_ref, retention, margin_buckets=margin
    )
    rows_1m = salted.groupby(["skey", "salt"]).map_groups(
        fill_1m, batch_format="pandas"
    )

    # Chunks nobody will emit (no real rows AND no ghosts) are synthesized;
    # presence must exactly mirror make_salt_fn's ghost-receiver margin
    # windows (see _distinct_salt_presence).
    present = _distinct_salt_presence(partials, salt_span, margin)
    synth = missing_chunk_rows(bounds, present, salt_span)
    if retention is not None and len(synth):
        r_lo, r_hi = retention.bounds("1m")
        if r_lo is not None:
            synth = synth[synth["bucket_ts"] >= r_lo]
        if r_hi is not None:
            synth = synth[synth["bucket_ts"] < r_hi]
    pieces = [rows_1m] if "1m" in tiers else []
    if "1m" in tiers and len(synth):
        pieces.append(ray.data.from_pandas(synth))

    coarse_tiers = tuple(t for t in tiers if t != "1m")
    if coarse_tiers:
        fn = make_fill_group_fn(cfg, tiers=coarse_tiers, retention=retention)
        pieces.append(
            partials.groupby("skey").map_groups(fn, batch_format="pandas")
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out


def choose_fill_path(
    bounds: dict, cfg: FillConfig, *, crossover_buckets: int = 2_000_000
) -> str:
    """Pick the fill execution path from the observed per-source spans.

    Measured crossover (stages/distributed_model.py docstring): the salted /
    chunked paths pay two extra small shuffles, so they only win when a
    single source's series is long enough to bound the critical path.
    Returns "salted" when the longest series exceeds ``crossover_buckets``
    AND the config supports chunking (bounded kernels need max_gap), else
    "plain"."""
    if not bounds:
        return "plain"
    max_len = max((hi - lo) // 60 + 1 for lo, hi in bounds.values())
    if max_len <= crossover_buckets:
        return "plain"
    if cfg.strategy == "model":
        return "salted"
    if cfg.strategy in ("locf", "linear", "spline"):
        return "salted" if cfg.max_gap is not None else "plain"
    return "plain"


def rollup_tiers_auto(
    input_path: "str | Dataset",
    *,
    fill: FillConfig | None = None,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    retention: RetentionConfig | None = None,
    check_tokens: bool = True,
    crossover_buckets: int = 2_000_000,
    salt_span: int = 86400 * 30,
) -> "Dataset":
    """Rollup with automatic per-source vs salted-chunk path selection: the
    partials are aggregated once, source spans are measured from them, and
    :func:`choose_fill_path` picks the cheaper execution (mega-series only
    pay the chunked path's extra shuffles when chunk parallelism wins)."""
    import ray

    from datafiller_ray.stages.salted_fill import source_bounds

    cfg = fill if fill is not None else FillConfig()
    partials = partial_aggregates(input_path, check_tokens=check_tokens)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    partials = partials.repartition(max(16, 2 * cpus)).materialize()
    bounds = source_bounds(partials)
    path = choose_fill_path(bounds, cfg, crossover_buckets=crossover_buckets)
    if path == "salted":
        return rollup_tiers_salted(
            input_path, fill=cfg, tiers=tiers, retention=retention,
            check_tokens=check_tokens, salt_span=salt_span, _partials=partials,
        )
    fn = make_fill_group_fn(cfg, tiers=tiers, retention=retention)
    return partials.groupby("skey").map_groups(fn, batch_format="pandas")


def write_tiers(tier_ds: "Dataset", out_dir: str) -> None:
    """Partitioned Parquet sink: one directory per tier so a consumer (and a
    resumed run) can address tiers independently."""
    tier_ds.write_parquet(out_dir, partition_cols=["tier"])
