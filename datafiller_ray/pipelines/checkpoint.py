"""Resumable, checkpointed rollup run (the ``ray job submit`` entry).

Two phases, each manifest-committed (state/lineage.py):

1. **partials** — the single heavy pass over the token payload: validate +
   bucketize + partial-aggregate, plus a ``bucket = hash(source) % B`` salt
   column, written once as Parquet partitioned by bucket. If the job dies
   later, this pass is never repeated.
2. **buckets** — per bucket b: read only ``bucket=b`` partial rows (cheap,
   column-pruned), run the per-source fill + tier cascade, write tier rows to
   a temp dir, audit (row count + order-independent checksum), atomically
   rename to ``tiers/bucket=b``, append the lineage record. A resumed run
   skips every bucket already in the manifest.

Bucket granularity is the checkpoint unit: B ~ cluster nodes keeps re-done
work on failure to ~1/B of the finalize phase. Source-hash bucketing also
bounds the per-group shuffle fan-in (skew: a mega-source still lands in one
bucket, but its partials are minute-level aggregates — bounded by span, not
by corpus size; SURVEY.md §7 "ordering inside groups at scale").
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pds

import ray.data

from datafiller_ray.config import FillConfig, RetentionConfig
from datafiller_ray.state import lineage
from datafiller_ray.stages.fill import make_fill_group_fn
from datafiller_ray.stages.validate import make_partial_agg_fn


def _cfg_snapshot(cfg: FillConfig) -> dict:
    from dataclasses import asdict

    d = asdict(cfg)
    d["lags"] = list(d["lags"])
    return d


def _add_bucket(n_buckets: int, n_subbuckets: int = 1):
    def fn(batch: pa.Table) -> pa.Table:
        skey = np.asarray(batch["skey"]).view(np.uint64)
        bucket = (skey % np.uint64(n_buckets)).astype(np.int64)
        batch = batch.append_column("bucket", pa.array(bucket, pa.int64()))
        if n_subbuckets > 1:
            sub = (
                (skey // np.uint64(n_buckets)) % np.uint64(n_subbuckets)
            ).astype(np.int64)
            batch = batch.append_column("sub", pa.array(sub, pa.int64()))
        return batch

    return fn


def _blob_payload_hashes(rows) -> np.ndarray:
    """Per-chunk 64-bit blake2b digest of the blob columns, each framed by
    its 8-byte length so a corruption that shifts bytes across the boundary
    of adjacent columns (b'AB'+b'C' vs b'A'+b'BC') changes the digest."""
    import hashlib

    blob_cols = [c for c in rows.columns if c.endswith("_blob")]
    digests = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    b"".join(
                        len(payload).to_bytes(8, "little") + payload
                        for c in blob_cols
                        for payload in (bytes(row[c]),)
                    ),
                    digest_size=8,
                ).digest(),
                "little",
            )
            for _, row in rows.iterrows()
        ),
        dtype=np.uint64,
        count=len(rows),
    )
    return digests.view(np.int64)


def _publish_rows(tier_rows, tmp_dir: str, emit: str, keep_rows=None, part: int = 0):
    """Write a bucket's output rows (tier rows, or Gorilla blob rows when
    emit="blobs") under tmp_dir partitioned by tier; returns (written rows,
    checksum). Blob checksums cover the chunk identity columns plus a
    per-chunk digest of the payload bytes; row checksums cover the value
    columns.

    ``keep_rows`` carries ALREADY-PUBLISHED rows (blob rows keep their
    payload bytes and hashes) to splice in unchanged — the incremental
    path's untouched sources, which are never recomputed or recompressed."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    if emit == "blobs":
        from datafiller_ray.stages.compress import encode_tier_chunks

        out_rows = encode_tier_chunks(tier_rows)
        # checksum must cover the payload bytes, not just chunk identity,
        # so value-level divergence in a resumed blob bucket is caught the
        # way the rows sink catches it
        out_rows = out_rows.assign(payload_hash=_blob_payload_hashes(out_rows))
        checksum_cols = ("source", "start_ts", "end_ts", "n_points", "payload_hash")
    else:
        out_rows = tier_rows
        checksum_cols = ("source", "bucket_ts", "count", "sum")
    if keep_rows is not None and len(keep_rows):
        if emit == "blobs" and "payload_hash" not in keep_rows.columns:
            # blob buckets published before payload hashing existed splice
            # cleanly: the digest is a pure function of the payload bytes
            keep_rows = keep_rows.assign(
                payload_hash=_blob_payload_hashes(keep_rows)
            )
        out_rows = pd.concat(
            [keep_rows[out_rows.columns], out_rows], ignore_index=True
        )
    for tier, sub in out_rows.groupby("tier", sort=True):
        tdir = os.path.join(tmp_dir, f"tier={tier}")
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(sub.drop(columns=["tier"]), preserve_index=False),
            os.path.join(tdir, f"part-{part}.parquet"),
        )
    checksum = lineage.rows_checksum(
        {c: out_rows[c].to_numpy() for c in checksum_cols}
    )
    return out_rows, checksum


def run_checkpointed(
    input_path: str,
    out_dir: str,
    *,
    fill: FillConfig | None = None,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    retention: RetentionConfig | None = None,
    check_tokens: bool = True,
    n_buckets: int = 8,
    n_subbuckets: int = 16,
    emit: str = "rows",
    fail_after_buckets: int | None = None,  # test hook: simulate a crash
) -> dict:
    """Run (or resume) the full pipeline. Returns a summary dict.

    ``emit="blobs"`` Gorilla-encodes each bucket's tier rows into one blob
    row per (source, tier) before publishing — the compressed sink with the
    same bucket-level commit/resume/incremental granularity as the rows
    sink (decode with ``stages.compress.decode_tier_chunk``)."""
    cfg = fill if fill is not None else FillConfig()
    os.makedirs(out_dir, exist_ok=True)
    partials_dir = os.path.join(out_dir, "partials")
    tiers_dir = os.path.join(out_dir, "tiers")
    os.makedirs(tiers_dir, exist_ok=True)

    done_partials = lineage.completed(out_dir, "partials")
    skipped = {"partials": bool(done_partials), "buckets": []}

    if not done_partials:
        tmp = partials_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        cols = (
            ["doc_id", "tokens", "n_tok", "source"]
            if check_tokens
            else ["doc_id", "n_tok", "source"]
        )
        ds = ray.data.read_parquet(input_path, columns=cols)
        partials = ds.map_batches(
            make_partial_agg_fn(check_tokens=check_tokens),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).map_batches(
            _add_bucket(n_buckets, n_subbuckets), batch_format="pyarrow"
        )
        part_cols = ["bucket", "sub"] if n_subbuckets > 1 else ["bucket"]
        partials.write_parquet(tmp, partition_cols=part_cols)
        # audit before publish
        audit = pds.dataset(tmp, partitioning="hive").to_table(
            columns=["source", "bucket_ts", "count", "sum"]
        )
        checksum = lineage.rows_checksum(
            {c: audit[c].to_numpy(zero_copy_only=False) for c in audit.column_names}
        )
        shutil.rmtree(partials_dir, ignore_errors=True)
        os.replace(tmp, partials_dir)
        frags = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(str(input_path))
            for f in fs
        ) if os.path.isdir(str(input_path)) else [str(input_path)]
        lineage.append_record(
            out_dir,
            lineage.LineageRecord(
                kind="partials",
                partition_id=-1,
                row_count=audit.num_rows,
                checksum=checksum,
                output_path=partials_dir,
                input_fragments=frags,
                extra={
                    "n_buckets": n_buckets,
                    "n_subbuckets": n_subbuckets,
                    "check_tokens": check_tokens,
                    "fill": _cfg_snapshot(cfg),
                    "tiers": list(tiers),
                    "emit": emit,
                },
            ),
        )

    done_buckets = lineage.completed(out_dir, "bucket")
    fill_fn = make_fill_group_fn(cfg, tiers=tiers, retention=retention)
    todo = [b for b in range(n_buckets) if b not in done_buckets]
    skipped["buckets"] = sorted(b for b in range(n_buckets) if b in done_buckets)
    if fail_after_buckets is not None:
        # test hook: simulate preemption after completing a prefix
        todo, deferred = todo[:fail_after_buckets], todo[fail_after_buckets:]
    else:
        deferred = []

    def finalize_bucket(batch: "pd.DataFrame") -> "pd.DataFrame":
        """One task per bucket: read its partials, fill, write-audit-publish.

        The atomic rename IS the bucket's commit from the task's point of
        view; the driver appends the lineage record afterwards. A bucket
        renamed but not yet recorded is simply redone on resume —
        idempotent, since the rename replaces the directory wholesale."""
        import pandas as pd

        import time

        rows = []
        for b in batch["item"]:
            b = int(b)
            t0 = time.perf_counter()
            bucket_path = os.path.join(partials_dir, f"bucket={b}")
            out_bucket = os.path.join(tiers_dir, f"bucket={b}")
            tmp = f"{out_bucket}.tmp-{os.getpid()}"
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(bucket_path):
                os.makedirs(tmp, exist_ok=True)
                shutil.rmtree(out_bucket, ignore_errors=True)
                os.replace(tmp, out_bucket)
                rows.append(
                    (b, 0, f"{0:016x}", out_bucket, "",
                     round(time.perf_counter() - t0, 3))
                )
                continue
            # stream sub-partitions sequentially: peak task memory is one
            # sub (1/n_subbuckets of the bucket), not the whole bucket; the
            # order-independent checksum is a mod-2^64 sum so per-sub
            # checksums merge exactly. Layouts without sub dirs (older
            # runs being resumed) fall back to one whole-bucket chunk.
            import glob as _glob

            sub_dirs = sorted(
                _glob.glob(os.path.join(bucket_path, "sub=*"))
            ) or [bucket_path]
            os.makedirs(tmp, exist_ok=True)
            total_rows = 0
            sub_checksums = []
            for si, sd in enumerate(sub_dirs):
                df = pds.dataset(sd).to_table().to_pandas()
                parts = [fill_fn(sub) for _, sub in df.groupby("skey", sort=True)]
                tier_rows = pd.concat(parts, ignore_index=True)
                out_rows, cs = _publish_rows(tier_rows, tmp, emit, part=si)
                total_rows += len(out_rows)
                sub_checksums.append(cs)
            checksum = lineage.merge_checksums(sub_checksums)
            shutil.rmtree(out_bucket, ignore_errors=True)
            os.replace(tmp, out_bucket)
            rows.append(
                (b, total_rows, checksum, out_bucket, bucket_path,
                 round(time.perf_counter() - t0, 3))
            )
        return pd.DataFrame(
            rows,
            columns=["bucket", "row_count", "checksum", "output", "input", "wall_sec"],
        )

    n_done = 0
    if todo:
        results = (
            ray.data.from_items(todo)
            .map_batches(finalize_bucket, batch_size=1, batch_format="pandas")
            .to_pandas()
        )
        for r in results.sort_values("bucket").itertuples():
            lineage.append_record(
                out_dir,
                lineage.LineageRecord(
                    kind="bucket",
                    partition_id=int(r.bucket),
                    row_count=int(r.row_count),
                    checksum=r.checksum,
                    output_path=r.output,
                    input_fragments=[r.input] if r.input else [],
                    extra={"wall_sec": float(r.wall_sec)},
                ),
            )
            n_done += 1
    if deferred:
        raise RuntimeError(
            f"injected failure before buckets {deferred} (test hook)"
        )
    return {
        "out_dir": out_dir,
        "skipped_partials": skipped["partials"],
        "skipped_buckets": skipped["buckets"],
        "completed_buckets": n_done,
        "manifest": [r.__dict__ for r in lineage.read_manifest(out_dir)],
    }


def _fold_partial_inputs(inputs) -> "pd.DataFrame":
    """Load per-bucket partial rows from ``[(dir, seq), ...]`` and apply the
    upsert/tombstone reset: for each (source, minute) key the LATEST op>=1
    row's seq wins — strictly earlier rows (base, prior adds, prior
    replaces) are dropped; tombstone rows carry no data themselves, leaving
    the minute a gap. Shared by the incremental refresh and the update-log
    compaction so both fold identically."""
    import pandas as pd

    tables = []
    for d, seq in inputs:
        t = pds.dataset(d).to_table()
        if "op" not in t.column_names:  # base + pre-upsert updates
            t = t.append_column(
                "op", pa.array(np.zeros(t.num_rows, np.int8), pa.int8())
            )
        tables.append(
            t.append_column(
                "seq", pa.array(np.full(t.num_rows, seq, np.int64), pa.int64())
            )
        )
    df = pa.concat_tables(tables).to_pandas()
    if (df["op"] != 0).any():
        resets = (
            df.loc[df["op"] >= 1]
            .groupby(["source", "bucket_ts"], sort=False)["seq"]
            .max()
            .rename("_reset_seq")
            .reset_index()
        )
        df = df.merge(resets, on=["source", "bucket_ts"], how="left")
        keep = df["_reset_seq"].isna() | (df["seq"] >= df["_reset_seq"])
        df = df.loc[keep & (df["op"] != 2)].drop(columns=["_reset_seq"])
    return df.drop(columns=["op", "seq"])


def _resolve_partials(out_dir: str, records) -> "tuple[str, set]":
    """Current base-partials dir + the update ids already folded into it.

    ``partials-compact`` records move the base forward epoch by epoch; the
    manifest is the source of truth, so a compaction crash before its
    record append leaves an orphaned epoch dir that is simply ignored."""
    base = os.path.join(out_dir, "partials")
    folded: set = set()
    for r in records:
        if r.kind == "partials-compact":
            base = r.output_path
            folded.update(r.extra.get("folded", []))
    return base, folded


def run_incremental(
    out_dir: str,
    new_input: "str | None",
    *,
    fill: FillConfig | None = None,
    mode: str = "add",
    deletes=None,
) -> dict:
    """Continuous-aggregate update: fold NEW input into a completed
    checkpointed output, recomputing only the buckets the new data touches.

    Three update shapes, all manifest-committed and idempotent by the
    order-independent checksum of the staged rows (a re-submitted identical
    update is a no-op; a crash between staging and finalize is repaired by
    re-running — the stage is committed before any tier is touched):

    - ``mode="add"`` (default): append-style ingest. Staged partials are
      ADDITIVE (count/sum/min/max combine), so recompute order between
      updates is irrelevant.
    - ``mode="replace"``: upsert. For every (source, minute) key present in
      ``new_input``, the staged partials REPLACE all earlier partials for
      that key (base and prior updates alike). Replace granularity is the
      partial key — the update input must carry the FULL new content of
      every minute it touches. Later additive updates still add on top.
    - ``deletes=<path | Dataset>`` (composable with either mode, or alone
      with ``new_input=None``): a table with ``doc_id``/``source`` columns
      whose (source, minute) keys are TOMBSTONED — all earlier partials for
      those keys are suppressed; the minutes become gaps.

    Replace/tombstone updates are ORDERED by manifest commit sequence (the
    reset applies to strictly earlier rows); additive updates commute, so
    existing add-only outputs are unaffected — their update ids and
    recompute results are bit-identical to the pre-upsert engine.

    Incremental cost is O(new data) for the heavy pass plus O(touched
    buckets) for finalize — untouched buckets are never read.
    """
    import glob

    import pandas as pd
    import pyarrow.compute as pc

    from datafiller_ray.functions.hashing import string_hash64
    from datafiller_ray.stages.validate import extract_epoch_minute

    if mode not in ("add", "replace"):
        raise ValueError(f"mode must be 'add' or 'replace', got {mode!r}")
    if new_input is None and deletes is None:
        raise ValueError("need new_input, deletes, or both")

    records = lineage.read_manifest(out_dir)
    base = [r for r in records if r.kind == "partials"]
    if not base:
        raise ValueError(f"{out_dir} has no completed checkpointed run to update")
    meta = base[0].extra
    n_buckets = int(meta["n_buckets"])
    check_tokens = bool(meta.get("check_tokens", True))
    tiers = tuple(meta.get("tiers", ("1m", "1h", "1d")))
    emit = meta.get("emit", "rows")
    cfg = fill if fill is not None else FillConfig(
        **{**meta.get("fill", {}), "lags": tuple(meta.get("fill", {}).get("lags", (1, 2, 3, -1, -2, -3)))}
    )
    if _cfg_snapshot(cfg) != meta.get("fill", _cfg_snapshot(cfg)):
        raise ValueError(
            "incremental update must use the fill config of the base run "
            f"({meta.get('fill')})"
        )

    partials_dir, folded_ids = _resolve_partials(out_dir, records)
    updates_root = os.path.join(out_dir, "partials_updates")
    tiers_dir = os.path.join(out_dir, "tiers")
    os.makedirs(updates_root, exist_ok=True)

    # stage the new partials (the only pass over the new token payload)
    tmp = os.path.join(updates_root, "staging.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    cols = (
        ["doc_id", "tokens", "n_tok", "source"]
        if check_tokens
        else ["doc_id", "n_tok", "source"]
    )
    op_val = 0 if mode == "add" else 1

    def add_op(t: pa.Table) -> pa.Table:
        return t.append_column(
            "op", pa.array(np.full(t.num_rows, op_val, np.int8), pa.int8())
        )

    def tombstones(t: pa.Table) -> pa.Table:
        minute = extract_epoch_minute(t["doc_id"])
        bucket_ts = pc.multiply(minute, pa.scalar(60, pa.int64()))
        src = np.asarray(t["source"].to_pandas(), dtype="U")
        skey = string_hash64(src).view(np.int64)
        zeros = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table(
            {
                "source": t["source"],
                "skey": pa.array(skey, pa.int64()),
                "bucket_ts": bucket_ts,
                "count": zeros,
                "sum": zeros,
                "min": zeros,
                "max": zeros,
                "op": pa.array(np.full(t.num_rows, 2, np.int8), pa.int8()),
            }
        )

    staged = []
    if new_input is not None:
        ds = ray.data.read_parquet(new_input, columns=cols)
        staged.append(
            ds.map_batches(
                make_partial_agg_fn(check_tokens=check_tokens),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            ).map_batches(add_op, batch_format="pyarrow")
        )
    if deletes is not None:
        dds = (
            deletes
            if isinstance(deletes, ray.data.Dataset)
            else ray.data.read_parquet(deletes, columns=["doc_id", "source"])
        )
        staged.append(dds.map_batches(tombstones, batch_format="pyarrow"))
    partials = staged[0] if len(staged) == 1 else staged[0].union(*staged[1:])
    partials = partials.map_batches(_add_bucket(n_buckets), batch_format="pyarrow")
    partials.write_parquet(tmp, partition_cols=["bucket"])
    audit = pds.dataset(tmp, partitioning="hive").to_table(
        columns=["source", "bucket_ts", "count", "sum", "op"]
    )
    if pc.max(audit["op"]).as_py() == 0:
        # pure-add updates hash exactly as the pre-upsert engine did, so
        # previously committed update ids stay recognized (idempotency)
        audit = audit.drop_columns(["op"])
    update_id = lineage.rows_checksum(
        {c: audit[c].to_numpy(zero_copy_only=False) for c in audit.column_names}
    )
    update_dir = os.path.join(updates_root, update_id)
    committed_updates = {
        r.extra.get("update_id") for r in records if r.kind == "update-partials"
    }
    if update_id in committed_updates:
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(update_dir, ignore_errors=True)
        os.replace(tmp, update_dir)
        lineage.append_record(
            out_dir,
            lineage.LineageRecord(
                kind="update-partials",
                partition_id=-1,
                row_count=audit.num_rows,
                checksum=update_id,
                output_path=update_dir,
                input_fragments=[
                    str(x)
                    for x in (new_input, deletes)
                    if x is not None and isinstance(x, str)
                ],
                extra={"update_id": update_id, "mode": mode},
            ),
        )
        records = lineage.read_manifest(out_dir)

    touched = sorted(
        int(os.path.basename(p).split("=", 1)[1])
        for p in glob.glob(os.path.join(update_dir, "bucket=*"))
    )
    done = {
        r.partition_id
        for r in records
        if r.kind == "bucket-update" and r.extra.get("update_id") == update_id
    }
    # a bucket is stale while ANY committed update lacks its bucket-update
    # record — including prior updates that committed partials but crashed
    # before refreshing. One refresh heals every outstanding update at once
    # (the recompute always reads base + ALL update dirs), so each refreshed
    # bucket gets a record per outstanding update below.
    stale_updates: dict[int, set[str]] = {}
    bucket_done: dict[str, set[int]] = {}
    for r in records:
        if r.kind == "bucket-update":
            bucket_done.setdefault(r.extra.get("update_id"), set()).add(
                int(r.partition_id)
            )
    for r in records:
        if r.kind != "update-partials":
            continue
        uid = r.extra.get("update_id")
        if uid in folded_ids:  # already folded into the compacted base
            continue
        u_touched = {
            int(os.path.basename(p).split("=", 1)[1])
            for p in glob.glob(os.path.join(r.output_path, "bucket=*"))
        }
        for b in u_touched - bucket_done.get(uid, set()):
            stale_updates.setdefault(b, set()).add(uid)
    todo = sorted(stale_updates)

    all_update_dirs = sorted(
        p
        for p in glob.glob(os.path.join(updates_root, "*"))
        if not p.endswith(".tmp") and os.path.basename(p) not in folded_ids
    )
    # replace/tombstone resets apply to strictly-earlier rows, so updates
    # need a total order: manifest commit sequence, then (for staged-but-
    # uncommitted dirs a crashed run left behind) name order after it —
    # deterministic, and identical to what re-submitting them would yield.
    seq_of: dict = {}
    for r in records:
        if r.kind == "update-partials" and r.extra.get("update_id") not in seq_of:
            seq_of[r.extra.get("update_id")] = len(seq_of) + 1
    for uid in sorted(
        {os.path.basename(p) for p in all_update_dirs} - set(seq_of)
    ):
        seq_of[uid] = len(seq_of) + 1
    fill_fn = make_fill_group_fn(cfg, tiers=tiers)

    def refresh_bucket(batch: "pd.DataFrame") -> "pd.DataFrame":
        import time

        rows = []
        for b in batch["item"]:
            b = int(b)
            t0 = time.perf_counter()
            inputs = [
                (d, seq)
                for d, seq in [(os.path.join(partials_dir, f"bucket={b}"), 0)]
                + [
                    (
                        os.path.join(u, f"bucket={b}"),
                        seq_of[os.path.basename(u)],
                    )
                    for u in all_update_dirs
                ]
                if os.path.isdir(d)
            ]
            # sources touched by ANY committed update are recomputed (and,
            # for the blob sink, recompressed); the rest splice through
            # from the published rows untouched. The union — not just THIS
            # update's sources — plus the stale_updates todo extension above
            # makes the result independent of crash history: a bucket left
            # stale by a prior crashed update is re-listed in todo and its
            # sources recomputed from base + all updates here.
            touched_src: set = set()
            for u in all_update_dirs:
                ub = os.path.join(u, f"bucket={b}")
                if os.path.isdir(ub):
                    touched_src.update(
                        pds.dataset(ub).to_table(columns=["source"])["source"]
                        .to_pylist()
                    )
            df = _fold_partial_inputs(inputs)
            out_bucket = os.path.join(tiers_dir, f"bucket={b}")
            keep = None
            if os.path.isdir(out_bucket):
                existing = pds.dataset(
                    out_bucket, partitioning="hive"
                ).to_table().to_pandas()
                keep = existing[~existing["source"].isin(touched_src)]
                if "tier" in keep.columns:
                    keep = keep.astype({"tier": object})
                df = df[df["source"].isin(touched_src)]
            # a missing published bucket (crash between the rmtree and the
            # rename below on a previous run) falls back to recomputing
            # every source from base + updates — never a partial publish
            parts = [fill_fn(sub) for _, sub in df.groupby("skey", sort=True)]
            if parts:
                tier_rows = pd.concat(parts, ignore_index=True)
            elif keep is not None:  # every touched source fully tombstoned
                tier_rows = keep.iloc[0:0].copy()
            else:
                raise ValueError(
                    f"bucket {b}: no partial rows survive the update and no "
                    "published rows exist to splice — nothing to publish"
                )
            tmp_b = f"{out_bucket}.tmp-{os.getpid()}"
            shutil.rmtree(tmp_b, ignore_errors=True)
            os.makedirs(tmp_b, exist_ok=True)
            tier_rows, checksum = _publish_rows(tier_rows, tmp_b, emit, keep_rows=keep)
            shutil.rmtree(out_bucket, ignore_errors=True)
            os.replace(tmp_b, out_bucket)
            rows.append(
                (b, len(tier_rows), checksum, out_bucket,
                 round(time.perf_counter() - t0, 3))
            )
        return pd.DataFrame(
            rows, columns=["bucket", "row_count", "checksum", "output", "wall_sec"]
        )

    refreshed = 0
    if todo:
        results = (
            ray.data.from_items(todo)
            .map_batches(refresh_bucket, batch_size=1, batch_format="pandas")
            .to_pandas()
        )
        for r in results.sort_values("bucket").itertuples():
            # one record per outstanding (update, bucket) pair: the refresh
            # settled them all, and recording each keeps healed buckets out
            # of every future run's todo
            for uid in sorted(stale_updates[int(r.bucket)]):
                lineage.append_record(
                    out_dir,
                    lineage.LineageRecord(
                        kind="bucket-update",
                        partition_id=int(r.bucket),
                        row_count=int(r.row_count),
                        checksum=r.checksum,
                        output_path=r.output,
                        extra={"update_id": uid, "wall_sec": float(r.wall_sec)},
                    ),
                )
            refreshed += 1
    return {
        "update_id": update_id,
        "touched_buckets": touched,
        "refreshed_buckets": refreshed,
        "skipped_buckets": sorted(done),
    }


def compact_updates(out_dir: str) -> dict:
    """Fold every COMMITTED update (add / replace / tombstone) into a new
    base-partials epoch, so the update log stays bounded no matter how many
    increments a long-lived output accumulates (each refresh reads base +
    all live updates; compaction resets that to one dir).

    Protocol (manifest = source of truth, crash-safe at every step):

    1. fold each bucket's base + committed-update partials with the exact
       refresh semantics (:func:`_fold_partial_inputs`) and aggregate to
       one row per (source, minute) — written to ``partials_epoch_N.tmp``;
    2. atomic ``os.replace`` to ``partials_epoch_N``;
    3. append a ``partials-compact`` lineage record naming the folded
       update ids (the commit point — a crash before this leaves an
       orphaned epoch dir that every reader ignores);
    4. GC the folded update dirs (safe any time after step 3; a crash
       between 3 and 4 just leaves dirs that are no longer read).

    Published tiers are untouched: compaction changes the partials
    REPRESENTATION only, pinned by the equality tests. Uncommitted staged
    dirs (a crashed ``run_incremental``) are left alone. Re-submitting a
    folded update remains a no-op (its id stays in the manifest)."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    records = lineage.read_manifest(out_dir)
    if not any(r.kind == "partials" for r in records):
        raise ValueError(f"{out_dir} has no completed checkpointed run")
    base_dir, folded = _resolve_partials(out_dir, records)
    updates_root = os.path.join(out_dir, "partials_updates")

    live: list[str] = []  # committed, not yet folded, in commit order
    seen = set()
    for r in records:
        if r.kind != "update-partials":
            continue
        uid = r.extra.get("update_id")
        if uid in folded or uid in seen:
            continue
        seen.add(uid)
        if os.path.isdir(os.path.join(updates_root, uid)):
            live.append(uid)
    if not live:
        return {"folded_updates": 0, "epoch_dir": base_dir}

    n_epochs = sum(1 for r in records if r.kind == "partials-compact")
    epoch_dir = os.path.join(out_dir, f"partials_epoch_{n_epochs + 1}")
    tmp_root = epoch_dir + ".tmp"
    shutil.rmtree(tmp_root, ignore_errors=True)
    os.makedirs(tmp_root, exist_ok=True)

    buckets = sorted(
        {
            int(os.path.basename(p).split("=", 1)[1])
            for root in [base_dir] + [os.path.join(updates_root, u) for u in live]
            for p in glob.glob(os.path.join(root, "bucket=*"))
        }
    )

    def fold_bucket(batch: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for b in batch["item"]:
            b = int(b)
            inputs = [
                (d, seq)
                for d, seq in [(os.path.join(base_dir, f"bucket={b}"), 0)]
                + [
                    (os.path.join(updates_root, u, f"bucket={b}"), i + 1)
                    for i, u in enumerate(live)
                ]
                if os.path.isdir(d)
            ]
            df = _fold_partial_inputs(inputs)
            agg = (
                df.groupby(["source", "skey", "bucket_ts"], sort=True, as_index=False)
                .agg(
                    count=("count", "sum"),
                    sum=("sum", "sum"),
                    min=("min", "min"),
                    max=("max", "max"),
                )
            )
            agg = agg[agg["count"] > 0]
            bdir = os.path.join(tmp_root, f"bucket={b}")
            os.makedirs(bdir, exist_ok=True)
            table = pa.Table.from_pandas(agg, preserve_index=False).cast(
                pa.schema(
                    [
                        ("source", pa.string()),
                        ("skey", pa.int64()),
                        ("bucket_ts", pa.int64()),
                        ("count", pa.int64()),
                        ("sum", pa.int64()),
                        ("min", pa.int64()),
                        ("max", pa.int64()),
                    ]
                )
            )
            pq.write_table(table, os.path.join(bdir, "part-0.parquet"))
            rows.append((b, len(agg)))
        return pd.DataFrame(rows, columns=["bucket", "row_count"])

    results = (
        ray.data.from_items(buckets)
        .map_batches(fold_bucket, batch_size=1, batch_format="pandas")
        .to_pandas()
    )
    os.replace(tmp_root, epoch_dir)
    lineage.append_record(
        out_dir,
        lineage.LineageRecord(
            kind="partials-compact",
            partition_id=-1,
            row_count=int(results["row_count"].sum()),
            checksum="",
            output_path=epoch_dir,
            extra={"epoch": n_epochs + 1, "folded": sorted(folded | set(live))},
        ),
    )
    for u in live:  # GC after the commit point
        shutil.rmtree(os.path.join(updates_root, u), ignore_errors=True)
    return {
        "folded_updates": len(live),
        "epoch_dir": epoch_dir,
        "buckets": len(buckets),
    }


def read_tier_output(out_dir: str):
    """All committed tier rows as one pyarrow Table (test/inspection helper)."""
    return pds.dataset(
        os.path.join(out_dir, "tiers"), partitioning="hive"
    ).to_table()
