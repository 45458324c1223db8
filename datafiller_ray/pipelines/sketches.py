"""Mergeable sketches over the corpus: per-key HyperLogLog distinct counts.

The exact-distinct shape (collapse to (key, value) partials, one keyed
groupby — ``corpus.global_quantiles``' histogram trick) stops working when
the value domain is unbounded: at 10^12 sequences the distinct doc_id set
IS the data. HyperLogLog is the 100-TB answer: each input block collapses
to one 2^p-byte register array per key present in the block, the shuffle
carries |keys| x |blocks| fixed-size rows, and registers merge by
elementwise max (associative + commutative + idempotent, so block
splits/retries cannot change the result).

Everything is pinned-deterministic so the vendored NumPy oracle
(tests/oracle/fills.py) reproduces the estimate hash-exactly:

- hash: ``functions.hashing.string_hash64`` (FNV-1a over UTF-32 code
  points, NUL-padding skipped, splitmix64 finalizer) — public constants.
- p = 12 (4096 registers, ~1.6% standard error); register index = top p
  bits, rank = leading-zeros-of-remaining-52-bits + 1 computed with exact
  integer shifts (float log2 would mis-rank near power-of-two
  boundaries).
- estimator: alpha_m * m^2 / sum(2^-reg) with the standard linear-counting
  small-range correction (E <= 2.5m and empty registers present);
  ``approx_n = floor(E + 0.5)`` as int64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12
HLL_M = 1 << HLL_P
_REST_BITS = 64 - HLL_P
_REST_MASK = np.uint64((1 << _REST_BITS) - 1)


def bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (6-step binary shift)."""
    v = w.astype(np.uint64, copy=True)
    bl = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= np.uint64(1 << shift)
        bl[big] += shift
        v[big] >>= np.uint64(shift)
    return bl + (v > 0)


def hll_ranks(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: index = top p bits, rank =
    position of the first 1-bit in the remaining 52 (1-based; all-zero
    rest ranks 53)."""
    idx = (h >> np.uint64(_REST_BITS)).astype(np.int64)
    w = h & _REST_MASK
    rank = _REST_BITS - bit_length_u64(w) + 1
    return idx, rank.astype(np.uint8)


def hll_estimate(registers: np.ndarray) -> int:
    """Pinned HLL estimator over one 2^p register array."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / float(np.sum(2.0 ** (-registers.astype(np.float64))))
    zeros = int(np.count_nonzero(registers == 0))
    if raw <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    else:
        est = raw
    return int(np.floor(est + 0.5))


def _registers_per_key(
    keys: np.ndarray, h: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(unique keys, (n_keys, M) uint8 registers) for one batch —
    vectorized: sort rows by (key, register), max-reduceat per run."""
    idx, rank = hll_ranks(h)
    ukeys, inv = np.unique(keys, return_inverse=True)
    combined = inv.astype(np.int64) * HLL_M + idx
    order = np.argsort(combined, kind="stable")
    comb_s = combined[order]
    rank_s = rank[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(comb_s)) + 1])
    slot = comb_s[starts]
    best = np.maximum.reduceat(rank_s, starts)
    regs = np.zeros((ukeys.size, HLL_M), dtype=np.uint8)
    regs[slot // HLL_M, slot % HLL_M] = best
    return ukeys, regs


def _hll_partial_stage(ds, key_col: str, value_col: str):
    """Project + per-batch register partials — the shared front half of
    every HLL pipeline (one 4 KiB blob per (key, block) leaves each task)."""
    from datafiller_ray.functions.hashing import string_hash64

    def partial(t: pa.Table) -> pa.Table:
        keys = np.asarray(t[key_col].to_pandas(), dtype="U")
        vals = np.asarray(t[value_col].to_pandas(), dtype="U")
        if keys.size == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "hll": pa.array([], pa.binary()),
                }
            )
        ukeys, regs = _registers_per_key(keys, string_hash64(vals))
        return pa.table(
            {
                key_col: pa.array(ukeys),
                "hll": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    slim = ds.map_batches(
        lambda t: t.select([key_col, value_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return slim.map_batches(partial, batch_format="pyarrow")


def approx_distinct(
    ds,
    *,
    key_col: str = "source",
    value_col: str = "doc_id",
) -> "object":
    """Per-key approximate distinct count of a string column. One shuffle
    of (key, 4 KiB register blob) rows — |keys| x |blocks| of them, never
    the values."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in g["hll"]]
        )
        merged = stack.max(axis=0)
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "approx_n": np.array([hll_estimate(merged)], dtype=np.int64),
            }
        )

    partials = _hll_partial_stage(ds, key_col, value_col)
    return partials.groupby(key_col).map_groups(merge, batch_format="pandas")


def approx_distinct_global(
    ds,
    *,
    value_col: str = "doc_id",
) -> "object":
    """Whole-dataset approximate distinct count: same per-block register
    partials, merged to a single row. The final combine sees one 4 KiB
    blob per block — a broadcast-sized reduce, never the values."""

    from datafiller_ray.functions.hashing import string_hash64

    def partial(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[value_col].to_pandas(), dtype="U")
        if vals.size == 0:
            return pa.table({"hll": pa.array([], pa.binary())})
        _, regs = _registers_per_key(np.zeros(vals.size, dtype="U1"),
                                     string_hash64(vals))
        return pa.table({"hll": pa.array([regs[0].tobytes()], pa.binary())})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"approx_n": pa.array([], pa.int64())})
        stack = np.stack(
            [np.frombuffer(b.as_py(), dtype=np.uint8) for b in t["hll"]]
        )
        return pa.table(
            {"approx_n": pa.array([hll_estimate(stack.max(axis=0))], pa.int64())}
        )

    slim = ds.map_batches(
        lambda t: t.select([value_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    partials = slim.map_batches(partial, batch_format="pyarrow")
    return partials.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Bloom membership filter — the streaming-ingest dedup primitive


def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions by double hashing: pos_i = (h1 + i*h2) % m.
    h1 = low 32 bits, h2 = high 32 bits forced odd — pinned so the oracle
    reproduces every set bit (and therefore every false positive)."""
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
            np.int64
        )


def build_bloom(
    ds,
    *,
    value_col: str = "doc_id",
    m_bits: int = 1 << 23,
    k: int = 7,
) -> bytes:
    """Build a Bloom filter over a string column, distributed: each block
    sets its bits into a local ``m_bits/8``-byte array, arrays OR-merge
    (associative/commutative/idempotent — blocking cannot change the
    result) down to one small byte string on the driver. Size m for the
    EXPECTED corpus cardinality (~1.2 GB of bits covers 10^9 doc_ids at
    k=7 / 1% fp); the merged filter is an index artifact like the LSH
    index — broadcast once with ``ray.put`` and probed per batch, so
    history membership tests never shuffle history."""
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.functions.hashing import string_hash64

    # the filter round-trips through a byte string (probe side re-derives
    # m_bits = len(bloom)*8), so a non-byte-aligned m_bits would both
    # index past the bit array and disagree with the probe — reject it
    if m_bits < 8 or m_bits % 8 != 0:
        raise EngineValueError(
            f"m_bits must be a positive multiple of 8, got {m_bits}"
        )
    if k < 1:
        raise EngineValueError(f"k must be >= 1, got {k}")

    def partial(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[value_col].to_pandas(), dtype="U")
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        if vals.size:
            pos = _bloom_positions(string_hash64(vals), m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    slim = ds.map_batches(
        lambda t: t.select([value_col]), batch_format="pyarrow", zero_copy_batch=True
    )
    parts = slim.map_batches(partial, batch_format="pyarrow")
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    # the reduce consumes one m/8-byte row per BLOCK (not per row) — a
    # broadcast-sized stream; OR-ing on the driver is the final fan-in
    for batch in parts.iter_batches(batch_format="pyarrow"):
        for b in batch["bloom"]:
            acc |= np.frombuffer(b.as_py(), dtype=np.uint8)
    return acc.tobytes()


def bloom_filter_absent(
    ds,
    bloom: bytes,
    *,
    value_col: str = "doc_id",
    k: int = 7,
) -> "object":
    """Keep only rows whose ``value_col`` is definitely NOT in the filter
    (Bloom has no false negatives, so every surviving row is genuinely
    new; a ~fp fraction of truly-new rows is dropped as the price). The
    filter ships to workers once via ``ray.put``."""
    import ray

    from datafiller_ray.functions.hashing import string_hash64

    m_bits = len(bloom) * 8
    bloom_ref = ray.put(np.frombuffer(bloom, dtype=np.uint8))

    class AbsentFilter:
        def __init__(self) -> None:
            self.bits = ray.get(bloom_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vals = np.asarray(t[value_col].to_pandas(), dtype="U")
            if vals.size == 0:
                return t
            pos = _bloom_positions(string_hash64(vals), m_bits, k)
            hit = (
                self.bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))
            ) != 0
            present = hit.all(axis=1)
            return t.filter(pa.array(~present))

    return ds.map_batches(
        AbsentFilter, batch_format="pyarrow", concurrency=(1, 8)
    )


# ---------------------------------------------------------------------------
# incremental HLL maintenance — continuous distinct-count aggregates


def _shard_registers(ds, key_col: str, value_col: str) -> "dict[str, np.ndarray]":
    """Merged per-key registers of one shard (distributed partials; the
    driver sees one 4 KiB blob per (key, block))."""
    merged: dict[str, np.ndarray] = {}
    for batch in _hll_partial_stage(ds, key_col, value_col).iter_batches(
        batch_format="pyarrow"
    ):
        for k, b in zip(batch[key_col].to_pylist(), batch["hll"]):
            r = np.frombuffer(b.as_py(), dtype=np.uint8)
            prev = merged.get(k)
            merged[k] = r.copy() if prev is None else np.maximum(prev, r)
    return merged


def hll_checkpoint(
    out_dir: str,
    shard_ds,
    *,
    key_col: str = "source",
    value_col: str = "doc_id",
) -> "pd.DataFrame":
    """Fold one arriving shard into a persisted per-key HLL state — the
    continuous-aggregate form of :func:`approx_distinct` (companion to
    ``checkpoint.run_incremental``'s tier folds). Register max-merge is
    associative/commutative/idempotent, so N folds equal the one-shot
    sketch of the union EXACTLY (register-for-register), replays are
    no-ops (shard identity = digest of its merged registers), and a crash
    between write and manifest append just refolds the shard. State is
    one 4 KiB blob per key on shared storage, rewritten atomically; the
    driver-side merge is bounded by |keys|, not rows. Returns the
    post-fold (key, approx_n) counts."""
    import hashlib
    import json
    import os

    hll_dir = os.path.join(out_dir, "hll")
    os.makedirs(hll_dir, exist_ok=True)
    state_path = os.path.join(hll_dir, "registers.parquet")
    manifest_path = os.path.join(hll_dir, "updates.json")

    shard = _shard_registers(shard_ds, key_col, value_col)
    h = hashlib.blake2b(digest_size=16)
    for k in sorted(shard):
        h.update(k.encode())
        h.update(shard[k].tobytes())
    shard_id = h.hexdigest()

    applied = []
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            applied = json.load(f)

    state: dict[str, np.ndarray] = {}
    if os.path.exists(state_path):
        import pyarrow.parquet as pq

        t = pq.read_table(state_path)
        for k, b in zip(t[key_col].to_pylist(), t["hll"].to_pylist()):
            state[k] = np.frombuffer(b, dtype=np.uint8)

    if shard_id not in applied:  # idempotent fold
        for k, r in shard.items():
            prev = state.get(k)
            state[k] = r if prev is None else np.maximum(prev, r)
        keys = sorted(state)
        out = pa.table(
            {
                key_col: pa.array(keys),
                "hll": pa.array([state[k].tobytes() for k in keys], pa.binary()),
            }
        )
        import pyarrow.parquet as pq

        tmp = f"{state_path}.building-{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, state_path)  # state first, manifest second:
        # a crash between the two refolds the shard (a no-op on registers)
        with open(manifest_path, "w") as f:
            json.dump(applied + [shard_id], f)

    return pd.DataFrame(
        {
            key_col: sorted(state),
            "approx_n": np.array(
                [hll_estimate(state[k]) for k in sorted(state)], dtype=np.int64
            ),
        }
    )


# -- count-min sketch over the token stream ---------------------------------


def cms_row_mixes(depth: int, seed: int) -> "list[int]":
    """Per-row hash mixers ``splitmix64(seed + i)`` — computed once in
    Python and embedded as literals on BOTH oracle sides, like the LSH
    hyperplanes and the sampling thresholds."""
    from datafiller_ray.functions.hashing import splitmix64

    return [
        int(splitmix64(np.array([seed + i], dtype=np.uint64))[0])
        for i in range(depth)
    ]


def cms_heavy_hitters(
    ds,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 2048,
    seed: int = 9,
):
    """Top-k token ids with exact counts AND their count-min estimates.

    The count-min sketch is the frequency complement of the HLL distinct
    sketch: a depth x width int64 grid where row i counts tokens at cell
    ``splitmix64(tok ^ mix_i) % width``. Cells merge by addition, so the
    sketch is a pure partial+final aggregate — each block contributes
    sparse (row, cell, count) rows and ONE keyed groupby sums them; the
    token stream itself never shuffles. Estimates upper-bound true counts
    (``cms_cnt >= exact_cnt`` always; equality when no collision).

    The exact side rides the same tagged-union pass (kind 0 = exact token
    partials, kind 1 = sketch cells), so the input is read ONCE. Driver
    assembly is bounded by |vocab| + depth*width rows — here the token
    domain is the model vocab (bounded); for unbounded domains, replace
    the exact side with per-block candidate top-k and keep the sketch.

    Returns a pandas frame (tok, exact_cnt, cms_cnt) in
    (exact_cnt desc, tok asc) rank order.
    """
    from datafiller_ray.config import EngineValueError
    from datafiller_ray.functions.hashing import splitmix64

    if k < 1 or depth < 1 or width < 2:
        raise EngineValueError(
            f"invalid cms shape: k={k} depth={depth} width={width}"
        )
    mixes = cms_row_mixes(depth, seed)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        arr = t["tokens"].combine_chunks()
        flat = np.asarray(pc.list_flatten(arr))
        if flat.size == 0:
            empty = pa.array([], pa.int64())
            return pa.table(
                {"kind": empty, "key1": empty, "key2": empty, "cnt": empty}
            )
        uniq, counts = np.unique(flat, return_counts=True)
        uniq = uniq.astype(np.int64)
        counts = counts.astype(np.int64)
        kinds = [np.zeros(uniq.size, np.int64)]
        k1 = [uniq]
        k2 = [np.zeros(uniq.size, np.int64)]
        cs = [counts]
        for i, mix in enumerate(mixes):
            cell = (
                splitmix64(uniq.astype(np.uint64) ^ np.uint64(mix))
                % np.uint64(width)
            ).astype(np.int64)
            acc = np.zeros(width, np.int64)
            np.add.at(acc, cell, counts)
            nz = np.flatnonzero(acc)
            kinds.append(np.full(nz.size, 1, np.int64))
            k1.append(np.full(nz.size, i, np.int64))
            k2.append(nz.astype(np.int64))
            cs.append(acc[nz])
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds)),
                "key1": pa.array(np.concatenate(k1)),
                "key2": pa.array(np.concatenate(k2)),
                "cnt": pa.array(np.concatenate(cs)),
            }
        )

    from datafiller_ray.stages.exchange import grouped_sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    rows = grouped_sum(partials, ["kind", "key1", "key2"], "cnt").to_pandas()
    rows = rows[["kind", "key1", "key2", "cnt"]]

    exact = rows[rows["kind"] == 0]
    toks = exact["key1"].to_numpy(np.int64)
    cnts = exact["cnt"].to_numpy(np.int64)
    order = np.lexsort((toks, -cnts))[:k]
    top_toks, top_cnts = toks[order], cnts[order]

    sketch = np.zeros((depth, width), np.int64)
    sk = rows[rows["kind"] == 1]
    sketch[sk["key1"].to_numpy(np.int64), sk["key2"].to_numpy(np.int64)] = (
        sk["cnt"].to_numpy(np.int64)
    )
    est = np.full(top_toks.size, np.iinfo(np.int64).max, np.int64)
    for i, mix in enumerate(mixes):
        cell = (
            splitmix64(top_toks.astype(np.uint64) ^ np.uint64(mix))
            % np.uint64(width)
        ).astype(np.int64)
        est = np.minimum(est, sketch[i, cell])
    return pd.DataFrame(
        {"tok": top_toks, "exact_cnt": top_cnts, "cms_cnt": est}
    )
