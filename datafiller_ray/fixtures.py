"""Deterministic fixture generator for the engine's input table.

Produces the ``input_hint`` shape (BASELINE.json):

    doc_id: string        "{source}:{epoch_minute:010d}"
    tokens: list<int32>   deterministic per (source, minute) — see hashing.py
    n_tok:  int32         == len(tokens)
    source: string        the series / partition key

Generation mirrors the reference's mask families (FIXTURES.md F2;
``/root/reference/src/datafiller/datasets/_misc.py:7-63``): MAR minute drops,
contiguous block gaps in a fraction of sources, plus scattered short gaps.
The n_tok signal is base + daily/weekly seasonality + smoothed noise, like
the latent-factor panel in the reference timing fixture
(``/root/reference/tests/test_timing.py:9-51``). Seed fixed at 42; fully
vectorized (no per-row Python loops).
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from datafiller_ray.functions.hashing import (
    expected_tokens_flat,
    row_seed,
    string_hash64,
)

SEED = 42
BASE_EPOCH_MINUTE = 28_401_120  # 2024-01-01T00:00 UTC in epoch minutes
FIXTURE_ROOT = "/tmp/datafiller_ray_fixtures"

#: rows at sf=1.0 (so sf0.1 ≈ 600k rows, matching lineitem's scaling)
ROWS_PER_SF = 6_000_000


def sf_from_dir(sf_dir: str) -> float:
    """Parse the scale factor from a testdata-style dir name ('.../sf0.01')."""
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    if not m:
        raise ValueError(f"cannot parse scale factor from {sf_dir!r}")
    return float(m.group(1))


def fixture_path(sf: float) -> str:
    """Fixture location: a DIRECTORY of part files (the layout a sharded
    100 TB corpus would have) so the Parquet read parallelizes naturally —
    one single file forces Ray into a single read task."""
    return os.path.join(FIXTURE_ROOT, f"sf{sf:g}", "input")


def generate_input_table(
    n_rows: int,
    n_sources: int,
    *,
    seed: int = SEED,
    mar_ratio: float = 0.10,
    block_frac_sources: float = 0.30,
    block_span_frac: float = 0.20,
    with_tokens: bool = True,
    zipf_exponent: float = 1.1,
) -> pa.Table:
    """Build the deterministic input table in memory.

    Source sizes are Zipf-like (exponent 1.1) so a few sources dominate —
    this exercises skew handling. Each source emits at most one row per
    minute over a contiguous span ~30% longer than its row count; gaps come
    from MAR drops (``add_mar`` analogue) and one contiguous block drop in
    ``block_frac_sources`` of sources (``add_contiguous_missing`` analogue).
    """
    rng = np.random.default_rng(seed)
    names = np.array([f"src_{i:04d}" for i in range(n_sources)])

    w = 1.0 / np.arange(1, n_sources + 1) ** zipf_exponent
    w /= w.sum()
    rows_per_source = np.maximum(4, np.round(n_rows * w)).astype(np.int64)

    srcs: list[np.ndarray] = []
    minutes: list[np.ndarray] = []
    ntoks: list[np.ndarray] = []
    block_sources = rng.random(n_sources) < block_frac_sources
    start_offsets = rng.integers(0, 1440, size=n_sources)

    for i in range(n_sources):
        target_rows = int(rows_per_source[i])
        span = max(int(np.ceil(target_rows * 1.3)), target_rows + 2)
        start = BASE_EPOCH_MINUTE + int(start_offsets[i])
        grid = np.arange(span, dtype=np.int64)
        keep = rng.random(span) >= mar_ratio  # MAR drop
        if block_sources[i] and span > 20:
            b_len = max(2, int(span * block_span_frac))
            b_start = int(rng.integers(0, span - b_len + 1))
            keep[b_start : b_start + b_len] = False
        # keep endpoints observed so the span is stable across mask draws
        keep[0] = keep[-1] = True
        obs = grid[keep][:target_rows]
        m = start + obs

        # n_tok signal: base + daily/weekly seasonality + smoothed noise
        abs_min = m.astype(np.float64)
        hour = np.mod(abs_min, 1440) / 60.0
        dow = np.mod(abs_min // 1440 + 3, 7)
        base = 80.0 + 12.0 * (i % 17)
        season = 40.0 * np.sin(2 * np.pi * hour / 24.0) + 15.0 * np.sin(
            2 * np.pi * dow / 7.0
        )
        noise = rng.standard_normal(obs.size + 4)
        smooth = np.convolve(noise, np.ones(5) / 5.0, mode="valid") * 25.0
        sig = np.clip(np.round(base + season + smooth), 1, 2048).astype(np.int32)

        srcs.append(np.full(obs.size, i, dtype=np.int64))
        minutes.append(m)
        ntoks.append(sig)

    src_idx = np.concatenate(srcs)
    minute = np.concatenate(minutes)
    n_tok = np.concatenate(ntoks)

    source = names[src_idx]
    doc_id = np.char.add(np.char.add(source, ":"), np.char.zfill(minute.astype("U10"), 10))

    cols: dict[str, pa.Array] = {}
    cols["doc_id"] = pa.array(doc_id, type=pa.string())
    if with_tokens:
        seeds = row_seed(string_hash64(names)[src_idx], minute)
        offsets, values = expected_tokens_flat(seeds, n_tok)
        cols["tokens"] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
        )
    cols["n_tok"] = pa.array(n_tok, type=pa.int32())
    cols["source"] = pa.array(source, type=pa.string())
    return pa.table(cols)


def ensure_fixture(sf_or_dir: float | str, *, force: bool = False) -> str:
    """Idempotently materialize the fixture parquet for a scale factor (or a
    testdata dir whose name encodes one). Atomic write (tmp + rename) so
    concurrent callers are safe. Returns the parquet path."""
    sf = sf_from_dir(sf_or_dir) if isinstance(sf_or_dir, str) else float(sf_or_dir)
    path = fixture_path(sf)
    if os.path.exists(path) and not force:
        return path
    n_rows = max(2_000, int(round(ROWS_PER_SF * sf)))
    n_sources = max(8, int(round(200 * (sf / 0.1) ** 0.5)))
    table = generate_input_table(n_rows, n_sources)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        rows_per_file = 16 * 1024
        n_files = max(1, (table.num_rows + rows_per_file - 1) // rows_per_file)
        for i in range(n_files):
            part = table.slice(i * rows_per_file, rows_per_file)
            pq.write_table(
                part, os.path.join(tmp, f"part-{i:05d}.parquet"),
                row_group_size=rows_per_file,
            )
        os.replace(tmp, path)  # atomic publish; concurrent callers race safely
    except OSError:
        if os.path.isdir(path):  # another process published first
            shutil.rmtree(tmp, ignore_errors=True)
            return path
        raise
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def ensure_scaling_fixture(
    *, n_rows: int = 25_000_000, n_sources: int = 2048, force: bool = False
) -> str:
    """Fixture for the N-vs-4N scaling benchmark: many moderate sources with
    mild skew (zipf 0.3 → max/mean ~4x) so no single source bounds the
    critical path, sized so the fill stage carries hundreds of core-seconds
    of compute. Token payload omitted — the scaling job measures the
    rollup/fill/cascade engine; token-validation throughput is benchmarked
    (and bandwidth-bound on a single box) in the plain bench."""
    path = os.path.join(FIXTURE_ROOT, "scaling", "input")
    if os.path.isdir(path) and not force:
        return path
    table = generate_input_table(
        n_rows, n_sources, with_tokens=False, zipf_exponent=0.3, mar_ratio=0.12
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        rows_per_file = 64 * 1024
        n_files = max(1, (table.num_rows + rows_per_file - 1) // rows_per_file)
        for i in range(n_files):
            part = table.slice(i * rows_per_file, rows_per_file)
            pq.write_table(
                part, os.path.join(tmp, f"part-{i:05d}.parquet"),
                row_group_size=rows_per_file,
            )
        os.replace(tmp, path)
    except OSError:
        if os.path.isdir(path):
            shutil.rmtree(tmp, ignore_errors=True)
            return path
        raise
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def tiny_edge_case_table(*, with_tokens: bool = True) -> pa.Table:
    """Handcrafted edge-case sources for unit tests (FIXTURES.md F2):
    single-row source, interior all-gap day, zero-gap source, short scattered
    gaps, missing first/last buckets relative to neighbors."""
    rows: list[tuple[str, int, int]] = []

    def add(source: str, minute_offsets: list[int], ntok: list[int]) -> None:
        for off, nt in zip(minute_offsets, ntok):
            rows.append((source, BASE_EPOCH_MINUTE + off, nt))

    add("edge_single", [10], [100])
    add("edge_nogap", list(range(0, 30)), [50 + i for i in range(30)])
    offsets = [0, 1, 2, 5, 6, 7, 8, 12, 13, 20]  # gaps of len 2, 3, 6
    add("edge_shortgaps", offsets, [10 * (i + 1) for i in range(len(offsets))])
    # all-gap interior day between two observed days (minutes 0..9, then skip
    # 1440.., resume at 2880..)
    add("edge_daygap", list(range(10)) + list(range(2880, 2890)), [7] * 20)

    source = np.array([r[0] for r in rows])
    minute = np.array([r[1] for r in rows], dtype=np.int64)
    n_tok = np.array([r[2] for r in rows], dtype=np.int32)
    doc_id = np.char.add(np.char.add(source, ":"), np.char.zfill(minute.astype("U10"), 10))
    cols: dict[str, pa.Array] = {"doc_id": pa.array(doc_id, type=pa.string())}
    if with_tokens:
        seeds = row_seed(string_hash64(source), minute)
        offs, values = expected_tokens_flat(seeds, n_tok)
        cols["tokens"] = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), pa.array(values, type=pa.int32())
        )
    cols["n_tok"] = pa.array(n_tok, type=pa.int32())
    cols["source"] = pa.array(source, type=pa.string())
    return pa.table(cols)
