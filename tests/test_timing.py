"""Timing canaries (reference pattern: /root/reference/tests/test_timing.py
— print-only, no asserts; a human scans these in CI output for regressions)."""

import time

import numpy as np


def _series(n, miss=0.15, seed=0):
    rng = np.random.default_rng(seed)
    t = (np.arange(n) * 60 + 1704067200).astype(np.int64)
    y = 100 + 50 * np.sin(2 * np.pi * (t % 86400) / 86400) + rng.normal(size=n) * 5
    y[rng.random(n) < miss] = np.nan
    return y, t


def test_timing_kernels(capsys):
    from datafiller_ray.functions.features import fill_model
    from datafiller_ray.functions.gapfill import fill_linear, fill_locf, fill_spline

    y, t = _series(200_000)
    for name, fn in [
        ("locf", lambda: fill_locf(y, 60)),
        ("linear", lambda: fill_linear(y, 60)),
        ("spline", lambda: fill_spline(y, 60)),
        ("model(12 lags)", lambda: fill_model(
            y, t, lags=(1, 2, 3, 4, 5, 6, -1, -2, -3, -4, -5, -6)
        )),
    ]:
        t0 = time.perf_counter()
        fn()
        with capsys.disabled():
            print(f"[timing] {name} on 200k buckets: {time.perf_counter()-t0:.2f}s")


def test_timing_gorilla(capsys):
    from datafiller_ray.functions import gorilla

    ts = np.arange(0, 200_000 * 60, 60, dtype=np.int64)
    v = np.random.default_rng(1).normal(size=200_000)
    t0 = time.perf_counter()
    blob_ts = gorilla.encode_timestamps(ts)
    blob_v = gorilla.encode_floats(v)
    enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    gorilla.decode_timestamps(blob_ts)
    gorilla.decode_floats(blob_v)
    dec = time.perf_counter() - t0
    with capsys.disabled():
        print(
            f"[timing] gorilla 200k pts: encode {enc:.2f}s decode {dec:.2f}s, "
            f"ts {len(blob_ts)*8/200_000:.2f} b/pt, vals {len(blob_v)*8/200_000:.1f} b/pt"
        )


def test_timing_reference_headline_workload(capsys):
    """The reference's OWN headline timing workload
    (reference/tests/test_timing.py:9-109: 30k x 250 correlated panel,
    3 block-missing targets, lags +-1..3, n_nearest_features=35) run on
    TimeSeriesFiller. Print-only canary; the reference's published 0.21 s
    was Numba-JIT on the author's machine and the reference itself cannot
    run in this sandbox (no numba/sklearn), so this is the engine-side
    record, not a same-box comparison. Shrunk to 10k rows to keep the suite
    fast; scale linearly for the 30k number."""
    import pandas as pd

    from datafiller_ray.frame import TimeSeriesFiller

    n_rows, n_series, n_latent = 10_000, 250, 12
    rng = np.random.default_rng(0)
    innov = rng.normal(scale=0.3, size=(n_rows, n_latent)).astype(np.float32)
    latent = np.empty_like(innov)
    latent[0] = innov[0]
    for r in range(1, n_rows):
        latent[r] = 0.93 * latent[r - 1] + innov[r]
    t_ = np.arange(n_rows, dtype=np.float32)
    seasonal = np.column_stack(
        [np.sin(2 * np.pi * t_ / 24), np.cos(2 * np.pi * t_ / 24)]
    ).astype(np.float32)
    factors = np.concatenate([latent, seasonal], axis=1)
    loadings = rng.normal(scale=0.35, size=(factors.shape[1], n_series)).astype(np.float32)
    for col in range(n_series):
        loadings[col % n_latent, col] += 1.5
    data = factors @ loadings + rng.normal(scale=0.08, size=(n_rows, n_series)).astype(np.float32)
    df = pd.DataFrame(
        data,
        index=pd.date_range("2024-01-01", periods=n_rows, freq="15min"),
        columns=[f"s{i:03d}" for i in range(n_series)],
    )
    vals = df.to_numpy(np.float32, copy=True)
    vals[rng.random(vals.shape) < 0.02] = np.nan
    targets = [f"s{i:03d}" for i in (3, 17, 42)]
    block = n_rows // 10
    for i, c in enumerate((3, 17, 42)):
        start = (i + 1) * 2000 % (n_rows - block)
        vals[start : start + block, c] = np.nan
    dfm = pd.DataFrame(vals, index=df.index, columns=df.columns)

    filler = TimeSeriesFiller(lags=(1, 2, 3, -1, -2, -3), min_samples_train=20)
    t0 = time.perf_counter()
    out = filler(dfm, cols_to_impute=targets, n_nearest_features=35)
    dt = time.perf_counter() - t0
    assert not out[targets].isna().any().any()
    with capsys.disabled():
        print(f"\n  TSF headline (10k x 250, 3 targets, nnf=35): {dt:.2f}s")
