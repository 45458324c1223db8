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
