"""Batched Gram backend (the reference's ``device=`` opt-in surface).

Reference shape: ``multivariate/_gpu.py:47-207`` solves every missingness
pattern of a column in one batched pass; ``imputer.py:186,932-941`` exposes
it as ``device=`` with under-threshold patterns falling back to the CPU
branch. The engine twin is ``stages/gram_backend.py``; the NumPy
implementation is the tested executable spec, the torch one its lazy GPU
twin (torch absent in this container)."""

import numpy as np
import pandas as pd
import pytest

from datafiller_ray.functions.multivariate import impute_matrix
from datafiller_ray.functions.ridge import fit_ridge_from_gram
from datafiller_ray.stages.gram_backend import (
    NumpyGramBackend,
    TorchGramBackend,
    resolve_gram_backend,
)


def _random_groups(rng, n_groups, k, n_rows_each=30):
    """Build per-pattern group Grams of Z=[X(zero-filled), y, 1] the way the
    impute_matrix use_gram branch does."""
    K = k + 2
    grams = np.empty((n_groups, K, K))
    masks = np.empty(n_groups, dtype=np.uint64)
    counts = np.empty(n_groups, dtype=np.int64)
    bitpos = np.uint64(1) << np.arange(k, dtype=np.uint64)
    for g in range(n_groups):
        obs = rng.random(k) < 0.7
        if not obs.any():
            obs[rng.integers(k)] = True
        X = np.where(obs, rng.normal(size=(n_rows_each, k)), 0.0)
        y = rng.normal(size=n_rows_each)
        Z = np.column_stack([X, y, np.ones(n_rows_each)])
        grams[g] = Z.T @ Z
        masks[g] = (obs @ bitpos).astype(np.uint64)
        counts[g] = n_rows_each
    return grams, masks, counts


def test_batched_solve_matches_sequential_gram_solve():
    rng = np.random.default_rng(7)
    k, alpha = 6, 1e-2
    grams, masks, counts = _random_groups(rng, n_groups=9, k=k)
    patterns = (rng.random((12, k)) < 0.6).astype(bool)
    patterns[0] = True  # full pattern
    patterns[1] = False  # empty pattern -> invalid by definition

    be = NumpyGramBackend()
    coef, icpt, n_train, valid = be.solve_patterns(
        grams, masks, counts, patterns, alpha, min_samples_train=20
    )

    bitpos = np.uint64(1) << np.arange(k, dtype=np.uint64)
    for p in range(patterns.shape[0]):
        pat = patterns[p]
        pm = (pat @ bitpos).astype(np.uint64)
        covering = (masks & pm) == pm
        nt = int(counts[covering].sum())
        assert n_train[p] == nt
        expect_valid = nt >= 20 and pat.any()
        assert bool(valid[p]) == expect_valid
        # excluded features carry exactly-zero coefficients (the reference's
        # identity-padding trick, _gpu.py)
        assert (coef[p][~pat] == 0.0).all()
        if not expect_valid:
            continue
        G = grams[covering].sum(axis=0)
        sub = np.concatenate([np.flatnonzero(pat), [k, k + 1]])
        c_ref, i_ref = fit_ridge_from_gram(G[np.ix_(sub, sub)], nt, alpha)
        np.testing.assert_allclose(coef[p][pat], c_ref, rtol=0, atol=1e-8)
        assert abs(icpt[p] - i_ref) < 1e-8


def test_impute_matrix_device_numpy_matches_default():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 10))
    x[rng.random(x.shape) < 0.2] = np.nan
    a, fa = impute_matrix(x.copy(), fallback=None)
    b, fb = impute_matrix(x.copy(), device="numpy", fallback=None)
    assert (fa == fb).all()
    np.testing.assert_allclose(
        np.nan_to_num(a, nan=-9e9), np.nan_to_num(b, nan=-9e9), atol=1e-8
    )


def test_under_threshold_patterns_fall_through_identically():
    # min_samples_train high enough that most patterns are invalid in the
    # batch and must route through the optimask/fallback branch, exactly
    # like the sequential path (reference imputer.py:686-688)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(60, 6))
    x[rng.random(x.shape) < 0.35] = np.nan
    a, fa = impute_matrix(x.copy(), min_samples_train=40, fallback="simple")
    b, fb = impute_matrix(
        x.copy(), min_samples_train=40, fallback="simple", device="numpy"
    )
    assert (fa == fb).all()
    np.testing.assert_allclose(a, b, atol=1e-8)


def test_resolve_backend_and_torch_hint():
    assert resolve_gram_backend(None) is None
    assert isinstance(resolve_gram_backend("numpy"), NumpyGramBackend)
    with pytest.raises(ImportError, match="torch"):
        TorchGramBackend("cuda")  # torch absent in this container
    with pytest.raises(ImportError, match="torch"):
        resolve_gram_backend("cuda:0")


def test_filler_surfaces_accept_device():
    from datafiller_ray.frame import MultivariateFiller, TimeSeriesFiller

    rng = np.random.default_rng(5)
    x = rng.normal(size=(200, 5))
    x[rng.random(x.shape) < 0.15] = np.nan
    mf = MultivariateFiller(device="numpy")
    assert mf.get_params()["device"] == "numpy"
    out_b = mf(x.copy())
    out_a = MultivariateFiller()(x.copy())
    np.testing.assert_allclose(
        np.nan_to_num(out_a, nan=-9e9), np.nan_to_num(out_b, nan=-9e9), atol=1e-8
    )

    idx = pd.date_range("2024-01-01", periods=240, freq="1min")
    df = pd.DataFrame(
        {"a": np.sin(np.arange(240) / 7.0), "b": np.cos(np.arange(240) / 5.0)},
        index=idx,
    )
    df.iloc[40:44, 0] = np.nan
    df.iloc[100:103, 1] = np.nan
    f_seq = TimeSeriesFiller(lags=(1, 2, -1))(df.copy())
    f_bat = TimeSeriesFiller(lags=(1, 2, -1), device="numpy")(df.copy())
    pd.testing.assert_frame_equal(f_seq, f_bat, atol=1e-8, rtol=0)
    ts = TimeSeriesFiller(device="numpy")
    assert ts.get_params()["device"] == "numpy"
    ts2 = ts.set_params(device=None)
    assert ts2.get_params()["device"] is None


# ---------------------------------------------------------------------------
# mock-torch dry run: execute TorchGramBackend's real code path without torch
# (a numpy-backed stand-in implements exactly the tensor surface the backend
# uses), pinned against the NumpyGramBackend executable spec. Real-GPU
# execution stays env-gated; this covers the translation layer itself.


class _FakeTensor:
    def __init__(self, a):
        self.a = np.asarray(a)

    def _w(self, other):
        return other.a if isinstance(other, _FakeTensor) else other

    # arithmetic / comparison surface used by TorchGramBackend
    def __matmul__(self, other):
        return _FakeTensor(self.a @ self._w(other))

    def __and__(self, other):
        return _FakeTensor(self.a & self._w(other))

    def __add__(self, other):
        return _FakeTensor(self.a + self._w(other))

    def __sub__(self, other):
        return _FakeTensor(self.a - self._w(other))

    def __mul__(self, other):
        return _FakeTensor(self.a * self._w(other))

    def __truediv__(self, other):
        return _FakeTensor(self.a / self._w(other))

    def __ge__(self, other):
        return _FakeTensor(self.a >= self._w(other))

    def __getitem__(self, idx):
        return _FakeTensor(self.a[self._w(idx)])

    def __setitem__(self, idx, val):
        self.a[self._w(idx)] = self._w(val)

    def __bool__(self):
        return bool(self.a)

    def any(self, dim=None):
        return _FakeTensor(self.a.any(axis=dim))

    def clamp(self, min=None):
        return _FakeTensor(np.maximum(self.a, min))

    def unsqueeze(self, dim):
        return _FakeTensor(np.expand_dims(self.a, dim))

    def view(self, *shape):
        return _FakeTensor(self.a.reshape(shape))

    def sum(self, dim=None):
        return _FakeTensor(self.a.sum(axis=dim))

    def to(self, dtype):
        return _FakeTensor(self.a.astype(dtype))

    def cpu(self):
        return self

    def numpy(self):
        return self.a

    @property
    def shape(self):
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype


class _FakeDevice:
    def __init__(self, name):
        self.type = str(name).split(":")[0]


def _fake_torch():
    import types

    t = types.ModuleType("torch")
    t.float64 = np.float64
    t.int64 = np.int64
    t.bool = np.bool_

    def _unwrap(x):
        return x.a if isinstance(x, _FakeTensor) else x

    t.device = _FakeDevice
    t.cuda = types.SimpleNamespace(is_available=lambda: False)
    t.as_tensor = lambda data, dtype=None, device=None: _FakeTensor(
        np.asarray(_unwrap(data), dtype=dtype)
    )
    t.einsum = lambda eq, *ops: _FakeTensor(
        np.einsum(eq, *(_unwrap(o) for o in ops))
    )
    t.where = lambda c, a, b: _FakeTensor(
        np.where(_unwrap(c), _unwrap(a), _unwrap(b))
    )
    t.zeros = lambda shape, dtype=None, device=None: _FakeTensor(
        np.zeros(shape, dtype=dtype)
    )
    t.zeros_like = lambda x: _FakeTensor(np.zeros_like(_unwrap(x)))

    def diag_embed(x):
        a = _unwrap(x)
        out = np.zeros(a.shape + (a.shape[-1],), dtype=a.dtype)
        idx = np.arange(a.shape[-1])
        out[..., idx, idx] = a
        return _FakeTensor(out)

    t.diag_embed = diag_embed
    t.linalg = types.SimpleNamespace(
        solve=lambda A, b: _FakeTensor(
            np.linalg.solve(_unwrap(A), _unwrap(b))
        )
    )
    return t


def test_torch_backend_code_path_matches_numpy_under_mock(monkeypatch):
    import sys

    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    rng = np.random.default_rng(21)
    k, alpha = 5, 1e-2
    grams, masks, counts = _random_groups(rng, n_groups=7, k=k)
    patterns = (rng.random((10, k)) < 0.6).astype(bool)
    patterns[0] = True
    patterns[1] = False

    want = NumpyGramBackend().solve_patterns(
        grams, masks, counts, patterns, alpha, min_samples_train=20
    )
    got = TorchGramBackend("cpu").solve_patterns(
        grams, masks, counts, patterns, alpha, min_samples_train=20
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-8)


def test_torch_backend_cuda_guard_under_mock(monkeypatch):
    import sys

    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    with pytest.raises(RuntimeError, match="no CUDA runtime"):
        TorchGramBackend("cuda:0")
