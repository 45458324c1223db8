"""Batched per-pattern Gram solvers (the reference's GPU backend shape).

The reference offers an optional torch backend that solves every
missingness pattern of a column in one batched pass instead of a Python
loop (``/root/reference/src/datafiller/multivariate/_gpu.py:47-207``,
``device=`` opt-in on the imputer). This module is the engine analogue,
designed for OUR Gram representation: the distributed/model paths already
accumulate one Gram of ``Z = [X(zero-filled), y, 1]`` per distinct
trainable-row missingness pattern (``functions/multivariate.py`` use_gram
branch), so the batched solve consumes those group Grams directly —

1. the covering matrix ``C[p, g] = group g complete on pattern p's
   features`` comes from one bitmask comparison,
2. all pattern Grams in one ``einsum('pg,gij->pij', C, grams)``,
3. all centered-ridge coefficients in one batched ``linalg.solve`` where
   excluded columns are identity-padded (their coefficients solve to
   exactly zero, the reference's padding trick).

Two implementations share the algebra:

- ``NumpyGramBackend`` — always available, tested here; also useful on CPU
  when a column has many patterns (one LAPACK batch instead of P solves).
- ``TorchGramBackend(device)`` — the GPU path; torch is imported lazily so
  this module loads without it and a clear install hint is raised only when
  a device is actually requested. In a Ray pipeline the backend lives in an
  actor-pool stage: pass the callable class to ``map_batches(...,
  num_gpus=1, concurrency=N)`` so each actor binds one GPU and the matrix
  uploads once per actor, not per batch.

Like the reference's GPU path, batched solves are NOT bit-identical to the
sequential per-pattern solves (different LAPACK pivoting on the padded
systems); parity is numerical (pinned at 1e-8 by test), which is why the
backend is an opt-in, never the default.
"""

from __future__ import annotations

import numpy as np

_TORCH_INSTALL_HINT = (
    "the torch Gram backend requires PyTorch, an optional dependency absent "
    "from this environment; install a build matching your CUDA setup or use "
    "backend=None / NumpyGramBackend() for the CPU path"
)


def resolve_gram_backend(device: "str | None"):
    """None -> None (sequential per-pattern solves, the default);
    "numpy" -> NumpyGramBackend; anything else (e.g. "cuda", "cuda:1",
    "cpu") -> TorchGramBackend on that torch device."""
    if device is None:
        return None
    if device == "numpy":
        return NumpyGramBackend()
    return TorchGramBackend(device)


class NumpyGramBackend:
    """Batched centered-ridge solve over per-group Grams (see module doc)."""

    def solve_patterns(
        self,
        grams: np.ndarray,  # (G, K, K) Grams of Z=[X, y, 1], K = k + 2
        group_masks: np.ndarray,  # (G,) uint64 feature bitmasks
        group_counts: np.ndarray,  # (G,) rows per group
        patterns: np.ndarray,  # (P, k) bool — predict-row patterns
        alpha: float,
        min_samples_train: int,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Returns (coef (P, k), intercept (P,), n_train (P,), valid (P,)).
        Excluded features carry exactly-zero coefficients."""
        G, K = grams.shape[0], grams.shape[1]
        k = K - 2
        P = patterns.shape[0]
        bitpos = np.uint64(1) << np.arange(k, dtype=np.uint64)
        pmask = (patterns @ bitpos).astype(np.uint64)  # (P,)
        covering = (group_masks[None, :] & pmask[:, None]) == pmask[:, None]
        n_train = covering @ group_counts.astype(np.int64)
        valid = (n_train >= min_samples_train) & patterns.any(axis=1)

        Gp = np.einsum("pg,gij->pij", covering.astype(np.float64), grams)
        Sxx = Gp[:, :k, :k]
        sxy = Gp[:, :k, k]
        sx = Gp[:, :k, k + 1]
        sy = Gp[:, k, k + 1]
        n = np.maximum(n_train, 1).astype(np.float64)

        # centered normal equations, batched; identity-pad excluded columns
        A = Sxx - sx[:, :, None] * sx[:, None, :] / n[:, None, None]
        b = sxy - sx * (sy / n)[:, None]
        pair = patterns[:, :, None] & patterns[:, None, :]
        A = np.where(pair, A, 0.0)
        diag = np.where(patterns, alpha, 1.0)
        A[:, np.arange(k), np.arange(k)] += diag
        b = np.where(patterns, b, 0.0)
        # guard degenerate systems so one singular pattern cannot poison the
        # batch: solve only the valid ones
        coef = np.zeros((P, k))
        if valid.any():
            coef[valid] = np.linalg.solve(A[valid], b[valid])
        intercept = sy / n - (sx / n[:, None] * coef).sum(axis=1)
        return coef, intercept, n_train, valid


class TorchGramBackend:
    """Torch twin of :class:`NumpyGramBackend` (same algebra as tensor ops;
    the numpy implementation is its executable specification and test
    oracle). Use inside an actor-pool stage with ``num_gpus=1`` so the
    device binds once per actor."""

    def __init__(self, device: str) -> None:
        try:  # lazy: importable without torch, like the reference module
            import torch
        except ImportError as exc:  # pragma: no cover - torch absent here
            raise ImportError(_TORCH_INSTALL_HINT) from exc
        self._torch = torch  # pragma: no cover - torch absent here
        self.device = torch.device(device)  # pragma: no cover
        if (  # pragma: no cover
            self.device.type == "cuda" and not torch.cuda.is_available()
        ):
            raise RuntimeError(
                f"device={device!r} requested but no CUDA runtime is "
                "available; use backend=None or device='numpy'"
            )

    def solve_patterns(  # pragma: no cover - torch absent in this container
        self, grams, group_masks, group_counts, patterns, alpha, min_samples_train
    ):
        torch = self._torch
        dev = self.device
        grams_t = torch.as_tensor(grams, dtype=torch.float64, device=dev)
        k = grams_t.shape[1] - 2
        bitpos = np.uint64(1) << np.arange(k, dtype=np.uint64)
        pmask = (patterns @ bitpos).astype(np.uint64)
        covering = torch.as_tensor(
            (group_masks[None, :] & pmask[:, None]) == pmask[:, None],
            dtype=torch.float64, device=dev,
        )
        counts = torch.as_tensor(
            group_counts.astype(np.int64), dtype=torch.float64, device=dev
        )
        pat = torch.as_tensor(patterns, dtype=torch.bool, device=dev)
        n_train = covering @ counts
        valid = (n_train >= float(min_samples_train)) & pat.any(dim=1)

        Gp = torch.einsum("pg,gij->pij", covering, grams_t)
        Sxx, sxy = Gp[:, :k, :k], Gp[:, :k, k]
        sx, sy = Gp[:, :k, k + 1], Gp[:, k, k + 1]
        n = n_train.clamp(min=1.0)
        A = Sxx - sx.unsqueeze(2) * sx.unsqueeze(1) / n.view(-1, 1, 1)
        b = sxy - sx * (sy / n).unsqueeze(1)
        pair = pat.unsqueeze(2) & pat.unsqueeze(1)
        A = torch.where(pair, A, torch.zeros((), dtype=A.dtype, device=dev))
        A = A + torch.diag_embed(torch.where(pat, alpha, 1.0).to(A.dtype))
        b = torch.where(pat, b, torch.zeros((), dtype=b.dtype, device=dev))
        coef = torch.zeros_like(b)
        if bool(valid.any()):
            coef[valid] = torch.linalg.solve(A[valid], b[valid])
        intercept = sy / n - (sx / n.unsqueeze(1) * coef).sum(dim=1)
        return (
            coef.cpu().numpy(),
            intercept.cpu().numpy(),
            n_train.to(torch.int64).cpu().numpy(),
            valid.cpu().numpy(),
        )
