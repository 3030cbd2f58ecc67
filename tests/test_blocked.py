"""Blocked dense linalg (ops/blocked.py): the large-triangle-safe kernels
under the SDC eigensolver. XLA's large-triangle factorization lowerings
materialize O(p^3) bytes of temporaries (measured 127 GB at p=20449);
these re-express them as matmuls + small-triangle device ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimal_control_paradiag_tpu.ops.blocked import (
    blocked_cholesky,
    cholqr,
    cholqr2,
    tri_solve_lower,
)


def _spd(p, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((p, p)).astype(np.float32)
    return (A @ A.T) / p + np.eye(p, dtype=np.float32)


@pytest.mark.parametrize("p,b", [(200, 64), (500, 96), (96, 96), (50, 96)])
def test_blocked_cholesky_matches(p, b):
    A = _spd(p)
    L = np.asarray(blocked_cholesky(jnp.asarray(A), block=b), np.float64)
    assert np.abs(np.triu(L, 1)).max() == 0.0
    assert np.linalg.norm(L @ L.T - A) / np.linalg.norm(A) <= 1e-6


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("p,b", [(300, 64), (100, 128)])
def test_tri_solve_lower(p, b, transpose):
    A = _spd(p, seed=2)
    L = np.linalg.cholesky(A.astype(np.float64)).astype(np.float32)
    rng = np.random.default_rng(3)
    B = rng.standard_normal((p, 17)).astype(np.float32)
    X = np.asarray(
        tri_solve_lower(jnp.asarray(L), jnp.asarray(B), block=b, transpose=transpose),
        np.float64,
    )
    M = L.T if transpose else L
    assert np.linalg.norm(M.astype(np.float64) @ X - B) / np.linalg.norm(B) <= 1e-5


def test_cholqr2_orthonormal_and_range():
    rng = np.random.default_rng(0)
    Y = rng.standard_normal((400, 150)).astype(np.float32)
    Q = np.asarray(cholqr2(jnp.asarray(Y), block=96), np.float64)
    assert np.linalg.norm(Q.T @ Q - np.eye(150)) <= 5e-5
    # range preserved
    assert np.linalg.norm(Q @ (Q.T @ Y) - Y) / np.linalg.norm(Y) <= 1e-5


def test_cholqr2_survives_high_condition():
    """The shifted-CholeskyQR3 regime: kappa(Y) well past plain CholQR2's
    f32 boundary (u^-1/2 ~ 2.9e3) -- the r5 wall run's range-finder
    matrices sat exactly there (kappa 3548/6282 measured)."""
    rng = np.random.default_rng(1)
    p, k = 400, 120
    U, _ = np.linalg.qr(rng.standard_normal((p, k)))
    V, _ = np.linalg.qr(rng.standard_normal((k, k)))
    sv = np.logspace(0, -4.3, k)  # kappa = 2e4
    Y = (U * sv[None, :]) @ V.T
    Yf = jnp.asarray(Y.astype(np.float32))
    Q = np.asarray(cholqr2(Yf, block=96), np.float64)
    assert np.linalg.norm(Q.T @ Q - np.eye(k)) <= 1e-4
    # range error bounded by kappa * eps-ish, far below failure scale
    assert np.linalg.norm(Q @ (Q.T @ Y) - Y) / np.linalg.norm(Y) <= 1e-2
    # a single (unshifted) pass at this kappa is NOT orthonormal -- the
    # regression guard that cholqr2 stays the 3-pass shifted form
    Q1 = np.asarray(cholqr(Yf, block=96), np.float64)
    assert np.linalg.norm(Q1.T @ Q1 - np.eye(k)) > 1e-2
