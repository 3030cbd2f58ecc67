"""Batched tridiagonal solvers: Thomas (scan) and parallel cyclic reduction.

The TPU-native replacement for the role MUMPS plays in the reference's inner
solves (``Control_Wave_PC.py:480-484, 512``): in 1D each per-Fourier-mode
operator ``Sigma_k M + dt^2/2 K`` is complex tridiagonal, and all ``2 N_t``
mode systems solve simultaneously as one batch.

Two algorithms, same API, both jittable and batched over leading axes:

- :func:`thomas` -- classic O(n) forward/backward sweep via ``lax.scan``;
  sequential over the space axis but fully vectorized over the batch, so each
  scan step is a (batch,)-wide VPU op. Best when batch >> n.
- :func:`pcr` -- parallel cyclic reduction: ceil(log2 n) elimination rounds,
  each a full (batch, n) elementwise pass built from shift-adds. O(n log n)
  work but O(log n) depth -- the TPU-friendly choice when n is large.

Complex systems are supported directly (elementwise complex arithmetic lowers
fine in compiled programs); matrices enter as the three diagonals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _shift(x: jnp.ndarray, s: int, fill=0.0) -> jnp.ndarray:
    """y[..., i] = x[..., i-s], filled with ``fill`` out of range."""
    if s == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1)
    if s > 0:
        return jnp.pad(x[..., :-s], pad + [(s, 0)], constant_values=fill)
    return jnp.pad(x[..., -s:], pad + [(0, -s)], constant_values=fill)


def thomas(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve tridiag(dl, d, du) x = b over the last axis, batched over the rest.

    ``dl[..., 0]`` and ``du[..., n-1]`` are ignored. No pivoting -- fine for
    the diagonally-dominant complex-shifted FEM systems this serves.
    """
    dl, d, du, b = jnp.broadcast_arrays(dl, d, du, b)
    n = b.shape[-1]
    # Move the space axis to the front for scan; batch stays vectorized.
    dlT = jnp.moveaxis(dl, -1, 0)
    dT = jnp.moveaxis(d, -1, 0)
    duT = jnp.moveaxis(du, -1, 0)
    bT = jnp.moveaxis(b, -1, 0)

    def fwd(carry, row):
        cp_prev, dp_prev = carry
        a_i, b_i, c_i, r_i = row
        denom = b_i - a_i * cp_prev
        cp = c_i / denom
        dp = (r_i - a_i * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(bT[0])
    (_, _), (cps, dps) = lax.scan(fwd, (zeros, zeros), (dlT, dT, duT, bT))

    def bwd(x_next, row):
        cp_i, dp_i = row
        x_i = dp_i - cp_i * x_next
        return x_i, x_i

    _, xsT = lax.scan(bwd, zeros, (cps, dps), reverse=True)
    return jnp.moveaxis(xsT, 0, -1)


def pcr(dl: jnp.ndarray, d: jnp.ndarray, du: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Parallel cyclic reduction over the last axis, batched over the rest.

    ceil(log2 n) rounds; out-of-range rows act as identity equations
    (a = c = 0, b = 1, rhs = 0), which the shift fills implement.
    """
    dl, d, du, b = jnp.broadcast_arrays(dl, d, du, b)
    n = b.shape[-1]
    a = dl.at[..., 0].set(0)
    c = du.at[..., n - 1].set(0)
    diag = d
    rhs = b
    s = 1
    while s < n:
        # Row i-s and i+s coefficients (identity rows out of range).
        bm = _shift(diag, s, fill=1.0)
        bp = _shift(diag, -s, fill=1.0)
        alpha = -a / bm
        beta = -c / bp
        am = _shift(a, s)
        cm = _shift(c, s)
        ap = _shift(a, -s)
        cp_ = _shift(c, -s)
        rm = _shift(rhs, s)
        rp = _shift(rhs, -s)
        diag = diag + alpha * cm + beta * ap
        rhs = rhs + alpha * rm + beta * rp
        a = alpha * am
        c = beta * cp_
        s *= 2
    return rhs / diag


def solve_scalar_shifted(
    sigma: jnp.ndarray,
    m_diag: float,
    m_off: float,
    k_diag: float,
    k_off: float,
    c: float,
    rhs: jnp.ndarray,
    method: str = "pcr",
) -> jnp.ndarray:
    """Solve ``(sigma_k M + c K) w_k = rhs_k`` for Toeplitz tridiagonal M, K.

    ``sigma`` broadcasts over the batch axes of ``rhs`` (e.g. shape (N_t, 1)
    against rhs (N_t, n)); M = tridiag(m_off, m_diag, m_off), likewise K.
    This is the 1D ParaDiag inner solve in its tridiagonal (rather than
    sine-spectral) formulation.
    """
    d = sigma * m_diag + c * k_diag
    off = sigma * m_off + c * k_off
    d = jnp.broadcast_to(d, rhs.shape)
    off = jnp.broadcast_to(off, rhs.shape)
    solver = {"thomas": thomas, "pcr": pcr}[method]
    return solver(off, d, off, rhs)
