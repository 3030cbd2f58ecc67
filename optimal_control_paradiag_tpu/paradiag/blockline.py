"""Batched block-line (block-Thomas) direct inner solve for 2D consistent mass.

The MUMPS-parity factorization past ``blockdense``'s memory wall. The reference
factors every per-mode complex-shifted operator with MUMPS at any size
(``Control_Wave_PC.py:480-484``); ``blockdense`` replicates that with dense
per-mode inverses but needs ``N_t * (2 n)^2 = N_t * 4 n1d^4`` stored entries
(N_x <~ 40 at N_t = 64). This module exploits the structured grid instead:

Per Fourier mode k, the coupled 2x2-block operator

    P_k = [[ L1 M + c L2 K,            -theta M ],
           [ theta M,  conj(L1) M + c conj(L2) K ]],   c = dt^2/2,

on the (n1d, n1d) interior grid is **block-tridiagonal over grid lines**: both
the Friedrichs-Keller consistent mass (stencil {C 6; E,W,N,S 1; NE,SW 1} x
h^2/12) and the 5-point stiffness couple a line only to its two neighbors, and
Dirichlet elimination makes every line identical, so the per-line blocks are
mode-dependent but line-independent Toeplitz matrices:

    diag block  A_k = blocks(M_d, K_d),  M_d = (h^2/12)(6 I + C_x), K_d = 4I - C_x
    sub block   B_k = blocks(M_s-, -I),  M_s- = (h^2/12)(I + T^-)   (S + SW)
    super block C_k = blocks(M_s+, -I),  M_s+ = (h^2/12)(I + T^+)   (N + NE)

Block-Thomas factorization stores the line Schur-complement inverses
``G_j = (A - B G_{j-1} C)^{-1}`` -- ``n1d`` dense (2 n1d)^2 matrices per stored
mode, i.e. ``(N_t//2 + 1) * 4 n1d^3`` entries total: the memory wall moves from
N_x ~ 40 to N_x ~ 150 (float64 host) / ~190 (float32 TPU) at N_t = 64, with
exact (direct) inner solves everywhere -- including the indefinite-Helmholtz
resonant modes where batched Krylov inner solves stall, and the Lambda_2 ~ 0
modes (N_t % 4 == 0) where the eig mixing loses digits (the coupled system's
per-symbol matrix is a scalar multiple of a unitary: never near-singular).

**Hermitian half-spectrum**: the circulant eigenvalues satisfy
``Lambda(N_t - k) = conj(Lambda(k))``, so ``P_{N_t-k} = conj(P_k)``; the
spectrum of a real residual satisfies ``rhat_{N_t-k} = conj(rhat_k)``. Only
modes ``0..N_t//2`` are factorized and solved; mirror modes come free by
conjugation -- halving both memory and per-apply flops.

TPU notes: the factors are built once on host in complex128 (the analogue of
MUMPS' symbolic+numeric factorization) and shipped as real/imag pairs; the
apply is two ``lax.scan`` sweeps over lines whose step is a batched-over-modes
real einsum 4-tuple (complex matmuls do not lower on the TPU backend) --
sequential in the line direction, MXU-batched over (modes x 2 n1d).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


def blockline_entries(N_t: int, n1d: int) -> int:
    """Stored complex entries of the half-spectrum block-Thomas factors."""
    return (N_t // 2 + 1) * n1d * (2 * n1d) ** 2


def build_blockline_solver(op) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Factorize P_k for modes 0..N_t//2 and return the jittable half-spectrum
    solver ``solve(rhat) -> w`` on ``(2, N_t, n)`` mode arrays (full spectrum
    in and out; the Hermitian mirror happens inside).

    ``rhat`` must carry Hermitian mode symmetry (``rhat[N_t-k] = conj(rhat[k])``),
    which holds for the time-spectrum of any real residual.
    """
    sp = op.space
    if sp.dim != 2 or not hasattr(sp, "n1d"):
        raise ValueError("blockline is the 2D structured-grid direct solver; "
                         "1D spaces have exact tridiagonal/spectral paths and "
                         "unstructured meshes use blockdense/cocg_jacobi")
    rdtype = sp.dtype
    cdtype = jnp.result_type(rdtype, jnp.complex64)
    m = sp.n1d
    N_t = op.N_t
    hk = N_t // 2 + 1
    c = 0.5 * op.dt * op.dt
    theta = op.dt * op.dt / (op.gamma**0.5)
    e = circulant_eigs(N_t, op.dt, op.gamma)
    L1 = np.asarray(e.Lambda1, np.complex128)[:hk]
    L2 = np.asarray(e.Lambda2, np.complex128)[:hk]

    h = sp.h
    eye = np.eye(m)
    t_dn = np.eye(m, k=-1)  # (T^- v)_i = v_{i-1}
    t_up = np.eye(m, k=+1)  # (T^+ v)_i = v_{i+1}
    cx = t_dn + t_up

    def coupled(Mb: np.ndarray, Kb: np.ndarray) -> np.ndarray:
        """Per-mode 2x2 block matrices (hk, 2m, 2m) from one line-block pair."""
        Z = np.zeros((hk, 2 * m, 2 * m), np.complex128)
        Z[:, :m, :m] = L1[:, None, None] * Mb + c * L2[:, None, None] * Kb
        Z[:, :m, m:] = -theta * Mb
        Z[:, m:, :m] = theta * Mb
        Z[:, m:, m:] = np.conj(L1)[:, None, None] * Mb + c * np.conj(L2)[:, None, None] * Kb
        return Z

    A = coupled((h * h / 12.0) * (6.0 * eye + cx), 4.0 * eye - cx)
    B = coupled((h * h / 12.0) * (eye + t_dn), -eye)
    C = coupled((h * h / 12.0) * (eye + t_up), -eye)

    # Block-Thomas forward recursion: G_0 = A^{-1};
    # G_j = (A - B G_{j-1} C)^{-1} -- batched over modes, sequential in lines.
    # This is the setup-time analogue of MUMPS' factorization (ref :480-484).
    G = np.empty((m, hk, 2 * m, 2 * m), np.complex128)
    G[0] = np.linalg.inv(A)
    for j in range(1, m):
        G[j] = np.linalg.inv(A - B @ G[j - 1] @ C)

    # Ship the large factor tensors as device arrays (compiled-executable
    # parameters) -- embedded numpy constants get constant-folded and carried
    # in the compile RPC (see paradiag/blockband.py, measured on the relay).
    Gr = to_device(G.real, rdtype)
    Gi = to_device(G.imag, rdtype)
    L1d = host_const(L1[:, None], cdtype)
    L2d = host_const(L2[:, None], cdtype)
    L1cd = host_const(np.conj(L1)[:, None], cdtype)
    L2cd = host_const(np.conj(L2)[:, None], cdtype)
    hh12 = h * h / 12.0

    def _shift(v, s):
        """v[..., i-s] zero-padded along the last (within-line) axis."""
        if s > 0:
            return jnp.pad(v[..., :-s], [(0, 0)] * (v.ndim - 1) + [(s, 0)])
        return jnp.pad(v[..., -s:], [(0, 0)] * (v.ndim - 1) + [(0, -s)])

    def _off_apply(y: jnp.ndarray, s: int) -> jnp.ndarray:
        """B y (s=+1) or C y (s=-1) without materializing B/C on device:
        the off-diagonal line blocks act by bidiagonal shifts (M_s = hh12 *
        (I + T)) and the per-mode scalars. y is (hk, 2m) complex."""
        yu, yp = y[:, :m], y[:, m:]
        msu = hh12 * (yu + _shift(yu, s))
        msp = hh12 * (yp + _shift(yp, s))
        # K's off-diagonal line block is -I, entering through c * L2 * K.
        bu = L1d * msu - c * L2d * yu - theta * msp
        bp = theta * msu + L1cd * msp - c * L2cd * yp
        return jnp.concatenate([bu, bp], axis=-1)

    hi = jax.lax.Precision.HIGHEST

    def _gmatvec(gr, gi, v):
        """(gr + i gi) @ v per mode: 4 real MXU einsums."""
        vr, vi = v.real, v.imag
        wr = jnp.einsum("kab,kb->ka", gr, vr, precision=hi) - jnp.einsum(
            "kab,kb->ka", gi, vi, precision=hi
        )
        wi = jnp.einsum("kab,kb->ka", gr, vi, precision=hi) + jnp.einsum(
            "kab,kb->ka", gi, vr, precision=hi
        )
        return jax.lax.complex(wr, wi)

    def solve(rhat: jnp.ndarray) -> jnp.ndarray:
        # (2, N_t, n) -> line vectors (lines, hk, 2m) for the stored modes.
        rh = rhat[:, :hk].reshape(2, hk, m, m)
        r_lines = jnp.concatenate([rh[0], rh[1]], axis=-1)  # (hk, lines, 2m)
        # -> (lines, hk, 2m): scan runs over lines, batched over modes.
        r_lines = jnp.swapaxes(r_lines.astype(jnp.result_type(rhat.dtype, cdtype)), 0, 1)

        def fwd(y_prev, inputs):
            gr, gi, r_j = inputs
            y_j = _gmatvec(gr, gi, r_j - _off_apply(y_prev, +1))
            return y_j, y_j

        zero = jnp.zeros_like(r_lines[0])
        _, ys = jax.lax.scan(fwd, zero, (Gr, Gi, r_lines))

        def bwd(x_next, inputs):
            gr, gi, y_j = inputs
            x_j = y_j - _gmatvec(gr, gi, _off_apply(x_next, -1))
            return x_j, x_j

        _, xs = jax.lax.scan(bwd, zero, (Gr, Gi, ys), reverse=True)

        w = jnp.swapaxes(xs, 0, 1)  # (hk, lines, 2m)
        wu = w[..., :m].reshape(hk, m * m)
        wp = w[..., m:].reshape(hk, m * m)
        w_half = jnp.stack([wu, wp])  # (2, hk, n)
        # Hermitian mirror: modes hk..N_t-1 are conjugates of N_t-k.
        mirror = jnp.conj(jnp.flip(w_half[:, 1 : N_t - hk + 1], axis=1))
        return jnp.concatenate([w_half, mirror], axis=1)

    return solve
