"""Per-mode inner solvers for the ParaDiag preconditioner.

The reference delegates all inner solves to one block-diagonal MUMPS LU
(``Control_Wave_PC.py:480-484``). Here each spatial structure gets its
TPU-native solver, all batched over the ``N_t`` Fourier modes:

- **dst** (default in :mod:`paradiag.pc`): exact sine-spectral inverse; needs
  both M and K sine-diagonalizable (1D, or 2D lumped).
- **tridiag** (1D): batched complex tridiagonal Thomas / parallel-cyclic-
  reduction solves on the assembled diagonals -- the "sparse direct" route,
  exact for either mass; exercises :mod:`ops.tridiag`.
- **cocg** (2D consistent mass): preconditioned Conjugate Orthogonal CG --
  the Krylov method for complex *symmetric* systems (A = Sigma M + c K with
  M, K real symmetric: complex symmetric, not Hermitian), batched over modes
  with per-mode scalars, preconditioned by the exact lumped-mass sine-spectral
  inverse (spectrally equivalent to the consistent operator, so a handful of
  iterations reaches 1e-10).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.fem.space import P1Space
from optimal_control_paradiag_tpu.krylov.cocg import cocg
from optimal_control_paradiag_tpu.ops.tridiag import solve_scalar_shifted
from optimal_control_paradiag_tpu.utils.constants import host_const


def make_dst_inner_solver(space: P1Space, dt: float) -> Callable:
    """Exact sine-spectral solve of ``(sigma M + dt^2/2 K) w = r``."""
    muM, muK = space.spectrum
    if muM is None:
        raise ValueError("space is not sine-diagonalizable; use cocg")
    c = 0.5 * dt * dt
    muM = host_const(np.asarray(muM)[None, :], space.dtype)
    muK = host_const(np.asarray(muK)[None, :], space.dtype)

    def solve(sigma, rhs):
        return space.idst(space.dst(rhs) / (sigma * muM + c * muK))

    return solve


def make_tridiag_inner_solver(space: P1Space, dt: float, method: str = "pcr") -> Callable:
    """1D batched tridiagonal solve on assembled diagonals (Thomas or PCR)."""
    if space.dim != 1:
        raise ValueError("tridiag inner solver is 1D-only")
    h = space.h
    c = 0.5 * dt * dt
    if space.mass == "lumped":
        m_diag, m_off = h, 0.0
    else:
        m_diag, m_off = 4.0 * h / 6.0, h / 6.0
    k_diag, k_off = 2.0 / h, -1.0 / h

    def solve(sigma, rhs):
        return solve_scalar_shifted(sigma, m_diag, m_off, k_diag, k_off, c, rhs, method)

    return solve


def make_jacobi_cocg_inner_solver(
    space,
    dt: float,
    tol: float = 1e-10,
    maxiter: int = 200,
) -> Callable:
    """Batched Jacobi-preconditioned COCG for ``(sigma M + dt^2/2 K) w = r``
    on a GENERAL (unstructured) space -- any space exposing ``apply_mass``,
    ``apply_stiffness``, ``mass_diag``, ``stiffness_diag``. The unstructured
    counterpart of :func:`make_cocg_inner_solver` (which needs the
    sine-transform spectrum); the exact alternative is
    ``pc_variant='blockdense'``."""
    c = 0.5 * dt * dt
    mdiag = host_const(np.asarray(space.mass_diag(), np.float64)[None, :], space.dtype)
    kdiag = host_const(np.asarray(space.stiffness_diag(), np.float64)[None, :], space.dtype)

    def solve(sigma, rhs):
        def A(w):
            return sigma * space.apply_mass(w) + c * space.apply_stiffness(w)

        x, _ = cocg(
            A,
            rhs,
            M=lambda r: r / (sigma * mdiag + c * kdiag),
            dot_axes=(-1,),
            tol=tol,
            maxiter=maxiter,
        )
        return x

    return solve


def make_cocg_inner_solver(
    space: P1Space,
    dt: float,
    tol: float = 1e-10,
    maxiter: int = 50,
) -> Callable:
    """Batched preconditioned COCG for ``(sigma M + dt^2/2 K) w = r`` with the
    consistent 2D mass matrix; preconditioner = exact tensor-part mass spectral
    inverse (``P1Space.spectrum_tensor``: M minus its zero-sine-diagonal
    ``S_x (x) S_y`` remainder -- much closer to M than the lumped surrogate).
    Unconjugated inner products throughout (complex symmetry).

    Caveat: at modes whose complex shift sits near the negative real axis
    (indefinite-Helmholtz resonance) COCG can stall or break down -- a direct
    inner solve (``pc_variant='blockline'``/``'blockdense'``) is the robust
    route there; this solver is the memory-free best-effort fallback."""
    c = 0.5 * dt * dt
    _, muK = space.spectrum
    muK = host_const(np.asarray(muK)[None, :], space.dtype)
    muMt = host_const(np.asarray(space.spectrum_tensor)[None, :], space.dtype)

    def pinv(sigma, r):
        return space.idst(space.dst(r) / (sigma * muMt + c * muK))

    def make_A(sigma):
        def A(w):
            return sigma * space.apply_mass(w) + c * space.apply_stiffness(w)

        return A

    def solve(sigma, rhs):
        x, _ = cocg(
            make_A(sigma),
            rhs,
            M=lambda r: pinv(sigma, r),
            dot_axes=(-1,),
            tol=tol,
            maxiter=maxiter,
        )
        return x

    return solve
