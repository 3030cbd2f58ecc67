"""Woodbury direct solve for the 2D CONSISTENT-mass system.

Extends the rank-4 Sherman-Morrison-Woodbury direct solve
(paradiag/spectral.py -- exact for sine-diagonalizable spaces) to the 2D
consistent mass, where no spatial diagonalization exists. The structure is
space-generic: the all-at-once matrix splits as

    A = P + Psi R Phi*,

where P is the block-circulant part (solved EXACTLY by the blockline
block-Thomas factorization, paradiag/blockline.py), ``Phi*`` extracts the 4
time slices (u_{N-1}, u_{N-2}, p_0, p_1), ``R`` maps them to the 4 corrected
boundary rows through M/K applies

    r_u0   = M (2 u_{N-1} - u_{N-2}) - c K u_{N-2} + (theta/2) M p_0
    r_u1   = -(M + c K) u_{N-1}
    r_pN-1 = M (2 p_0 - p_1) - c K p_1 - (theta/2) M u_{N-1}
    r_pN-2 = -(M + c K) p_0,

and ``Psi`` injects them into time rows (u_0, u_1, p_{N-1}, p_{N-2}) --
verified against ``op.matvec`` to 1e-13 in tests. SMW then gives the direct
solve

    A^{-1} b = y - P^{-1} Psi q,   y = P^{-1} b,
    (I + R Phi* P^{-1} Psi) q = R Phi* y,

with the 4n-dimensional CAPACITY system solved by GMRES whose matvec costs
one P^{-1} (blockline) apply, preconditioned by the closed-form TENSOR-mass
capacity inverse ``(I + C_j W_j)^{-1}`` per sine wavenumber (the exact
capacity of the sine-diagonalizable surrogate; `spectral._capacity_CW` with
``spectrum_tensor``). Measured capacity iterations at rtol 1e-10:
17 (N=16), 61 (N=32) -- vs 54 / 85 outer ParaDiag-GMRES iterations at the
looser rtol 1e-8, with the same per-iteration cost (one blockline apply);
at N=64 the gap widens (outer GMRES needs ~257).

The reference's only comparable capability is assembling the full 2 N_t n
matrix and factorizing it with MUMPS (``Control_Wave_PC.py:186``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.krylov.gmres import gmres
from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.spectral import (
    _build_woodbury_half,
    _capacity_CW,
    _spectral_plan,
)
from optimal_control_paradiag_tpu.utils.constants import host_const


def time_corner_maps(op: AllAtOnceOperator):
    """(phi_star, R, psi): the space-generic rank-4-in-time splitting
    ``A = P + Psi R Phi*`` (module docstring)."""
    sp = op.space
    N_t, n = op.N_t, sp.n
    c = 0.5 * op.dt * op.dt
    theta = op.dt * op.dt / np.sqrt(op.gamma)

    def phi_star(x):
        return jnp.stack([x[0, N_t - 1], x[0, N_t - 2], x[1, 0], x[1, 1]])

    def R(z):
        zu1, zu2, zp0, zp1 = z[0], z[1], z[2], z[3]
        M, K = sp.apply_mass, sp.apply_stiffness
        r0 = M(2.0 * zu1 - zu2) - c * K(zu2) + 0.5 * theta * M(zp0)
        r1 = -(M(zu1) + c * K(zu1))
        r2 = M(2.0 * zp0 - zp1) - c * K(zp1) - 0.5 * theta * M(zu1)
        r3 = -(M(zp0) + c * K(zp0))
        return jnp.stack([r0, r1, r2, r3])

    def psi(r):
        x = jnp.zeros((2, N_t, n), r.dtype)
        x = x.at[0, 0].set(r[0]).at[0, 1].set(r[1])
        x = x.at[1, N_t - 1].set(r[2]).at[1, N_t - 2].set(r[3])
        return x

    return phi_star, R, psi


def build_woodbury2d_solver(
    op: AllAtOnceOperator,
    cap_rtol: float = 1e-10,
    cap_maxiter: int = 300,
    pinv_variant: Optional[str] = None,
    refine: int = 0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Jittable direct solver ``b -> x`` for non-sine-diagonalizable spaces
    via SMW over an exact circulant factorization.

    - Structured 2D grids (default ``pinv_variant='blockline'``): capacity
      GMRES preconditioned by the closed-form TENSOR-mass capacity inverse.
    - UNSTRUCTURED meshes (``pinv_variant='blockband'``, auto-picked when
      the space has no ``n1d``): the same space-generic SMW splitting with
      the RCM-banded level-Thomas ``P^{-1}`` (paradiag/blockband.py); no
      sine basis exists, so the capacity GMRES runs unpreconditioned --
      and inherits the boundary-correction outlier spectrum (measured: 150
      capacity iterations at n=961, N_t=64, rtol 1e-10; the capacity and
      circulant-PC outer spectra coincide off 1). Kept as the
      factorization-based cross-check; the PRODUCTION unstructured direct
      path is the generalized-eigenbasis Woodbury (paradiag/eigbasis.py,
      1-2 outer iterations).

    ``cap_rtol``/``cap_maxiter`` control the capacity GMRES; each capacity
    iteration costs one ``P^{-1}`` apply. ``refine``: outer defect-correction
    passes ``x += solve(b - A x)`` -- when the capacity solve stops at
    relative accuracy eps (iteration-capped), each pass multiplies the true
    residual by ~eps, so 1-2 passes recover DIRECT accuracy from a
    partially-converged capacity solve (the unstructured wall-size recipe;
    measured in tests/test_blockband.py)."""
    from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner

    sp = op.space
    if sp.diagonalizable:
        raise ValueError(
            "space is sine-diagonalizable: use the exact rank-4 Woodbury "
            "(paradiag.spectral.build_woodbury_solver)"
        )
    if pinv_variant is None:
        pinv_variant = "blockline" if hasattr(sp, "n1d") else "blockband"

    Pinv = build_preconditioner(op, variant=pinv_variant)
    phi_star, R, psi = time_corner_maps(op)

    cap_pc = None
    if hasattr(sp, "n1d") and hasattr(sp, "spectrum_tensor"):
        # Tensor-mass surrogate capacity inverse, per sine wavenumber (real
        # to float precision -- the Hermitian k-pairing cancels imaginary
        # parts). Structured grids only (needs the sine basis).
        pl = _spectral_plan(op, mass_surrogate=True)
        C, W = _capacity_CW(pl)
        Minv = np.linalg.inv(np.eye(4)[None] + C @ W)
        assert float(np.abs(Minv.imag).max()) < 1e-8 * float(np.abs(Minv.real).max())
        Minv_r = host_const(Minv.real, sp.dtype)

        def cap_pc(q):
            qh = sp.dst(q)
            wh = jnp.einsum("nab,bn->an", Minv_r, qh, precision=jax.lax.Precision.HIGHEST)
            return sp.idst(wh)

    def cap_matvec(q):
        return q + R(phi_star(Pinv(psi(q))))

    def smw(b: jnp.ndarray) -> jnp.ndarray:
        y = Pinv(b)
        res = gmres(
            cap_matvec,
            R(phi_star(y)),
            M=cap_pc,
            restart=cap_maxiter,
            rtol=cap_rtol,
            maxiter=cap_maxiter,
        )
        return y - Pinv(psi(res.x))

    def solve(b: jnp.ndarray) -> jnp.ndarray:
        x = smw(b)
        for _ in range(refine):
            x = x + smw(b - op.matvec(x))
        return x

    return solve


def build_tensor_gmres_solver(
    op: AllAtOnceOperator,
    rtol: float = 1e-10,
    maxiter: int = 60,
    restart: int | None = None,
    with_result: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Mesh-independent solve of the 2D CONSISTENT-mass all-at-once system:
    GMRES on the physical operator preconditioned by the EXACT direct solve
    of the TENSOR-mass surrogate operator.

    The Friedrichs-Keller consistent mass splits as ``M = M_t + E`` where
    ``M_t`` is the sine-diagonal (tensor) part -- spectrum
    ``(h^2/12)(6 + 2 cos a + 2 cos b)``, ``P1Space.spectrum_tensor`` -- and
    the remainder ``E = (h^2/24) D_x (x) D_y`` (``D`` the centered-difference
    matrix) has ZERO sine diagonal. The surrogate operator ``A_t`` (same
    exact time structure, Taylor/terminal corner rows included, stiffness
    unchanged, mass ``M_t``) is sine-diagonalizable, so the rank-4 Woodbury
    identity solves it EXACTLY and fast (one half-spectrum direct apply,
    ``spectral._build_woodbury_half`` over the ``mass_surrogate`` plan).

    Used as a left preconditioner, the iteration operator is
    ``I + A_t^{-1} Delta_E`` where ``Delta_E`` applies ``E`` wherever the
    rows apply ``M``; its symbol ratio ``e_hat / m_hat_t ~
    (cos a cos b) / (3 + cos a + cos b)`` is bounded well below 1 uniformly
    in the mesh AND in the Fourier mode (numerator and denominator carry the
    same ``Lambda``/``theta`` factors), so GMRES converges at an
    N-INDEPENDENT rate -- measured at rtol 1e-10, float64: 7 / 7 / 8
    iterations for N_x = N_t = 16 / 32 / 64, 6 at (N_x=96, N_t=64), 10 at
    (128, 128) (tests/test_woodbury2d.py), vs the SMW capacity path's
    17 / 61 / ~150 growth. Float32 at rtol 1e-5: 2 iterations to the f32
    floor. Per iteration: one consistent-mass matvec + one ms-scale Woodbury
    apply -- no block-Thomas line scans, no blockline memory wall, so this
    is also the SCALABLE 2D consistent path (any size the spectral Woodbury
    handles).

    The reference meets this capability only by assembling the full system
    and factorizing with MUMPS (``Control_Wave_PC.py:186, 480-484``).
    """
    sp = op.space
    if sp.diagonalizable:
        raise ValueError(
            "space is sine-diagonalizable: use the exact rank-4 Woodbury "
            "(paradiag.spectral.build_woodbury_solver)"
        )
    pl = _spectral_plan(op, mass_surrogate=True)
    W_t = _build_woodbury_half(op, pl, refine=0)
    if restart is None:
        restart = maxiter

    def solve(b: jnp.ndarray):
        res = gmres(op.matvec, b, M=W_t, restart=restart, rtol=rtol, maxiter=maxiter)
        return (res.x, res) if with_result else res.x

    return solve
