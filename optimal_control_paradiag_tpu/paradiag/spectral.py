"""Spectral-space solver: GMRES in the ParaDiag-diagonalized coordinates.

The float32 wall (see ARCHITECTURE.md): on fine grids the time stencil's
action on smooth modes (``u_i - 2u_{i-1} + u_{i-2}`` ~ dt^2 u_tt) cancels to
~1e-6 of the operand magnitude, so a float32 matvec destroys the smooth-mode
dynamics and preconditioned GMRES stalls around 1e-1 relative -- while
float64 converges in ~5 iterations at every size.

Fix: change coordinates ONCE, solve there. With T = DST(space) o ifft(time),
write A = P + B. In spectral coordinates x_hat = T x:

  A_hat = T A T^{-1} = D + B_hat,

where D is the EXACT per-(mode k, wavenumber j) 2x2 block of the circulant
operator (elementwise multiply -- the stencil cancellation is replaced by the
closed-form eigenvalue Lambda_1 = (1-omega)^2, computed in float64 at setup),
and B = A - P touches only FOUR time slices (u_{N-2}, u_{N-1}, p_0, p_1 --
the Taylor/terminal rows and circulant wrap corrections), with spatially
DIAGONAL coefficients (muM, muK) in the sine basis:

  B row_u[0]   = m (2 u_{N-1} - u_{N-2}) - kappa u_{N-2} + (theta/2) m p_0
  B row_u[1]   = -(m + kappa) u_{N-1}
  B row_p[N-1] = m (2 p_0 - p_1) - kappa p_1 - (theta/2) m u_{N-1}
  B row_p[N-2] = -(m + kappa) p_0
  (m = muM_j, kappa = dt^2/2 muK_j, theta = dt^2/sqrt(gamma))

So one operator application is ~12 elementwise passes plus 4 slice
extractions/injections (thin phase sums) -- no transforms, no cancellation,
float32-stable. D^{-1} (the fulldiag Cramer) is the natural left
preconditioner, also elementwise. The full solve:

  b_hat = T b  ->  GMRES on (D + B_hat) xi = b_hat with M = D^{-1}
  ->  x = real(fft(iDST(xi)))     (transforms run twice per SOLVE, not per
                                   iteration)

Valid for sine-diagonalizable spaces (1D any mass, 2D lumped).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.utils.constants import host_const


def build_spectral_system(op: AllAtOnceOperator):
    """Returns (A_hat, D_inv, to_spectral, from_spectral) for the scaled
    all-at-once system in ParaDiag-diagonalized coordinates."""
    sp = op.space
    if not sp.diagonalizable:
        raise ValueError("spectral solver needs a sine-diagonalizable space")
    if not op.scaled:
        raise ValueError("spectral solver operates on the scaled system")
    rdtype = sp.dtype
    cdtype = jnp.result_type(rdtype, jnp.complex64)
    np_c = np.dtype(np.complex64) if cdtype == jnp.complex64 else np.dtype(np.complex128)
    N_t, n = op.N_t, sp.n
    c = 0.5 * op.dt * op.dt
    theta = op.dt * op.dt / math.sqrt(op.gamma)

    e = circulant_eigs(N_t, op.dt, op.gamma)
    muM, muK = (np.asarray(a, np.float64) for a in sp.spectrum)
    L1 = np.asarray(e.Lambda1)[:, None]
    L2 = np.asarray(e.Lambda2)[:, None]
    a11_h = L1 * muM[None, :] + c * L2 * muK[None, :]  # (N_t, n)
    a22_h = np.conj(a11_h)
    det_h = np.abs(a11_h) ** 2 + (theta * muM[None, :]) ** 2

    a11 = host_const(a11_h, np_c)
    a22 = host_const(a22_h, np_c)
    tm = host_const(theta * muM[None, :], rdtype)  # theta * m_j, (1, n)
    inv_det = host_const(1.0 / det_h, rdtype)
    # (n,) per-wavenumber coefficients for the boundary rows:
    m1 = host_const(muM, rdtype)
    kap1 = host_const(c * muK, rdtype)
    tm1 = host_const(theta * muM, rdtype)
    mk1 = host_const(muM + c * muK, rdtype)

    # Slice-extraction phases: x_i = sum_k xi_k e^{-2 pi i i k / N}
    k = np.arange(N_t)
    phi = lambda i: host_const(np.exp(-2j * np.pi * i * k / N_t), np_c)
    # Injection phases (ifft row): y_k += (1/N) out_i e^{+2 pi i i k / N}
    psi = lambda i: host_const(np.exp(2j * np.pi * i * k / N_t) / N_t, np_c)
    phi_uNm1, phi_uNm2 = phi(N_t - 1), phi(N_t - 2)
    phi_p0, phi_p1 = phi(0), phi(1)
    psi_u0, psi_u1 = psi(0), psi(1)
    psi_pNm1, psi_pNm2 = psi(N_t - 1), psi(N_t - 2)

    def A_hat(xi: jnp.ndarray) -> jnp.ndarray:
        """(D + B_hat) xi on spectral states (2, N_t, n) complex."""
        xu, xp = xi[0], xi[1]
        du = a11 * xu - tm * xp
        dp = tm * xu + a22 * xp

        # Extract the four boundary time slices (each (n,) complex).
        uNm1 = jnp.sum(phi_uNm1[:, None] * xu, axis=0)
        uNm2 = jnp.sum(phi_uNm2[:, None] * xu, axis=0)
        p0 = jnp.sum(phi_p0[:, None] * xp, axis=0)
        p1 = jnp.sum(phi_p1[:, None] * xp, axis=0)

        # B rows (SURVEY 0.2 boundary cases minus the circulant rows).
        out_u0 = m1 * (2.0 * uNm1 - uNm2) - kap1 * uNm2 + 0.5 * tm1 * p0
        out_u1 = -mk1 * uNm1
        out_pN1 = m1 * (2.0 * p0 - p1) - kap1 * p1 - 0.5 * tm1 * uNm1
        out_pN2 = -mk1 * p0

        du = du + psi_u0[:, None] * out_u0[None, :] + psi_u1[:, None] * out_u1[None, :]
        dp = dp + psi_pNm1[:, None] * out_pN1[None, :] + psi_pNm2[:, None] * out_pN2[None, :]
        return jnp.stack([du, dp])

    def D_inv(r: jnp.ndarray) -> jnp.ndarray:
        ru, rp = r[0], r[1]
        yu = (a22 * ru + tm * rp) * inv_det
        yp = (a11 * rp - tm * ru) * inv_det
        return jnp.stack([yu, yp])

    def to_spectral(x: jnp.ndarray) -> jnp.ndarray:
        return sp.dst(jnp.fft.ifft(x.astype(cdtype), axis=1))

    def from_spectral(xi: jnp.ndarray) -> jnp.ndarray:
        return jnp.fft.fft(sp.idst(xi), axis=1).real.astype(rdtype)

    return A_hat, D_inv, to_spectral, from_spectral


def solve_spectral(
    op: AllAtOnceOperator,
    b: jnp.ndarray,
    *,
    restart: int = 40,
    rtol: float = 1e-5,
    maxiter: int = 200,
):
    """Full spectral-space solve; returns (x, GmresResult). Jit-wrap for
    repeated use."""
    from optimal_control_paradiag_tpu.krylov.gmres import gmres

    A_hat, D_inv, to_spectral, from_spectral = build_spectral_system(op)
    b_hat = to_spectral(b)
    res = gmres(A_hat, b_hat, M=D_inv, restart=restart, rtol=rtol, maxiter=maxiter)
    return from_spectral(res.x), res
