"""Pallas TPU kernel: fused spectral-space preconditioned operator step.

The hot op of the spectral solver (paradiag/spectral.py) is
``y = D^{-1} (D + B_hat) xi`` -- a dozen elementwise passes plus four
time-slice reductions/injections when expressed in jnp. This kernel fuses the
whole step into ONE pass over the ``(N_t, n)`` state per component: each grid
program loads a ``(N_t, TILE)`` column block into VMEM (all modes of a slab of
wavenumbers -- the slice reductions run over the full time axis, so the time
axis is never tiled), computes

  1. the four boundary-slice phase reductions (sum over modes),
  2. the 2x2 circulant multiply  D xi,
  3. the rank-1 boundary-row injections (psi phases x B-row values),
  4. the 2x2 Cramer preconditioner  D^{-1} (.),

entirely in registers/VMEM, and stores the four real/imag outputs. Complex
arithmetic is split-real throughout (complex does not lower in TPU kernels).

Used by ``SolverConfig(method='spectral', use_pallas=True)``; falls back to
interpret mode off-TPU (tested against the jnp path to float accuracy).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.utils.constants import host_const

TILE = 128


def _kernel(
    xur_ref, xui_ref, xpr_ref, xpi_ref,  # state blocks (N_t, TILE)
    a11r_ref, a11i_ref, invdet_ref,      # per-(k,j) constants (N_t, TILE)
    colc_ref,                            # per-j constants (8, TILE)
    phases_ref,                          # (N_t, 16): phi/psi re+im pairs
    yur_ref, yui_ref, ypr_ref, ypi_ref,  # outputs (N_t, TILE)
):
    xur, xui = xur_ref[:], xui_ref[:]
    xpr, xpi = xpr_ref[:], xpi_ref[:]
    a11r, a11i = a11r_ref[:], a11i_ref[:]
    invdet = invdet_ref[:]
    m1 = colc_ref[0, :]
    kap1 = colc_ref[1, :]
    tm1 = colc_ref[2, :]
    mk1 = colc_ref[3, :]
    ph = phases_ref[:]

    def cplx_slice_sum(pr, pi, vr, vi):
        """sum_k (pr + i pi)_k (vr + i vi)_k -> ((TILE,), (TILE,))."""
        re = jnp.sum(pr * vr - pi * vi, axis=0)
        im = jnp.sum(pr * vi + pi * vr, axis=0)
        return re, im

    # Boundary slices (phases columns: 0,1=uNm1 2,3=uNm2 4,5=p0 6,7=p1).
    uN1r, uN1i = cplx_slice_sum(ph[:, 0:1], ph[:, 1:2], xur, xui)
    uN2r, uN2i = cplx_slice_sum(ph[:, 2:3], ph[:, 3:4], xur, xui)
    p0r, p0i = cplx_slice_sum(ph[:, 4:5], ph[:, 5:6], xpr, xpi)
    p1r, p1i = cplx_slice_sum(ph[:, 6:7], ph[:, 7:8], xpr, xpi)

    # B rows (real coefficients x complex slices).
    bu0r = m1 * (2.0 * uN1r - uN2r) - kap1 * uN2r + 0.5 * tm1 * p0r
    bu0i = m1 * (2.0 * uN1i - uN2i) - kap1 * uN2i + 0.5 * tm1 * p0i
    bu1r = -mk1 * uN1r
    bu1i = -mk1 * uN1i
    bp1r = m1 * (2.0 * p0r - p1r) - kap1 * p1r - 0.5 * tm1 * uN1r
    bp1i = m1 * (2.0 * p0i - p1i) - kap1 * p1i - 0.5 * tm1 * uN1i
    bp2r = -mk1 * p0r
    bp2i = -mk1 * p0i

    # D xi  (a22 = conj(a11); coupling tm1 is real, broadcast over modes).
    dur = a11r * xur - a11i * xui - tm1 * xpr
    dui = a11r * xui + a11i * xur - tm1 * xpi
    dpr = tm1 * xur + a11r * xpr + a11i * xpi
    dpi = tm1 * xui + a11r * xpi - a11i * xpr

    # Injections (psi phases columns: 8,9=row0 10,11=row1 12,13=rowN-1 14,15=rowN-2).
    dur = dur + ph[:, 8:9] * bu0r - ph[:, 9:10] * bu0i + ph[:, 10:11] * bu1r - ph[:, 11:12] * bu1i
    dui = dui + ph[:, 8:9] * bu0i + ph[:, 9:10] * bu0r + ph[:, 10:11] * bu1i + ph[:, 11:12] * bu1r
    dpr = dpr + ph[:, 12:13] * bp1r - ph[:, 13:14] * bp1i + ph[:, 14:15] * bp2r - ph[:, 15:16] * bp2i
    dpi = dpi + ph[:, 12:13] * bp1i + ph[:, 13:14] * bp1r + ph[:, 14:15] * bp2i + ph[:, 15:16] * bp2r

    # D^{-1}: yu = (conj(a11) du + tm dp) invdet ; yp = (a11 dp - tm du) invdet
    yur_ref[:] = (a11r * dur + a11i * dui + tm1 * dpr) * invdet
    yui_ref[:] = (a11r * dui - a11i * dur + tm1 * dpi) * invdet
    ypr_ref[:] = (a11r * dpr - a11i * dpi - tm1 * dur) * invdet
    ypi_ref[:] = (a11r * dpi + a11i * dpr - tm1 * dui) * invdet


def build_pallas_spectral_step(op: AllAtOnceOperator, interpret: bool = False):
    """Fused ``xi -> D^{-1}(D + B_hat) xi`` on complex spectral states."""
    sp = op.space
    if not sp.diagonalizable or not op.scaled:
        raise ValueError("pallas spectral step needs the scaled, diagonalizable system")
    N_t, n = op.N_t, sp.n
    rdtype = jnp.float32 if sp.dtype == jnp.float32 else jnp.float64
    c = 0.5 * op.dt * op.dt
    theta = op.dt * op.dt / math.sqrt(op.gamma)
    e = circulant_eigs(N_t, op.dt, op.gamma)
    muM, muK = (np.asarray(a, np.float64) for a in sp.spectrum)
    a11_h = (
        np.asarray(e.Lambda1)[:, None] * muM[None, :]
        + c * np.asarray(e.Lambda2)[:, None] * muK[None, :]
    )
    det_h = np.abs(a11_h) ** 2 + (theta * muM[None, :]) ** 2

    n_pad = -(-n // TILE) * TILE

    def padded(a2d):
        out = np.zeros((a2d.shape[0], n_pad), a2d.dtype)
        out[:, :n] = a2d
        return out

    a11r = host_const(padded(a11_h.real), rdtype)
    a11i = host_const(padded(a11_h.imag), rdtype)
    invdet = host_const(padded(np.where(det_h > 0, 1.0 / det_h, 0.0)), rdtype)
    colc = np.zeros((8, n_pad))
    colc[0, :n] = muM
    colc[1, :n] = c * muK
    colc[2, :n] = theta * muM
    colc[3, :n] = muM + c * muK
    colc = host_const(colc, rdtype)

    k = np.arange(N_t)
    phases = np.zeros((N_t, 16))
    for col, (i, sign, scale) in enumerate(
        [
            (N_t - 1, -1, 1.0),  # phi_uNm1
            (N_t - 2, -1, 1.0),  # phi_uNm2
            (0, -1, 1.0),        # phi_p0
            (1, -1, 1.0),        # phi_p1
            (0, 1, 1.0 / N_t),   # psi_u0
            (1, 1, 1.0 / N_t),   # psi_u1
            (N_t - 1, 1, 1.0 / N_t),  # psi_pNm1
            (N_t - 2, 1, 1.0 / N_t),  # psi_pNm2
        ]
    ):
        z = np.exp(sign * 2j * np.pi * i * k / N_t) * scale
        phases[:, 2 * col] = z.real
        phases[:, 2 * col + 1] = z.imag
    phases = host_const(phases, rdtype)

    grid = (n_pad // TILE,)
    state_spec = pl.BlockSpec((N_t, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    ph_spec = pl.BlockSpec((N_t, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[state_spec] * 4 + [state_spec] * 3 + [col_spec, ph_spec],
        out_specs=[state_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((N_t, n_pad), rdtype)] * 4,
        interpret=interpret,
    )

    pad_width = n_pad - n

    def step(xi: jnp.ndarray) -> jnp.ndarray:
        padc = lambda a: jnp.pad(a, ((0, 0), (0, pad_width))) if pad_width else a
        yur, yui, ypr, ypi = call(
            padc(xi[0].real), padc(xi[0].imag), padc(xi[1].real), padc(xi[1].imag),
            a11r, a11i, invdet, colc, phases,
        )
        yu = jax.lax.complex(yur[:, :n], yui[:, :n])
        yp = jax.lax.complex(ypr[:, :n], ypi[:, :n])
        return jnp.stack([yu, yp])

    return step
