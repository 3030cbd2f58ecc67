"""Pallas TPU kernel: the heat family's spectral-domain SMW solve, fused.

The rank-2 analogue of :mod:`paradiag.pallas_woodbury` (the wave kernel)
for the heat-control family (``models/heat.py``): the half-spectrum rank-2
Sherman-Morrison-Woodbury pipeline -- D^{-1} -> 2 boundary-slice
extractions -> 2x2 capacity mix -> rank-1 injections -> D^{-1}, plus
``refine`` defect-correction steps through the exact circulant operator
A_hat -- runs as ONE kernel pass over ``(K, TILE)`` wavenumber slabs held
in VMEM. The jnp path's ~20 elementwise HBM passes over the spectral state
collapse to 2 (read b_hat, write x). Split-real arithmetic (complex does
not lower in TPU kernels); same algebra as
``HeatControlProblem.build_woodbury_solver`` with the pairing-weighted
extraction phases.

Wired as ``HeatControlProblem.solve(SolverConfig(method='woodbury',
use_pallas=True))``; interpret mode (CPU) is pinned for exact agreement
with the jnp path in ``tests/test_heat.py``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optimal_control_paradiag_tpu.utils.constants import host_const, to_device

TILE = 128


def _make_kernel(refine: int):
    """Refs: [bur, bui, bpr, bpi] state blocks (K, TILE);
    [a11r, a11i, invdet] per-(k, j) constants (K, TILE);
    colc (8, TILE): rows m1, tm1, G00, G01, G10, G11 (2 spare);
    phases (K, 8): phi_uN, phi_p1 (weighted extraction), psi_u1, psi_pN
    (injection) as re/im pairs; outputs [xur, xui, xpr, xpi]."""

    def kernel(
        bur_ref, bui_ref, bpr_ref, bpi_ref,
        a11r_ref, a11i_ref, invdet_ref,
        colc_ref, phases_ref,
        xur_ref, xui_ref, xpr_ref, xpi_ref,
    ):
        bur, bui = bur_ref[:], bui_ref[:]
        bpr, bpi = bpr_ref[:], bpi_ref[:]
        a11r, a11i = a11r_ref[:], a11i_ref[:]
        invdet = invdet_ref[:]
        m1 = colc_ref[0, :]
        tm1 = colc_ref[1, :]
        g00 = colc_ref[2, :]
        g01 = colc_ref[3, :]
        g10 = colc_ref[4, :]
        g11 = colc_ref[5, :]
        ph = phases_ref[:]

        def d_inv(ur, ui, pr, pi):
            # yu = (conj(a11) u + tm p) / det ; yp = (a11 p - tm u) / det
            yur = (a11r * ur + a11i * ui + tm1 * pr) * invdet
            yui = (a11r * ui - a11i * ur + tm1 * pi) * invdet
            ypr = (a11r * pr - a11i * pi - tm1 * ur) * invdet
            ypi = (a11r * pi + a11i * pr - tm1 * ui) * invdet
            return yur, yui, ypr, ypi

        def extract(ur, ui, pr, pi):
            # Real part of sum_k phi_k y_k, pairing weights folded into phi.
            uN = jnp.sum(ph[:, 0:1] * ur - ph[:, 1:2] * ui, axis=0)
            p1 = jnp.sum(ph[:, 2:3] * pr - ph[:, 3:4] * pi, axis=0)
            return uN, p1

        def inject(ur, ui, pr, pi, wu, wp, sign):
            # y += sign * psi (x) w  (w real per wavenumber; psi complex)
            ur = ur + sign * ph[:, 4:5] * wu
            ui = ui + sign * ph[:, 5:6] * wu
            pr = pr + sign * ph[:, 6:7] * wp
            pi = pi + sign * ph[:, 7:8] * wp
            return ur, ui, pr, pi

        def wb_apply(rur, rui, rpr, rpi):
            yur, yui, ypr, ypi = d_inv(rur, rui, rpr, rpi)
            z0, z1 = extract(yur, yui, ypr, ypi)
            w0 = g00 * z0 + g01 * z1
            w1 = g10 * z0 + g11 * z1
            cur = ph[:, 4:5] * w0
            cui = ph[:, 5:6] * w0
            cpr = ph[:, 6:7] * w1
            cpi = ph[:, 7:8] * w1
            dur, dui, dpr, dpi = d_inv(cur, cui, cpr, cpi)
            return yur - dur, yui - dui, ypr - dpr, ypi - dpi

        def a_hat(ur, ui, pr, pi):
            # D x (a22 = conj(a11); tm real), then the rank-2 injection.
            dur = a11r * ur - a11i * ui - tm1 * pr
            dui = a11r * ui + a11i * ur - tm1 * pi
            dpr = tm1 * ur + a11r * pr + a11i * pi
            dpi = tm1 * ui + a11r * pi - a11i * pr
            uN, p1 = extract(ur, ui, pr, pi)
            return inject(dur, dui, dpr, dpi, m1 * uN, m1 * p1, 1.0)

        xur, xui, xpr, xpi = wb_apply(bur, bui, bpr, bpi)
        for _ in range(refine):
            aur, aui, apr, api = a_hat(xur, xui, xpr, xpi)
            cur, cui, cpr, cpi = wb_apply(bur - aur, bui - aui, bpr - apr, bpi - api)
            xur, xui = xur + cur, xui + cui
            xpr, xpi = xpr + cpr, xpi + cpi

        xur_ref[:] = xur
        xui_ref[:] = xui
        xpr_ref[:] = xpr
        xpi_ref[:] = xpi

    return kernel


def build_pallas_heat_solver(
    prob, refine: int = 1, interpret: bool = False, pack_fft: bool = True
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Direct solver ``b -> x`` for a :class:`models.heat.HeatControlProblem`
    on a sine-diagonalizable space: jnp transforms (DST matmul + packed
    two-for-one FFT by default, r5) around one fused Pallas kernel for the
    whole rank-2 spectral SMW pipeline."""
    sp = prob.space
    if not sp.diagonalizable:
        raise ValueError("the fused heat kernel needs a sine-diagonalizable space")
    cfg = prob.config
    N_t = cfg.N_t
    K = N_t // 2 + 1
    n = sp.n
    rdtype = jnp.float32 if sp.dtype == jnp.float32 else jnp.float64

    _, muM64, _, a11_h, tm_h, det_h = prob._plan()
    a11_h = a11_h[:K]
    det_hK = det_h[:K]
    G_h = prob._capacity_2x2()

    n_pad = -(-n // TILE) * TILE

    def padded(a2d, fill=0.0):
        out = np.full((a2d.shape[0], n_pad), fill, np.float64)
        out[:, : a2d.shape[1]] = a2d
        return out

    # Large per-(k, j) constants ship as device arrays -> compiled-executable
    # parameters (not constant-folded / compile-RPC-embedded; see
    # paradiag/blockband.py for the measured cost of embedding).
    a11r = to_device(padded(a11_h.real), rdtype)
    a11i = to_device(padded(a11_h.imag), rdtype)
    invdet = to_device(padded(1.0 / det_hK, fill=1.0), rdtype)

    colc = np.zeros((8, n_pad))
    colc[0, :n] = muM64
    colc[1, :n] = tm_h[0]  # theta * muM (mode-independent row of tm_h)
    colc[2, :n] = G_h[:, 0, 0]
    colc[3, :n] = G_h[:, 0, 1]
    colc[4, :n] = G_h[:, 1, 0]
    colc[5, :n] = G_h[:, 1, 1]
    # O(n) per-space constant: shipped as a device array like a11r/invdet so
    # large spaces (2D lumped: n = (N_x-1)^2) never embed it in the program.
    colc = to_device(colc, rdtype)

    k = np.arange(K)
    wgt = np.full(K, 2.0)
    wgt[0] = 1.0
    if N_t % 2 == 0:
        wgt[K - 1] = 1.0
    phases = np.zeros((K, 8))
    for col, (i, sign, scale) in enumerate(
        [
            (N_t - 1, -1, None),      # phi_uN  (weighted extraction)
            (0, -1, None),            # phi_p1
            (0, 1, 1.0 / N_t),        # psi_u1  (injection)
            (N_t - 1, 1, 1.0 / N_t),  # psi_pN
        ]
    ):
        z = np.exp(sign * 2j * np.pi * i * k / N_t)
        z = z * (wgt if scale is None else scale)
        phases[:, 2 * col] = z.real
        phases[:, 2 * col + 1] = z.imag
    phases = host_const(phases, rdtype)

    grid = (n_pad // TILE,)
    state_spec = pl.BlockSpec((K, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    ph_spec = pl.BlockSpec((K, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _make_kernel(refine),
        grid=grid,
        in_specs=[state_spec] * 4 + [state_spec] * 3 + [col_spec, ph_spec],
        out_specs=[state_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((K, n_pad), rdtype)] * 4,
        interpret=interpret,
    )

    pad_width = n_pad - n

    if pack_fft:
        from optimal_control_paradiag_tpu.ops.transforms import (
            time_irfft_conj_packed,
            time_rfft_conj_packed,
        )

        def to_spectral(x):
            return time_rfft_conj_packed(sp.dst(x), N_t)

        def from_spectral(xi):
            return sp.idst(time_irfft_conj_packed(xi, N_t)).astype(rdtype)

    else:

        def to_spectral(x):
            s = sp.dst(x)
            return jnp.conj(jnp.fft.rfft(s, axis=1)) * (1.0 / N_t)

        def from_spectral(xi):
            t = jnp.fft.irfft(jnp.conj(xi), n=N_t, axis=1) * float(N_t)
            return sp.idst(t).astype(rdtype)

    def solve(b: jnp.ndarray) -> jnp.ndarray:
        b_hat = to_spectral(b)
        padc = lambda a: jnp.pad(a, ((0, 0), (0, pad_width))) if pad_width else a
        xur, xui, xpr, xpi = call(
            padc(b_hat[0].real), padc(b_hat[0].imag),
            padc(b_hat[1].real), padc(b_hat[1].imag),
            a11r, a11i, invdet, colc, phases,
        )
        xi = jnp.stack(
            [jax.lax.complex(xur[:, :n], xui[:, :n]), jax.lax.complex(xpr[:, :n], xpi[:, :n])]
        )
        return from_spectral(xi)

    return solve
