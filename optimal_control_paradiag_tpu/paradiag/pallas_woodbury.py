"""Pallas TPU kernel: the ENTIRE spectral-domain Woodbury solve, fused.

The half-spectrum Woodbury direct solve (paradiag/spectral.py,
``_build_woodbury_half``) spends its non-transform time in ~30 small
elementwise passes over the ``(K, n)`` spectral state (K = N_t//2 + 1):
D^{-1} -> 4 slice extractions -> 4x4 capacity mix -> rank-1 injections ->
D^{-1}, then (refine=1) the exact operator A_hat and a second Woodbury pass.
Each jnp pass reads and writes the whole state from HBM -- ~30x the state
traffic for O(1) flops per element.

This kernel fuses ALL of it -- ``b_hat -> x`` including ``refine``
defect-correction steps -- into ONE pass: each grid program holds a
``(K, TILE)`` wavenumber slab in VMEM (the time axis is never tiled: the
slice reductions run over all K bins) and performs the whole pipeline in
registers. HBM traffic drops from ~30 state passes to 2 (read b_hat, write
x). Complex arithmetic is split-real (complex does not lower in TPU
kernels); the slice/capacity algebra is the REAL half-spectrum pairing of
``_build_woodbury_half`` (weights 2 on paired bins, 1 on self-conjugate).

Wired as ``SolverConfig(method='woodbury', use_pallas=True)``; interpret mode
(CPU) is tested for exact agreement with the jnp path.

Replaces the hot-loop role of the reference's MUMPS-backed PC apply
(``Control_Wave_PC.py:491-555``) with a single fused device kernel.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.spectral import (
    _capacity_matrices,
    _spectral_plan,
)
from optimal_control_paradiag_tpu.utils.constants import host_const, to_device

TILE = 128


def _make_kernel(refine: int):
    """Kernel body: refs are
    [bur, bui, bpr, bpi] state blocks (K, TILE);
    [a11r, a11i, invdet] per-(k,j) constants (K, TILE);
    colc (8, TILE): rows m1, kap1, tm1, mk1, tm (= tm1), G rows appended below;
    gc (16, TILE): capacity matrix entries G[a][b] per wavenumber;
    phases (K, 16): phi (weighted, extraction) + psi (injection) re/im pairs;
    outputs [xur, xui, xpr, xpi]."""

    def kernel(
        bur_ref, bui_ref, bpr_ref, bpi_ref,
        a11r_ref, a11i_ref, invdet_ref,
        colc_ref, gc_ref, phases_ref,
        xur_ref, xui_ref, xpr_ref, xpi_ref,
    ):
        bur, bui = bur_ref[:], bui_ref[:]
        bpr, bpi = bpr_ref[:], bpi_ref[:]
        a11r, a11i = a11r_ref[:], a11i_ref[:]
        invdet = invdet_ref[:]
        m1 = colc_ref[0, :]
        kap1 = colc_ref[1, :]
        tm1 = colc_ref[2, :]
        mk1 = colc_ref[3, :]
        gc = gc_ref[:]
        ph = phases_ref[:]

        def d_inv(ur, ui, pr, pi):
            # yu = (conj(a11) u + tm p) / det ; yp = (a11 p - tm u) / det
            yur = (a11r * ur + a11i * ui + tm1 * pr) * invdet
            yui = (a11r * ui - a11i * ur + tm1 * pi) * invdet
            ypr = (a11r * pr - a11i * pi - tm1 * ur) * invdet
            ypi = (a11r * pi + a11i * pr - tm1 * ui) * invdet
            return yur, yui, ypr, ypi

        def extract(ur, ui, pr, pi):
            # Real part of sum_k phi_k y_k with pairing weights in phi.
            uN1 = jnp.sum(ph[:, 0:1] * ur - ph[:, 1:2] * ui, axis=0)
            uN2 = jnp.sum(ph[:, 2:3] * ur - ph[:, 3:4] * ui, axis=0)
            p0 = jnp.sum(ph[:, 4:5] * pr - ph[:, 5:6] * pi, axis=0)
            p1 = jnp.sum(ph[:, 6:7] * pr - ph[:, 7:8] * pi, axis=0)
            return uN1, uN2, p0, p1

        def inject(ur, ui, pr, pi, w0, w1, w2, w3, sign):
            # y += sign * psi (x) w  (w real per wavenumber; psi complex bins)
            ur = ur + sign * (ph[:, 8:9] * w0 + ph[:, 10:11] * w1)
            ui = ui + sign * (ph[:, 9:10] * w0 + ph[:, 11:12] * w1)
            pr = pr + sign * (ph[:, 12:13] * w2 + ph[:, 14:15] * w3)
            pi = pi + sign * (ph[:, 13:14] * w2 + ph[:, 15:16] * w3)
            return ur, ui, pr, pi

        def wb_apply(rur, rui, rpr, rpi):
            yur, yui, ypr, ypi = d_inv(rur, rui, rpr, rpi)
            z0, z1, z2, z3 = extract(yur, yui, ypr, ypi)
            w = []
            for a in range(4):
                w.append(
                    gc[4 * a + 0, :] * z0
                    + gc[4 * a + 1, :] * z1
                    + gc[4 * a + 2, :] * z2
                    + gc[4 * a + 3, :] * z3
                )
            # corr = psi (x) w ; x = y - D_inv(corr)
            cur = ph[:, 8:9] * w[0] + ph[:, 10:11] * w[1]
            cui = ph[:, 9:10] * w[0] + ph[:, 11:12] * w[1]
            cpr = ph[:, 12:13] * w[2] + ph[:, 14:15] * w[3]
            cpi = ph[:, 13:14] * w[2] + ph[:, 15:16] * w[3]
            dur, dui, dpr, dpi = d_inv(cur, cui, cpr, cpi)
            return yur - dur, yui - dui, ypr - dpr, ypi - dpi

        def a_hat(ur, ui, pr, pi):
            # D x  (a22 = conj(a11); tm real)
            dur = a11r * ur - a11i * ui - tm1 * pr
            dui = a11r * ui + a11i * ur - tm1 * pi
            dpr = tm1 * ur + a11r * pr + a11i * pi
            dpi = tm1 * ui + a11r * pi - a11i * pr
            uN1, uN2, p0, p1 = extract(ur, ui, pr, pi)
            r0 = m1 * (2.0 * uN1 - uN2) - kap1 * uN2 + 0.5 * tm1 * p0
            r1 = -mk1 * uN1
            r2 = m1 * (2.0 * p0 - p1) - kap1 * p1 - 0.5 * tm1 * uN1
            r3 = -mk1 * p0
            return inject(dur, dui, dpr, dpi, r0, r1, r2, r3, 1.0)

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


def build_pallas_woodbury_solver(
    op: AllAtOnceOperator, refine: int = 1, interpret: bool = False,
    pack_fft: bool = True,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Direct solver ``b -> x``: jnp transforms (DST matmul + rfft -- already
    MXU/fft-optimal) around ONE fused Pallas kernel for the whole spectral-
    domain Woodbury pipeline including ``refine`` defect-correction steps.

    ``pack_fft`` (r5): run the time transforms as ONE packed complex FFT of
    z = u + i p instead of two real rffts (half the FFT work -- the r4/r5
    breakdowns put the rfft/irfft roundtrip at 1.1 ms of the 2.4 ms
    headline; ops.transforms.time_rfft_conj_packed)."""
    sp = op.space
    plan = _spectral_plan(op)
    N_t, n = plan.N_t, plan.n
    K = N_t // 2 + 1
    rdtype = jnp.float32 if sp.dtype == jnp.float32 else jnp.float64

    muM = plan.muM64
    muK = plan.muK64
    a11_h = plan.a11_h[:K]
    det_h = plan.det_h[:K]

    n_pad = -(-n // TILE) * TILE

    def padded(a2d, fill=0.0):
        out = np.full((a2d.shape[0], n_pad), fill, np.float64)
        out[:, : a2d.shape[1]] = a2d
        return out

    # Large (K, n_pad) constants ship as device arrays -> compiled-executable
    # parameters (utils/constants.py policy; embedding measured costly on the
    # relay, see paradiag/blockband.py).
    a11r = to_device(padded(a11_h.real), rdtype)
    a11i = to_device(padded(a11_h.imag), rdtype)
    # padded det=1 avoids 0-division garbage in the dead columns
    invdet = to_device(padded(1.0 / det_h, fill=1.0), rdtype)

    colc = np.zeros((8, n_pad))
    colc[0, :n] = muM
    colc[1, :n] = plan.c * muK
    colc[2, :n] = plan.theta * muM
    colc[3, :n] = muM + plan.c * muK
    # O(n) per-space constants ship as device arrays (same policy as
    # a11r/invdet) so large spaces never embed them in the program.
    colc = to_device(colc, rdtype)

    G_h = _capacity_matrices(plan)
    assert float(np.abs(G_h.imag).max()) < 1e-10 * max(float(np.abs(G_h.real).max()), 1.0)
    gc = np.zeros((16, n_pad))
    for a in range(4):
        for b_ in range(4):
            gc[4 * a + b_, :n] = G_h[:, a, b_].real
    gc = to_device(gc, rdtype)

    k = np.arange(K)
    wgt = np.full(K, 2.0)
    wgt[0] = 1.0
    if N_t % 2 == 0:
        wgt[K - 1] = 1.0
    phases = np.zeros((K, 16))
    for col, (i, sign, scale) in enumerate(
        [
            (N_t - 1, -1, None),  # phi_uNm1 (weighted)
            (N_t - 2, -1, None),  # phi_uNm2
            (0, -1, None),        # phi_p0
            (1, -1, None),        # phi_p1
            (0, 1, 1.0 / N_t),    # psi_u0
            (1, 1, 1.0 / N_t),    # psi_u1
            (N_t - 1, 1, 1.0 / N_t),  # psi_pNm1
            (N_t - 2, 1, 1.0 / N_t),  # psi_pNm2
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
    gc_spec = pl.BlockSpec((16, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    ph_spec = pl.BlockSpec((K, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        _make_kernel(refine),
        grid=grid,
        in_specs=[state_spec] * 4 + [state_spec] * 3 + [col_spec, gc_spec, ph_spec],
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
            a11r, a11i, invdet, colc, gc, phases,
        )
        xi = jnp.stack(
            [jax.lax.complex(xur[:, :n], xui[:, :n]), jax.lax.complex(xpr[:, :n], xpi[:, :n])]
        )
        return from_spectral(xi)

    return solve
