"""Time-axis Fourier transforms as real MXU matmuls.

Two interchangeable implementations of the circulant diagonalization
transforms (numpy-convention fft/ifft over the time axis, reference
``Control_Wave_PC.py:499-501, 546-550``):

- ``jnp.fft`` -- fine on a single device (and lowers on TPU for compiled
  complex), but XLA's SPMD partitioning of complex128 FFTs miscompiles
  (c64/c128 constant mismatch, observed on CPU meshes), and FFT gives the
  partitioner little freedom anyway;
- **DFT-by-matmul** -- F = C ± iS with real cos/sin matrices, applied as
  real matmuls on the split (re, im) parts: 4 real ``(N_t, N_t) @ (N_t, n)``
  contractions. TPU-idiomatic: complex matmuls do not lower on the TPU
  backend, real matmuls hit the MXU, and a sharded contraction over the time
  axis lets XLA choose psum/reduce-scatter placement freely. For the moderate
  N_t of ParaDiag (dozens..thousands) the O(N_t^2) matmul is MXU-cheap.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.utils.constants import host_const


def dft_matrices(N: int, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """Host constants ``C[k, j] = cos(2 pi j k / N)``, ``S[k, j] = sin(...)``."""
    k = np.arange(N)
    ang = 2.0 * np.pi * np.outer(k, k) / N
    return host_const(np.cos(ang), dtype), host_const(np.sin(ang), dtype)


_HI = jax.lax.Precision.HIGHEST


def _apply(C, S, xr, xi, sign: int, scale: float):
    """(C + sign*i*S)(xr + i*xi) * scale over the time axis (axis 1 of
    ``(2, N_t, n)`` states), as real contractions."""
    cr = jnp.einsum("kt,ctn->ckn", C, xr, precision=_HI)
    ci = jnp.einsum("kt,ctn->ckn", C, xi, precision=_HI)
    sr = jnp.einsum("kt,ctn->ckn", S, xr, precision=_HI)
    si = jnp.einsum("kt,ctn->ckn", S, xi, precision=_HI)
    re = cr - sign * si
    im = ci + sign * sr
    return re * scale, im * scale


def time_ifft_mm(x: jnp.ndarray, C, S) -> jnp.ndarray:
    """numpy ``ifft`` over axis 1: (1/N)(C + iS) applied to complex x."""
    N = C.shape[0]
    re, im = _apply(C, S, x.real, x.imag, sign=+1, scale=1.0 / N)
    return jax.lax.complex(re, im)


def time_fft_mm(x: jnp.ndarray, C, S) -> jnp.ndarray:
    """numpy ``fft`` over axis 1: (C - iS) applied to complex x."""
    re, im = _apply(C, S, x.real, x.imag, sign=-1, scale=1.0)
    return jax.lax.complex(re, im)


def time_ifft_real_mm(x: jnp.ndarray, C, S) -> jnp.ndarray:
    """ifft of a REAL x: two matmuls instead of four."""
    N = C.shape[0]
    re = jnp.einsum("kt,ctn->ckn", C, x, precision=_HI) * (1.0 / N)
    im = jnp.einsum("kt,ctn->ckn", S, x, precision=_HI) * (1.0 / N)
    return jax.lax.complex(re, im)


def time_fft_real_part_mm(x: jnp.ndarray, C, S) -> jnp.ndarray:
    """real(fft(x)) for complex x: two matmuls (the imaginary output is
    discarded by the ParaDiag apply anyway)."""
    return jnp.einsum("kt,ctn->ckn", C, x.real, precision=_HI) + jnp.einsum(
        "kt,ctn->ckn", S, x.imag, precision=_HI
    )


# ---------------------------------------------------------------------------
# Four-step (Cooley-Tukey N = a*b) time transforms as small-radix MXU matmuls
# ---------------------------------------------------------------------------
#
# The r4 headline breakdown measured jnp.fft's rfft+irfft roundtrip at
# 1.10 ms for a 16.8 MB state on the v5e -- ~60 GB/s effective, 7% of HBM
# peak: XLA's TPU FFT is scalar-ish VPU work. The same transform as TWO
# small-radix DFT matmul stages (radix ~ sqrt(N_t)) with a twiddle multiply
# in between is a few 1e9 MXU flops plus ~7 streaming passes over the state
# -- bandwidth-bound at speed of light instead of compute-bound at VPU
# speed. Conventions below match the half-spectrum Woodbury pipeline
# (paradiag/spectral.py make_halfspectrum_transforms):
#
#   forward:  xi = conj(rfft(x, axis=1)) / N        (keep K = N//2 + 1 bins)
#   inverse:  x  = irfft(conj(xi), n=N, axis=1) * N (real output)
#
# Derivation (t = t1 + a*t2, k = k1*b + k2, omega = e^{+2 pi i / N} -- the
# CONJUGATED-forward sign):
#   X[k2 + b*k1] = sum_{t1} omega_a^{t1 k1} [ omega_N^{t1 k2} *
#                  sum_{t2} omega_b^{t2 k2} x[t1 + a t2] ]
# i.e. stage 1 = radix-b DFT over t2, twiddle, stage 2 = radix-a DFT over
# t1; the inverse factorizes symmetrically after Hermitian extension of the
# conjugated half spectrum. All matrices are real cos/sin host constants;
# complex arithmetic is explicit split-real (complex matmuls do not lower
# on the TPU backend).


def factor_pair(N: int) -> Tuple[int, int]:
    """(a, b) with a*b = N and a <= b as close to sqrt(N) as N's divisors
    allow (a is the stage-2 radix, b the stage-1 radix)."""
    a = int(np.sqrt(N))
    while a > 1 and N % a:
        a -= 1
    return a, N // a


class FourStepPlan:
    """Host-constant matrices of the four-step time transforms for one
    (N, dtype). Build once at setup; all fields are numpy (jit-embeddable).

    ``precision``: MXU precision of the radix matmuls. HIGHEST (6-pass
    bf16) re-reads the state per pass, making the small-radix stages
    bandwidth-bound at ~6x the algorithmic traffic (measured r5: the
    four-step roundtrip matched jnp.fft instead of beating it); HIGH
    (3-pass) halves that for ~1e-6-relative transform error."""

    def __init__(self, N: int, rdtype, precision=None):
        self.prec = precision if precision is not None else jax.lax.Precision.HIGHEST
        a, b = factor_pair(N)
        if a < 2:
            raise ValueError(f"N={N} has no nontrivial factorization; use the fft path")
        self.N, self.a, self.b, self.K = N, a, b, N // 2 + 1
        tb = np.arange(b)
        ta = np.arange(a)
        # stage-1 forward: radix-b DFT over t2, scaled by 1/N (fold the rfft
        # conj convention's 1/N here, where the operand is still real).
        ang_b = 2.0 * np.pi * np.outer(tb, tb) / b
        self.Cb = host_const(np.cos(ang_b) / N, rdtype)
        self.Sb = host_const(np.sin(ang_b) / N, rdtype)
        # twiddle W[k2, t1] = omega_N^{k2 t1}
        ang_w = 2.0 * np.pi * np.outer(tb, ta) / N
        self.Wre = host_const(np.cos(ang_w), rdtype)
        self.Wim = host_const(np.sin(ang_w), rdtype)
        # stage-2 forward: radix-a DFT over t1
        ang_a = 2.0 * np.pi * np.outer(ta, ta) / a
        self.Ca = host_const(np.cos(ang_a), rdtype)
        self.Sa = host_const(np.sin(ang_a), rdtype)
        # inverse reuses the same (unscaled) radix matrices; the forward's
        # 1/N and the inverse's *N cancel by construction.
        self.Cb1 = host_const(np.cos(ang_b), rdtype)
        self.Sb1 = host_const(np.sin(ang_b), rdtype)


def time_rfft_conj_mm4(x: jnp.ndarray, p: FourStepPlan) -> jnp.ndarray:
    """``conj(rfft(x, axis=1)) / N`` of a real ``(c, N, n)`` state via the
    four-step factorization (module note). Returns ``(c, K, n)`` complex."""
    _HI = p.prec
    c, N, n = x.shape
    x4 = x.reshape(c, p.b, p.a, n)  # [t2, t1]
    yre = jnp.einsum("KT,cTan->cKan", p.Cb, x4, precision=_HI)
    yim = jnp.einsum("KT,cTan->cKan", p.Sb, x4, precision=_HI)
    zre = yre * p.Wre[None, :, :, None] - yim * p.Wim[None, :, :, None]
    zim = yre * p.Wim[None, :, :, None] + yim * p.Wre[None, :, :, None]
    Xre = jnp.einsum("AT,cKTn->cAKn", p.Ca, zre, precision=_HI) - jnp.einsum(
        "AT,cKTn->cAKn", p.Sa, zim, precision=_HI
    )
    Xim = jnp.einsum("AT,cKTn->cAKn", p.Ca, zim, precision=_HI) + jnp.einsum(
        "AT,cKTn->cAKn", p.Sa, zre, precision=_HI
    )
    X = jax.lax.complex(Xre.reshape(c, N, n), Xim.reshape(c, N, n))
    return X[:, : p.K]


def time_irfft_conj_mm4(xi: jnp.ndarray, p: FourStepPlan) -> jnp.ndarray:
    """``irfft(conj(xi), n=N, axis=1) * N`` of a ``(c, K, n)`` half spectrum
    via the four-step factorization; returns the real ``(c, N, n)`` state."""
    _HI = p.prec
    c, K, n = xi.shape
    N = p.N
    # Hermitian extension of conj(xi): Z[k] = conj(xi)[k] for k < K,
    # Z[N-k] = xi[k] for the mirrored bins (works for N odd and even).
    mre, mim = xi.real[:, 1 : N - K + 1], xi.imag[:, 1 : N - K + 1]
    Zre = jnp.concatenate([xi.real, jnp.flip(mre, axis=1)], axis=1)
    Zim = jnp.concatenate([-xi.imag, jnp.flip(mim, axis=1)], axis=1)
    Z4re = Zre.reshape(c, p.a, p.b, n)  # [k1, k2]
    Z4im = Zim.reshape(c, p.a, p.b, n)
    # stage 1: radix-a DFT over k1 (output index t1)
    are = jnp.einsum("TA,cAKn->cTKn", p.Ca, Z4re, precision=_HI) - jnp.einsum(
        "TA,cAKn->cTKn", p.Sa, Z4im, precision=_HI
    )
    aim = jnp.einsum("TA,cAKn->cTKn", p.Ca, Z4im, precision=_HI) + jnp.einsum(
        "TA,cAKn->cTKn", p.Sa, Z4re, precision=_HI
    )
    # twiddle W[k2, t1] applied as [t1, k2]
    wre = jnp.swapaxes(p.Wre, 0, 1)[None, :, :, None]
    wim = jnp.swapaxes(p.Wim, 0, 1)[None, :, :, None]
    bre = are * wre - aim * wim
    bim = are * wim + aim * wre
    # stage 2: radix-b DFT over k2, REAL part only (output index t2)
    out = jnp.einsum("TK,ctKn->cTtn", p.Cb1, bre, precision=_HI) - jnp.einsum(
        "TK,ctKn->cTtn", p.Sb1, bim, precision=_HI
    )
    return out.reshape(c, N, n)


# ---------------------------------------------------------------------------
# Four-step DST-I over the LAST axis (the spatial sine transform)
# ---------------------------------------------------------------------------
#
# The r4 breakdown put the dense matmul-DST at 1.08 ms per direction at the
# headline size (0.48 of the 6-pass-f32 MXU peak) -- the single largest
# cost in the solve. DST-I(x)_k = -0.5 Im fft([0, x, 0, -flip(x)])_{k+1}
# (the odd-extension identity, length N = 2 N_x), and that FFT factorizes
# into two radix-~sqrt(N) real matmul stages exactly like the time
# transform above -- O(N_x^1.5) MXU flops per row instead of O(N_x^2), and
# only the IMAGINARY part of the final stage is computed (2 matmuls).
# Conventions match fem/space.P1Space.dst (V[i,j] = sin((i+1)(j+1)pi/N_x)).


class DstFourStepPlan:
    """Host-constant matrices of the four-step DST-I for one (N_x, dtype).
    ``precision``: see FourStepPlan."""

    def __init__(self, N_x: int, rdtype, precision=None):
        self.prec = precision if precision is not None else jax.lax.Precision.HIGHEST
        N = 2 * N_x
        a, b = factor_pair(N)
        if a < 2:
            raise ValueError(f"2*N_x={N} has no nontrivial factorization")
        self.N_x, self.N, self.a, self.b = N_x, N, a, b
        tb = np.arange(b)
        ta = np.arange(a)
        ang_b = 2.0 * np.pi * np.outer(tb, tb) / b
        self.Cb = host_const(np.cos(ang_b), rdtype)
        self.Sb = host_const(np.sin(ang_b), rdtype)
        ang_w = 2.0 * np.pi * np.outer(tb, ta) / N  # W[k2, t1]
        self.Wre = host_const(np.cos(ang_w), rdtype)
        self.Wim = host_const(np.sin(ang_w), rdtype)
        ang_a = 2.0 * np.pi * np.outer(ta, ta) / a
        self.Ca = host_const(np.cos(ang_a), rdtype)
        self.Sa = host_const(np.sin(ang_a), rdtype)


def dst1_mm4(x: jnp.ndarray, p: DstFourStepPlan) -> jnp.ndarray:
    """DST-I of a REAL array over its last axis (length N_x - 1) via the
    odd-extension four-step factorization; equals
    ``x @ sin((i+1)(j+1)pi/N_x)`` to f32 rounding."""
    _HI = p.prec
    n = p.N_x - 1
    z = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    ext = jnp.concatenate([z, x, z, -jnp.flip(x, axis=-1)], axis=-1)
    e4 = ext.reshape(x.shape[:-1] + (p.b, p.a))  # [t2, t1]
    # stage 1: radix-b DFT over t2, sign - (numpy fft): (Cb - i Sb) e
    yre = jnp.einsum("KT,...Ta->...Ka", p.Cb, e4, precision=_HI)
    yim = -jnp.einsum("KT,...Ta->...Ka", p.Sb, e4, precision=_HI)
    # twiddle e^{-2 pi i k2 t1 / N} = Wre - i Wim
    zre = yre * p.Wre + yim * p.Wim
    zim = yim * p.Wre - yre * p.Wim
    # stage 2: radix-a DFT over t1, imaginary part only:
    # Im((Ca - i Sa)(zre + i zim)) = Ca zim - Sa zre
    Xim = jnp.einsum("AT,...KT->...AK", p.Ca, zim, precision=_HI) - jnp.einsum(
        "AT,...KT->...AK", p.Sa, zre, precision=_HI
    )
    X = Xim.reshape(x.shape[:-1] + (p.N,))
    return -0.5 * X[..., 1 : n + 1]


# ---------------------------------------------------------------------------
# Two-for-one ("packed") half-spectrum time transforms
# ---------------------------------------------------------------------------
#
# The half-spectrum pipeline transforms a REAL PAIR (u, p): packing
# z = u + i p runs ONE complex FFT over the time axis instead of two real
# rffts, and the two half-spectra split out by Hermitian symmetry --
# exactly half the FFT work (the r4/r5 breakdowns put the rfft+irfft
# roundtrip at 1.1 ms of the 2.4 ms headline). Conventions match
# make_halfspectrum_transforms' fft path:
#   forward:  xi_c = conj(rfft(s_c, axis=1)) / N     c in {u, p}
#   inverse:  t_c  = irfft(conj(xi_c), n=N, axis=1) * N


def time_rfft_conj_packed(s: jnp.ndarray, N: int) -> jnp.ndarray:
    """``conj(rfft(s, axis=1))/N`` of a real ``(2, N, n)`` pair via one
    packed complex FFT; returns ``(2, K, n)`` complex."""
    K = N // 2 + 1
    z = jax.lax.complex(s[0], s[1])
    Z = jnp.fft.fft(z, axis=0)
    # Zm[k] = conj(Z[(N - k) % N])
    Zm = jnp.conj(jnp.roll(jnp.flip(Z, axis=0), 1, axis=0))
    R0 = 0.5 * (Z + Zm)          # rfft(s0), all N bins (Hermitian)
    R1 = -0.5j * (Z - Zm)        # rfft(s1)
    return jnp.stack([jnp.conj(R0[:K]), jnp.conj(R1[:K])]) * (1.0 / N)


def time_irfft_conj_packed(xi: jnp.ndarray, N: int) -> jnp.ndarray:
    """``irfft(conj(xi_c), n=N, axis=1) * N`` for the ``(2, K, n)`` pair via
    one packed complex inverse FFT; returns the real ``(2, N, n)`` pair."""
    K = xi.shape[1]
    W = (jnp.conj(xi[0]) + 1j * jnp.conj(xi[1])) * N    # R0 + i R1, bins < K
    W2 = (jnp.conj(xi[0]) - 1j * jnp.conj(xi[1])) * N   # R0 - i R1
    mirror = jnp.flip(jnp.conj(W2[1 : N - K + 1]), axis=0)  # bins K..N-1
    Zfull = jnp.concatenate([W, mirror], axis=0)
    z = jnp.fft.ifft(Zfull, axis=0)
    return jnp.stack([z.real, z.imag])
