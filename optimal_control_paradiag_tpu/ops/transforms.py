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
