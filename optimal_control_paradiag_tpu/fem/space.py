"""P1 spaces on structured unit-interval / unit-square meshes.

Closed-form element matrices replace Firedrake assembly
(``Control_Wave_PC.py:16-45`` mesh/space setup; mass ``inner(u,v)*dx`` and
stiffness ``inner(grad u, grad v)*dx`` appear in every row of ``Build_L``,
``Control_Wave_PC.py:86-179``):

1D, mesh size ``h = 1/N_x``:
  element mass ``h/6 [[2,1],[1,2]]`` -> assembled tridiag(h/6, 4h/6, h/6);
  element stiffness ``1/h [[1,-1],[-1,1]]`` -> tridiag(-1/h, 2/h, -1/h).

2D, Friedrichs-Keller triangulation (squares split along the (+1,+1)
diagonal):
  stiffness = the 5-point stencil [[0,-1,0],[-1,4,-1],[0,-1,0]] (h-free);
  consistent mass = h^2/12 * {center 6; E,W,N,S 1; NE,SW 1}.

Homogeneous Dirichlet BCs (ref ``:43-45``) are imposed by elimination: arrays
hold interior nodes only, so stencil neighbors outside the domain contribute
zero -- exact for the reference problems, whose data vanish on the boundary.

TPU-first: operators are applied as dense shift-add stencils (VPU), and both
matrices are diagonalized by the DST-I sine transform, computed as a matmul
with the symmetric sine matrix (MXU) -- any symmetric Toeplitz tridiagonal
``tridiag(a, b, a)`` of size ``n`` has eigenvectors ``sin(ij*pi/(n+1))`` and
eigenvalues ``b + 2a cos(j*pi/(n+1))``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


def _shift_last(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[..., i] = x[..., i-s], zero-padded (Dirichlet-eliminated neighbors)."""
    if s == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1)
    if s > 0:
        return jnp.pad(x[..., :-s], pad + [(s, 0)])
    return jnp.pad(x[..., -s:], pad + [(0, -s)])


def _shift2(x: jnp.ndarray, sy: int, sx: int) -> jnp.ndarray:
    """y[..., iy, ix] = x[..., iy-sy, ix-sx], zero-padded; x is (..., ny, nx)."""
    y = _shift_last(x, sx)
    if sy == 0:
        return y
    pad = [(0, 0)] * (x.ndim - 2)
    if sy > 0:
        return jnp.pad(y[..., :-sy, :], pad + [(sy, 0), (0, 0)])
    return jnp.pad(y[..., -sy:, :], pad + [(0, -sy), (0, 0)])


def _np_shift_last(x: np.ndarray, s: int) -> np.ndarray:
    """Numpy twin of :func:`_shift_last` (host float64 residual oracle)."""
    if s == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1)
    if s > 0:
        return np.pad(x[..., :-s], pad + [(s, 0)])
    return np.pad(x[..., -s:], pad + [(0, -s)])


def _np_shift2(x: np.ndarray, sy: int, sx: int) -> np.ndarray:
    """Numpy twin of :func:`_shift2`."""
    y = _np_shift_last(x, sx)
    if sy == 0:
        return y
    pad = [(0, 0)] * (x.ndim - 2)
    if sy > 0:
        return np.pad(y[..., :-sy, :], pad + [(sy, 0), (0, 0)])
    return np.pad(y[..., -sy:, :], pad + [(0, -sy), (0, 0)])


@dataclasses.dataclass(frozen=True)
class P1Space:
    """Interior-DoF P1 space with stencil operators and sine-transform data.

    All vector arguments have shape ``(..., n)`` with the flat interior-node
    axis last (2D flattening is row-major over ``(ny, nx)``).
    """

    dim: int
    N_x: int
    mass: str  # 'consistent' | 'lumped'
    dtype: Any
    # Sine-transform algorithm: 'matmul' (MXU; exact control over precision),
    # 'fft' (O(n log n) via the odd-extension identity; wins for large n),
    # 'auto' (size-based choice).
    dst_method: str = "auto"
    # Matmul-DST MXU precision: 'highest' (f32 = 6 bf16 passes; default) or
    # 'high' (3-pass bf16x3, ~2x cheaper on the MXU). Measured on v5e at the
    # headline size (N_x=2048, N_t=1024, f32;
    # artifacts/experiments/dst_precision_experiment.py): 'high' alone is
    # UNUSABLE for the direct solve -- true rel residual 0.129 vs 7.2e-4
    # (the n=2047 transform round-trips amplify bf16x3 rounding) -- but
    # combined with one physical-space polish pass
    # (build_polished_solver(polish=1), whose defect is measured by the
    # cancellation-aware STENCIL matvec, not the DST) it lands exactly on
    # the f32 representation floor (4.12e-4) at 4.06 ms/solve vs 4.95 ms
    # for 'highest'+polish: the fastest floor-accurate configuration.
    dst_precision: str = "highest"

    @property
    def h(self) -> float:
        return 1.0 / self.N_x

    @property
    def n1d(self) -> int:
        """Interior nodes per dimension."""
        return self.N_x - 1

    @property
    def grid_shape(self) -> Tuple[int, ...]:
        return (self.n1d,) * self.dim

    @property
    def n(self) -> int:
        """Total interior DoFs."""
        return self.n1d**self.dim

    # ---------------------------------------------------------------- coords

    @functools.cached_property
    def coords(self) -> Tuple[np.ndarray, ...]:
        """Interior node coordinates, each flat of length ``n``: (x,) or (x, y)."""
        pts = (np.arange(1, self.N_x) / self.N_x).astype(np.float64)
        if self.dim == 1:
            return (pts,)
        X, Y = np.meshgrid(pts, pts, indexing="xy")  # rows iy, cols ix
        return (X.ravel(), Y.ravel())

    def interpolate(self, fn: Callable[..., Any]) -> np.ndarray:
        """Nodal interpolation of ``fn(x)`` / ``fn(x, y)`` onto interior nodes
        -- returned as a host (numpy) array; callers ship it to device with
        :func:`utils.constants.to_device` or pass it into a jitted function.

        The P1 analogue of Firedrake ``interpolate`` used for f, g, ICs
        (``Control_Wave_PC.py:48-83``).
        """
        return host_const(np.asarray(fn(*self.coords), dtype=np.float64), self.dtype)

    # ------------------------------------------------------------- operators

    def apply_mass(self, x: jnp.ndarray) -> jnp.ndarray:
        """M @ x over the last axis, batched over leading axes."""
        h = self.h  # python float: weak-typed, no eager dtype dispatch
        if self.mass == "lumped":
            return (h**self.dim) * x
        if self.dim == 1:
            return (h / 6.0) * (4.0 * x + _shift_last(x, 1) + _shift_last(x, -1))
        g = x.reshape(x.shape[:-1] + self.grid_shape)
        acc = 6.0 * g
        for sy, sx in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (-1, -1)):
            acc = acc + _shift2(g, sy, sx)
        return ((h * h / 12.0) * acc).reshape(x.shape)

    def apply_stiffness(self, x: jnp.ndarray) -> jnp.ndarray:
        """K @ x over the last axis, batched over leading axes."""
        h = self.h  # python float: weak-typed, no eager dtype dispatch
        if self.dim == 1:
            return (1.0 / h) * (2.0 * x - _shift_last(x, 1) - _shift_last(x, -1))
        g = x.reshape(x.shape[:-1] + self.grid_shape)
        acc = 4.0 * g
        for sy, sx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            acc = acc - _shift2(g, sy, sx)
        return acc.reshape(x.shape)

    def apply_stiffness_nested(self, x: jnp.ndarray) -> jnp.ndarray:
        """K @ x evaluated in cancellation-aware (nested-difference) form.

        Algebraically identical to :meth:`apply_stiffness`; numerically the
        naive form ``2x_j - x_{j-1} - x_{j+1}`` first builds O(||x||)
        intermediates whose rounding (~eps*||x||/h after the 1/h scale)
        dwarfs the O(h*||x''||) result on smooth fields. Summing first
        differences ``(x_j - x_{j-1}) + (x_j - x_{j+1})`` instead keeps every
        intermediate at the scale of the answer (adjacent-value subtraction
        is exact by Sterbenz when the values are within 2x), dropping the
        float32 rounding noise by ~1/h. Used by the physical-space defect
        correction (``AllAtOnceOperator.matvec_accurate``)."""
        h = self.h
        if self.dim == 1:
            return (1.0 / h) * ((x - _shift_last(x, 1)) + (x - _shift_last(x, -1)))
        g = x.reshape(x.shape[:-1] + self.grid_shape)
        acc = (g - _shift2(g, 0, 1)) + (g - _shift2(g, 0, -1))
        acc = acc + (g - _shift2(g, 1, 0)) + (g - _shift2(g, -1, 0))
        return acc.reshape(x.shape)

    def apply_mass_host_f64(self, x: np.ndarray) -> np.ndarray:
        """Float64 numpy twin of :meth:`apply_mass` (residual oracle)."""
        x = np.asarray(x, np.float64)
        h = self.h
        if self.mass == "lumped":
            return (h**self.dim) * x
        if self.dim == 1:
            return (h / 6.0) * (4.0 * x + _np_shift_last(x, 1) + _np_shift_last(x, -1))
        g = x.reshape(x.shape[:-1] + self.grid_shape)
        acc = 6.0 * g
        for sy, sx in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (-1, -1)):
            acc = acc + _np_shift2(g, sy, sx)
        return ((h * h / 12.0) * acc).reshape(x.shape)

    def apply_stiffness_host_f64(self, x: np.ndarray) -> np.ndarray:
        """Float64 numpy twin of :meth:`apply_stiffness` (residual oracle)."""
        x = np.asarray(x, np.float64)
        h = self.h
        if self.dim == 1:
            return (1.0 / h) * (2.0 * x - _np_shift_last(x, 1) - _np_shift_last(x, -1))
        g = x.reshape(x.shape[:-1] + self.grid_shape)
        acc = 4.0 * g
        for sy, sx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            acc = acc - _np_shift2(g, sy, sx)
        return acc.reshape(x.shape)

    # -------------------------------------------------------- sine transform

    @functools.cached_property
    def dst_matrix(self) -> jnp.ndarray:
        """Symmetric DST-I matrix ``V[i,j] = sin((i+1)(j+1)pi/N_x)``;
        ``V @ V = (N_x/2) I``. Built in numpy (no eager device math -- the
        TPU backend only lowers compiled programs) and transferred ONCE: as
        a device array it lowers as a compiled-executable PARAMETER, so the
        n1d^2 matrix (16.8 MB f32 at the headline size) is neither
        constant-folded at compile time nor carried in the compile RPC
        (see paradiag/blockband.py for the measured cost of embedding)."""
        i = np.arange(1, self.N_x)
        V = np.sin(np.pi * np.outer(i, i) / self.N_x)
        return to_device(host_const(V, self.dtype), self.dtype)

    @property
    def _use_fft_dst(self) -> bool:
        if self.dst_method == "fft":
            return True
        if self.dst_method == "matmul":
            return False
        # 'auto': the MXU matmul wins well past the naive O(n^2) vs
        # O(n log n) crossover -- measured on v5e at n1d=2047 inside the
        # Woodbury solve: matmul 3.19 ms vs fft 3.92 ms per solve
        # (artifacts/dst_experiment.py). Switch to fft once the dense DST
        # matrix itself gets memory-expensive: budget 64 MB for the n1d^2
        # matrix, so the cutover is dtype-aware (float32: n1d > 4096;
        # float64: n1d > 2896 -- CPU/f64 users never pay a 134 MB constant).
        itemsize = jnp.dtype(self.dtype).itemsize
        return self.n1d * self.n1d * itemsize > 64 * 2**20

    def _dst_fft_lastaxis(self, x: jnp.ndarray) -> jnp.ndarray:
        """DST-I along the last axis via the odd-extension FFT identity:
        fft([0, x, 0, -reverse(x)])_k = -2i DST(x)_k, length 2 N_x. Real
        inputs take the rfft half-spectrum path (2x cheaper; the needed bins
        1..n1d all sit in the rfft output of the length-2N_x extension)."""
        zeros = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        ext = jnp.concatenate([zeros, x, zeros, -jnp.flip(x, axis=-1)], axis=-1)
        if not jnp.iscomplexobj(x):
            F = jnp.fft.rfft(ext, axis=-1)
            return (0.5j * F[..., 1 : self.n1d + 1]).real.astype(x.dtype)
        F = jnp.fft.fft(ext, axis=-1)
        return 0.5j * F[..., 1 : self.n1d + 1]

    @functools.cached_property
    def _dst4_plan(self):
        from optimal_control_paradiag_tpu.ops.transforms import DstFourStepPlan

        return DstFourStepPlan(self.N_x, self.dtype)

    def _dst_mm4_lastaxis(self, x: jnp.ndarray) -> jnp.ndarray:
        from optimal_control_paradiag_tpu.ops.transforms import dst1_mm4

        if jnp.iscomplexobj(x):
            return jax.lax.complex(
                dst1_mm4(x.real, self._dst4_plan), dst1_mm4(x.imag, self._dst4_plan)
            )
        return dst1_mm4(x, self._dst4_plan)

    def dst(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward sine transform over the (flat) space axis.

        'matmul': complex inputs split into two real MXU matmuls (complex
        matmuls do not lower on the TPU backend) at HIGHEST precision -- the
        MXU's default bf16 passes destroy the preconditioner's accuracy (and
        with it the outer iteration count). 'fft': O(n log n) odd-extension
        identity via jnp.fft (slow on TPU -- ~60 GB/s effective; kept for
        CPU and very large n). 'mxu4' (r5): the SAME odd-extension identity
        with the length-2N_x FFT factored into two radix-~sqrt(2 N_x) real
        MXU matmul stages (ops.transforms.dst1_mm4) -- O(N_x^1.5) flops per
        row instead of the dense matmul's O(N_x^2), exact to f32 rounding."""
        if self.dst_method == "mxu4":
            if self.dim == 1:
                return self._dst_mm4_lastaxis(x)
            g = x.reshape(x.shape[:-1] + self.grid_shape)
            g = self._dst_mm4_lastaxis(g)
            g = self._dst_mm4_lastaxis(jnp.swapaxes(g, -1, -2))
            return jnp.swapaxes(g, -1, -2).reshape(x.shape)
        if self._use_fft_dst:
            if self.dim == 1:
                return self._dst_fft_lastaxis(x)
            g = x.reshape(x.shape[:-1] + self.grid_shape)
            g = self._dst_fft_lastaxis(g)
            g = self._dst_fft_lastaxis(jnp.swapaxes(g, -1, -2))
            return jnp.swapaxes(g, -1, -2).reshape(x.shape)
        if jnp.iscomplexobj(x):
            return jax.lax.complex(self.dst(x.real), self.dst(x.imag))
        V = self.dst_matrix
        hi = (
            jax.lax.Precision.HIGHEST
            if self.dst_precision == "highest"
            else jax.lax.Precision.HIGH
        )
        if self.dim == 1:
            return jnp.matmul(x, V, precision=hi)
        g = x.reshape(x.shape[:-1] + self.grid_shape)
        g = jnp.einsum("...yx,xj->...yj", g, V, precision=hi)
        g = jnp.einsum("...yx,yj->...jx", g, V, precision=hi)
        return g.reshape(x.shape)

    def idst(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse sine transform: ``(2/N_x)^dim`` times the forward map."""
        return self.dst(x) * ((2.0 / self.N_x) ** self.dim)

    @functools.cached_property
    def spectrum(self) -> Tuple[Optional[np.ndarray], np.ndarray]:
        """(mass eigenvalues, stiffness eigenvalues) in the sine basis, each
        flat of length ``n`` -- or ``(None, muK)`` when the mass matrix is not
        sine-diagonalizable (2D consistent mass, whose diagonal-neighbor
        stencil term is not a tensor-product symmetric combination)."""
        j = np.arange(1, self.N_x)
        c = np.cos(np.pi * j / self.N_x)
        if self.dim == 1:
            muK = (2.0 / self.h) * (1.0 - c)
            if self.mass == "lumped":
                muM = np.full_like(muK, self.h)
            else:
                muM = (self.h / 6.0) * (4.0 + 2.0 * c)
            return (host_const(muM, self.dtype), host_const(muK, self.dtype))
        ky = 2.0 * (1.0 - c)[:, None]
        kx = 2.0 * (1.0 - c)[None, :]
        muK = (ky + kx).ravel()
        if self.mass == "lumped":
            muM = np.full_like(muK, self.h * self.h)
            return (host_const(muM, self.dtype), host_const(muK, self.dtype))
        return (None, host_const(muK, self.dtype))

    @property
    def diagonalizable(self) -> bool:
        """True when both M and K are diagonalized by the sine transform."""
        return self.spectrum[0] is not None

    @functools.cached_property
    def spectrum_tensor(self) -> np.ndarray:
        """Sine-basis spectrum of the *tensor-product part* of the mass matrix,
        flat of length ``n``.

        For sine-diagonalizable spaces this equals ``spectrum[0]`` (the exact
        mass spectrum). For the 2D consistent (Friedrichs-Keller) mass the
        exact splitting is

            M = M_t + (h^2/24) S_x (x) S_y,
            M_t = (h^2/12) (6 I + C_x + C_y + C_x C_y / 2),

        where ``C = T^+ + T^-`` (symmetric neighbor sum, sine-diagonalizable
        with eigenvalue ``2 cos(pi j / N_x)``) and ``S = T^+ - T^-`` (the
        antisymmetric difference; maps sine vectors to cosine vectors, so
        ``S_x (x) S_y`` has zero diagonal in the sine basis). ``M_t`` is
        therefore the optimal sine-diagonal surrogate of M: the best available
        spectral preconditioner for iterative inner solves on the
        non-diagonalizable 2D consistent-mass systems (the reference hides
        these solves inside MUMPS, ``Control_Wave_PC.py:480-484``)."""
        muM, _ = self.spectrum
        if muM is not None:
            return muM
        j = np.arange(1, self.N_x)
        c = np.cos(np.pi * j / self.N_x)
        h = self.h
        mt = (h * h / 12.0) * (6.0 + 2.0 * c[:, None] + 2.0 * c[None, :] + 2.0 * np.outer(c, c))
        return host_const(mt.ravel(), self.dtype)

    # --------------------------------------------------------------- dense

    def mass_dense(self) -> np.ndarray:
        """Dense interior mass matrix (test oracle / small direct solves)."""
        return self._densify(self.apply_mass)

    def stiffness_dense(self) -> np.ndarray:
        """Dense interior stiffness matrix (test oracle / small direct solves)."""
        return self._densify(self.apply_stiffness)

    def _densify(self, op) -> np.ndarray:
        eye = jnp.eye(self.n, dtype=self.dtype)
        return np.asarray(op(eye)).T


def make_space(
    dim: int,
    N_x: int,
    mass: str = "consistent",
    dtype=jnp.float64,
    dst_method: str = "auto",
    dst_precision: str = "highest",
) -> P1Space:
    return P1Space(
        dim=dim,
        N_x=N_x,
        mass=mass,
        dtype=dtype,
        dst_method=dst_method,
        dst_precision=dst_precision,
    )
