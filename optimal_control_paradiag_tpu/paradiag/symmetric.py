"""Symmetrized ParaDiag: MINRES on the block-row-swapped system.

The scaled all-at-once system has KKT structure: swapping the (u-rows,
p-rows) block order makes the matrix EXACTLY real symmetric (indefinite) --
``A_sym = [[theta M + ..., A_t^T], [A_t, -theta M + ...]]``, verified to
0.0 against the dense operator in ``tests/test_symmetric.py``. This is the
sine-transform/absolute-value-circulant MINRES family the ParaDiag
literature recommends for wave problems (PAPERS.md; the reference never
implements it -- its ``applyTranspose`` is ``NotImplementedError``,
``Control_Wave_PC.py:557-558``).

The natural SPD preconditioner falls out of the diagonalization: in
ParaDiag-diagonalized coordinates the swapped circulant part is, per
(mode k, wavenumber j), the 2x2 Hermitian matrix

    [[ t,        conj(a11)],          t = theta * muM_j,
     [ a11,     -t        ]]          a11 = Lambda_1 muM + c Lambda_2 muK,

which is traceless with determinant ``-(t^2 + |a11|^2)``: its eigenvalues
are EXACTLY ``+/- sqrt(t^2 + |a11|^2) = +/- sqrt(det)``. So the matrix
absolute value -- the textbook SPD preconditioner for MINRES on a symmetric
indefinite system -- is the SCALAR ``sqrt(det_kj) I_2``:

    P_spd^{-1} = T^{-1} diag(1 / sqrt(det_kj)) T       (T = DST o ifft_time)

applied identically to both components; real-to-real because ``det`` is
symmetric under k -> N_t - k. The preconditioned circulant spectrum is
exactly {+1, -1}, and the boundary correction is rank 4 (paradiag/spectral.py),
so by Cauchy interlacing at most 8 eigenvalues leave the two clusters:
exact-arithmetic MINRES terminates in <= ~10 iterations. Observed at rtol
1e-10: 10 (N_x=N_t=20) growing mildly to 32 (N=160) -- the outliers sit
near zero (O(dt^2)), and finite-precision Lanczos spends extra steps
resolving them; still far below the O(N) of the unpreconditioned system.

Runs on every space: for sine-diagonalizable ones (1D, 2D lumped) the SPD
preconditioner is exact-|circulant|; for 2D consistent mass it uses the
lumped-mass surrogate spectrum (see build_symmetric_system). Float32 note:
this path iterates in PHYSICAL coordinates, so the float32 time-stencil
cancellation wall applies (see paradiag/spectral.py); use float64, or the
Woodbury/spectral-GMRES paths on TPU float32.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.spectral import _make_ops, _spectral_plan
from optimal_control_paradiag_tpu.utils.constants import host_const


def _swap(x: jnp.ndarray) -> jnp.ndarray:
    """Flip the (u, p) block rows: the symmetrizing row permutation."""
    return jnp.stack([x[1], x[0]])


def build_symmetric_system(
    op: AllAtOnceOperator, *, layout=None, time_transform: str = None
) -> Tuple[Callable, Callable, Callable]:
    """Returns ``(matvec_sym, pc_spd, swap_rhs)`` for MINRES:

    - ``matvec_sym(x) = swap(A x)`` -- exactly symmetric;
    - ``pc_spd`` -- the scalar absolute-value-circulant SPD preconditioner
      ``T^{-1} det^{-1/2} T`` (module docstring);
    - ``swap_rhs(b) = swap(b)`` -- the matching RHS permutation.

    Solve ``matvec_sym(x) = swap_rhs(b)``; the solution ``x`` is in the
    original (unswapped) unknown order.
    """
    if time_transform is None:
        time_transform = "dft" if layout is not None else "fft"
    # 2D consistent mass: the swap symmetry and the matvec are exact; only
    # the SPD preconditioner uses the lumped-mass surrogate spectrum
    # (spectrally equivalent, M_lump/3 <= M_cons <= M_lump). Measured: the
    # smeared clusters cost 72-112 iterations at rtol 1e-8 for N = 8..16,
    # growing with N -- a working fallback, but the blockdense-PC GMRES
    # path (~54-66 iterations, shrinking) remains the recommended
    # 2D-consistent solver.
    pl = _spectral_plan(op, mass_surrogate=True)
    _, _, to_s, from_s = _make_ops(op, pl, layout=layout, time_transform=time_transform)
    inv_sqrt_det = host_const(1.0 / np.sqrt(pl.det_h), pl.rdtype)

    def matvec_sym(x: jnp.ndarray) -> jnp.ndarray:
        return _swap(op.matvec(x))

    def pc_spd(r: jnp.ndarray) -> jnp.ndarray:
        return from_s(to_s(r) * inv_sqrt_det)

    return matvec_sym, pc_spd, _swap
