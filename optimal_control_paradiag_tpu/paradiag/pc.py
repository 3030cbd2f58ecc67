"""The ParaDiag preconditioner apply -- one jitted pure function.

Replaces ``DiagFFTPC`` (``Control_Wave_PC.py:376-558``). Two variants, both
applying the *same* operator P^{-1}, where P is the block-circulant analogue of
the all-at-once matrix (time stencils replaced by circulants):

'eig' -- mirrors the reference's 7-step apply (ref ``:491-555``):
  ifft over time -> S^{-1} 2x2 mix -> per-mode complex-shifted solves
  (Sigma_i M + dt^2/2 K) -> S mix -> divide by (Lambda_2, conj Lambda_2) ->
  fft back. The reference's Riesz map (ref ``:506``) and the mass factor in
  its RHS form (ref ``:444-457``) cancel exactly because the 2x2 mixing is
  scalar per mode (commutes with M), so neither appears here. Inner solves use
  the sine-transform spatial diagonalization instead of MUMPS LU (ref
  ``:480-484``): (Sigma M + c K)^{-1} = V diag(1/(Sigma muM_j + c muK_j)) V^{-1}.

'fulldiag' -- the TPU-native redesign: observe that the net per-mode operator
  (after folding the deferred Lambda_2 row scaling back in) is exactly

    P_k = [[ L1 M + c L2 K,        -dt^2/sqrt(g) M ],
           [ dt^2/sqrt(g) M,  conj(L1) M + c conj(L2) K ]],   c = dt^2/2,

  so after FFT(time) + DST(space) the whole system is diagonal 2x2 blocks per
  (mode k, wavenumber j), solved in closed form by Cramer's rule with

    det = |L1 muM + c L2 muK|^2 + (dt^2/sqrt(g) muM)^2 > 0,

  which is strictly positive -- robust even at modes where Lambda_2(k) ~ 0
  (N_t divisible by 4), where the reference's eig route divides by ~1e-16.
  Cost: one FFT + one MXU matmul (DST) each way + elementwise math. No sparse
  LU, no LAPACK, no scatter/gather.

Both variants produce identical results to floating-point accuracy on
sine-diagonalizable spaces (tested), hence identical outer iteration counts.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.utils.constants import host_const

from optimal_control_paradiag_tpu.krylov.cocg import cocg
from optimal_control_paradiag_tpu.ops import transforms
from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs


def build_preconditioner(
    op: AllAtOnceOperator,
    variant: str = "fulldiag",
    inner_solver: Optional[Callable] = None,
    layout=None,
    time_transform: Optional[str] = None,
    inner_tol: float = 1e-10,
    inner_maxiter: int = 50,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return a jittable ``apply(r) -> y ~= P^{-1} r`` on ``(2, N_t, n)`` states.

    ``inner_solver(sigma, rhs)``, if given, overrides the per-mode spatial
    solve of the 'eig' variant: it receives per-mode complex shifts ``sigma``
    of shape (N_t,) and right-hand sides ``(N_t, n)`` and must return the
    solutions of ``(sigma_k M + dt^2/2 K) w_k = rhs_k`` (used by the 2D
    consistent-mass path, where M is not sine-diagonalizable).

    ``layout`` (a :class:`parallel.sharding.ParallelLayout`), if given, pins
    each pipeline stage to its optimal sharding: time-local for the FFT,
    mode-local for the spatial transform/inner solves, canonical on exit --
    XLA inserts the all-to-all transposes between stages (SURVEY.md 5.7-5.8).

    ``time_transform``: 'fft' (``jnp.fft``; single-device default) or 'dft'
    (real-matmul DFT from :mod:`ops.transforms`; default when ``layout`` is
    given -- XLA's SPMD partitioning of complex128 FFTs miscompiles, and the
    matmul form shards freely and hits the MXU).
    """
    if time_transform is None:
        time_transform = "dft" if layout is not None else "fft"
    if time_transform not in ("fft", "dft"):
        raise ValueError(f"unknown time_transform {time_transform!r}")
    if layout is None:
        from optimal_control_paradiag_tpu.parallel.sharding import IdentityLayout

        layout = IdentityLayout()
    if not op.scaled:
        raise ValueError(
            "The ParaDiag preconditioner requires the sqrt(gamma)-scaled "
            "system (reference 'pc' mode, Control_Wave_PC.py:56-57)."
        )
    sp = op.space
    rdtype = sp.dtype
    cdtype = jnp.result_type(rdtype, jnp.complex64)
    e = circulant_eigs(op.N_t, op.dt, op.gamma)
    c = 0.5 * op.dt * op.dt
    if time_transform == "dft":
        Cm, Sm = transforms.dft_matrices(op.N_t, rdtype)

        def ifft_t(r):  # real input
            return transforms.time_ifft_real_mm(r, Cm, Sm)

        def ifft_t_c(r):  # complex input (eig path re-dispatch)
            return transforms.time_ifft_mm(r, Cm, Sm)

        def fft_t_real(y):  # complex input -> real(fft(y))
            return transforms.time_fft_real_part_mm(y, Cm, Sm)

    else:

        def ifft_t(r):
            return jnp.fft.ifft(r.astype(cdtype), axis=1)

        def fft_t_real(y):
            return jnp.fft.fft(y, axis=1).real
    # Materialize lazily-cached transform data eagerly: first touch must not
    # happen inside a jit trace, or the cache would hold a leaked tracer.
    # (Unstructured GeneralP1Space has no dst_matrix -- skip.)
    getattr(sp, "dst_matrix", None)
    _ = sp.spectrum

    if variant == "fulldiag":
        muM, muK = sp.spectrum
        if muM is None:
            raise ValueError(
                "fulldiag requires a sine-diagonalizable mass matrix "
                "(1D, or 2D with mass='lumped'); use variant='eig' with an "
                "iterative inner_solver for 2D consistent mass."
            )
        # All constants are built in numpy (complex128) and shipped to the
        # device once: eager complex ops are unsupported on the TPU backend
        # (only compiled complex lowers), and float64 setup keeps full
        # precision before the final cast.
        L1 = np.asarray(e.Lambda1)[:, None]
        L2 = np.asarray(e.Lambda2)[:, None]
        muM_h = np.asarray(muM, np.float64)[None, :]
        muK_h = np.asarray(muK, np.float64)[None, :]
        a11_h = L1 * muM_h + c * L2 * muK_h  # (N_t, n)
        coup_h = (op.dt * op.dt / (op.gamma**0.5)) * muM_h  # (1, n) real
        det_h = np.abs(a11_h) ** 2 + coup_h * coup_h
        # Host (numpy) constants: embedded into the compiled program by jit,
        # so no eager device op ever runs (the TPU backend rejects those).
        a11 = host_const(a11_h, cdtype)
        a22 = host_const(np.conj(a11_h), cdtype)
        coup = host_const(coup_h, rdtype)
        det = host_const(det_h, rdtype)

        def apply_fulldiag(r: jnp.ndarray) -> jnp.ndarray:
            rhat = ifft_t(layout.time_local(r))
            rt = sp.dst(layout.mode_local(rhat))
            ru, rp = rt[0], rt[1]
            yu = (a22 * ru + coup * rp) / det  # -a12 = +coup
            yp = (a11 * rp - coup * ru) / det  # a21 = +coup
            yt = sp.idst(jnp.stack([yu, yp]))
            y = fft_t_real(layout.time_local(yt))
            return layout.canonical(y.astype(rdtype))

        return apply_fulldiag

    if variant == "block":
        # Iterative non-diagonalizable path (2D consistent mass): solve the
        # coupled per-mode 2x2-block system P_k w = r directly (no S-eig
        # decoupling, hence no division by Lambda_2 -- stable for any N_t,
        # including N_t % 4 == 0 where Lambda_2(N_t/4) ~ 0). Negating the
        # p-row makes the block matrix complex SYMMETRIC:
        #   [[L1 M + c L2 K,  -theta M], [-theta M, -(conj(L1) M + c conj(L2) K)]]
        # solved by batched COCG preconditioned with the tensor-part mass
        # sine-spectral 2x2 Cramer inverse (``P1Space.spectrum_tensor``: the
        # optimal sine-diagonal surrogate -- M minus its zero-sine-diagonal
        # S_x (x) S_y remainder). Memory-free, but COCG can stall at
        # indefinite-Helmholtz resonant modes; prefer 'blockline' (exact
        # structured direct) when its factors fit.
        theta = op.dt * op.dt / (op.gamma**0.5)
        _, muK = sp.spectrum
        if muK is None:
            raise ValueError(
                "variant='block' needs a structured-grid space (sine-"
                "diagonalizable stiffness); use 'blockdense' or "
                "inner='cocg_jacobi' on unstructured meshes"
            )
        muK_h = np.asarray(muK, np.float64)[None, :]
        muMt_h = np.asarray(sp.spectrum_tensor, np.float64)[None, :]
        L1h = np.asarray(e.Lambda1)[:, None]
        L2h = np.asarray(e.Lambda2)[:, None]
        b11_h = L1h * muMt_h + c * L2h * muK_h
        pdet_h = -(np.abs(b11_h) ** 2) - (theta * muMt_h) ** 2  # real, < 0
        L1 = host_const(L1h, cdtype)
        L2 = host_const(L2h, cdtype)
        L1c = host_const(np.conj(L1h), cdtype)
        L2c_ = host_const(np.conj(L2h), cdtype)
        b11 = host_const(b11_h, cdtype)
        b11c = host_const(np.conj(b11_h), cdtype)
        bcoup = host_const(theta * muMt_h, rdtype)
        pdet = host_const(pdet_h, rdtype)

        def block_A(w):
            mu_, mp_ = sp.apply_mass(w[0]), sp.apply_mass(w[1])
            ku_, kp_ = sp.apply_stiffness(w[0]), sp.apply_stiffness(w[1])
            row_u = L1 * mu_ + c * L2 * ku_ - theta * mp_
            row_p = -theta * mu_ - (L1c * mp_ + c * L2c_ * kp_)
            return jnp.stack([row_u, row_p])

        def block_pinv(r):
            rt = sp.dst(r)
            zu = (-b11c * rt[0] + bcoup * rt[1]) / pdet
            zp = (bcoup * rt[0] + b11 * rt[1]) / pdet
            return sp.idst(jnp.stack([zu, zp]))

        def apply_block(r: jnp.ndarray) -> jnp.ndarray:
            rhat = ifft_t(layout.time_local(r))
            rhat = layout.mode_local(rhat)
            rhs = jnp.stack([rhat[0], -rhat[1]])
            w, _ = cocg(
                block_A,
                rhs,
                M=block_pinv,
                dot_axes=(0, 2),
                tol=inner_tol,
                maxiter=inner_maxiter,
            )
            y = fft_t_real(layout.time_local(w))
            return layout.canonical(y.astype(rdtype))

        return apply_block

    if variant == "blockdense":
        # The MUMPS-replacement for non-sine-diagonalizable spaces (2D
        # consistent mass): per-mode dense inverses of the coupled 2x2-block
        # systems P_k, factorized ONCE on host at setup (numpy LU; the
        # analogue of the reference's cached MUMPS factorization,
        # ``Control_Wave_PC.py:480-484``), applied as batched real einsums
        # (complex matmul split into 4 real MXU contractions). Exact for
        # every mode -- including the near-real-negative indefinite-Helmholtz
        # shifts where batched Krylov inner solves stall, and the
        # Lambda_2 ~ 0 modes (N_t % 4 == 0) where the eig mixing loses
        # digits. Memory: N_t * (2n)^2 complex entries; guarded below.
        n = sp.n
        entries = op.N_t * (2 * n) ** 2
        if entries > 3e8:
            raise ValueError(
                f"blockdense would need {entries:.1e} stored entries; use "
                "variant='eig' with an iterative inner_solver for this size"
            )
        theta = op.dt * op.dt / (op.gamma**0.5)
        M_h = np.asarray(sp.mass_dense(), np.float64)
        K_h = np.asarray(sp.stiffness_dense(), np.float64)
        W = np.empty((op.N_t, 2 * n, 2 * n), np.complex128)
        for k in range(op.N_t):
            A = np.zeros((2 * n, 2 * n), np.complex128)
            A[:n, :n] = e.Lambda1[k] * M_h + c * e.Lambda2[k] * K_h
            A[:n, n:] = -theta * M_h
            A[n:, :n] = theta * M_h
            A[n:, n:] = np.conj(e.Lambda1[k]) * M_h + c * np.conj(e.Lambda2[k]) * K_h
            W[k] = np.linalg.inv(A)
        Wr = host_const(W.real, rdtype)
        Wi = host_const(W.imag, rdtype)

        def apply_blockdense(r: jnp.ndarray) -> jnp.ndarray:
            rhat = ifft_t(layout.time_local(r))
            rhat = layout.mode_local(rhat)
            rvec = jnp.concatenate([rhat[0], rhat[1]], axis=-1)  # (N_t, 2n)
            rr, ri = rvec.real, rvec.imag
            hi = jax.lax.Precision.HIGHEST
            wr = jnp.einsum("kab,kb->ka", Wr, rr, precision=hi) - jnp.einsum(
                "kab,kb->ka", Wi, ri, precision=hi
            )
            wi = jnp.einsum("kab,kb->ka", Wr, ri, precision=hi) + jnp.einsum(
                "kab,kb->ka", Wi, rr, precision=hi
            )
            w = jax.lax.complex(wr, wi)
            yt = jnp.stack([w[:, :n], w[:, n:]])
            y = fft_t_real(layout.time_local(yt))
            return layout.canonical(y.astype(rdtype))

        return apply_blockdense

    if variant == "blockline":
        # Structured direct (block-Thomas over grid lines, half-spectrum):
        # the scalable MUMPS analogue for 2D consistent mass -- exact per-mode
        # solves at ~n1d^3 (not n1d^4) stored entries. See paradiag/blockline.py.
        from optimal_control_paradiag_tpu.paradiag.blockline import build_blockline_solver

        inner_solve = build_blockline_solver(op)

        def apply_blockline(r: jnp.ndarray) -> jnp.ndarray:
            rhat = ifft_t(layout.time_local(r))
            rhat = layout.mode_local(rhat)
            w = inner_solve(rhat)
            y = fft_t_real(layout.time_local(w))
            return layout.canonical(y.astype(rdtype))

        return apply_blockline

    if variant == "blockband":
        # Unstructured direct (RCM-banded level-Thomas, half-spectrum): the
        # scalable MUMPS analogue for GENERAL meshes -- exact per-mode solves
        # at ~(N_t/2) * 4 n m stored entries, m = RCM bandwidth. See
        # paradiag/blockband.py.
        from optimal_control_paradiag_tpu.paradiag.blockband import build_blockband_solver

        inner_solve = build_blockband_solver(op)

        def apply_blockband(r: jnp.ndarray) -> jnp.ndarray:
            rhat = ifft_t(layout.time_local(r))
            rhat = layout.mode_local(rhat)
            w = inner_solve(rhat)
            y = fft_t_real(layout.time_local(w))
            return layout.canonical(y.astype(rdtype))

        return apply_blockband

    if variant != "eig":
        raise ValueError(f"unknown variant {variant!r}")

    # Reshapes/conjugations happen in numpy: eager complex ops are
    # unsupported on the TPU backend (only compiled complex lowers).
    S1 = host_const(np.asarray(e.S1)[:, None], cdtype)
    S2 = host_const(np.asarray(e.S2)[:, None], cdtype)
    Sig1 = host_const(np.asarray(e.Sigma1)[:, None], cdtype)
    Sig2 = host_const(np.asarray(e.Sigma2)[:, None], cdtype)
    L2 = host_const(np.asarray(e.Lambda2)[:, None], cdtype)
    L2c = host_const(np.conj(e.Lambda2)[:, None], cdtype)

    if inner_solver is None:
        muM, muK = sp.spectrum
        if muM is None:
            raise ValueError(
                "2D consistent mass needs an iterative inner_solver "
                "(see paradiag.inner.make_cocg_inner_solver)."
            )
        muM = host_const(np.asarray(muM)[None, :], rdtype)
        muK = host_const(np.asarray(muK)[None, :], rdtype)

        def inner_solver(sigma, rhs):
            return sp.idst(sp.dst(rhs) / (sigma * muM + c * muK))

    def apply_eig(r: jnp.ndarray) -> jnp.ndarray:
        rhat = ifft_t(layout.time_local(r))
        rhat = layout.mode_local(rhat)
        ru, rp = rhat[0], rhat[1]
        # S^{-1} mix (det S = 2; ref :444-457 folded the mass in, which
        # cancels against the Riesz map at ref :506).
        wu = 0.5 * (ru - S2 * rp)
        wp = 0.5 * (rp - S1 * ru)
        # Per-mode complex-shifted solves (ref :459-473, :512).
        wu = inner_solver(Sig1, wu)
        wp = inner_solver(Sig2, wp)
        # S mix (ref :515-529).
        yu = wu + S2 * wp
        yp = S1 * wu + wp
        # Deferred row scaling (ref :531-540).
        yu = yu / L2
        yp = yp / L2c
        y = fft_t_real(layout.time_local(jnp.stack([yu, yp])))
        return layout.canonical(y.astype(rdtype))

    return apply_eig
