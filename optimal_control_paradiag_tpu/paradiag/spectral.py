"""Spectral-space solvers: GMRES in the ParaDiag-diagonalized coordinates,
and the rank-4 Woodbury DIRECT solve.

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
float32-stable. Two solvers share this structure:

1. **Spectral GMRES** (:func:`build_spectral_system` + outer GMRES):
   D^{-1} (the fulldiag Cramer) is the natural left preconditioner, also
   elementwise; GMRES on (D + B_hat) xi = b_hat, then one inverse transform.

2. **Woodbury direct solve** (:func:`build_woodbury_solver`): per wavenumber
   j the correction B_hat is a RANK-4 update -- it injects into 4 fixed time
   rows and reads 4 fixed time slices:

     A_hat_j = D_j + Psi C_j Phi*          (Psi: C^4 -> C^{2 N_t} injection,
                                            Phi*: C^{2 N_t} -> C^4 extraction,
                                            C_j: real 4x4 coefficients)

   so by the Sherman-Morrison-Woodbury identity

     A_hat_j^{-1} = D_j^{-1} - D_j^{-1} Psi (I_4 + C_j W_j)^{-1} C_j Phi* D_j^{-1},
     W_j = Phi* D_j^{-1} Psi  (4x4, precomputed in float64 on host).

   The capacity matrices G_j = (I + C_j W_j)^{-1} C_j are exact host
   constants; the device apply is two D^{-1} passes, 4 phase-sum slice
   extractions, an unrolled 4x4 mix, and 4 rank-1 injections. The whole
   all-at-once solve becomes DIRECT: two transforms + O(1) elementwise
   passes -- no Krylov iteration at all. Optional iterative-refinement
   steps (one exact A_hat apply + one Woodbury apply each) recover the
   float64 answer to working precision in float32.

Valid for sine-diagonalizable spaces (1D any mass, 2D lumped). The reference
reaches the same algebra through MUMPS LU inside a PETSc GMRES
(``Control_Wave_PC.py:346-359, 480-484``); it has no direct all-at-once path
short of factorizing the full 2 N_t N_x matrix (``:186``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


@dataclasses.dataclass(frozen=True)
class _SpectralPlan:
    """Host-side constants of the diagonalized system (all numpy; float64
    originals kept alongside the working-dtype casts)."""

    N_t: int
    n: int
    rdtype: object
    cdtype: object
    np_c: np.dtype
    c: float  # dt^2 / 2
    theta: float  # dt^2 / sqrt(gamma)
    # float64 originals (Woodbury capacity math):
    a11_h: np.ndarray  # (N_t, n) complex128
    det_h: np.ndarray  # (N_t, n) float64
    muM64: np.ndarray  # (n,)
    muK64: np.ndarray  # (n,)
    # working-dtype casts (device constants). The (N_t, n) per-mode fields
    # a11/a22/det are NOT stored: they are separable outer products of the
    # 1D factors below, built on device by :meth:`mode_diag` -- XLA fuses
    # the broadcasts into every consumer, so they cost no HBM reads, and the
    # compiled program avoids embedding O(N_t*n) constants (at the 2D bench
    # size those were ~400 MB of program -- over the compile-RPC body cap).
    L1c: np.ndarray  # Lambda1(k), (N_t,) complex working dtype
    L2c: np.ndarray  # Lambda2(k), (N_t,) complex
    m1: np.ndarray  # muM, (n,)
    kap1: np.ndarray  # c * muK, (n,)
    tm1: np.ndarray  # theta * muM, (n,)
    mk1: np.ndarray  # muM + c muK, (n,)
    # slice-extraction phases phi_i[k] = exp(-2 pi i i k / N): x_i = sum_k phi x_k
    phi_uNm1: np.ndarray
    phi_uNm2: np.ndarray
    phi_p0: np.ndarray
    phi_p1: np.ndarray
    # injection phases psi_i[k] = exp(+2 pi i i k / N) / N (ifft rows)
    psi_u0: np.ndarray
    psi_u1: np.ndarray
    psi_pNm1: np.ndarray
    psi_pNm2: np.ndarray

    def mode_diag(self, K: Optional[int] = None):
        """Device-side per-mode diagonal ``(a11, a22, tm, inv_det)`` of the
        circulant block system, each broadcastable to ``(K or N_t, n)``,
        computed inside the traced program from the 1D factors:

            a11 = Lambda1 (x) muM + Lambda2 (x) (c muK),   a22 = conj(a11),
            tm  = theta * muM,   det = |a11|^2 + tm^2.

        Precision note: a11/inv_det are formed in WORKING precision from the
        already-rounded 1D factors, so they differ from the float64-computed
        -then-cast constants (``a11_h``/``det_h``, still used by the host-side
        Woodbury capacity math) by a few extra working-dtype ulps; the
        refine/polish defect-correction ladder absorbs the difference
        (tests pass at the same gates)."""
        L1 = jnp.asarray(self.L1c)[:K] if K is not None else jnp.asarray(self.L1c)
        L2 = jnp.asarray(self.L2c)[:K] if K is not None else jnp.asarray(self.L2c)
        a11 = L1[:, None] * self.m1[None, :] + L2[:, None] * self.kap1[None, :]
        a22 = jnp.conj(a11)
        tm = self.tm1[None, :]
        inv_det = 1.0 / (jnp.square(a11.real) + jnp.square(a11.imag) + jnp.square(tm))
        return a11, a22, tm, inv_det


def _spectral_plan(op: AllAtOnceOperator, mass_surrogate: bool = False) -> _SpectralPlan:
    """``mass_surrogate=True``: for non-sine-diagonalizable spaces (2D
    consistent mass), substitute the tensor-part mass eigenvalues
    (``P1Space.spectrum_tensor``) -- the resulting plan describes an
    APPROXIMATION of the operator, valid only for preconditioner
    construction (paradiag/symmetric.py), never for the exact
    spectral/Woodbury solves."""
    sp = op.space
    if not sp.diagonalizable and not mass_surrogate:
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
    muM_raw, muK = sp.spectrum
    if muM_raw is None:
        # Tensor-part mass surrogate: the optimal sine-diagonal approximation
        # of the 2D consistent mass (M minus its zero-sine-diagonal
        # S_x (x) S_y remainder; see P1Space.spectrum_tensor) -- much tighter
        # than the lumped h^2 I surrogate used before.
        muM_raw = np.asarray(sp.spectrum_tensor, np.float64)
    muM, muK = np.asarray(muM_raw, np.float64), np.asarray(muK, np.float64)
    L1 = np.asarray(e.Lambda1)[:, None]
    L2 = np.asarray(e.Lambda2)[:, None]
    a11_h = L1 * muM[None, :] + c * L2 * muK[None, :]  # (N_t, n)
    det_h = np.abs(a11_h) ** 2 + (theta * muM[None, :]) ** 2

    k = np.arange(N_t)
    phi = lambda i: host_const(np.exp(-2j * np.pi * i * k / N_t), np_c)
    psi = lambda i: host_const(np.exp(2j * np.pi * i * k / N_t) / N_t, np_c)

    return _SpectralPlan(
        N_t=N_t,
        n=n,
        rdtype=rdtype,
        cdtype=cdtype,
        np_c=np_c,
        c=c,
        theta=theta,
        a11_h=a11_h,
        det_h=det_h,
        muM64=muM,
        muK64=muK,
        L1c=host_const(np.asarray(e.Lambda1), np_c),
        L2c=host_const(np.asarray(e.Lambda2), np_c),
        # O(n) per-space factors ship as DEVICE arrays (compiled-executable
        # parameters): as embedded numpy constants XLA constant-folds the
        # (N_t, n) mode_diag products they feed at COMPILE time with the
        # slow HLO evaluator -- measured on the axon relay at n=20449 the
        # compile helper grinds >10 min and dies (r4 wall-stage bisect);
        # as parameters the same program compiles in ~2 min. (Same policy
        # as blockband's factor tensors and the Pallas kernels' columns.)
        m1=to_device(muM, rdtype),
        kap1=to_device(c * muK, rdtype),
        tm1=to_device(theta * muM, rdtype),
        mk1=to_device(muM + c * muK, rdtype),
        phi_uNm1=phi(N_t - 1),
        phi_uNm2=phi(N_t - 2),
        phi_p0=phi(0),
        phi_p1=phi(1),
        psi_u0=psi(0),
        psi_u1=psi(1),
        psi_pNm1=psi(N_t - 1),
        psi_pNm2=psi(N_t - 2),
    )


def _make_ops(op: AllAtOnceOperator, pl: _SpectralPlan, layout=None, time_transform="fft"):
    """(A_hat, D_inv, to_spectral, from_spectral) from a prepared plan.

    ``layout`` (a :class:`parallel.sharding.ParallelLayout`), if given, pins
    each transform stage's sharding (time-local for the time transform,
    mode-local for the spatial DST and the elementwise solve); XLA inserts
    the all-to-alls. Sharded runs must use ``time_transform='dft'`` (real
    MXU matmuls -- XLA's SPMD partitioning of complex FFTs miscompiles)."""
    sp = op.space
    cdtype, rdtype = pl.cdtype, pl.rdtype
    if layout is None:
        from optimal_control_paradiag_tpu.parallel.sharding import IdentityLayout

        layout = IdentityLayout()
    lay = layout
    if time_transform == "dft":
        from optimal_control_paradiag_tpu.ops.transforms import (
            dft_matrices,
            time_fft_real_part_mm,
            time_ifft_real_mm,
        )

        C_t, S_t = dft_matrices(pl.N_t, rdtype)
    m1, kap1, tm1, mk1 = pl.m1, pl.kap1, pl.tm1, pl.mk1

    def A_hat(xi: jnp.ndarray) -> jnp.ndarray:
        """(D + B_hat) xi on spectral states (2, N_t, n) complex."""
        # mode_diag is evaluated inside the trace: the (N_t, n) per-mode
        # diagonals stay fused outer products of 1D constants, never
        # program-embedded or HBM-materialized.
        a11, a22, tm, _ = pl.mode_diag()
        xu, xp = xi[0], xi[1]
        du = a11 * xu - tm * xp
        dp = tm * xu + a22 * xp

        # Extract the four boundary time slices (each (n,) complex).
        uNm1 = jnp.sum(pl.phi_uNm1[:, None] * xu, axis=0)
        uNm2 = jnp.sum(pl.phi_uNm2[:, None] * xu, axis=0)
        p0 = jnp.sum(pl.phi_p0[:, None] * xp, axis=0)
        p1 = jnp.sum(pl.phi_p1[:, None] * xp, axis=0)

        # B rows (SURVEY 0.2 boundary cases minus the circulant rows).
        out_u0 = m1 * (2.0 * uNm1 - uNm2) - kap1 * uNm2 + 0.5 * tm1 * p0
        out_u1 = -mk1 * uNm1
        out_pN1 = m1 * (2.0 * p0 - p1) - kap1 * p1 - 0.5 * tm1 * uNm1
        out_pN2 = -mk1 * p0

        du = du + pl.psi_u0[:, None] * out_u0[None, :] + pl.psi_u1[:, None] * out_u1[None, :]
        dp = dp + pl.psi_pNm1[:, None] * out_pN1[None, :] + pl.psi_pNm2[:, None] * out_pN2[None, :]
        return jnp.stack([du, dp])

    def D_inv(r: jnp.ndarray) -> jnp.ndarray:
        a11, a22, tm, inv_det = pl.mode_diag()
        ru, rp = r[0], r[1]
        yu = (a22 * ru + tm * rp) * inv_det
        yp = (a11 * rp - tm * ru) * inv_det
        return jnp.stack([yu, yp])

    def to_spectral(x: jnp.ndarray) -> jnp.ndarray:
        x = lay.time_local(x)
        if time_transform == "dft":
            xh = time_ifft_real_mm(x.astype(rdtype), C_t, S_t)
        else:
            xh = jnp.fft.ifft(x.astype(cdtype), axis=1)
        return sp.dst(lay.mode_local(xh))

    def from_spectral(xi: jnp.ndarray) -> jnp.ndarray:
        y = lay.time_local(sp.idst(lay.mode_local(xi)))
        if time_transform == "dft":
            out = time_fft_real_part_mm(y, C_t, S_t)
        else:
            out = jnp.fft.fft(y, axis=1).real
        return lay.canonical(out.astype(rdtype))

    return A_hat, D_inv, to_spectral, from_spectral


def build_spectral_system(op: AllAtOnceOperator):
    """Returns (A_hat, D_inv, to_spectral, from_spectral) for the scaled
    all-at-once system in ParaDiag-diagonalized coordinates."""
    return _make_ops(op, _spectral_plan(op))


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


# --------------------------------------------------------------------------
# Woodbury direct solve
# --------------------------------------------------------------------------


def _capacity_matrices(pl: _SpectralPlan) -> np.ndarray:
    """G_j = (I_4 + C_j W_j)^{-1} C_j per wavenumber j, complex128 host.

    Ordering of the rank-4 factors (matching :func:`_make_ops`'s A_hat):
      extraction rows a (Phi*): 0 = u slice N-1, 1 = u slice N-2,
                                2 = p slice 0,   3 = p slice 1;
      injection cols  b (Psi):  0 = u row 0,     1 = u row 1,
                                2 = p row N-1,   3 = p row N-2.
    """
    C, W = _capacity_CW(pl)
    I4 = np.eye(4)[None]
    return np.linalg.solve(I4 + C @ W, C.astype(np.complex128))


def _capacity_CW(pl: _SpectralPlan):
    """Per-wavenumber capacity ingredients: C_j (the real 4x4 boundary-row
    coefficients) and W_j = Phi* D_j^{-1} Psi (the slice-of-inverse 4x4) --
    shared between the exact Woodbury of diagonalizable spaces and the
    tensor-surrogate capacity preconditioner of the 2D-consistent direct
    solve (paradiag/woodbury2d.py)."""
    N_t, n = pl.N_t, pl.n
    k = np.arange(N_t)
    phiE = lambda i: np.exp(-2j * np.pi * i * k / N_t)  # extraction
    psiI = lambda i: np.exp(2j * np.pi * i * k / N_t) / N_t  # injection

    # D^{-1} component blocks, float64/complex128, (N_t, n).
    tm64 = pl.theta * pl.muM64[None, :]
    iuu = np.conj(pl.a11_h) / pl.det_h
    iup = tm64 / pl.det_h + 0j
    ipu = -tm64 / pl.det_h + 0j
    ipp = pl.a11_h / pl.det_h
    E = {("u", "u"): iuu, ("u", "p"): iup, ("p", "u"): ipu, ("p", "p"): ipp}

    rows = [("u", phiE(N_t - 1)), ("u", phiE(N_t - 2)), ("p", phiE(0)), ("p", phiE(1))]
    cols = [("u", psiI(0)), ("u", psiI(1)), ("p", psiI(N_t - 1)), ("p", psiI(N_t - 2))]

    W = np.zeros((n, 4, 4), np.complex128)
    for a, (ca, pa) in enumerate(rows):
        for b, (cb, pb) in enumerate(cols):
            W[:, a, b] = np.einsum("k,kn,k->n", pa, E[(ca, cb)], pb)

    # C_j: outputs (u0, u1, pN-1, pN-2) from inputs (uN-1, uN-2, p0, p1).
    m = pl.muM64
    kap = pl.c * pl.muK64
    t2 = pl.theta * pl.muM64
    C = np.zeros((n, 4, 4), np.float64)
    C[:, 0, 0] = 2.0 * m
    C[:, 0, 1] = -(m + kap)
    C[:, 0, 2] = 0.5 * t2
    C[:, 1, 0] = -(m + kap)
    C[:, 2, 0] = -0.5 * t2
    C[:, 2, 2] = 2.0 * m
    C[:, 2, 3] = -(m + kap)
    C[:, 3, 2] = -(m + kap)
    return C, W


def make_halfspectrum_transforms(
    space,
    N_t: int,
    rdtype,
    layout=None,
    time_transform: str = "fft",
) -> Tuple[Callable, Callable]:
    """``(to_spectral, from_spectral)`` for the half-spectrum pipeline shared
    by every model family (wave Woodbury here; the heat family imports it):

        xi = conj(rfft(dst(x), axis=1)) / N_t        (2, K, n) complex
        x  = idst(irfft(conj(xi)) * N_t)             (2, N_t, n) real

    ``time_transform='dft'`` expresses the rfft/irfft as split-real MXU
    matmuls with the Hermitian pairing weights folded into the inverse
    matrices -- REQUIRED under a :class:`parallel.sharding.ParallelLayout`
    (XLA's SPMD partitioning of complex FFTs miscompiles), where each
    einsum's output is pinned to its stage layout so the transitions lower
    to explicit all-to-alls instead of full-state replication.

    ``time_transform='mxu'`` (single-device): the four-step Cooley-Tukey
    factorization of the same rfft/irfft as TWO radix-~sqrt(N_t) MXU
    matmul stages with a twiddle multiply between
    (``ops.transforms.FourStepPlan``) -- O(N_t^1.5 n) flops instead of the
    dft variant's O(N_t^2 n), and bandwidth-bound streaming instead of
    jnp.fft's ~60 GB/s VPU path (the r4 breakdown's 1.10 ms roundtrip)."""
    sp = space
    K = N_t // 2 + 1
    if layout is None:
        from optimal_control_paradiag_tpu.parallel.sharding import IdentityLayout

        layout = IdentityLayout()
    elif time_transform != "dft":
        raise ValueError("sharded half-spectrum transforms require time_transform='dft'")
    lay = layout

    if time_transform == "dft":
        k = np.arange(K)
        wgt = np.full(K, 2.0)
        wgt[0] = 1.0
        if N_t % 2 == 0:
            wgt[K - 1] = 1.0
        t_idx = np.arange(N_t)
        ang = 2.0 * np.pi * np.outer(k, t_idx) / N_t
        Cf = host_const(np.cos(ang) / N_t, rdtype)
        Sf = host_const(np.sin(ang) / N_t, rdtype)
        Ci = host_const((wgt[None, :] * np.cos(ang).T), rdtype)
        Si = host_const((wgt[None, :] * np.sin(ang).T), rdtype)
        _hi = jax.lax.Precision.HIGHEST

        def to_spectral(x):
            # DST with the time axis sharded (space contraction is local);
            # then time-local for the K x N_t transform matmuls; then
            # bin-sharded for the elementwise solve. Each einsum's OUTPUT is
            # pinned to the layout its contraction keeps local, so the
            # stage transitions lower to explicit reshard collectives
            # (all-to-alls) -- without the output pins GSPMD's propagation
            # replicates the full state through the dots instead.
            s = lay.mode_local(sp.dst(lay.mode_local(x)))
            s = lay.time_local(s)
            re = jnp.einsum("kt,ctn->ckn", Cf, s, precision=_hi)
            im = jnp.einsum("kt,ctn->ckn", Sf, s, precision=_hi)
            xi = lay.time_local(jax.lax.complex(re, im))
            return lay.mode_local(xi)

        def from_spectral(xi):
            xi = lay.time_local(xi)  # K local per shard for the k-contraction
            t = jnp.einsum("tk,ckn->ctn", Ci, xi.real, precision=_hi) + jnp.einsum(
                "tk,ckn->ctn", Si, xi.imag, precision=_hi
            )
            t = lay.time_local(t)
            out = lay.mode_local(sp.idst(lay.mode_local(t)).astype(rdtype))
            return lay.canonical(out)

    elif time_transform == "mxu":
        from optimal_control_paradiag_tpu.ops.transforms import (
            FourStepPlan,
            time_irfft_conj_mm4,
            time_rfft_conj_mm4,
        )

        try:
            plan4 = FourStepPlan(N_t, rdtype)
        except ValueError:
            # prime N_t has no radix split: the rfft path is the fallback
            return make_halfspectrum_transforms(
                sp, N_t, rdtype, layout=None, time_transform="fft"
            )

        def to_spectral(x):
            return time_rfft_conj_mm4(sp.dst(x), plan4)

        def from_spectral(xi):
            return sp.idst(time_irfft_conj_mm4(xi, plan4)).astype(rdtype)

    elif time_transform == "fft2":
        # packed two-for-one: one complex FFT of z = u + i p instead of two
        # real rffts (ops.transforms.time_rfft_conj_packed)
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
            s = sp.dst(x)  # real fast path; commutes with the time transform
            return jnp.conj(jnp.fft.rfft(s, axis=1)) * (1.0 / N_t)

        def from_spectral(xi):
            t = jnp.fft.irfft(jnp.conj(xi), n=N_t, axis=1) * float(N_t)
            return sp.idst(t).astype(rdtype)

    return to_spectral, from_spectral


def _build_woodbury_half(
    op: AllAtOnceOperator,
    pl: _SpectralPlan,
    refine: int,
    time_transform: str = "fft",
    layout=None,
):
    """Half-spectrum Woodbury solve: the physical state is real, so its time
    spectrum is Hermitian (``x_hat[N_t-k] = conj(x_hat[k])``) and every
    per-mode constant pairs conjugately across ``k <-> N_t - k``. Operating
    only on the ``K = N_t//2 + 1`` rfft bins halves the transform and
    elementwise work:

    - time transforms become ``rfft`` / ``irfft`` (the spatial DST commutes
      with the time transform, so it runs FIRST, on the real state, taking
      the real-DST fast path);
    - the 4 boundary-slice extractions use the pairing: the slices are REAL
      time-domain values, ``z = sum_k wgt_k Re(phi_k y_k)`` with weight 2 on
      paired bins and 1 on the self-conjugate ones (k=0, and N_t/2 if even);
    - the 4x4 capacity matrices are REAL by the same pairing (asserted at
      setup to 1e-10), so the mixed row values stay real and the injections
      preserve Hermitian symmetry bin-by-bin.

    ``layout`` (a :class:`parallel.sharding.ParallelLayout`): multi-chip
    sharded HALF-SPECTRUM solve (VERDICT r2 item 9 -- restores the 2x
    half-spectrum saving the sharded path used to forfeit). Requires the
    DFT-matmul time transform (XLA's SPMD partitioning of FFTs
    miscompiles). Stage shardings: the spatial DST runs with the time/bin
    axis sharded (space contraction local per shard); the time-transform
    matmuls run time-local (space sharded); the elementwise Woodbury work
    runs bin-sharded. The rfft pairing weights are per-bin constants that
    slice cleanly under the bin-sharded layout, and the 4 boundary-slice
    extractions become cross-shard phase-sum reductions (XLA inserts the
    psums). ``K = N_t//2 + 1`` bins shard unevenly; GSPMD pads inside the
    compiled program.
    """
    sp = op.space
    N_t, n = pl.N_t, pl.n
    K = N_t // 2 + 1
    rdtype, np_c = pl.rdtype, pl.np_c
    to_spectral, from_spectral = make_halfspectrum_transforms(
        sp, N_t, rdtype, layout=layout, time_transform=time_transform
    )

    # O(n) constants as device parameters (see _spectral_plan note).
    m1 = to_device(pl.muM64, rdtype)
    kap1 = to_device(pl.c * pl.muK64, rdtype)
    tm1 = to_device(pl.theta * pl.muM64, rdtype)
    mk1 = to_device(pl.muM64 + pl.c * pl.muK64, rdtype)

    k = np.arange(K)
    wgt = np.full(K, 2.0)
    wgt[0] = 1.0
    if N_t % 2 == 0:
        wgt[K - 1] = 1.0
    # Extraction phases carry the pairing weight; injections use plain bins.
    phiw = lambda i: host_const(wgt * np.exp(-2j * np.pi * i * k / N_t), np_c)
    psi = lambda i: host_const(np.exp(2j * np.pi * i * k / N_t) / N_t, np_c)
    phi_uNm1, phi_uNm2, phi_p0, phi_p1 = (phiw(i) for i in (N_t - 1, N_t - 2, 0, 1))
    psi_u0, psi_u1, psi_pNm1, psi_pNm2 = (psi(i) for i in (0, 1, N_t - 1, N_t - 2))

    G_h = _capacity_matrices(pl)
    assert float(np.abs(G_h.imag).max()) < 1e-10 * max(float(np.abs(G_h.real).max()), 1.0)
    G = [[to_device(G_h[:, a, b].real, rdtype) for b in range(4)] for a in range(4)]

    def D_inv(r):
        a11, a22, tm, inv_det = pl.mode_diag(K)  # traced outer products
        ru, rp = r[0], r[1]
        yu = (a22 * ru + tm * rp) * inv_det
        yp = (a11 * rp - tm * ru) * inv_det
        return jnp.stack([yu, yp])

    def extract(yu, yp):
        return (
            jnp.sum(phi_uNm1[:, None] * yu, axis=0).real,
            jnp.sum(phi_uNm2[:, None] * yu, axis=0).real,
            jnp.sum(phi_p0[:, None] * yp, axis=0).real,
            jnp.sum(phi_p1[:, None] * yp, axis=0).real,
        )

    def A_hat(xi):
        a11, a22, tm, _ = pl.mode_diag(K)
        xu, xp = xi[0], xi[1]
        du = a11 * xu - tm * xp
        dp = tm * xu + a22 * xp
        uNm1, uNm2, p0, p1 = extract(xu, xp)
        out_u0 = m1 * (2.0 * uNm1 - uNm2) - kap1 * uNm2 + 0.5 * tm1 * p0
        out_u1 = -mk1 * uNm1
        out_pN1 = m1 * (2.0 * p0 - p1) - kap1 * p1 - 0.5 * tm1 * uNm1
        out_pN2 = -mk1 * p0
        du = du + psi_u0[:, None] * out_u0[None, :] + psi_u1[:, None] * out_u1[None, :]
        dp = dp + psi_pNm1[:, None] * out_pN1[None, :] + psi_pNm2[:, None] * out_pN2[None, :]
        return jnp.stack([du, dp])

    def wb_apply(r):
        y = D_inv(r)
        z = extract(y[0], y[1])
        w = [sum(G[a][b] * z[b] for b in range(4)) for a in range(4)]
        corr_u = psi_u0[:, None] * w[0][None, :] + psi_u1[:, None] * w[1][None, :]
        corr_p = psi_pNm1[:, None] * w[2][None, :] + psi_pNm2[:, None] * w[3][None, :]
        return y - D_inv(jnp.stack([corr_u, corr_p]))

    def solve(b):
        b_hat = to_spectral(b)
        x = wb_apply(b_hat)
        for _ in range(refine):
            x = x + wb_apply(b_hat - A_hat(x))
        return from_spectral(x)

    return solve


def build_woodbury_solver(
    op: AllAtOnceOperator,
    *,
    refine: int = 1,
    layout=None,
    time_transform: Optional[str] = None,
    half_spectrum: Optional[bool] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Direct all-at-once solver ``b -> x`` via the rank-4 Woodbury identity
    in ParaDiag-diagonalized coordinates (module docstring). Exact in float64;
    each ``refine`` step (defect correction: r = b_hat - A_hat x, x += solve r)
    polishes float32 rounding at the cost of one A_hat + one Woodbury apply.
    Jit-wrap (or pass through ``SolverConfig(method='woodbury')``) for
    repeated use.

    With ``layout`` (a :class:`parallel.sharding.ParallelLayout`): multi-chip
    sharded direct solve -- transforms in their stage layouts, elementwise
    solve mode-local, the 4 slice extractions as cross-shard phase-sum
    reductions. Defaults to the DFT-matmul time transform when sharded.

    ``half_spectrum`` (default: on): exploit the Hermitian time spectrum of
    the real state to run transforms and elementwise work on the
    ``N_t//2 + 1`` rfft bins only -- ~2x less transform/elementwise work,
    machine-precision-equivalent answers (measured: <= 7e-6 relative in
    float32, tests/test_float32.py; see :func:`_build_woodbury_half`).
    Works sharded too (with ``layout``; requires the default DFT-matmul
    transform there), so the multi-chip direct solve keeps the 2x saving."""
    if time_transform is None:
        # unsharded default: the packed two-for-one FFT (exactly equivalent
        # to the two-rfft form -- tests/test_woodbury.py -- and measured
        # faster on v5e: 2.413 vs 2.670 ms jnp path, 2.16 vs 2.336 ms
        # through the pallas kernel); sharded runs need the DFT matmuls.
        time_transform = "dft" if layout is not None else "fft2"
    if time_transform not in ("fft", "dft", "mxu", "fft2"):
        raise ValueError(f"unknown time_transform {time_transform!r}")
    if time_transform == "mxu" and layout is not None:
        raise ValueError("time_transform='mxu' is the single-device fast path; "
                         "sharded runs use 'dft'")
    if half_spectrum is None:
        half_spectrum = True
    pl = _spectral_plan(op)
    if half_spectrum:
        return _build_woodbury_half(
            op, pl, refine, time_transform=time_transform, layout=layout
        )
    if time_transform == "mxu":
        raise ValueError("time_transform='mxu' is implemented for the "
                         "half-spectrum pipeline (the default)")
    A_hat, D_inv, to_spectral, from_spectral = _make_ops(
        op, pl, layout=layout, time_transform=time_transform
    )
    G_h = _capacity_matrices(pl)
    # Unrolled 4x4 mix entries as separate (n,) device constants: complex
    # dot_general does not lower on the TPU backend, broadcasts do.
    G = [[to_device(G_h[:, a, b], pl.np_c) for b in range(4)] for a in range(4)]

    def wb_apply(r_hat: jnp.ndarray) -> jnp.ndarray:
        y = D_inv(r_hat)
        yu, yp = y[0], y[1]
        z = (
            jnp.sum(pl.phi_uNm1[:, None] * yu, axis=0),
            jnp.sum(pl.phi_uNm2[:, None] * yu, axis=0),
            jnp.sum(pl.phi_p0[:, None] * yp, axis=0),
            jnp.sum(pl.phi_p1[:, None] * yp, axis=0),
        )
        w = [sum(G[a][b] * z[b] for b in range(4)) for a in range(4)]
        corr_u = pl.psi_u0[:, None] * w[0][None, :] + pl.psi_u1[:, None] * w[1][None, :]
        corr_p = pl.psi_pNm1[:, None] * w[2][None, :] + pl.psi_pNm2[:, None] * w[3][None, :]
        return y - D_inv(jnp.stack([corr_u, corr_p]))

    def solve(b: jnp.ndarray) -> jnp.ndarray:
        b_hat = to_spectral(b)
        x = wb_apply(b_hat)
        for _ in range(refine):
            x = x + wb_apply(b_hat - A_hat(x))
        return from_spectral(x)

    return solve


def solve_woodbury(op: AllAtOnceOperator, b: jnp.ndarray, *, refine: int = 1) -> jnp.ndarray:
    """One-shot direct solve (see :func:`build_woodbury_solver`)."""
    return build_woodbury_solver(op, refine=refine)(b)


def _two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Knuth two-sum: s + e == a + b exactly, s = fl(a + b), any magnitudes.
    Optimization barriers stop XLA's algebraic simplifier from cancelling the
    error-extraction terms (which is exactly their purpose)."""
    s = jax.lax.optimization_barrier(a + b)
    v = jax.lax.optimization_barrier(s - a)
    e = (a - jax.lax.optimization_barrier(s - v)) + (b - v)
    return s, e


def build_polished_solver(
    op: AllAtOnceOperator,
    *,
    refine: int = 1,
    polish: int = 1,
    dword: bool = False,
    time_transform: Optional[str] = None,
    half_spectrum: Optional[bool] = None,
    base_solver: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Callable[[jnp.ndarray], Any]:
    """Woodbury direct solve + PHYSICAL-space defect correction: the float32
    accuracy path past the spectral ``refine`` ladder's ceiling.

    ``refine`` corrects defects measured in spectral coordinates, so it is
    blind to the rounding of the final inverse transforms and of the float32
    solution representation itself -- measured on TPU at the headline size,
    refine=2 leaves the float64-oracle residual at 7.2e-4, identical to
    refine=1 (artifacts/experiments/tpu_smoke_r2.out). Each ``polish`` step
    instead measures the defect in physical coordinates with the
    cancellation-aware stencil matvec (``AllAtOnceOperator.matvec_accurate``,
    noise well below the float32 representation floor) and accumulates the
    correction with an exact two-sum, maintaining the solution as an
    unevaluated two-float pair ``(x, e)``:

        r = (b - A_acc x) - A e        # Sterbenz: near-equal subtraction exact
        d = W r + e                    # W = the Woodbury solve
        x, e = two_sum(x, d)

    Returned solutions: ``dword=False`` (default) gives the float32 vector
    ``x``, whose true residual sits ON the float32 representation floor
    (~4e-4 at the headline size -- the best any single float32 vector can do);
    ``dword=True`` returns the pair ``(x, e)`` whose float64 sum ``x + e``
    carries the residual BELOW that floor (the two-float significand is
    effectively 48-bit). Cost per polish step: one accurate matvec + one
    plain matvec + one Woodbury apply (~2x a refine step).

    In float64 both paths are already exact to rounding; polish is a no-op
    there (kept valid for uniform call sites).

    Measured (CPU float32, N_x=2048, N_t=1024, float64 oracle): refine=1
    6.4e-4 -> polish=1 4.123e-4 (the floor: 4.1227e-4) -> polish=1 dword
    4.4e-7 -> polish=2 dword 6.6e-8. The accurate matvec's own noise: 5.1e-8
    vs the plain matvec's 5.8e-5.

    ``base_solver`` substitutes a prebuilt direct solve ``b -> x`` for the
    inner ``W`` (e.g. the fused Pallas kernel or the 2D consistent-mass SMW
    solver); it must act on the same physical (2, N_t, n) coordinates. The
    inner-solver knobs ``refine``/``time_transform``/``half_spectrum``
    configure the default-built ``W`` only, so combining them with
    ``base_solver`` is an error (the prebuilt solver carries its own)."""
    if base_solver is not None and (
        refine != 1 or time_transform is not None or half_spectrum is not None
    ):
        raise ValueError(
            "base_solver carries its own refine/time_transform/half_spectrum; "
            "do not combine it with those arguments"
        )
    W = base_solver or build_woodbury_solver(
        op, refine=refine, time_transform=time_transform, half_spectrum=half_spectrum
    )

    def solve(b: jnp.ndarray):
        x = W(b)
        e = jnp.zeros_like(x)
        for _ in range(polish):
            r = (b - op.matvec_accurate(x)) - op.matvec(e)
            d = W(r) + e
            x, e = _two_sum(x, d)
        return (x, e) if dword else x

    return solve


# --------------------------------------------------------------------------
# Host-side float64 residual (accuracy oracle for float32 device solves)
# --------------------------------------------------------------------------


def _np_dst_axis(g: np.ndarray, ax: int) -> np.ndarray:
    """DST-I along ``ax`` via the odd-extension FFT identity (numpy, host)."""
    g = np.moveaxis(g, ax, -1)
    n = g.shape[-1]
    z = np.zeros(g.shape[:-1] + (1,), g.dtype)
    ext = np.concatenate([z, g, z, -g[..., ::-1]], axis=-1)
    out = 0.5j * np.fft.fft(ext, axis=-1)[..., 1 : n + 1]
    if not np.iscomplexobj(g):
        out = out.real
    return np.moveaxis(out, -1, ax)


def spectral_relative_residual(op: AllAtOnceOperator, x, b) -> float:
    """``||A x - b|| / ||b||`` evaluated in float64 on host, in spectral
    coordinates (the combined transform is a scalar multiple of a unitary, so
    the ratio equals the physical one to rounding).

    The float32 device matvec cannot measure residuals below ~1e-3 relative:
    the time stencil's smooth-mode cancellation (module docstring) puts its
    own rounding noise there. This host oracle sees the true residual of a
    float32 solution -- the accuracy gate for bench.py and the float32 tests.
    """
    pl = _spectral_plan(op)
    dim = op.space.dim
    N_t, n = pl.N_t, pl.n

    def to_spec(v):
        v = np.fft.ifft(np.asarray(v, np.float64), axis=1)
        g = v.reshape(v.shape[:-1] + op.space.grid_shape)
        for ax in range(-dim, 0):
            g = _np_dst_axis(g, ax)
        return g.reshape(v.shape)

    xh, bh = to_spec(x), to_spec(b)
    a11 = pl.a11_h
    a22 = np.conj(a11)
    tm = pl.theta * pl.muM64[None, :]
    m1, kap1 = pl.muM64, pl.c * pl.muK64
    tm1, mk1 = pl.theta * pl.muM64, pl.muM64 + pl.c * pl.muK64
    k = np.arange(N_t)
    phi = lambda i: np.exp(-2j * np.pi * i * k / N_t)
    psi = lambda i: np.exp(2j * np.pi * i * k / N_t) / N_t

    xu, xp = xh[0], xh[1]
    du = a11 * xu - tm * xp
    dp = tm * xu + a22 * xp
    uNm1 = phi(N_t - 1) @ xu
    uNm2 = phi(N_t - 2) @ xu
    p0 = phi(0) @ xp
    p1 = phi(1) @ xp
    du = du + np.outer(psi(0), m1 * (2.0 * uNm1 - uNm2) - kap1 * uNm2 + 0.5 * tm1 * p0)
    du = du + np.outer(psi(1), -mk1 * uNm1)
    dp = dp + np.outer(psi(N_t - 1), m1 * (2.0 * p0 - p1) - kap1 * p1 - 0.5 * tm1 * uNm1)
    dp = dp + np.outer(psi(N_t - 2), -mk1 * p0)
    r = np.stack([du, dp]) - bh
    return float(np.linalg.norm(r.ravel()) / np.linalg.norm(bh.ravel()))
