"""Optimal control of the HEAT equation -- the framework's second model family.

The reference is a single-problem script (wave equation only,
``Control_Wave_PC.py``); this module demonstrates that the framework's
layers (P1 spaces, circulant diagonalization, spectral Woodbury, Krylov)
generalize: the parabolic tracking problem

    min J(u, us) = 1/2 ||u - g||^2 + gamma/2 ||us||^2
    s.t.  u_t - Lap u = f + us,  u|_bnd = 0,  u(0) = u0,

with the control eliminated through the adjoint (``us = p / gamma``),
discretized by backward Euler in time (the ParaDiag literature's canonical
parabolic setup) and P1 elements in space. Unknowns ``u_i ~ u(t_i)``,
``p_i ~ p(t_i)``, i = 1..N_t, sqrt(gamma)-scaled state (``uh = sqrt(g) u``,
the wave model's convention, ref ``Control_Wave_PC.py:56-57``):

    u-row i: M(uh_i - uh_{i-1}) + tau K uh_i - (tau/sqrt(g)) M p_i
               = tau M fh_i  (+ M uh_0 for i = 1)
    p-row i: M(p_i - p_{i+1}) + tau K p_i + (tau/sqrt(g)) M uh_i
               = tau M g_i   (p_{N_t+1} = 0 terminal condition)

Structure mirrors the wave model one-for-one, with FIRST-order time stencils:

- circulant symbols ``Lambda1(k) = 1 - omega_k`` (forward difference wrap)
  for the u-block and ``conj(Lambda1)`` for the reversed adjoint block --
  the heat analogue of the wave model's ``(1-omega)^2 / 1+omega^2`` pair;
- per-(mode, wavenumber) 2x2 blocks with the SAME algebraic form as the
  wave system: ``a11 = Lambda1 muM + tau muK``, ``a22 = conj(a11)``,
  coupling ``-+ tm = (tau/sqrt(g)) muM``, ``det = |a11|^2 + tm^2 > 0``;
- the true operator differs from the block circulant by a RANK-2 time
  correction (vs the wave's rank 4): the u-block's wraparound touches only
  row 1 (spurious ``-M u_{N}``) and the p-block's only row N_t (spurious
  ``-M p_1``), so ``A = P + Psi R Phi*`` with ``Phi* x = (u_N, p_1)``,
  ``R = diag(M, M)`` and injections into (u-row 1, p-row N_t);
- hence a 2x2-capacity Sherman-Morrison-Woodbury DIRECT solve per sine
  wavenumber, half-spectrum, exactly parallel to the wave solver
  (``paradiag/spectral.py:_build_woodbury_half``).

Manufactured 1D solution (for convergence validation): ``u = sin(pi x) e^{-t}``,
``p = sin(pi x)(e^{t-T} - 1)`` (satisfies ``p(T) = 0``), with
``f = u_t - Lap u - p/gamma`` and ``g = u - p_t - Lap p`` from the
continuous optimality system.

Measured (CPU float64, tests/test_heat.py): the SMW direct solve matches
dense LU to 1e-10 and leaves relative residual ~1e-13; circulant-PC GMRES
converges in 3 iterations at rtol 1e-10, mesh-independent (N = 16/32/64 --
the preconditioned operator is identity + rank 2); the manufactured error
halves per tau-halving (0.0359 / 0.0186 / 0.0094 at N_t = 16/32/64,
N_x = 128) -- clean backward-Euler O(tau).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.fem.space import P1Space, make_space
from optimal_control_paradiag_tpu.krylov.gmres import GmresResult, gmres
from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


class HeatSolution(NamedTuple):
    u: jnp.ndarray  # (N_t, n), u_sol[i] ~ u(t_{i+1}), physical (unscaled)
    p: jnp.ndarray  # (N_t, n), p_sol[i] ~ p(t_{i+1})
    result: Optional[GmresResult]


class HeatControlProblem:
    """All-at-once heat-equation optimal control on diagonalizable spaces
    (1D, or 2D with ``mass='lumped'``); reuses :class:`ProblemConfig`."""

    def __init__(self, config: ProblemConfig, space: Optional[P1Space] = None):
        if not config.scaled:
            raise ValueError("the heat model is implemented in scaled ('pc') form")
        self.config = config
        self.space = space if space is not None else make_space(
            config.dim,
            config.N_x,
            mass=config.mass,
            dtype=config.dtype,
            dst_precision=config.dst_precision,
        )
        self.tau = config.T / config.N_t
        self._data = self._build_data()
        self._cache: Dict = {}

    # ----------------------------------------------------------------- data

    def _analytic(self):
        """Dimension-aware manufactured optimality pair (module docstring for
        1D; the 2D fields are the separable product-sine analogues, mirroring
        the reference's 2D wave data ``Func_Version.py:33-44``):

            u = prod_d sin(pi x_d) e^{-t},   p = prod_d sin(pi x_d)(e^{t-T} - 1),

        with ``-Lap`` eigenvalue ``lam = dim * pi^2`` on the product-sine mode,
        so ``f = u_t - Lap u - p/gamma`` and ``g = u - p_t - Lap p`` in closed
        form for both dims. All callables take ``(*coords, t)``."""
        T, g = self.config.T, self.config.gamma
        pi = math.pi
        lam = self.config.dim * pi * pi

        def shape(*xs):
            out = np.sin(pi * xs[0])
            for x in xs[1:]:
                out = out * np.sin(pi * x)
            return out

        u = lambda *a: shape(*a[:-1]) * np.exp(-a[-1])
        p = lambda *a: shape(*a[:-1]) * (np.exp(a[-1] - T) - 1.0)
        f = lambda *a: shape(*a[:-1]) * (
            -np.exp(-a[-1]) + lam * np.exp(-a[-1]) - (np.exp(a[-1] - T) - 1.0) / g
        )
        gt = lambda *a: shape(*a[:-1]) * (
            np.exp(-a[-1]) - np.exp(a[-1] - T) + lam * (np.exp(a[-1] - T) - 1.0)
        )
        return u, p, f, gt

    def _build_data(self):
        cfg = self.config
        sp = self.space
        tau = self.tau
        ua, pa, fa, ga = self._analytic()
        f = np.stack(
            [np.asarray(sp.interpolate(lambda *x: fa(*x, (i + 1) * tau))) for i in range(cfg.N_t)]
        )
        gd = np.stack(
            [np.asarray(sp.interpolate(lambda *x: ga(*x, (i + 1) * tau))) for i in range(cfg.N_t)]
        )
        u0 = np.asarray(sp.interpolate(lambda *x: ua(*x, 0.0)))
        s = math.sqrt(cfg.gamma)
        return {
            "f": to_device(s * f, cfg.dtype),
            "g": to_device(gd, cfg.dtype),
            "u0": to_device(s * u0, cfg.dtype),
        }

    # ------------------------------------------------------------- operator

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x on scaled states (2, N_t, n) -- the all-at-once optimality
        system rows (module docstring)."""
        sp = self.space
        tau = self.tau
        th = tau / math.sqrt(self.config.gamma)
        u, p = x[0], x[1]
        um1 = jnp.concatenate([jnp.zeros_like(u[:1]), u[:-1]], axis=0)  # u_{i-1}, u_0 -> rhs
        pp1 = jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)  # p_{i+1}, terminal 0
        row_u = sp.apply_mass(u - um1) + tau * sp.apply_stiffness(u) - th * sp.apply_mass(p)
        row_p = sp.apply_mass(p - pp1) + tau * sp.apply_stiffness(p) + th * sp.apply_mass(u)
        return jnp.stack([row_u, row_p])

    def matvec_accurate(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x in cancellation-aware form -- the heat analogue of
        ``AllAtOnceOperator.matvec_accurate`` (and easier: the backward-Euler
        time difference ``u_i - u_{i-1}`` is ALREADY the exact nested first
        difference in :meth:`matvec`). The one remaining float32 cancellation
        is the stiffness on smooth states (O(1) stencil entries cancelling to
        O(h^2)); :meth:`P1Space.apply_stiffness_nested` evaluates it as
        summed first differences instead. This makes the physical-space
        polish ladder (``paradiag.spectral.build_polished_solver``)
        meaningful for the heat family: the defect ``b - A x`` is measured
        with noise below the float32 representation floor of ``x``."""
        sp = self.space
        tau = self.tau
        th = tau / math.sqrt(self.config.gamma)
        u, p = x[0], x[1]
        um1 = jnp.concatenate([jnp.zeros_like(u[:1]), u[:-1]], axis=0)
        pp1 = jnp.concatenate([p[1:], jnp.zeros_like(p[:1])], axis=0)
        kn = getattr(sp, "apply_stiffness_nested", sp.apply_stiffness)
        row_u = sp.apply_mass(u - um1) + tau * kn(u) - th * sp.apply_mass(p)
        row_p = sp.apply_mass(p - pp1) + tau * kn(p) + th * sp.apply_mass(u)
        return jnp.stack([row_u, row_p])

    @property
    def rhs(self) -> jnp.ndarray:
        if "rhs" not in self._cache:
            d = self._data
            sp, tau = self.space, self.tau

            @jax.jit
            def build(d):
                bu = tau * jax.vmap(sp.apply_mass)(d["f"])
                bu = bu.at[0].add(sp.apply_mass(d["u0"]))
                bp = tau * jax.vmap(sp.apply_mass)(d["g"])
                return jnp.stack([bu, bp])

            self._cache["rhs"] = build(d)
        return self._cache["rhs"]

    # ------------------------------------------------------ spectral pieces

    def _plan(self, mass_surrogate: bool = False):
        """Host constants of the diagonalized system (numpy).

        ``mass_surrogate``: for the 2D consistent mass, substitute the
        tensor-part mass spectrum (``P1Space.spectrum_tensor``) -- the plan
        then describes the EXACTLY-solvable surrogate operator used as the
        outer preconditioner (same trick as the wave model's
        ``build_tensor_gmres_solver``)."""
        cfg = self.config
        sp = self.space
        N_t = cfg.N_t
        tau = self.tau
        th = tau / math.sqrt(cfg.gamma)
        muM, muK = sp.spectrum
        if muM is None:
            if not mass_surrogate:
                raise ValueError("heat spectral solves need a sine-diagonalizable space")
            muM = sp.spectrum_tensor
        muM = np.asarray(muM, np.float64)
        muK = np.asarray(muK, np.float64)
        k = np.arange(N_t)
        L1 = 1.0 - np.exp(2j * np.pi * k / N_t)  # circulant symbol of (I - T^-)
        a11 = L1[:, None] * muM[None, :] + tau * muK[None, :]
        tm = th * muM[None, :]
        det = np.abs(a11) ** 2 + tm * tm
        return L1, muM, muK, a11, tm, det

    def _capacity_2x2(self, mass_surrogate: bool = False) -> np.ndarray:
        """Per-wavenumber REAL 2x2 SMW capacity matrices
        ``G = (I + C W)^{-1} C`` (float64 host math): ``W = Phi* D^{-1} Psi``
        with the rank-2 extraction/injection phases, ``C = diag(muM)``.
        Realness follows from the Hermitian k <-> N_t-k pairing (asserted)."""
        N_t = self.config.N_t
        _, muM64, _, a11_h, tm_h, det_h = self._plan(mass_surrogate=mass_surrogate)
        kf = np.arange(N_t)
        phiE = lambda i: np.exp(-2j * np.pi * i * kf / N_t)
        psiI = lambda i: np.exp(2j * np.pi * i * kf / N_t) / N_t
        iuu = np.conj(a11_h) / det_h
        iup = tm_h / det_h + 0j  # D^{-1}[u,p] = +tm/det
        ipu = -tm_h / det_h + 0j
        ipp = a11_h / det_h
        rows = [("u", phiE(N_t - 1)), ("p", phiE(0))]
        cols = [("u", psiI(0)), ("p", psiI(N_t - 1))]
        E = {("u", "u"): iuu, ("u", "p"): iup, ("p", "u"): ipu, ("p", "p"): ipp}
        n = self.space.n
        W = np.zeros((n, 2, 2), np.complex128)
        for a, (ca, pa) in enumerate(rows):
            for b, (cb, pb) in enumerate(cols):
                W[:, a, b] = np.einsum("k,kn,k->n", pa, E[(ca, cb)], pb)
        C = np.zeros((n, 2, 2), np.float64)
        C[:, 0, 0] = muM64
        C[:, 1, 1] = muM64
        G_h = np.linalg.solve(np.eye(2)[None] + C @ W, C.astype(np.complex128))
        assert float(np.abs(G_h.imag).max()) < 1e-9 * max(float(np.abs(G_h.real).max()), 1.0)
        return G_h.real

    def build_woodbury_solver(
        self,
        refine: int = 1,
        mass_surrogate: bool = False,
        layout=None,
        time_transform: Optional[str] = None,
    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Half-spectrum rank-2 SMW direct solve ``b -> x`` (module docstring);
        jit-wrap for repeated use. Exact in float64; ``refine`` polishes f32.
        With ``mass_surrogate`` it is the exact solve of the TENSOR-mass
        surrogate operator (2D consistent preconditioner).

        ``layout`` (a :class:`parallel.sharding.ParallelLayout`): multi-chip
        sharded solve -- the same stage-layout pipeline as the wave family
        (``paradiag.spectral.make_halfspectrum_transforms``), with the
        per-(mode, wavenumber) diagonal built INSIDE the traced program from
        its 1D factors (no O(N_t*n) embedded constants; cf the wave plan's
        ``mode_diag``). The boundary-slice extractions become cross-shard
        phase-sum reductions (XLA inserts the psums)."""
        cfg = self.config
        sp = self.space
        N_t = cfg.N_t
        K = N_t // 2 + 1
        rdtype = cfg.dtype
        tau = self.tau
        th = tau / math.sqrt(cfg.gamma)
        if time_transform is None:
            # packed-FFT default when unsharded (see
            # paradiag.spectral.build_woodbury_solver; heat winner on v5e:
            # 2.89 ms vs 3.11 pallas / 3.24 plain rfft)
            time_transform = "dft" if layout is not None else "fft2"
        np_c = np.dtype(np.complex64) if jnp.dtype(rdtype).itemsize == 4 else np.dtype(np.complex128)
        L1, muM64, muK64, a11_h, tm_h, det_h = self._plan(mass_surrogate=mass_surrogate)

        # Half-spectrum constants (pairing weights on extraction rows).
        k = np.arange(K)
        wgt = np.full(K, 2.0)
        wgt[0] = 1.0
        if N_t % 2 == 0:
            wgt[K - 1] = 1.0
        phiw = lambda i: host_const(wgt * np.exp(-2j * np.pi * i * k / N_t), np_c)
        psi = lambda i: host_const(np.exp(2j * np.pi * i * k / N_t) / N_t, np_c)
        phi_uN, phi_p1 = phiw(N_t - 1), phiw(0)
        psi_u1, psi_pN = psi(0), psi(N_t - 1)

        G_h = self._capacity_2x2(mass_surrogate=mass_surrogate)
        G = [[host_const(G_h[:, a, b], rdtype) for b in range(2)] for a in range(2)]

        # Traced per-(mode, wavenumber) diagonal from 1D factors: a11 is the
        # outer product L1 (x) muM plus the broadcast tau * muK -- built
        # inside the program so the compiled artifact embeds O(K + n)
        # constants, not O(K * n).
        L1c = host_const(L1[:K].astype(np_c), np_c)
        muMc = host_const(muM64, rdtype)
        muKc = host_const(muK64, rdtype)
        m1 = muMc

        def mode_diag():
            a11 = L1c[:, None] * muMc[None, :] + tau * muKc[None, :]
            tm = th * muMc[None, :]
            inv_det = 1.0 / (jnp.square(a11.real) + jnp.square(a11.imag) + jnp.square(tm))
            return a11, jnp.conj(a11), tm, inv_det

        def D_inv(r):
            a11, a22, tm, inv_det = mode_diag()
            ru, rp = r[0], r[1]
            yu = (a22 * ru + tm * rp) * inv_det
            yp = (a11 * rp - tm * ru) * inv_det
            return jnp.stack([yu, yp])

        def extract(y):
            return (
                jnp.sum(phi_uN[:, None] * y[0], axis=0).real,
                jnp.sum(phi_p1[:, None] * y[1], axis=0).real,
            )

        def A_hat(xi):
            a11, a22, tm, _ = mode_diag()
            du = a11 * xi[0] - tm * xi[1]
            dp = tm * xi[0] + a22 * xi[1]
            uN, p1 = extract(xi)
            du = du + psi_u1[:, None] * (m1 * uN)[None, :]
            dp = dp + psi_pN[:, None] * (m1 * p1)[None, :]
            return jnp.stack([du, dp])

        def wb_apply(r):
            y = D_inv(r)
            z = extract(y)
            w = [sum(G[a][b] * z[b] for b in range(2)) for a in range(2)]
            corr_u = psi_u1[:, None] * w[0][None, :]
            corr_p = psi_pN[:, None] * w[1][None, :]
            return y - D_inv(jnp.stack([corr_u, corr_p]))

        from optimal_control_paradiag_tpu.paradiag.spectral import make_halfspectrum_transforms

        to_spectral, from_spectral = make_halfspectrum_transforms(
            sp, N_t, rdtype, layout=layout, time_transform=time_transform
        )

        def solve(b):
            b_hat = to_spectral(b)
            x = wb_apply(b_hat)
            for _ in range(refine):
                x = x + wb_apply(b_hat - A_hat(x))
            return from_spectral(x)

        return solve

    def build_polished_solver(
        self,
        polish: int = 1,
        dword: bool = False,
        refine: int = 1,
        use_pallas: bool = False,
    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Rank-2 SMW direct solve + PHYSICAL-space defect correction -- the
        wave family's float32 accuracy ladder
        (``paradiag.spectral.build_polished_solver``) wired into the heat
        family (VERDICT r3 item 2). Each polish step measures the defect with
        :meth:`matvec_accurate` and accumulates the correction as an exact
        two-float pair; ``dword=True`` returns ``(x, e)`` whose float64 sum
        carries the true residual orders below the float32 representation
        floor (the reference's whole pipeline is complex128,
        ``Control_Wave_PC.py:372``). Measured (CPU f32, N_x=2048, N_t=1024,
        f64 host oracle): plain SMW 1.6e-2 (the f32 floor) -> polish=1 dword
        5.6e-8 (polish=2: 5.3e-8 -- one pass suffices)."""
        from optimal_control_paradiag_tpu.paradiag.spectral import build_polished_solver

        if use_pallas:
            from optimal_control_paradiag_tpu.paradiag.pallas_heat import (
                build_pallas_heat_solver,
            )

            base = build_pallas_heat_solver(
                self, refine=refine, interpret=jax.default_backend() == "cpu"
            )
        else:
            base = self.build_woodbury_solver(refine=refine)
        return build_polished_solver(self, polish=polish, dword=dword, base_solver=base)

    def build_tensor_gmres_solver(
        self, rtol: float = 1e-10, maxiter: int = 60, with_result: bool = False
    ) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Mesh-independent 2D consistent-mass solve: GMRES preconditioned by
        the EXACT tensor-mass surrogate SMW direct solve -- the heat analogue
        of ``paradiag.woodbury2d.build_tensor_gmres_solver`` (measured: 3-4
        iterations at rtol 1e-10 across N, tests/test_heat.py)."""
        W_t = self.build_woodbury_solver(refine=0, mass_surrogate=True)

        def solve(b):
            res = gmres(self.matvec, b, M=W_t, restart=maxiter, rtol=rtol, maxiter=maxiter)
            return (res.x, res) if with_result else res.x

        return solve

    def build_symmetric_system(self, layout=None, time_transform: Optional[str] = None):
        """``(matvec_sym, pc_spd, swap)`` -- the wave family's symmetrized
        ParaDiag (paradiag/symmetric.py) generalized to the heat KKT system:
        swapping the (u, p) block rows gives

            A_sym = [[th M, B^T], [B, -th M]],   B = (I - T^-) (x) M + tau (x) K,

        EXACTLY symmetric (B's adjoint block is B^T because the reversed
        time stencil transposes the shift). The swapped circulant part per
        (mode k, wavenumber j) is the traceless Hermitian
        ``[[t, conj(a11)], [a11, -t]]`` with eigenvalues exactly
        ``+/- sqrt(det)`` -- the same algebra as the wave, first-order
        symbols -- so the SPD absolute-value preconditioner is the scalar
        ``T^{-1} det^{-1/2} T``. 2D consistent mass substitutes the
        tensor-part surrogate spectrum in the preconditioner only (matvec
        and symmetry stay exact).

        ``layout`` (a :class:`parallel.sharding.ParallelLayout`): multi-chip
        sharded SPD preconditioner through the shared half-spectrum stage
        pipeline (the scalar multiplier is elementwise, so it shards
        trivially bin-local; requires the DFT-matmul time transform)."""
        sp = self.space
        N_t = self.config.N_t
        K = N_t // 2 + 1
        rdtype = self.config.dtype
        _, _, _, _, _, det_h = self._plan(mass_surrogate=not sp.diagonalizable)
        inv_sqrt_det = host_const(1.0 / np.sqrt(det_h[:K]), rdtype)
        if time_transform is None:
            # packed-FFT default when unsharded (see
            # paradiag.spectral.build_woodbury_solver; heat winner on v5e:
            # 2.89 ms vs 3.11 pallas / 3.24 plain rfft)
            time_transform = "dft" if layout is not None else "fft2"

        from optimal_control_paradiag_tpu.paradiag.spectral import (
            make_halfspectrum_transforms,
        )

        to_s, from_s = make_halfspectrum_transforms(
            sp, N_t, rdtype, layout=layout, time_transform=time_transform
        )

        def swap(x):
            return jnp.stack([x[1], x[0]])

        def matvec_sym(x):
            return swap(self.matvec(x))

        def pc_spd(r):
            # T^{-1} det^{-1/2} T with the real multiplier commuting through
            # the transforms' conjugation/scaling.
            return from_s(to_s(r) * inv_sqrt_det)

        return matvec_sym, pc_spd, swap

    def build_preconditioner(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Circulant ParaDiag PC (the fulldiag analogue): rfft(time) + DST ->
        per-(mode, wavenumber) 2x2 Cramer -> back."""
        sp = self.space
        N_t = self.config.N_t
        K = N_t // 2 + 1
        rdtype = self.config.dtype
        np_c = np.dtype(np.complex64) if jnp.dtype(rdtype).itemsize == 4 else np.dtype(np.complex128)
        _, _, _, a11_h, tm_h, det_h = self._plan()
        a11c = host_const(a11_h[:K].astype(np_c), np_c)
        a22c = host_const(np.conj(a11_h[:K]).astype(np_c), np_c)
        tmc = host_const(tm_h, rdtype)
        invdet = host_const(1.0 / det_h[:K], rdtype)

        def apply_pc(r):
            rh = jnp.conj(jnp.fft.rfft(sp.dst(r), axis=1)) * (1.0 / N_t)
            yu = (a22c * rh[0] + tmc * rh[1]) * invdet
            yp = (a11c * rh[1] - tmc * rh[0]) * invdet
            y = jnp.fft.irfft(jnp.conj(jnp.stack([yu, yp])), n=N_t, axis=1) * float(N_t)
            return sp.idst(y).astype(rdtype)

        return apply_pc

    # ----------------------------------------------------------------- solve

    def solve(self, solver: Optional[SolverConfig] = None) -> HeatSolution:
        solver = solver or SolverConfig(method="woodbury")
        key = solver
        if key not in self._cache:
            if solver.method == "woodbury":
                if self.space.diagonalizable:
                    if solver.use_pallas:
                        from optimal_control_paradiag_tpu.paradiag.pallas_heat import (
                            build_pallas_heat_solver,
                        )

                        wb = jax.jit(
                            build_pallas_heat_solver(
                                self,
                                refine=solver.refine,
                                interpret=jax.default_backend() == "cpu",
                            )
                        )
                    else:
                        wb = jax.jit(self.build_woodbury_solver(refine=solver.refine))
                    if solver.polish:
                        wb = jax.jit(
                            self.build_polished_solver(
                                polish=solver.polish,
                                refine=solver.refine,
                                use_pallas=solver.use_pallas,
                            )
                        )
                    self._cache[key] = lambda b: (wb(b), None)
                else:
                    f64 = jnp.dtype(self.config.dtype).itemsize == 8
                    tight = solver.rtol if solver.rtol < 1e-6 else (1e-10 if f64 else 1e-5)
                    tg = jax.jit(self.build_tensor_gmres_solver(rtol=tight, with_result=True))
                    self._cache[key] = tg
            elif solver.method == "gmres":
                pc = self.build_preconditioner() if solver.pc == "paradiag" else None

                @jax.jit
                def run(b):
                    res = gmres(
                        self.matvec,
                        b,
                        M=pc,
                        restart=solver.restart,
                        rtol=solver.rtol,
                        atol=solver.atol,
                        maxiter=solver.maxiter,
                    )
                    return res.x, res

                self._cache[key] = run
            elif solver.method == "minres":
                from optimal_control_paradiag_tpu.krylov.minres import minres

                matvec_sym, pc_spd, swap = self.build_symmetric_system()

                @jax.jit
                def run_minres(b):
                    res = minres(
                        matvec_sym,
                        swap(b),
                        M=pc_spd,
                        rtol=solver.rtol,
                        maxiter=solver.maxiter,
                    )
                    return res.x, res

                self._cache[key] = run_minres
            elif solver.method == "direct":

                def run_direct(b):
                    A = self.dense()
                    x = jnp.linalg.solve(jnp.asarray(A), b.reshape(-1)).reshape(b.shape)
                    return x, None

                self._cache[key] = run_direct
            else:
                raise NotImplementedError(f"heat model: method {solver.method!r}")
        x, res = self._cache[key](self.rhs)
        s = math.sqrt(self.config.gamma)
        return HeatSolution(u=x[0] / s, p=x[1], result=res)

    def dense(self) -> np.ndarray:
        """Dense all-at-once matrix by columns (small-size oracle)."""
        N_t, n = self.config.N_t, self.space.n
        m = 2 * N_t * n
        mv = jax.jit(lambda v: self.matvec(v.reshape(2, N_t, n)).reshape(-1))
        cols = []
        eye = np.eye(m, dtype=np.float64)
        for j in range(m):
            cols.append(np.asarray(mv(jnp.asarray(eye[j], dtype=self.config.dtype))))
        return np.stack(cols, axis=1)

    # ------------------------------------------------------------ validation

    def matvec_host_f64(self, x: np.ndarray) -> np.ndarray:
        """Host float64 twin of :meth:`matvec` (numpy throughout) -- the
        residual oracle for float32 device solutions, mirroring the wave
        family (models/wave.py relative_residual_f64)."""
        sp = self.space
        tau = self.tau
        th = tau / math.sqrt(self.config.gamma)
        u = np.asarray(x[0], np.float64)
        p = np.asarray(x[1], np.float64)
        um1 = np.concatenate([np.zeros_like(u[:1]), u[:-1]], axis=0)
        pp1 = np.concatenate([p[1:], np.zeros_like(p[:1])], axis=0)
        row_u = (
            sp.apply_mass_host_f64(u - um1)
            + tau * sp.apply_stiffness_host_f64(u)
            - th * sp.apply_mass_host_f64(p)
        )
        row_p = (
            sp.apply_mass_host_f64(p - pp1)
            + tau * sp.apply_stiffness_host_f64(p)
            + th * sp.apply_mass_host_f64(u)
        )
        return np.stack([row_u, row_p])

    def relative_residual_f64(self, sol: HeatSolution) -> float:
        """True ``||A x - b|| / ||b||`` of the (dtype-rounded) system via the
        host float64 matvec twin."""
        s = math.sqrt(self.config.gamma)
        x = np.stack([np.asarray(sol.u, np.float64) * s, np.asarray(sol.p, np.float64)])
        b = np.asarray(self.rhs, np.float64)
        r = self.matvec_host_f64(x) - b
        return float(np.linalg.norm(r.ravel()) / np.linalg.norm(b.ravel()))

    def relative_residual(self, sol: HeatSolution) -> float:
        s = math.sqrt(self.config.gamma)
        x = jnp.stack([sol.u * s, sol.p])
        r = self.matvec(x) - self.rhs
        return float(jnp.linalg.norm(r.reshape(-1)) / jnp.linalg.norm(self.rhs.reshape(-1)))

    def error_vs_analytic(self, sol: HeatSolution) -> float:
        """Max over time of the nodal-l2 u-error vs the manufactured solution
        (``u_sol[i] ~ u(t_{i+1})``), any dim; O(tau + h^2) for backward
        Euler + P1 (the heat analogue of the reference's error metric,
        ``Control_Wave_PC.py:324-333``; 2D data mirrors ``Func_Version.py:
        33-44``)."""
        ua, _, _, _ = self._analytic()
        tau = self.tau
        u = np.asarray(sol.u, np.float64)
        errs = [
            np.linalg.norm(
                u[i] - np.asarray(self.space.interpolate(lambda *x: ua(*x, (i + 1) * tau)))
            )
            for i in range(self.config.N_t)
        ]
        return float(np.max(errs))
