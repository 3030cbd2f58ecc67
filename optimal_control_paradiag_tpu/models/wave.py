"""The wave-equation optimal-control problem (the reference's L2 layer).

Replaces ``Optimal_Control_Wave_Equation`` (``Control_Wave_PC.py:13-333``):
mesh/space setup, RHS data (f, g), initial conditions, the all-at-once
operator, solve, and validation against the manufactured solution -- with the
preconditioner context passed explicitly instead of through module globals
(the reference's coupling smell at ``Control_Wave_PC.py:361-372``).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.fem.space import P1Space, make_space
from optimal_control_paradiag_tpu.krylov.gmres import GmresResult, gmres
from optimal_control_paradiag_tpu.models.analytic import manufactured
from optimal_control_paradiag_tpu.ops.allatonce import build_operator, build_rhs
from optimal_control_paradiag_tpu.paradiag.inner import (
    make_cocg_inner_solver,
    make_dst_inner_solver,
    make_jacobi_cocg_inner_solver,
    make_tridiag_inner_solver,
)
from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner
from optimal_control_paradiag_tpu.paradiag.spectral import (
    build_polished_solver,
    build_spectral_system,
    build_woodbury_solver,
)
from optimal_control_paradiag_tpu.utils.constants import to_device


class WaveSolution(NamedTuple):
    """Physical (unscaled) solution trajectories and the solver record."""

    u: jnp.ndarray  # (N_t, n) -- u_sol[i] lives at output time t_{i+2}
    p: jnp.ndarray  # (N_t, n) -- p_sol[i] lives at output time t_{i+1}
    result: Optional[GmresResult]


class WaveControlProblem:
    """All-at-once optimal control of the wave equation, 1D or 2D.

    ``space``: optional pre-built space overriding the structured default --
    e.g. a :class:`fem.general.GeneralP1Space` on an arbitrary triangle mesh
    (the reference's general-``Mesh`` capability, ``Control_Wave_PC.py:16-19``);
    it must be 2D and ``config.N_x`` is then ignored for geometry."""

    def __init__(self, config: ProblemConfig, space=None):
        self.config = config
        self.space: P1Space = space if space is not None else make_space(
            config.dim,
            config.N_x,
            mass=config.mass,
            dtype=config.dtype,
            dst_precision=config.dst_precision,
            dst_method=config.dst_method,
        )
        self.operator = build_operator(
            self.space, config.N_t, config.dt, config.gamma, scaled=config.scaled
        )
        self.analytic = manufactured(config.dim, config.T, config.gamma)
        self._data = self._build_data()
        self._solver_cache: Dict[SolverConfig, callable] = {}

    # ------------------------------------------------------------------ data

    def _build_data(self) -> Dict[str, jnp.ndarray]:
        """Nodal data arrays, reproducing the reference's time indexing:
        f at t = i*dt (``Build_f``, ref ``:54``), g at t = (i+1)*dt
        (``Build_g``, ref ``:69``), ICs at t=0 (``Build_Initial_Condition``).
        In scaled mode f, u0, u1 carry the sqrt(gamma) factor
        (ref ``:56-57, 78-80``); g never does."""
        cfg = self.config
        sp = self.space
        dt = cfg.dt
        f = np.stack(
            [np.asarray(sp.interpolate(lambda *x: self.analytic.f(*x, i * dt))) for i in range(cfg.N_t)]
        )
        g = np.stack(
            [np.asarray(sp.interpolate(lambda *x: self.analytic.g(*x, (i + 1) * dt))) for i in range(cfg.N_t)]
        )
        u0 = np.asarray(sp.interpolate(self.analytic.u0))
        u1 = np.asarray(sp.interpolate(self.analytic.u1))
        scale = math.sqrt(cfg.gamma) if cfg.scaled else 1.0
        return {
            "f": to_device(scale * f, cfg.dtype),
            "g": to_device(g, cfg.dtype),
            "u0": to_device(scale * u0, cfg.dtype),
            "u1": to_device(scale * u1, cfg.dtype),
        }

    @functools.cached_property
    def rhs(self) -> jnp.ndarray:
        """RHS assembled under jit (eager stencil ops do not lower on the TPU
        backend) and cached."""
        build = jax.jit(lambda d: build_rhs(self.operator, d["f"], d["g"], d["u0"], d["u1"]))
        return build(self._data)

    # ----------------------------------------------------------------- solve

    def _unscale(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Scaled unknowns -> physical (u_hat = sqrt(gamma) u; p unscaled),
        the inverse of the build-time scaling (ref ``:249-250, 281-292``)."""
        scale = math.sqrt(self.config.gamma) if self.config.scaled else 1.0
        return x[0] / scale, x[1]

    def _make_solver(self, solver: SolverConfig):
        op = self.operator
        if solver.method == "direct":

            def run(b, x0=None):
                A = jnp.asarray(op.dense())
                x = jnp.linalg.solve(A, b.reshape(-1)).reshape(op.shape)
                return x, None

            return run

        if solver.method == "woodbury":
            if not self.space.diagonalizable:
                # Non-sine-diagonalizable spaces, direct-solve API.
                # - Structured 2D consistent mass: GMRES preconditioned by
                #   the EXACT tensor-mass Woodbury direct solve --
                #   mesh-independent (7-10 iterations at rtol 1e-10 across
                #   N; paradiag/woodbury2d.py:build_tensor_gmres_solver),
                #   free of the blockline memory wall. pc_variant=
                #   'blockline' explicitly selects the SMW-over-block-Thomas
                #   alternative (the factorization-based cross-check).
                # - UNSTRUCTURED meshes: GMRES preconditioned by the exact
                #   generalized-EIGENBASIS Woodbury direct solve
                #   (paradiag/eigbasis.py) -- 1 iteration with a float64
                #   basis, a mesh-independent handful with the float32
                #   device basis (vs 119-284 growing iterations for the
                #   plain-circulant blockband PC at N_t=64). pc_variant=
                #   'blockband' explicitly selects the SMW-over-blockband
                #   capacity path (kept as the factorization cross-check).
                from optimal_control_paradiag_tpu.paradiag.woodbury2d import (
                    build_tensor_gmres_solver,
                    build_woodbury2d_solver,
                )

                f64 = jnp.dtype(self.config.dtype).itemsize == 8
                tight = solver.rtol if solver.rtol < 1e-6 else (1e-10 if f64 else 1e-5)
                if solver.pc_variant == "blockline" and hasattr(self.space, "n1d"):
                    wb2 = build_woodbury2d_solver(op, cap_rtol=tight)
                elif not hasattr(self.space, "n1d"):
                    if solver.pc_variant == "blockband":
                        wb2 = build_woodbury2d_solver(op, cap_rtol=tight)
                    else:
                        from optimal_control_paradiag_tpu.paradiag.eigbasis import (
                            build_eig_basis,
                            build_eig_direct_fn,
                            build_eig_gmres_solver,
                        )

                        if self.space.n <= 2000:
                            wb2 = build_eig_gmres_solver(op, rtol=tight)
                        else:
                            # Large n: args-form Richardson -- the basis
                            # matrix must ride as a jit ARGUMENT (embedded
                            # closure constants blow up lowering/compile at
                            # this size; eigbasis.build_eig_direct_fn).
                            # The (expensive) basis is cached per problem
                            # so solver-config changes never recompute it.
                            basis = getattr(self, "_eig_basis", None)
                            if basis is None:
                                basis = build_eig_basis(self.space)
                                self._eig_basis = basis
                            # polish folds into extra Richardson steps here
                            # (the two-float ladder would re-embed V).
                            # Step count follows the basis grade
                            # (eigbasis.default_richardson_steps): f64
                            # host bases are direct at 0, f32 LAPACK
                            # floors in 2, SDC device bases contract
                            # ~0.18/step and floor in 8 (measured ladder
                            # 2.6e-2 -> 6.6e-5 at the n=20449 wall).
                            from optimal_control_paradiag_tpu.paradiag.eigbasis import (
                                default_richardson_steps,
                            )

                            steps = default_richardson_steps(basis) + solver.polish
                            fnV = jax.jit(
                                build_eig_direct_fn(
                                    op, basis, steps=steps, with_residual=True
                                )
                            )
                            Vb = basis.V
                            # f32 basis: the achievable residual bottoms out
                            # at the representation floor (~1e-4 grade, the
                            # wall-stage gate is 5e-4); judge convergence
                            # against max(rtol, floor) so healthy meshes
                            # don't warn at the default rtol=1e-5.
                            rtol_eig = solver.rtol if f64 else max(solver.rtol, 5e-4)

                            def run_eig(b, x0=None):
                                # Fixed-step Richardson, NOT adaptive: the
                                # returned record carries the measured
                                # a-posteriori relative residual so callers
                                # (run.py "converged") see the truth instead
                                # of an unconditional success. A basis worse-
                                # conditioned than the benchmarked meshes
                                # shows up here as converged=False.
                                x, rel = fnV(b, Vb)
                                bn = jnp.linalg.norm(jnp.asarray(b).reshape(-1))
                                res = GmresResult(
                                    x=x,
                                    iterations=jnp.asarray(steps),
                                    converged=rel <= rtol_eig,
                                    residual_norm=rel * bn,
                                    residual_history=jnp.reshape(rel * bn, (1,)),
                                )
                                if not bool(res.converged):
                                    import warnings

                                    warnings.warn(
                                        f"eig-basis Richardson ({steps} steps) "
                                        f"measured relative residual {float(rel):.3e}"
                                        f" > rtol {rtol_eig:.1e}; add polish steps,"
                                        " use float64, or rebuild the basis with "
                                        "method='host'",
                                        stacklevel=2,
                                    )
                                return x, res

                            return run_eig
                else:
                    wb2 = build_tensor_gmres_solver(op, rtol=tight)
                if solver.polish:
                    wb2 = build_polished_solver(op, polish=solver.polish, base_solver=wb2)

                @jax.jit
                def run(b, x0=None):
                    return wb2(b), None

                return run
            if solver.use_pallas:
                from optimal_control_paradiag_tpu.paradiag.pallas_woodbury import (
                    build_pallas_woodbury_solver,
                )

                # interpret mode on CPU: same numerics, no Mosaic compile
                wb = build_pallas_woodbury_solver(
                    op, refine=solver.refine, interpret=jax.default_backend() == "cpu"
                )
            else:
                wb = build_woodbury_solver(op, refine=solver.refine)
            if solver.polish:
                # physical-space defect correction on top of any woodbury
                # variant: float32 true residual -> the representation floor
                wb = build_polished_solver(op, polish=solver.polish, base_solver=wb)

            @jax.jit
            def run(b, x0=None):
                return wb(b), None

            return run

        if solver.method == "spectral":
            if solver.use_pallas:
                raise ValueError(
                    "the fused spectral-step Pallas kernel was removed after "
                    "losing to the XLA-fused jnp path on hardware (v5e, "
                    "N_x=2048/N_t=1024: 0.392 vs 0.357 ms per step, 592 ms "
                    "either way end-to-end); use_pallas now applies to "
                    "method='woodbury' (the fused full-solve kernel, which "
                    "wins)"
                )
            A_hat, D_inv, to_s, from_s = build_spectral_system(op)

            @jax.jit
            def run(b, x0=None):
                res = gmres(
                    A_hat,
                    to_s(b),
                    M=D_inv,
                    x0=None if x0 is None else to_s(x0),
                    restart=solver.restart,
                    rtol=solver.rtol,
                    atol=solver.atol,
                    maxiter=solver.maxiter,
                )
                return from_s(res.x), res

            return run

        if solver.method == "minres":
            # Symmetrized ParaDiag: block-row swap makes the system exactly
            # symmetric; scalar absolute-value-circulant SPD preconditioner
            # (paradiag/symmetric.py). The reference has no such path (its
            # applyTranspose is NotImplementedError, ref :557-558).
            from optimal_control_paradiag_tpu.krylov.minres import minres
            from optimal_control_paradiag_tpu.paradiag.symmetric import build_symmetric_system

            matvec_sym, pc_spd, swap_rhs = build_symmetric_system(op)
            M = pc_spd if solver.pc == "paradiag" else None

            @jax.jit
            def run(b, x0=None):
                res = minres(
                    matvec_sym,
                    swap_rhs(b),
                    M=M,
                    x0=x0,
                    rtol=solver.rtol,
                    maxiter=solver.maxiter,
                )
                return res.x, res

            return run

        if solver.method != "gmres":
            raise NotImplementedError(f"method {solver.method!r} not yet available")

        pc_apply = None
        if solver.pc == "paradiag":
            variant = solver.pc_variant
            inner = None
            cfg = self.config
            if solver.inner == "auto":
                # Auto-pick only when the user kept the default variant; an
                # explicit pc_variant is always respected.
                if not self.space.diagonalizable and solver.pc_variant == "fulldiag":
                    if hasattr(self.space, "n1d"):
                        # 2D consistent mass (structured grid): exact
                        # structured direct inner solves (block-Thomas over
                        # grid lines, half-spectrum -- the scalable MUMPS
                        # analogue, paradiag/blockline.py) when the factors
                        # fit; otherwise the best-effort coupled block-COCG
                        # with tensor-mass spectral preconditioning (see
                        # pc.py notes on indefinite-Helmholtz modes).
                        from optimal_control_paradiag_tpu.paradiag.blockline import (
                            blockline_entries,
                        )

                        if blockline_entries(cfg.N_t, self.space.n1d) <= 4e8:
                            variant = "blockline"
                        else:
                            variant = "block"
                    else:
                        # Unstructured mesh: exact dense per-mode inverses
                        # when memory allows; past that wall the RCM-banded
                        # level-Thomas direct factorization (MUMPS parity,
                        # paradiag/blockband.py); Jacobi-COCG only beyond
                        # the banded-factor budget.
                        if cfg.N_t * (2 * self.space.n) ** 2 <= 3e8:
                            variant = "blockdense"
                        else:
                            from optimal_control_paradiag_tpu.paradiag.blockband import (
                                band_profile,
                                blockband_entries,
                            )

                            _, m_band = band_profile(self.space)
                            if blockband_entries(cfg.N_t, self.space.n, m_band) <= 4e8:
                                variant = "blockband"
                            else:
                                variant = "eig"
                                inner = make_jacobi_cocg_inner_solver(
                                    self.space, cfg.dt, solver.inner_tol, solver.inner_maxiter
                                )
            elif solver.inner == "dst":
                variant = "eig"
                inner = make_dst_inner_solver(self.space, cfg.dt)
            elif solver.inner in ("tridiag_thomas", "tridiag_pcr"):
                variant = "eig"
                inner = make_tridiag_inner_solver(
                    self.space, cfg.dt, method=solver.inner.split("_")[1]
                )
            elif solver.inner == "cocg":
                variant = "eig"
                inner = make_cocg_inner_solver(
                    self.space, cfg.dt, solver.inner_tol, solver.inner_maxiter
                )
            elif solver.inner == "cocg_jacobi":
                variant = "eig"
                inner = make_jacobi_cocg_inner_solver(
                    self.space, cfg.dt, solver.inner_tol, solver.inner_maxiter
                )
            pc_apply = build_preconditioner(op, variant=variant, inner_solver=inner)

        # Float32 on non-sine-diagonalizable spaces (2D consistent,
        # unstructured CSR): physical GMRES iterates with op.matvec stall on
        # the stencil's smooth-mode cancellation noise (measured 69 outer
        # iterations on the perturbed-mesh problem, BENCH_r03) -- the
        # cancellation-aware matvec restores the f64-grade iteration counts.
        # Diagonalizable f32 problems are steered to method='spectral'/
        # 'woodbury' instead (SolverConfig docstring), and f64 keeps the
        # cheaper plain stencils.
        f32 = jnp.dtype(self.config.dtype).itemsize == 4
        mv = op.matvec_accurate if (f32 and not self.space.diagonalizable) else op.matvec

        @jax.jit
        def run(b, x0=None):
            res = gmres(
                mv,
                b,
                M=pc_apply,
                x0=x0,
                restart=solver.restart,
                rtol=solver.rtol,
                atol=solver.atol,
                maxiter=solver.maxiter,
                side=solver.pc_side,
            )
            return res.x, res

        return run

    def make_solver_fn(self, solver: Optional[SolverConfig] = None):
        """The cached, jitted solve function ``b -> (x_scaled, result)`` for a
        given config -- the composable form of :meth:`solve` (benchmarks wrap
        it in their own jit to fuse fences/postprocessing)."""
        solver = solver or SolverConfig()
        if solver not in self._solver_cache:
            self._solver_cache[solver] = self._make_solver(solver)
        return self._solver_cache[solver]

    def make_batched_solver_fn(self, solver: Optional[SolverConfig] = None):
        """Throughput form of :meth:`make_solver_fn`: one compiled program
        that solves MANY all-at-once systems at once, ``bs (B, 2, N_t, n) ->
        (xs (B, 2, N_t, n), results)`` via ``jax.vmap`` over the single-RHS
        solver. The batch axis rides every stage -- the spectral transforms
        become batched MXU matmuls and the elementwise Woodbury/PC passes
        stay bandwidth-contiguous -- so B solves cost far less than B
        round-trips. Use cases: multi-scenario control (many targets ``g`` /
        sources ``f`` on one mesh -- build each RHS with
        :func:`ops.allatonce.build_rhs`) and parameter sweeps sharing one
        discretization. (The reference has no multi-RHS path: each run
        re-assembles and re-factorizes through PETSc/MUMPS,
        ``Control_Wave_PC.py:583-631``.)

        Note on iterative methods (gmres/minres/spectral) under vmap: the
        convergence ``while_loop`` runs until ALL batch lanes meet their
        stopping test, so the whole batch pays for its slowest lane, and the
        returned per-lane iteration counts / residual histories reflect the
        lock-stepped batched loop, not what each lane would do sequentially.
        The direct 'woodbury' method has no such coupling."""
        solver = solver or SolverConfig()
        key = (solver, "batched")
        if key not in self._solver_cache:
            self._solver_cache[key] = jax.jit(jax.vmap(self._make_solver(solver)))
        return self._solver_cache[key]

    def solve(
        self, solver: Optional[SolverConfig] = None, x0: Optional[jnp.ndarray] = None
    ) -> WaveSolution:
        """Solve the all-at-once system; returns physical (unscaled) u, p.

        The default mirrors the reference's ParaDiag run
        (``Control_Wave_PC.py:346-359, 567``). ``x0``: warm-start iterate in
        SCALED unknowns, shape ``(2, N_t, n)`` (e.g. from
        ``utils.checkpoint.warm_start``) -- used by the iterative methods
        (note rtol is then measured against the warm initial residual, PETSc
        semantics; pass an ``atol`` for resume-to-absolute-target runs);
        the direct methods ignore it."""
        x, res = self.make_solver_fn(solver)(self.rhs, x0)
        u, p = self._unscale(x)
        return WaveSolution(u=u, p=p, result=res)

    def residual_norm(self, sol: WaveSolution) -> jnp.ndarray:
        """|| A x - b || of the scaled system -- the enabled version of the
        reference's commented self-checks (ref ``:203-243``)."""
        scale = math.sqrt(self.config.gamma) if self.config.scaled else 1.0

        @jax.jit
        def res(u, p, b):
            x = jnp.stack([u * scale, p])
            return jnp.linalg.norm((self.operator.matvec(x) - b).reshape(-1))

        return res(sol.u, sol.p, self.rhs)

    def relative_residual_f64(self, sol: WaveSolution) -> float:
        """``||A x - b|| / ||b||`` via a host float64 oracle -- measures the
        true residual of float32 solutions, below the float32 matvec's
        cancellation noise floor (~1e-3). Sine-diagonalizable spaces use the
        spectral-coordinate oracle
        (:func:`paradiag.spectral.spectral_relative_residual`); other spaces
        (2D consistent mass, unstructured meshes) the space-generic numpy
        matvec twin (:meth:`ops.allatonce.AllAtOnceOperator.matvec_host_f64`)."""
        scale = math.sqrt(self.config.gamma) if self.config.scaled else 1.0
        x = np.stack([np.asarray(sol.u, np.float64) * scale, np.asarray(sol.p, np.float64)])
        b = np.asarray(self.rhs, np.float64)
        # The spectral oracle needs a sine-diagonalizable STRUCTURED grid
        # (it DSTs over grid_shape); an EigBasisSpace is diagonalizable but
        # general -- route it to the space-generic numpy matvec twin.
        if self.space.diagonalizable and hasattr(self.space, "grid_shape"):
            from optimal_control_paradiag_tpu.paradiag.spectral import (
                spectral_relative_residual,
            )

            return spectral_relative_residual(self.operator, x, b)
        r = self.operator.matvec_host_f64(x) - b
        return float(np.linalg.norm(r.ravel()) / np.linalg.norm(b.ravel()))

    # ------------------------------------------------------------ validation

    def output_trajectories(self, sol: WaveSolution) -> Tuple[np.ndarray, np.ndarray]:
        """Map staggered unknowns to the output time grid t_i = i*dt,
        i = 0..N_t, exactly as the reference's ``write()``
        (``Control_Wave_PC.py:278-294``):

          u_out(t_0) = u0,  u_out(t_1) = cos(pi dt) u0 + dt u1,
          u_out(t_i) = u_sol[i-2] (2 <= i <= N_t, with u_sol[N_t-2] reused at
          i = N_t);  p_out(t_0) = 0, p_out(t_i) = p_sol[i-1] (1 <= i < N_t),
          p_out(t_N_t) = 0.
        """
        cfg = self.config
        n = self.space.n
        u = np.asarray(sol.u, dtype=np.float64)
        p = np.asarray(sol.p, dtype=np.float64)
        scale = math.sqrt(cfg.gamma) if cfg.scaled else 1.0
        u0 = np.asarray(self._data["u0"], dtype=np.float64) / scale
        u1 = np.asarray(self._data["u1"], dtype=np.float64) / scale
        u_out = np.zeros((cfg.N_t + 1, n))
        p_out = np.zeros((cfg.N_t + 1, n))
        u_out[0] = u0
        u_out[1] = math.cos(math.pi * cfg.dt) * u0 + cfg.dt * u1
        for i in range(2, cfg.N_t + 1):
            u_out[i] = u[min(i - 2, cfg.N_t - 2)]
        for i in range(1, cfg.N_t):
            p_out[i] = p[i - 1]
        return u_out, p_out

    def error_vs_analytic(self, sol: WaveSolution) -> float:
        """The reference's published error metric (``Control_Wave_PC.py:
        324-333``): max over output times t_i, i = 2..N_t, of the nodal-l2
        error of u against the analytic solution (boundary nodes vanish in
        both and drop out).

        NOTE: the reference's output mapping ``u_out(t_i) = u_sol[i-2]`` is
        lagged one step relative to the staggering its own equations enforce
        (``u_sol[j] ~ u(t_{j+1})``, pinned by the i=0 Taylor row, ref
        ``:113-118``), so this metric is dominated by the O(dt) lag error;
        see VALIDATION.md. Use :meth:`error_aligned` for the
        lag-corrected, O(dt^2)-convergent metric."""
        cfg = self.config
        u_out, _ = self.output_trajectories(sol)
        errs = []
        for i in range(2, cfg.N_t + 1):
            ua = np.asarray(
                self.space.interpolate(lambda *x: self.analytic.u(*x, i * cfg.dt)),
                dtype=np.float64,
            )
            errs.append(np.linalg.norm(u_out[i] - ua))
        return float(np.max(errs))

    def error_aligned(self, sol: WaveSolution) -> float:
        """Lag-corrected error metric: compares each unknown at the time the
        discrete equations actually place it (``u_sol[j] ~ u(t_{j+1})``,
        ``p_sol[j] ~ p(t_j)``; see VALIDATION.md). Max over j of the nodal-l2
        u-error; converges at the scheme's true O(dt^2 + h^2) per-node rate."""
        cfg = self.config
        u = np.asarray(sol.u, dtype=np.float64)
        errs = []
        for j in range(cfg.N_t):
            ua = np.asarray(
                self.space.interpolate(
                    lambda *x: self.analytic.u(*x, (j + 1) * cfg.dt)
                ),
                dtype=np.float64,
            )
            errs.append(np.linalg.norm(u[j] - ua))
        return float(np.max(errs))
