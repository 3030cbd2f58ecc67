"""Sharded end-to-end solve: the multi-chip entry point.

One jitted program: RHS in the canonical layout -> preconditioned GMRES whose
operator and PC carry stage-wise sharding constraints -> solution in the
canonical layout. XLA places the collectives (all-to-all for the FFT/DST
layout changes, collective-permute halos for stencils, psums for dot
products) -- the TPU-native replacement for the reference's
Firedrake/PETSc-MPI parallel layer (SURVEY.md section 2.3, 5.8).
"""

from __future__ import annotations

from typing import Optional

import jax

from optimal_control_paradiag_tpu.config import SolverConfig
from optimal_control_paradiag_tpu.krylov.gmres import gmres
from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner
from optimal_control_paradiag_tpu.parallel.sharding import ParallelLayout


def make_sharded_solver(problem, solver: Optional[SolverConfig], layout: ParallelLayout):
    """Build a jitted ``solve(b) -> (x, GmresResult)`` sharded over
    ``layout.mesh``; ``b`` and ``x`` use the canonical (time+space sharded)
    layout.

    When the state shape divides the mesh evenly, the returned ``sharding``
    is the canonical NamedSharding -- ``device_put`` the RHS with it to skip
    the initial reshard. For UNEVEN shapes (``N_t % n_time != 0`` or
    ``n % n_space != 0``) ``device_put``/``in_shardings`` would reject the
    array, but GSPMD handles uneven partitions inside a compiled program by
    padding -- so the solver constrains layouts internally instead and the
    returned ``sharding`` is None (pass ``b`` with any placement)."""
    solver = solver or SolverConfig()
    op = problem.operator
    N_t, n = op.N_t, op.space.n
    n_time, n_space = layout.mesh.devices.shape
    even = (N_t % n_time == 0) and (n % n_space == 0)
    state_sharding = layout.sharding(layout.canonical_spec) if even else None
    in_shardings = (state_sharding,) if even else None

    if solver.method == "woodbury":
        import jax.numpy as jnp

        from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

        if op.space.diagonalizable:
            wb = build_woodbury_solver(op, refine=solver.refine, layout=layout)

            def run_wb(b):
                return layout.canonical(wb(layout.canonical(b))), None

            return jax.jit(run_wb, in_shardings=in_shardings), state_sharding

        # 2D consistent mass: sharded tensor-PC GMRES (the direct-solve
        # contract on non-diagonalizable structured spaces) -- GMRES on the
        # physical operator preconditioned by the sharded EXACT tensor-mass
        # surrogate Woodbury (paradiag/woodbury2d.py semantics under a
        # layout; VERDICT r3 item 5/6: this path used to be unsharded-only).
        from optimal_control_paradiag_tpu.paradiag.spectral import (
            _build_woodbury_half,
            _spectral_plan,
        )

        pl = _spectral_plan(op, mass_surrogate=True)
        W_t = _build_woodbury_half(op, pl, refine=0, time_transform="dft", layout=layout)
        f64 = jnp.dtype(op.space.dtype).itemsize == 8
        rtol_t = solver.rtol if solver.rtol < 1e-6 else (1e-10 if f64 else 1e-5)
        # f32 non-diagonalizable spaces: iterate on the cancellation-aware
        # element-form matvec, exactly like the unsharded path
        # (wave.py._make_solver) -- the plain stencil's smooth-mode noise
        # floor sits above rtol_t=1e-5 and stalls outer GMRES.
        mv_t = op.matvec if f64 else op.matvec_accurate

        def run_tensor(b):
            res = gmres(
                lambda x: layout.canonical(mv_t(layout.canonical(x))),
                layout.canonical(b),
                M=lambda r: layout.canonical(W_t(r)),
                restart=solver.restart,
                rtol=rtol_t,
                atol=solver.atol,
                maxiter=solver.maxiter,
            )
            return res.x, res

        return jax.jit(run_tensor, in_shardings=in_shardings), state_sharding

    if solver.method == "minres":
        from optimal_control_paradiag_tpu.krylov.minres import minres
        from optimal_control_paradiag_tpu.paradiag.symmetric import build_symmetric_system

        matvec_sym, pc_spd, swap_rhs = build_symmetric_system(op, layout=layout)
        M_spd = (lambda r: layout.canonical(pc_spd(r))) if solver.pc == "paradiag" else None

        def run_mr(b):
            res = minres(
                lambda x: layout.canonical(matvec_sym(layout.canonical(x))),
                layout.canonical(swap_rhs(b)),
                M=M_spd,
                rtol=solver.rtol,
                maxiter=solver.maxiter,
            )
            return res.x, res

        return jax.jit(run_mr, in_shardings=in_shardings), state_sharding

    if solver.method != "gmres":
        raise NotImplementedError(f"sharded wave solve: method {solver.method!r}")

    pc_apply = None
    if solver.pc == "paradiag":
        pc_apply = build_preconditioner(op, variant=solver.pc_variant, layout=layout)

    def matvec(x):
        return layout.canonical(op.matvec(layout.canonical(x)))

    def run(b):
        res = gmres(
            matvec,
            layout.canonical(b),
            M=pc_apply,
            restart=solver.restart,
            rtol=solver.rtol,
            atol=solver.atol,
            maxiter=solver.maxiter,
        )
        return res.x, res

    return jax.jit(run, in_shardings=in_shardings), state_sharding


def make_sharded_heat_solver(problem, solver: Optional[SolverConfig], layout: ParallelLayout):
    """Sharded solve for the heat-control family (``models/heat.py``) --
    same contract as :func:`make_sharded_solver`.

    - ``method='woodbury'`` on a sine-diagonalizable space: the rank-2 SMW
      DIRECT solve, sharded through the shared half-spectrum stage pipeline
      (``HeatControlProblem.build_woodbury_solver(layout=...)``).
    - otherwise (``method='gmres'``, or 2D consistent mass where the exact
      spectral factorization does not exist): sharded GMRES on the canonical
      layout, preconditioned by the sharded SMW solve (exact, or the
      tensor-mass surrogate for the consistent case -- the heat analogue of
      the wave family's tensor-PC dispatch)."""
    import jax.numpy as jnp

    solver = solver or SolverConfig(method="woodbury")
    N_t, n = problem.config.N_t, problem.space.n
    n_time, n_space = layout.mesh.devices.shape
    even = (N_t % n_time == 0) and (n % n_space == 0)
    state_sharding = layout.sharding(layout.canonical_spec) if even else None
    in_shardings = (state_sharding,) if even else None
    diag = problem.space.diagonalizable

    if solver.method == "woodbury" and diag:
        wb = problem.build_woodbury_solver(refine=solver.refine, layout=layout)

        def run_wb(b):
            return layout.canonical(wb(layout.canonical(b))), None

        return jax.jit(run_wb, in_shardings=in_shardings), state_sharding

    if solver.method == "minres":
        from optimal_control_paradiag_tpu.krylov.minres import minres

        matvec_sym, pc_spd, swap_rhs = problem.build_symmetric_system(layout=layout)
        M_spd = (lambda r: layout.canonical(pc_spd(r))) if solver.pc == "paradiag" else None

        def run_mr(b):
            res = minres(
                lambda x: layout.canonical(matvec_sym(layout.canonical(x))),
                layout.canonical(swap_rhs(b)),
                M=M_spd,
                rtol=solver.rtol,
                maxiter=solver.maxiter,
            )
            return res.x, res

        return jax.jit(run_mr, in_shardings=in_shardings), state_sharding

    if solver.method not in ("woodbury", "gmres"):
        raise NotImplementedError(f"sharded heat solve: method {solver.method!r}")

    M = problem.build_woodbury_solver(refine=0, mass_surrogate=not diag, layout=layout)
    if solver.method == "woodbury":
        # Direct-solve contract on a non-diagonalizable space: tighten rtol
        # (mirrors HeatControlProblem.solve's auto dispatch).
        f64 = jnp.dtype(problem.config.dtype).itemsize == 8
        rtol = solver.rtol if solver.rtol < 1e-6 else (1e-10 if f64 else 1e-5)
    else:
        rtol = solver.rtol

    def matvec(x):
        return layout.canonical(problem.matvec(layout.canonical(x)))

    def run(b):
        res = gmres(
            matvec,
            layout.canonical(b),
            M=lambda r: layout.canonical(M(r)),
            restart=solver.restart,
            rtol=rtol,
            atol=solver.atol,
            maxiter=solver.maxiter,
        )
        return res.x, res

    return jax.jit(run, in_shardings=in_shardings), state_sharding
