"""2D consistent-mass Woodbury direct solve (paradiag/woodbury2d.py):
the SMW splitting identity, agreement with the dense direct solve, and
capacity-iteration pins."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner
from optimal_control_paradiag_tpu.paradiag.woodbury2d import (
    build_woodbury2d_solver,
    time_corner_maps,
)


def test_time_corner_splitting_identity():
    """P^{-1}(A x - Psi R Phi* x) == x: the rank-4-in-time splitting is exact
    (for every space -- checked on 2D consistent AND 1D)."""
    for dim, mass in ((2, "consistent"), (1, "consistent"), (2, "lumped")):
        cfg = ProblemConfig(N_x=8, N_t=6, dim=dim, mass=mass)
        prob = WaveControlProblem(cfg)
        op = prob.operator
        variant = "blockline" if (dim == 2 and mass == "consistent") else "fulldiag"
        Pinv = build_preconditioner(op, variant=variant)
        phi_star, R, psi = time_corner_maps(op)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(op.shape))
        x_rec = jax.jit(lambda v: Pinv(op.matvec(v) - psi(R(phi_star(v)))))(x)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-10)


def test_woodbury2d_matches_dense_direct():
    cfg = ProblemConfig(N_x=7, N_t=8, dim=2)
    prob = WaveControlProblem(cfg)
    sol = prob.solve(SolverConfig(method="woodbury"))
    sol_lu = prob.solve(SolverConfig(method="direct"))
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_lu.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.p), np.asarray(sol_lu.p), atol=1e-8)


def test_woodbury2d_residual_and_capacity_pins():
    """True residual at 1e-8 and bounded capacity iterations (measured:
    17 at N=16; pin with headroom). The same solve through outer
    ParaDiag-GMRES needs ~54 iterations at rtol 1e-8."""
    cfg = ProblemConfig(N_x=16, N_t=16, dim=2)
    prob = WaveControlProblem(cfg)
    wb = jax.jit(build_woodbury2d_solver(prob.operator, cap_rtol=1e-10))
    x = wb(prob.rhs)
    rel = float(
        jnp.linalg.norm((prob.operator.matvec(x) - prob.rhs).ravel())
        / jnp.linalg.norm(prob.rhs.ravel())
    )
    assert rel < 1e-8

    # capacity iteration count (run the pieces to observe it)
    from optimal_control_paradiag_tpu.krylov.gmres import gmres
    from optimal_control_paradiag_tpu.paradiag.spectral import _capacity_CW, _spectral_plan

    op = prob.operator
    Pinv = build_preconditioner(op, variant="blockline")
    phi_star, R, psi = time_corner_maps(op)
    pl = _spectral_plan(op, mass_surrogate=True)
    C, W = _capacity_CW(pl)
    Minv = jnp.asarray(np.linalg.inv(np.eye(4)[None] + C @ W).real)
    sp = prob.space

    def cap_pc(q):
        return sp.idst(jnp.einsum("nab,bn->an", Minv, sp.dst(q)))

    def cap_matvec(q):
        return q + R(phi_star(Pinv(psi(q))))

    y = Pinv(prob.rhs)
    res = jax.jit(
        lambda r: gmres(cap_matvec, r, M=cap_pc, restart=100, rtol=1e-10, maxiter=100)
    )(R(phi_star(y)))
    assert bool(res.converged)
    assert int(res.iterations) <= 22, int(res.iterations)


def test_woodbury2d_rejects_diagonalizable():
    prob = WaveControlProblem(ProblemConfig(N_x=8, N_t=6, dim=2, mass="lumped"))
    with pytest.raises(ValueError, match="diagonalizable"):
        build_woodbury2d_solver(prob.operator)
