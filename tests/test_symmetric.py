"""Symmetrized ParaDiag MINRES path (paradiag/symmetric.py)."""

import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem
from optimal_control_paradiag_tpu.paradiag.symmetric import build_symmetric_system


@pytest.mark.parametrize(
    "kw",
    [dict(N_x=6, N_t=7), dict(N_x=5, N_t=6, gamma=0.5), dict(N_x=4, N_t=5, dim=2, mass="lumped")],
)
def test_swapped_operator_exactly_symmetric(kw):
    prob = WaveControlProblem(ProblemConfig(**kw))
    A = np.asarray(prob.operator.dense())
    m = A.shape[0] // 2
    Asw = np.vstack([A[m:], A[:m]])
    assert np.abs(Asw - Asw.T).max() == 0.0


def test_spd_preconditioner_is_symmetric_positive():
    prob = WaveControlProblem(ProblemConfig(N_x=8, N_t=6))
    _, pc_spd, _ = build_symmetric_system(prob.operator)
    import jax.numpy as jnp

    n = 2 * prob.config.N_t * prob.space.n
    eye = np.eye(n).reshape(n, 2, prob.config.N_t, prob.space.n)
    P = np.stack([np.asarray(pc_spd(jnp.asarray(e))).ravel() for e in eye]).T
    np.testing.assert_allclose(P, P.T, atol=1e-12)
    w = np.linalg.eigvalsh(P)
    assert w.min() > 0


def test_minres_matches_direct():
    prob = WaveControlProblem(ProblemConfig(N_x=20, N_t=20))
    mr = prob.solve(SolverConfig(method="minres", rtol=1e-11, maxiter=100))
    lu = prob.solve(SolverConfig(method="direct"))
    assert bool(mr.result.converged)
    np.testing.assert_allclose(np.asarray(mr.u), np.asarray(lu.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(mr.p), np.asarray(lu.p), atol=1e-8)


def test_minres_iteration_counts_near_theory():
    """Rank-4 boundary correction => <= ~10 exact-arithmetic iterations;
    allow finite-precision slack (module docstring)."""
    its = {}
    for N in (20, 40):
        prob = WaveControlProblem(ProblemConfig(N_x=N, N_t=N))
        sol = prob.solve(SolverConfig(method="minres", rtol=1e-10, maxiter=100))
        assert bool(sol.result.converged)
        its[N] = int(sol.result.iterations)
    assert its[20] <= 14
    assert its[40] <= 20


def test_minres_2d_consistent_fallback():
    """Non-diagonalizable space: lumped-surrogate SPD PC still converges to
    the right answer (slower than blockdense-GMRES; see symmetric.py)."""
    prob = WaveControlProblem(ProblemConfig(N_x=8, N_t=8, dim=2, mass="consistent"))
    sol = prob.solve(SolverConfig(method="minres", rtol=1e-8, maxiter=200))
    lu = prob.solve(SolverConfig(method="direct"))
    assert bool(sol.result.converged)
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(lu.u), atol=1e-6)


def test_minres_2d_lumped():
    prob = WaveControlProblem(ProblemConfig(N_x=10, N_t=12, dim=2, mass="lumped"))
    sol = prob.solve(SolverConfig(method="minres", rtol=1e-10, maxiter=100))
    wb = prob.solve(SolverConfig(method="woodbury"))
    assert bool(sol.result.converged)
    assert int(sol.result.iterations) <= 16
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(wb.u), atol=1e-7)
