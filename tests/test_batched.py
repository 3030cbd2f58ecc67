"""Batched multi-RHS solves: ``WaveControlProblem.make_batched_solver_fn``
(one compiled program solving B all-at-once systems; the reference has no
multi-RHS path -- each sweep run re-assembles and re-factorizes through
PETSc/MUMPS, ``Control_Wave_PC.py:583-631``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem


def _rhs_batch(prob, B=3):
    """B distinct RHS: the manufactured RHS under different scalings."""
    scales = jnp.asarray([1.0, -0.5, 2.25][:B], prob.config.dtype)
    return scales[:, None, None, None] * prob.rhs[None]


@pytest.mark.parametrize(
    "solver",
    [
        SolverConfig(method="woodbury", refine=1),
        SolverConfig(method="spectral", rtol=1e-10),
        SolverConfig(method="gmres", rtol=1e-10),
        SolverConfig(method="minres", rtol=1e-10),
    ],
    ids=["woodbury", "spectral", "gmres", "minres"],
)
def test_batched_matches_sequential(solver):
    prob = WaveControlProblem(ProblemConfig(N_x=12, N_t=8))
    bs = _rhs_batch(prob)
    xs, _ = prob.make_batched_solver_fn(solver)(bs)
    assert xs.shape == (3,) + prob.operator.shape
    run = prob.make_solver_fn(solver)
    for i in range(3):
        xi, _ = run(bs[i])
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xi), rtol=1e-8, atol=1e-12)


def test_batched_linearity_oracle():
    """The system is linear: solve(c*b) == c*solve(b) across the batch."""
    prob = WaveControlProblem(ProblemConfig(N_x=10, N_t=12))
    bs = _rhs_batch(prob)
    xs, _ = prob.make_batched_solver_fn(SolverConfig(method="woodbury", refine=2))(bs)
    np.testing.assert_allclose(np.asarray(xs[1]), -0.5 * np.asarray(xs[0]), rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(xs[2]), 2.25 * np.asarray(xs[0]), rtol=1e-10, atol=1e-13)


def test_batched_2d_lumped():
    prob = WaveControlProblem(ProblemConfig(N_x=6, N_t=8, dim=2, mass="lumped"))
    bs = _rhs_batch(prob, B=2)
    xs, _ = prob.make_batched_solver_fn(SolverConfig(method="woodbury", refine=1))(bs)
    x0, _ = prob.make_solver_fn(SolverConfig(method="woodbury", refine=1))(bs[0])
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x0), rtol=1e-9, atol=1e-12)
