"""The autodiff-Lagrangian prototype path (Func_Version.py / mumps_1D.py
equivalents): KKT via jax.grad, solved matrix-free with Hessian-vector
products; converges to the analytic solution in 1D and 2D."""

import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig
from optimal_control_paradiag_tpu.models.wave_lagrangian import LagrangianWaveProblem


def test_requires_unscaled():
    with pytest.raises(ValueError):
        LagrangianWaveProblem(ProblemConfig(N_x=6, N_t=7, scaled=True))


def test_kkt_residual_is_gradient_of_quadratic():
    """H is symmetric (it's a Hessian): check via two HVP directions."""
    import jax
    import jax.numpy as jnp

    prob = LagrangianWaveProblem(ProblemConfig(N_x=5, N_t=6, scaled=False))
    n = prob.space.n
    rng = np.random.default_rng(0)
    x = jnp.zeros((2, prob.N, n))
    grad_fn = lambda z: prob.kkt_residual(z[0], z[1])
    v1 = jnp.asarray(rng.standard_normal((2, prob.N, n)))
    v2 = jnp.asarray(rng.standard_normal((2, prob.N, n)))
    hv1 = jax.jvp(grad_fn, (x,), (v1,))[1]
    hv2 = jax.jvp(grad_fn, (x,), (v2,))[1]
    np.testing.assert_allclose(
        float(jnp.sum(v2 * hv1)), float(jnp.sum(v1 * hv2)), rtol=1e-10
    )


def test_1d_solve_small():
    """Fast default-gate coverage of the Lagrangian solve path; the
    multi-size convergence sweeps live in the slow tier."""
    prob = LagrangianWaveProblem(ProblemConfig(N_x=12, N_t=12, scaled=False))
    sol = prob.solve(rtol=1e-10)
    assert bool(sol.result.converged)
    # lag-dominated metric (VALIDATION.md): ~5.4 at N=12, shrinking with N
    assert prob.error_vs_analytic(sol) < 8.0


@pytest.mark.slow
def test_1d_solves_and_converges():
    errs = {}
    for N in (8, 16, 32):
        prob = LagrangianWaveProblem(ProblemConfig(N_x=N, N_t=N, scaled=False))
        sol = prob.solve(rtol=1e-10)
        assert bool(sol.result.converged)
        errs[N] = prob.error_vs_analytic(sol)
    assert errs[32] < errs[16] < errs[8]


@pytest.mark.slow
def test_2d_manufactured_runs():
    """Func_Version's 2D manufactured problem (Func_Version.py:33-44)."""
    prob = LagrangianWaveProblem(ProblemConfig(N_x=6, N_t=8, dim=2, gamma=0.5, scaled=False))
    sol = prob.solve(rtol=1e-8)
    assert bool(sol.result.converged)
    err = prob.error_vs_analytic(sol)
    prob2 = LagrangianWaveProblem(ProblemConfig(N_x=12, N_t=16, dim=2, gamma=0.5, scaled=False))
    sol2 = prob2.solve(rtol=1e-8)
    assert prob2.error_vs_analytic(sol2) < err
