"""Inner-solver components: batched tridiagonal (Thomas/PCR) vs dense solve,
COCG vs dense, and end-to-end 2D consistent-mass ParaDiag (the capability the
reference never wired, SURVEY.md section 0.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem
from optimal_control_paradiag_tpu.ops.tridiag import pcr, thomas
from optimal_control_paradiag_tpu.paradiag.inner import (
    make_cocg_inner_solver,
    make_dst_inner_solver,
    make_tridiag_inner_solver,
)


@pytest.mark.parametrize("solver", [thomas, pcr])
@pytest.mark.parametrize("dtype", [np.float64, np.complex128])
@pytest.mark.parametrize("n", [1, 2, 7, 16, 33])
def test_tridiag_vs_dense(solver, dtype, n):
    rng = np.random.default_rng(0)
    batch = 5

    def rand(shape):
        x = rng.standard_normal(shape)
        if np.issubdtype(dtype, np.complexfloating):
            x = x + 1j * rng.standard_normal(shape)
        return x

    d = rand((batch, n)) + 4.0  # diagonally dominant
    dl = rand((batch, n))
    du = rand((batch, n))
    b = rand((batch, n))
    x = np.asarray(solver(jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du), jnp.asarray(b)))
    for i in range(batch):
        A = np.diag(d[i]) + np.diag(dl[i][1:], -1) + np.diag(du[i][:-1], 1)
        np.testing.assert_allclose(x[i], np.linalg.solve(A, b[i]), atol=1e-9)


@pytest.mark.parametrize("method", ["thomas", "pcr"])
def test_tridiag_inner_matches_dst(method):
    sp = make_space(1, 17)
    dt = 0.1
    tri = make_tridiag_inner_solver(sp, dt, method=method)
    dst = make_dst_inner_solver(sp, dt)
    rng = np.random.default_rng(1)
    N_t = 6
    sigma = jnp.asarray(rng.standard_normal((N_t, 1)) + 1j * rng.standard_normal((N_t, 1)) + 3.0)
    rhs = jnp.asarray(rng.standard_normal((N_t, sp.n)) + 1j * rng.standard_normal((N_t, sp.n)))
    np.testing.assert_allclose(np.asarray(tri(sigma, rhs)), np.asarray(dst(sigma, rhs)), atol=1e-10)


def test_cocg_solves_2d_consistent_shifted_system():
    sp = make_space(2, 8)  # consistent mass, not diagonalizable
    dt = 0.15
    c = 0.5 * dt * dt
    solve = make_cocg_inner_solver(sp, dt, tol=1e-12, maxiter=100)
    rng = np.random.default_rng(2)
    N_t = 4
    sigma = jnp.asarray(rng.standard_normal((N_t, 1)) + 1j * rng.standard_normal((N_t, 1)) + 2.0)
    rhs = jnp.asarray(rng.standard_normal((N_t, sp.n)) + 1j * rng.standard_normal((N_t, sp.n)))
    w = np.asarray(solve(sigma, rhs))
    M = sp.mass_dense()
    K = sp.stiffness_dense()
    for k in range(N_t):
        A = complex(sigma[k, 0]) * M + c * K
        np.testing.assert_allclose(A @ w[k], np.asarray(rhs[k]), atol=1e-8)


def test_2d_consistent_end_to_end_auto():
    """dim=2 + consistent mass solves with pc='paradiag' out of the box
    (auto: 'blockdense' -- exact per-mode dense block inverses, the MUMPS
    analogue), matching the dense direct solve.

    Note: outer counts are higher than 1D/2D-lumped (~40 here) -- intrinsic
    to the plain-circulant ParaDiag method on the 2D consistent-mass system
    (the preconditioned spectrum's boundary-correction outliers 0.5 +- iy
    spread with y ~ dt^2 lambda_max(M^-1 K); verified equal with exact inner
    solves). The reference never ran 2D; via MUMPS it would behave
    identically."""
    cfg = ProblemConfig(N_x=6, N_t=8, dim=2)
    prob = WaveControlProblem(cfg)
    sol = prob.solve(SolverConfig(rtol=1e-10))
    assert bool(sol.result.converged)
    assert int(sol.result.iterations) <= 60
    sol_lu = prob.solve(SolverConfig(method="direct"))
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_lu.u), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.p), np.asarray(sol_lu.p), atol=1e-7)


def test_1d_tridiag_inner_end_to_end():
    cfg = ProblemConfig(N_x=12, N_t=13)
    prob = WaveControlProblem(cfg)
    it_ref = prob.solve(SolverConfig(rtol=1e-8))
    for inner in ("tridiag_thomas", "tridiag_pcr", "dst", "cocg"):
        sol = prob.solve(SolverConfig(rtol=1e-8, inner=inner))
        assert bool(sol.result.converged), inner
        np.testing.assert_allclose(
            np.asarray(sol.u), np.asarray(it_ref.u), atol=1e-6, err_msg=inner
        )
