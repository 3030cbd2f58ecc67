"""The vectorized matrix-free operator vs the independent dense oracle
(``ops/dense_oracle`` transcribes ``Build_L`` row by row)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.models.analytic import manufactured
from optimal_control_paradiag_tpu.ops.allatonce import build_operator, build_rhs
from optimal_control_paradiag_tpu.ops.dense_oracle import assemble_dense


def _data(sp, N_t, dt, T, gamma, dim):
    an = manufactured(dim, T, gamma)
    f = np.stack([np.asarray(sp.interpolate(lambda *x: an.f(*x, i * dt))) for i in range(N_t)])
    g = np.stack([np.asarray(sp.interpolate(lambda *x: an.g(*x, (i + 1) * dt))) for i in range(N_t)])
    u0 = np.asarray(sp.interpolate(an.u0))
    u1 = np.asarray(sp.interpolate(an.u1))
    return f, g, u0, u1


@pytest.mark.parametrize(
    "dim,N_x,N_t,gamma,scaled,mass",
    [
        (1, 6, 7, 1.0, True, "consistent"),
        (1, 6, 7, 1.0, False, "consistent"),
        (1, 5, 8, 0.25, True, "consistent"),
        (1, 5, 8, 0.25, False, "consistent"),
        (2, 4, 5, 1.0, True, "consistent"),
        (2, 4, 5, 2.0, True, "lumped"),
    ],
)
def test_matvec_matches_dense_oracle(dim, N_x, N_t, gamma, scaled, mass):
    T = 2.0
    dt = T / N_t
    sp = make_space(dim, N_x, mass=mass)
    op = build_operator(sp, N_t, dt, gamma, scaled=scaled)
    scale = np.sqrt(gamma) if scaled else 1.0
    f, g, u0, u1 = _data(sp, N_t, dt, T, gamma, dim)

    A, b = assemble_dense(sp, N_t, dt, gamma, scaled, scale * f, g, scale * u0, scale * u1)

    rng = np.random.default_rng(42)
    for _ in range(3):
        x = rng.standard_normal((2, N_t, sp.n))
        got = np.asarray(op.matvec(jnp.asarray(x))).reshape(-1)
        want = A @ x.reshape(-1)
        np.testing.assert_allclose(got, want, atol=1e-12)

    b_got = np.asarray(
        build_rhs(
            op,
            jnp.asarray(scale * f),
            jnp.asarray(g),
            jnp.asarray(scale * u0),
            jnp.asarray(scale * u1),
        )
    ).reshape(-1)
    np.testing.assert_allclose(b_got, b, atol=1e-12)


@pytest.mark.parametrize(
    "dim,mass,gamma,scaled",
    [
        (1, "consistent", 1.0, True),
        (1, "lumped", 0.25, False),
        (2, "consistent", 1.0, True),
        (2, "lumped", 2.0, True),
    ],
)
def test_host_matvec_matches_device(dim, mass, gamma, scaled):
    """matvec_host_f64 (the space-generic float64 residual oracle) equals the
    jnp matvec to rounding."""
    N_x, N_t = (5, 6) if dim == 2 else (9, 7)
    sp = make_space(dim, N_x, mass=mass)
    op = build_operator(sp, N_t, 2.0 / N_t, gamma, scaled=scaled)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, N_t, sp.n))
    got = op.matvec_host_f64(x)
    want = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_relative_residual_f64_dispatch_agrees():
    """The spectral-coordinate oracle and the generic host-matvec oracle
    measure the same residual on a diagonalizable space; the generic oracle
    serves the non-diagonalizable (2D consistent) woodbury solve."""
    from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem

    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=8))
    sol = prob.solve(SolverConfig(method="woodbury"))
    rel_spec = prob.relative_residual_f64(sol)
    x = np.stack([np.asarray(sol.u, np.float64), np.asarray(sol.p, np.float64)])
    b = np.asarray(prob.rhs, np.float64)
    rel_host = float(
        np.linalg.norm((prob.operator.matvec_host_f64(x) - b).ravel()) / np.linalg.norm(b)
    )
    assert abs(rel_spec - rel_host) < 1e-12 + 0.1 * max(rel_spec, rel_host)

    p2 = WaveControlProblem(ProblemConfig(N_x=8, N_t=8, dim=2, mass="consistent"))
    s2 = p2.solve(SolverConfig(method="woodbury"))
    assert p2.relative_residual_f64(s2) < 1e-9


def test_scaled_and_unscaled_solutions_agree():
    """Scaled (pc) and unscaled systems describe the same physical problem:
    u_hat = sqrt(gamma) u, p identical (ref :249-250, 281-292)."""
    dim, N_x, N_t, T, gamma = 1, 6, 7, 2.0, 0.5
    dt = T / N_t
    sp = make_space(dim, N_x)
    f, g, u0, u1 = _data(sp, N_t, dt, T, gamma, dim)
    scale = np.sqrt(gamma)

    A_s, b_s = assemble_dense(sp, N_t, dt, gamma, True, scale * f, g, scale * u0, scale * u1)
    A_u, b_u = assemble_dense(sp, N_t, dt, gamma, False, f, g, u0, u1)
    xs = np.linalg.solve(A_s, b_s).reshape(2, N_t, sp.n)
    xu = np.linalg.solve(A_u, b_u).reshape(2, N_t, sp.n)
    np.testing.assert_allclose(xs[0] / scale, xu[0], atol=1e-9)
    np.testing.assert_allclose(xs[1], xu[1], atol=1e-9)


def test_operator_nnz_exact():
    """operator_nnz formulas vs the densified operator's true nonzero count."""
    from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem
    from optimal_control_paradiag_tpu.ops.allatonce import operator_nnz

    for dim, mass, N_x, N_t in (
        (1, "consistent", 9, 7),
        (1, "lumped", 8, 6),
        (2, "consistent", 5, 6),
        (2, "lumped", 5, 6),
    ):
        prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t, dim=dim, mass=mass))
        A = np.asarray(prob.operator.dense())
        assert operator_nnz(prob.operator) == int((A != 0).sum()), (dim, mass)


@pytest.mark.parametrize(
    "dim,N_x,N_t,gamma,scaled,mass",
    [
        (1, 6, 7, 1.0, True, "consistent"),
        (1, 5, 8, 0.25, False, "consistent"),
        (1, 6, 7, 1.0, True, "lumped"),
        (2, 4, 5, 1.0, True, "consistent"),
        (2, 4, 5, 2.0, True, "lumped"),
    ],
)
def test_matvec_accurate_is_the_same_operator(dim, N_x, N_t, gamma, scaled, mass):
    """matvec_accurate is an algebraic rewrite of matvec (nested differences,
    reordered stiffness) -- in float64 they agree to rounding on arbitrary
    (non-smooth) states, boundary rows included."""
    sp = make_space(dim, N_x, mass=mass)
    op = build_operator(sp, N_t, 2.0 / N_t, gamma, scaled=scaled)
    rng = np.random.default_rng(7)
    for _ in range(3):
        x = jnp.asarray(rng.standard_normal((2, N_t, sp.n)))
        np.testing.assert_allclose(
            np.asarray(op.matvec_accurate(x)), np.asarray(op.matvec(x)), atol=1e-13
        )
