"""The heat-equation optimal-control model family (models/heat.py):
rank-2 SMW direct solve vs dense LU, circulant-PC GMRES, backward-Euler
convergence, 2D lumped path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.models.heat import HeatControlProblem


def test_woodbury_matches_dense_direct():
    prob = HeatControlProblem(ProblemConfig(N_x=9, N_t=8))
    sol_wb = prob.solve(SolverConfig(method="woodbury"))
    sol_lu = prob.solve(SolverConfig(method="direct"))
    np.testing.assert_allclose(np.asarray(sol_wb.u), np.asarray(sol_lu.u), atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol_wb.p), np.asarray(sol_lu.p), atol=1e-10)
    assert prob.relative_residual(sol_wb) < 1e-12


def test_gmres_paradiag_pc_converges_fast():
    """The rank-2 correction means the preconditioned operator is identity +
    rank-2: GMRES must converge in a handful of iterations, mesh-independent."""
    iters = {}
    for N in (16, 32, 64):
        prob = HeatControlProblem(ProblemConfig(N_x=N, N_t=N))
        sol = prob.solve(SolverConfig(method="gmres", rtol=1e-10))
        assert bool(sol.result.converged)
        assert prob.relative_residual(sol) < 1e-8
        iters[N] = int(sol.result.iterations)
    assert max(iters.values()) <= 5, iters
    assert max(iters.values()) - min(iters.values()) <= 1, iters


def test_backward_euler_convergence_order():
    """Manufactured solution: error is O(tau) (backward Euler dominates at
    fine h) -- halving tau roughly halves the error."""
    errs = {}
    for N_t in (16, 32, 64):
        prob = HeatControlProblem(ProblemConfig(N_x=128, N_t=N_t))
        sol = prob.solve(SolverConfig(method="woodbury"))
        errs[N_t] = prob.error_vs_analytic(sol)
    r1 = errs[16] / errs[32]
    r2 = errs[32] / errs[64]
    assert 1.5 < r1 < 2.6, errs
    assert 1.5 < r2 < 2.6, errs


def test_2d_lumped_direct():
    prob = HeatControlProblem(ProblemConfig(N_x=12, N_t=10, dim=2, mass="lumped"))
    sol = prob.solve(SolverConfig(method="woodbury"))
    assert prob.relative_residual(sol) < 1e-11


def test_gamma_and_unscaled_guard():
    prob = HeatControlProblem(ProblemConfig(N_x=9, N_t=8, gamma=0.5))
    sol = prob.solve(SolverConfig(method="woodbury"))
    sol_lu = prob.solve(SolverConfig(method="direct"))
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_lu.u), atol=1e-10)
    with pytest.raises(ValueError, match="scaled"):
        HeatControlProblem(ProblemConfig(N_x=9, N_t=8, scaled=False))


def test_autodiff_lagrangian_oracle():
    """Derivation oracle (the heat analogue of the reference's
    ``fd.derivative(S, U)`` path, Func_Version.py:102): the gradient of the
    discrete Lagrangian

      L(uh, p) = sum_i [ tau/2 ||uh_i/sqrt(g) - g_i||_M^2
                 - tau/(2 g) ||p_i||_M^2
                 + p_i^T (M(uh_i - uh_{i-1}) + tau K uh_i - tau M fh_i)/sqrt(g) ]

    (control eliminated, sqrt(gamma)-scaled state, uh_0 given) must equal the
    hand-written all-at-once residual with the blocks SWAPPED:
    sqrt(g) * grad L = (p-row residual, u-row residual). This independently
    validates both ``matvec`` and ``rhs`` at gamma != 1."""
    g = 0.7
    prob = HeatControlProblem(ProblemConfig(N_x=9, N_t=8, gamma=g))
    sp, tau = prob.space, prob.tau
    d = prob._data
    sqg = np.sqrt(g)

    def lagrangian(x):
        uh, p = x[0], x[1]
        um1 = jnp.concatenate([d["u0"][None], uh[:-1]], axis=0)
        mdot = lambda a, b: jnp.sum(a * jax.vmap(sp.apply_mass)(b))
        kdot = lambda a, b: jnp.sum(a * jax.vmap(sp.apply_stiffness)(b))
        track = uh / sqg - d["g"]
        L = 0.5 * tau * mdot(track, track) - 0.5 * tau / g * mdot(p, p)
        L = L + (mdot(p, uh - um1) + tau * kdot(p, uh) - tau * mdot(p, d["f"])) / sqg
        return L

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, sp.n)))
    grad = jax.grad(lagrangian)(x)
    resid = prob.matvec(x) - prob.rhs
    np.testing.assert_allclose(np.asarray(sqg * grad[0]), np.asarray(resid[1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sqg * grad[1]), np.asarray(resid[0]), atol=1e-12)


def test_consistent_mass_2d_tensor_pc_flat_iterations():
    """2D consistent mass: method='woodbury' dispatches to GMRES with the
    EXACT tensor-mass surrogate SMW as preconditioner; iterations stay flat
    across mesh refinement and the residual is direct-grade."""
    iters = {}
    for N in (8, 16, 32):
        prob = HeatControlProblem(ProblemConfig(N_x=N, N_t=N, dim=2, mass="consistent"))
        sol = prob.solve(SolverConfig(method="woodbury"))
        assert bool(sol.result.converged)
        assert prob.relative_residual(sol) < 1e-9
        iters[N] = int(sol.result.iterations)
    assert max(iters.values()) <= 8, iters
    assert max(iters.values()) - min(iters.values()) <= 2, iters
    # raw spectral build still rejects non-diagonalizable spaces
    prob = HeatControlProblem(ProblemConfig(N_x=8, N_t=6, dim=2, mass="consistent"))
    with pytest.raises(ValueError, match="diagonalizable"):
        prob.build_woodbury_solver()


def test_host_f64_oracle_matches_device_matvec():
    """matvec_host_f64 is an exact numpy twin of the device matvec (f64),
    and relative_residual_f64 of a direct solve is at rounding level."""
    prob = HeatControlProblem(ProblemConfig(N_x=13, N_t=8, gamma=0.5))
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, prob.space.n))
    np.testing.assert_allclose(
        prob.matvec_host_f64(x), np.asarray(prob.matvec(jnp.asarray(x))), atol=1e-13
    )
    sol = prob.solve(SolverConfig(method="woodbury"))
    assert prob.relative_residual_f64(sol) < 1e-12


def test_batched_multi_rhs():
    """vmap over the SMW direct solve: one compiled program, B systems."""
    prob = HeatControlProblem(ProblemConfig(N_x=17, N_t=8))
    wb = jax.jit(jax.vmap(prob.build_woodbury_solver(refine=0)))
    rng = np.random.default_rng(7)
    bs = jnp.asarray(rng.standard_normal((4, 2, 8, prob.space.n)))
    xs = wb(bs)
    single = jax.jit(prob.build_woodbury_solver(refine=0))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(single(bs[i])), atol=1e-12)


def test_symmetrized_minres():
    """The heat KKT system symmetrizes by the same block-row swap as the
    wave (models/heat.py:build_symmetric_system): asymmetry is exactly 0,
    the scalar sqrt(det) SPD preconditioner gives flat ~6 iterations, and
    the solution matches the SMW direct solve to rounding."""
    prob = HeatControlProblem(ProblemConfig(N_x=7, N_t=6, gamma=0.8))
    mv, _, _ = prob.build_symmetric_system()
    m = 2 * 6 * prob.space.n
    eye = np.eye(m)
    cols = np.stack(
        [np.asarray(mv(jnp.asarray(eye[j]).reshape(2, 6, -1)).reshape(-1)) for j in range(m)],
        axis=1,
    )
    assert np.abs(cols - cols.T).max() == 0.0

    iters = {}
    for N in (16, 32, 64):
        p = HeatControlProblem(ProblemConfig(N_x=N, N_t=N))
        sm = p.solve(SolverConfig(method="minres", rtol=1e-10, maxiter=200))
        sw = p.solve(SolverConfig(method="woodbury"))
        assert bool(sm.result.converged)
        np.testing.assert_allclose(np.asarray(sm.u), np.asarray(sw.u), atol=1e-12)
        iters[N] = int(sm.result.iterations)
    assert max(iters.values()) <= 8, iters
    assert max(iters.values()) - min(iters.values()) <= 1, iters

    # 2D consistent mass: exact symmetry, tensor-surrogate SPD PC
    p = HeatControlProblem(ProblemConfig(N_x=12, N_t=8, dim=2, mass="consistent"))
    sm = p.solve(SolverConfig(method="minres", rtol=1e-8, maxiter=300))
    assert bool(sm.result.converged)
    assert int(sm.result.iterations) <= 15
    assert p.relative_residual(sm) < 1e-7


def test_polish_ladder_f32():
    """The wave family's accuracy ladder wired into heat (VERDICT r3 item 2):
    plain f32 SMW stops at the representation floor; one physical-space
    polish pass with the cancellation-aware matvec + dword two-float pair
    lands the f64-oracle residual orders below it."""
    prob = HeatControlProblem(ProblemConfig(N_x=256, N_t=128, dtype=jnp.float32))
    b = prob.rhs
    wb = jax.jit(prob.build_woodbury_solver(refine=1))
    x = wb(b)
    bb = np.asarray(b, np.float64)

    def rel(xs):
        r = prob.matvec_host_f64(xs) - bb
        return float(np.linalg.norm(r.ravel()) / np.linalg.norm(bb.ravel()))

    rel_plain = rel(np.asarray(x, np.float64))
    assert rel_plain < 5e-3  # the f32 floor at this size

    pol = jax.jit(prob.build_polished_solver(polish=1, dword=True))
    xe = pol(b)
    xs = np.asarray(xe[0], np.float64) + np.asarray(xe[1], np.float64)
    rel_dword = rel(xs)
    assert rel_dword < 1e-6, (rel_plain, rel_dword)
    assert rel_dword < rel_plain / 50

    # solve() dispatch honours polish (single-float result: on the floor)
    sol = prob.solve(SolverConfig(method="woodbury", polish=1))
    assert rel(np.stack([np.asarray(sol.u, np.float64), np.asarray(sol.p, np.float64)])) <= rel_plain * 1.5


def test_2d_manufactured_convergence():
    """2D validation (VERDICT r3 item 3): the separable product-sine
    manufactured solution gives a REAL error metric for dim=2 -- error halves
    per tau-halving at fixed N_x, like the 1D study."""
    errs = {}
    for N_t in (8, 16, 32):
        prob = HeatControlProblem(ProblemConfig(N_x=64, N_t=N_t, dim=2, mass="lumped"))
        sol = prob.solve(SolverConfig(method="woodbury"))
        errs[N_t] = prob.error_vs_analytic(sol)
    r1 = errs[8] / errs[16]
    r2 = errs[16] / errs[32]
    assert 1.5 < r1 < 2.6, errs
    assert 1.5 < r2 < 2.6, errs
    # consistent mass reaches the same manufactured solution (tensor-PC
    # path); at this coarse h the lumped-mass O(h^2) term still contributes,
    # so check same-order agreement (consistent is the more accurate one)
    prob = HeatControlProblem(ProblemConfig(N_x=24, N_t=16, dim=2, mass="consistent"))
    sol = prob.solve(SolverConfig(method="woodbury"))
    lump = HeatControlProblem(ProblemConfig(N_x=24, N_t=16, dim=2, mass="lumped"))
    sol_l = lump.solve(SolverConfig(method="woodbury"))
    e_c, e_l = prob.error_vs_analytic(sol), lump.error_vs_analytic(sol_l)
    assert e_c <= 1.2 * e_l, (e_c, e_l)
    assert e_l / 3.0 < e_c < 3.0 * e_l, (e_c, e_l)


def test_pallas_kernel_matches_jnp(monkeypatch):
    """The fused rank-2 Pallas kernel (interpret mode on CPU) agrees with
    the jnp SMW path to rounding, refine 0 and 1, even and odd N_t."""
    for N_t in (8, 9):
        prob = HeatControlProblem(ProblemConfig(N_x=17, N_t=N_t))
        for refine in (0, 1):
            sp = prob.solve(SolverConfig(method="woodbury", refine=refine, use_pallas=True))
            sj = prob.solve(SolverConfig(method="woodbury", refine=refine))
            np.testing.assert_allclose(np.asarray(sp.u), np.asarray(sj.u), atol=1e-11)
            np.testing.assert_allclose(np.asarray(sp.p), np.asarray(sj.p), atol=1e-11)
