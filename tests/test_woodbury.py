"""Woodbury direct solver (paradiag/spectral.py): the rank-4
Sherman-Morrison-Woodbury solve of the diagonalized all-at-once system.

Exactness oracle: dense LU (the reference's pc=False MUMPS path analogue,
``Control_Wave_PC.py:186``). Covers 1D consistent/lumped mass, 2D lumped,
gamma != 1, N_t divisible by 4 (the Lambda_2 ~ 0 modes) and not, and the
defect-correction refinement loop.
"""

import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem
from optimal_control_paradiag_tpu.paradiag.spectral import (
    build_spectral_system,
    build_woodbury_solver,
)


CASES = [
    dict(N_x=12, N_t=13),
    dict(N_x=9, N_t=16, gamma=0.5),
    dict(N_x=10, N_t=8, mass="lumped", T=1.7),
    dict(N_x=7, N_t=12, dim=2, mass="lumped", gamma=2.0),
]


@pytest.mark.parametrize("kw", CASES)
def test_half_spectrum_dft_matches_fft(kw):
    """The DFT-matmul half-spectrum time transform (the TPU fast path; see
    _build_woodbury_half) is exactly equivalent to the rfft/irfft form,
    odd and even N_t."""
    import jax.numpy as jnp

    prob = WaveControlProblem(ProblemConfig(**kw))
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(prob.operator.shape))
    x_fft = build_woodbury_solver(prob.operator, refine=1, time_transform="fft")(b)
    x_dft = build_woodbury_solver(prob.operator, refine=1, time_transform="dft")(b)
    np.testing.assert_allclose(np.asarray(x_dft), np.asarray(x_fft), rtol=1e-11, atol=1e-13)


@pytest.mark.parametrize("kw", CASES)
def test_half_spectrum_packed_fft_matches_fft(kw):
    """The two-for-one packed time FFT (z = u + i p through one complex
    FFT; r5 headline winner inside the pallas solver) is equivalent to the
    two-real-rfft form, odd and even N_t."""
    import jax.numpy as jnp

    prob = WaveControlProblem(ProblemConfig(**kw))
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(prob.operator.shape))
    x_fft = build_woodbury_solver(prob.operator, refine=1, time_transform="fft")(b)
    x_p = build_woodbury_solver(prob.operator, refine=1, time_transform="fft2")(b)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_fft), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kw", CASES)
def test_half_spectrum_mxu_matches_fft(kw):
    """The four-step MXU matmul time transform (r5 headline fast path;
    ops/transforms.py FourStepPlan) is equivalent to the rfft/irfft form,
    odd and even N_t, square and rectangular radix factorizations."""
    import jax.numpy as jnp

    prob = WaveControlProblem(ProblemConfig(**kw))
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(prob.operator.shape))
    x_fft = build_woodbury_solver(prob.operator, refine=1, time_transform="fft")(b)
    x_mxu = build_woodbury_solver(prob.operator, refine=1, time_transform="mxu")(b)
    np.testing.assert_allclose(np.asarray(x_mxu), np.asarray(x_fft), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kw", CASES, ids=[str(i) for i in range(len(CASES))])
def test_woodbury_matches_dense_lu(kw):
    prob = WaveControlProblem(ProblemConfig(**kw))
    lu = prob.solve(SolverConfig(method="direct"))
    wb = prob.solve(SolverConfig(method="woodbury", refine=0))
    np.testing.assert_allclose(np.asarray(wb.u), np.asarray(lu.u), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(wb.p), np.asarray(lu.p), rtol=0, atol=1e-10)


def test_woodbury_is_exact_inverse_of_spectral_operator():
    """A_hat(T x) == T b to machine precision, per-component."""
    prob = WaveControlProblem(ProblemConfig(N_x=15, N_t=12, gamma=0.7))
    op = prob.operator
    A_hat, _, to_s, _ = build_spectral_system(op)
    solve = build_woodbury_solver(op, refine=0)
    rng = np.random.default_rng(0)
    b = np.asarray(rng.standard_normal(op.shape), dtype=np.float64)
    x = solve(b)
    r = A_hat(to_s(x)) - to_s(b)
    assert float(np.max(np.abs(np.asarray(r)))) < 1e-12


def test_refinement_reduces_residual():
    prob = WaveControlProblem(ProblemConfig(N_x=40, N_t=40))
    r0 = float(prob.residual_norm(prob.solve(SolverConfig(method="woodbury", refine=0))))
    r1 = float(prob.residual_norm(prob.solve(SolverConfig(method="woodbury", refine=1))))
    assert r1 <= r0
    assert r1 < 1e-10


def test_woodbury_2d_consistent_routes_to_smw():
    """2D consistent mass no longer rejects method='woodbury': it routes to
    the SMW + blockline direct solve (paradiag/woodbury2d.py; the round-1
    limitation is gone)."""
    prob = WaveControlProblem(ProblemConfig(N_x=6, N_t=8, dim=2, mass="consistent"))
    sol = prob.solve(SolverConfig(method="woodbury"))
    sol_lu = prob.solve(SolverConfig(method="direct"))
    np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_lu.u), atol=1e-8)


@pytest.mark.parametrize("kw", [dict(N_x=11, N_t=9, gamma=0.5), dict(N_x=6, N_t=8, dim=2, mass="lumped")])
def test_f64_residual_oracle_matches_device_residual(kw):
    """spectral_relative_residual == ||Ax-b||/||b|| (float64, so the device
    matvec is exact too)."""
    prob = WaveControlProblem(ProblemConfig(**kw))
    sol = prob.solve(SolverConfig(method="gmres", rtol=1e-3, maxiter=3, restart=3))
    import jax.numpy as jnp

    direct = float(prob.residual_norm(sol)) / float(np.linalg.norm(np.asarray(prob.rhs).ravel()))
    oracle = prob.relative_residual_f64(sol)
    np.testing.assert_allclose(oracle, direct, rtol=1e-8)


def test_woodbury_error_metric_matches_gmres_path():
    """Same discrete solution => same aligned error as the ParaDiag-GMRES path."""
    prob = WaveControlProblem(ProblemConfig(N_x=20, N_t=20))
    e_wb = prob.error_aligned(prob.solve(SolverConfig(method="woodbury")))
    e_gm = prob.error_aligned(prob.solve(SolverConfig(rtol=1e-12)))
    np.testing.assert_allclose(e_wb, e_gm, rtol=1e-8)
