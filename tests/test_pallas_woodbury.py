"""Fused Pallas Woodbury solver (paradiag/pallas_woodbury.py): the whole
spectral-domain direct solve -- D^{-1}, slice extractions, 4x4 capacity mix,
injections, and refine defect-correction -- as ONE kernel. Interpret-mode
equality against the jnp half-spectrum path here; compiled-on-hardware
correctness and timing are recorded by the TPU bench (BENCH notes)."""

import jax
import numpy as np
import pytest

from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem
from optimal_control_paradiag_tpu.paradiag.pallas_woodbury import (
    build_pallas_woodbury_solver,
)
from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver


@pytest.mark.parametrize(
    "N_x,N_t,refine",
    [(40, 24, 0), (40, 24, 1), (64, 33, 2), (33, 16, 1)],
)
def test_fused_kernel_matches_jnp_half_spectrum(N_x, N_t, refine):
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    wb_jnp = jax.jit(build_woodbury_solver(prob.operator, refine=refine, half_spectrum=True))
    wb_pl = jax.jit(build_pallas_woodbury_solver(prob.operator, refine=refine, interpret=True))
    x1 = np.asarray(wb_jnp(prob.rhs))
    x2 = np.asarray(wb_pl(prob.rhs))
    assert np.abs(x1 - x2).max() <= 1e-13 * np.abs(x1).max()


def test_fused_kernel_2d_lumped():
    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=12, dim=2, mass="lumped"))
    wb_jnp = jax.jit(build_woodbury_solver(prob.operator, refine=1, half_spectrum=True))
    wb_pl = jax.jit(build_pallas_woodbury_solver(prob.operator, refine=1, interpret=True))
    x1 = np.asarray(wb_jnp(prob.rhs))
    x2 = np.asarray(wb_pl(prob.rhs))
    assert np.abs(x1 - x2).max() <= 1e-13 * np.abs(x1).max()


def test_fused_kernel_solves_system():
    """Direct-solver correctness: residual of the fused solve at 1e-10."""
    prob = WaveControlProblem(ProblemConfig(N_x=48, N_t=32))
    wb_pl = jax.jit(build_pallas_woodbury_solver(prob.operator, refine=1, interpret=True))
    x = wb_pl(prob.rhs)
    r = prob.operator.matvec(x) - prob.rhs
    rel = float(np.linalg.norm(np.asarray(r).ravel()) / np.linalg.norm(np.asarray(prob.rhs).ravel()))
    assert rel < 1e-10
