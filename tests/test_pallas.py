"""Pallas fused spectral-step kernel vs the jnp reference path (interpret
mode on CPU; the real kernel runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem
from optimal_control_paradiag_tpu.paradiag.pallas_spectral import build_pallas_spectral_step
from optimal_control_paradiag_tpu.paradiag.spectral import build_spectral_system


@pytest.mark.parametrize("N_x,N_t,mass,dim", [(20, 12, "consistent", 1), (9, 8, "lumped", 2)])
def test_pallas_step_matches_jnp(N_x, N_t, mass, dim):
    prob = WaveControlProblem(
        ProblemConfig(N_x=N_x, N_t=N_t, dim=dim, mass=mass, dtype=jnp.float32)
    )
    op = prob.operator
    A_hat, D_inv, to_s, from_s = build_spectral_system(op)
    step = build_pallas_spectral_step(op, interpret=True)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(
        (rng.standard_normal((2, N_t, op.space.n)) + 1j * rng.standard_normal((2, N_t, op.space.n))).astype(np.complex64)
    )
    want = np.asarray(D_inv(A_hat(xi)))
    got = np.asarray(step(xi))
    np.testing.assert_allclose(got, want, atol=5e-6)
