"""Preconditioner properties:

(a) P^{-1} is an exact inverse of the block-circulant operator (the property
    the reference only gestures at with its disabled mass-solve sanity check,
    ``Control_Wave_PC.py:476-484``);
(b) the 'fulldiag' TPU fast path and the 'eig' reference-math path apply the
    same operator to floating-point accuracy;
(c) robustness at N_t divisible by 4 (Lambda_2(N_t/4) ~ 0), where the
    reference's eig route divides by ~1e-16.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.ops.allatonce import build_operator
from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner


def circulant_matvec(op, x):
    """The block-circulant analogue P of the all-at-once operator: periodic
    time stencils, full-weight coupling everywhere."""
    sp = op.space
    u, p = x[0], x[1]
    d2h = 0.5 * op.dt * op.dt
    mu, mp = sp.apply_mass(u), sp.apply_mass(p)
    ku, kp = sp.apply_stiffness(u), sp.apply_stiffness(p)
    roll = lambda a, s: jnp.roll(a, s, axis=0)
    au = (mu - 2 * roll(mu, 1) + roll(mu, 2)) + d2h * (ku + roll(ku, 2)) - op.c_up * mp
    ap = op.c_pu * mu + (mp - 2 * roll(mp, -1) + roll(mp, -2)) + d2h * (kp + roll(kp, -2))
    return jnp.stack([au, ap])


@pytest.mark.parametrize(
    "dim,N_x,N_t,gamma,mass,variant",
    [
        (1, 8, 7, 1.0, "consistent", "fulldiag"),
        (1, 8, 7, 1.0, "consistent", "eig"),
        (1, 6, 9, 0.5, "lumped", "fulldiag"),
        (2, 5, 6, 1.0, "lumped", "fulldiag"),
        (2, 5, 6, 1.0, "lumped", "eig"),
    ],
)
def test_pc_exactly_inverts_circulant_operator(dim, N_x, N_t, gamma, mass, variant):
    sp = make_space(dim, N_x, mass=mass)
    op = build_operator(sp, N_t, 2.0 / N_t, gamma, scaled=True)
    pc = build_preconditioner(op, variant=variant)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, N_t, sp.n)))
    r = circulant_matvec(op, x)
    y = pc(r)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-9)


@pytest.mark.parametrize("N_t", [7, 8, 81])
def test_fulldiag_equals_eig_variant(N_t):
    sp = make_space(1, 10)
    op = build_operator(sp, N_t, 2.0 / N_t, 1.0, scaled=True)
    pc_f = build_preconditioner(op, variant="fulldiag")
    pc_e = build_preconditioner(op, variant="eig")
    rng = np.random.default_rng(4)
    r = jnp.asarray(rng.standard_normal((2, N_t, sp.n)))
    yf = np.asarray(pc_f(r))
    ye = np.asarray(pc_e(r))
    tol = 1e-10 if N_t % 4 else 1e-6  # eig route loses digits at Lambda_2 ~ 0
    np.testing.assert_allclose(yf, ye, atol=tol * np.abs(yf).max())


def test_fulldiag_robust_at_singular_lambda2():
    """N_t = 8: mode k=2 has Lambda_2 = 1 + e^{i pi} ~ 1e-16. The fulldiag
    path must still invert the circulant operator exactly."""
    sp = make_space(1, 8)
    N_t = 8
    op = build_operator(sp, N_t, 2.0 / N_t, 1.0, scaled=True)
    pc = build_preconditioner(op, variant="fulldiag")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, N_t, sp.n)))
    np.testing.assert_allclose(np.asarray(pc(circulant_matvec(op, x))), np.asarray(x), atol=1e-9)


def test_pc_requires_scaled_system():
    sp = make_space(1, 8)
    op = build_operator(sp, 7, 0.25, 1.0, scaled=False)
    with pytest.raises(ValueError):
        build_preconditioner(op)
