"""Unit tests for the P1 assembler: element matrices vs closed forms
(SURVEY.md section 2.2), stencil vs dense, sine-transform diagonalization."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.fem.space import make_space


def test_1d_mass_stiffness_closed_form():
    N_x = 7
    sp = make_space(1, N_x)
    h = 1.0 / N_x
    n = N_x - 1
    M = sp.mass_dense()
    K = sp.stiffness_dense()
    Mref = np.zeros((n, n))
    Kref = np.zeros((n, n))
    for i in range(n):
        Mref[i, i] = 4 * h / 6
        Kref[i, i] = 2 / h
        if i + 1 < n:
            Mref[i, i + 1] = Mref[i + 1, i] = h / 6
            Kref[i, i + 1] = Kref[i + 1, i] = -1 / h
    np.testing.assert_allclose(M, Mref, atol=1e-14)
    np.testing.assert_allclose(K, Kref, atol=1e-12)


def test_1d_mass_exact_integrals():
    # M integrates P1 interpolants exactly: 1^T M 1 = volume of (0,1) since
    # interior hat functions + boundary hats partition unity; with boundary
    # rows eliminated 1^T M 1 = 1 - h/3 - h/3 ... check against quadrature.
    N_x = 11
    sp = make_space(1, N_x)
    one = jnp.ones(sp.n)
    total = float(one @ sp.apply_mass(one))
    # integral of (sum of interior hats)^2: 1 on [h, 1-h], ramps at ends
    h = sp.h
    exact = (1 - 2 * h) + 2 * (h / 3)
    assert abs(total - exact) < 1e-13


def test_2d_stiffness_is_five_point():
    sp = make_space(2, 5)
    K = sp.stiffness_dense()
    n1 = sp.n1d
    # interior node (2,2) flat index
    idx = 2 * n1 + 2
    row = K[idx]
    expect = np.zeros(sp.n)
    expect[idx] = 4.0
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        expect[(2 + dy) * n1 + (2 + dx)] = -1.0
    np.testing.assert_allclose(row, expect, atol=1e-14)


def test_2d_mass_row_sums_and_symmetry():
    sp = make_space(2, 6)
    M = sp.mass_dense()
    np.testing.assert_allclose(M, M.T, atol=1e-14)
    h = sp.h
    # interior-of-interior rows sum to h^2 (partition of unity)
    n1 = sp.n1d
    idx = 2 * n1 + 2
    assert abs(M[idx].sum() - h * h) < 1e-14
    # lumped mass equals row sums of the full (non-eliminated) matrix = h^2
    spl = make_space(2, 6, mass="lumped")
    Ml = spl.mass_dense()
    np.testing.assert_allclose(Ml, h * h * np.eye(sp.n), atol=1e-14)


@pytest.mark.parametrize("dim,mass", [(1, "consistent"), (1, "lumped"), (2, "lumped")])
def test_dst_diagonalizes_operators(dim, mass):
    sp = make_space(dim, 8, mass=mass)
    muM, muK = sp.spectrum
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(sp.n))
    # V^{-1} O V x == diag(mu) x
    for op, mu in ((sp.apply_mass, muM), (sp.apply_stiffness, muK)):
        lhs = sp.idst(op(sp.dst(x)))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(mu * x), atol=1e-12)


def test_dst_roundtrip_and_orthogonality():
    sp = make_space(1, 9)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(sp.n))
    np.testing.assert_allclose(np.asarray(sp.idst(sp.dst(x))), np.asarray(x), atol=1e-13)
    V = np.asarray(sp.dst_matrix)
    np.testing.assert_allclose(V @ V, (sp.N_x / 2) * np.eye(sp.n), atol=1e-12)


def test_2d_consistent_mass_not_diagonalizable():
    sp = make_space(2, 6)
    assert not sp.diagonalizable


def test_interpolate_coords():
    sp = make_space(1, 4)
    vals = np.asarray(sp.interpolate(lambda x: x * 2))
    np.testing.assert_allclose(vals, [0.5, 1.0, 1.5])
    sp2 = make_space(2, 3)
    vx = np.asarray(sp2.interpolate(lambda x, y: x))
    vy = np.asarray(sp2.interpolate(lambda x, y: y))
    np.testing.assert_allclose(vx, [1 / 3, 2 / 3, 1 / 3, 2 / 3])
    np.testing.assert_allclose(vy, [1 / 3, 1 / 3, 2 / 3, 2 / 3])
