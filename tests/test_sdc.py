"""Blocked spectral divide-and-conquer eigensolver (paradiag/sdc.py).

The at-scale TPU replacement for the monolithic pencil eigh in the
unstructured setup path (reference parity target: MUMPS' setup scaling,
``Control_Wave_PC.py:480-484``). Tests run on CPU with a small base_size so
the recursion actually exercises multiple split levels.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimal_control_paradiag_tpu.paradiag.sdc import pencil_eig_sdc, sdc_eigh


def _random_sym(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)).astype(np.float32)
    return (A + A.T) / 2


def test_sdc_matches_lapack_eigenvalues():
    S = _random_sym(300)
    lam, V = sdc_eigh(jnp.asarray(S), base_size=64)
    lam = np.asarray(lam, np.float64)
    lam_ref = np.linalg.eigvalsh(S.astype(np.float64))
    assert sdc_eigh.last_stats["splits"] >= 3  # recursion actually ran
    assert np.all(np.diff(lam) >= -1e-3)  # ascending
    assert np.max(np.abs(np.sort(lam) - lam_ref)) <= 1e-4 * np.max(np.abs(lam_ref))


def test_sdc_residual_and_orthogonality():
    S = _random_sym(257, seed=3)  # odd size: uneven splits
    lam, V = sdc_eigh(jnp.asarray(S), base_size=48)
    lam = np.asarray(lam, np.float64)
    V = np.asarray(V, np.float64)
    R = S.astype(np.float64) @ V - V * lam[None, :]
    assert np.linalg.norm(R) / np.linalg.norm(S) <= 5e-5
    assert np.linalg.norm(V.T @ V - np.eye(V.shape[0])) <= 5e-4


def test_sdc_base_case_is_direct():
    S = _random_sym(50)
    lam, V = sdc_eigh(jnp.asarray(S), base_size=64)
    lam_d, V_d = jnp.linalg.eigh(jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_d), rtol=0, atol=1e-5)


def test_pencil_sdc_matches_host_pencil():
    """FEM-like SPD pencil: the SDC basis must diagonalize (M, K) to
    float32 polar grade and be M-orthonormal."""
    pytest.importorskip("optimal_control_paradiag_tpu.native")
    from optimal_control_paradiag_tpu import native
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    N = 20
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    sp = make_general_space(pts, tris, dtype=jnp.float32)
    M, K = sp.mass_dense(), sp.stiffness_dense()
    lam, V = pencil_eig_sdc(M, K, jnp.float32, base_size=96)
    V = np.asarray(V, np.float64)
    # generalized eigen residual, relative to the stiffness scale
    R = K @ V - (M @ V) * lam[None, :]
    assert np.linalg.norm(R) / np.linalg.norm(K) <= 5e-3
    assert np.linalg.norm(V.T @ M @ V - np.eye(sp.n)) <= 5e-3
    lam_ref = np.linalg.eigvalsh(
        np.linalg.solve(np.linalg.cholesky(M.astype(np.float64)), K.astype(np.float64))
        @ np.linalg.inv(np.linalg.cholesky(M.astype(np.float64))).T
    )
    assert np.max(np.abs(np.sort(lam) - lam_ref)) <= 1e-3 * lam_ref.max()


def test_sdc_basis_drives_richardson_to_floor():
    """End-to-end: an SDC f32 basis through the 2-step Richardson direct
    solve reaches the same f64-oracle residual floor as an exact float64
    LAPACK basis (measured: 3.684e-6 vs 3.682e-6 at N=24 -- the basis
    perturbation is fully erased by the defect correction)."""
    pytest.importorskip("optimal_control_paradiag_tpu.native")
    from optimal_control_paradiag_tpu import ProblemConfig, native
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
    from optimal_control_paradiag_tpu.models.wave import WaveControlProblem, WaveSolution
    from optimal_control_paradiag_tpu.paradiag.eigbasis import (
        EigBasisSpace,
        build_eig_basis,
        build_eig_direct_fn,
    )

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    N, N_t = 16, 16
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    sp = make_general_space(pts, tris, dtype=jnp.float32)
    prob = WaveControlProblem(ProblemConfig(N_x=N, N_t=N_t, dim=2, dtype=jnp.float32), space=sp)
    b = prob.rhs
    lam, V = pencil_eig_sdc(sp.mass_dense(), sp.stiffness_dense(), jnp.float32, base_size=64)
    basis = EigBasisSpace(base=sp, lam=lam, V=V)
    fn = jax.jit(build_eig_direct_fn(prob.operator, basis, steps=2, with_residual=True))
    x, _ = fn(b, basis.V)
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    basis_h = build_eig_basis(sp, method="host")
    fnh = jax.jit(build_eig_direct_fn(prob.operator, basis_h, steps=2, with_residual=True))
    xh, _ = fnh(b, basis_h.V)
    rel_h = prob.relative_residual_f64(WaveSolution(u=xh[0], p=xh[1], result=None))
    assert rel <= max(3.0 * rel_h, 1e-5)
