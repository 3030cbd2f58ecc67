"""RCM-banded level-Thomas direct solve on unstructured meshes
(paradiag/blockband.py): exactness vs blockdense, end-to-end past the
blockdense memory wall, auto dispatch (VERDICT r2 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
from optimal_control_paradiag_tpu import native
from optimal_control_paradiag_tpu.fem.general import make_general_space
from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.paradiag.blockband import (
    band_profile,
    blockband_entries,
    build_blockband_solver,
)
from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def _perturbed_square(N: int, amp: float = 0.18, seed: int = 0):
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes

    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    rng = np.random.default_rng(seed)
    h = 1.0 / N
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-amp * h, amp * h, size=pts[~bnd].shape)
    return pts, tris


def test_band_profile_reduces_bandwidth():
    """RCM on the perturbed square: bandwidth ~ O(sqrt(n)), far under n."""
    pts, tris = _perturbed_square(16)
    sp = make_general_space(pts, tris)
    perm, m = band_profile(sp)
    assert sorted(perm) == list(range(sp.n))
    assert m < sp.n // 3
    assert blockband_entries(16, sp.n, m) < 16 * (2 * sp.n) ** 2  # beats blockdense


def test_blockband_matches_blockdense_apply():
    """The banded factorization applies the same circulant inverse as the
    dense per-mode factorization, to rounding."""
    pts, tris = _perturbed_square(9, seed=3)
    prob = WaveControlProblem(
        ProblemConfig(N_x=9, N_t=12, dim=2), space=make_general_space(pts, tris)
    )
    pc_band = build_preconditioner(prob.operator, variant="blockband")
    pc_dense = build_preconditioner(prob.operator, variant="blockdense")
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((2, 12, prob.space.n)))
    y_band = np.asarray(jax.jit(pc_band)(r))
    y_dense = np.asarray(jax.jit(pc_dense)(r))
    np.testing.assert_allclose(y_band, y_dense, atol=1e-9 * np.abs(y_dense).max())


def test_blockband_solver_inverts_circulant_modes():
    """Direct check on the half-spectrum solver: P_k w_k = r_k per mode,
    against dense per-mode matrices built independently."""
    from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs

    pts, tris = _perturbed_square(7, seed=1)
    sp = make_general_space(pts, tris)
    prob = WaveControlProblem(ProblemConfig(N_x=7, N_t=8, dim=2), space=sp)
    op = prob.operator
    solve = jax.jit(build_blockband_solver(op))
    n, N_t = sp.n, op.N_t
    rng = np.random.default_rng(2)
    r_real = rng.standard_normal((2, N_t, n))
    rhat = np.fft.ifft(r_real, axis=1)  # Hermitian mode symmetry holds
    w = np.asarray(solve(jnp.asarray(rhat)))

    e = circulant_eigs(N_t, op.dt, op.gamma)
    c = 0.5 * op.dt * op.dt
    theta = op.dt * op.dt / np.sqrt(op.gamma)
    M = np.asarray(sp.mass_dense(), np.float64)
    K = np.asarray(sp.stiffness_dense(), np.float64)
    for k in (0, 1, N_t // 2, N_t - 1):
        P = np.zeros((2 * n, 2 * n), np.complex128)
        P[:n, :n] = e.Lambda1[k] * M + c * e.Lambda2[k] * K
        P[:n, n:] = -theta * M
        P[n:, :n] = theta * M
        P[n:, n:] = np.conj(e.Lambda1[k]) * M + c * np.conj(e.Lambda2[k]) * K
        want = np.linalg.solve(P, np.concatenate([rhat[0, k], rhat[1, k]]))
        got = np.concatenate([w[0, k], w[1, k]])
        np.testing.assert_allclose(got, want, atol=1e-9 * np.abs(want).max())


def test_unstructured_smw_direct_midsize():
    """The space-generic SMW direct solve with blockband P^{-1} (capacity
    GMRES unpreconditioned -- no sine basis on general meshes) + one
    defect-correction pass reaches direct accuracy on a perturbed mesh."""
    from optimal_control_paradiag_tpu.paradiag.woodbury2d import build_woodbury2d_solver

    pts, tris = _perturbed_square(20, seed=5)
    sp = make_general_space(pts, tris)
    prob = WaveControlProblem(ProblemConfig(N_x=20, N_t=16, dim=2), space=sp)
    wb = jax.jit(build_woodbury2d_solver(prob.operator, cap_maxiter=80, refine=1))
    x = wb(prob.rhs)
    r = np.asarray(prob.operator.matvec(x) - prob.rhs)
    rel = np.linalg.norm(r.ravel()) / np.linalg.norm(np.asarray(prob.rhs).ravel())
    # one pass leaves eps ~5e-5; the refine pass squares it (measured 2.2e-9)
    assert rel < 1e-8, rel


@pytest.mark.slow
def test_unstructured_past_blockdense_wall_end_to_end():
    """Unstructured wall-size acceptance (VERDICT r2 item 6): perturbed mesh
    PAST the blockdense 3e8-entry cap (N=36: n=1225, N_t=64 -> blockdense
    would need 3.8e8 entries), solved to DIRECT accuracy by SMW over the
    RCM-banded blockband factorization with iteration-capped capacity GMRES
    + defect-correction passes. Note plain-circulant outer ParaDiag-GMRES
    stalls on 2D-consistent discretizations regardless of inner exactness
    (~300 iterations reach only ~3e-4 here -- the reference via MUMPS would
    behave identically; see tests/test_blockline.py N=64 notes), which is
    why the direct SMW composition is the wall-size recipe."""
    from optimal_control_paradiag_tpu.paradiag.woodbury2d import build_woodbury2d_solver

    pts, tris = _perturbed_square(36, seed=5)
    sp = make_general_space(pts, tris)
    cfg = ProblemConfig(N_x=36, N_t=64, dim=2)
    prob = WaveControlProblem(cfg, space=sp)
    assert cfg.N_t * (2 * sp.n) ** 2 > 3e8
    _, m = band_profile(sp)
    assert blockband_entries(cfg.N_t, sp.n, m) <= 4e8

    # One 300-iteration capacity solve reaches ~9e-8 true relative residual
    # (measured); the refine pass takes it to machine level.
    wb = jax.jit(build_woodbury2d_solver(prob.operator, cap_maxiter=300, refine=1))
    x = wb(prob.rhs)
    r = np.asarray(prob.operator.matvec(x) - prob.rhs)
    rel = np.linalg.norm(r.ravel()) / np.linalg.norm(np.asarray(prob.rhs).ravel())
    assert rel < 1e-9, rel


def test_blockband_rejects_diagonalizable():
    prob = WaveControlProblem(ProblemConfig(N_x=8, N_t=6, dim=2, mass="lumped"))
    with pytest.raises(ValueError, match="diagonalizable"):
        build_blockband_solver(prob.operator)
