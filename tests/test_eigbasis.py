"""Generalized-eigenbasis ParaDiag (paradiag/eigbasis.py): the direct
unstructured solve -- basis algebra, f64 direct accuracy vs the dense
oracle, f32 GMRES iteration counts, and the polish ladder on general
meshes (VERDICT r3 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
from optimal_control_paradiag_tpu.models.wave import WaveSolution
from optimal_control_paradiag_tpu.paradiag.eigbasis import (
    build_eig_basis,
    build_eig_gmres_solver,
    build_eig_woodbury_solver,
    pencil_eig_host,
)

native = pytest.importorskip("optimal_control_paradiag_tpu.native")
if not native.available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


def perturbed_space(N, dtype, seed=0, amp=0.18):
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    rng = np.random.default_rng(seed)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-amp / N, amp / N, size=pts[~bnd].shape)
    return make_general_space(pts, tris, dtype=dtype)


def test_pencil_eig_diagonalizes():
    sp = perturbed_space(8, jnp.float64)
    M, K = sp.mass_dense(), sp.stiffness_dense()
    lam, V = pencil_eig_host(M, K)
    np.testing.assert_allclose(V.T @ M @ V, np.eye(sp.n), atol=1e-12)
    np.testing.assert_allclose(V.T @ K @ V, np.diag(lam), atol=1e-11)
    assert lam.min() > 0


def test_adapter_transforms():
    """dst = V^T (residual side), idst = V (solution side): the per-mode
    solve identity (L1 M + c L2 K) V diag(...)^-1 V^T = inverse holds."""
    sp = perturbed_space(7, jnp.float64)
    basis = build_eig_basis(sp, method="host")
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((3, sp.n)))
    shift = 0.3
    y = basis.idst(basis.dst(r) / (shift + jnp.asarray(basis.lam)))
    A = shift * sp.mass_dense() + sp.stiffness_dense()
    x_ref = np.linalg.solve(A, np.asarray(r).T).T
    np.testing.assert_allclose(np.asarray(y), x_ref, atol=1e-10)


def test_eig_woodbury_direct_f64():
    """The eig-Woodbury is a DIRECT solve on a general mesh: matches the
    dense LU oracle and leaves a rounding-level residual."""
    sp = perturbed_space(9, jnp.float64)
    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=10, dim=2), space=sp)
    wb = jax.jit(build_eig_woodbury_solver(prob.operator, refine=1, eig_method="host"))
    x = wb(prob.rhs)
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    assert rel < 1e-11, rel
    A = prob.operator.dense()
    x_lu = np.linalg.solve(A, np.asarray(prob.rhs, np.float64).reshape(-1)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(x), x_lu, atol=1e-9)


def test_eig_gmres_one_iteration_f64():
    sp = perturbed_space(16, jnp.float64)
    prob = WaveControlProblem(ProblemConfig(N_x=16, N_t=32, dim=2), space=sp)
    solve = jax.jit(
        build_eig_gmres_solver(prob.operator, rtol=1e-10, eig_method="host", with_result=True)
    )
    x, res = solve(prob.rhs)
    assert int(res.iterations) <= 2, int(res.iterations)
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=res))
    assert rel < 1e-10, rel


def test_dispatch_unstructured_woodbury_f32():
    """method='woodbury' on an unstructured f32 space routes to the
    eig-GMRES path: a handful of iterations (vs 100+ for the circulant
    blockband PC at this shape), residual at the f32 working level."""
    sp = perturbed_space(16, jnp.float32)
    prob = WaveControlProblem(
        ProblemConfig(N_x=16, N_t=32, dim=2, dtype=jnp.float32), space=sp
    )
    sol = prob.solve(SolverConfig(method="woodbury"))
    rel = prob.relative_residual_f64(sol)
    assert rel < 5e-4, rel


def test_polish_ladder_unstructured_f32():
    """The wave polish/dword ladder on a GENERAL mesh: the element-form
    nested stiffness (GeneralP1Space.apply_stiffness_nested) measures the
    defect accurately enough to drop the f64-oracle residual well below the
    plain f32 solve's."""
    from optimal_control_paradiag_tpu.paradiag.spectral import build_polished_solver

    sp = perturbed_space(16, jnp.float32)
    prob = WaveControlProblem(
        ProblemConfig(N_x=16, N_t=32, dim=2, dtype=jnp.float32), space=sp
    )
    base = build_eig_gmres_solver(prob.operator, rtol=1e-5, eig_method="host")
    pol = jax.jit(build_polished_solver(prob.operator, polish=1, dword=True, base_solver=base))
    xe = pol(prob.rhs)
    xs = np.asarray(xe[0], np.float64) + np.asarray(xe[1], np.float64)
    b = np.asarray(prob.rhs, np.float64)

    def rel(v):
        r = prob.operator.matvec_host_f64(v) - b
        return float(np.linalg.norm(r.ravel()) / np.linalg.norm(b.ravel()))

    x_plain = np.asarray(jax.jit(base)(prob.rhs), np.float64)
    rel_plain, rel_dword = rel(x_plain), rel(xs)
    # The element-form accurate matvec keeps one O(1/h) cancellation level
    # (vs the structured stencil's none), so its noise floor -- and hence
    # the dword ladder's -- sits a little higher: gate at 5e-6 absolute
    # (the plain f32 eig-GMRES solve itself already lands ~8e-6 at this
    # small size; the ladder's value shows at scale, where the plain floor
    # rises while the ladder's stays put).
    assert rel_dword < 5e-6, (rel_plain, rel_dword)
    assert rel_dword < rel_plain, (rel_plain, rel_dword)


def test_basis_save_load_roundtrip(tmp_path):
    """The eigenbasis persists and restores (the saved-factorization reuse
    the reference's per-run MUMPS factorizations never had)."""
    from optimal_control_paradiag_tpu.paradiag.eigbasis import (
        load_eig_basis,
        save_eig_basis,
    )

    sp = perturbed_space(9, jnp.float64)
    basis = build_eig_basis(sp, method="host")
    path = save_eig_basis(str(tmp_path / "basis"), basis)
    restored = load_eig_basis(path, sp)
    np.testing.assert_allclose(restored.lam, basis.lam)
    np.testing.assert_allclose(np.asarray(restored.V), np.asarray(basis.V))
    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=8, dim=2), space=sp)
    wb = jax.jit(build_eig_woodbury_solver(prob.operator, restored, refine=1))
    x = wb(prob.rhs)
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    assert rel < 1e-11, rel
    with pytest.raises(ValueError, match="does not match"):
        load_eig_basis(path, perturbed_space(7, jnp.float64))


def test_direct_fn_equals_closure_solver():
    """The args-form (fn(b, V)) and closure-form Richardson solvers are the
    same program; the args-form exists so V lowers as an executable
    parameter instead of a multi-GB embedded constant at large n."""
    from optimal_control_paradiag_tpu.paradiag.eigbasis import (
        build_eig_direct_fn,
        build_eig_direct_solver,
    )

    sp = perturbed_space(12, jnp.float32)
    prob = WaveControlProblem(
        ProblemConfig(N_x=12, N_t=16, dim=2, dtype=jnp.float32), space=sp
    )
    basis = build_eig_basis(sp, method="host")
    x_args = jax.jit(build_eig_direct_fn(prob.operator, basis, steps=2))(
        prob.rhs, basis.V
    )
    x_clos = jax.jit(build_eig_direct_solver(prob.operator, basis, steps=2))(prob.rhs)
    np.testing.assert_array_equal(np.asarray(x_args), np.asarray(x_clos))
    rel = prob.relative_residual_f64(WaveSolution(u=x_args[0], p=x_args[1], result=None))
    assert rel < 1e-4, rel
