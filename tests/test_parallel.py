"""Distributed tests on the 8-virtual-CPU-device mesh (conftest sets
``--xla_force_host_platform_device_count=8``) -- the multi-host test
capability the reference lacks (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem
from optimal_control_paradiag_tpu.parallel.sharding import make_layout, make_mesh
from optimal_control_paradiag_tpu.parallel.solve import make_sharded_solver


def _require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


@pytest.mark.parametrize("n_time,n_space", [(8, 1), (4, 2), (2, 2)])
def test_sharded_solve_matches_single_device(n_time, n_space):
    nd = n_time * n_space
    _require_devices(nd)
    N_t, N_x = 16, 17  # N_t % 8 == 0, n = 16 % 8 == 0
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    solver = SolverConfig(rtol=1e-10)
    ref = prob.solve(solver)

    layout = make_layout(n_time, n_space)
    run, sharding = make_sharded_solver(prob, solver, layout)
    b = jax.device_put(prob.rhs, sharding)
    x, res = run(b)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-8)
    assert int(res.iterations) == int(ref.result.iterations)


@pytest.mark.parametrize("n_time,n_space", [(8, 1), (4, 2), (2, 2)])
def test_sharded_woodbury_matches_single_device(n_time, n_space):
    """The direct (Woodbury) solve, sharded over the mesh, equals the
    single-device direct solve to rounding."""
    nd = n_time * n_space
    _require_devices(nd)
    N_t, N_x = 16, 17
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    solver = SolverConfig(method="woodbury")
    ref = prob.solve(solver)

    layout = make_layout(n_time, n_space)
    run, sharding = make_sharded_solver(prob, solver, layout)
    b = jax.device_put(prob.rhs, sharding)
    x, res = run(b)
    assert res is None
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-11)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-11)


@pytest.mark.parametrize("n_time,n_space", [(8, 1), (4, 2)])
def test_sharded_solve_uneven_shards(n_time, n_space):
    """Each mesh has an uneven axis (N_t=12 % 8 != 0; n=19 % 2 != 0): GSPMD
    pads uneven partitions inside the compiled program; the solver returns
    sharding=None and still matches the single-device run exactly."""
    _require_devices(n_time * n_space)
    prob = WaveControlProblem(ProblemConfig(N_x=20, N_t=12))
    solver = SolverConfig(rtol=1e-10)
    ref = prob.solve(solver)

    run, sharding = make_sharded_solver(prob, solver, make_layout(n_time, n_space))
    assert sharding is None
    x, res = run(prob.rhs)
    assert int(res.iterations) == int(ref.result.iterations)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-8)


def test_sharded_solve_float32_iteration_parity():
    """float32 sharded vs single-device: same iteration count and solutions
    to float32 rounding -- the dtype where the DFT-matmul-vs-fft layout swap
    actually matters (SURVEY.md section 5.7)."""
    _require_devices(8)
    prob = WaveControlProblem(ProblemConfig(N_x=17, N_t=16, dtype=jnp.float32))
    solver = SolverConfig(rtol=1e-4)
    ref = prob.solve(solver)
    assert bool(ref.result.converged)

    layout = make_layout(4, 2)
    run, sharding = make_sharded_solver(prob, solver, layout)
    b = jax.device_put(prob.rhs, sharding)
    x, res = run(b)
    assert int(res.iterations) == int(ref.result.iterations)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=5e-5)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=5e-5)


@pytest.mark.parametrize("dtype,atol", [(jnp.float64, 1e-11), (jnp.float32, 2e-4)])
def test_sharded_2d_lumped_woodbury_matches_single_device(dtype, atol):
    """2D sharded coverage (VERDICT r2 item 4): the lumped-mass 2D direct
    solve under the (time, space) mesh equals the single-device solve. The
    2D DST runs as two LOCAL einsums in the bin-sharded layout (space axis
    unsharded there); the K = N_t//2+1 half-spectrum bins shard unevenly
    (GSPMD pads)."""
    _require_devices(8)
    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=16, dim=2, mass="lumped", dtype=dtype))
    ref = prob.solve(SolverConfig(method="woodbury"))
    layout = make_layout(4, 2)
    run, sharding = make_sharded_solver(prob, SolverConfig(method="woodbury"), layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert res is None
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=atol)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=atol)


def test_sharded_2d_lumped_gmres_matches_single_device():
    """2D preconditioned GMRES sharded: same iterations and solution as the
    single-device run."""
    _require_devices(8)
    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=16, dim=2, mass="lumped"))
    solver = SolverConfig(rtol=1e-10)
    ref = prob.solve(solver)
    layout = make_layout(4, 2)
    run, sharding = make_sharded_solver(prob, solver, layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert int(res.iterations) == int(ref.result.iterations)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-8)


def test_sharded_woodbury_half_spectrum_parity_f32():
    """The sharded direct solve now runs the half-spectrum form (K=N_t//2+1
    bins); parity against the single-device half-spectrum solve in float32
    on an uneven mesh split."""
    _require_devices(8)
    prob = WaveControlProblem(ProblemConfig(N_x=17, N_t=16, dtype=jnp.float32))
    ref = prob.solve(SolverConfig(method="woodbury"))
    run, sharding = make_sharded_solver(prob, SolverConfig(method="woodbury"), make_layout(8, 1))
    x, _ = run(jax.device_put(prob.rhs, sharding))
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=2e-4)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=2e-4)


def test_shardmap_rejects_uneven_shards():
    """The explicit-collective shard_map path (fixed per-device blocks) rejects
    non-dividing shapes with a clear error instead of wrong halos."""
    _require_devices(8)
    from optimal_control_paradiag_tpu.parallel.shardmap_ops import build_shardmap_matvec

    prob = WaveControlProblem(ProblemConfig(N_x=21, N_t=12))
    with pytest.raises(ValueError, match="need nt"):
        build_shardmap_matvec(prob.operator, make_layout(8, 1))


def test_mesh_construction():
    _require_devices(8)
    mesh = make_mesh(4, 2)
    assert mesh.axis_names == ("time", "space")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(16, 2)


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as ge

    step, (x0, b) = ge.entry()
    y = jax.jit(step)(x0, b)
    assert y.shape == x0.shape
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("n_time,n_space", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_shardmap_matvec_matches_local(n_time, n_space):
    _require_devices(n_time * n_space)
    from optimal_control_paradiag_tpu.parallel.shardmap_ops import build_shardmap_matvec

    N_t, N_x = 16, 17
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    layout = make_layout(n_time, n_space)
    mv = build_shardmap_matvec(prob.operator, layout)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, N_t, prob.space.n)))
    got = np.asarray(jax.jit(mv)(jax.device_put(x, layout.sharding(layout.canonical_spec))))
    want = np.asarray(prob.operator.matvec(x))
    np.testing.assert_allclose(got, want, atol=1e-11)


@pytest.mark.parametrize("n_time,n_space", [(8, 1), (4, 2), (2, 4)])
def test_shardmap_pc_matches_local(n_time, n_space):
    _require_devices(n_time * n_space)
    from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner
    from optimal_control_paradiag_tpu.parallel.shardmap_ops import build_shardmap_preconditioner

    N_t, N_x = 16, 17  # n = 16
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    layout = make_layout(n_time, n_space)
    pc_ref = build_preconditioner(prob.operator)
    pc_sm = build_shardmap_preconditioner(prob.operator, layout)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.standard_normal((2, N_t, prob.space.n)))
    got = np.asarray(jax.jit(pc_sm)(jax.device_put(r, layout.sharding(layout.canonical_spec))))
    want = np.asarray(pc_ref(r))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_shardmap_end_to_end_gmres():
    """Full solve with the explicit-collective matvec+PC inside plain gmres."""
    _require_devices(8)
    from optimal_control_paradiag_tpu.krylov.gmres import gmres
    from optimal_control_paradiag_tpu.parallel.shardmap_ops import (
        build_shardmap_matvec,
        build_shardmap_preconditioner,
    )

    N_t, N_x = 16, 17
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    layout = make_layout(4, 2)
    mv = build_shardmap_matvec(prob.operator, layout)
    pc = build_shardmap_preconditioner(prob.operator, layout)
    b = jax.device_put(prob.rhs, layout.sharding(layout.canonical_spec))

    @jax.jit
    def run(bb):
        return gmres(mv, bb, M=pc, restart=50, rtol=1e-10, maxiter=100)

    res = run(b)
    ref = prob.solve(SolverConfig(rtol=1e-10))
    assert int(res.iterations) == int(ref.result.iterations)
    np.testing.assert_allclose(np.asarray(res.x[0]), np.asarray(ref.u), atol=1e-8)


def test_multihost_helpers_single_process():
    from optimal_control_paradiag_tpu.parallel import multihost

    multihost.initialize()  # no-op single-process
    info = multihost.process_summary()
    assert info["process_count"] == 1
    layout = multihost.pod_layout(n_space=2)
    assert layout.mesh.devices.size == 8
    with pytest.raises(ValueError):
        multihost.pod_layout(n_space=3)


def test_sharded_heat_woodbury_matches_single_device():
    """Second model family sharded: the heat rank-2 SMW direct solve under
    the (time, space) mesh equals the single-device solve (float64)."""
    _require_devices(8)
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem
    from optimal_control_paradiag_tpu.parallel.solve import make_sharded_heat_solver

    prob = HeatControlProblem(ProblemConfig(N_x=17, N_t=16))
    ref = prob.solve(SolverConfig(method="woodbury"))
    layout = make_layout(4, 2)
    run, sharding = make_sharded_heat_solver(prob, SolverConfig(method="woodbury"), layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert res is None
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-11)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-11)


def test_sharded_heat_2d_consistent_tensor_pc_matches_single_device():
    """Heat on 2D CONSISTENT mass sharded: GMRES preconditioned by the
    sharded tensor-mass surrogate SMW solve converges to the single-device
    answer with the same few iterations."""
    _require_devices(8)
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem
    from optimal_control_paradiag_tpu.parallel.solve import make_sharded_heat_solver

    prob = HeatControlProblem(ProblemConfig(N_x=9, N_t=16, dim=2, mass="consistent"))
    ref = prob.solve(SolverConfig(method="woodbury"))
    layout = make_layout(4, 2)
    run, sharding = make_sharded_heat_solver(prob, SolverConfig(method="woodbury"), layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert bool(res.converged)
    assert int(res.iterations) <= 8
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-8)


def test_sharded_heat_gmres_f32_converges():
    """Sharded heat GMRES with the exact SMW preconditioner in float32:
    one-to-two iterations, residual at the f32 floor."""
    _require_devices(8)
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem, HeatSolution
    from optimal_control_paradiag_tpu.parallel.solve import make_sharded_heat_solver

    prob = HeatControlProblem(ProblemConfig(N_x=17, N_t=16, dtype=jnp.float32))
    layout = make_layout(8, 1)
    run, sharding = make_sharded_heat_solver(prob, SolverConfig(method="gmres", rtol=1e-4), layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert bool(res.converged)
    assert int(res.iterations) <= 3
    import math

    s = math.sqrt(prob.config.gamma)
    sol = HeatSolution(u=x[0] / s, p=x[1], result=res)
    assert prob.relative_residual(sol) < 1e-4


@pytest.mark.parametrize("n_time,n_space", [(8, 1), (4, 2)])
def test_sharded_minres_matches_single_device(n_time, n_space):
    """Symmetrized MINRES sharded (VERDICT r3 item 5): the SPD
    absolute-value-circulant preconditioner is elementwise in diagonalized
    coordinates, so it rides the same stage layouts; solution and iteration
    count match the single-device minres."""
    nd = n_time * n_space
    _require_devices(nd)
    N_t, N_x = 16, 17
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t))
    solver = SolverConfig(method="minres", rtol=1e-10, maxiter=200)
    ref = prob.solve(solver)
    layout = make_layout(n_time, n_space)
    run, sharding = make_sharded_solver(prob, solver, layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-8)
    assert abs(int(res.iterations) - int(ref.result.iterations)) <= 1


def test_sharded_heat_minres_matches_single_device():
    """Heat symmetrized MINRES sharded through the half-spectrum pipeline
    (the parallel/solve.py guard this replaces used to raise)."""
    _require_devices(8)
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem
    from optimal_control_paradiag_tpu.parallel.solve import make_sharded_heat_solver

    prob = HeatControlProblem(ProblemConfig(N_x=17, N_t=16))
    solver = SolverConfig(method="minres", rtol=1e-10, maxiter=200)
    ref = prob.solve(solver)
    layout = make_layout(4, 2)
    run, sharding = make_sharded_heat_solver(prob, solver, layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-9)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-9)


def test_sharded_wave_2d_consistent_tensor_pc_matches_single_device():
    """Wave on 2D CONSISTENT mass sharded: method='woodbury' dispatches to
    GMRES preconditioned by the sharded exact tensor-mass SMW -- same answer
    and iterations as the single-device tensor-PC path."""
    _require_devices(8)
    prob = WaveControlProblem(ProblemConfig(N_x=9, N_t=16, dim=2, mass="consistent"))
    ref = prob.solve(SolverConfig(method="woodbury"))
    layout = make_layout(4, 2)
    run, sharding = make_sharded_solver(prob, SolverConfig(method="woodbury"), layout)
    x, res = run(jax.device_put(prob.rhs, sharding))
    assert bool(res.converged)
    assert int(res.iterations) <= 12
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(ref.u), atol=1e-7)
    np.testing.assert_allclose(np.asarray(x[1]), np.asarray(ref.p), atol=1e-7)


def test_sharded_unstructured_eig_woodbury_matches_single_device():
    """UNSTRUCTURED family sharded (VERDICT r4 item 2): a WaveControlProblem
    over an EigBasisSpace (generalized pencil eigenbasis on a perturbed
    triangle mesh) rides the standard diagonalizable sharded Woodbury path
    -- the basis matmuls (V^T / V) partition under the stage layouts, the
    rank-4 capacity phase-sums become cross-shard reductions, and the
    compiled program schedules ZERO all-gathers. Parity vs the unsharded
    solve on the same basis."""
    _require_devices(8)
    from optimal_control_paradiag_tpu import native
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
    from optimal_control_paradiag_tpu.models.wave import WaveSolution
    from optimal_control_paradiag_tpu.paradiag.eigbasis import build_eig_basis
    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    N, N_t = 17, 16  # n = 256: divisible by every mesh axis
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    sp = make_general_space(pts, tris, dtype=jnp.float32)
    basis = build_eig_basis(sp, method="host")
    prob = WaveControlProblem(
        ProblemConfig(N_x=N, N_t=N_t, dim=2, dtype=jnp.float32), space=basis
    )
    layout = make_layout(4, 2)
    run, sh = make_sharded_solver(prob, SolverConfig(method="woodbury"), layout)
    b = jax.device_put(prob.rhs, sh) if sh is not None else prob.rhs
    x, _ = run(b)
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    assert rel <= 1e-4  # f32 eig-Woodbury grade on this mesh
    x0 = jax.jit(build_woodbury_solver(prob.operator, refine=1))(prob.rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=0, atol=1e-5)
    txt = run.lower(b).compile().as_text()
    assert txt.count("all-gather(") == 0


def test_cli_mesh_file_sharded(tmp_path):
    """--mesh-file with --mesh (r5): a user triangle mesh solved SHARDED
    through the eigenbasis path, end-to-end via the CLI driver."""
    _require_devices(8)
    from optimal_control_paradiag_tpu import native
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes
    from optimal_control_paradiag_tpu.run import main

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    N = 13  # n = 144: divisible by 2 and 4 (space axes used below)
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    mesh_file = str(tmp_path / "mesh.npz")
    np.savez(mesh_file, points=pts, triangles=tris)
    rec = main([
        "--mesh-file", mesh_file, "--mesh", "4,2", "--method", "woodbury",
        "--nt", "16", "--nx", str(N), "--dtype", "float32",
        "--platform", "cpu", "--out", str(tmp_path),
    ])
    assert rec["residual"] <= 1e-4
