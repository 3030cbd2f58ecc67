import sys; sys.path.insert(0, "/root/repo")
import time, sys
import numpy as np
import jax
import jax.numpy as jnp
from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem, native
from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
from optimal_control_paradiag_tpu.models.wave import WaveSolution
from optimal_control_paradiag_tpu.paradiag.eigbasis import build_eig_basis, build_eig_gmres_solver

def mkspace(N, dtype):
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    rng = np.random.default_rng(0)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18/N, 0.18/N, size=pts[~bnd].shape)
    return make_general_space(pts, tris, dtype=dtype)

for N, N_t in ((48, 64), (144, 64)):
    t0 = time.time()
    sp = mkspace(N, jnp.float32)
    print(f"N={N} n={sp.n}: space built ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    basis = build_eig_basis(sp, method="device")
    basis.V.block_until_ready()
    t_eig = time.time() - t0
    print(f"  device eigh: {t_eig:.1f}s  lam range [{basis.lam.min():.3e}, {basis.lam.max():.3e}]", flush=True)
    prob = WaveControlProblem(ProblemConfig(N_x=N, N_t=N_t, dim=2, dtype=jnp.float32), space=sp)
    t0 = time.time()
    solve = jax.jit(build_eig_gmres_solver(prob.operator, basis, rtol=1e-5, with_result=True))
    x, res = solve(prob.rhs)
    jax.block_until_ready(x)
    t_solve = time.time() - t0
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=res))
    print(f"  solve: iters {int(res.iterations)} rel_f64 {rel:.3e} compile+run {t_solve:.1f}s", flush=True)
    t0 = time.time()
    x, res = solve(prob.rhs); jax.block_until_ready(x)
    print(f"  cached solve: {(time.time()-t0)*1e3:.1f} ms", flush=True)
print("DONE", flush=True)
