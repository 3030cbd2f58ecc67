"""One-off: compile + run the on-device pencil eigh at the wall size with
the persistent compilation cache enabled, so later runs get it ~free."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from optimal_control_paradiag_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np
import jax
import jax.numpy as jnp
from optimal_control_paradiag_tpu import native
from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
from optimal_control_paradiag_tpu.paradiag.eigbasis import pencil_eig_device

N = 144
pts, tris = native.unit_square_mesh(N, diagonal="left")
bnd = boundary_nodes(pts.shape[0], tris)
rng = np.random.default_rng(0)
pts = pts.copy()
pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
sp = make_general_space(pts, tris, dtype=jnp.float32)
M, K = sp.mass_dense(), sp.stiffness_dense()
print(f"n={sp.n}; starting device eigh", flush=True)
t0 = time.time()
lam, V = pencil_eig_device(M, K, jnp.float32)
V.block_until_ready()
print(f"device eigh: {time.time()-t0:.0f}s  lam [{lam.min():.3e}, {lam.max():.3e}]", flush=True)
