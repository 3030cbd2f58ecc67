"""Heat-family float32 representation floor at the bench size.

Question raised by the first hardware run of the ``heat_woodbury`` bench
stage (N_x=2048, N_t=1024, f32): rel_f64 came out 1.61e-2 -- 20x the wave
family's 7.2e-4 at the same size. Bug or floor?

Answer: FLOOR. The heat all-at-once system has a much larger f32
residual floor than the wave system because its RHS is O(tau*M) ~ tau*h
per row while the operator's stiff modes are O(tau*K) ~ tau/h: rounding
the solution injects ||A dx|| ~ eps_32 * (tau/h) * ||x||, and
||x|| / ||b|| ~ 1/(tau*h) at this size. (The wave system's dt^2-scaled
rows keep the same ratio ~30x smaller.)

Measured (CPU, this host, 2026-08-21, jax x64):

    f64 SMW solve rel residual:     5.83e-11   (exact, as designed)
    f32 REPRESENTATION floor:       1.116e-2   (round exact f64 x to f32)
    f32 SMW refine=0 rel_f64:       1.480e-2   (1.33x floor)
    f32 SMW refine=1 rel_f64:       1.481e-2   (refine cannot help: the
    f32 SMW refine=2 rel_f64:       1.480e-2    defect IS representation)

So the hardware 1.61e-2 is the solve landing on the floor (TPU transforms
add ~8%); the bench stage gates at <= 2x the floor and records the floor
alongside. Accuracy below the floor needs the dword (two-float) solution
carrier, as in the wave family's build_polished_solver(dword=True).

Run: env JAX_PLATFORMS=cpu python artifacts/experiments/heat_floor_experiment.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu import ProblemConfig
from optimal_control_paradiag_tpu.models.heat import HeatControlProblem, HeatSolution

N_X, N_T = 2048, 1024

p64 = HeatControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float64))
x64 = np.asarray(jax.jit(p64.build_woodbury_solver(refine=0))(p64.rhs))
print("f64 rel:", p64.relative_residual_f64(HeatSolution(u=x64[0], p=x64[1], result=None)))

x32 = x64.astype(np.float32).astype(np.float64)
print(
    "f32 representation floor:",
    p64.relative_residual_f64(HeatSolution(u=x32[0], p=x32[1], result=None)),
)

p32 = HeatControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32))
for r in (0, 1, 2):
    x = np.asarray(jax.jit(p32.build_woodbury_solver(refine=r))(p32.rhs))
    s = HeatSolution(u=x[0], p=x[1], result=None)
    print(f"f32 refine={r} rel_f64:", p32.relative_residual_f64(s))
