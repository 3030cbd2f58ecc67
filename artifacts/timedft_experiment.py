"""One-off TPU experiment: half-spectrum time transform fft vs DFT-matmul
inside the Woodbury solve at the headline size (matmul DST in both)."""

import time

import jax
import jax.numpy as jnp
from jax import lax

from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.ops.allatonce import build_operator
from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

N_X, N_T, CHAIN = 2048, 1024, 20


def bench_method(tt: str) -> float:
    sp = make_space(1, N_X, mass="consistent", dtype=jnp.float32)
    op = build_operator(sp, N_T, 2.0 / N_T, 1.0, scaled=True)
    solve = build_woodbury_solver(op, refine=1, time_transform=tt)
    b = jnp.ones(op.shape, jnp.float32)

    @jax.jit
    def chain(b):
        def body(i, carry):
            return b + 1e-20 * solve(carry)

        x = lax.fori_loop(0, CHAIN - 1, body, b)
        return jnp.sum(jnp.abs(solve(x)))

    _ = float(chain(b))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(chain(b))
        ts.append(time.perf_counter() - t0)
    return min(ts) / CHAIN * 1000.0


for m in ("fft", "dft"):
    print(f"time_transform={m}: {bench_method(m):.3f} ms/solve", flush=True)
