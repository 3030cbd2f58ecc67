"""One-off TPU experiment: fft-DST vs matmul-DST inside the Woodbury solve
at the headline size (N_x=2048, N_t=1024, float32). Chained-solve protocol
as in bench.py."""

import time

import jax
import jax.numpy as jnp
from jax import lax

from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.ops.allatonce import build_operator
from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

N_X, N_T, CHAIN = 2048, 1024, 20


def bench_method(dst_method: str) -> float:
    sp = make_space(1, N_X, mass="consistent", dtype=jnp.float32, dst_method=dst_method)
    op = build_operator(sp, N_T, 2.0 / N_T, 1.0, scaled=True)
    solve = build_woodbury_solver(op, refine=1)
    b = jnp.ones(op.shape, jnp.float32)

    @jax.jit
    def chain(b):
        def body(i, carry):
            return b + 1e-20 * solve(carry)

        x = lax.fori_loop(0, CHAIN - 1, body, b)
        x = solve(x)
        return jnp.sum(jnp.abs(x))

    _ = float(chain(b))  # compile + warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(chain(b))
        ts.append(time.perf_counter() - t0)
    return min(ts) / CHAIN * 1000.0


for m in ("fft", "matmul"):
    print(f"dst={m}: {bench_method(m):.3f} ms/solve", flush=True)
