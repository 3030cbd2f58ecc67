"""FFT-axis layout experiment (headline optimization candidate).

The breakdown (headline_breakdown.json) shows rfft+irfft over axis=1 of the
(2, N_t, n) state costs ~1.14 ms round trip at the headline size -- ~60 GB/s
effective on a 819 GB/s part, because the transform axis is strided (n=2047
contiguous elements between successive time samples). Candidates:

  a. rfft over axis 1 directly                      (baseline)
  b. transpose -> rfft over the LAST axis -> transpose back
  c. full solve with each variant (does XLA already fix it in context?)

Run on the TPU: python artifacts/experiments/fft_layout_experiment.py
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem

N_X = int(os.environ.get("BENCH_NX", 2048))
N_T = int(os.environ.get("BENCH_NT", 1024))
CHAIN = int(os.environ.get("BENCH_CHAIN", 50))
REPS = int(os.environ.get("BENCH_REPS", 3))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fft_layout.json")


def chain_time(fn, x0, chain=CHAIN, reps=REPS):
    @jax.jit
    def chain_fn(x):
        def body(i, carry):
            return x + 1e-20 * fn(carry)

        xl = jax.lax.fori_loop(0, chain - 1, body, x) if chain > 1 else x
        return jnp.sum(jnp.abs(fn(xl)))

    _ = float(chain_fn(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chain_fn(x0))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / chain


def main():
    prob = WaveControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32))
    b = prob.rhs
    N_t = prob.config.N_t

    def rt_axis1(x):
        return jnp.fft.irfft(jnp.fft.rfft(x, axis=1), n=N_t, axis=1)

    def rt_last(x):
        xt = jnp.swapaxes(x, 1, 2)
        yt = jnp.fft.irfft(jnp.fft.rfft(xt, axis=-1), n=N_t, axis=-1)
        return jnp.swapaxes(yt, 1, 2)

    res = {
        "rfft_irfft_axis1_ms": round(chain_time(rt_axis1, b) * 1e3, 3),
        "rfft_irfft_transposed_last_ms": round(chain_time(rt_last, b) * 1e3, 3),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
