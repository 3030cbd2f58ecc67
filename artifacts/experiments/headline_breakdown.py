"""Headline cycle accounting (VERDICT r3 item 4): time each stage of the
half-spectrum Woodbury solve separately on hardware, so the 2.36 ms headline
is attributed instead of half-unexplained (roofline said 0.44 MXU / 0.16 HBM).

Stages timed (each as its own jitted chained program, bench.py protocol):
  dst_fwd      -- spatial DST matmul on the real (2, N_t, n) state
  rfft         -- time rfft on the DST output
  wb_apply     -- the elementwise spectral Woodbury (D^-1, extract, 4x4 mix)
  irfft+idst   -- the inverse transforms
  full         -- the complete solve (refine=1)

Run on the TPU:  python artifacts/experiments/headline_breakdown.py
Writes artifacts/experiments/headline_breakdown.json.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem
from optimal_control_paradiag_tpu.paradiag import spectral as sp_mod

N_X = int(os.environ.get("BENCH_NX", 2048))
N_T = int(os.environ.get("BENCH_NT", 1024))
CHAIN = int(os.environ.get("BENCH_CHAIN", 50))
REPS = int(os.environ.get("BENCH_REPS", 3))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "headline_breakdown.json")


def chain_time(fn, x0, chain=CHAIN, reps=REPS):
    """Median per-apply seconds; fn must map its input to a same-shaped
    output (chained by perturbation, fenced by a scalar)."""

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
    op = prob.operator
    space = op.space
    b = prob.rhs
    N_t = op.N_t
    K = N_t // 2 + 1
    n = space.n

    pl = sp_mod._spectral_plan(op)
    # Rebuild the half-spectrum pieces exactly as _build_woodbury_half does,
    # but exposed stage by stage.
    full = jax.jit(sp_mod.build_woodbury_solver(op, refine=1))
    full0 = jax.jit(sp_mod.build_woodbury_solver(op, refine=0))

    cdtype = jnp.complex64
    s_real = b  # (2, N_t, n) real
    s_spec = jnp.conj(jnp.fft.rfft(space.dst(b), axis=1)) * (1.0 / N_t)  # (2, K, n) c64

    res = {"config": {"N_x": N_X, "N_t": N_T, "chain": CHAIN}}

    # 1. DST forward (real state)
    res["dst_fwd_ms"] = chain_time(lambda x: space.dst(x), s_real) * 1e3
    # 2. rfft magnitude: time rfft+irfft round trip on the real state, halve
    rtrip = lambda x: jnp.fft.irfft(jnp.fft.rfft(x, axis=1), n=N_t, axis=1)
    res["rfft_irfft_roundtrip_ms"] = chain_time(rtrip, s_real) * 1e3
    # 3. elementwise Woodbury on the spectral half-state: isolate by
    # differencing refine=0 full solve vs transforms (below), and directly:
    #    D_inv twice + extract + mix ~ wb_apply; approximate with
    #    (full0 - transforms) in the report.
    res["idst_ms"] = chain_time(lambda x: space.idst(x), s_real) * 1e3
    # 4. full solves
    res["full_refine0_ms"] = chain_time(full0, b) * 1e3
    res["full_refine1_ms"] = chain_time(full, b) * 1e3

    # Attribution: transforms = dst + rfft/irfft + idst; elementwise = rest.
    transforms = (
        res["dst_fwd_ms"] + res["rfft_irfft_roundtrip_ms"] + res["idst_ms"]
    )
    res["attributed"] = {
        "transforms_ms": round(transforms, 3),
        "elementwise_plus_overhead_ms_refine0": round(res["full_refine0_ms"] - transforms, 3),
        "refine_step_ms": round(res["full_refine1_ms"] - res["full_refine0_ms"], 3),
    }
    for k, v in res.items():
        if isinstance(v, float):
            res[k] = round(v, 3)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
