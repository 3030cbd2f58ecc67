"""Does 3-pass bf16x3 (Precision.HIGH) for the spatial DST matmuls beat the
default f32 (HIGHEST = 6 bf16 passes) on the headline solve?

The fused headline is MXU-bound (mxu_fraction_f32eff 0.43, hbm 0.15 --
artifacts/bench_suite.json), and the DST GEMMs are the only matmuls in the
solve, so halving their MXU passes is the largest single lever left.
The question is accuracy: the f32 gate is rel_f64 <= 8e-4 (floor 4.1e-4).

Run ON TPU (single process, one cold start):
    nohup python -u artifacts/experiments/dst_precision_experiment.py \
        > /tmp/dst_prec.log 2>&1 &
Results appended below after the run.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem
from optimal_control_paradiag_tpu.models.wave import WaveSolution
from optimal_control_paradiag_tpu.paradiag.pallas_woodbury import build_pallas_woodbury_solver
from optimal_control_paradiag_tpu.paradiag.spectral import build_polished_solver, build_woodbury_solver

N_X, N_T, CHAIN, REPS = 2048, 1024, 30, 2


def chain_time(fn, b):
    from jax import lax

    @jax.jit
    def chained(bb):
        def body(i, carry):
            return bb + 1e-20 * fn(carry)

        last = lax.fori_loop(0, CHAIN - 1, body, bb)
        return jnp.sum(jnp.abs(fn(last)))

    _ = float(chained(b))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _ = float(chained(b))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / CHAIN * 1e3


def rel(prob, x):
    return prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))


def main():
    for prec in ("highest", "high"):
        from optimal_control_paradiag_tpu.fem.space import make_space

        space = make_space(1, N_X, dtype=jnp.float32, dst_precision=prec)
        prob = WaveControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32), space=space)
        b = prob.rhs
        for name, build in (
            ("fft", lambda: build_woodbury_solver(prob.operator, refine=1)),
            ("pallas", lambda: build_pallas_woodbury_solver(prob.operator, refine=1)),
        ):
            wb = jax.jit(build())
            x = wb(b)
            x.block_until_ready()
            r = rel(prob, x)
            ms = chain_time(wb, b)
            print(json.dumps({"prec": prec, "variant": name, "rel_f64": r, "ms": round(ms, 3)}), flush=True)
        if prec == "high":
            wbp = jax.jit(build_polished_solver(prob.operator, refine=1, polish=1))
            xp = wbp(b)
            xp.block_until_ready()
            rp = rel(prob, xp)
            msp = chain_time(wbp, b)
            print(json.dumps({"prec": prec, "variant": "polished", "rel_f64": rp, "ms": round(msp, 3)}), flush=True)


if __name__ == "__main__":
    main()


# Results (v5e, 2026-08-20):
#   see /tmp/dst_prec.log -> appended to artifacts/experiments/tpu_bench_r3.md
