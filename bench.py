"""Benchmark: ParaDiag all-at-once solve wall-clock (Woodbury direct method).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config: 1D wave control, N_x=2048, N_t=1024 (4.19M unknowns,
float32) -- a scaled-up version of the reference's default run
(``Control_Wave_PC.py:335-339``), solved DIRECTLY by the rank-4 Woodbury
identity in the ParaDiag-diagonalized coordinates with one iterative-
refinement step (paradiag/spectral.py): two transform round-trips plus O(1)
elementwise passes, no Krylov iteration. Measured at this size: 3.5x faster
than the spectral-space GMRES path (rtol 1e-5, ~45 iterations) and ~7x closer
to the float64 answer (rel err 1.7e-5 vs 1.2e-4). A true-residual gate
(float64 host oracle, threshold 1e-2) guards the timing claim: at this size
merely ROUNDING the exact solution to float32 already leaves a 4.1e-4
relative residual (the operator amplifies solution rounding ~1e4x), and every
float32 method -- Woodbury or GMRES -- lands at ~2.6e-3. N_t divisible by 4
deliberately exercises the Lambda_2 ~ 0 modes where the reference's eig route
loses digits.

Timing is fenced by a host fetch of the solution (``np.asarray``): on the
axon TPU relay, ``block_until_ready`` has been observed to return before
execution completes.

``vs_baseline``: the reference publishes no wall-clock numbers
(BASELINE.md), and its Firedrake/PETSc/MUMPS stack is CPU-only -- so the
baseline is the reference's ALGORITHM (ParaDiag-preconditioned GMRES, in its
float32-stable spectral-space form, rtol 1e-5) on this host's CPU backend,
measured in a subprocess; the value is the baseline/headline speedup ratio
(0.0 if the CPU child fails or times out). For the like-for-like hardware
ratio: the same Woodbury solve on this CPU runs ~1.7x slower than on the
chip; the ratio below additionally credits replacing ~45 Krylov iterations
with a direct solve.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

N_X = int(os.environ.get("BENCH_NX", 2048))
N_T = int(os.environ.get("BENCH_NT", 1024))
REFINE = int(os.environ.get("BENCH_REFINE", 1))
MAX_REL_RESIDUAL = 1e-2
REPS = int(os.environ.get("BENCH_REPS", 3))


def run_solve(reps: int, method: str = "woodbury"):
    import jax.numpy as jnp
    import numpy as np

    from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem

    prob = WaveControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32))
    if method == "woodbury":
        solver = SolverConfig(method="woodbury", refine=REFINE)
    else:  # the reference's algorithm: iterative ParaDiag GMRES (f32-stable form)
        solver = SolverConfig(method="spectral", rtol=1e-5, restart=110, maxiter=110)
    sol = prob.solve(solver)  # compile + warm up
    _ = float(np.asarray(sol.u).ravel()[0])
    # Host float64 oracle: the float32 device matvec's own rounding noise
    # sits at ~1e-3 relative and cannot measure this.
    rel_res = prob.relative_residual_f64(sol)
    if rel_res > MAX_REL_RESIDUAL:
        raise RuntimeError(f"bench solve inaccurate: relative residual {rel_res:.3e}")
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sol = prob.solve(solver)
        _ = float(np.asarray(sol.u).ravel()[0])  # host fetch = hard fence
        times.append(time.perf_counter() - t0)
    return statistics.median(times), prob.error_aligned(sol)


def main():
    if os.environ.get("BENCH_CPU_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        med, err = run_solve(reps=1, method="spectral")
        print(json.dumps({"cpu_ms": med * 1000.0}))
        return

    med, err = run_solve(reps=REPS)
    value_ms = med * 1000.0

    vs_baseline = 0.0
    try:
        env = dict(os.environ, BENCH_CPU_CHILD="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                cpu_ms = json.loads(line)["cpu_ms"]
                vs_baseline = cpu_ms / value_ms
                break
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": f"paradiag_direct_solve_1d_nx{N_X}_nt{N_T}_ms",
                "value": round(value_ms, 3),
                "unit": "ms",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
