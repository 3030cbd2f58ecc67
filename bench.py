"""Benchmark: ParaDiag-preconditioned all-at-once solve wall-clock.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline config: 1D wave control, N_x=2048, N_t=1024 (4.19M unknowns,
float32) -- a scaled-up version of the reference's default run
(``Control_Wave_PC.py:335-339``), solved by the spectral-space method
(GMRES in the ParaDiag-diagonalized coordinates, paradiag/spectral.py) to
rtol 1e-5: ~45 float32 iterations at this size, solution error ~3x from the
float64 answer (vs ~90 iterations and 4x worse error for the standard
transform-per-iteration path). Restart above the iteration count: the
preconditioned spectrum's outlier sweep stalls under restarting.
N_t divisible by 4 deliberately exercises the Lambda_2 ~ 0 modes where the
reference's eig route loses digits.

Timing is fenced by a host fetch of the solution (``np.asarray``): on the
axon TPU relay, ``block_until_ready`` has been observed to return before
execution completes.

``vs_baseline``: the reference publishes no wall-clock numbers
(BASELINE.md), and its Firedrake/PETSc/MUMPS stack is CPU-only -- so the
baseline is the same solve on this host's CPU backend (measured in a
subprocess); the value is the CPU/TPU speedup ratio (0.0 if the CPU child
fails or times out).
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
RESTART = 110
RTOL = 1e-5
REPS = int(os.environ.get("BENCH_REPS", 3))


def run_solve(reps: int):
    import jax.numpy as jnp
    import numpy as np

    from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem

    prob = WaveControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32))
    solver = SolverConfig(method="spectral", rtol=RTOL, restart=RESTART, maxiter=RESTART)
    sol = prob.solve(solver)  # compile + warm up
    _ = float(np.asarray(sol.u).ravel()[0])
    if not bool(sol.result.converged):
        raise RuntimeError(
            f"bench solve did not converge: {int(sol.result.iterations)} its, "
            f"residual {float(sol.result.residual_norm):.3e}"
        )
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sol = prob.solve(solver)
        _ = float(np.asarray(sol.u).ravel()[0])  # host fetch = hard fence
        times.append(time.perf_counter() - t0)
    return statistics.median(times), int(sol.result.iterations), prob.error_aligned(sol)


def main():
    if os.environ.get("BENCH_CPU_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        med, iters, err = run_solve(reps=1)
        print(json.dumps({"cpu_ms": med * 1000.0}))
        return

    med, iters, err = run_solve(reps=REPS)
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
                "metric": f"paradiag_gmres_solve_1d_nx{N_X}_nt{N_T}_ms",
                "value": round(value_ms, 3),
                "unit": "ms",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
