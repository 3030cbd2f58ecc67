"""Round-2 TPU smoke: accuracy + timing evidence for VERDICT items 2, 3, 7.

Runs on the real chip (axon tunnel; single-client -- never run two at once).
Prints one JSON line per stage, flushed, each guarded so later stages survive
earlier failures. Timing protocol = bench.py's chained-solve fence.
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
from optimal_control_paradiag_tpu.models.wave import WaveSolution
from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver


def emit(**kw):
    print(json.dumps(kw), flush=True)


def chain_time(solve_fn, b, chain=50, reps=3):
    """Median seconds per solve, amortized over a serialized chain."""

    @jax.jit
    def solve_chain(b):
        def body(i, carry):
            x = solve_fn(carry)
            return b + 1e-20 * x

        xlast = lax.fori_loop(0, chain - 1, body, b) if chain > 1 else b
        x = solve_fn(xlast)
        return jnp.sum(jnp.abs(x))

    _ = float(solve_chain(b))  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(solve_chain(b))
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / chain


def stage(name, fn):
    try:
        t0 = time.time()
        out = fn()
        out = dict(out or {})
        out.update(stage=name, ok=True, wall_s=round(time.time() - t0, 1))
        emit(**out)
    except Exception as exc:  # noqa: BLE001
        emit(stage=name, ok=False, error=f"{type(exc).__name__}: {exc}"[:500])


# ---------------------------------------------------------------- stage defs

N_X, N_T = 2048, 1024
cfg = ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32)
prob = WaveControlProblem(cfg)
b = prob.rhs


def tiny():
    p = WaveControlProblem(ProblemConfig(N_x=64, N_t=64, dtype=jnp.float32))
    sol = p.solve(SolverConfig(method="woodbury", refine=1))
    return {"rel": float(p.relative_residual_f64(sol))}


def woodbury(time_transform, half, refine=1):
    wb = jax.jit(
        build_woodbury_solver(
            prob.operator, refine=refine, time_transform=time_transform, half_spectrum=half
        )
    )
    x = wb(b)
    x.block_until_ready()
    u, p = x[0], x[1]  # scaled==physical at gamma=1
    rel = prob.relative_residual_f64(WaveSolution(u=u, p=p, result=None))
    ms = chain_time(wb, b) * 1e3
    return {"rel_f64": float(rel), "ms_per_solve": round(ms, 3)}


def spectral_gmres():
    run = prob.make_solver_fn(SolverConfig(method="spectral", rtol=1e-5, restart=110, maxiter=110))
    x, res = run(b)
    x.block_until_ready()
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    ms = chain_time(lambda bb: run(bb)[0], b, chain=10) * 1e3
    return {"iters": int(res.iterations), "rel_f64": float(rel), "ms_per_solve": round(ms, 3)}


def lumped_2d():
    p2 = WaveControlProblem(ProblemConfig(N_x=512, N_t=128, dim=2, mass="lumped", dtype=jnp.float32))
    wb = jax.jit(build_woodbury_solver(p2.operator, refine=1))
    b2 = p2.rhs
    x = wb(b2)
    x.block_until_ready()
    rel = p2.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    ms = chain_time(wb, b2, chain=20) * 1e3
    return {"n_dofs": 2 * p2.operator.N_t * p2.space.n, "rel_f64": float(rel), "ms_per_solve": round(ms, 3)}


def batched():
    B = 8
    wb = build_woodbury_solver(prob.operator, refine=1)
    vwb = jax.jit(jax.vmap(wb))
    bs = jnp.broadcast_to(b, (B,) + b.shape)
    x = vwb(bs)
    x.block_until_ready()
    ms = chain_time(vwb, bs, chain=10) * 1e3
    return {"batch": B, "ms_per_batch": round(ms, 3), "solves_per_s": round(B / (ms / 1e3), 1)}


def consistent_2d(N_x=96, N_t=64, cap_rtol=2e-5):
    """2D CONSISTENT mass at a size far past blockdense's 3e8-entry wall
    (N_x <= ~40): the SMW + blockline direct solve (paradiag/woodbury2d.py),
    true residual via the generic host-f64 oracle."""
    from optimal_control_paradiag_tpu.paradiag.woodbury2d import build_woodbury2d_solver

    p2 = WaveControlProblem(
        ProblemConfig(N_x=N_x, N_t=N_t, dim=2, mass="consistent", dtype=jnp.float32)
    )
    wb = jax.jit(build_woodbury2d_solver(p2.operator, cap_rtol=cap_rtol, cap_maxiter=120))
    b2 = p2.rhs
    x = wb(b2)
    x.block_until_ready()
    rel = p2.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    ms = chain_time(wb, b2, chain=3, reps=3) * 1e3
    return {
        "n_dofs": 2 * p2.operator.N_t * p2.space.n,
        "rel_f64": float(rel),
        "ms_per_solve": round(ms, 3),
    }


def woodbury_pallas(refine=1):
    from optimal_control_paradiag_tpu.paradiag.pallas_woodbury import (
        build_pallas_woodbury_solver,
    )

    wb = jax.jit(build_pallas_woodbury_solver(prob.operator, refine=refine))
    x = wb(b)
    x.block_until_ready()
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))
    ms = chain_time(wb, b) * 1e3
    return {"rel_f64": float(rel), "ms_per_solve": round(ms, 3)}


def warmup():
    """Absorb the relay's one-time first-fetch toll (measured 8-400 s,
    variable) so per-stage timings are clean."""
    t0 = time.time()
    v = float(jnp.sum(jnp.ones((8, 8))))
    return {"first_fetch_s": round(time.time() - t0, 1), "v": v}


stage("warmup_first_fetch", warmup)
stage("tiny_sanity", tiny)
stage("woodbury_fft_half", lambda: woodbury("fft", True))
stage("woodbury_dft_half", lambda: woodbury("dft", True))
stage("woodbury_fft_half_refine2", lambda: woodbury("fft", True, refine=2))
stage("woodbury_dft_half_refine2", lambda: woodbury("dft", True, refine=2))
stage("woodbury_pallas_fused", woodbury_pallas)
stage("spectral_gmres", spectral_gmres)
stage("lumped_2d_woodbury", lumped_2d)
stage("consistent_2d_woodbury", consistent_2d)
stage("batched_woodbury_b8", batched)
emit(stage="done", ok=True)
