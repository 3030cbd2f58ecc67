"""Benchmark suite: ParaDiag all-at-once solve wall-clock + roofline accounting.

Prints ONE JSON line (the headline): {"metric", "value", "unit", "vs_baseline"}.
The full suite -- every stage below, with accuracy oracles and the roofline
model -- is written to ``artifacts/bench_suite.json``.

Headline: 1D wave control, N_x=2048, N_t=1024 (4.19M unknowns, float32) --
a scaled-up version of the reference's default run
(``Control_Wave_PC.py:335-339``) -- solved DIRECTLY by the rank-4 Woodbury
identity in ParaDiag-diagonalized coordinates with one iterative-refinement
step (paradiag/spectral.py). The solve is fully fused on device: jnp/MXU
transforms around the single Pallas kernel of paradiag/pallas_woodbury.py
when it wins, the jnp elementwise path otherwise (auto-picked each run,
recorded in the suite file).

Suite stages (each guarded; failures recorded, not fatal):
  woodbury_fft / woodbury_dft  -- time-transform accuracy+speed duel; the
    more accurate one becomes the headline config. The float64 host oracle
    gates the headline at TRUE relative residual <= MAX_REL_RESIDUAL (the
    float32 rounding floor at this size is 4.1e-4; merely rounding the exact
    solution leaves that much).
  woodbury_pallas              -- the fused-kernel variant of the same solve.
  woodbury_polished            -- + physical-space defect correction
    (cancellation-aware stencil matvec, paradiag/spectral.py
    build_polished_solver): float32 true residual on the representation
    floor (gate: <= 5e-4 at the headline size; the floor is 4.1e-4), and
    the two-float (dword) pair's residual orders below it.
  spectral_gmres               -- the reference's ALGORITHM (iterative
    ParaDiag, float32-stable spectral form, rtol 1e-5) on this chip, at the
    CURRENT build.
  lumped_2d_woodbury           -- 2D problem (N_x=512, N_t=128, 33.4M DoFs).
  batched_woodbury             -- multi-RHS throughput (B=8, solves/s).
  roofline                     -- analytic bytes/flops model of the headline
    solve; achieved GB/s and matmul FLOP/s vs chip peaks, plus nnz/s of the
    assembled all-at-once matrix (BASELINE.md acceptance metric).

Timing protocol: a chain of BENCH_CHAIN (default 50) solves inside ONE jitted
program, serialized by a data dependency (each rhs perturbed by 1e-20 x the
previous solution -- numerically a no-op the compiler cannot hoist), closed
by a SCALAR fence fetched to host. Reported value = total / chain. Why: on
this axon relay every host round-trip costs ~26 ms and a full array fetch
~600 ms -- tunnel artifacts three orders of magnitude off a real TPU host's
dispatch path; amortizing one fence over the chain bounds the artifact at
well under 1 ms/solve.

``vs_baseline``: the reference publishes no wall-clock numbers (BASELINE.md)
and its Firedrake/PETSc/MUMPS stack is CPU-only, so the baseline is the
reference's ALGORITHM (iterative spectral-form ParaDiag GMRES, rtol 1e-5) on
this host's CPU, measured in a subprocess under the same protocol; the value
is baseline/headline. The suite file also records the like-for-like
hardware-only ratio (same Woodbury direct solve on the CPU).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys
import time

N_X = int(os.environ.get("BENCH_NX", 2048))
N_T = int(os.environ.get("BENCH_NT", 1024))
REFINE = int(os.environ.get("BENCH_REFINE", 1))
MAX_REL_RESIDUAL = float(os.environ.get("BENCH_MAX_REL", 8e-4))
REPS = int(os.environ.get("BENCH_REPS", 3))
CHAIN = int(os.environ.get("BENCH_CHAIN", 50))
SUITE = os.environ.get("BENCH_SUITE", "1") != "0"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts", "bench_suite.json")


def _chain_time(solve_fn, b, chain, reps):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def solve_chain(b):
        def body(i, carry):
            x = solve_fn(carry)
            return b + 1e-20 * x

        xlast = lax.fori_loop(0, chain - 1, body, b) if chain > 1 else b
        x = solve_fn(xlast)
        return jnp.sum(jnp.abs(x))

    _ = float(solve_chain(b))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(solve_chain(b))
        times.append(time.perf_counter() - t0)
    return statistics.median(times) / chain


def _rel_residual(prob, x) -> float:
    from optimal_control_paradiag_tpu.models.wave import WaveSolution

    return prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))


def _chip_peaks():
    """HBM GB/s and bf16 matmul TFLOP/s by device kind (public specs);
    f32 HIGHEST-precision matmuls cost ~6 bf16 passes on the MXU."""
    import jax

    kind = jax.devices()[0].device_kind
    table = {
        "v5 lite": (819.0, 197.0),  # v5e
        "v5e": (819.0, 197.0),
        "v5p": (2765.0, 459.0),
        "v4": (1228.0, 275.0),
        "v6": (1640.0, 918.0),  # trillium
    }
    for key, (gbs, tflops) in table.items():
        if key in kind.lower():
            return {"device_kind": kind, "hbm_GBs": gbs, "bf16_tflops": tflops}
    return {"device_kind": kind, "hbm_GBs": None, "bf16_tflops": None}


def roofline_model(N_x, N_t, itemsize, refine, fused):
    """Analytic traffic/flop model of the half-spectrum Woodbury solve.

    State: S = 2*N_t*n real elements (n = N_x-1); spectral half-state
    Sc = 2*(N_t//2+1)*n complex elements ~ S in memory (2x itemsize, half
    the bins).

    Bytes (HBM):
      DST matmuls: 4 GEMM passes (fwd real on (2*N_t, n); inv split-real on
        (2*(K), n) x2) -- each reads the n^2 DST matrix + state r/w;
      rfft/irfft: ~3 state passes each (multi-stage FFT);
      spectral elementwise: jnp path ~ (15 + refine*(15+8)) r/w passes over
        Sc; fused Pallas path: 2 passes total.
    FLOPs (MXU): the 4 DST GEMM groups: 2 * rows * n^2 each with rows ~
      2*N_t total forward + 2*N_t total inverse -> ~8*N_t*n^2.
    """
    n = N_x - 1
    S_bytes = 2 * N_t * n * itemsize
    Sc_bytes = 2 * (N_t // 2 + 1) * n * 2 * itemsize
    dst_matrix = n * n * itemsize
    gemm_bytes = 4 * dst_matrix + 4 * S_bytes  # matrix reads + state r/w
    fft_bytes = 2 * 3 * max(S_bytes, Sc_bytes)
    passes = 2 if fused else (15 + refine * 23)
    elementwise_bytes = passes * 2 * Sc_bytes
    flops = 8 * N_t * n * n
    return {
        "bytes_total": gemm_bytes + fft_bytes + elementwise_bytes,
        "bytes_elementwise": elementwise_bytes,
        "flops_matmul": flops,
    }


def make_problem(dtype=None, **kw):
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem

    cfg = ProblemConfig(dtype=dtype or jnp.float32, **kw)
    return WaveControlProblem(cfg)


def stage_woodbury(prob, time_transform, reps=REPS, chain=CHAIN, refine=REFINE):
    import jax

    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    wb = jax.jit(
        build_woodbury_solver(prob.operator, refine=refine, time_transform=time_transform)
    )
    b = prob.rhs
    x = wb(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(wb, b, chain, reps) * 1e3
    return {"rel_f64": rel, "ms_per_solve": round(ms, 3)}


def stage_woodbury_pallas(prob, reps=REPS, chain=CHAIN, refine=REFINE):
    import jax

    from optimal_control_paradiag_tpu.paradiag.pallas_woodbury import (
        build_pallas_woodbury_solver,
    )

    wb = jax.jit(
        build_pallas_woodbury_solver(
            prob.operator, refine=refine, interpret=jax.default_backend() == "cpu"
        )
    )
    b = prob.rhs
    x = wb(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(wb, b, chain, reps) * 1e3
    return {"rel_f64": rel, "ms_per_solve": round(ms, 3)}


def stage_woodbury_polished(prob, reps=REPS, chain=CHAIN):
    """Accuracy stage (VERDICT round-1 item 7): polish=1 must land the true
    float32 residual on the representation floor (<= 5e-4 at headline size,
    where the floor itself is 4.1e-4); the dword pair goes far below it."""
    import jax
    import numpy as np

    from optimal_control_paradiag_tpu.paradiag.spectral import (
        build_polished_solver,
        spectral_relative_residual,
    )

    op = prob.operator
    wbp = jax.jit(build_polished_solver(op, refine=1, polish=1))
    b = prob.rhs
    x = wbp(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(wbp, b, chain, reps) * 1e3
    xe = jax.jit(build_polished_solver(op, refine=1, polish=2, dword=True))(b)
    xs = np.asarray(xe[0], np.float64) + np.asarray(xe[1], np.float64)
    rel_dword = spectral_relative_residual(op, xs, b)
    out = {"rel_f64": rel, "rel_f64_dword": rel_dword, "ms_per_solve": round(ms, 3)}
    if rel > 5e-4:
        out["gate_failed"] = f"polished rel {rel:.3e} > 5e-4"
    return out


def stage_spectral_gmres(prob):
    from optimal_control_paradiag_tpu import SolverConfig

    run = prob.make_solver_fn(
        SolverConfig(method="spectral", rtol=1e-5, restart=110, maxiter=110)
    )
    b = prob.rhs
    x, res = run(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(lambda bb: run(bb)[0], b, chain=10, reps=REPS) * 1e3
    return {"iters": int(res.iterations), "rel_f64": rel, "ms_per_solve": round(ms, 3)}


def stage_lumped_2d():
    import jax

    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    prob = make_problem(N_x=512, N_t=128, dim=2, mass="lumped")
    wb = jax.jit(build_woodbury_solver(prob.operator, refine=1))
    b = prob.rhs
    x = wb(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(wb, b, chain=20, reps=REPS) * 1e3
    return {
        "n_dofs": 2 * prob.operator.N_t * prob.space.n,
        "rel_f64": rel,
        "ms_per_solve": round(ms, 3),
    }


def stage_batched(prob, B=8):
    import jax
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    wb = build_woodbury_solver(prob.operator, refine=REFINE)
    vwb = jax.jit(jax.vmap(wb))
    bs = jnp.broadcast_to(prob.rhs, (B,) + prob.rhs.shape)
    x = vwb(bs)
    x.block_until_ready()
    ms = _chain_time(vwb, bs, chain=10, reps=REPS) * 1e3
    return {"batch": B, "ms_per_batch": round(ms, 3), "solves_per_s": round(B / (ms / 1e3), 1)}


def run_suite():
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu.ops.allatonce import operator_nnz

    suite = {"config": {"N_x": N_X, "N_t": N_T, "refine": REFINE, "chain": CHAIN}}

    def guard(name, fn, *a, **kw):
        try:
            t0 = time.time()
            suite[name] = fn(*a, **kw)
            suite[name]["wall_s"] = round(time.time() - t0, 1)
        except Exception as exc:  # noqa: BLE001
            suite[name] = {"error": f"{type(exc).__name__}: {exc}"[:400]}
        return suite[name]

    prob = make_problem(N_x=N_X, N_t=N_T)
    r_fft = guard("woodbury_fft", stage_woodbury, prob, "fft")
    r_dft = guard("woodbury_dft", stage_woodbury, prob, "dft")
    r_pl = guard("woodbury_pallas", stage_woodbury_pallas, prob)
    if SUITE:
        guard("woodbury_polished", stage_woodbury_polished, prob)
        guard("spectral_gmres", stage_spectral_gmres, prob)
        guard("lumped_2d_woodbury", stage_lumped_2d)
        guard("batched_woodbury", stage_batched, prob)

    # Headline = the accurate-enough candidate with the best time.
    cands = []
    for name, r, fused in (("fft", r_fft, False), ("dft", r_dft, False), ("pallas", r_pl, True)):
        if "ms_per_solve" in r and r.get("rel_f64", 1.0) <= MAX_REL_RESIDUAL:
            cands.append((r["ms_per_solve"], name, r, fused))
    if not cands:
        # accuracy gate failed everywhere: report the best-accuracy one but flag it
        best = min(
            (r for r in (r_fft, r_dft, r_pl) if "rel_f64" in r),
            key=lambda r: r["rel_f64"],
            default=None,
        )
        if best is None:
            raise RuntimeError(f"all headline stages failed: {json.dumps(suite)[:600]}")
        raise RuntimeError(
            f"headline accuracy gate failed: best rel_f64={best['rel_f64']:.3e} "
            f"> {MAX_REL_RESIDUAL:.1e}"
        )
    ms, which, chosen, fused = min(cands)
    suite["headline"] = {"variant": which, **chosen}

    # Roofline accounting for the chosen headline.
    peaks = _chip_peaks()
    model = roofline_model(N_X, N_T, jnp.dtype(jnp.float32).itemsize, REFINE, fused)
    t = ms / 1e3
    nnz = operator_nnz(prob.operator)
    roof = {
        **peaks,
        **model,
        "achieved_GBs": round(model["bytes_total"] / t / 1e9, 1),
        "achieved_matmul_tflops": round(model["flops_matmul"] / t / 1e12, 2),
        "nnz_assembled": nnz,
        "nnz_per_s": round(nnz / t, 1),
    }
    if peaks["hbm_GBs"]:
        roof["hbm_fraction"] = round(roof["achieved_GBs"] / peaks["hbm_GBs"], 3)
        # f32 HIGHEST matmuls ~ 6 bf16 MXU passes
        roof["mxu_fraction_f32eff"] = round(
            roof["achieved_matmul_tflops"] / (peaks["bf16_tflops"] / 6.0), 3
        )
    suite["roofline"] = roof
    return suite, ms


def main():
    if os.environ.get("BENCH_CPU_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        prob = make_problem(N_x=N_X, N_t=N_T)
        out = {}
        try:
            out["cpu_spectral_ms"] = stage_spectral_gmres(prob)["ms_per_solve"]
        except Exception:  # noqa: BLE001
            pass
        try:
            out["cpu_woodbury_ms"] = stage_woodbury(prob, "fft", reps=1, chain=3)["ms_per_solve"]
        except Exception:  # noqa: BLE001
            pass
        print(json.dumps(out))
        return

    suite, value_ms = run_suite()

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
                cpu = json.loads(line)
                if "cpu_spectral_ms" in cpu:
                    vs_baseline = cpu["cpu_spectral_ms"] / value_ms
                suite["cpu_baseline"] = cpu
                if "cpu_woodbury_ms" in cpu:
                    suite["cpu_baseline"]["like_for_like_hw_ratio"] = round(
                        cpu["cpu_woodbury_ms"] / value_ms, 2
                    )
                break
    except Exception:  # noqa: BLE001
        pass

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(suite, f, indent=1)

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
