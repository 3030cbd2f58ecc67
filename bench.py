"""Benchmark suite: ParaDiag all-at-once solve wall-clock + roofline accounting.

Prints ONE JSON line (the headline): {"metric", "value", "unit", "vs_baseline"}.
The full suite -- every stage below, with accuracy oracles and the roofline
model -- is written to ``artifacts/bench_suite.json``.

Headline: 1D wave control, N_x=2048, N_t=1024 (4.19M unknowns, float32) --
a scaled-up version of the reference's default run
(``Control_Wave_PC.py:335-339``) -- solved DIRECTLY by the rank-4 Woodbury
identity in ParaDiag-diagonalized coordinates with one iterative-refinement
step (paradiag/spectral.py). Five headline candidates run head-to-head and
the fastest accuracy-gated one wins (recorded in the suite file): the
fused Pallas elementwise kernel with the r5 packed two-for-one time FFT
(the r5 winner, 2.16 ms), the same kernel with plain rffts (the r1-r4
winner), and the jnp fft / four-step-MXU transform variants kept as
recorded levers.

BUDGET PROTOCOL (round-3 fix for the round-2 rc=124 timeout): the whole run
fits an explicit wall-clock budget, ``BENCH_BUDGET_S`` (default 540 s).
The three headline candidates run first; the headline JSON line is printed
and flushed IMMEDIATELY after they finish (~3 min in), so the scoreboard
records a value even if the driver kills the process later. Every remaining
stage runs only if its cost estimate fits the remaining budget; skipped
stages are recorded as ``{"skipped": "budget"}`` in the suite file, never
silently. The CPU baseline is read from a committed cache
(``artifacts/cpu_baseline.json``, keyed by size + node); the subprocess that
regenerates it runs only when the cache misses AND the budget allows.

Suite stages (each guarded; failures recorded, not fatal):
  woodbury_pallas_packed / woodbury_pallas / woodbury_fft /
  woodbury_mxu / woodbury_mxu4 -- the headline candidates (above). The
    float64 host oracle gates the headline at TRUE relative residual
    <= MAX_REL_RESIDUAL (the float32 rounding floor at this size is
    4.1e-4; merely rounding the exact solution leaves that much).
  woodbury_dft                 -- the DFT-matmul time-transform variant
    (budget-gated: it has never won the duel and once ate 882 s of wall on
    a flaky relay).
  woodbury_polished            -- + physical-space defect correction
    (cancellation-aware stencil matvec, paradiag/spectral.py
    build_polished_solver): float32 true residual on the representation
    floor (gate: <= 5e-4 at the headline size; the floor is 4.1e-4), and
    the two-float (dword) pair's residual orders below it.
  spectral_gmres               -- the reference's ALGORITHM (iterative
    ParaDiag, float32-stable spectral form, rtol 1e-5) on this chip, at the
    CURRENT build; restart 50 (measured 45 iterations at the headline size,
    artifacts/experiments/tpu_smoke_r2.out) -- a representative tuned
    iterative config, not a single mis-sized 110-wide Arnoldi cycle.
  lumped_2d_woodbury           -- 2D problem (N_x=512, N_t=128, 33.4M DoFs),
    separable ``mode_diag`` constants (spectral.py) so the compiled program
    stays under the axon compile-RPC body cap.
  consistent_2d_woodbury       -- 2D CONSISTENT mass (N_x=192, N_t=128,
    9.3M DoFs -- past the blockline factorization wall): tensor-mass-
    Woodbury-preconditioned GMRES (paradiag/woodbury2d.py), mesh-independent
    iteration counts -- the capability the reference only gets from MUMPS
    (Control_Wave_PC.py:186).
  batched_woodbury             -- multi-RHS throughput (B=8, solves/s).
  heat_woodbury                -- the SECOND MODEL FAMILY (models/heat.py):
    backward-Euler heat-control, rank-2 half-spectrum SMW direct solve at
    the same headline size.
  unstructured_blockband       -- GENERAL perturbed triangle mesh (native
    C++ assembler), RCM-banded level-Thomas direct inner solves inside
    ParaDiag GMRES -- the factorization-based cross-check (plain-circulant
    outer iterations grow on unstructured meshes; see eigbasis).
  unstructured_eig_wall        -- the WALL-SIZE unstructured direct solve
    (n=20449 interior DoFs, N_t=64): generalized-eigenbasis ParaDiag
    (paradiag/eigbasis.py); on TPU the basis is BUILT in-stage by the
    on-device SDC eigensolver (paradiag/sdc.py) with the setup seconds
    recorded; gates rel_f64 <= 5e-4.
  heat_2d_consistent / heat_2d_woodbury -- heat family 2D: tensor-PC
    GMRES at 9.3M DoFs; lumped direct solve with the dword accuracy rung
    and the manufactured error at two tau (the O(tau) order on hardware).
  breakdown                    -- per-stage cycle attribution of the
    headline (DST / fft / inverse transforms timed standalone): shows the
    solve is transform-bound and where the roofline's 'missing half' went.
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

``vs_baseline``: the LIKE-FOR-LIKE ratio -- the same Woodbury direct solve
on this host's CPU divided by the headline device time. The cross-algorithm
ratio vs the reference's ALGORITHM (iterative spectral-form ParaDiag GMRES,
rtol 1e-5, on CPU -- the reference's own Firedrake/PETSc/MUMPS stack is
CPU-only and publishes no wall-clock numbers, BASELINE.md) is emitted
separately as ``vs_reference_algo_cpu``. Both numerators come from the
cached CPU baseline.
"""

from __future__ import annotations

import json
import math
import os
import platform
import statistics
import subprocess
import sys
import time

T0 = time.time()

N_X = int(os.environ.get("BENCH_NX", 2048))
N_T = int(os.environ.get("BENCH_NT", 1024))
REFINE = int(os.environ.get("BENCH_REFINE", 1))
MAX_REL_RESIDUAL = float(os.environ.get("BENCH_MAX_REL", 8e-4))
REPS = int(os.environ.get("BENCH_REPS", 3))
CHAIN = int(os.environ.get("BENCH_CHAIN", 50))
SUITE = os.environ.get("BENCH_SUITE", "1") != "0"
# Default budget: the full suite measured 1189 s wall on the v5e relay
# (~600 s of that is the documented first-program cold start); 2400 leaves
# 2x headroom while staying far under the driver's observed cap (round 1
# passed at ~45+ min). The headline JSON still prints ~3 stages in.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 2400))
_HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(_HERE, "artifacts", "bench_suite.json")
CPU_CACHE = os.path.join(_HERE, "artifacts", "cpu_baseline.json")


def remaining() -> float:
    return BUDGET_S - (time.time() - T0)


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


def stage_woodbury_pallas(prob, reps=REPS, chain=CHAIN, refine=REFINE, pack_fft=False):
    import jax

    from optimal_control_paradiag_tpu.paradiag.pallas_woodbury import (
        build_pallas_woodbury_solver,
    )

    wb = jax.jit(
        build_pallas_woodbury_solver(
            prob.operator, refine=refine, interpret=jax.default_backend() == "cpu",
            pack_fft=pack_fft,
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
    where the floor itself is 4.1e-4); the dword pair goes far below it.

    Uses dst_precision='high' (3-pass bf16x3 matmul-DST): unusable alone
    (rel 0.129) but the polish pass measures the defect with the STENCIL
    matvec and lands on the floor anyway -- the fastest floor-accurate
    config (4.06 vs 4.95 ms measured on v5e,
    artifacts/experiments/dst_precision_experiment.py)."""
    import jax
    import numpy as np

    from optimal_control_paradiag_tpu.paradiag.spectral import (
        build_polished_solver,
        spectral_relative_residual,
    )

    prob_hi = prob  # 'highest' build: dword reference path
    prob = make_problem(N_x=prob.config.N_x, N_t=prob.config.N_t, dst_precision="high")
    op = prob.operator
    wbp = jax.jit(build_polished_solver(op, refine=1, polish=1))
    b = prob.rhs
    x = wbp(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(wbp, b, chain, reps) * 1e3
    xe = jax.jit(build_polished_solver(prob_hi.operator, refine=1, polish=2, dword=True))(
        prob_hi.rhs
    )
    xs = np.asarray(xe[0], np.float64) + np.asarray(xe[1], np.float64)
    rel_dword = spectral_relative_residual(prob_hi.operator, xs, prob_hi.rhs)
    out = {
        # This stage IS the asserted fastest floor-accurate config
        # (dst_precision='high' + polish=1); the dword figure uses the
        # 'highest' build. Recorded here so the accuracy/speed frontier
        # lives in the suite artifact, not a docstring (VERDICT r3 weak 2).
        "dst_precision": "high",
        "config": "dst_precision=high + refine=1 + polish=1",
        "rel_f64": rel,
        "rel_f64_dword": rel_dword,
        "dword_config": "dst_precision=highest + refine=1 + polish=2",
        "ms_per_solve": round(ms, 3),
    }
    if rel > 5e-4:
        out["gate_failed"] = f"polished rel {rel:.3e} > 5e-4"
    return out


def stage_spectral_gmres(prob, chain=10, reps=REPS):
    from optimal_control_paradiag_tpu import SolverConfig

    # restart 50: the headline problem converges in ~45 iterations (measured,
    # artifacts/experiments/tpu_smoke_r2.out), so one restart cycle holds the
    # whole Krylov space without the mis-sized (111, 2*K*n) basis buffer.
    run = prob.make_solver_fn(
        SolverConfig(method="spectral", rtol=1e-5, restart=50, maxiter=150)
    )
    b = prob.rhs
    x, res = run(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(lambda bb: run(bb)[0], b, chain=chain, reps=reps) * 1e3
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


def stage_consistent_2d():
    """2D CONSISTENT mass, structured grid: GMRES preconditioned by the
    EXACT tensor-mass Woodbury direct solve
    (paradiag/woodbury2d.py:build_tensor_gmres_solver) -- mesh-independent
    iterations (7-10 at rtol 1e-10 in f64; ~2-3 to the f32 floor at rtol
    1e-5). Size chosen PAST the blockline factorization wall
    (blockline_entries(128, 191) ~ 1.8e9 > the 4e8 cap): a system the
    block-Thomas direct path cannot even factor, solved to the float32
    floor. First hardware timing of the 2D consistent path (VERDICT r2
    item 2b)."""
    import jax

    from optimal_control_paradiag_tpu.paradiag.blockline import blockline_entries
    from optimal_control_paradiag_tpu.paradiag.woodbury2d import build_tensor_gmres_solver

    prob = make_problem(N_x=192, N_t=128, dim=2, mass="consistent")
    solve = build_tensor_gmres_solver(prob.operator, rtol=1e-5, maxiter=40, with_result=True)
    wb = jax.jit(lambda bb: solve(bb)[0])
    b = prob.rhs
    x, res = jax.jit(solve)(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(wb, b, chain=10, reps=REPS) * 1e3
    return {
        "n_dofs": 2 * prob.operator.N_t * prob.space.n,
        "past_blockline_wall": blockline_entries(prob.operator.N_t, prob.space.n1d) > 4e8,
        "iters": int(res.iterations),
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


def stage_heat():
    """Second model family at the headline size: backward-Euler heat-equation
    optimal control (models/heat.py), rank-2 half-spectrum SMW direct solve
    (refine=1), float32, f64 host-oracle residual."""
    import jax
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu import ProblemConfig
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem, HeatSolution

    prob = HeatControlProblem(ProblemConfig(N_x=N_X, N_t=N_T, dtype=jnp.float32))
    b = prob.rhs
    s = math.sqrt(prob.config.gamma)
    variants = {}
    for name, builder in (
        ("jnp", lambda: prob.build_woodbury_solver(refine=1)),
        ("fft2", lambda: prob.build_woodbury_solver(refine=1, time_transform="fft2")),
        ("mxu", lambda: prob.build_woodbury_solver(refine=1, time_transform="mxu")),
        ("pallas", lambda: __import__(
            "optimal_control_paradiag_tpu.paradiag.pallas_heat", fromlist=["b"]
        ).build_pallas_heat_solver(prob, refine=1, interpret=jax.default_backend() == "cpu")),
    ):
        wb = jax.jit(builder())
        x = wb(b)
        x.block_until_ready()
        rel_v = prob.relative_residual_f64(HeatSolution(u=x[0] / s, p=x[1], result=None))
        ms_v = _chain_time(wb, b, chain=20, reps=REPS) * 1e3
        variants[name] = {"rel_f64": rel_v, "ms_per_solve": round(ms_v, 3)}
    # The heat system's f32 REPRESENTATION floor at this size is 1.12e-2
    # (merely rounding the exact f64 solution to f32 leaves that residual:
    # b scales like tau*h while the operator's stiff modes scale like
    # tau/h -- measured in artifacts/experiments/heat_floor_experiment.py);
    # the f32 SMW solve must land within ~2x of it. Gate first, THEN pick
    # the fastest survivor (a fast-but-inaccurate variant must not mask an
    # accurate slower one).
    floor = 1.12e-2
    passing = {v: r for v, r in variants.items() if r["rel_f64"] <= 2.0 * floor}
    pool = passing or variants
    which = min(pool, key=lambda v: pool[v]["ms_per_solve"])
    ms, rel = variants[which]["ms_per_solve"], variants[which]["rel_f64"]
    # Accuracy ladder (VERDICT r3 item 2): one physical-space polish pass with
    # the cancellation-aware matvec, solution kept as a two-float (dword)
    # pair -- true residual orders below the f32 representation floor
    # (reference parity in kind with its complex128 pipeline,
    # Control_Wave_PC.py:372). Gate: dword rel_f64 <= 1e-6 (measured 5.6e-8
    # on CPU at this size).
    pol = jax.jit(prob.build_polished_solver(polish=1, dword=True))
    xe = pol(b)
    jax.block_until_ready(xe)
    import numpy as np

    xs = np.asarray(xe[0], np.float64) + np.asarray(xe[1], np.float64)
    bb = np.asarray(b, np.float64)
    rr = prob.matvec_host_f64(xs) - bb
    rel_dword = float(np.linalg.norm(rr.ravel()) / np.linalg.norm(bb.ravel()))
    ms_pol = _chain_time(lambda bb_: pol(bb_)[0], b, chain=10, reps=REPS) * 1e3
    out = {
        "n_dofs": 2 * N_T * prob.space.n,
        "variant": which,
        "rel_f64": rel,
        "f32_floor_cpu_measured": floor,
        "ms_per_solve": round(ms, 3),
        "rel_f64_dword": rel_dword,
        "ms_per_solve_polished_dword": round(ms_pol, 3),
        "variants": variants,
    }
    if rel > 2.0 * floor:
        out["gate_failed"] = f"heat rel {rel:.3e} > 2x f32 floor"
    if rel_dword > 1e-6:
        out["gate_failed_dword"] = f"heat dword rel {rel_dword:.3e} > 1e-6"
    return out


def stage_unstructured():
    """GENERAL (perturbed) triangle mesh, BOTH unstructured methods on the
    SAME n=961 problem so the artifact is self-consistent (VERDICT r4 weak
    6 / item 6): (a) the plain-circulant ParaDiag GMRES with RCM-banded
    level-Thomas direct inner solves (paradiag/blockband.py -- the
    factorization cross-check tier; its ~69 outer iterations at rtol 1e-5
    are the documented intrinsic outlier growth of non-commuting (M, K),
    NOT a solver defect), and (b) the generalized-eigenbasis-preconditioned
    GMRES (paradiag/eigbasis.py -- the production unstructured path) which
    solves the identical system in a mesh-independent handful of
    iterations. The reference's any-aij MUMPS generality
    (Control_Wave_PC.py:480-484), timed on hardware."""
    import jax.numpy as jnp
    import numpy as np

    from optimal_control_paradiag_tpu import (
        ProblemConfig,
        SolverConfig,
        WaveControlProblem,
        native,
    )
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
    from optimal_control_paradiag_tpu.paradiag.blockband import band_profile

    if not native.available():
        return {"skipped": "native toolchain unavailable"}
    # N=32: 69 outer iterations at rtol 1e-5 (the documented plain-circulant
    # 2D-consistent outlier growth -- intrinsic, ARCHITECTURE.md), 961
    # interior nodes, RCM bandwidth 31. Measured 14.4 s/solve on the 2-core
    # host CPU; the stage exists to time the same program on the TPU.
    N, N_t = 32, 32
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    rng = np.random.default_rng(0)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    sp = make_general_space(pts, tris, dtype=jnp.float32)
    prob = WaveControlProblem(
        ProblemConfig(N_x=N, N_t=N_t, dim=2, dtype=jnp.float32), space=sp
    )
    run = prob.make_solver_fn(
        SolverConfig(rtol=1e-5, pc_variant="blockband", restart=80, maxiter=160)
    )
    b = prob.rhs
    x, res = run(b)
    x.block_until_ready()
    rel = _rel_residual(prob, x)
    ms = _chain_time(lambda bb: run(bb)[0], b, chain=3, reps=REPS) * 1e3
    _, bandwidth = band_profile(sp)
    out = {
        "n_dofs": 2 * N_t * sp.n,
        "rcm_bandwidth": int(bandwidth),
        "blockband": {
            "tier": "factorization cross-check (plain-circulant PC: iteration "
            "growth on unstructured meshes is intrinsic, see eigbasis.py)",
            "iters": int(res.iterations),
            "rel_f64": rel,
            "ms_per_solve": round(ms, 3),
        },
    }
    # (b) the SAME problem through the production eigbasis-preconditioned
    # GMRES: the in-artifact resolution of the 69-iteration number above.
    import jax

    from optimal_control_paradiag_tpu.paradiag.eigbasis import build_eig_gmres_solver

    solve_eig = build_eig_gmres_solver(
        prob.operator, rtol=1e-5, maxiter=20, eig_method="host", with_result=True
    )
    run_eig = jax.jit(solve_eig)
    x2, res2 = run_eig(b)
    jax.block_until_ready(x2)
    rel2 = _rel_residual(prob, x2)
    ms2 = _chain_time(lambda bb: run_eig(bb)[0], b, chain=5, reps=REPS) * 1e3
    out["eigbasis_gmres"] = {
        "tier": "production unstructured path (same mesh, same rhs)",
        "iters": int(res2.iterations),
        "rel_f64": rel2,
        "ms_per_solve": round(ms2, 3),
    }
    # legacy top-level fields point at the production tier
    out["iters"] = int(res2.iterations)
    out["rel_f64"] = rel2
    out["ms_per_solve"] = round(ms2, 3)
    return out


def stage_breakdown(prob):
    """Per-stage cycle attribution of the headline solve (VERDICT r3 item 4:
    'account for the missing cycles'). Times the DST matmul, the rfft/irfft
    pair, and the inverse DST as standalone chained programs at the headline
    size, and reports each matmul's achieved MXU fraction. Measured (v5e,
    r4): dst 1.08 ms/direction (0.48 of the 6-pass-f32 MXU peak -- where
    the roofline's 'missing half' went), rfft+irfft 1.14 ms, full refine0
    solve 2.40 ms < the 3.3 ms stage sum (XLA overlaps transforms), refine
    step +0.24 ms. Conclusion: the solve is TRANSFORM-BOUND; the elementwise
    Woodbury is fused to near-zero marginal cost."""
    import jax
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    space = prob.operator.space
    N_t, n = prob.config.N_t, space.n
    b = prob.rhs
    t_dst = _chain_time(lambda x: space.dst(x), b, chain=CHAIN, reps=REPS)
    rtrip = lambda x: jnp.fft.irfft(jnp.fft.rfft(x, axis=1), n=N_t, axis=1)
    t_fft2 = _chain_time(rtrip, b, chain=CHAIN, reps=REPS)
    # r5 lever: the same roundtrip as four-step MXU matmuls
    # (ops/transforms.py FourStepPlan) -- the recorded attack on the
    # transform bound the r4 breakdown identified.
    from optimal_control_paradiag_tpu.ops.transforms import (
        FourStepPlan,
        time_irfft_conj_mm4,
        time_rfft_conj_mm4,
    )

    p4 = FourStepPlan(N_t, space.dtype)
    rtrip4 = lambda x: time_irfft_conj_mm4(time_rfft_conj_mm4(x, p4), p4)
    t_mxu2 = _chain_time(rtrip4, b, chain=CHAIN, reps=REPS)
    from optimal_control_paradiag_tpu.ops.transforms import DstFourStepPlan, dst1_mm4

    pd4 = DstFourStepPlan(prob.config.N_x, space.dtype)
    t_dst4 = _chain_time(lambda x: dst1_mm4(x, pd4), b, chain=CHAIN, reps=REPS)
    t_idst = _chain_time(lambda x: space.idst(x), b, chain=CHAIN, reps=REPS)
    full0 = jax.jit(build_woodbury_solver(prob.operator, refine=0))
    t_full0 = _chain_time(full0, b, chain=CHAIN, reps=REPS)
    flops_dst = 2 * (2 * N_t) * n * n  # one real (2*N_t, n) x (n, n) matmul
    peaks = _chip_peaks()
    out = {
        "dst_fwd_ms": round(t_dst * 1e3, 3),
        "dst_fourstep_ms": round(t_dst4 * 1e3, 3),
        "rfft_irfft_roundtrip_ms": round(t_fft2 * 1e3, 3),
        "mxu_fourstep_roundtrip_ms": round(t_mxu2 * 1e3, 3),
        "idst_ms": round(t_idst * 1e3, 3),
        "full_refine0_ms": round(t_full0 * 1e3, 3),
        "stage_sum_ms": round((t_dst + t_fft2 + t_idst) * 1e3, 3),
        "transform_bound": bool(t_dst + t_fft2 + t_idst >= 0.9 * t_full0),
    }
    if peaks["bf16_tflops"]:
        out["mxu_fraction_dst_f32eff"] = round(
            flops_dst / t_dst / 1e12 / (peaks["bf16_tflops"] / 6.0), 3
        )
    return out


def stage_heat_2d():
    """Heat family in 2D on hardware: lumped 2D rank-2 SMW direct solve at
    N_x=256, N_t=64 (8.3M DoFs) with the REAL error metric vs the separable
    product-sine manufactured solution. r5 (VERDICT r4 item 5) adds the
    full ladder on-device: (a) the polish/dword accuracy rung (gate:
    rel_f64_dword <= 1e-6 -- reference complex128 parity in kind,
    Control_Wave_PC.py:372), and (b) a SECOND tau (N_t=128, same N_x) so
    backward Euler's O(tau) order is visible in the artifact itself
    (expected error ratio ~2)."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from optimal_control_paradiag_tpu import ProblemConfig
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem, HeatSolution

    prob = HeatControlProblem(
        ProblemConfig(N_x=256, N_t=64, dim=2, mass="lumped", dtype=jnp.float32)
    )
    wb = jax.jit(prob.build_woodbury_solver(refine=1))
    b = prob.rhs
    x = wb(b)
    x.block_until_ready()

    s = math.sqrt(prob.config.gamma)
    sol = HeatSolution(u=x[0] / s, p=x[1], result=None)
    rel = prob.relative_residual_f64(sol)
    err = prob.error_vs_analytic(sol)
    ms = _chain_time(wb, b, chain=20, reps=REPS) * 1e3
    # (a) dword ladder on the same 2D problem.
    pol = jax.jit(prob.build_polished_solver(polish=1, dword=True))
    xe = pol(b)
    jax.block_until_ready(xe)
    xs = np.asarray(xe[0], np.float64) + np.asarray(xe[1], np.float64)
    bb = np.asarray(b, np.float64)
    rr = prob.matvec_host_f64(xs) - bb
    rel_dword = float(np.linalg.norm(rr.ravel()) / np.linalg.norm(bb.ravel()))
    # (b) second tau on hardware: N_t doubled -> error should halve (O(tau)).
    prob2 = HeatControlProblem(
        ProblemConfig(N_x=256, N_t=128, dim=2, mass="lumped", dtype=jnp.float32)
    )
    x2 = jax.jit(prob2.build_woodbury_solver(refine=1))(prob2.rhs)
    jax.block_until_ready(x2)
    sol2 = HeatSolution(u=x2[0] / s, p=x2[1], result=None)
    err2 = prob2.error_vs_analytic(sol2)
    out = {
        "n_dofs": 2 * prob.config.N_t * prob.space.n,
        "rel_f64": rel,
        "rel_f64_dword": rel_dword,
        "error_vs_analytic_2d": err,
        "error_vs_analytic_2d_Nt128": err2,
        "tau_order_ratio": round(err / err2, 2) if err2 else None,
        "ms_per_solve": round(ms, 3),
    }
    if rel_dword > 1e-6:
        out["gate_failed_dword"] = f"heat 2D dword rel {rel_dword:.3e} > 1e-6"
    return out


def stage_heat_2d_consistent():
    """2D CONSISTENT-mass heat on hardware (VERDICT r4 item 5): GMRES on
    the true operator preconditioned by the EXACT tensor-mass surrogate SMW
    direct solve (HeatControlProblem.build_tensor_gmres_solver) --
    mesh-independent iterations, mirroring the wave family's
    consistent_2d_woodbury stage. N_x=192, N_t=128 (9.3M DoFs), f32."""
    import math

    import jax
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu import ProblemConfig
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem, HeatSolution

    prob = HeatControlProblem(
        ProblemConfig(N_x=192, N_t=128, dim=2, mass="consistent", dtype=jnp.float32)
    )
    solve = prob.build_tensor_gmres_solver(rtol=1e-5, maxiter=30, with_result=True)
    run = jax.jit(solve)
    b = prob.rhs
    x, res = run(b)
    jax.block_until_ready(x)
    s = math.sqrt(prob.config.gamma)
    sol = HeatSolution(u=x[0] / s, p=x[1], result=None)
    rel = prob.relative_residual_f64(sol)
    ms = _chain_time(lambda bb: run(bb)[0], b, chain=10, reps=REPS) * 1e3
    return {
        "n_dofs": 2 * prob.config.N_t * prob.space.n,
        "iters": int(res.iterations),
        "rel_f64": rel,
        "ms_per_solve": round(ms, 3),
    }


def stage_unstructured_eig():
    """UNSTRUCTURED solve AT THE WALL (VERDICT r3 item 1): perturbed
    triangle mesh with n >= 2e4 interior DoFs, N_t = 64 (2.6M all-at-once
    unknowns) -- generalized-eigenbasis ParaDiag (paradiag/eigbasis.py):
    one f32 pencil eigendecomposition (setup; cached on disk), then the
    FIXED 2-step Richardson form of the eig-Woodbury direct solve
    (eigbasis.build_eig_direct_fn -- the shape whose compile survives the
    axon relay at this size; NOT an adaptive Krylov loop, so the recorded
    ``richardson_steps`` is a constant by construction and the only live
    gate is the measured f64 relative residual, rel_f64 <= 5e-4). The
    plain-circulant alternative needs 119-284 GROWING iterations at a tenth
    of this size (measured, paradiag/eigbasis.py); the reference's MUMPS
    analogue would iterate identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from optimal_control_paradiag_tpu import ProblemConfig, native
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
    from optimal_control_paradiag_tpu.models.wave import WaveControlProblem, WaveSolution
    from optimal_control_paradiag_tpu.paradiag.eigbasis import (
        build_eig_basis,
        build_eig_direct_fn,
    )

    if not native.available():
        return {"skipped": "native toolchain unavailable"}
    from optimal_control_paradiag_tpu.paradiag.eigbasis import (
        load_eig_basis,
        save_eig_basis,
    )

    N, N_t = 144, 64  # n = 143^2 = 20449 interior DoFs
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    rng = np.random.default_rng(0)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    sp = make_general_space(pts, tris, dtype=jnp.float32)
    prob = WaveControlProblem(
        ProblemConfig(N_x=N, N_t=N_t, dim=2, dtype=jnp.float32), space=sp
    )
    t0 = time.time()
    setup_method = None
    if jax.default_backend() == "tpu":
        # r5 (VERDICT r4 item 1): the blocked spectral divide-and-conquer
        # eigh runs the whole pencil factorization ON DEVICE in minutes
        # (paradiag/sdc.py) -- the stage now PAYS and RECORDS the setup
        # every run instead of hiding a 67-minute host eigh behind a
        # machine-local cache (r4's reproducibility gap, item 8).
        from optimal_control_paradiag_tpu.paradiag.sdc import sdc_eigh

        basis = build_eig_basis(sp, method="sdc")
        setup_method = {"method": "sdc", **{
            k: v for k, v in sdc_eigh.last_stats.items() if k != "ns_iters"
        }}
    else:
        # CPU/logic runs: the cached basis (or the slow host build).
        cache = os.path.join(_HERE, "artifacts", "cache", f"eig_basis_N{N}.npz")
        if os.path.exists(cache):
            basis = load_eig_basis(cache, sp)
            setup_method = {"method": "disk_cache"}
        else:
            basis = build_eig_basis(sp, method="torch")
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            save_eig_basis(cache, basis)
            setup_method = {"method": "torch"}
    basis.V.block_until_ready()
    t_eig = time.time() - t0
    # Richardson args-form (build_eig_direct_fn): one W apply + 'steps'
    # defect corrections, with the basis matrix an EXPLICIT jit argument --
    # an executable parameter, not a 1.7 GB embedded program constant (the
    # closure/GMRES forms' compile RPC broke the relay; eigbasis.py note).
    # steps=8: the SDC f32 basis contracts ~0.18/step (vs ~1e-3 for a host
    # LAPACK basis); 8 steps reach the f32 representation floor (measured
    # ladder on v5e: steps 2/4/8/16 -> 2.6e-2 / 8.4e-4 / 6.63e-5 / 6.62e-5,
    # artifacts/experiments/tpu_bench_r5.md) at ~0.13 s/solve -- still
    # direct-solve-cheap.
    steps = 8
    fn = jax.jit(build_eig_direct_fn(prob.operator, basis, steps=steps))
    V = basis.V
    b = prob.rhs
    x = fn(b, V)
    jax.block_until_ready(x)
    rel = prob.relative_residual_f64(WaveSolution(u=x[0], p=x[1], result=None))

    # V-threading chain timer (the shared _chain_time would close over V).
    import statistics as _st
    from jax import lax as _lax

    fn_impl = build_eig_direct_fn(prob.operator, basis, steps=steps)
    chain = 5

    @jax.jit
    def solve_chain(b, V):
        def body(i, carry):
            return b + 1e-20 * fn_impl(carry, V)

        xlast = _lax.fori_loop(0, chain - 1, body, b)
        return jnp.sum(jnp.abs(fn_impl(xlast, V)))

    _ = float(solve_chain(b, V))
    _times = []
    for _ in range(REPS):
        _t0 = time.perf_counter()
        _ = float(solve_chain(b, V))
        _times.append(time.perf_counter() - _t0)
    ms = _st.median(_times) / chain * 1e3
    out = {
        "n_interior": sp.n,
        "n_dofs": 2 * N_t * sp.n,
        "eig_setup_s": round(t_eig, 1),
        "eig_setup": setup_method,
        "richardson_steps": steps,
        "rel_f64": rel,
        "ms_per_solve": round(ms, 3),
    }
    if rel > 5e-4:
        out["gate_failed_rel"] = f"rel {rel:.3e} > 5e-4"
    return out


def _cpu_cache_key():
    return f"nx{N_X}_nt{N_T}_{platform.node()}"


def load_cpu_baseline():
    """CPU baseline from the committed cache (regenerated by the child run
    only on cache miss -- the round-2 timeout came from re-measuring a
    minutes-long CPU GMRES baseline inside every driver run)."""
    try:
        with open(CPU_CACHE) as f:
            cache = json.load(f)
        return cache.get(_cpu_cache_key())
    except (OSError, json.JSONDecodeError):
        return None


def store_cpu_baseline(entry):
    try:
        with open(CPU_CACHE) as f:
            cache = json.load(f)
    except (OSError, json.JSONDecodeError):
        cache = {}
    cache[_cpu_cache_key()] = entry
    os.makedirs(os.path.dirname(CPU_CACHE), exist_ok=True)
    with open(CPU_CACHE, "w") as f:
        json.dump(cache, f, indent=1)


def run_cpu_child(timeout_s):
    """Measure the CPU baseline in a subprocess (tiny protocol: chain=3,
    reps=1 -- the baseline is minutes-per-solve GMRES; we need a scale, not
    a percentile)."""
    env = dict(os.environ, BENCH_CPU_CHILD="1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout_s,
    )
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def cpu_child_main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    prob = make_problem(N_x=N_X, N_t=N_T)
    out = {}
    try:
        out["cpu_woodbury_ms"] = stage_woodbury(prob, "fft", reps=1, chain=3)["ms_per_solve"]
    except Exception:  # noqa: BLE001
        pass
    try:
        out["cpu_spectral_ms"] = stage_spectral_gmres(prob, chain=3, reps=1)["ms_per_solve"]
    except Exception:  # noqa: BLE001
        pass
    print(json.dumps(out))


def main():
    if os.environ.get("BENCH_CPU_CHILD"):
        cpu_child_main()
        return

    if os.environ.get("BENCH_PLATFORM"):
        # Logic-testing escape hatch: the axon sitecustomize force-registers
        # the TPU plugin, so JAX_PLATFORMS env alone cannot keep a process
        # off the tunnel -- only a post-import config.update can (same
        # pattern as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from optimal_control_paradiag_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu.ops.allatonce import operator_nnz

    suite = {
        "config": {
            "N_x": N_X,
            "N_t": N_T,
            "refine": REFINE,
            "chain": CHAIN,
            "budget_s": BUDGET_S,
        }
    }

    def guard(name, fn, *a, est_s=0.0, **kw):
        """Run a stage if its cost estimate fits the remaining budget."""
        if est_s and remaining() < est_s:
            suite[name] = {"skipped": "budget", "est_s": est_s, "remaining_s": round(remaining(), 1)}
            return suite[name]
        try:
            t0 = time.time()
            suite[name] = fn(*a, **kw)
            suite[name]["wall_s"] = round(time.time() - t0, 1)
        except Exception as exc:  # noqa: BLE001
            suite[name] = {"error": f"{type(exc).__name__}: {exc}"[:400]}
        return suite[name]

    def write_suite():
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(suite, f, indent=1)

    # ---- headline candidates (mandatory; ~3 min on the axon relay) ----
    # mxu first (r5: the four-step matmul time transform removes the 1.1 ms
    # jnp.fft roundtrip the r4 breakdown identified -- the recorded attack
    # on the transform bound), then pallas (the r1-r4 winner, 2.34-2.46 ms),
    # then fft as the accuracy-gate alternative. The dft variant has never
    # won (2.65-3.13 ms) and once ate 882 s of wall on a flaky relay -- it
    # runs in the budget-gated tier below, so slow-relay runs still land
    # the headline quickly.
    prob = make_problem(N_x=N_X, N_t=N_T)
    # pallas2 (r5 winner, 2.128 ms measured): the fused elementwise kernel
    # with the two-for-one PACKED time FFT (z = u + i p through one complex
    # FFT -- half the 1.15 ms rfft/irfft work the breakdown identified).
    r_pl2 = guard(
        "woodbury_pallas_packed", stage_woodbury_pallas, prob, pack_fft=True
    )
    r_pl = guard("woodbury_pallas", stage_woodbury_pallas, prob, pack_fft=False)
    r_fft = guard("woodbury_fft", stage_woodbury, prob, "fft")
    # recorded transform levers (they lose; kept as headline candidates so
    # regressions in the winner surface immediately): four-step MXU
    # factorizations of the time transform and of both transforms.
    r_mxu = guard("woodbury_mxu", stage_woodbury, prob, "mxu", est_s=90)
    prob4 = make_problem(N_x=N_X, N_t=N_T, dst_method="mxu4")
    r_mxu4 = guard("woodbury_mxu4", stage_woodbury, prob4, "mxu", est_s=90)

    cands = []
    for name, r, fused in (
        ("fft", r_fft, False),
        ("mxu", r_mxu, False),
        ("mxu4", r_mxu4, False),
        ("pallas", r_pl, True),
        ("pallas_packed", r_pl2, True),
    ):
        if "ms_per_solve" in r and r.get("rel_f64", 1.0) <= MAX_REL_RESIDUAL:
            cands.append((r["ms_per_solve"], name, r, fused))
    if not cands:
        write_suite()
        best = min(
            (r for r in (r_fft, r_pl, r_pl2, r_mxu, r_mxu4) if "rel_f64" in r),
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

    # ---- CPU baseline: cache first; regenerate only if budget allows ----
    cpu = load_cpu_baseline()
    if cpu is None and remaining() > 240:
        try:
            cpu = run_cpu_child(timeout_s=max(60, remaining() - 90))
            if cpu:
                store_cpu_baseline(cpu)
        except Exception:  # noqa: BLE001
            cpu = None
    vs_same_algo = round(cpu["cpu_woodbury_ms"] / ms, 2) if cpu and "cpu_woodbury_ms" in cpu else 0.0
    vs_ref_algo = round(cpu["cpu_spectral_ms"] / ms, 2) if cpu and "cpu_spectral_ms" in cpu else 0.0
    if cpu:
        suite["cpu_baseline"] = {**cpu, "cached": True}

    # ---- headline JSON: printed NOW, so the scoreboard always has it ----
    print(
        json.dumps(
            {
                "metric": f"paradiag_direct_solve_1d_nx{N_X}_nt{N_T}_ms",
                "value": round(ms, 3),
                "unit": "ms",
                # like-for-like: same Woodbury direct solve on this host's CPU
                "vs_baseline": vs_same_algo,
                # cross-algorithm: reference's iterative ParaDiag GMRES on CPU
                "vs_reference_algo_cpu": vs_ref_algo,
                "vs_same_algo_cpu": vs_same_algo,
            }
        ),
        flush=True,
    )
    write_suite()

    # ---- roofline for the chosen headline (cheap, analytic) ----
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
    write_suite()

    # ---- optional stages, budget-gated, priority order ----
    if SUITE:
        try:
            guard("woodbury_dft", stage_woodbury, prob, "dft", est_s=90)
            write_suite()
            guard("woodbury_polished", stage_woodbury_polished, prob, est_s=90)
            write_suite()
            guard("breakdown", stage_breakdown, prob, est_s=90)
            write_suite()
            guard("lumped_2d_woodbury", stage_lumped_2d, est_s=120)
            write_suite()
            guard("spectral_gmres", stage_spectral_gmres, prob, est_s=120)
            write_suite()
            guard("consistent_2d_woodbury", stage_consistent_2d, est_s=150)
            write_suite()
            guard("batched_woodbury", stage_batched, prob, est_s=60)
            write_suite()
            guard("heat_woodbury", stage_heat, est_s=90)
            write_suite()
            guard("heat_2d_woodbury", stage_heat_2d, est_s=150)
            write_suite()
            guard("heat_2d_consistent", stage_heat_2d_consistent, est_s=120)
            write_suite()
            # est 150: measured 105 s on the relay once the factor tensors
            # ship as executable parameters instead of embedded constants
            # (was ~774 s with constant-folding; tpu_bench_r3.md).
            guard("unstructured_blockband", stage_unstructured, est_s=150)
            write_suite()
            # Wall-size unstructured direct solve (n=20449, N_t=64). On a
            # TPU backend the stage BUILDS the basis by on-device SDC and
            # records the setup time (r5; ~3-6 min incl. first-run
            # compiles, seconds of device time warm-cache). On CPU logic
            # runs it needs the disk cache or the ~75 min host eigh, which
            # no budget accommodates -- the guard then skips.
            import jax as _jax

            _eig_cache = os.path.join(
                _HERE, "artifacts", "cache", "eig_basis_N144.npz"
            )
            _tpu = _jax.default_backend() == "tpu"
            guard(
                "unstructured_eig_wall",
                stage_unstructured_eig,
                est_s=600 if _tpu else (240 if os.path.exists(_eig_cache) else 4800),
            )
        except Exception as exc:  # noqa: BLE001  (headline already printed)
            suite["suite_error"] = f"{type(exc).__name__}: {exc}"[:400]

    suite["total_wall_s"] = round(time.time() - T0, 1)
    write_suite()


if __name__ == "__main__":
    main()
