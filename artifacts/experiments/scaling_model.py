"""Scaling evidence for the sharded ParaDiag direct solve (VERDICT r2 item 5).

Real multi-chip hardware is not reachable from this environment (one v5e chip
behind a relay), so the >= 80%-scaling-efficiency acceptance row
(BASELINE.md) is argued with two measured ingredients instead of a hardware
claim:

1. **Virtual-device scaling runs** (this script, CPU backend with
   ``--xla_force_host_platform_device_count``): the sharded half-spectrum
   Woodbury solve at fixed global size (strong) and fixed per-device size
   (weak) over 1/2/4/8 virtual devices. Virtual devices share one host's
   cores, so absolute times do NOT model chip scaling; what the runs DO
   establish is that the partitioned program is collective-complete (it
   runs, it matches single-device answers -- tests/test_parallel.py) and
   what its collective schedule is.

2. **Counted communication volume** (this script, parsed from the compiled
   SPMD HLO): per-solve bytes through every all-to-all / all-reduce /
   collective-permute at the per-partition shapes XLA actually chose,
   vs the analytic per-chip compute+HBM model (bench.roofline_model).
   Efficiency model for a d-chip v5e pod slice:

       T_comm(d)  = sum over collectives of (operand bytes x (d-1)/d) / BW_ici
       T_chip(d)  = max(HBM bytes, MXU flops) roofline time at 1/d of the state
       efficiency = T_chip / (T_chip + T_comm)

   with BW_ici = 180 GB/s per-chip aggregate ICI (public v5e figure:
   4 links x 400 Gbpsic => ~1.6 Tbps ~ 200 GB/s; 180 used as the
   conservative achievable number).

Writes ``artifacts/scaling.json``; the analysis is summarized in
VALIDATION.md ("Scaling model").
"""

from __future__ import annotations

import collections
import json
import math
import os
import re
import statistics
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
from optimal_control_paradiag_tpu.parallel.sharding import make_layout
from optimal_control_paradiag_tpu.parallel.solve import make_sharded_solver

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scaling.json")

ITEMSIZE = {"f32": 4, "f64": 8, "c64": 8, "c128": 16, "s32": 4, "u32": 4, "pred": 1}


def _shape_bytes(s: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return 0
    dt = ITEMSIZE.get(m.group(1), 4)
    dims = m.group(2)
    n = math.prod(int(v) for v in dims.split(",")) if dims else 1
    return dt * n


def collective_bytes(compiled_text: str) -> dict:
    """Per-partition result bytes of each collective in the SPMD module.
    Handles tuple-shaped results (`%all-to-all = (f32[..], f32[..]) ...`)."""
    out = collections.Counter()
    for kind in ("all-to-all", "all-gather", "all-reduce", "collective-permute", "reduce-scatter"):
        for m in re.finditer(rf"%{kind}[^ ]* = (.*?) {kind}\(", compiled_text):
            shapes = re.findall(r"\w+\[[\d,]*\]", m.group(1))
            out[kind] += sum(_shape_bytes(s) for s in shapes)
            out[kind + "_count"] += 1
    return dict(out)


def timed(run, b, chain=3, reps=3):
    @jax.jit
    def chained(bb):
        x = bb
        for _ in range(chain):
            x, _ = run(bb + 1e-20 * x)
        return jnp.sum(jnp.abs(x))

    _ = float(chained(b))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(chained(b))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) / chain


def run_case(N_x, N_t, d, measure=True):
    prob = WaveControlProblem(ProblemConfig(N_x=N_x, N_t=N_t, dtype=jnp.float32))
    layout = make_layout(d, 1, jax.devices()[:d])
    solver = SolverConfig(method="woodbury")
    run, sharding = make_sharded_solver(prob, solver, layout)
    b = jax.device_put(prob.rhs, sharding) if sharding is not None else prob.rhs
    txt = jax.jit(lambda bb: run(bb)[0]).lower(b).compile().as_text()
    state_bytes = 2 * N_t * (N_x - 1) * 4
    out = {
        "N_x": N_x,
        "N_t": N_t,
        "devices": d,
        "state_bytes": state_bytes,
        "collectives": collective_bytes(txt),
    }
    if measure:
        out["ms_per_solve"] = round(timed(run, b, chain=3, reps=3) * 1e3, 2)
    return out


def efficiency_model(case, d, bw_ici_GBs=180.0, hbm_GBs=819.0):
    """v5e per-chip efficiency estimate from counted collective bytes.

    t_chip: the per-chip HBM roofline time of the sharded jnp half-spectrum
    solve (refine=1): a FIXED term -- each chip reads the full n1d^2 DST
    matrix on all 4 GEMM passes regardless of d -- plus the state-sized
    terms (4 state r/w GEMM passes, ~38 elementwise passes over the
    complex half-spectrum state for refine=1, matching bench.roofline_model)
    divided by d. The fixed matrix reads are what keep multi-chip efficiency
    high at the flagship size: comm shrinks with 1/d alongside the sharded
    state terms, while the denominator keeps the fixed term."""
    coll = case["collectives"]
    # bytes leaving each chip: all-to-all moves (d-1)/d of the per-partition
    # result; all-reduce ~ 2x operand (reduce-scatter + all-gather ring);
    # permute 1x; all-gather (d-1)x its per-partition operand.
    comm = (
        coll.get("all-to-all", 0) * (d - 1) / d
        + coll.get("all-reduce", 0) * 2.0
        + coll.get("collective-permute", 0)
        + coll.get("all-gather", 0) * (d - 1)
        + coll.get("reduce-scatter", 0) * (d - 1) / d
    )
    n = case["N_x"] - 1
    S = 2 * case["N_t"] * n * 4  # real state, f32
    Sc = 2 * (case["N_t"] // 2 + 1) * n * 8  # complex64 half-spectrum state
    passes = 15 + 23  # refine=1, jnp elementwise path (bench.roofline_model)
    hbm_fixed = 4 * n * n * 4  # DST matrix reads, NOT sharded
    hbm_sharded = (4 * S + passes * 2 * Sc) / d
    hbm = hbm_fixed + hbm_sharded
    t_comm = comm / (bw_ici_GBs * 1e9)
    t_chip = hbm / (hbm_GBs * 1e9)
    return {
        "comm_bytes_per_chip": int(comm),
        "hbm_bytes_per_chip": int(hbm),
        "hbm_fixed_bytes": int(hbm_fixed),
        "t_comm_us": round(t_comm * 1e6, 2),
        "t_chip_us": round(t_chip * 1e6, 2),
        "efficiency": round(t_chip / (t_chip + t_comm), 3),
    }


def run_heat_case(N_x, N_t, d, measure=True):
    """Second model family: the sharded rank-2 heat SMW direct solve --
    same collective accounting as the wave case."""
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem
    from optimal_control_paradiag_tpu.parallel.solve import make_sharded_heat_solver

    prob = HeatControlProblem(ProblemConfig(N_x=N_x, N_t=N_t, dtype=jnp.float32))
    layout = make_layout(d, 1, jax.devices()[:d])
    run, sharding = make_sharded_heat_solver(prob, SolverConfig(method="woodbury"), layout)
    b = jax.device_put(prob.rhs, sharding) if sharding is not None else prob.rhs
    txt = jax.jit(lambda bb: run(bb)[0]).lower(b).compile().as_text()
    out = {
        "model": "heat",
        "N_x": N_x,
        "N_t": N_t,
        "devices": d,
        "state_bytes": 2 * N_t * (N_x - 1) * 4,
        "collectives": collective_bytes(txt),
    }
    if measure:
        out["ms_per_solve"] = round(timed(run, b, chain=3, reps=3) * 1e3, 2)
    return out


def main():
    out = {"note": __doc__.split("\n")[0], "strong": [], "weak": [], "model": {}}

    # Strong scaling: fixed global size, more devices.
    for d in (1, 2, 4, 8):
        case = run_case(N_x=257, N_t=64, d=d)
        case["model_v5e"] = efficiency_model(case, d)
        out["strong"].append(case)
        print("strong", json.dumps(case))

    # Weak scaling: fixed per-device time slab.
    for d in (1, 2, 4, 8):
        case = run_case(N_x=257, N_t=16 * d, d=d)
        case["model_v5e"] = efficiency_model(case, d)
        out["weak"].append(case)
        print("weak", json.dumps(case))

    # Headline-size projection (the flagship 1D solve on an 8-chip v5e pod
    # slice): count the collectives of the ACTUAL headline-size partitioned
    # program (compile-only -- no virtual-device run at this size).
    case = run_case(N_x=2048, N_t=1024, d=8, measure=False)
    case["model_v5e"] = efficiency_model(case, 8)
    out["model"]["headline_nx2048_nt1024_d8"] = case
    print("model", json.dumps(case))

    # Second model family: the sharded heat solve's collective schedule at
    # the same sizes (correctness pinned in tests/test_parallel.py; the
    # rank-2 pipeline shares the wave's stage layouts, so the expectation
    # is the same all-to-all-only schedule -- verified here by count).
    case = run_heat_case(N_x=257, N_t=64, d=8)
    out["model"]["heat_nx257_nt64_d8"] = case
    print("heat", json.dumps(case))
    case = run_heat_case(N_x=2048, N_t=1024, d=8, measure=False)
    out["model"]["heat_nx2048_nt1024_d8"] = case
    print("heat", json.dumps(case))

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(OUT))


if __name__ == "__main__":
    main()
