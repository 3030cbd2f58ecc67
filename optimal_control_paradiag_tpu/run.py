"""CLI driver -- the reference's L5 experiment layer as a proper tool.

Replaces the module-level script at ``Control_Wave_PC.py:334-372, 562-631``
(config constants, pc/complex dispatch, wall-clock prints, convergence sweep
writing ``error.out``):

  python -m optimal_control_paradiag_tpu.run                 # default run
  python -m optimal_control_paradiag_tpu.run --nx 128 --nt 129 --rtol 1e-8
  python -m optimal_control_paradiag_tpu.run --sweep          # N = 5..70 sweep
  python -m optimal_control_paradiag_tpu.run --dim 2 --mass lumped
  python -m optimal_control_paradiag_tpu.run --method direct  # LU baseline
  python -m optimal_control_paradiag_tpu.run --model heat --method woodbury
  python -m optimal_control_paradiag_tpu.run --model heat --sweep  # tau-order
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument(
        "--model",
        default="wave",
        choices=("wave", "heat"),
        help="model family: the reference's wave control problem, or the "
        "backward-Euler heat control problem (models/heat.py)",
    )
    p.add_argument(
        "--nx",
        type=int,
        default=None,
        help="spatial elements (default 80, the reference's; the heat tau-sweep "
        "defaults to 128 so the spatial error stays subdominant)",
    )
    p.add_argument("--nt", type=int, default=81, help="time slices (ref default 81)")
    p.add_argument("--T", type=float, default=2.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--dim", type=int, default=1, choices=(1, 2))
    p.add_argument("--mass", default="consistent", choices=("consistent", "lumped"))
    p.add_argument("--dtype", default="float64", choices=("float32", "float64"))
    p.add_argument(
        "--method",
        default="gmres",
        choices=("gmres", "minres", "direct", "spectral", "woodbury"),
    )
    p.add_argument("--pc", default="paradiag", choices=("paradiag", "none"))
    p.add_argument(
        "--pc-variant",
        default="fulldiag",
        choices=("fulldiag", "eig", "block", "blockdense", "blockline", "blockband"),
    )
    p.add_argument(
        "--inner",
        default="auto",
        choices=("auto", "dst", "tridiag_thomas", "tridiag_pcr", "cocg", "cocg_jacobi"),
    )
    p.add_argument("--rtol", type=float, default=1e-5)
    p.add_argument("--restart", type=int, default=300)
    p.add_argument("--maxiter", type=int, default=1000)
    p.add_argument(
        "--mesh",
        default=None,
        metavar="TIME,SPACE",
        help="run the solve sharded over a ('time','space') device mesh, "
        "e.g. '4,2' (needs 8 devices). Uses jax.devices(); for a virtual "
        "CPU mesh set XLA_FLAGS=--xla_force_host_platform_device_count=N "
        "and --platform cpu",
    )
    p.add_argument(
        "--mesh-file",
        default=None,
        metavar="NPZ",
        help="solve on an ARBITRARY triangle mesh: an .npz with 'points' "
        "(n,2) float and 'triangles' (m,3) int (optional boolean 'interior' "
        "mask; default = topological boundary detection). Wave model, dim=2; "
        "--nx is ignored for geometry. The reference's any-Mesh capability "
        "(Control_Wave_PC.py:16-19) as a CLI surface.",
    )
    p.add_argument("--sweep", action="store_true", help="run the N=5..70 convergence sweep (ref :583-631)")
    p.add_argument(
        "--rebuild-eig-cache",
        action="store_true",
        help="(re)build the cached generalized-eigenbasis for the wall-size "
        "unstructured bench stage (artifacts/cache/eig_basis_N144.npz; "
        "n=20449 interior DoFs) and exit. Prints a time estimate up front. "
        "--eig-method picks the backend; --nx overrides the mesh size "
        "(N interior nodes per side = nx-1).",
    )
    p.add_argument(
        "--eig-method",
        default="auto",
        choices=("auto", "sdc", "torch", "host", "device"),
        help="pencil-eigendecomposition backend for --rebuild-eig-cache and "
        "unstructured solves: 'sdc' = blocked spectral divide-and-conquer on "
        "the TPU (minutes at n=2e4), 'torch'/'host' = host LAPACK (hours at "
        "n=2e4 on a small host), 'device' = monolithic jnp.linalg.eigh "
        "(fast but its one-program compile is impractical over the axon "
        "relay past n~2e3), 'auto' = sdc on TPU else torch",
    )
    p.add_argument("--out", default="out", help="output directory")
    p.add_argument("--write-vtk", action="store_true")
    p.add_argument("--plot", action="store_true")
    p.add_argument("--profile", default=None, help="jax.profiler trace directory")
    p.add_argument("--x64", action="store_true", help="enable float64 (CPU)")
    p.add_argument(
        "--platform",
        default="auto",
        choices=("auto", "cpu", "tpu"),
        help="'auto': CPU for float64 (the TPU backend has no c128 FFT / f64 "
        "math), default backend for float32",
    )
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.mesh and args.sweep:
        raise SystemExit(
            "--mesh and --sweep cannot be combined (the sweep runs many "
            "problem sizes that would each need their own sharded program); "
            "run the sweep unsharded, or single sizes with --mesh"
        )
    if args.mesh_file and args.model == "heat":
        raise SystemExit(
            "--mesh-file applies to the wave model only (the heat family "
            "builds structured spaces); the user mesh would otherwise be "
            "silently dropped"
        )
    if args.mesh_file and args.sweep:
        raise SystemExit(
            "--mesh-file with --sweep is not supported: the sweep rebuilds "
            "structured N_x=N_t=N problems, which would silently drop the "
            "user mesh"
        )
    if args.rebuild_eig_cache:
        return rebuild_eig_cache(args)
    # --nx default resolution: None means "not given" so per-mode defaults
    # (wave: 80, heat sweep: 128) never collide with an explicit value.
    if args.nx is None and not (args.model == "heat" and args.sweep):
        args.nx = 80
    import jax

    platform = args.platform
    if platform == "auto" and args.dtype == "float64":
        platform = "cpu"
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.x64 or args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    from optimal_control_paradiag_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
    from optimal_control_paradiag_tpu.io.writers import write_solution
    from optimal_control_paradiag_tpu.utils.timing import StageTimer, profile_trace

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    solver = SolverConfig(
        method=args.method,
        pc=None if args.pc == "none" else args.pc,
        pc_variant=args.pc_variant,
        inner=args.inner,
        rtol=args.rtol,
        restart=args.restart,
        maxiter=args.maxiter,
    )
    os.makedirs(args.out, exist_ok=True)

    if args.mesh and not args.sweep:
        space = None
        if args.mesh_file:
            # Sharded solve on a USER mesh (r5): the pencil eigenbasis makes
            # the general space diagonalizable, and the eigenbasis problem
            # rides the standard sharded Woodbury stage layouts (V-matmuls
            # partition; zero all-gathers -- tests/test_parallel.py).
            if solver.method != "woodbury":
                raise SystemExit(
                    "--mesh-file with --mesh supports --method woodbury (the "
                    "eigenbasis direct solve); other methods dispatch on "
                    "structured spaces"
                )
            import numpy as np

            from optimal_control_paradiag_tpu.fem.general import make_general_space
            from optimal_control_paradiag_tpu.paradiag.eigbasis import build_eig_basis

            z = np.load(args.mesh_file)
            gsp = make_general_space(
                z["points"],
                z["triangles"],
                dtype=dtype,
                interior=z["interior"] if "interior" in z.files else None,
            )
            space = build_eig_basis(gsp, method=args.eig_method)
            args.dim = 2
        return run_sharded(args, dtype, solver, space=space)
    if args.model == "heat":
        return run_heat(args, dtype, solver)
    if args.sweep:
        return run_sweep(args, dtype, solver)

    space = None
    if args.mesh_file:
        import numpy as np

        from optimal_control_paradiag_tpu.fem.general import make_general_space

        z = np.load(args.mesh_file)
        space = make_general_space(
            z["points"],
            z["triangles"],
            dtype=dtype,
            interior=z["interior"] if "interior" in z.files else None,
        )
        args.dim = 2
    cfg = ProblemConfig(
        N_x=args.nx, N_t=args.nt, T=args.T, gamma=args.gamma,
        dim=args.dim, mass=args.mass, dtype=dtype,
    )
    timer = StageTimer()
    with timer.stage("setup"):
        prob = WaveControlProblem(cfg, space=space)
        _ = prob.rhs
    with profile_trace(args.profile):
        with timer.stage("solve (compile + run)") as out:
            sol = prob.solve(solver)
            out["fence"] = sol.u
        with timer.stage("solve (cached)") as out:
            sol = prob.solve(solver)
            out["fence"] = sol.u
    record = {
        "config": {k: str(v) for k, v in vars(args).items()},
        "iterations": int(sol.result.iterations) if sol.result is not None else None,
        "converged": bool(sol.result.converged) if sol.result is not None else True,
        "residual_norm_true": float(prob.residual_norm(sol)),
        "error_reference_metric": prob.error_vs_analytic(sol),
        "error_aligned_metric": prob.error_aligned(sol),
        "timings_ms": {k: v * 1000 for k, v in timer.records.items()},
    }
    print(json.dumps(record, indent=2))
    npz = write_solution(prob, sol, os.path.join(args.out, "solution"), vtk=args.write_vtk)
    print(f"wrote {npz}")
    if sol.result is not None:
        import numpy as np

        hist = np.asarray(sol.result.residual_history)
        np.savetxt(os.path.join(args.out, "residuals.out"), hist[np.isfinite(hist)])
    if args.plot:
        from optimal_control_paradiag_tpu.viz.plotting import plot_residual_history, plot_time_slice

        plot_time_slice(npz, out=os.path.join(args.out, "slice.png"))
        if sol.result is not None:
            plot_residual_history(
                sol.result.residual_history, out=os.path.join(args.out, "residuals.png")
            )
    return record


def rebuild_eig_cache(args):
    """Regenerate the wall-stage eigenbasis cache (VERDICT r4 item 8: a
    fresh clone must be able to rebuild the gitignored basis with an honest
    time estimate instead of silently paying an hour inside bench.py)."""
    import numpy as np

    from optimal_control_paradiag_tpu import native
    from optimal_control_paradiag_tpu.fem.general import boundary_nodes, make_general_space
    from optimal_control_paradiag_tpu.models.wave import WaveControlProblem  # noqa: F401
    from optimal_control_paradiag_tpu.paradiag.eigbasis import (
        build_eig_basis,
        save_eig_basis,
    )

    import jax
    import jax.numpy as jnp

    from optimal_control_paradiag_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    N = args.nx if args.nx else 144
    n = (N - 1) ** 2
    method = args.eig_method
    if method == "auto":
        method = "sdc" if jax.default_backend() == "tpu" else "torch"
    est = {
        # measured: sdc ~3 min at n=2e4 on v5e incl. compiles; torch f32
        # 4009 s at n=20449 on the 2-core gate host; host numpy f64 slower.
        "sdc": max(60.0, 2.5e-12 * n**3 / 60 + 120),
        "torch": 4.7e-10 * n**3,
        "host": 9e-10 * n**3,
        "device": max(30.0, 1e-12 * n**3),
    }[method]
    print(f"building eig basis: N={N} (n={n} interior DoFs), method={method}, "
          f"estimated {est:.0f} s on this class of machine", flush=True)
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    bnd = boundary_nodes(pts.shape[0], tris)
    rng = np.random.default_rng(0)
    pts = pts.copy()
    pts[~bnd] += rng.uniform(-0.18 / N, 0.18 / N, size=pts[~bnd].shape)
    sp = make_general_space(pts, tris, dtype=jnp.float32)
    t0 = time.time()
    basis = build_eig_basis(sp, method=method)
    jax.block_until_ready(basis.V)
    t_build = time.time() - t0
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "cache", f"eig_basis_N{N}.npz",
    )
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    path = save_eig_basis(cache, basis)
    rec = {"N": N, "n": n, "method": method, "build_s": round(t_build, 1), "path": path}
    print(json.dumps(rec, indent=2))
    return rec


def run_sharded(args, dtype, solver, space=None):
    """Sharded execution over a ('time','space') device mesh -- the CLI
    surface of the parallel layer (parallel/solve.py). Both model families;
    ``space`` (an EigBasisSpace) carries a user mesh through the eigenbasis
    sharded path (--mesh-file with --mesh)."""
    import math

    import jax

    from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem
    from optimal_control_paradiag_tpu.parallel.sharding import make_layout
    from optimal_control_paradiag_tpu.parallel.solve import (
        make_sharded_heat_solver,
        make_sharded_solver,
    )

    try:
        n_time, n_space = (int(v) for v in args.mesh.split(","))
    except ValueError:
        raise SystemExit(f"--mesh expects 'TIME,SPACE' integers, got {args.mesh!r}")
    layout = make_layout(n_time, n_space)
    cfg = ProblemConfig(
        N_x=args.nx, N_t=args.nt, T=args.T, gamma=args.gamma,
        dim=args.dim, mass=args.mass, dtype=dtype,
    )
    if args.model == "heat":
        from optimal_control_paradiag_tpu.models.heat import HeatControlProblem, HeatSolution

        prob = HeatControlProblem(cfg)
        run, sharding = make_sharded_heat_solver(prob, solver, layout)
    else:
        prob = WaveControlProblem(cfg, space=space)
        run, sharding = make_sharded_solver(prob, solver, layout)
    b = jax.device_put(prob.rhs, sharding) if sharding is not None else prob.rhs

    t0 = time.time()
    x, res = run(b)
    jax.block_until_ready(x)
    t_compile = time.time() - t0
    t0 = time.time()
    x, res = run(b)
    jax.block_until_ready(x)
    t_cached = time.time() - t0

    if args.model == "heat":
        s = math.sqrt(cfg.gamma)
        sol = HeatSolution(u=x[0] / s, p=x[1], result=res)
        resid = prob.relative_residual(sol)
    else:
        from optimal_control_paradiag_tpu.models.wave import WaveSolution

        u, p = prob._unscale(x)
        sol = WaveSolution(u=u, p=p, result=res)
        resid = float(prob.residual_norm(sol))
    record = {
        "mesh": {"time": n_time, "space": n_space, "devices": n_time * n_space},
        "model": args.model,
        "iterations": int(res.iterations) if res is not None else None,
        "residual": resid,
        "timings_ms": {"solve (compile + run)": t_compile * 1e3, "solve (cached)": t_cached * 1e3},
    }
    print(json.dumps(record, indent=2))
    return record


def run_heat(args, dtype, solver):
    """The heat-control family (models/heat.py). ``--sweep`` runs the
    tau-refinement study (N_t doubling at fixed N_x): backward Euler's O(tau)
    is the analogue of the reference's O(N^-2) wave sweep
    (``Control_Wave_PC.py:583-631``)."""
    import numpy as np

    from optimal_control_paradiag_tpu import ProblemConfig
    from optimal_control_paradiag_tpu.models.heat import HeatControlProblem
    from optimal_control_paradiag_tpu.utils.timing import StageTimer

    if solver.method not in ("woodbury", "gmres", "minres", "direct"):
        raise SystemExit(
            f"--model heat supports woodbury/gmres/minres/direct, not {solver.method!r}"
        )

    if args.sweep:
        Nts = [8, 16, 32, 64, 128]
        nx = args.nx if args.nx is not None else 128
        errors, iters = [], []
        for N_t in Nts:
            prob = HeatControlProblem(
                ProblemConfig(N_x=nx, N_t=N_t, T=args.T,
                              gamma=args.gamma, dim=args.dim, mass=args.mass, dtype=dtype)
            )
            sol = prob.solve(solver)
            errors.append(prob.error_vs_analytic(sol))
            iters.append(int(sol.result.iterations) if sol.result is not None else 0)
            print(f"N_t={N_t:4d} iters={iters[-1]:3d} e={errors[-1]:.6e}")
        np.savetxt(os.path.join(args.out, "error.out"), np.asarray(errors))
        with open(os.path.join(args.out, "sweep.json"), "w") as f:
            json.dump({"N_t": Nts, "error": errors, "iterations": iters}, f, indent=2)
        return {"N_t": Nts, "errors": errors}

    cfg = ProblemConfig(
        N_x=args.nx, N_t=args.nt, T=args.T, gamma=args.gamma,
        dim=args.dim, mass=args.mass, dtype=dtype,
    )
    timer = StageTimer()
    with timer.stage("setup"):
        prob = HeatControlProblem(cfg)
        _ = prob.rhs
    with timer.stage("solve (compile + run)") as out:
        sol = prob.solve(solver)
        out["fence"] = sol.u
    with timer.stage("solve (cached)") as out:
        sol = prob.solve(solver)
        out["fence"] = sol.u
    record = {
        "config": {k: str(v) for k, v in vars(args).items()},
        "iterations": int(sol.result.iterations) if sol.result is not None else None,
        "relative_residual": prob.relative_residual(sol),
        "error_vs_analytic": prob.error_vs_analytic(sol),
        "timings_ms": {k: v * 1000 for k, v in timer.records.items()},
    }
    print(json.dumps(record, indent=2))
    np.savez(
        os.path.join(args.out, "heat_solution.npz"),
        u=np.asarray(sol.u), p=np.asarray(sol.p),
    )
    return record


def run_sweep(args, dtype, solver):
    """The reference's convergence sweep (``Control_Wave_PC.py:583-631``):
    N_x = N_t = N for N in 5..70 step 5; writes ``error.out`` (their format:
    one error per line) plus a richer JSON record."""
    import numpy as np

    from optimal_control_paradiag_tpu import ProblemConfig, WaveControlProblem

    Ns = list(range(5, 71, 5))
    errors, aligned, iters = [], [], []
    for N in Ns:
        t0 = time.time()
        prob = WaveControlProblem(
            ProblemConfig(N_x=N, N_t=N, T=args.T, gamma=args.gamma, dim=args.dim, mass=args.mass, dtype=dtype)
        )
        sol = prob.solve(solver)
        errors.append(prob.error_vs_analytic(sol))
        aligned.append(prob.error_aligned(sol))
        iters.append(int(sol.result.iterations) if sol.result is not None else 0)
        print(f"N={N:3d} iters={iters[-1]:3d} e_ref={errors[-1]:.6e} e_aligned={aligned[-1]:.6e} ({time.time() - t0:.2f}s)")
    np.savetxt(os.path.join(args.out, "error.out"), np.asarray(errors))
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump({"N": Ns, "error_reference_metric": errors, "error_aligned_metric": aligned, "iterations": iters}, f, indent=2)
    if args.plot:
        from optimal_control_paradiag_tpu.viz.plotting import plot_convergence

        plot_convergence(Ns, errors, aligned, out=os.path.join(args.out, "convergence.png"))
    return {"N": Ns, "errors": errors}


if __name__ == "__main__":
    main()
