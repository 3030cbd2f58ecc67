"""Blocked spectral divide-and-conquer symmetric eigensolver on TPU.

Breaks the unstructured-setup wall (VERDICT r4 item 1): the generalized
eigenbasis that makes arbitrary-mesh ParaDiag a DIRECT solve
(paradiag/eigbasis.py) needs the dense pencil eigendecomposition
``K V = M V diag(lam)``, and every monolithic route fails at the n ~ 2e4
wall size in this environment -- host LAPACK is O(n^3) on 2 cores (torch
f32: 4,009 s at n = 20449), and the single-program device routes
(``jnp.linalg.eigh``, and even a bare ``triangular_solve`` congruence) die
at compile: XLA's large-triangle factorization lowerings materialize one
full-width temporary per 128-row panel -- measured 127.2 GB of HBM demand
for the p = 20449 congruence on a 15.75 GB v5e. The reference never has
this problem only because MUMPS does a SPARSE factorization per mode
(``Control_Wave_PC.py:480-484``); the eigenbasis route buys a stronger
capability (2-step direct solves, no per-apply factorization pipeline) but
must pay a dense eigendecomposition once per mesh.

This module pays it ON DEVICE in MXU-sized pieces, using only kernels
whose TPU lowerings are well-behaved at scale: large matmuls, and
factorizations/solves with a SMALL (<= ~1k) triangle via the blocked
layer (``ops/blocked.py``). Classic spectral divide-and-conquer
(Nakatsukasa & Higham, SIAM Rev. 2013 -- public algorithm), with the
building blocks re-chosen for the TPU:

1. congruence to standard form: blocked Cholesky of M + blocked
   triangular solves (``ops.blocked``) -- S = L^{-1} K L^{-T};
2. shift: sigma ~ median of the block's diagonal (inertia-count bisection
   fallback when a shift splits degenerately);
3. sign function U = sign(S - sigma I) by a scaled NEWTON-SCHULZ
   iteration (X <- 1.5 X - 0.5 X^3): pure matmuls, three live n^2 buffers,
   no QR -- the memory-safe substitute for QDWH's tall-QR steps; sign is
   preserved exactly (odd polynomial), so accuracy is set by the final
   iterations, which run at HIGHEST precision;
4. spectral projectors P = (I -/+ U)/2; k = round((p - tr U)/2);
   randomized range-finder + CholeskyQR2 orthonormalization per projector
   (again: matmuls + small triangles only);
5. congruence Q^T S Q decouples S into two independent blocks
   (off-diagonal norm VERIFIED against ||S||_F, recorded in
   ``sdc_eigh.last_stats``); recurse until the block fits the direct base
   case -- HOST float64 LAPACK at <= base_size (cluster-robust: the FEM
   top spectrum's near-degenerate clusters spin the device eigh's
   data-dependent iteration past the relay watchdog; 2-4 s per leaf on
   host, and the leaf bases get f64 accuracy for free);
6. unwind: V = [Q1 W1, Q2 W2] -- one rectangular matmul pair per split.

Every device program is a SMALL jitted unit with static shapes, so no
single compile RPC carries the whole factorization; the persistent
compilation cache makes repeat runs compile-free. The recursion runs in
host Python -- data stays on device, only O(1) scalars (traces, medians)
cross the relay.

Accuracy: float32 Newton-Schulz drives ``||U^2 - I||_F`` to ~1e-6 ulp
scale and every split is VERIFIED by its off-diagonal norm (with
sigma-jitter retry), so the basis is the exact eigenbasis of a nearby
pencil; the downstream Richardson defect correction erases the
perturbation (small n: 2 steps match a float64-LAPACK basis to 3.7e-6,
tests/test_sdc.py; at the n=20449 wall the f32 device basis contracts
~0.18/step and floors at rel_f64 6.6e-5 in 8 steps -- the same floor the
r4 host-LAPACK-f32 basis reached).

Measured at the wall (v5e, n=20449): setup 313 s warm-cache / ~790 s with
first-run compiles -- vs 4,009 s for torch f32 on this host, and
unreachable for the monolithic device routes. Scaling: O(n^3) flops like
any dense eigensolver, but on the MXU, and the blocks are plain matmuls
that shard over a device mesh the same way every other stage does -- the
documented path to n >= 1e5 (ARCHITECTURE.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.ops.blocked import (
    blocked_cholesky,
    cholqr2,
    tri_solve_lower,
)
from optimal_control_paradiag_tpu.utils.constants import to_device

_HI = jax.lax.Precision.HIGHEST
# Inner triangle size for the blocked kernels. 1024 measured best at the
# wall (warm n=20449 runs: 252.9 s total vs 289.2 s at block 2048 -- the
# bigger panel halves the congruence's full-matrix passes, 46.5 -> 30.3 s,
# but the CholQR split phase regresses 83 -> 124 s because the inner
# 2048-triangle solves sit deeper in XLA's per-128-row-panel temp
# regime). Phase attribution lives in sdc_eigh.last_stats['phase_s'].
_BLOCK = 1024


def _fence(x):
    """Fully synchronous dispatch (see ops/blocked.py SYNC note): on the
    axon relay, compile RPCs racing in-flight heavy executions crash the
    TPU worker; fencing each unit call serializes compile and execute."""
    jax.block_until_ready(x)
    return x


# --------------------------------------------------------------- jit units


@functools.lru_cache(maxsize=None)
def _diag_stats_fn(p: int):
    @jax.jit
    def f(S):
        d = jnp.diagonal(S)
        return (
            jnp.median(d),
            jnp.max(jnp.sum(jnp.abs(S), axis=1)),
            jnp.linalg.norm(S),
        )

    return f


@functools.lru_cache(maxsize=None)
def _sign_ns_fn(p: int, maxiter: int = 110, polish: int = 3):
    """U ~ sign(S - sigma I) by scaled Newton-Schulz; returns (U, tr U,
    ||U^2 - I||_F of the LAST high-precision iterate)."""

    @jax.jit
    def f(S, sigma):
        A = S - sigma * jnp.eye(p, dtype=S.dtype)
        # alpha: a PROVABLE upper bound on ||A||_2 -- min(max row sum,
        # Frobenius). NS diverges past sqrt(3), so an underestimate is
        # fatal (a power-iteration estimate can undershoot on dense spectra
        # with no top gap), while an overestimate only costs log1.5(slack)
        # extra iterations. The row-sum bound alone overestimates the dense
        # rotated blocks (Q^T S Q is Gaussian-like) by ~sqrt(2p/pi) -- at
        # p ~ 1e4 that is ~80x, which burned the old 60-iteration budget
        # and sent NaNs downstream (r5 wall run, p=5216 block); the
        # Frobenius bound caps the overshoot at ~sqrt(p_eff) of the
        # spectral spread, and maxiter=110 covers both with room.
        alpha = jnp.maximum(
            jnp.minimum(jnp.max(jnp.sum(jnp.abs(A), axis=1)), jnp.linalg.norm(A)),
            1e-30,
        )
        X0 = A / alpha
        eye = jnp.eye(p, dtype=S.dtype)
        tol = 10.0 * jnp.finfo(S.dtype).eps * p**0.5

        def body(state):
            X, _, it = state
            X2 = jnp.matmul(X, X, precision=_HI)
            Xn = 1.5 * X - 0.5 * jnp.matmul(X, X2, precision=_HI)
            err = jnp.linalg.norm(X2 - eye) / p**0.5
            return Xn, err, it + 1

        def cond(state):
            _, err, it = state
            return jnp.logical_and(err > tol, it < maxiter)

        X, err, it = jax.lax.while_loop(cond, body, (X0, jnp.asarray(np.inf, S.dtype), 0))
        for _ in range(polish):
            X2 = jnp.matmul(X, X, precision=_HI)
            X = 1.5 * X - 0.5 * jnp.matmul(X, X2, precision=_HI)
        X = 0.5 * (X + X.T)
        defect = jnp.linalg.norm(jnp.matmul(X, X, precision=_HI) - eye) / p**0.5
        return X, jnp.trace(X), defect, it

    return f


@functools.lru_cache(maxsize=None)
def _range_fn(p: int, k: int, lo: bool):
    """Y = P_{lo/hi} G with G ~ N(0,1) p x k: the randomized range finder of
    the spectral projector (I -/+ U)/2 (the 1/2 is absorbed by QR)."""

    @jax.jit
    def f(S_unused, U, seed):
        key = jax.random.PRNGKey(seed)
        # The barrier is LOAD-BEARING: without it XLA fuses the threefry
        # generation into the HIGHEST-precision matmul's operand, and on
        # the axon TPU backend that fused form MISCOMPUTES -- measured on
        # the r5 wall run's p=3011 block: Y was 0.57-relative outside the
        # sign's invariant subspace with a certified-perfect U and healthy
        # standalone G, reproducible per shape and seed-independent;
        # materializing G first gives 2.5e-7. (Returning G from the jit
        # also fixes it -- same mechanism.)
        G = jax.lax.optimization_barrier(
            jax.random.normal(key, (p, k), dtype=U.dtype)
        )
        UG = jnp.matmul(U, G, precision=_HI)
        return G - UG if lo else G + UG

    return f


@functools.lru_cache(maxsize=None)
def _project_fn(p: int, k: int):
    """(S Q, Q^T (S Q)) for a p x k orthonormal block."""

    @jax.jit
    def f(S, Q):
        SQ = jnp.matmul(S, Q, precision=_HI)
        Ssub = jnp.matmul(Q.T, SQ, precision=_HI)
        return 0.5 * (Ssub + Ssub.T), SQ

    return f


@functools.lru_cache(maxsize=None)
def _offdiag_fn(p: int, k: int):
    @jax.jit
    def f(Q2, SQ1):
        return jnp.linalg.norm(jnp.matmul(Q2.T, SQ1, precision=_HI))

    return f


def _bucket(p: int, base_size: int) -> int:
    b = 256
    while b < p:
        b *= 2
    return min(b, base_size)


def _eigh_base(S, p: int, base_size: int):
    """Direct eigh of a <= base_size block, on the HOST in float64.

    Why host LAPACK and not ``jnp.linalg.eigh``: the top of a FEM pencil's
    spectrum is a wall of near-degenerate clusters (near-identical local
    element configurations), and the device eigh's data-dependent inner
    iteration spins on exactly those blocks until the relay's execution
    watchdog kills the TPU worker -- observed reproducibly at the r5 wall
    run (the depth-3 p=1402 high-spectrum leaf died three runs in a row,
    with both degenerate and spread bucket padding, while its low-spectrum
    siblings sailed through). LAPACK's tridiagonal D&C handles clusters in
    guaranteed O(p^3); at p <= 2048 that is 2-4 s on this host, ~1 min
    summed over all leaves -- noise against the device-side recursion, and
    it upgrades the leaf eigenbases to float64 accuracy for free. The
    device keeps 100% of the O(n^3) splitting work (signs, range finders,
    congruences)."""
    Sh = np.asarray(S, np.float64)
    Sh = 0.5 * (Sh + Sh.T)
    lam, V = np.linalg.eigh(Sh)
    dtype = S.dtype
    return to_device(lam, dtype), to_device(V, dtype)


@functools.lru_cache(maxsize=None)
def _combine_fn(p: int, k: int):
    """V = [Q1 W1, Q2 W2]: the unwind rotation, two rectangular matmuls."""

    @jax.jit
    def f(Q1, Q2, W1, W2):
        return jnp.concatenate(
            [
                jnp.matmul(Q1, W1, precision=_HI),
                jnp.matmul(Q2, W2, precision=_HI),
            ],
            axis=1,
        )

    return f


@functools.lru_cache(maxsize=None)
def _concat_fn(k1: int, k2: int):
    # eager ops do not lower on the axon TPU backend; even 1-D concats of
    # device arrays must run as compiled programs
    @jax.jit
    def f(a, b):
        return jnp.concatenate([a, b])

    return f


# ------------------------------------------------------------- the solver


def sdc_eigh(
    S,
    *,
    base_size: int = 2048,
    seed: int = 0,
    min_frac: float = 0.08,
    max_bisect: int = 8,
    _depth: int = 0,
    _stats: Optional[dict] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition ``(lam ascending, V)`` of a symmetric device
    matrix ``S`` by host-driven spectral divide-and-conquer; every device
    program is a small static-shape jit unit (module docstring).

    ``base_size``: blocks at or below this size go to ``jnp.linalg.eigh``
    directly (keep <= ~2e3: both the eigh compile and its footprint are
    known-good there). ``min_frac``: minimum acceptable split balance;
    degenerate shifts are re-chosen by inertia-count bisection (each probe
    costs one sign-function evaluation)."""
    import time as _time

    p = int(S.shape[0])
    stats = _stats if _stats is not None else {
        "splits": 0, "bisect_probes": 0, "max_off": 0.0, "max_defect": 0.0,
        "ns_iters": [], "phase_s": {"sign": 0.0, "split": 0.0, "leaf": 0.0, "combine": 0.0},
    }
    if _stats is None:
        sdc_eigh.last_stats = stats
    verbose = bool(int(__import__("os").environ.get("SDC_VERBOSE", "0")))
    if p <= base_size:
        if verbose:
            print(f"[sdc] base eigh p={p} (bucket {_bucket(p, base_size)})", flush=True)
        _t0 = _time.time()
        out = _eigh_base(S, p, base_size)
        stats["phase_s"]["leaf"] += _time.time() - _t0
        return out

    med, rbound, froS = (float(x) for x in _fence(_diag_stats_fn(p)(S)))
    sign = _sign_ns_fn(p)

    def _find_sign(sigma0):
        """(U, k, sigma) at a balance-acceptable shift, by inertia-count
        bisection from ``sigma0``."""
        blo, bhi = med - rbound, med + rbound
        sigma = sigma0
        U = k = None
        for probe in range(max_bisect + 1):
            if verbose:
                print(f"[sdc] sign p={p} depth={_depth} probe={probe} "
                      f"sigma={sigma:.4g}", flush=True)
            _t0 = _time.time()
            U_c, trU, defect, ns_it = _fence(sign(S, sigma))
            stats["phase_s"]["sign"] += _time.time() - _t0
            if verbose:
                print(f"[sdc]   -> defect={float(defect):.2e} "
                      f"ns_iters={int(ns_it)} trU={float(trU):.2f}", flush=True)
            if not np.isfinite(float(trU)) or not float(defect) < 1e-2:
                raise RuntimeError(
                    f"sdc_eigh: sign iteration failed at block p={p} "
                    f"(sigma={sigma:.6g}, defect={float(defect):.3e}, "
                    f"iters={int(ns_it)}) -- an eigenvalue may sit at machine "
                    f"distance from sigma; this guard stops NaNs propagating "
                    f"silently into the basis"
                )
            # Parity-corrected count: tr U = (#above - #below) has the
            # parity of p exactly; rounding the f32 trace to the nearest
            # correct-parity integer removes the +-0.5 ambiguity of
            # half-converged near-sigma eigenvalues.
            t_int = int(round(float(trU)))
            if (p - t_int) % 2:
                t_int += 1 if float(trU) > t_int else -1
            kk = max(0, min(p, (p - t_int) // 2))
            stats["bisect_probes"] += 1 if probe else 0
            stats["max_defect"] = max(stats["max_defect"], float(defect))
            stats["ns_iters"].append(int(ns_it))
            if kk < p * min_frac:  # almost everything above sigma: raise it
                if 0 < kk < p:
                    U, k, sig = U_c, kk, sigma  # best non-trivial so far
                blo = sigma
                sigma = 0.5 * (sigma + bhi)
            elif kk > p * (1 - min_frac):
                if 0 < kk < p:
                    U, k, sig = U_c, kk, sigma
                bhi = sigma
                sigma = 0.5 * (blo + sigma)
            else:
                return U_c, kk, sigma
        if U is None:
            raise RuntimeError(
                f"sdc_eigh: could not find a splitting shift for block of "
                f"size {p} (spectrum may be a single numerical cluster); "
                f"lower base_size or use a direct eigh"
            )
        return U, k, sig

    # ---- verified split. Two observed float32 failure modes, both caught
    # by the off-diagonal norm of the decoupled congruence (they were
    # SILENT in the first wall run -- a 0.62-relative off-diagonal produced
    # a garbage basis with every per-stage diagnostic green):
    #  (a) the f32 trace miscounts k by one: the rank-mismatched range
    #      finder injects a junk direction with O(lambda_max) coupling
    #      -- retried with k +- 1;
    #  (b) an eigenvalue sits close enough to sigma that the sign iteration
    #      leaves it at an intermediate value: its eigenvector lands in
    #      BOTH subspaces (seed- and k-independent!) -- retried by
    #      JITTERING sigma (spectral-scale nudge) and redoing the sign.
    sd = int(seed + 7919 * _depth + p)
    tol_rel, best = 3e-3, None
    sigma_sel = None
    for jitter in range(4):
        U, k, sigma_sel = _find_sign(med + jitter * 0.0037 * rbound)
        for attempt, dk in enumerate((0, 1, -1)):
            kk = k + dk
            if not 0 < kk < p:
                continue
            _t0 = _time.time()
            Y1 = _fence(_range_fn(p, kk, True)(S, U, np.int32(sd + 2 * attempt)))
            Y2 = _fence(_range_fn(p, p - kk, False)(S, U, np.int32(sd + 2 * attempt + 1)))
            Q1 = cholqr2(Y1, block=_BLOCK)
            Q2 = cholqr2(Y2, block=_BLOCK)
            del Y1, Y2
            S1, SQ1 = _fence(_project_fn(p, kk)(S, Q1))
            S2, _ = _fence(_project_fn(p, p - kk)(S, Q2))
            off_rel = float(_fence(_offdiag_fn(p, kk)(Q2, SQ1))) / max(froS, 1e-30)
            stats["phase_s"]["split"] += _time.time() - _t0
            del SQ1
            if verbose:
                print(f"[sdc] split p={p} depth={_depth} k={kk} (dk={dk}, "
                      f"jitter={jitter}) off_rel={off_rel:.2e}", flush=True)
            dump = __import__("os").environ.get("SDC_DUMP_BAD", "")
            if dump and off_rel > 0.1:
                path = f"{dump}/sdc_bad_block_p{p}_d{_depth}.npy"
                if not __import__("os").path.exists(path):
                    np.save(path, np.asarray(S, np.float32))
                    print(f"[sdc] dumped failing block to {path}", flush=True)
            if best is None or off_rel < best[0]:
                best = (off_rel, kk, Q1, Q2, S1, S2)
            if off_rel <= tol_rel:
                break
            stats["split_retries"] = stats.get("split_retries", 0) + 1
            if attempt == 0 and dk == 0 and off_rel > 30 * tol_rel:
                # k-independent failure signature (mode b): skip the dk
                # attempts, go straight to the sigma jitter.
                break
        del U
        if best[0] <= tol_rel:
            break
    off_rel, k, Q1, Q2, S1, S2 = best
    if off_rel > 30 * tol_rel:
        raise RuntimeError(
            f"sdc_eigh: no acceptable split at block p={p} (best relative "
            f"off-diagonal {off_rel:.3e} over {jitter + 1} shifts around "
            f"sigma={sigma_sel:.6g}); the spectrum may be pathologically "
            f"clustered"
        )
    stats["splits"] += 1
    stats["max_off"] = max(stats["max_off"], off_rel)
    del S  # free the parent block before recursing (HBM headroom)
    lam1, W1 = sdc_eigh(
        S1, base_size=base_size, seed=seed, min_frac=min_frac,
        max_bisect=max_bisect, _depth=_depth + 1, _stats=stats,
    )
    del S1
    lam2, W2 = sdc_eigh(
        S2, base_size=base_size, seed=seed, min_frac=min_frac,
        max_bisect=max_bisect, _depth=_depth + 1, _stats=stats,
    )
    del S2
    _t0 = _time.time()
    V = _fence(_combine_fn(p, k)(Q1, Q2, W1, W2))
    lam = _fence(_concat_fn(k, p - k)(lam1, lam2))
    stats["phase_s"]["combine"] += _time.time() - _t0  # below-sigma block first: ascending
    return lam, V


@functools.lru_cache(maxsize=None)
def _sym_fn(n: int):
    @jax.jit
    def f(S):
        return 0.5 * (S + S.T)

    return f


@functools.lru_cache(maxsize=None)
def _tr_fn(n: int):
    @jax.jit
    def f(X):
        return X.T

    return f


def pencil_eig_sdc(
    M: np.ndarray, K: np.ndarray, dtype, *, base_size: int = 2048, seed: int = 0
) -> Tuple[np.ndarray, jnp.ndarray]:
    """(lam, V) of ``K V = M V diag(lam)``, ``V^T M V = I`` -- the pencil
    form of :func:`sdc_eigh` (blocked Cholesky congruence on device, divide
    and conquer on the standard form, blocked triangular back-substitution;
    every step large-triangle-safe, see ops/blocked.py). ``lam`` returns as
    float64 numpy for the host capacity math (matching
    eigbasis.pencil_eig_*); ``V`` stays a device array."""
    import time as _time

    n = int(M.shape[0])
    _t0 = _time.time()
    Md = to_device(np.asarray(M, np.float64), dtype)
    Kd = to_device(np.asarray(K, np.float64), dtype)
    L = blocked_cholesky(Md, block=_BLOCK)
    del Md
    X = tri_solve_lower(L, Kd, block=_BLOCK)  # L^{-1} K
    del Kd
    S = _fence(_sym_fn(n)(_tr_fn(n)(tri_solve_lower(L, _tr_fn(n)(X), block=_BLOCK))))
    del X
    t_congruence = _time.time() - _t0
    lam, Q = sdc_eigh(S, base_size=base_size, seed=seed)
    del S
    _t0 = _time.time()
    V = _fence(tri_solve_lower(L, Q, block=_BLOCK, transpose=True))
    ph = sdc_eigh.last_stats.setdefault("phase_s", {})
    ph["congruence"] = round(t_congruence, 1)
    ph["back_transform"] = round(_time.time() - _t0, 1)
    for k_ in ("sign", "split", "leaf", "combine"):
        if k_ in ph:
            ph[k_] = round(ph[k_], 1)
    return np.asarray(lam, np.float64), V
