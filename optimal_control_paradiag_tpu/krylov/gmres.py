"""Restarted, left-preconditioned GMRES -- jittable, real or complex.

Replaces PETSc's KSP GMRES (reference solver parameters at
``Control_Wave_PC.py:346-359``: gmres, restart 300, max_it 1000, monitor).
PETSc defaults are reproduced so iteration counts are comparable: LEFT
preconditioning, convergence on the preconditioned residual norm relative to
the preconditioned initial residual, rtol 1e-5.

TPU-first design choices:
- Arnoldi orthogonalization is classical Gram-Schmidt with one
  re-orthogonalization (CGS2): two ``(restart+1, m) @ (m,)`` matvecs per step
  -- MXU-shaped matmuls instead of the sequential modified-Gram-Schmidt
  dot-product chain, with equal-or-better numerical robustness.
- The whole solve is a ``lax.while_loop`` over Arnoldi steps (early exit on
  convergence) nested in a while-loop over restart cycles -- one compiled
  program, no host round-trips per iteration.
- Residual history is recorded into a fixed ``(maxiter+1,)`` buffer, the
  structured replacement for ``ksp_monitor`` (ref ``:352-355``).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

# Krylov-basis memory budget (bytes) for the auto restart clamp. The padded
# basis V is (restart+1, *state) -- at the f32 headline size (2, 1024, 2047)
# the CLI-default restart=300 would allocate ~4.8 GB, an accidental OOM trap
# on a 16 GB chip once the PC and transforms claim their share (VERDICT r3
# item 6). Override with PARADIAG_GMRES_BASIS_BUDGET.
_BASIS_BUDGET_BYTES = int(
    float(os.environ.get("PARADIAG_GMRES_BASIS_BUDGET", 4e9))
)


def clamp_restart(restart: int, shape, dtype, maxiter: int) -> int:
    """Largest restart (<= the requested one, >= 4) whose padded Krylov basis
    ``(restart+1, *shape)`` fits the budget; warns when it clamps."""
    import numpy as np

    restart = min(restart, maxiter)
    state_bytes = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
    fit = max(4, _BASIS_BUDGET_BYTES // max(state_bytes, 1) - 1)
    if restart > fit:
        warnings.warn(
            f"GMRES restart {restart} needs a {(restart + 1) * state_bytes / 1e9:.1f} GB "
            f"Krylov basis for state shape {tuple(shape)}; clamping to {fit} "
            f"(budget {_BASIS_BUDGET_BYTES / 1e9:.1f} GB, override with "
            "PARADIAG_GMRES_BASIS_BUDGET)",
            stacklevel=3,
        )
        return int(fit)
    return restart


class GmresResult(NamedTuple):
    """Solution + convergence record (the ``ksp_monitor``/``converged_reason``
    analogue, ref ``Control_Wave_PC.py:352-355``)."""

    x: jnp.ndarray
    iterations: jnp.ndarray  # total Arnoldi steps taken
    converged: jnp.ndarray  # bool
    residual_norm: jnp.ndarray  # final preconditioned residual norm
    residual_history: jnp.ndarray  # (maxiter+1,), NaN beyond `iterations`


def _givens(a, b):
    """Complex-safe Givens rotation: returns (c real, s, r) with
    ``c*a + s*b = r`` and ``-conj(s)*a + c*b = 0``."""
    abs_a = jnp.abs(a)
    abs_b = jnp.abs(b)
    rho = jnp.sqrt(abs_a * abs_a + abs_b * abs_b)
    safe_rho = jnp.where(rho > 0, rho, 1.0)
    # a == 0 -> swap rotation (c=0, s=1).
    phase_a = jnp.where(abs_a > 0, a / jnp.where(abs_a > 0, abs_a, 1.0), 1.0)
    c = jnp.where(rho > 0, abs_a / safe_rho, 1.0)
    s = jnp.where(rho > 0, phase_a * jnp.conj(b) / safe_rho, jnp.zeros_like(a))
    r = phase_a * rho
    return c.real, s, r


def gmres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    *,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    x0: Optional[jnp.ndarray] = None,
    restart: int = 30,
    rtol: float = 1e-5,
    atol: float = 0.0,
    maxiter: int = 1000,
    side: str = "left",
) -> GmresResult:
    """Solve ``A x = b`` with preconditioner ``M ~= A^{-1}``.

    ``matvec`` and ``M`` map states to states of the same (arbitrary) shape
    -- e.g. flat vectors or ``(2, N_t, n)`` all-at-once states. Keeping the
    natural axis structure lets sharding annotations ride through the whole
    Krylov loop (the time/space axes stay visible to pjit). Dtype may be real
    or complex. Everything is traceable; wrap in ``jax.jit`` for repeated use.

    ``side``: 'left' (PETSc default; convergence on the preconditioned
    residual norm -- matches the reference's monitored counts) or 'right'
    (convergence on the TRUE residual norm; the robust choice when P is
    ill-conditioned, e.g. large-N_t ParaDiag in float32, where the
    preconditioned norm's ~1/|Lambda_1| amplification wrecks low-precision
    Arnoldi).
    """
    if side not in ("left", "right"):
        raise ValueError(f"unknown side {side!r}")
    if M is None:
        M = lambda v: v
    shape = b.shape
    sdims = len(shape)
    saxes = tuple(range(sdims))
    dtype = b.dtype
    rdtype = jnp.real(jnp.zeros((), dtype)).dtype
    if x0 is None:
        x0 = jnp.zeros_like(b)

    restart = clamp_restart(restart, shape, dtype, maxiter)
    _BLK = min(16, restart + 1)
    _NBLK = -(-(restart + 1) // _BLK)

    def pres(x):
        r = b - matvec(x)
        return M(r) if side == "left" else r

    r0 = pres(x0)
    beta0 = jnp.linalg.norm(r0.ravel())
    tol = jnp.maximum(rtol * beta0, atol).astype(rdtype)

    hist0 = jnp.full((maxiter + 1,), jnp.nan, rdtype).at[0].set(beta0)

    def arnoldi_cycle(x, r, beta, base_it, hist):
        """One restart cycle starting from residual r (norm beta)."""
        # Padded to a whole number of ortho blocks so dynamic_slice never
        # clamps into neighboring rows; rows beyond restart stay zero.
        V0 = jnp.zeros((_NBLK * _BLK,) + shape, dtype)
        V0 = V0.at[0].set(r / jnp.where(beta > 0, beta, 1.0))
        R0 = jnp.zeros((restart, restart), dtype)
        cs0 = jnp.zeros((restart,), rdtype)
        sn0 = jnp.zeros((restart,), dtype)
        g0 = jnp.zeros((restart + 1,), dtype).at[0].set(beta.astype(dtype))

        def cond(state):
            V, R, cs, sn, g, k, res, hist = state
            return (k < restart) & (res > tol) & (base_it + k < maxiter)

        def body(state):
            V, R, cs, sn, g, k, res, hist = state
            w = M(matvec(V[k])) if side == "left" else matvec(M(V[k]))
            # CGS2 orthogonalization against V[0..k]. Blocked over the basis
            # with cond-skipped inactive blocks: only ~k rows are read, not
            # the full restart width -- total ortho traffic O(sum k) instead
            # of O(restart * iters). Rows beyond k are zero, so no masking of
            # the coefficients is needed.
            hi = jax.lax.Precision.HIGHEST
            BLK = _BLK
            nblk = _NBLK

            def proj(ww):
                def blk_body(i, h):
                    def compute(h):
                        Vb = lax.dynamic_slice_in_dim(V, i * BLK, BLK, 0)
                        hb = jnp.tensordot(
                            Vb.conj(), ww,
                            axes=(tuple(a + 1 for a in saxes), saxes),
                            precision=hi,
                        )
                        return lax.dynamic_update_slice_in_dim(h, hb, i * BLK, 0)

                    return lax.cond(i * BLK <= k, compute, lambda h_: h_, h)

                return lax.fori_loop(0, nblk, blk_body, jnp.zeros((nblk * BLK,), dtype))

            def expand(coef):
                def blk_body(i, acc):
                    def compute(acc):
                        Vb = lax.dynamic_slice_in_dim(V, i * BLK, BLK, 0)
                        cb = lax.dynamic_slice_in_dim(coef, i * BLK, BLK, 0)
                        return acc + jnp.tensordot(cb, Vb, axes=([0], [0]), precision=hi)

                    return lax.cond(i * BLK <= k, compute, lambda a: a, acc)

                return lax.fori_loop(0, nblk, blk_body, jnp.zeros_like(w))

            h1 = proj(w)
            w = w - expand(h1)
            h2 = proj(w)
            w = w - expand(h2)
            h = (h1 + h2)[: restart + 1]
            hk1 = jnp.linalg.norm(w.ravel())
            V = V.at[k + 1].set(w / jnp.where(hk1 > 0, hk1, 1.0))

            # Apply stored rotations 0..k-1 to the new column.
            def rot_body(j, hcol):
                active = j < k
                a, bb = hcol[j], hcol[j + 1]
                na = cs[j] * a + sn[j] * bb
                nb = -jnp.conj(sn[j]) * a + cs[j] * bb
                hcol = hcol.at[j].set(jnp.where(active, na, a))
                hcol = hcol.at[j + 1].set(jnp.where(active, nb, bb))
                return hcol

            hcol = h.at[k + 1].set(hk1.astype(dtype))
            hcol = lax.fori_loop(0, restart, rot_body, hcol)

            # New rotation eliminating the subdiagonal.
            ck, sk, rk = _givens(hcol[k], hcol[k + 1])
            cs = cs.at[k].set(ck)
            sn = sn.at[k].set(sk)
            hcol = hcol.at[k].set(rk).at[k + 1].set(jnp.zeros((), dtype))
            R = R.at[:, k].set(hcol[:restart])

            gk = g[k]
            g = g.at[k].set(ck * gk)
            g = g.at[k + 1].set(-jnp.conj(sk) * gk)
            res = jnp.abs(g[k + 1])
            hist = hist.at[base_it + k + 1].set(res.astype(rdtype))
            return (V, R, cs, sn, g, k + 1, res, hist)

        V, R, cs, sn, g, k, res, hist = lax.while_loop(
            cond, body, (V0, R0, cs0, sn0, g0, 0, beta.astype(rdtype), hist)
        )

        # Triangular solve on the active k x k block (identity-pad the rest).
        col = jnp.arange(restart)
        active = col < k
        Rpad = jnp.where(active[None, :] & active[:, None], R, 0.0)
        Rpad = Rpad + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
        gpad = jnp.where(active, g[:restart], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rpad, gpad, lower=False)
        dx = jnp.tensordot(
            y, V[:restart], axes=([0], [0]), precision=jax.lax.Precision.HIGHEST
        )
        x = x + (dx if side == "left" else M(dx))
        return x, base_it + k, res, hist

    def outer_cond(state):
        x, it, res, hist = state
        return (res > tol) & (it < maxiter)

    def outer_body(state):
        x, it, res, hist = state
        r = pres(x)
        beta = jnp.linalg.norm(r.ravel())
        return arnoldi_cycle(x, r, beta, it, hist)

    x, it, res, hist = lax.while_loop(
        outer_cond, outer_body, (x0, jnp.array(0), beta0.astype(rdtype), hist0)
    )
    return GmresResult(
        x=x,
        iterations=it,
        converged=res <= tol,
        residual_norm=res,
        residual_history=hist,
    )
