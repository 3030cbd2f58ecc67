"""Preconditioned MINRES -- jittable, for symmetric (possibly indefinite)
systems with an SPD preconditioner.

The Krylov method the ParaDiag papers favor for all-at-once wave systems
(see PAPERS.md: block alpha-circulant / sine-transform preconditioned MINRES)
and the natural solver for the symmetric saddle KKT system of the
autodiff-Lagrangian path (:mod:`models.wave_lagrangian`). Standard Lanczos +
Givens formulation; states may have arbitrary shape (cf. :mod:`krylov.gmres`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class MinresResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray
    residual_norm: jnp.ndarray
    residual_history: jnp.ndarray


def minres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    *,
    M: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    x0: Optional[jnp.ndarray] = None,
    rtol: float = 1e-5,
    maxiter: int = 1000,
) -> MinresResult:
    """Solve symmetric ``A x = b``; ``M`` must be symmetric positive definite
    (preconditioned residual norms are measured in the M-inner product)."""
    if M is None:
        M = lambda v: v

    def dot(a, c):
        return jnp.sum(a * c)

    if x0 is None:
        x0 = jnp.zeros_like(b)

    r1 = b - matvec(x0)
    y = M(r1)
    beta1 = jnp.sqrt(jnp.maximum(dot(r1, y), 0.0))
    tol = rtol * beta1

    hist0 = jnp.full((maxiter + 1,), jnp.nan, b.dtype).at[0].set(beta1)

    # Lanczos + QR state (standard MINRES recurrences, Paige & Saunders).
    state0 = dict(
        x=x0,
        r1=r1,
        r2=r1,
        y=y,
        beta=beta1,
        beta_prev=jnp.zeros_like(beta1),
        dbar=jnp.zeros_like(beta1),
        epsln=jnp.zeros_like(beta1),
        phibar=beta1,
        cs=-jnp.ones_like(beta1),
        sn=jnp.zeros_like(beta1),
        w=jnp.zeros_like(b),
        w2=jnp.zeros_like(b),
        it=jnp.array(0),
        hist=hist0,
    )

    def cond(s):
        return (s["phibar"] > tol) & (s["it"] < maxiter)

    def body(s):
        v = s["y"] / jnp.where(s["beta"] > 0, s["beta"], 1.0)
        yv = matvec(v)
        yv = jnp.where(s["it"] >= 1, yv - (s["beta"] / jnp.where(s["beta_prev"] > 0, s["beta_prev"], 1.0)) * s["r1"], yv)
        alfa = dot(v, yv)
        yv = yv - (alfa / jnp.where(s["beta"] > 0, s["beta"], 1.0)) * s["r2"]
        r1n, r2n = s["r2"], yv
        yn = M(yv)
        beta_new = jnp.sqrt(jnp.maximum(dot(yv, yn), 0.0))

        # Previous rotation applied to the new column of T.
        oldeps = s["epsln"]
        delta = s["cs"] * s["dbar"] + s["sn"] * alfa
        gbar = s["sn"] * s["dbar"] - s["cs"] * alfa
        epsln_new = s["sn"] * beta_new
        dbar_new = -s["cs"] * beta_new

        gamma = jnp.sqrt(gbar * gbar + beta_new * beta_new)
        gamma = jnp.where(gamma > 0, gamma, 1e-300)
        cs_new = gbar / gamma
        sn_new = beta_new / gamma
        phi = s["cs"] * 0.0 + cs_new * s["phibar"]
        phibar_new = sn_new * s["phibar"]

        w1 = s["w2"]
        w2n = s["w"]
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        xn = s["x"] + phi * wn

        it = s["it"] + 1
        hist = s["hist"].at[it].set(phibar_new)
        return dict(
            x=xn,
            r1=r1n,
            r2=r2n,
            y=yn,
            beta=beta_new,
            beta_prev=s["beta"],
            dbar=dbar_new,
            epsln=epsln_new,
            phibar=phibar_new,
            cs=cs_new,
            sn=sn_new,
            w=wn,
            w2=w2n,
            it=it,
            hist=hist,
        )

    s = lax.while_loop(cond, body, state0)
    return MinresResult(
        x=s["x"],
        iterations=s["it"],
        converged=s["phibar"] <= tol,
        residual_norm=s["phibar"],
        residual_history=s["hist"],
    )
