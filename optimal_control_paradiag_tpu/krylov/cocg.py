"""Batched preconditioned COCG (Conjugate Orthogonal CG).

The Krylov method for complex *symmetric* systems (A^T = A, not Hermitian):
standard CG recurrences with the unconjugated bilinear form <a, b> = sum(a*b).
Used for the ParaDiag inner solves whose operators are complex-shifted real
symmetric FEM matrices (SURVEY.md section 7.1 item 2): batching is expressed
by reducing the bilinear form only over ``dot_axes`` -- every other axis is an
independent system with its own alpha/beta scalars.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from jax import lax


def cocg(
    A: Callable,
    b: jnp.ndarray,
    *,
    M: Optional[Callable] = None,
    dot_axes: Sequence[int],
    tol: float = 1e-10,
    maxiter: int = 50,
):
    """Solve A x = b for complex-symmetric A, batched outside ``dot_axes``.

    ``M`` is an (also complex-symmetric) preconditioner approximating A^{-1}.
    Returns (x, iterations). Stops when max |r| <= tol * max |b| across the
    whole batch (all systems share the trip count -- they are lock-stepped on
    the same device anyway).
    """
    if M is None:
        M = lambda v: v
    axes = tuple(dot_axes)

    def dot_T(a, c):
        return jnp.sum(a * c, axis=axes, keepdims=True)

    bnorm = jnp.maximum(jnp.max(jnp.abs(b)), 1e-300)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = M(r0)
    p0 = z0
    rho0 = dot_T(r0, z0)

    def cond(state):
        x, r, p, rho, it = state
        return (it < maxiter) & (jnp.max(jnp.abs(r)) > tol * bnorm)

    def body(state):
        x, r, p, rho, it = state
        q = A(p)
        denom = dot_T(p, q)
        alpha = rho / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
        x = x + alpha * p
        r = r - alpha * q
        z = M(r)
        rho_new = dot_T(r, z)
        beta = rho_new / jnp.where(jnp.abs(rho) > 0, rho, 1.0)
        p = z + beta * p
        return (x, r, p, rho_new, it + 1)

    x, r, p, rho, it = lax.while_loop(cond, body, (x0, r0, p0, rho0, 0))
    return x, it
