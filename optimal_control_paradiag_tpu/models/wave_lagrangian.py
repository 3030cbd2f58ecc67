"""Optimality system via autodiff of the discrete Lagrangian.

The TPU-native equivalent of the reference's prototype derivation path
(``Func_Version.py:7-167`` and the flat script ``mumps_1D.py``): build the
discrete Lagrangian

  S(u, p) = sum_i [ dt/2 ||u_i - g_i||_M^2 + dt/(2 gamma) ||p_i||_M^2
            + dt p_i^T M ((u_i - 2u_{i-1} + u_{i-2})/dt^2 - f_i)
            - dt/gamma ||p_i||_M^2 + dt p_i^T K (u_i + u_{i-2})/2 ]

(``Func_Version.py:86-95``, with the control eliminated as ``u~ = p/gamma``)
and obtain the KKT system as its gradient -- the reference calls
``fd.derivative(S, U)`` (``Func_Version.py:102``); here ``jax.grad`` does the
same, and the (symmetric) KKT operator is applied matrix-free as a
Hessian-vector product (``jax.jvp`` of ``jax.grad``) fed to CG/GMRES -- no
assembly at all. This model doubles as a derivation oracle: an independently
derived discretization of the same control problem, converging to the same
analytic solution as the production all-at-once path.

Prototype quirks reproduced (documented, not hidden):
- ``N_t - 1`` unknown slices (vs. N_t in the production path);
- ghost start ``u_{-1} = u0 + dt*u1`` (``Func_Version.py:65,69``; note
  ``mumps_1D.py:56,60`` used the opposite sign -- we follow Func_Version);
- 1D data indexed at ``t = (i-1)*dt`` (``Func_Version.py:49-54``), 2D data at
  ``t = i*dt`` (``Func_Version.py:34-38``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.config import ProblemConfig
from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.krylov.gmres import GmresResult, gmres
from optimal_control_paradiag_tpu.models.analytic import manufactured
from optimal_control_paradiag_tpu.ops.allatonce import tshift
from optimal_control_paradiag_tpu.utils.constants import to_device


class LagrangianSolution(NamedTuple):
    u: jnp.ndarray  # (N_t-1, n)
    p: jnp.ndarray  # (N_t-1, n)
    result: Optional[GmresResult]


class LagrangianWaveProblem:
    """Direct (unpreconditioned / dense) solver for the KKT system derived by
    autodiff from the discrete Lagrangian."""

    def __init__(self, config: ProblemConfig):
        if config.scaled:
            raise ValueError(
                "the Lagrangian prototype path is unscaled (Func_Version.py "
                "has no sqrt(gamma) mode); pass scaled=False"
            )
        self.config = config
        self.space = make_space(config.dim, config.N_x, mass=config.mass, dtype=config.dtype)
        self.analytic = manufactured(config.dim, config.T, config.gamma)
        self.N = config.N_t - 1  # unknown slices (Func_Version.py:63 loops N-1)
        self._build_data()

    def _build_data(self):
        cfg = self.config
        sp = self.space
        dt = cfg.dt
        # 1D: data at t=(i-1)dt (Func_Version.py:49-54); 2D: at t=i*dt (:34-38).
        off = -1 if cfg.dim == 1 else 0
        f = np.stack(
            [np.asarray(sp.interpolate(lambda *x: self.analytic.f(*x, (i + off) * dt))) for i in range(self.N)]
        )
        g = np.stack(
            [np.asarray(sp.interpolate(lambda *x: self.analytic.g(*x, (i + off) * dt))) for i in range(self.N)]
        )
        self.f = to_device(f, cfg.dtype)
        self.g = to_device(g, cfg.dtype)
        self.u0 = to_device(np.asarray(sp.interpolate(self.analytic.u0)), cfg.dtype)
        self.u1 = to_device(np.asarray(sp.interpolate(self.analytic.u1)), cfg.dtype)

    # ------------------------------------------------------------ Lagrangian

    def lagrangian(self, u: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
        """The discrete Lagrangian S(u, p) (Func_Version.py:86-95)."""
        cfg = self.config
        sp = self.space
        dt = cfg.dt
        gamma = cfg.gamma
        ghost = self.u0 + dt * self.u1  # u_{-1} (Func_Version.py:65,69)

        # u_{i-1}, u_{i-2} with the prototype's ghost substitutions.
        um1 = tshift(u, 1).at[0].set(ghost)
        um2 = tshift(u, 2).at[0].set(self.u0).at[1].set(ghost)

        d2u = (u - 2.0 * um1 + um2) / (dt * dt)
        ubar = 0.5 * (u + um2)

        def mdot(a, b):
            return jnp.sum(a * sp.apply_mass(b))

        def kdot(a, b):
            return jnp.sum(a * sp.apply_stiffness(b))

        S = 0.5 * dt * mdot(u - self.g, u - self.g)
        S = S + 0.5 * dt / gamma * mdot(p, p)
        S = S + dt * (mdot(p, d2u) - mdot(p, self.f) - mdot(p, p) / gamma)
        S = S + dt * kdot(p, ubar)
        return S

    def kkt_residual(self, u: jnp.ndarray, p: jnp.ndarray):
        """grad S -- the optimality system (the reference's
        ``fd.derivative(S, U)``, Func_Version.py:102)."""
        return jax.grad(lambda up: self.lagrangian(up[0], up[1]))(jnp.stack([u, p]))

    # ----------------------------------------------------------------- solve

    def solve(self, method: str = "direct", rtol: float = 1e-10, maxiter: int = 2000) -> LagrangianSolution:
        """Newton-step solve: S is quadratic, so one linear solve of
        ``H x = -grad S(0)`` with H applied as a Hessian-vector product.

        'direct' (default) materializes H column-by-column through HVPs and
        LU-solves -- the analogue of the prototype's MUMPS path
        (``Func_Version.py:105``; the unpreconditioned saddle KKT system is
        too ill-conditioned for plain Krylov). 'gmres' is the matrix-free
        route for experimentation."""
        n = self.space.n
        zero = jnp.zeros((2, self.N, n), self.config.dtype)
        grad_fn = lambda x: self.kkt_residual(x[0], x[1])
        b = -grad_fn(zero)

        def hvp(v):
            return jax.jvp(grad_fn, (zero,), (v,))[1]

        if method == "direct":
            m = 2 * self.N * n
            eye = jnp.eye(m, dtype=self.config.dtype)
            cols = jax.lax.map(
                lambda e: hvp(e.reshape(2, self.N, n)).reshape(-1), eye, batch_size=256
            )
            x = jnp.linalg.solve(cols.T, b.reshape(-1)).reshape(2, self.N, n)
            res_norm = jnp.linalg.norm(hvp(x).reshape(-1) - b.reshape(-1))
            result = GmresResult(
                x=x,
                iterations=jnp.array(0),
                converged=res_norm < 1e-6 * jnp.linalg.norm(b.reshape(-1)),
                residual_norm=res_norm,
                residual_history=jnp.full((1,), jnp.nan),
            )
            return LagrangianSolution(u=x[0], p=x[1], result=result)

        @jax.jit
        def run(bb):
            return gmres(hvp, bb, restart=200, rtol=rtol, maxiter=maxiter)

        res = run(b)
        return LagrangianSolution(u=res.x[0], p=res.x[1], result=res)

    def error_vs_analytic(self, sol: LagrangianSolution) -> float:
        """Max-over-time nodal-l2 u error at the prototype's own staggering:
        the i=0 row centers the PDE at t_1 with u_{-1}, u_{-2} ghosts, so
        ``u[i] ~ u(t_{i+1})``."""
        cfg = self.config
        dt = cfg.dt
        errs = []
        u = np.asarray(sol.u, dtype=np.float64)
        for i in range(self.N):
            ua = np.asarray(
                self.space.interpolate(lambda *x: self.analytic.u(*x, (i + 1) * dt)),
                dtype=np.float64,
            )
            errs.append(np.linalg.norm(u[i] - ua))
        return float(np.max(errs))
