"""The all-at-once KKT operator and right-hand side.

Matrix-free, fully vectorized reimplementation of the reference's ``Build_L``
residual form (``Control_Wave_PC.py:86-179``): for time slices ``i = 0..N_t-1``
with mass M and stiffness K,

u-rows (state; time runs forward, ref ``:113-133, 137-139, 157-159, 166-168``):
  i = 0 (Taylor start):  (M + dt^2/2 K) u_0 - (c_up/2) M p_0
  i >= 1:                M (u_i - 2 u_{i-1} + u_{i-2}) + dt^2/2 K (u_i + u_{i-2})
                         - c_up M p_i
p-rows (adjoint; time runs backward, ref ``:120-123, 141-144, 161-164``):
  i <  N_t-1:            c_pu M u_i + M (p_i - 2 p_{i+1} + p_{i+2})
                         + dt^2/2 K (p_i + p_{i+2})
  i = N_t-1 (terminal):  (M + dt^2/2 K) p_{N-1} + (c_pu/2) M u_{N-1}

with out-of-range unknowns zero (the ``Constant(0)`` / data substitutions at
ref ``:93-110`` -- data terms live in the RHS, see :func:`build_rhs`), and
coupling coefficients

  scaled ("pc" mode, ref ``:117,120``):   c_up = c_pu = dt^2 / sqrt(gamma)
  unscaled (ref ``:127,130``):            c_up = dt^2 / gamma,  c_pu = dt^2.

The boundary-row coefficient trick: the i=0 u-row and i=N_t-1 p-row equal the
generic stencil rows (zero-padding supplies the missing terms) except for a
factor 1/2 on the coupling block -- so the whole operator is four stencil
applications plus time-axis shift-adds, no per-row branching. TPU-first: all
dense ``(N_t, n)`` arrays, VPU shift-adds, no data-dependent control flow.

The latent reference quirk at ``:138`` (extra sqrt(gamma) on the final u-row's
stiffness in pc mode) is NOT replicated (invisible at gamma=1; see SURVEY.md
section 0.2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.fem.space import P1Space


def tshift(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[i] = x[i-s] along the leading (time) axis, zero-padded."""
    if s == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1)
    if s > 0:
        return jnp.pad(x[:-s], [(s, 0)] + pad)
    return jnp.pad(x[-s:], [(0, -s)] + pad)


@dataclasses.dataclass(frozen=True)
class AllAtOnceOperator:
    """Matrix-free all-at-once operator A acting on states ``(2, N_t, n)``."""

    space: P1Space
    N_t: int
    dt: float
    gamma: float
    scaled: bool

    @property
    def c_up(self) -> float:
        """u-row coupling coefficient (enters with a minus sign)."""
        d2 = self.dt * self.dt
        return d2 / math.sqrt(self.gamma) if self.scaled else d2 / self.gamma

    @property
    def c_pu(self) -> float:
        """p-row coupling coefficient (enters with a plus sign)."""
        d2 = self.dt * self.dt
        return d2 / math.sqrt(self.gamma) if self.scaled else d2

    @property
    def shape(self):
        return (2, self.N_t, self.space.n)

    @property
    def size(self) -> int:
        return 2 * self.N_t * self.space.n

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x for x of shape ``(2, N_t, n)`` (u = x[0], p = x[1])."""
        sp = self.space
        u, p = x[0], x[1]
        half_d2 = 0.5 * self.dt * self.dt
        mu, mp = sp.apply_mass(u), sp.apply_mass(p)
        ku, kp = sp.apply_stiffness(u), sp.apply_stiffness(p)

        # Coupling-row half-weights: i=0 u-row (ref :117) and i=N_t-1 p-row
        # (ref :143) carry a factor 1/2 on the mass coupling.
        cu = jnp.ones((self.N_t, 1), x.dtype).at[0, 0].set(0.5)
        cp = jnp.ones((self.N_t, 1), x.dtype).at[-1, 0].set(0.5)

        au = (mu - 2.0 * tshift(mu, 1) + tshift(mu, 2)) + half_d2 * (ku + tshift(ku, 2))
        au = au - self.c_up * cu * mp

        ap = (mp - 2.0 * tshift(mp, -1) + tshift(mp, -2)) + half_d2 * (kp + tshift(kp, -2))
        ap = ap + self.c_pu * cp * mu

        return jnp.stack([au, ap])

    def matvec_accurate(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x in cancellation-aware form -- algebraically identical to
        :meth:`matvec`, numerically far more accurate in float32 on smooth
        states (the regime of a converged solution).

        Two rewrites, both exploiting that adjacent-value subtraction is
        (near-)exact in floating point (Sterbenz), with ordering chosen from
        measured float32 noise at N_x=2048, N_t=1024 (noise = f64-oracle
        difference / ||b||):

        1. The time second difference is applied to the RAW state as nested
           first differences, ``(u_i - u_{i-1}) - (u_{i-1} - u_{i-2})``, and
           the mass matrix afterwards (M acts on the space axis, so it
           commutes with the time stencil exactly). The naive grouping
           ``M u_i - 2 M u_{i-1} + M u_{i-2}`` seeds each term with an
           eps*||M u|| rounding that survives the cancellation -- measured
           1.6e-6 naive vs 4.6e-8 nested.
        2. The stiffness term ``K u_i + K u_{i-2}`` applies the NESTED
           first-difference stiffness (:meth:`P1Space.apply_stiffness_nested`)
           to the raw state once and shift-adds the small results. Caution:
           the opposite order, ``K_nested(u_i + u_{i-2})``, is 70x WORSE than
           even the naive form -- the pre-addition seeds uncorrelated
           per-entry rounding that the spatial differences then amplify by
           1/h (measured 1.75e-5, vs 2.4e-7 naive, vs <=2.4e-7 this form).

        This is what makes a float32 physical-space defect correction
        meaningful: the defect ``b - A x`` is measured with noise well below
        the float32 representation floor of x itself (~4e-4 at the size
        above), so one correction step lands the true (float64-oracle)
        residual on that floor -- and below it when the correction is kept
        as a two-float sum (see ``paradiag.spectral.build_polished_solver``).
        Every space provides a nested stiffness (structured grids:
        first-difference stencils; unstructured meshes: the element-gradient
        form, ``GeneralP1Space.apply_stiffness_nested``); spaces without one
        would fall back to plain stencils."""
        sp = self.space
        u, p = x[0], x[1]
        half_d2 = 0.5 * self.dt * self.dt
        du1 = u - tshift(u, 1)
        d2u = du1 - tshift(du1, 1)
        dp1 = p - tshift(p, -1)
        d2p = dp1 - tshift(dp1, -1)
        kn = getattr(sp, "apply_stiffness_nested", sp.apply_stiffness)
        ku, kp = kn(u), kn(p)
        cu = jnp.ones((self.N_t, 1), x.dtype).at[0, 0].set(0.5)
        cp = jnp.ones((self.N_t, 1), x.dtype).at[-1, 0].set(0.5)
        au = sp.apply_mass(d2u) + half_d2 * (ku + tshift(ku, 2))
        au = au - self.c_up * cu * sp.apply_mass(p)
        ap = sp.apply_mass(d2p) + half_d2 * (kp + tshift(kp, -2))
        ap = ap + self.c_pu * cp * sp.apply_mass(u)
        return jnp.stack([au, ap])

    def matvec_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x for flat x of length ``2 * N_t * n``."""
        return self.matvec(x.reshape(self.shape)).reshape(-1)

    def matvec_host_f64(self, x: np.ndarray) -> np.ndarray:
        """A @ x in float64 numpy on host -- the space-generic residual
        oracle twin of :meth:`matvec`. The float32 device matvec cannot
        measure residuals below ~1e-3 relative (the time stencil's
        smooth-mode cancellation puts its rounding noise there); this twin
        sees the true residual of a float32 solution for ANY space --
        non-sine-diagonalizable ones (2D consistent, unstructured meshes)
        included, where the faster spectral-coordinate oracle
        (:func:`paradiag.spectral.spectral_relative_residual`) cannot run."""

        def shift(a, s):
            if s == 0:
                return a
            pad = [(0, 0)] * (a.ndim - 1)
            if s > 0:
                return np.pad(a[:-s], [(s, 0)] + pad)
            return np.pad(a[-s:], [(0, -s)] + pad)

        sp = self.space
        x = np.asarray(x, np.float64)
        u, p = x[0], x[1]
        half_d2 = 0.5 * self.dt * self.dt
        mu, mp = sp.apply_mass_host_f64(u), sp.apply_mass_host_f64(p)
        ku, kp = sp.apply_stiffness_host_f64(u), sp.apply_stiffness_host_f64(p)
        cu = np.ones((self.N_t, 1))
        cu[0, 0] = 0.5
        cp = np.ones((self.N_t, 1))
        cp[-1, 0] = 0.5
        au = (mu - 2.0 * shift(mu, 1) + shift(mu, 2)) + half_d2 * (ku + shift(ku, 2))
        au = au - self.c_up * cu * mp
        ap = (mp - 2.0 * shift(mp, -1) + shift(mp, -2)) + half_d2 * (kp + shift(kp, -2))
        ap = ap + self.c_pu * cp * mu
        return np.stack([au, ap])

    def dense(self) -> np.ndarray:
        """Materialize A as a dense matrix (small problems: direct baseline,
        the analogue of the reference's assembled-aij MUMPS path
        ``Control_Wave_PC.py:186``; and the test oracle's counterpart)."""
        import jax

        eye = jnp.eye(self.size, dtype=self.space.dtype)
        cols = jax.lax.map(self.matvec_flat, eye, batch_size=256)
        return np.asarray(cols).T


def build_operator(space: P1Space, N_t: int, dt: float, gamma: float, scaled: bool = True) -> AllAtOnceOperator:
    return AllAtOnceOperator(space=space, N_t=N_t, dt=dt, gamma=gamma, scaled=scaled)


def operator_nnz(op: AllAtOnceOperator) -> int:
    """Exact nonzero count of the assembled all-at-once matrix (the 'aij'
    matrix the reference hands to MUMPS, ``Control_Wave_PC.py:186``) --
    the denominator of the nnz/s throughput metric (BASELINE.md acceptance).

    Row structure (per time level, from :meth:`AllAtOnceOperator.matvec`):
    the u-row at time i touches u through the M+K pattern at level i, M alone
    at level i-1 (the -2M second-difference term), M+K at level i-2, and p
    through M at level i; p-rows mirror it backward. Spatial pattern sizes on
    the interior grid (m = n1d):

      1D: M, K, and their union are tridiagonal: 3m - 2.
      2D consistent: M is the 7-point FK stencil (7m^2 - 8m + 2), K the
        5-point (5m^2 - 4m), union = M's pattern.
      2D lumped: M diagonal (m^2), union = K's 5-point pattern.

    Verified against the densified operator in tests/test_operator.py.
    """
    sp = op.space
    m = sp.n1d if hasattr(sp, "n1d") else None
    if m is None:  # unstructured: count from the assembled CSR patterns
        pM = sp.M_csr.nnz
        pK = sp.K_csr.nnz
        Md = sp.mass_dense() != 0
        Kd = sp.stiffness_dense() != 0
        pMK = int((Md | Kd).sum())
    elif sp.dim == 1:
        tri = 3 * m - 2
        pM = m if sp.mass == "lumped" else tri
        pMK = tri
    else:
        five = 5 * m * m - 4 * m
        seven = 7 * m * m - 8 * m + 2
        pM = m * m if sp.mass == "lumped" else seven
        pMK = five if sp.mass == "lumped" else seven
    N_t = op.N_t
    per_block = N_t * pMK + (N_t - 1) * pM + (N_t - 2) * pMK + N_t * pM
    return 2 * per_block


def build_rhs(
    op: AllAtOnceOperator,
    f: jnp.ndarray,
    g: jnp.ndarray,
    u0: jnp.ndarray,
    u1: jnp.ndarray,
) -> jnp.ndarray:
    """Assemble the right-hand side b of A x = b, shape ``(2, N_t, n)``.

    ``f``/``g`` are nodal data of shape ``(N_t, n)`` (f at times ``i*dt``
    following ``Build_f`` ref ``:54``, g at ``(i+1)*dt`` following ``Build_g``
    ref ``:69`` -- the reference's staggered indexing, reproduced verbatim);
    ``u0``/``u1`` are the initial data (n,). In scaled mode the caller passes
    f, u0, u1 already multiplied by sqrt(gamma) (ref ``:56-57, 78-80``); g is
    never scaled.

    Rows (data terms of ``Build_L`` moved to the RHS):
      b_u[0]   = M (dt^2/2 f_0 + dt u1 + u0)          (ref ``:118``)
      b_u[1]   = dt^2 M f_1 - (M + dt^2/2 K) u0        (u_{i-2}=u0 data, ref ``:94-95``)
      b_u[i>1] = dt^2 M f_i                            (ref ``:139,159``)
      b_p[i]   = dt^2 M g_i,  b_p[N_t-1] = dt^2/2 M g_{N_t-1}  (ref ``:123,144``)
    """
    sp = op.space
    d2 = op.dt * op.dt
    bu = d2 * sp.apply_mass(f)
    bu = bu.at[0].set(sp.apply_mass(0.5 * d2 * f[0] + op.dt * u1 + u0))
    bu = bu.at[1].add(-(sp.apply_mass(u0) + 0.5 * d2 * sp.apply_stiffness(u0)))
    bp = d2 * sp.apply_mass(g)
    bp = bp.at[-1].set(0.5 * d2 * sp.apply_mass(g[-1]))
    return jnp.stack([bu, bp])
