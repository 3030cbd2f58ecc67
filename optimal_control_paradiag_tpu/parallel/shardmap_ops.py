"""Hand-written collective (shard_map) implementations of the hot path.

The compiler-driven pjit path (:mod:`parallel.solve`) lets XLA place
all-to-alls from sharding constraints. This module is the explicit-control
twin -- every communication step is a named collective, the TPU-native
equivalent of the reference's MPI layer (halo exchange inside PETSc SpMV,
SURVEY.md section 2.3):

- **matvec**: time-stencil halos (2 rows) and space-stencil halos (1 column)
  exchanged via ``lax.ppermute`` (edge shards receive zeros -- exactly the
  Dirichlet/zero-padding semantics of the interior-DoF formulation);
- **fulldiag PC apply**: each transform (time DFT, space DST) is one local
  matmul of the shard's slice against the full transform matrix followed by a
  ``psum_scatter`` over the contracted mesh axis, so data lands directly in
  the next stage's layout (the Ulysses-style transpose pipeline, SURVEY.md
  5.7-5.8). Modes stay sharded over the 'time' mesh axis, wavenumbers over
  'space'; the per-(mode, wavenumber) 2x2 Cramer constants are sliced per
  shard with ``lax.axis_index``. All arithmetic is split-real (complex-free),
  so every contraction is an MXU matmul.

Composable with jit: the returned functions are ordinary traceable callables
(shard_map regions) that the outer Krylov loop calls like any other op.
1D (the flagship geometry); the pjit path covers 2D.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.parallel.sharding import ParallelLayout
from optimal_control_paradiag_tpu.utils.constants import host_const


def _shift_halo(x, s, axis_name, axis, n_shards):
    """Global zero-padded shift by ``s`` (|s| <= block extent) along ``axis``
    of a block-sharded array, exchanging halos with ``ppermute``.

    y_global[i] = x_global[i - s]; edge shards get zeros (Dirichlet)."""
    if s == 0:
        return x
    if n_shards == 1:
        pad = [(0, 0)] * x.ndim
        sl = [slice(None)] * x.ndim
        if s > 0:
            pad[axis] = (s, 0)
            sl[axis] = slice(0, x.shape[axis] - s)
        else:
            pad[axis] = (0, -s)
            sl[axis] = slice(-s, None)
        return jnp.pad(x[tuple(sl)], pad)

    if s > 0:
        # need the last s entries of the previous shard
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(x.shape[axis] - s, None)
        tail = x[tuple(sl)]
        halo = lax.ppermute(tail, axis_name, [(i, i + 1) for i in range(n_shards - 1)])
        sl2 = [slice(None)] * x.ndim
        sl2[axis] = slice(0, x.shape[axis] - s)
        return jnp.concatenate([halo, x[tuple(sl2)]], axis=axis)
    s = -s
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, s)
    head = x[tuple(sl)]
    halo = lax.ppermute(head, axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    sl2 = [slice(None)] * x.ndim
    sl2[axis] = slice(s, None)
    return jnp.concatenate([x[tuple(sl2)], halo], axis=axis)


def build_shardmap_matvec(op: AllAtOnceOperator, layout: ParallelLayout):
    """Explicit-halo all-at-once matvec on the canonical layout."""
    sp = op.space
    if sp.dim != 1:
        raise NotImplementedError("shard_map matvec is 1D; use the pjit path for 2D")
    mesh = layout.mesh
    nt_shards = mesh.shape["time"]
    ns_shards = mesh.shape["space"]
    if op.N_t % nt_shards or sp.n % ns_shards:
        raise ValueError(
            "shard_map ops need evenly dividing shards (fixed per-device "
            f"blocks): need nt | N_t and ns | n; got N_t={op.N_t}, "
            f"nt={nt_shards}, n={sp.n}, ns={ns_shards} -- the pjit path "
            "(parallel.solve.make_sharded_solver) handles uneven shapes"
        )
    h = sp.h
    half_d2 = 0.5 * op.dt * op.dt
    N_t = op.N_t

    def local_mass(x):
        if sp.mass == "lumped":
            return h * x
        xl = _shift_halo(x, 1, "space", x.ndim - 1, ns_shards)
        xr = _shift_halo(x, -1, "space", x.ndim - 1, ns_shards)
        return (h / 6.0) * (4.0 * x + xl + xr)

    def local_stiff(x):
        xl = _shift_halo(x, 1, "space", x.ndim - 1, ns_shards)
        xr = _shift_halo(x, -1, "space", x.ndim - 1, ns_shards)
        return (1.0 / h) * (2.0 * x - xl - xr)

    def kernel(x):
        u, p = x[0], x[1]
        mu, mp_ = local_mass(u), local_mass(p)
        ku, kp = local_stiff(u), local_stiff(p)
        ts = lambda a, s: _shift_halo(a, s, "time", 0, nt_shards)

        blk = u.shape[0]
        row0 = lax.axis_index("time") * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
        cu = jnp.where(row0 == 0, 0.5, 1.0).astype(x.dtype)
        cp = jnp.where(row0 == N_t - 1, 0.5, 1.0).astype(x.dtype)

        au = (mu - 2.0 * ts(mu, 1) + ts(mu, 2)) + half_d2 * (ku + ts(ku, 2))
        au = au - op.c_up * cu * mp_
        ap = (mp_ - 2.0 * ts(mp_, -1) + ts(mp_, -2)) + half_d2 * (kp + ts(kp, -2))
        ap = ap + op.c_pu * cp * mu
        return jnp.stack([au, ap])

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(None, "time", "space"),
        out_specs=P(None, "time", "space"),
    )


def build_shardmap_preconditioner(op: AllAtOnceOperator, layout: ParallelLayout):
    """Explicit-collective fulldiag ParaDiag apply (1D).

    Shard layout invariant: global time/modes are block-sharded over the
    'time' mesh axis (block tb = N_t/nt), global space/wavenumbers over
    'space' (block nb = n/ns). Pipeline per apply (split-real arithmetic):

      1. time DFT:   partial (all modes, local cols) = C/S[:, t_blk] @ r,
                     psum_scatter over 'time'   -> modes block tix
      2. space DST:  partial (local modes, all j) = part @ V[x_blk, :]^T,
                     psum_scatter over 'space'  -> wavenumber block six
      3. 2x2 Cramer solve with (a11, coup, det) sliced at (tix, six)
      4. inverse DST (contract local j, scatter over 'space')
      5. inverse real-DFT (contract local modes, scatter over 'time')
    """
    sp = op.space
    if sp.dim != 1 or not sp.diagonalizable:
        raise NotImplementedError("shard_map PC: 1D fulldiag only (pjit path covers the rest)")
    if not op.scaled:
        raise ValueError("ParaDiag requires the scaled system")
    mesh = layout.mesh
    nt = mesh.shape["time"]
    ns = mesh.shape["space"]
    N_t, n = op.N_t, sp.n
    if N_t % nt or n % ns:
        raise ValueError(f"need nt | N_t and ns | n; got N_t={N_t}, nt={nt}, n={n}, ns={ns}")
    rdtype = sp.dtype
    e = circulant_eigs(N_t, op.dt, op.gamma)
    c = 0.5 * op.dt * op.dt
    muM, muK = (np.asarray(a, np.float64) for a in sp.spectrum)
    L1 = np.asarray(e.Lambda1)[:, None]
    L2 = np.asarray(e.Lambda2)[:, None]
    a11_h = L1 * muM[None, :] + c * L2 * muK[None, :]
    coup_h = (op.dt * op.dt / math.sqrt(op.gamma)) * muM[None, :] * np.ones((N_t, 1))
    det_h = np.abs(a11_h) ** 2 + coup_h**2
    a11r = host_const(a11_h.real, rdtype)
    a11i = host_const(a11_h.imag, rdtype)
    coup = host_const(coup_h, rdtype)
    det = host_const(det_h, rdtype)

    ang = 2.0 * np.pi * np.outer(np.arange(N_t), np.arange(N_t)) / N_t
    Cm = host_const(np.cos(ang), rdtype)
    Sm = host_const(np.sin(ang), rdtype)
    i_ = np.arange(1, sp.N_x)
    V = host_const(np.sin(np.pi * np.outer(i_, i_) / sp.N_x), rdtype)
    hi = jax.lax.Precision.HIGHEST

    tb = N_t // nt
    nb = n // ns

    def kernel(r):
        tix = lax.axis_index("time")
        six = lax.axis_index("space")
        krow = tix * tb  # our mode block
        jcol = six * nb  # our wavenumber block

        # --- 1. time DFT (ifft of real r): contract local time rows.
        Ct = lax.dynamic_slice_in_dim(Cm, tix * tb, tb, 1)  # (N_t, tb)
        St = lax.dynamic_slice_in_dim(Sm, tix * tb, tb, 1)
        pre = jnp.einsum("kt,ctn->ckn", Ct, r, precision=hi)
        pim = jnp.einsum("kt,ctn->ckn", St, r, precision=hi)
        part = jnp.stack([pre, pim]) * (1.0 / N_t)  # (ri, comp, N_t, nb)
        part = lax.psum_scatter(part, "time", scatter_dimension=2, tiled=True)
        # (2, 2, tb, nb): modes block = tix, space cols block = six.

        # --- 2. space DST: contract local space cols against V rows.
        Vx = lax.dynamic_slice_in_dim(V, jcol, nb, 0)  # (nb, n)
        part = jnp.einsum("xj,rcmx->rcmj", Vx, part, precision=hi)  # (2,2,tb,n)
        part = lax.psum_scatter(part, "space", scatter_dimension=3, tiled=True)
        # (2, 2, tb, nb): wavenumber block = six.

        # --- 3. Cramer 2x2 per (mode, wavenumber).
        a11r_b = lax.dynamic_slice(a11r, (krow, jcol), (tb, nb))
        a11i_b = lax.dynamic_slice(a11i, (krow, jcol), (tb, nb))
        coup_b = lax.dynamic_slice(coup, (krow, jcol), (tb, nb))
        det_b = lax.dynamic_slice(det, (krow, jcol), (tb, nb))
        rur, rui = part[0, 0], part[1, 0]
        rpr, rpi = part[0, 1], part[1, 1]
        # yu = (conj(a11) ru + coup rp)/det ; yp = (a11 rp - coup ru)/det
        yur = (a11r_b * rur + a11i_b * rui + coup_b * rpr) / det_b
        yui = (a11r_b * rui - a11i_b * rur + coup_b * rpi) / det_b
        ypr = (a11r_b * rpr - a11i_b * rpi - coup_b * rur) / det_b
        ypi = (a11r_b * rpi + a11i_b * rpr - coup_b * rui) / det_b
        yt = jnp.stack([jnp.stack([yur, ypr]), jnp.stack([yui, ypi])])

        # --- 4. inverse DST: contract local wavenumbers.
        Vj = lax.dynamic_slice_in_dim(V, jcol, nb, 0)  # (nb, n) row block
        part = jnp.einsum("jx,rcmj->rcmx", Vj, yt, precision=hi) * (2.0 / sp.N_x)
        part = lax.psum_scatter(part, "space", scatter_dimension=3, tiled=True)
        # (2, 2, tb, nb): space block = six.

        # --- 5. inverse DFT, real part: contract local modes.
        Ck = lax.dynamic_slice_in_dim(Cm, krow, tb, 1)  # (N_t, tb)
        Sk = lax.dynamic_slice_in_dim(Sm, krow, tb, 1)
        yre = jnp.einsum("tk,ckn->ctn", Ck, part[0], precision=hi) + jnp.einsum(
            "tk,ckn->ctn", Sk, part[1], precision=hi
        )  # (2, N_t, nb)
        out = lax.psum_scatter(yre, "time", scatter_dimension=1, tiled=True)
        return out.astype(rdtype)  # (2, tb, nb) canonical

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=P(None, "time", "space"),
        out_specs=P(None, "time", "space"),
    )
