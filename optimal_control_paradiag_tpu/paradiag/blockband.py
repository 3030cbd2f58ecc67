"""Batched banded block-Thomas direct inner solve for UNSTRUCTURED meshes.

MUMPS parity past ``blockdense``'s memory wall on general triangle meshes --
the blockline recipe (paradiag/blockline.py) generalized from structured
grid lines to RCM-banded level blocks:

1. RCM-reorder the interior-DoF adjacency graph (native
   ``rcm_order``, ``native/paradiag_host.cpp:124`` -- the analogue of a
   sparse direct solver's fill-reducing ordering) and measure the matrix
   bandwidth ``b``.
2. Partition the reordered unknowns into ``L = ceil(n / m)`` consecutive
   LEVELS of size ``m = b``: any matrix of bandwidth <= m is block-
   tridiagonal over such levels, so M and K decompose exactly into
   per-level diagonal/sub/super m x m dense blocks (level-DEPENDENT here,
   unlike the structured grid's identical lines).
3. Per Fourier mode k (Hermitian half spectrum, like blockline) the coupled
   2x2-block operator

       P_k = [[ L1 M + c L2 K,            -theta M ],
              [ theta M,  conj(L1) M + c conj(L2) K ]],   c = dt^2/2,

   is block-tridiagonal over levels with 2m x 2m blocks. Block-Thomas
   factorization stores the level Schur-complement inverses
   ``G_j = (A_j - B_j G_{j-1} C_{j-1})^{-1}`` -- built once on host in
   complex128 (the MUMPS symbolic+numeric analogue, ref
   ``Control_Wave_PC.py:480-484``) and shipped as real/imag pairs.
4. The device apply is two ``lax.scan`` sweeps over levels whose step is a
   mode-batched real einsum 4-tuple; the off-diagonal blocks are applied
   matrix-free from the REAL level blocks of M and K (shared across modes)
   combined with the per-mode scalars -- so only G is stored per mode.

Memory: ``(N_t//2 + 1) * L * (2m)^2 ~ (N_t//2+1) * 4 n m`` complex entries
(vs blockdense's ``N_t * 4 n^2``): for a good 2D mesh ``m = O(sqrt(n))``,
so the wall moves from n ~ 1e3 to n ~ 2e4 at N_t = 64.

Stability note: the per-mode blocks are the same complex-shifted operators
blockline factorizes without pivoting on structured grids (never
near-singular: det = |a11|^2 + theta^2 muM^2 > 0 mode-wise); level-block
elimination subsumes any within-level pivoting a banded scalar LU would
need. Exactness is pinned against blockdense in tests/test_blockband.py.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


def _csr_coo(csr) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    rows = np.repeat(np.arange(csr.shape[0]), np.diff(csr.indptr))
    return rows, np.asarray(csr.indices, np.int64), np.asarray(csr.data, np.float64)


def band_profile(space) -> Tuple[np.ndarray, int]:
    """(RCM permutation over interior DoFs, bandwidth after reordering)."""
    from optimal_control_paradiag_tpu import native

    csr = space.M_csr
    perm = native.rcm_permutation(
        np.asarray(csr.indptr, np.int64), np.asarray(csr.indices, np.int32)
    )
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    rows, cols, _ = _csr_coo(csr)
    bw = int(np.abs(inv[rows].astype(np.int64) - inv[cols].astype(np.int64)).max())
    return perm, max(bw, 1)


def blockband_entries(N_t: int, n: int, m: int) -> int:
    """Stored complex entries of the half-spectrum level-Thomas factors."""
    L = -(-n // m)
    return (N_t // 2 + 1) * L * (2 * m) ** 2


def _level_blocks(csr, inv: np.ndarray, m: int, L: int, pad_diag: float) -> np.ndarray:
    """(diag, sub, super) level blocks, each (L, m, m) float64, of the
    RCM-permuted matrix (``inv`` maps old index -> new). ``pad_diag`` fills
    the padded tail's diagonal (1 for M so pad rows stay invertible, 0 for K)."""
    n = csr.shape[0]
    rows, cols, vals = _csr_coo(csr)
    r, c = inv[rows], inv[cols]
    br, bc = r // m, c // m
    D = np.zeros((L, m, m))
    S = np.zeros((L, m, m))  # S[j] = block (j, j-1)
    U = np.zeros((L, m, m))  # U[j] = block (j, j+1)
    off = np.abs(br - bc)
    if off.max(initial=0) > 1:
        raise ValueError("bandwidth exceeds level size; enlarge m")
    sel = br == bc
    np.add.at(D, (br[sel], r[sel] % m, c[sel] % m), vals[sel])
    sel = br == bc + 1
    np.add.at(S, (br[sel], r[sel] % m, c[sel] % m), vals[sel])
    sel = br + 1 == bc
    np.add.at(U, (br[sel], r[sel] % m, c[sel] % m), vals[sel])
    for i in range(n, L * m):
        D[i // m, i % m, i % m] = pad_diag
    return D, S, U


def build_blockband_solver(op) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Factorize P_k for modes 0..N_t//2 on the RCM-banded level structure
    and return the jittable half-spectrum solver ``solve(rhat) -> w`` on
    ``(2, N_t, n)`` mode arrays (full spectrum in/out; Hermitian mirror
    inside -- ``rhat`` must carry real-residual mode symmetry, like
    :func:`paradiag.blockline.build_blockline_solver`)."""
    sp = op.space
    if sp.diagonalizable:
        raise ValueError("blockband is the unstructured direct path; "
                         "diagonalizable spaces have exact spectral solves")
    rdtype = sp.dtype
    cdtype = jnp.result_type(rdtype, jnp.complex64)
    n = sp.n
    N_t = op.N_t
    hk = N_t // 2 + 1
    c = 0.5 * op.dt * op.dt
    theta = op.dt * op.dt / (op.gamma**0.5)
    e = circulant_eigs(N_t, op.dt, op.gamma)
    L1 = np.asarray(e.Lambda1, np.complex128)[:hk]
    L2 = np.asarray(e.Lambda2, np.complex128)[:hk]

    perm, m = band_profile(sp)
    L = -(-n // m)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=perm.dtype)
    Md, Ms, Mu = _level_blocks(sp.M_csr, inv, m, L, pad_diag=1.0)
    Kd, Ks, Ku = _level_blocks(sp.K_csr, inv, m, L, pad_diag=0.0)

    def coupled(Mb: np.ndarray, Kb: np.ndarray) -> np.ndarray:
        """Per-mode 2x2-block matrices (L, hk, 2m, 2m) from level blocks."""
        Z = np.zeros((Mb.shape[0], hk, 2 * m, 2 * m), np.complex128)
        Z[:, :, :m, :m] = L1[:, None, None] * Mb[:, None] + c * L2[:, None, None] * Kb[:, None]
        Z[:, :, :m, m:] = -theta * Mb[:, None]
        Z[:, :, m:, :m] = theta * Mb[:, None]
        Z[:, :, m:, m:] = (
            np.conj(L1)[:, None, None] * Mb[:, None] + c * np.conj(L2)[:, None, None] * Kb[:, None]
        )
        return Z

    A = coupled(Md, Kd)
    B = coupled(Ms, Ks)  # B[j] acts on level j-1
    C = coupled(Mu, Ku)  # C[j] acts on level j+1

    # Level-Thomas forward recursion, batched over modes (the setup-time
    # analogue of MUMPS' factorization, ref :480-484).
    G = np.empty((L, hk, 2 * m, 2 * m), np.complex128)
    G[0] = np.linalg.inv(A[0])
    for j in range(1, L):
        G[j] = np.linalg.inv(A[j] - B[j] @ G[j - 1] @ C[j - 1])

    # The factor tensors are LARGE (L * hk * (2m)^2); ship them as device
    # arrays (to_device) so they lower as compiled-executable PARAMETERS.
    # As embedded numpy constants (host_const) XLA constant-folds their
    # layout transposes at compile time and the program carries them in the
    # compile RPC -- measured ~700 s cold compile on the axon relay for the
    # N=32 bench stage; parameters avoid both.
    Gr = to_device(G.real, rdtype)
    Gi = to_device(G.imag, rdtype)
    # Real level blocks (shared across modes) for matrix-free off-block apply.
    Msr = to_device(Ms, rdtype)
    Ksr = to_device(Ks, rdtype)
    Mur = to_device(Mu, rdtype)
    Kur = to_device(Ku, rdtype)
    L1d = host_const(L1[:, None], cdtype)
    L2d = host_const(L2[:, None], cdtype)
    L1cd = host_const(np.conj(L1)[:, None], cdtype)
    L2cd = host_const(np.conj(L2)[:, None], cdtype)
    perm_d = host_const(np.asarray(perm, np.int32), jnp.int32)
    inv_d = host_const(np.asarray(inv, np.int32), jnp.int32)
    hi = jax.lax.Precision.HIGHEST

    def _real_mv(Rb, v):
        """Real (m, m) level block applied to complex (hk, m) mode vectors."""
        return jax.lax.complex(
            jnp.einsum("ab,kb->ka", Rb, v.real, precision=hi),
            jnp.einsum("ab,kb->ka", Rb, v.imag, precision=hi),
        )

    def _off_apply(Mb, Kb, y):
        """Coupled off-diagonal block from real level blocks + mode scalars."""
        yu, yp = y[:, :m], y[:, m:]
        mu_, mp_ = _real_mv(Mb, yu), _real_mv(Mb, yp)
        ku_, kp_ = _real_mv(Kb, yu), _real_mv(Kb, yp)
        bu = L1d * mu_ + c * L2d * ku_ - theta * mp_
        bp = theta * mu_ + L1cd * mp_ + c * L2cd * kp_
        return jnp.concatenate([bu, bp], axis=-1)

    def _gmatvec(gr, gi, v):
        vr, vi = v.real, v.imag
        wr = jnp.einsum("kab,kb->ka", gr, vr, precision=hi) - jnp.einsum(
            "kab,kb->ka", gi, vi, precision=hi
        )
        wi = jnp.einsum("kab,kb->ka", gr, vi, precision=hi) + jnp.einsum(
            "kab,kb->ka", gi, vr, precision=hi
        )
        return jax.lax.complex(wr, wi)

    n_pad = L * m

    def solve(rhat: jnp.ndarray) -> jnp.ndarray:
        rh = rhat[:, :hk]
        # RCM order + pad, then level vectors (L, hk, 2m).
        rperm = jnp.take(rh, perm_d, axis=-1)
        rperm = jnp.pad(rperm, ((0, 0), (0, 0), (0, n_pad - n)))
        rlev = rperm.reshape(2, hk, L, m)
        r_levels = jnp.concatenate([rlev[0], rlev[1]], axis=-1)  # (hk, L, 2m)
        r_levels = jnp.swapaxes(r_levels, 0, 1).astype(jnp.result_type(rhat.dtype, cdtype))

        def fwd(y_prev, inputs):
            gr, gi, mb, kb, r_j = inputs
            y_j = _gmatvec(gr, gi, r_j - _off_apply(mb, kb, y_prev))
            return y_j, y_j

        zero = jnp.zeros_like(r_levels[0])
        _, ys = jax.lax.scan(fwd, zero, (Gr, Gi, Msr, Ksr, r_levels))

        def bwd(x_next, inputs):
            gr, gi, mb, kb, y_j = inputs
            x_j = y_j - _gmatvec(gr, gi, _off_apply(mb, kb, x_next))
            return x_j, x_j

        _, xs = jax.lax.scan(bwd, zero, (Gr, Gi, Mur, Kur, ys), reverse=True)

        w = jnp.swapaxes(xs, 0, 1)  # (hk, L, 2m)
        wu = w[..., :m].reshape(hk, n_pad)[:, :n]
        wp = w[..., m:].reshape(hk, n_pad)[:, :n]
        # Undo the RCM permutation.
        wu = jnp.take(wu, inv_d, axis=-1)
        wp = jnp.take(wp, inv_d, axis=-1)
        w_half = jnp.stack([wu, wp])
        mirror = jnp.conj(jnp.flip(w_half[:, 1 : N_t - hk + 1], axis=1))
        return jnp.concatenate([w_half, mirror], axis=1)

    return solve
