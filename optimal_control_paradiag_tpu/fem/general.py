"""P1 space on an ARBITRARY triangle mesh -- the unstructured path.

The reference supports general meshes through Firedrake (any ``Mesh`` feeds
the same UFL forms, ``Control_Wave_PC.py:16-19, 86-179``); the structured
:class:`fem.space.P1Space` covers its actually-used unit interval/square. This
module closes the generality gap TPU-natively:

- assembly: the native C++ O(nnz) P1 assembler (``native/paradiag_host.cpp``,
  the PETSc-core analogue) builds CSR mass/stiffness over all nodes;
- Dirichlet elimination: boundary nodes are detected topologically (edges
  incident to exactly one triangle) and eliminated, leaving interior-DoF
  operators exactly like the structured space;
- apply: TPU-friendly ELL SpMV (:class:`ops.sparse.CSRMatrix`) -- one static
  gather + multiply + row-sum, batched over leading axes.

No sine transform exists here (``diagonalizable = False``); ParaDiag inner
solves use the dense per-mode factorization (``pc_variant='blockdense'``,
exact -- the MUMPS analogue) or Jacobi-preconditioned batched COCG
(``inner='cocg_jacobi'``) when memory is tight.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.ops.sparse import CSRMatrix, csr_from_parts
from optimal_control_paradiag_tpu.utils.constants import host_const


def boundary_nodes(n_points: int, triangles: np.ndarray) -> np.ndarray:
    """Boolean mask of boundary nodes: endpoints of edges that belong to
    exactly one triangle."""
    tris = np.asarray(triangles, np.int64)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [0, 2]]])
    edges = np.sort(edges, axis=1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    bnd_edges = uniq[counts == 1]
    mask = np.zeros(n_points, bool)
    mask[bnd_edges.ravel()] = True
    return mask


def _interior_csr(indptr, indices, data, keep: np.ndarray, dtype) -> CSRMatrix:
    """Restrict a full-node CSR to the ``keep`` (interior) rows/columns."""
    n_full = len(indptr) - 1
    new_id = -np.ones(n_full, np.int64)
    new_id[keep] = np.arange(keep.sum())
    ip = [0]
    cols = []
    vals = []
    for i in np.flatnonzero(keep):
        for k in range(indptr[i], indptr[i + 1]):
            j = indices[k]
            if new_id[j] >= 0:
                cols.append(new_id[j])
                vals.append(data[k])
        ip.append(len(cols))
    n = int(keep.sum())
    return csr_from_parts(
        (n, n),
        np.asarray(ip, np.int32),
        np.asarray(cols, np.int32),
        np.asarray(vals, np.float64),
        dtype=np.dtype(dtype),
    )


@dataclasses.dataclass(frozen=True)
class GeneralP1Space:
    """Interior-DoF P1 space on a triangle mesh; duck-type-compatible with
    :class:`fem.space.P1Space` for the operator/problem/PC layers
    (``dim, n, dtype, coords, interpolate, apply_mass, apply_stiffness,
    mass_dense, stiffness_dense, diagonalizable, spectrum``)."""

    points: np.ndarray  # (n_points, 2) float64, all nodes
    triangles: np.ndarray  # (n_tri, 3) int32
    dtype: object
    interior: np.ndarray  # (n_points,) bool
    M_csr: CSRMatrix
    K_csr: CSRMatrix

    dim: int = 2
    diagonalizable: bool = False

    @property
    def n(self) -> int:
        return self.M_csr.shape[0]

    @property
    def spectrum(self) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """No sine-transform diagonalization on general meshes."""
        return (None, None)

    @property
    def coords(self) -> Tuple[np.ndarray, ...]:
        pts = self.points[self.interior]
        return (pts[:, 0].copy(), pts[:, 1].copy())

    def interpolate(self, fn: Callable[..., np.ndarray]) -> np.ndarray:
        return host_const(np.asarray(fn(*self.coords), np.float64), self.dtype)

    def apply_mass(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.M_csr.spmv(x)

    def apply_stiffness(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.K_csr.spmv(x)

    @functools.cached_property
    def _element_grad_data(self):
        """Per-triangle P1 gradient factors ``(b, c, inv4A, idx)`` for the
        element-form stiffness: ``K_e = (b b^T + c c^T) / (4 A)`` with
        ``b_i = y_j - y_k``, ``c_i = x_k - x_j`` (cyclic), orientation-safe
        (flipping a triangle negates b AND c, leaving every product
        invariant; the area enters as ``|A|``). ``idx`` maps triangle
        vertices to interior slots, boundary vertices to the zero ghost slot
        ``n``."""
        pts, tris = self.points, self.triangles
        x, y = pts[:, 0], pts[:, 1]
        i0, i1, i2 = tris[:, 0], tris[:, 1], tris[:, 2]
        b = np.stack([y[i1] - y[i2], y[i2] - y[i0], y[i0] - y[i1]], axis=1)
        c = np.stack([x[i2] - x[i1], x[i0] - x[i2], x[i1] - x[i0]], axis=1)
        twoA = (x[i1] - x[i0]) * (y[i2] - y[i0]) - (x[i2] - x[i0]) * (y[i1] - y[i0])
        inv4A = 1.0 / (2.0 * np.abs(twoA))
        slot = np.full(pts.shape[0], self.n, np.int32)
        slot[np.flatnonzero(self.interior)] = np.arange(self.n, dtype=np.int32)
        idx = slot[tris].astype(np.int32)
        dt = self.dtype
        return (
            host_const(b, dt),
            host_const(c, dt),
            host_const(inv4A, dt),
            host_const(idx, jnp.int32),
        )

    def apply_stiffness_nested(self, x: jnp.ndarray) -> jnp.ndarray:
        """K @ x in cancellation-aware ELEMENT form -- the unstructured
        analogue of :meth:`fem.space.P1Space.apply_stiffness_nested` (VERDICT
        r3: the f32 physical-matvec cancellation had no unstructured escape).

        The CSR form sums O(1)-size products that cancel to the O(h^2)
        answer on smooth fields, so its float32 rounding noise is amplified
        by ~1/h^2. Here each element gradient is built from EXACT adjacent-
        value differences ``u_j - u_0`` (Sterbenz) scaled by geometry
        factors, and only the final per-node scatter carries one O(h) ->
        O(h^2) cancellation level -- noise amplification ~1/h instead.
        Algebraically identical to :meth:`apply_stiffness` (pinned to 1e-12
        in tests/test_general.py); used by the accurate matvec
        (``AllAtOnceOperator.matvec_accurate``) and hence by f32 outer GMRES
        and the polish ladder on general meshes."""
        b, c, inv4A, idx = self._element_grad_data
        zeros = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        x_ext = jnp.concatenate([x, zeros], axis=-1)
        g = jnp.take(x_ext, idx.reshape(-1), axis=-1).reshape(x.shape[:-1] + idx.shape)
        d1 = g[..., 1] - g[..., 0]
        d2 = g[..., 2] - g[..., 0]
        wx = (b[:, 1] * d1 + b[:, 2] * d2) * inv4A
        wy = (c[:, 1] * d1 + c[:, 2] * d2) * inv4A
        contrib = b * wx[..., None] + c * wy[..., None]  # (..., n_tri, 3)
        out = jnp.zeros(x.shape[:-1] + (self.n + 1,), x.dtype)
        out = out.at[..., idx.reshape(-1)].add(
            contrib.reshape(contrib.shape[:-2] + (-1,))
        )
        return out[..., : self.n]

    def apply_mass_host_f64(self, x: np.ndarray) -> np.ndarray:
        """Float64 numpy twin of :meth:`apply_mass` (residual oracle)."""
        return self.M_csr.spmv_host_f64(x)

    def apply_stiffness_host_f64(self, x: np.ndarray) -> np.ndarray:
        """Float64 numpy twin of :meth:`apply_stiffness` (residual oracle)."""
        return self.K_csr.spmv_host_f64(x)

    def mass_dense(self) -> np.ndarray:
        return self.M_csr.todense()

    def stiffness_dense(self) -> np.ndarray:
        return self.K_csr.todense()

    def mass_diag(self) -> np.ndarray:
        return np.diag(self.M_csr.todense()).copy()

    def stiffness_diag(self) -> np.ndarray:
        return np.diag(self.K_csr.todense()).copy()


def make_general_space(
    points: np.ndarray,
    triangles: np.ndarray,
    dtype=jnp.float64,
    interior: Optional[np.ndarray] = None,
) -> GeneralP1Space:
    """Assemble a :class:`GeneralP1Space` with the native C++ assembler
    (falls back to nothing: the native layer is required for this path --
    matching its role as the host runtime, SURVEY.md section 2.2).

    ``interior``: optional boolean mask of non-Dirichlet nodes; default =
    topological boundary detection (homogeneous Dirichlet everywhere on the
    boundary, like the reference, ``Control_Wave_PC.py:43-45``)."""
    from optimal_control_paradiag_tpu import native

    pts = np.ascontiguousarray(points, np.float64)
    tris = np.ascontiguousarray(triangles, np.int32)
    indptr, indices, mass, stiff = native.assemble_p1_triangles(pts, tris)
    if interior is None:
        interior = ~boundary_nodes(pts.shape[0], tris)
    interior = np.asarray(interior, bool)
    M = _interior_csr(indptr, indices, mass, interior, dtype)
    K = _interior_csr(indptr, indices, stiff, interior, dtype)
    return GeneralP1Space(
        points=pts, triangles=tris, dtype=dtype, interior=interior, M_csr=M, K_csr=K
    )
