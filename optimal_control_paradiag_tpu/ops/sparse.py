"""Sparse matrix support: CSR containers and TPU-friendly ELL SpMV.

The reference's spatial operators live inside PETSc ``Mat`` objects (CSR;
``Control_Wave_PC.py:186`` assembles 'aij'). This framework's production path
never materializes matrices at all (stencils + sine transforms), but a
general sparse layer is part of the capability set (SURVEY.md section 2.2,
BASELINE north star: CSR/BSR SpMV): it covers future unstructured meshes and
provides the nnz/s benchmark surface.

TPU-first storage: CSR is kept for host-side construction/interop, and SpMV
executes in **ELL (padded row)** layout -- every row padded to the max row
width, so the kernel is one dense gather + multiply + row-sum reduction with
fully static shapes. For FEM matrices (row width <= 3^dim) padding waste is
tiny, and XLA lowers the gather efficiently on TPU. Batched right-hand sides
``(..., n)`` are supported directly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


@dataclasses.dataclass(frozen=True)
class CSRMatrix:
    """Host-side CSR (numpy) with device-side ELL apply data."""

    shape: Tuple[int, int]
    indptr: np.ndarray  # (n_rows+1,) int32
    indices: np.ndarray  # (nnz,) int32
    data: np.ndarray  # (nnz,) float

    # ELL apply data. ell_cols stays a (small, int) host constant; ell_vals
    # is a DEVICE array so compiled programs take it as a parameter.
    ell_cols: np.ndarray  # (n_rows, width) int32, padded with 0
    ell_vals: jnp.ndarray  # (n_rows, width), padded with 0.0

    @property
    def nnz(self) -> int:
        return int(self.indptr[-1])

    @property
    def width(self) -> int:
        return self.ell_cols.shape[1]

    def spmv(self, x: jnp.ndarray) -> jnp.ndarray:
        """A @ x over the last axis of ``x`` (batched over leading axes)."""
        gathered = jnp.take(x, self.ell_cols.reshape(-1), axis=-1)
        gathered = gathered.reshape(x.shape[:-1] + self.ell_cols.shape)
        return jnp.sum(gathered * self.ell_vals, axis=-1)

    @functools.cached_property
    def _ell_vals_f64(self) -> np.ndarray:
        """ELL values rebuilt from the original float64 CSR data (the stored
        ``ell_vals`` may already be narrowed to the space dtype)."""
        widths = np.diff(self.indptr)
        vals = np.zeros((self.shape[0], self.width), np.float64)
        mask = np.arange(self.width)[None, :] < widths[:, None]
        vals[mask] = np.asarray(self.data, np.float64)
        return vals

    def spmv_host_f64(self, x: np.ndarray) -> np.ndarray:
        """A @ x in float64 numpy on host -- the residual-oracle twin of
        :meth:`spmv` (batched over leading axes)."""
        x = np.asarray(x, np.float64)
        gathered = np.take(x, self.ell_cols, axis=-1)
        return np.sum(gathered * self._ell_vals_f64, axis=-1)

    def todense(self) -> np.ndarray:
        out = np.zeros(self.shape, self.data.dtype)
        for i in range(self.shape[0]):
            for k in range(self.indptr[i], self.indptr[i + 1]):
                out[i, self.indices[k]] += self.data[k]
        return out


def csr_from_dense(A: np.ndarray, dtype=np.float64, tol: float = 0.0) -> CSRMatrix:
    A = np.asarray(A)
    n_rows, n_cols = A.shape
    indptr = [0]
    indices = []
    data = []
    for i in range(n_rows):
        (cols,) = np.nonzero(np.abs(A[i]) > tol)
        indices.extend(cols.tolist())
        data.extend(A[i, cols].tolist())
        indptr.append(len(indices))
    return csr_from_parts(
        (n_rows, n_cols),
        np.asarray(indptr, np.int32),
        np.asarray(indices, np.int32),
        np.asarray(data, dtype),
    )


def csr_from_parts(shape, indptr, indices, data, dtype=None) -> CSRMatrix:
    indptr = np.asarray(indptr, np.int32)
    indices = np.asarray(indices, np.int32)
    data = np.asarray(data, dtype if dtype is not None else data.dtype)
    n_rows = shape[0]
    widths = np.diff(indptr)
    width = max(int(widths.max(initial=0)), 1)
    ell_cols = np.zeros((n_rows, width), np.int32)
    ell_vals = np.zeros((n_rows, width), data.dtype)
    for i in range(n_rows):
        lo, hi = indptr[i], indptr[i + 1]
        ell_cols[i, : hi - lo] = indices[lo:hi]
        ell_vals[i, : hi - lo] = data[lo:hi]
    # ELL values are the one large per-matrix array on the apply path: ship
    # them as a device array so they lower as a compiled-executable
    # PARAMETER -- as an embedded numpy constant XLA constant-folds its
    # layout transposes at compile time and the compile RPC carries the
    # bytes (measured on the axon relay, see paradiag/blockband.py).
    canon = to_device(host_const(ell_vals, data.dtype), data.dtype)
    return CSRMatrix(
        shape=tuple(shape),
        indptr=indptr,
        indices=indices,
        data=data,
        ell_cols=ell_cols,
        ell_vals=canon,
    )


def space_matrices_csr(space) -> Tuple[CSRMatrix, CSRMatrix]:
    """(M, K) of a :class:`fem.space.P1Space` as CSR -- the assembled-matrix
    view of the stencil operators (PETSc-'aij' analogue), for interop and the
    SpMV benchmark path."""
    M = csr_from_dense(space.mass_dense(), dtype=np.dtype(space.dtype))
    K = csr_from_dense(space.stiffness_dense(), dtype=np.dtype(space.dtype))
    return M, K


def spmv_flops(csr: CSRMatrix) -> int:
    """FLOPs per SpMV (2 per stored nonzero) -- the nnz/s metric hook."""
    return 2 * csr.nnz
