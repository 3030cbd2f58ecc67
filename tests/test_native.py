"""Native host runtime (C++ via ctypes): CSR assembly vs the pure-python/JAX
stencil operators, RCM, partitioning."""

import numpy as np
import pytest

from optimal_control_paradiag_tpu import native
from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.ops.sparse import csr_from_parts

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++ toolchain")


def _interior_dense(indptr, indices, data, N, dim):
    """CSR over all nodes -> dense over interior nodes (Dirichlet elim)."""
    n_all = len(indptr) - 1
    A = np.zeros((n_all, n_all))
    for i in range(n_all):
        for k in range(indptr[i], indptr[i + 1]):
            A[i, indices[k]] += data[k]
    if dim == 1:
        keep = np.arange(1, N)
    else:
        g = np.arange((N + 1) * (N + 1)).reshape(N + 1, N + 1)
        keep = g[1:-1, 1:-1].ravel()
    return A[np.ix_(keep, keep)]


def test_interval_assembly_matches_space():
    N = 13
    indptr, indices, mass, stiff = native.assemble_p1_interval(N)
    sp = make_space(1, N)
    np.testing.assert_allclose(_interior_dense(indptr, indices, mass, N, 1), sp.mass_dense(), atol=1e-14)
    np.testing.assert_allclose(_interior_dense(indptr, indices, stiff, N, 1), sp.stiffness_dense(), atol=1e-12)


def test_triangle_assembly_matches_space():
    N = 7
    pts, tris = native.unit_square_mesh(N, diagonal="left")
    indptr, indices, mass, stiff = native.assemble_p1_triangles(pts, tris)
    sp = make_space(2, N)
    np.testing.assert_allclose(_interior_dense(indptr, indices, mass, N, 2), sp.mass_dense(), atol=1e-13)
    np.testing.assert_allclose(_interior_dense(indptr, indices, stiff, N, 2), sp.stiffness_dense(), atol=1e-12)


def test_csr_spmv_from_native_assembly():
    import jax.numpy as jnp

    N = 9
    pts, tris = native.unit_square_mesh(N)
    indptr, indices, mass, _ = native.assemble_p1_triangles(pts, tris)
    csr = csr_from_parts((len(indptr) - 1, len(indptr) - 1), indptr, indices, mass)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(csr.shape[1])
    got = np.asarray(csr.spmv(jnp.asarray(x)))
    np.testing.assert_allclose(got, csr.todense() @ x, atol=1e-12)


def test_rcm_reduces_bandwidth():
    # random renumbering of a 2D grid graph; RCM should restore a small band
    N = 12
    pts, tris = native.unit_square_mesh(N)
    indptr, indices, mass, _ = native.assemble_p1_triangles(pts, tris)
    n = len(indptr) - 1
    rng = np.random.default_rng(1)
    shuf = rng.permutation(n).astype(np.int32)
    # build shuffled adjacency
    A = np.zeros((n, n), bool)
    for i in range(n):
        for k in range(indptr[i], indptr[i + 1]):
            A[shuf[i], shuf[indices[k]]] = True
    # CSR of shuffled graph
    indptr2 = np.zeros(n + 1, np.int64)
    idx2 = []
    for i in range(n):
        cols = np.nonzero(A[i])[0]
        idx2.extend(cols.tolist())
        indptr2[i + 1] = len(idx2)
    idx2 = np.asarray(idx2, np.int32)

    def bandwidth(ip, ic):
        bw = 0
        for i in range(n):
            for k in range(ip[i], ip[i + 1]):
                bw = max(bw, abs(int(ic[k]) - i))
        return bw

    perm = native.rcm_permutation(indptr2, idx2)
    assert sorted(perm.tolist()) == list(range(n))
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    # permuted bandwidth
    bw_new = 0
    for i in range(n):
        for k in range(indptr2[i], indptr2[i + 1]):
            bw_new = max(bw_new, abs(int(inv[idx2[k]]) - int(inv[i])))
    assert bw_new < bandwidth(indptr2, idx2) / 2


def test_partition_rows_balanced():
    part = native.partition_rows(10, 3)
    counts = np.bincount(part)
    assert counts.tolist() == [4, 3, 3]
    assert (np.diff(part) >= 0).all()  # contiguous blocks
