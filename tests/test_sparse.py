"""CSR/ELL sparse layer: construction, SpMV vs dense, batched rhs, FEM
matrices round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.ops.sparse import (
    csr_from_dense,
    space_matrices_csr,
    spmv_flops,
)


def test_csr_roundtrip_and_spmv():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((12, 9))
    A[np.abs(A) < 1.0] = 0.0
    csr = csr_from_dense(A)
    np.testing.assert_allclose(csr.todense(), A)
    x = rng.standard_normal(9)
    np.testing.assert_allclose(np.asarray(csr.spmv(jnp.asarray(x))), A @ x, atol=1e-12)
    assert spmv_flops(csr) == 2 * csr.nnz


def test_spmv_batched():
    rng = np.random.default_rng(1)
    A = np.triu(rng.standard_normal((8, 8)))
    csr = csr_from_dense(A)
    X = rng.standard_normal((3, 5, 8))
    got = np.asarray(csr.spmv(jnp.asarray(X)))
    np.testing.assert_allclose(got, X @ A.T, atol=1e-12)


@pytest.mark.parametrize("dim", [1, 2])
def test_space_matrices_csr_match_stencils(dim):
    sp = make_space(dim, 6)
    M, K = space_matrices_csr(sp)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(sp.n)
    np.testing.assert_allclose(
        np.asarray(M.spmv(jnp.asarray(x))), np.asarray(sp.apply_mass(jnp.asarray(x))), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(K.spmv(jnp.asarray(x))), np.asarray(sp.apply_stiffness(jnp.asarray(x))), atol=1e-12
    )
    assert M.width <= 3**dim


def test_empty_rows():
    A = np.zeros((4, 4))
    A[1, 2] = 3.0
    csr = csr_from_dense(A)
    x = jnp.asarray(np.ones(4))
    np.testing.assert_allclose(np.asarray(csr.spmv(x)), A @ np.ones(4))
