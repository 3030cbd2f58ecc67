"""GMRES unit tests: real/complex correctness vs dense solve, restart path,
exact-preconditioner one-step convergence, residual history monotonicity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optimal_control_paradiag_tpu.krylov.gmres import gmres


def _random_system(n, dtype, seed=0, diag_boost=2.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    if np.issubdtype(dtype, np.complexfloating):
        A = A + 1j * rng.standard_normal((n, n))
    A = A / np.linalg.norm(A, 2) + diag_boost * np.eye(n)
    b = rng.standard_normal(n).astype(np.float64)
    if np.issubdtype(dtype, np.complexfloating):
        b = b + 1j * rng.standard_normal(n)
    return jnp.asarray(A, dtype), jnp.asarray(b, dtype)


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_gmres_solves_dense_system(dtype):
    A, b = _random_system(40, np.dtype(dtype))
    res = gmres(lambda v: A @ v, b, restart=40, rtol=1e-12, maxiter=200)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-9)
    assert bool(res.converged)


def test_gmres_with_restart():
    A, b = _random_system(50, np.dtype(np.float64), seed=1)
    res = gmres(lambda v: A @ v, b, restart=7, rtol=1e-10, maxiter=500)
    x_ref = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-7)
    assert int(res.iterations) > 7  # exercised the restart path


def test_exact_preconditioner_converges_immediately():
    A, b = _random_system(30, np.dtype(np.float64), seed=2)
    Ainv = jnp.asarray(np.linalg.inv(np.asarray(A)))
    res = gmres(lambda v: A @ v, b, M=lambda v: Ainv @ v, restart=30, rtol=1e-10)
    assert int(res.iterations) <= 2
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(np.asarray(A), np.asarray(b)), atol=1e-8
    )


def test_residual_history_and_monitor():
    A, b = _random_system(25, np.dtype(np.float64), seed=3)
    res = gmres(lambda v: A @ v, b, restart=25, rtol=1e-10, maxiter=100)
    it = int(res.iterations)
    hist = np.asarray(res.residual_history)
    assert np.all(np.isfinite(hist[: it + 1]))
    assert np.all(np.isnan(hist[it + 1 :]))
    # converged: final recorded residual below rtol * initial
    assert hist[it] <= 1e-10 * hist[0] + 1e-30


def test_gmres_is_jittable():
    A, b = _random_system(20, np.dtype(np.float64), seed=4)

    @jax.jit
    def run(bb):
        return gmres(lambda v: A @ v, bb, restart=20, rtol=1e-10).x

    np.testing.assert_allclose(
        np.asarray(run(b)), np.linalg.solve(np.asarray(A), np.asarray(b)), atol=1e-8
    )


def test_zero_rhs():
    A, b = _random_system(10, np.dtype(np.float64), seed=5)
    res = gmres(lambda v: A @ v, jnp.zeros_like(b), restart=10)
    assert int(res.iterations) == 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_restart_memory_clamp():
    """The padded Krylov basis is auto-clamped to the memory budget with a
    warning; small problems pass through untouched (VERDICT r3 item 6)."""
    import warnings as _w

    from optimal_control_paradiag_tpu.krylov.gmres import clamp_restart

    # small state: no clamp, no warning
    with _w.catch_warnings():
        _w.simplefilter("error")
        assert clamp_restart(300, (2, 16, 15), jnp.float32, 1000) == 300
    # headline-size f32 state: 300 would need ~5 GB; clamped under 4 GB
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        r = clamp_restart(300, (2, 1024, 2047), jnp.float32, 1000)
        assert r < 300 and (r + 1) * 2 * 1024 * 2047 * 4 <= 4e9
        assert rec and "clamping" in str(rec[0].message)
    # end-to-end: the solve still runs with the requested-but-clamped restart
    A = jnp.eye(8) * 2.0
    res = gmres(lambda v: A @ v, jnp.ones(8), restart=300, rtol=1e-12, maxiter=50)
    assert bool(res.converged)
