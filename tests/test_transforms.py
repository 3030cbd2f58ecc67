"""Time/space transform primitives (ops/transforms.py): the four-step
Cooley-Tukey MXU factorizations and the packed two-for-one FFT, pinned
against the numpy fft conventions they replace."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optimal_control_paradiag_tpu.ops.transforms import (
    DstFourStepPlan,
    FourStepPlan,
    dst1_mm4,
    factor_pair,
    time_irfft_conj_mm4,
    time_irfft_conj_packed,
    time_rfft_conj_mm4,
    time_rfft_conj_packed,
)


@pytest.mark.parametrize("N", [16, 81, 64, 12, 1024])
def test_fourstep_time_roundtrip_matches_fft(N):
    rng = np.random.default_rng(N)
    n = 7
    x = rng.standard_normal((2, N, n)).astype(np.float32)
    p = FourStepPlan(N, jnp.float32)
    xi_ref = np.conj(np.fft.rfft(x, axis=1)) / N
    xi = np.asarray(jax.jit(lambda x: time_rfft_conj_mm4(x, p))(jnp.asarray(x)))
    assert np.abs(xi - xi_ref).max() <= 1e-5 * np.abs(xi_ref).max()
    back_ref = np.fft.irfft(np.conj(xi_ref), n=N, axis=1) * N
    back = np.asarray(
        jax.jit(lambda z: time_irfft_conj_mm4(z, p))(jnp.asarray(xi_ref.astype(np.complex64)))
    )
    assert np.abs(back - back_ref).max() <= 1e-5 * np.abs(back_ref).max()


def test_fourstep_rejects_prime():
    with pytest.raises(ValueError):
        FourStepPlan(13, jnp.float32)
    assert factor_pair(13) == (1, 13)


@pytest.mark.parametrize("N", [16, 81, 64, 12])
def test_packed_fft_roundtrip_matches_rfft_pair(N):
    """The two-for-one packing (z = u + i p through one complex FFT) is the
    r5 headline winner; exactness vs the two-rfft convention, odd/even N."""
    rng = np.random.default_rng(N)
    n = 9
    s = rng.standard_normal((2, N, n)).astype(np.float32)
    ref = np.conj(np.fft.rfft(s, axis=1)) / N
    out = np.asarray(jax.jit(lambda s: time_rfft_conj_packed(s, N))(jnp.asarray(s)))
    assert np.abs(out - ref).max() <= 1e-5 * np.abs(ref).max()
    back_ref = np.fft.irfft(np.conj(ref), n=N, axis=1) * N
    back = np.asarray(
        jax.jit(lambda x: time_irfft_conj_packed(x, N))(jnp.asarray(ref.astype(np.complex64)))
    )
    assert np.abs(back - back_ref).max() <= 1e-5 * np.abs(back_ref).max()


@pytest.mark.parametrize("N_x", [8, 9, 80, 10])
def test_fourstep_dst_matches_sine_matrix(N_x):
    n = N_x - 1
    rng = np.random.default_rng(N_x)
    x = rng.standard_normal((3, 5, n)).astype(np.float32)
    i = np.arange(1, N_x)
    V = np.sin(np.pi * np.outer(i, i) / N_x)
    ref = x @ V
    p = DstFourStepPlan(N_x, jnp.float32)
    out = np.asarray(jax.jit(lambda x: dst1_mm4(x, p))(jnp.asarray(x)))
    assert np.abs(out - ref).max() <= 2e-5 * np.abs(ref).max()
