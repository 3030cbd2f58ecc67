"""The reference's ``mat_test.ipynb`` verifications as proper unit tests:
circulant eigenvalues reproduce the time stencils under FFT conjugation,
S S* = 2I, and the 2x2 diagonalization identity Lambda S = S Sigma
(recorded residual ~1.6e-16 in the notebook; see BASELINE.md)."""

import numpy as np
import pytest

from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs, mode_block_matrix


def circulant(first_col):
    N = len(first_col)
    C = np.zeros((N, N))
    for i in range(N):
        for j in range(N):
            C[i, j] = first_col[(i - j) % N]
    return C


@pytest.mark.parametrize("N_t", [5, 8, 12])
def test_fft_conjugation_reproduces_circulant_stencils(N_t):
    """fft o diag(Lambda) o ifft == circulant([1,-2,1]) / circulant([1,0,1])
    (the reference notebook's cells 5-9, to ~1e-15)."""
    e = circulant_eigs(N_t, dt=0.1, gamma=1.0)
    for Lam, col in (
        (e.Lambda1, [1.0, -2.0, 1.0] + [0.0] * (N_t - 3)),
        (e.Lambda2, [1.0, 0.0, 1.0] + [0.0] * (N_t - 3)),
    ):
        X = np.fft.fft(Lam[:, None] * np.fft.ifft(np.eye(N_t), axis=0), axis=0)
        np.testing.assert_allclose(X.real, circulant(col), atol=1e-12)
        np.testing.assert_allclose(X.imag, 0.0, atol=1e-12)


@pytest.mark.parametrize("N_t", [5, 8, 12, 81])
def test_transpose_stencil_gets_conjugate_eigenvalues(N_t):
    """The adjoint (backward-in-time) stencil is the transposed circulant,
    whose eigenvalues under the same conjugation are conj(Lambda)."""
    e = circulant_eigs(N_t, dt=0.1, gamma=1.0)
    C1 = circulant([1.0, -2.0, 1.0] + [0.0] * (N_t - 3))
    X = np.fft.fft(np.conj(e.Lambda1)[:, None] * np.fft.ifft(np.eye(N_t), axis=0), axis=0)
    np.testing.assert_allclose(X.real, C1.T, atol=1e-12)


@pytest.mark.parametrize("N_t,dt,gamma", [(5, 0.4, 1.0), (81, 2 / 81, 1.0), (16, 0.125, 0.5)])
def test_closed_form_diagonalization(N_t, dt, gamma):
    """S has unit off-diagonal magnitudes, S S* = 2I (notebook cell 2), and
    Lambda(k) S(k) = S(k) diag(Sigma_1, Sigma_2) (notebook cells 11-12)."""
    e = circulant_eigs(N_t, dt, gamma)
    np.testing.assert_allclose(np.abs(e.S1), 1.0, atol=1e-12)
    np.testing.assert_allclose(e.Sigma2, np.conj(e.Sigma1), atol=1e-12)
    worst = 0.0
    for k in range(N_t):
        S = np.array([[1.0, e.S2[k]], [e.S1[k], 1.0]])
        np.testing.assert_allclose(S @ S.conj().T, 2 * np.eye(2), atol=1e-12)
        Lam = mode_block_matrix(e, k)
        Sig = np.diag([e.Sigma1[k], e.Sigma2[k]])
        worst = max(worst, np.linalg.norm(Lam @ S - S @ Sig))
    # Modes with Lambda_2 ~ 0 (N_t divisible by 4) blow the identity up in the
    # reference too; exclude them the same way the net operator avoids them.
    if N_t % 4 != 0:
        assert worst < 1e-10


def test_sinv_is_half_adjugate():
    e = circulant_eigs(7, 0.3, 1.0)
    (s11, s12), (s21, s22) = e.mix_matrices()[1]
    for k in range(7):
        S = np.array([[1.0, e.S2[k]], [e.S1[k], 1.0]])
        Sinv = np.array([[s11[k], s12[k]], [s21[k], s22[k]]])
        np.testing.assert_allclose(S @ Sinv, np.eye(2), atol=1e-12)


def test_m1_is_real():
    """Lambda_1/Lambda_2 is real: -2 sin^2(pi k/N)/cos(2 pi k/N) (SURVEY 0.3)."""
    e = circulant_eigs(10, 0.2, 1.0)
    m1 = e.Lambda1 / e.Lambda2
    np.testing.assert_allclose(m1.imag, 0.0, atol=1e-12)


def test_gamma_form_of_eigenvalues():
    """The reference's abandoned PC draft writes the per-mode eigenvalues as
    Sigma = Lambda_1/Lambda_2 +- i*Gamma with Gamma = dt^2/(sqrt(gamma)
    |Lambda_2|) (``pre_cond.py:32-38``). Our closed-form Sigma_1, Sigma_2
    (``paradiag/eigs.py``) are exactly that pair (branch of the sqrt decides
    which sign goes to which), conjugates of each other."""
    for N_t, dt, gamma in [(7, 0.3, 1.0), (9, 0.1, 0.5), (12, 0.25, 2.0)]:
        e = circulant_eigs(N_t, dt, gamma)
        # Lambda_2 = 0 modes (N_t divisible by 4): Gamma blows up, the eig
        # route loses digits too -- the fulldiag/Woodbury paths avoid the
        # division entirely. Exclude, as the neighboring tests do.
        ok = np.abs(e.Lambda2) > 1e-8
        m1 = (e.Lambda1 / e.Lambda2).real
        Gamma = dt**2 / np.sqrt(gamma) / np.abs(e.Lambda2)
        plus, minus = m1 + 1j * Gamma, m1 - 1j * Gamma
        d1 = np.minimum(np.abs(e.Sigma1 - plus), np.abs(e.Sigma1 - minus))
        assert float(d1[ok].max()) < 1e-12
        np.testing.assert_allclose(e.Sigma2[ok], np.conj(e.Sigma1[ok]), atol=1e-13)
