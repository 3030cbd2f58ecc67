"""Experiment: tensor-part mass spectral preconditioner for the 2D
consistent-mass inner solves (sigma M + c K) -- does COCG converge fast,
including at the indefinite-Helmholtz (near-real-negative sigma) modes?"""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

from optimal_control_paradiag_tpu.fem.space import make_space
from optimal_control_paradiag_tpu.paradiag.eigs import circulant_eigs
from optimal_control_paradiag_tpu.krylov.cocg import cocg

for N_x, N_t in ((32, 32), (64, 64), (64, 128), (128, 64)):
    T = 2.0
    dt = T / N_t
    c = 0.5 * dt * dt
    sp = make_space(2, N_x)
    e = circulant_eigs(N_t, dt, 1.0)
    j = np.arange(1, N_x)
    cth = np.cos(np.pi * j / N_x)
    h = 1.0 / N_x
    mt = (h * h / 12.0) * (6 + 2 * cth[:, None] + 2 * cth[None, :] + 2 * np.outer(cth, cth))
    mt = mt.ravel()
    muK = np.asarray(sp.spectrum[1], np.float64)

    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((N_t, sp.n)) + 1j * rng.standard_normal((N_t, sp.n)))
    mtj = jnp.asarray(mt)[None, :]
    muKj = jnp.asarray(muK)[None, :]
    sig = jnp.asarray(np.asarray(e.Sigma1))[:, None]

    def A(w):
        return sig * sp.apply_mass(w) + c * sp.apply_stiffness(w)

    def pinv(r):
        return sp.idst(sp.dst(r) / (sig * mtj + c * muKj))

    def pinv_lumped(r):
        return sp.idst(sp.dst(r) / (sig * (h * h) + c * muKj))

    for name, M in (("tensor", pinv), ("lumped", pinv_lumped)):
        t0 = time.time()
        x, it = cocg(A, rhs, M=M, dot_axes=(-1,), tol=1e-11, maxiter=300)
        x.block_until_ready()
        r = np.asarray(A(x) - rhs)
        rel = np.linalg.norm(r, axis=1) / np.linalg.norm(np.asarray(rhs), axis=1)
        print(f"N_x={N_x} N_t={N_t} {name}: iters={int(it)} max_rel={rel.max():.2e} "
              f"worst_mode={rel.argmax()} time={time.time()-t0:.1f}s")
