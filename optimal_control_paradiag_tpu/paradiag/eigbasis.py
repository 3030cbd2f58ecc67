"""Generalized-eigenbasis ParaDiag: the DIRECT unstructured solve.

The structured families solve the all-at-once system directly because the
sine transform diagonalizes (M, K) simultaneously; general meshes have no
fast transform, and every iterative route through the block-circulant part
inherits the plain-circulant outlier growth of non-commuting (M, K)
(measured on the perturbed-mesh problem at N_t = 64, rtol 1e-5:
119 / 187 / 284 outer iterations for n = 529 / 961 / 2209 -- growing like
``dt^2 lambda_max``; the unpreconditioned SMW capacity system is no better,
150 iterations at n = 961, because its spectrum is the same boundary-
correction outlier set. The reference's MUMPS inner solves would iterate
identically: the outer operator is the algorithm's, not the solver's).

The TPU-native escape generalizes the sine basis itself: compute the
generalized eigendecomposition of the pencil ONCE,

    K V = M V diag(lam),     V^T M V = I,

and the whole exact spectral machinery (paradiag/spectral.py: per-mode
2x2 Cramer, rank-4 SMW with closed-form 4x4 capacities) applies verbatim
with ``(muM, muK) = (1, lam)`` -- a DIRECT solve, zero inner iterations.
The residual-side transform is ``V^T`` and the solution-side transform is
``V`` (they are mutual inverses only through M; the pipeline applies each
exactly once per direction, matching its dst/idst call sites). On TPU both
transforms are dense MXU matmuls -- the same shape as the matmul-DST the
structured headline already runs; the one-time eigendecomposition is itself
an MXU job (`jnp.linalg.eigh` after a Cholesky congruence).

Accuracy: a float32 eigendecomposition is a ~1e-5-relative perturbation of
the pencil, so the eig-Woodbury apply is the EXACT inverse of a nearby
operator: used as a left preconditioner for outer GMRES on the true
operator (with the cancellation-aware element-form matvec,
``GeneralP1Space.apply_stiffness_nested``) it converges in a handful of
mesh-independent iterations; in float64 the apply is direct to rounding.

The reference meets the any-mesh capability only by factorizing with MUMPS
(``Control_Wave_PC.py:480-484``), one triangular-solve pipeline per RHS;
here setup is one eigh and every subsequent solve is a few dense matmuls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from optimal_control_paradiag_tpu.ops.allatonce import AllAtOnceOperator
from optimal_control_paradiag_tpu.utils.constants import host_const, to_device


def pencil_eig_host(M: np.ndarray, K: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(lam, V) of ``K V = M V diag(lam)`` with ``V^T M V = I``, float64 on
    host via the Cholesky congruence (numpy-only; the small/test path)."""
    M = np.asarray(M, np.float64)
    K = np.asarray(K, np.float64)
    L = np.linalg.cholesky(M)
    X = np.linalg.solve(L, K)
    S = np.linalg.solve(L, X.T).T
    S = 0.5 * (S + S.T)
    lam, Q = np.linalg.eigh(S)
    V = np.linalg.solve(L.T, Q)
    return lam, V


def pencil_eig_torch(M: np.ndarray, K: np.ndarray, f32: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """(lam, V) via torch's multithreaded LAPACK on host -- the fallback
    when the device eigh's remote compile is impractical (axon relay) and
    float64 numpy is too slow (measured on the 2-core gate host at n=4096:
    torch f32 3.2 s vs numpy f64 6.8 s; ~6.5 min extrapolated at n=2e4)."""
    import torch

    td = torch.float32 if f32 else torch.float64
    Mt = torch.from_numpy(np.ascontiguousarray(M, np.float32 if f32 else np.float64)).to(td)
    Kt = torch.from_numpy(np.ascontiguousarray(K, np.float32 if f32 else np.float64)).to(td)
    L = torch.linalg.cholesky(Mt)
    X = torch.linalg.solve_triangular(L, Kt, upper=False)
    S = torch.linalg.solve_triangular(L, X.T, upper=False).T
    S = 0.5 * (S + S.T)
    lam, Q = torch.linalg.eigh(S)
    V = torch.linalg.solve_triangular(L.T, Q, upper=True)
    return lam.numpy().astype(np.float64), V.numpy()


def pencil_eig_device(M: np.ndarray, K: np.ndarray, dtype) -> Tuple[np.ndarray, jnp.ndarray]:
    """(lam, V) computed ON DEVICE (one jitted program: Cholesky +
    triangular congruence + ``jnp.linalg.eigh`` -- all MXU work). The
    large-n path: at n = 2e4 the host float64 route costs tens of minutes
    on 2 cores, the TPU float32 route minutes. Returns ``lam`` as float64
    numpy (for the host capacity math) and ``V`` as a device array."""
    Md = to_device(np.asarray(M, np.float64), dtype)
    Kd = to_device(np.asarray(K, np.float64), dtype)

    @jax.jit
    def go(Mx, Kx):
        L = jnp.linalg.cholesky(Mx)
        X = jax.lax.linalg.triangular_solve(
            L, Kx, left_side=True, lower=True, transpose_a=False
        )
        S = jax.lax.linalg.triangular_solve(
            L, X.T, left_side=True, lower=True, transpose_a=False
        ).T
        S = 0.5 * (S + S.T)
        lam, Q = jnp.linalg.eigh(S)
        V = jax.lax.linalg.triangular_solve(
            L, Q, left_side=True, lower=True, transpose_a=True
        )
        return lam, V

    lam, V = go(Md, Kd)
    return np.asarray(lam, np.float64), V


@dataclasses.dataclass(frozen=True)
class EigBasisSpace:
    """Duck-typed diagonalizable 'space' over a general mesh: delegates the
    physical operators to the underlying CSR space and supplies the
    eigenbasis transforms + spectrum the spectral/Woodbury machinery needs
    (``paradiag.spectral._spectral_plan`` consumes ``spectrum``/``dst``/
    ``idst``/``dtype``; the residual-side transform is V^T, the
    solution-side V -- see module docstring)."""

    base: object  # GeneralP1Space (or any space with apply_mass/_stiffness)
    lam: np.ndarray  # (n,) float64 generalized eigenvalues
    V: jnp.ndarray  # (n, n) device array, columns M-orthonormal
    # Basis provenance, for Richardson step auto-selection ('f64' host
    # LAPACK: direct at 0 steps; 'f32' LAPACK-grade: floors in 2;
    # 'f32_sdc' device divide-and-conquer: contracts ~0.18/step, floors
    # in 8 -- measured ladder at n=20449, paradiag/sdc.py docstring).
    quality: str = "f32"

    @property
    def dim(self) -> int:
        return self.base.dim

    @property
    def n(self) -> int:
        return self.base.n

    @property
    def dtype(self):
        return self.base.dtype

    diagonalizable: bool = True

    @property
    def spectrum(self):
        ones = np.ones(self.base.n)
        return (host_const(ones, self.dtype), host_const(self.lam, self.dtype))

    # physical-side operators delegate to the true space
    def apply_mass(self, x):
        return self.base.apply_mass(x)

    def apply_stiffness(self, x):
        return self.base.apply_stiffness(x)

    def apply_stiffness_nested(self, x):
        return self.base.apply_stiffness_nested(x)

    def apply_mass_host_f64(self, x):
        return self.base.apply_mass_host_f64(x)

    def apply_stiffness_host_f64(self, x):
        return self.base.apply_stiffness_host_f64(x)

    def interpolate(self, fn):
        return self.base.interpolate(fn)

    @property
    def coords(self):
        return self.base.coords

    def _mm(self, x: jnp.ndarray, transpose: bool) -> jnp.ndarray:
        eq = "...n,nj->...j" if transpose else "...j,nj->...n"
        hi = jax.lax.Precision.HIGHEST
        if jnp.iscomplexobj(x):
            return jax.lax.complex(
                jnp.einsum(eq, x.real, self.V, precision=hi),
                jnp.einsum(eq, x.imag, self.V, precision=hi),
            )
        return jnp.einsum(eq, x, self.V, precision=hi)

    def dst(self, x: jnp.ndarray) -> jnp.ndarray:
        """Residual-side transform ``V^T x`` (the eigenbasis analogue of the
        sine transform on the dual side)."""
        return self._mm(x, transpose=True)

    def idst(self, x: jnp.ndarray) -> jnp.ndarray:
        """Solution-side transform ``V x``."""
        return self._mm(x, transpose=False)


def build_eig_basis(space, method: str = "auto") -> EigBasisSpace:
    """Compute the pencil eigenbasis of a general space.

    ``method``: 'host' (float64 numpy; exact-to-rounding, O(n^3) on 2 cores
    -- the test/small path), 'device' (float32 TPU eigh -- one MXU program;
    pays a remote compile on the axon relay), 'torch' (float32 host via
    torch's multithreaded LAPACK), 'sdc' (blocked spectral
    divide-and-conquer ON DEVICE, paradiag/sdc.py -- small static-shape
    programs, so it scales past the monolithic eigh's compile wall: the
    at-scale TPU path, minutes at n=2e4 vs ~67 min for host torch), 'auto'
    (host below n=1500; above: sdc on a TPU backend, else torch)."""
    n = space.n
    if method == "auto":
        if n <= 1500:
            method = "host"
        else:
            import jax as _jax

            method = "sdc" if _jax.default_backend() == "tpu" else "torch"
    if method == "torch":
        try:
            import torch  # noqa: F401
        except ImportError:
            import warnings

            warnings.warn(
                "torch is not installed (optional extra "
                "'optimal_control_paradiag_tpu[torch]'); falling back to the "
                "single-threaded numpy float64 pencil eigh, which is several "
                "times slower at this size",
                stacklevel=2,
            )
            method = "host"
    M = space.mass_dense()
    K = space.stiffness_dense()
    if method == "host":
        lam, V = pencil_eig_host(M, K)
        Vd = to_device(V, space.dtype)
        quality = "f64" if jnp.dtype(space.dtype).itemsize == 8 else "f32"
    elif method == "torch":
        lam, V = pencil_eig_torch(M, K, f32=jnp.dtype(space.dtype).itemsize == 4)
        Vd = to_device(V, space.dtype)
        quality = "f32"
    elif method == "device":
        lam, Vd = pencil_eig_device(M, K, space.dtype)
        quality = "f32"
    elif method == "sdc":
        from optimal_control_paradiag_tpu.paradiag.sdc import pencil_eig_sdc

        lam, Vd = pencil_eig_sdc(M, K, space.dtype)
        quality = "f32_sdc"
    else:
        raise ValueError(f"unknown eig method {method!r}")
    return EigBasisSpace(base=space, lam=lam, V=Vd, quality=quality)


def default_richardson_steps(basis: "EigBasisSpace") -> int:
    """Step count that reaches each basis grade's accuracy floor (see
    EigBasisSpace.quality)."""
    return {"f64": 0, "f32": 2}.get(getattr(basis, "quality", "f32_sdc"), 8)


def save_eig_basis(path: str, basis: EigBasisSpace) -> str:
    """Persist the pencil eigenbasis (the expensive setup artifact -- the
    analogue of a saved MUMPS factorization, which the reference recomputes
    every run): ``load_eig_basis`` restores it in seconds for any number of
    later solves on the same mesh."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(path, lam=basis.lam, V=np.asarray(basis.V))
    return path


def load_eig_basis(path: str, space) -> EigBasisSpace:
    """Restore a basis saved by :func:`save_eig_basis` onto ``space`` (must
    be the same mesh/dtype discretization; checked by shape)."""
    z = np.load(path)
    lam, V = np.asarray(z["lam"], np.float64), z["V"]
    if V.shape != (space.n, space.n):
        raise ValueError(
            f"basis shape {V.shape} does not match space n={space.n}"
        )
    return EigBasisSpace(base=space, lam=lam, V=to_device(V, space.dtype))


def build_eig_woodbury_solver(
    op: AllAtOnceOperator,
    basis: Optional[EigBasisSpace] = None,
    *,
    refine: int = 1,
    eig_method: str = "auto",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Direct solver ``b -> x`` for the all-at-once system on a GENERAL
    mesh: the rank-4 half-spectrum Woodbury (paradiag/spectral.py) over the
    pencil eigenbasis. Exact to the quality of the eigendecomposition
    (float64 host basis: direct to rounding; float32 device basis: the
    exact inverse of a ~1e-5-perturbed operator -- wrap in outer GMRES, see
    :func:`build_eig_gmres_solver`)."""
    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    sp = op.space
    if sp.diagonalizable:
        raise ValueError("sine-diagonalizable space: use the spectral Woodbury directly")
    if basis is None:
        basis = build_eig_basis(sp, method=eig_method)
    op_eig = dataclasses.replace(op, space=basis)
    return build_woodbury_solver(op_eig, refine=refine)


def build_eig_direct_solver(
    op: AllAtOnceOperator,
    basis: Optional[EigBasisSpace] = None,
    *,
    steps: int = 2,
    eig_method: str = "auto",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Richardson form of the unstructured direct solve: ``x = W b`` plus
    ``steps`` defect corrections ``x += W (b - A_acc x)`` with the
    cancellation-aware matvec. With a float32 basis the correction
    contracts in ONE step (measured n=2209, N_t=64: rel_f64 5.5e-4 -> 7.9e-6
    at k=1, converged); float64 bases are exact at k=0.

    Exists alongside :func:`build_eig_gmres_solver` because its compiled
    program is structurally identical to the headline Woodbury+refine
    solves -- matmuls, stencils, elementwise -- with no Krylov while-loop:
    the shape that compiles reliably through the axon relay at the
    n=2e4 wall size (the GMRES program's remote compile broke the tunnel
    twice there, r4)."""
    W = build_eig_woodbury_solver(op, basis, refine=0, eig_method=eig_method)

    def solve(b: jnp.ndarray) -> jnp.ndarray:
        x = W(b)
        for _ in range(steps):
            x = x + W(b - op.matvec_accurate(x))
        return x

    return solve


def build_eig_direct_fn(
    op: AllAtOnceOperator,
    basis: EigBasisSpace,
    *,
    steps: int = 2,
    with_residual: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Argument-form Richardson solve: returns ``fn(b, V) -> x`` with the
    basis matrix an EXPLICIT argument. Required at large n: jax embeds
    closed-over device arrays as program CONSTANTS at lowering (measured at
    n=20449: a 3.35 GB StableHLO module whose compile RPC breaks the axon
    relay -- r4 wall-stage bisect), while explicit arguments lower as
    executable parameters. Jit ``fn`` itself and pass ``basis.V`` each
    call; do NOT close over the result inside another jit (that re-embeds
    V). The closure-form :func:`build_eig_direct_solver` stays the
    convenient small-n API.

    ``with_residual``: also return the a-posteriori relative residual
    ``||b - A x|| / ||b||`` measured with the cancellation-aware matvec --
    one extra accurate matvec, so the fixed-step Richardson solve carries a
    convergence certificate instead of being silently trusted (the solve is
    NOT adaptive: rtol/maxiter semantics do not apply to it)."""
    import dataclasses as _dc

    from optimal_control_paradiag_tpu.paradiag.spectral import build_woodbury_solver

    def fn(b: jnp.ndarray, V: jnp.ndarray):
        ad = _dc.replace(basis, V=V)
        op_eig = _dc.replace(op, space=ad)
        W = build_woodbury_solver(op_eig, refine=0)
        x = W(b)
        for _ in range(steps):
            x = x + W(b - op.matvec_accurate(x))
        if with_residual:
            r = b - op.matvec_accurate(x)
            rel = jnp.linalg.norm(r.reshape(-1)) / jnp.linalg.norm(b.reshape(-1))
            return x, rel
        return x

    return fn


def build_eig_gmres_solver(
    op: AllAtOnceOperator,
    basis: Optional[EigBasisSpace] = None,
    *,
    rtol: float = 1e-10,
    maxiter: int = 40,
    eig_method: str = "auto",
    with_result: bool = False,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Mesh-independent unstructured solve: GMRES on the TRUE operator
    (cancellation-aware element-form matvec in float32) left-preconditioned
    by the EXACT eig-Woodbury direct solve -- the unstructured twin of the
    2D-consistent ``build_tensor_gmres_solver``. With a float64 host basis
    the preconditioner is the exact inverse (1 iteration); with a float32
    device basis the iteration count is set by the eigendecomposition
    residual, a mesh-independent handful."""
    from optimal_control_paradiag_tpu.krylov.gmres import gmres

    W = build_eig_woodbury_solver(op, basis, refine=0, eig_method=eig_method)
    f32 = jnp.dtype(op.space.dtype).itemsize == 4
    mv = op.matvec_accurate if f32 else op.matvec

    def solve(b: jnp.ndarray):
        res = gmres(mv, b, M=W, restart=maxiter, rtol=rtol, maxiter=maxiter)
        return (res.x, res) if with_result else res.x

    return solve
