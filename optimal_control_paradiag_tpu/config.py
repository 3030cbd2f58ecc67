"""Configuration dataclasses.

Replaces the reference's module-level constants and PETSc option dicts
(``Control_Wave_PC.py:335-359``) and the global-variable channel into the
preconditioner (``Control_Wave_PC.py:361-372``): here every component receives
an explicit, immutable config.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Discretization of the wave-equation optimal-control problem.

    Mirrors ``Optimal_Control_Wave_Equation.__init__`` (reference
    ``Control_Wave_PC.py:15-45``): unit interval/square, P1 elements,
    ``dt = T / N_t``, all-at-once unknown ``(u, p)`` with ``N_t`` time slices.

    Attributes:
      N_x: number of spatial elements per dimension (``UnitIntervalMesh(N_x)``
        / ``UnitSquareMesh(N_x, N_x)``, ref ``:16-19``).
      N_t: number of time slices in the all-at-once system (ref ``:26``).
      T: final time (ref ``:21``).
      gamma: control regularization coefficient (ref ``:23``).
      dim: spatial dimension, 1 or 2 (ref ``:27``).
      scaled: sqrt(gamma) rescaling of the state ("pc" mode, ref ``:56-57,
        78-80``); required by the ParaDiag preconditioner's unitary
        diagonalization. The latent reference quirk at ``:138`` (extra
        sqrt(gamma) on the final u-row stiffness) is deliberately NOT
        replicated; invisible at the default gamma=1.
      mass: 'consistent' P1 mass matrix or 'lumped' (row-sum) mass. Lumped is
        the 2D fast path (sine-transform-diagonalizable); 1D is exactly
        diagonalizable either way.
      dtype: real floating dtype for the outer (real-arithmetic) system; the
        preconditioner uses the matching complex dtype internally.
      dst_precision: MXU precision of the matmul-DST ('highest' default =
        f32-accurate 6-pass bf16; 'high' = 3-pass bf16x3, ~2x cheaper
        matmuls). 'high' is only valid combined with polish>=1 -- alone its
        transform rounding wrecks the direct solve (measured rel 0.129 at
        the headline size); with one polish pass it is the FASTEST
        floor-accurate config (4.06 ms vs 4.95, v5e) -- see fem/space.py.
    """

    N_x: int
    N_t: int
    T: float = 2.0
    gamma: float = 1.0
    dim: int = 1
    scaled: bool = True
    mass: str = "consistent"
    dtype: Any = jnp.float64
    dst_precision: str = "highest"
    # Sine-transform algorithm (fem/space.py): 'auto' (dense MXU matmul up
    # to the 64 MB matrix budget, then fft), 'matmul', 'fft', or 'mxu4'
    # (r5: the odd-extension four-step MXU factorization -- O(N_x^1.5)
    # flops per row, exact to f32 rounding; the headline fast path).
    dst_method: str = "auto"

    def __post_init__(self):
        if self.dim not in (1, 2):
            raise ValueError(f"dim must be 1 or 2, got {self.dim}")
        if self.mass not in ("consistent", "lumped"):
            raise ValueError(f"mass must be 'consistent' or 'lumped', got {self.mass}")
        if self.N_x < 2 or self.N_t < 3:
            raise ValueError("need N_x >= 2 and N_t >= 3")
        if self.dst_precision not in ("highest", "high"):
            raise ValueError(f"dst_precision must be 'highest' or 'high', got {self.dst_precision}")
        if self.dst_method not in ("auto", "matmul", "fft", "mxu4"):
            raise ValueError(
                f"dst_method must be auto/matmul/fft/mxu4, got {self.dst_method}"
            )

    @property
    def dt(self) -> float:
        """Time step ``T / N_t`` (ref ``Control_Wave_PC.py:24``)."""
        return self.T / self.N_t

    @property
    def complex_dtype(self):
        return jnp.result_type(self.dtype, jnp.complex64)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Outer Krylov + preconditioner options.

    Mirrors the PETSc parameter dicts: the ParaDiag GMRES path
    (``Control_Wave_PC.py:346-359``: gmres, restart 300, max_it 1000) and the
    direct-LU baseline (``:186``). PETSc KSP defaults reproduced: left
    preconditioning, rtol 1e-5 on the preconditioned residual norm.

    Attributes:
      method: 'gmres' | 'minres' (symmetrized ParaDiag: block-row-swapped
        exactly-symmetric system + scalar absolute-value-circulant SPD
        preconditioner; see paradiag/symmetric.py) | 'direct' (dense LU
        baseline, the analogue of the reference's MUMPS path) | 'spectral'
        (GMRES in the ParaDiag-diagonalized coordinates: D + 4-slice
        boundary correction, the float32-stable fast path) | 'woodbury'
        (DIRECT solve of the same diagonalized system via the rank-4
        Sherman-Morrison-Woodbury identity -- no Krylov iteration; see
        paradiag/spectral.py). On non-sine-diagonalizable spaces 'woodbury'
        keeps the direct-solve contract through exact-surrogate GMRES:
        structured 2D consistent mass uses the tensor-mass Woodbury PC
        (paradiag/woodbury2d.py, ~1-8 iterations mesh-independent);
        UNSTRUCTURED meshes use the generalized-eigenbasis Woodbury PC
        (paradiag/eigbasis.py: one pencil eigh at build time -- seconds to
        n~3e3, tens of minutes at n~2e4 on a small host; persist it with
        eigbasis.save_eig_basis -- then 1-2 iterations per solve).
      pc: 'paradiag' | None.
      pc_variant: 'fulldiag' (sine-transform full diagonalization; TPU fast
        path, exact same operator, robust near ``Lambda_2 = 0``) or 'eig'
        (per-mode 2x2 eigen-decoupling mirroring the reference math,
        ``Control_Wave_PC.py:414-437``, with closed-form S/Sigma) or
        'blockline' (coupled per-mode block-Thomas structured DIRECT solve
        over grid lines, half-spectrum -- the scalable exact 2D
        consistent-mass path; auto default there) or 'blockband' (RCM-banded
        level-Thomas DIRECT solve for UNSTRUCTURED meshes past blockdense's
        wall -- the general-mesh MUMPS analogue; auto default there) or
        'blockdense' (per-mode dense inverses -- exact but memory-bound;
        cross-check oracle) or 'block' (coupled per-mode 2x2-block COCG with
        tensor-mass spectral preconditioning -- memory-free best-effort
        beyond blockline's cap).
      inner: per-mode inner solver for the 'eig' variant: 'auto' (pick the
        right one: spectral when diagonalizable, blockline/blockdense direct
        for non-diagonalizable spaces when their factors fit, COCG
        otherwise), 'dst', 'tridiag_thomas', 'tridiag_pcr' (1D), 'cocg'
        (structured tensor-mass-preconditioned), or 'cocg_jacobi'
        (unstructured meshes; Jacobi-preconditioned).
      pc_side: 'left' (PETSc default, preconditioned-residual convergence)
        or 'right' (convergence measured on the unpreconditioned residual).
        Float32 note (measured, tests/test_float32.py): in float32 at large
        N_t NEITHER side of physical-coordinate GMRES is reliable -- left
        stalls ~10x above the rounding floor and right's recurrence-based
        residual estimate drifts from the true residual (claims 2e-3 while
        the float64 oracle shows ~3e-2). The float32-stable path is
        method='spectral' or 'woodbury' (paradiag/spectral.py), which reach
        the rounding floor.
      restart: GMRES restart length (ref ``:351``).
      rtol: relative tolerance on the (preconditioned) residual norm.
      atol: absolute tolerance.
      maxiter: outer-iteration cap (ref ``:356``).
      inner_tol / inner_maxiter: for iterative inner mode solves (2D
        consistent-mass path); ignored by direct inner solves.
      refine: iterative-refinement (defect-correction) steps for the
        'woodbury' direct method; each costs one exact operator apply plus
        one Woodbury apply and polishes float32 rounding -- in SPECTRAL
        coordinates, so it cannot see the final inverse-transform rounding
        (its float32 accuracy ceiling is ~7e-4 at the headline size).
      polish: PHYSICAL-space defect-correction steps appended to the
        'woodbury' method (any variant: jnp, Pallas, 2D consistent SMW).
        Each step measures the defect with the cancellation-aware stencil
        matvec and re-solves, landing the float32 true residual on the
        float32 representation floor (~4e-4 at the headline size -- the
        best any float32 vector can do; measured, tests/test_float32.py).
        Cost: ~2x a refine step. For accuracy BELOW the floor use
        ``paradiag.spectral.build_polished_solver(dword=True)`` directly,
        which returns the solution as a two-float sum (6.6e-8 at polish=2).
    """

    method: str = "gmres"
    pc: Optional[str] = "paradiag"
    pc_variant: str = "fulldiag"
    inner: str = "auto"
    pc_side: str = "left"
    # use_pallas: method='woodbury' only -- run the fused full-solve Pallas
    # kernel (paradiag/pallas_woodbury.py; measured faster than the jnp path
    # on v5e: 2.368 vs 2.414 ms at N_x=2048/N_t=1024 f32). An earlier fused
    # spectral-STEP kernel was deleted after losing to XLA's own fusion.
    use_pallas: bool = False
    restart: int = 300
    rtol: float = 1e-5
    atol: float = 1e-50
    maxiter: int = 1000
    inner_tol: float = 1e-10
    inner_maxiter: int = 50
    refine: int = 1
    polish: int = 0

    def __post_init__(self):
        if self.method not in ("gmres", "minres", "direct", "spectral", "woodbury"):
            raise ValueError(f"unknown method {self.method!r}")
        if self.pc not in (None, "paradiag"):
            raise ValueError(f"unknown pc {self.pc!r}")
        if self.pc_variant not in (
            "fulldiag",
            "eig",
            "block",
            "blockdense",
            "blockline",
            "blockband",
        ):
            raise ValueError(f"unknown pc_variant {self.pc_variant!r}")
        if self.inner not in ("auto", "dst", "tridiag_thomas", "tridiag_pcr", "cocg", "cocg_jacobi"):
            raise ValueError(f"unknown inner solver {self.inner!r}")
        if self.pc_side not in ("left", "right"):
            raise ValueError(f"unknown pc_side {self.pc_side!r}")
        if not isinstance(self.refine, int) or self.refine < 0:
            raise ValueError(f"refine must be a non-negative int, got {self.refine!r}")
        if not isinstance(self.polish, int) or self.polish < 0:
            raise ValueError(f"polish must be a non-negative int, got {self.polish!r}")
        if self.polish and self.method != "woodbury":
            raise ValueError(
                f"polish is a 'woodbury'-method option; method={self.method!r} ignores it"
            )


def reference_1d_default() -> ProblemConfig:
    """The reference's default run config: ``N_x=80, N_t=81, T=2, gamma=1, 1D``
    (``Control_Wave_PC.py:335-339``)."""
    return ProblemConfig(N_x=80, N_t=81, T=2.0, gamma=1.0, dim=1)
