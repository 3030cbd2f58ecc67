"""TPU-native ParaDiag framework for all-at-once optimal control of the wave equation.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
Firedrake/PETSc research code ``Molin-Han/Optimal_Control_ParaDiag``
(``Code/Control_Wave_PC.py``): P1 finite elements in space, central second
differences in time, the all-at-once KKT system for the (state, adjoint) pair,
a block-circulant ParaDiag preconditioner (FFT diagonalization in time +
per-Fourier-mode 2x2 decoupling + complex-shifted spatial solves), and a
matrix-free Krylov outer iteration -- redesigned TPU-first:

- interior-DoF dense layouts ``(2, N_t, n_space)`` instead of sparse
  identity-row boundary handling;
- sine-transform (DST-I) spatial diagonalization so the whole preconditioner
  is two transforms plus elementwise 2x2 solves (MXU matmuls + VPU), replacing
  the reference's MUMPS sparse LU (``Control_Wave_PC.py:480-484``);
- jittable Givens-rotation GMRES replacing PETSc KSP
  (``Control_Wave_PC.py:346-359``);
- sharding over a ``jax.sharding.Mesh`` ('time', 'space') for the
  parallel-in-time mode axis.

Layer map (cf. SURVEY.md section 1): ``fem/`` assembly, ``ops/`` operators and
transforms, ``paradiag/`` the preconditioner, ``krylov/`` outer solvers,
``parallel/`` sharding, ``models/`` problem definitions, ``utils/`` + ``viz/``
observability and postprocessing.
"""

from optimal_control_paradiag_tpu.config import (
    ProblemConfig,
    SolverConfig,
    reference_1d_default,
)
from optimal_control_paradiag_tpu.models.heat import HeatControlProblem
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem

__version__ = "0.1.0"

__all__ = [
    "ProblemConfig",
    "SolverConfig",
    "WaveControlProblem",
    "HeatControlProblem",
    "reference_1d_default",
    "__version__",
]
