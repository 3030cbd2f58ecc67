"""The ParaDiag block-circulant preconditioner.

FFT diagonalization in time + per-Fourier-mode decoupling of the (state,
adjoint) pair, replacing the reference's ``DiagFFTPC``
(``Control_Wave_PC.py:376-558``)."""

from optimal_control_paradiag_tpu.paradiag.eigs import CirculantEigs, circulant_eigs
from optimal_control_paradiag_tpu.paradiag.pc import build_preconditioner
from optimal_control_paradiag_tpu.paradiag.spectral import (
    build_polished_solver,
    build_woodbury_solver,
)
from optimal_control_paradiag_tpu.paradiag.woodbury2d import (
    build_tensor_gmres_solver,
    build_woodbury2d_solver,
)

__all__ = [
    "CirculantEigs",
    "circulant_eigs",
    "build_preconditioner",
    "build_polished_solver",
    "build_woodbury_solver",
    "build_tensor_gmres_solver",
    "build_woodbury2d_solver",
]
