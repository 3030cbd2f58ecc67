"""Matrix-free Krylov solvers in pure JAX.

Replaces the reference's PETSc KSP layer (``Control_Wave_PC.py:346-359``):
left-preconditioned restarted GMRES with Givens rotations and CGS2
re-orthogonalization, fully jittable (``lax.while_loop``), with structured
per-iteration residual records replacing ``ksp_monitor``."""

from optimal_control_paradiag_tpu.krylov.gmres import GmresResult, gmres

__all__ = ["GmresResult", "gmres"]
