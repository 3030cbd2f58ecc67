"""Operator layer: the all-at-once KKT matvec, RHS assembly, batched
tridiagonal solvers, and dense reference assembly (test oracle)."""

from optimal_control_paradiag_tpu.ops.allatonce import (
    AllAtOnceOperator,
    build_operator,
    build_rhs,
)

__all__ = ["AllAtOnceOperator", "build_operator", "build_rhs"]
