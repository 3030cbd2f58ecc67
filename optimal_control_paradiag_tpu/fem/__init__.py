"""Firedrake-free P1 finite-element layer.

Replaces the reference's Firedrake/UFL/TSFC pipeline (meshes, function spaces,
forms, Dirichlet BCs, interpolation -- ``Control_Wave_PC.py:16-45`` and every
``fd.*`` form call) with closed-form P1 element matrices on structured meshes,
applied as dense stencils (VPU-friendly) and diagonalized by sine transforms
(MXU-friendly). Homogeneous Dirichlet conditions (ref ``:43-45``) are imposed
by eliminating boundary DoFs: all arrays hold interior nodes only.
"""

from optimal_control_paradiag_tpu.fem.space import P1Space, make_space

__all__ = ["P1Space", "make_space"]
