"""Sharding layer: device meshes, stage layouts, and the sharded solve.

Replaces the reference's MPI layer (Firedrake mesh partitioning + PETSc halo
exchange, SURVEY.md section 5.8) with a ``jax.sharding.Mesh`` over axes
('time', 'space'): the ParaDiag mode axis is the parallel-in-time dimension
(the reference's raison d'etre, executed there as one block-diagonal MUMPS
solve on a single communicator, ref ``Control_Wave_PC.py:482-484``), and the
space axis row-partitions each mode's spatial problem."""

from optimal_control_paradiag_tpu.parallel.sharding import (
    ParallelLayout,
    make_layout,
    make_mesh,
)

__all__ = ["ParallelLayout", "make_layout", "make_mesh"]
