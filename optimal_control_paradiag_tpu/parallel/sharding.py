"""Device mesh + stage-wise sharding layouts for the ParaDiag pipeline.

The all-at-once state ``(2, N_t, n)`` passes through stages with different
optimal layouts (SURVEY.md section 5.7-5.8, the Ulysses-style design):

- **canonical**: time and space both sharded -- the layout Krylov vectors and
  the matrix-free operator live in (stencil halos ride XLA's automatic
  collective-permutes);
- **time-local** (space sharded): needed by the FFT over the time axis;
- **mode-local** (time sharded): needed by the spatial sine-transform /
  per-mode inner solves -- modes are embarrassingly parallel here, the "batch
  axis" of ParaDiag.

Transitions between layouts are expressed as ``with_sharding_constraint``
inside one jitted program: XLA inserts the all-to-alls (ICI-riding) itself --
the compiler-driven equivalent of hand-written MPI transposes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_time: int,
    n_space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ('time', 'space') device mesh with ``n_time * n_space`` devices."""
    if devices is None:
        devices = jax.devices()
    need = n_time * n_space
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_time, n_space)
    return Mesh(arr, axis_names=("time", "space"))


@dataclasses.dataclass(frozen=True)
class ParallelLayout:
    """Named shardings for each pipeline stage on a ('time','space') mesh."""

    mesh: Mesh

    def _ns(self, spec: P) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    @property
    def canonical_spec(self) -> P:
        return P(None, "time", "space")

    def canonical(self, x):
        """State layout for Krylov vectors and the matrix-free operator."""
        return jax.lax.with_sharding_constraint(x, self._ns(self.canonical_spec))

    def time_local(self, x):
        """All time slices local per shard (space sharded) -- FFT stage."""
        return jax.lax.with_sharding_constraint(x, self._ns(P(None, None, ("time", "space"))))

    def mode_local(self, x):
        """All space local per shard (modes sharded) -- inner-solve stage."""
        return jax.lax.with_sharding_constraint(x, self._ns(P(None, ("time", "space"), None)))

    def sharding(self, spec: P) -> NamedSharding:
        return self._ns(spec)


def make_layout(n_time: int, n_space: int = 1, devices=None) -> ParallelLayout:
    return ParallelLayout(mesh=make_mesh(n_time, n_space, devices))


class IdentityLayout:
    """Single-device stand-in for :class:`ParallelLayout`: every stage
    constraint is a no-op. Shared by the preconditioner / spectral / symmetric
    builders so their pipelines read identically with and without sharding."""

    canonical = staticmethod(lambda x: x)
    time_local = staticmethod(lambda x: x)
    mode_local = staticmethod(lambda x: x)
