"""Multi-host initialization helpers.

The reference inherits multi-process capability silently from Firedrake/MPI
(never exercised; SURVEY.md section 4 item 7). Here multi-host runs use
``jax.distributed`` + the same Mesh/layout machinery as single-host: the
('time', 'space') mesh spans all processes' devices, and the pjit/shard_map
paths work unchanged (XLA routes inter-host collectives over ICI/DCN).

Typical pod-slice launch (one process per host):

    from optimal_control_paradiag_tpu.parallel import multihost
    multihost.initialize()                   # reads cluster env (TPU: automatic)
    layout = multihost.pod_layout(n_space=1) # time axis spans all chips
    run, sharding = make_sharded_solver(problem, solver, layout)

Single-chip/test environments skip initialization (no-op when only one
process is present).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper; safe to call unconditionally.

    MUST run before the first backend touch (any ``jax.devices()`` /
    ``jax.process_count()`` / eager op): JAX finalizes its runtime on first
    use, after which distributed initialization is ineffective. This wrapper
    therefore never queries the backend itself -- it attempts distributed
    init directly and treats 'already initialized' (RuntimeError) and
    'single-process environment, nothing to discover' (ValueError) as no-ops.
    On TPU pods all arguments are discovered from the environment; for
    multi-process CPU/GPU runs pass all three explicitly
    (exercised by ``tests/test_multihost.py`` with 2 CPU processes)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    except ValueError:
        # single-process environment: no coordinator to discover and none given
        if coordinator_address is not None:
            raise


def pod_layout(n_space: int = 1):
    """A ('time', 'space') layout over ALL devices of all processes."""
    from optimal_control_paradiag_tpu.parallel.sharding import make_layout

    total = jax.device_count()
    if total % n_space:
        raise ValueError(f"n_space={n_space} must divide device count {total}")
    return make_layout(total // n_space, n_space, jax.devices())


def process_summary() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
