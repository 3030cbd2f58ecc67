"""Host-constant device transfer.

The axon TPU backend only lowers *compiled* programs; eager dispatches
(including the implicit ``convert_element_type`` that ``jnp.asarray(x, dtype)``
issues when the numpy dtype differs) raise ``UNIMPLEMENTED``. The rule for
setup-time constants is therefore: do all math and dtype conversion in numpy
on host, then transfer bytes of the exact final dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def host_const(x, dtype) -> np.ndarray:
    """Cast a setup-time constant to the canonical form of ``dtype`` on host.

    Keeping constants as numpy arrays lets jit embed them into compiled
    programs (no eager device op ever runs); jnp functions accept numpy
    operands directly at trace time.
    """
    import jax

    return np.asarray(x, dtype=jax.dtypes.canonicalize_dtype(np.dtype(dtype)))


def to_device(x, dtype) -> jnp.ndarray:
    """Convert ``x`` to ``dtype`` in numpy, then transfer -- never triggers an
    eager on-device cast. The dtype is canonicalized first (float64 -> float32
    when x64 is disabled), so the transfer is always a pure byte copy.

    The result is ALWAYS a concrete device array, even when called during a
    jit trace (``ensure_compile_time_eval``): lazily-built setup constants
    (e.g. cached properties first touched inside a traced solve) must never
    cache a tracer, and large constants deliberately lower as
    compiled-executable parameters rather than embedded constants."""
    import jax

    canonical = jax.dtypes.canonicalize_dtype(np.dtype(dtype))
    with jax.ensure_compile_time_eval():
        return jnp.asarray(np.asarray(x, dtype=canonical))
