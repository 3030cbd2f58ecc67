"""Test configuration: CPU backend, 8 virtual devices (for sharding tests --
the fake-backend capability the reference lacks, SURVEY.md section 4), and
float64 to match the reference's PETSc complex128 precision.

Note: this image's sitecustomize registers the TPU ('axon') PJRT plugin in
every interpreter and force-sets ``jax_platforms``; tests must run on CPU
(the TPU tunnel is single-client), so we override the config *after* jax
import -- backends initialize lazily, so the TPU is never touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
