"""Checkpoint / resume (VERDICT round-1 item 8): per-shard sharded-array
checkpoints and a warm start that actually resumes a tightened-tolerance
solve with fewer iterations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from optimal_control_paradiag_tpu import ProblemConfig, SolverConfig, WaveControlProblem
from optimal_control_paradiag_tpu.parallel.sharding import make_layout
from optimal_control_paradiag_tpu.utils.checkpoint import (
    load_sharded,
    save_sharded,
    save_solution,
    warm_start,
)


def test_sharded_roundtrip_8_devices(tmp_path):
    """Save a (time, space)-sharded array on the 8-virtual-device mesh, reload
    under the same sharding: values equal, shard structure preserved, and no
    global host gather is required by the API."""
    layout = make_layout(4, 2)
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((2, 8, 16))
    sharding = layout.sharding(P(None, "time", "space"))
    x = jax.device_put(jnp.asarray(x_np), sharding)
    prefix = str(tmp_path / "ckpt")
    fname = save_sharded(prefix, x)
    assert fname.endswith("_p000.npz")

    y = load_sharded(prefix, sharding)
    assert y.sharding == sharding
    np.testing.assert_array_equal(np.asarray(y), x_np)

    # plain-numpy reload covers the whole array
    z = load_sharded(prefix)
    np.testing.assert_array_equal(z, x_np)


def test_sharded_reload_under_different_sharding(tmp_path):
    """A checkpoint written under one layout reloads under another
    (overlapping regions are re-cut from the saved pieces)."""
    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((2, 8, 16))
    lay_a = make_layout(8, 1)
    lay_b = make_layout(2, 4)
    x = jax.device_put(jnp.asarray(x_np), lay_a.sharding(P(None, "time", None)))
    prefix = str(tmp_path / "ckpt2")
    save_sharded(prefix, x)
    y = load_sharded(prefix, lay_b.sharding(P(None, "time", "space")))
    np.testing.assert_array_equal(np.asarray(y), x_np)


def test_sharded_missing_region_raises(tmp_path):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 4)))
    prefix = str(tmp_path / "ckpt3")
    fname = save_sharded(prefix, x)
    # Corrupt: drop coverage by renaming the region smaller.
    d = dict(np.load(fname))
    d["shard0_stop"] = np.asarray([2, 4], np.int64)
    np.savez_compressed(fname, **d)
    with pytest.raises(ValueError, match="does not cover"):
        load_sharded(prefix)


def test_warm_start_resumes_with_fewer_iterations(tmp_path):
    """Loose solve -> checkpoint -> warm-started resume to a tight absolute
    target beats the cold solve's iteration count (the checkpoint/resume
    story the round-1 docstring only promised)."""
    prob = WaveControlProblem(ProblemConfig(N_x=40, N_t=40))
    atarget = 1e-10 * float(jnp.linalg.norm(prob.rhs.reshape(-1)))

    cold = prob.solve(SolverConfig(rtol=0.0, atol=atarget))
    assert bool(cold.result.converged)

    loose = prob.solve(SolverConfig(rtol=1e-3))
    path = save_solution(str(tmp_path / "loose.npz"), prob, loose)
    x0 = warm_start(prob, path)
    resumed = prob.solve(SolverConfig(rtol=0.0, atol=atarget), x0=x0)
    assert bool(resumed.result.converged)
    assert int(resumed.result.iterations) < int(cold.result.iterations)
    np.testing.assert_allclose(
        np.asarray(resumed.u), np.asarray(cold.u), atol=1e-7
    )
