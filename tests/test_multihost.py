"""Multi-host (multi-process) launch path: 2 real CPU processes through
``jax.distributed`` driving a tiny sharded solve (VERDICT round-1 item 6;
SURVEY.md section 5.8 -- the capability the reference inherits silently from
MPI and never tests).

The subprocesses run a fresh interpreter each (no conftest backend state):
``multihost.initialize()`` must be the FIRST jax call -- the ordering bug this
guards against is querying ``jax.process_count()`` (which finalizes the local
backend) before ``jax.distributed.initialize``.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
import jax

sys.path.insert(0, os.environ["REPO_ROOT"])
from optimal_control_paradiag_tpu.parallel import multihost

# Pin CPU before any backend interaction: this image's sitecustomize
# force-registers the TPU plugin and overrides JAX_PLATFORMS (config updates
# are safe -- they do not initialize the runtime).
jax.config.update("jax_platforms", "cpu")

# FIRST backend interaction: distributed init (the launch-order contract).
multihost.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
jax.config.update("jax_enable_x64", True)

info = multihost.process_summary()
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info  # 4 local x 2 processes

import numpy as np
import jax.numpy as jnp

from optimal_control_paradiag_tpu.config import ProblemConfig, SolverConfig
from optimal_control_paradiag_tpu.models.wave import WaveControlProblem
from optimal_control_paradiag_tpu.parallel import multihost as mh
from optimal_control_paradiag_tpu.parallel.solve import make_sharded_solver

layout = mh.pod_layout(n_space=2)  # (4, 2) mesh over both processes
cfg = ProblemConfig(N_x=17, N_t=8)
prob = WaveControlProblem(cfg)

run, sharding = make_sharded_solver(prob, SolverConfig(rtol=1e-10), layout)
b = jax.device_put(np.asarray(prob.rhs), sharding)
x, res = run(b)
# Every process prints the same converged answer digest.
norm = float(jnp.linalg.norm(x.reshape(-1)))
print("DIGEST", int(res.iterations), f"{norm:.12e}")
"""


def test_two_process_cpu_distributed(tmp_path):
    # Pick a free port for the coordinator.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            COORD=f"127.0.0.1:{port}",
            PROC_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    digests = [line for out in outs for line in out.splitlines() if line.startswith("DIGEST")]
    assert len(digests) == 2
    assert digests[0] == digests[1], digests
    # sanity: the tiny solve converged in few iterations
    iters = int(digests[0].split()[1])
    assert 0 < iters <= 12
