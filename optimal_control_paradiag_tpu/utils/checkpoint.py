"""Checkpoint / resume of solver runs.

The reference has no persistence beyond final VTK files (SURVEY.md section
5.4). Two tiers:

- :func:`save_solution` / :func:`load_solution` / :func:`warm_start`: whole
  solutions as single npz files (host-gathered), plus warm-started resumes
  through ``WaveControlProblem.solve(..., x0=...)``.
- :func:`save_sharded` / :func:`load_sharded`: hand-rolled per-shard npz for
  sharded ``jax.Array``s -- each process writes only its addressable shards
  with their global index ranges, and reload reconstructs the array under a
  given sharding without ever host-gathering the global array (the orbax
  pattern, dependency-free).
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


def save_sharded(path_prefix: str, arr) -> str:
    """Checkpoint a (possibly sharded) ``jax.Array``: this process writes
    ``{path_prefix}_p{process_index:03d}.npz`` holding its addressable shards
    plus their global index ranges. Single-host arrays produce one file that
    covers the whole array; on a pod each host writes its own slice -- no
    host ever gathers the global array."""
    import jax

    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    shards = arr.addressable_shards
    payload: Dict[str, Any] = {
        "global_shape": np.asarray(arr.shape, np.int64),
        "dtype": np.asarray(str(np.dtype(arr.dtype))),
        "n_shards": np.asarray(len(shards), np.int64),
    }
    for i, s in enumerate(shards):
        start = [sl.start if sl.start is not None else 0 for sl in s.index]
        stop = [
            sl.stop if sl.stop is not None else dim for sl, dim in zip(s.index, arr.shape)
        ]
        payload[f"shard{i}_data"] = np.asarray(s.data)
        payload[f"shard{i}_start"] = np.asarray(start, np.int64)
        payload[f"shard{i}_stop"] = np.asarray(stop, np.int64)
    fname = f"{path_prefix}_p{jax.process_index():03d}.npz"
    np.savez_compressed(fname, **payload)
    return fname


def load_sharded(path_prefix: str, sharding=None):
    """Reload a :func:`save_sharded` checkpoint.

    ``sharding=None``: assemble and return the full array as numpy (requires
    this process' file(s) to cover the global shape -- i.e. a single-host
    checkpoint). With a ``jax.sharding.Sharding``: build the device array via
    ``jax.make_array_from_callback``, serving each addressable shard from the
    saved pieces -- resuming under the same (or any overlapping) process
    layout never materializes the global array."""
    import glob

    import jax

    files = sorted(glob.glob(f"{path_prefix}_p*.npz"))
    if not files:
        raise FileNotFoundError(f"no checkpoint files match {path_prefix}_p*.npz")
    pieces = []
    shape = dtype = None
    for f in files:
        d = np.load(f)
        shape = tuple(int(v) for v in d["global_shape"])
        dtype = np.dtype(str(d["dtype"]))
        for i in range(int(d["n_shards"])):
            idx = tuple(
                slice(int(a), int(b))
                for a, b in zip(d[f"shard{i}_start"], d[f"shard{i}_stop"])
            )
            pieces.append((idx, d[f"shard{i}_data"]))

    def _assemble(region):
        """Fill ``region`` (a tuple of slices into the global array) from the
        saved pieces; raises if any part of it is missing."""
        out = np.empty(
            tuple(sl.stop - sl.start for sl in region), dtype
        )
        filled = np.zeros(out.shape, bool)
        for idx, data in pieces:
            inter = []
            for r, p in zip(region, idx):
                lo, hi = max(r.start, p.start), min(r.stop, p.stop)
                if lo >= hi:
                    break
                inter.append((lo, hi))
            else:
                dst = tuple(slice(lo - r.start, hi - r.start) for (lo, hi), r in zip(inter, region))
                src = tuple(slice(lo - p.start, hi - p.start) for (lo, hi), p in zip(inter, idx))
                out[dst] = data[src]
                filled[dst] = True
        if not filled.all():
            raise ValueError(
                f"checkpoint {path_prefix} does not cover requested region {region} "
                "(multi-host checkpoint loaded under a mismatched layout?)"
            )
        return out

    full_region = tuple(slice(0, s) for s in shape)
    if sharding is None:
        return _assemble(full_region)

    def cb(index):
        region = tuple(
            slice(sl.start or 0, sl.stop if sl.stop is not None else dim)
            for sl, dim in zip(index, shape)
        )
        return _assemble(region)

    return jax.make_array_from_callback(shape, sharding, cb)


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
