"""Wall-clock stage timers (the structured replacement for the reference's
``time.time()`` prints, ``Control_Wave_PC.py:196-199, 565-569``) and a
``jax.profiler`` hook."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    """Collects named stage durations; device work is fenced with
    ``block_until_ready`` on the supplied array (JAX dispatch is async)."""

    def __init__(self):
        self.records: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            target = out.get("fence", fence)
            if target is not None:
                import jax

                jax.block_until_ready(target)
            self.records[name] = self.records.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        width = max((len(k) for k in self.records), default=0)
        return "\n".join(f"{k:<{width}}  {v * 1000:10.3f} ms" for k, v in self.records.items())


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Wrap a region in a ``jax.profiler`` trace when ``logdir`` is given."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
