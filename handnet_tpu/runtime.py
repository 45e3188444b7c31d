"""Runtime setup helpers: persistent compilation cache + profiling hooks.

First compile of the fused 800x1088 pipeline costs minutes (notably through
remote-compile TPU tunnels); the persistent cache makes every subsequent
process start hot. All CLI entry points call :func:`setup` first.

Profiling (SURVEY §5 "tracing"): the reference only has manual wall-clock
meters (trainval_net_fcos.py:124-130). Here ``trace()`` wraps a block with
``jax.profiler`` so kernels can be inspected in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


def setup(cache_dir: Optional[str] = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    import jax

    cache_dir = (cache_dir or os.environ.get("HANDNET_XLA_CACHE")
                 or os.path.expanduser("~/.cache/handnet_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; set HANDNET_TRACE_DIR or pass logdir."""
    import jax

    logdir = logdir or os.environ.get("HANDNET_TRACE_DIR")
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Simple step-time meter with synchronization (the FPS report the
    reference prints at trainval_net_fcos.py:173)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_to_block_on=None):
        import jax

        t0 = time.perf_counter()
        yield
        if result_to_block_on is not None:
            jax.block_until_ready(result_to_block_on)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def fps(self, batch: int = 1) -> float:
        return batch / self.mean if self.times else 0.0
