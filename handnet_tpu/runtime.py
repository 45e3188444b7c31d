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


def setup(cache_dir: Optional[str] = None,
          distributed: Optional[bool] = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent), and — for
    multi-host pods — initialize the jax distributed runtime.

    Multi-host is the TPU-native replacement for the reference's latent DDP
    (config/a2j.yaml:5 strategy stub + DistributedSampler at
    utils/utils.py:53,82,106): ``jax.distributed.initialize()`` wires every
    host process into one global device namespace, after which
    ``parallel.mesh.create_mesh()`` spans all chips in the pod and the pjit
    collectives ride ICI/DCN. Data sharding per host maps straight onto
    ``PrefetchLoader(shard_id=jax.process_index(),
    num_shards=jax.process_count())`` — see :func:`process_shard`.

    ``distributed=None`` auto-detects: initialize when a coordinator is
    configured (``COORDINATOR_ADDRESS``/``JAX_COORDINATOR_ADDRESS`` env, or
    a TPU-pod environment jax can self-discover via ``HANDNET_DISTRIBUTED``).
    Pass ``distributed=False`` to force single-process.
    """
    import jax

    platform = os.environ.get("HANDNET_PLATFORM")
    if platform:
        # uniform backend override for every CLI/tool entry point. The
        # sandbox's sitecustomize pins jax_platforms="axon,cpu" in jax
        # CONFIG at interpreter start, so plain JAX_PLATFORMS env is
        # ignored (CLAUDE.md); HANDNET_PLATFORM=cpu is how the training
        # tools and studies run host-side while the TPU tunnel is down.
        # Must win before first backend use — setup() runs at entry-point
        # import, ahead of any device op.
        jax.config.update("jax_platforms", platform)

    cache_dir = (cache_dir or os.environ.get("HANDNET_XLA_CACHE")
                 or os.path.expanduser("~/.cache/handnet_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs — harmless

    if distributed is None:
        distributed = bool(
            os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("HANDNET_DISTRIBUTED"))
    global _distributed_done
    if distributed and not _distributed_done:
        # Coordinator/process env comes from the launcher. jax's own
        # auto-detect covers TPU pods / Slurm / OMPI; the explicit
        # COORDINATOR_ADDRESS + PROCESS_ID (+ NUM_PROCESSES) triple works
        # anywhere and is forwarded here (jax only reads
        # JAX_COORDINATOR_ADDRESS from env on its own).
        kwargs = {}
        addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                or os.environ.get("COORDINATOR_ADDRESS"))
        if addr:
            kwargs["coordinator_address"] = addr
        if os.environ.get("PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["PROCESS_ID"])
        if os.environ.get("NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        jax.distributed.initialize(**kwargs)
        # own flag, set only after success: every entry point calls setup()
        # at import, and a second jax.distributed.initialize() raises once
        # the backend is live (jax exposes no public "is initialized" probe)
        _distributed_done = True


_distributed_done = False


def process_shard() -> "tuple[int, int]":
    """(shard_id, num_shards) for this host's input pipeline — feed directly
    to ``data.loader.PrefetchLoader``; the per-host replacement for the
    reference's DistributedSampler (utils/utils.py:53)."""
    import jax

    return jax.process_index(), jax.process_count()


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
