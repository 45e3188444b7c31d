"""Host-side cache of seed-derived pipeline parameter trees.

Random-init of the fused pipeline costs minutes of host CPU on a small
host — and must never run on the remote device backend, where it becomes
hundreds of small ops through the tunnel (~430 s measured, CLAUDE.md).
Every bench/probe tool wants the *identical* seed-0 tree so measurements
compare across runs; build it once on the host cpu backend and cache the
numpy tree under ``~/.cache/handnet_tpu_params`` keyed by the full config
repr + compute dtype + seed (any config override changes the key).

flax msgpack round-trips the nested dict without a target tree, so loading
needs no ``pipe.init`` — the ~3 min build becomes a ~3 s read (measured,
round 5). Corrupt or stale files fall back to a rebuild.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Optional

import jax
import numpy as np
from flax import serialization

CACHE_ROOT = os.path.join(os.path.expanduser("~"), ".cache",
                          "handnet_tpu_params")


def cache_path(cfg, dtype_name: str, seed: int = 0) -> str:
    key = hashlib.sha1(
        f"{cfg!r}|{dtype_name}|{seed}".encode()).hexdigest()[:16]
    os.makedirs(CACHE_ROOT, exist_ok=True)
    return os.path.join(CACHE_ROOT, f"bench_{key}.msgpack")


def seed_params(pipe, cfg, dtype_name: str, seed: int = 0,
                status: Optional[Callable[[str], None]] = None) -> dict:
    """Load-or-build the seed-``seed`` variables for ``pipe`` (whose config
    must be ``cfg`` — the cache key). Returns a host numpy tree; callers
    ``jax.device_put`` it in one bulk transfer."""
    note = status or (lambda m: None)
    path = cache_path(cfg, dtype_name, seed)
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                variables = serialization.msgpack_restore(f.read())
            note(f"loaded cached seed-{seed} params ({path})")
            return variables
        except Exception as e:  # corrupt/stale — rebuild below
            note(f"param cache unusable ({e!r}); rebuilding")
    note(f"building seed-{seed} params on host cpu (~minutes first time)")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = pipe.init(jax.random.PRNGKey(seed))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    os.replace(tmp, path)  # atomic vs a concurrent tool writing the same key
    note(f"params built and cached ({path})")
    return variables
