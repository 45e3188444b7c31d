"""Operating-point perf probe: time the fused pipeline across batch sizes.

Finds the throughput knee for a profile (configs/*.yaml) on the current
backend — used to pick the batch in the shipped configs. Each new
(batch, resolution) shape costs a full XLA compile on first run (persistent
cache makes repeats cheap).

    python tools/perf_probe.py --profile parity --batches 16 32 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def time_batch(pipe, variables, batch: int, iters: int) -> float:
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, 480, 640, 3))
                         .astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(batch, 480, 640))
                        .astype(np.float32))
    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    t0 = time.perf_counter()
    jax.block_until_ready(fwd(variables, images, depth))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images, depth)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = batch * iters / dt
    print(f"batch {batch:4d}: {fps:8.1f} fps/chip "
          f"({1e3 * dt / iters:6.2f} ms/batch, compile {compile_s:.0f}s)",
          flush=True)
    return fps


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--profile", default="parity")
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[16, 32, 64])
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args(argv)

    from handnet_tpu.config import load_config
    from handnet_tpu.models.pipeline import HandNetPipeline

    cfg = load_config(yaml_path=os.path.join(_REPO, "configs",
                                             f"{args.profile}.yaml"))
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))
    results = {b: time_batch(pipe, variables, b, args.iters)
               for b in args.batches}
    best = max(results, key=results.get)
    print(json.dumps({"profile": args.profile, "fps_by_batch": results,
                      "best_batch": best}))


if __name__ == "__main__":
    main()
