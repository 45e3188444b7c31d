"""Capture a jax.profiler trace of the fused pipeline (SURVEY §5 tracing).

Runs a few bench-shaped iterations of the flagship graph inside
``runtime.trace`` (jax.profiler start/stop) and reports what the profiler
wrote, so a deployment can open it in XProf/TensorBoard. On remote-tunnel
backends device-side tracing may be unsupported — the tool says so instead
of failing.

Usage: python tools/trace_capture.py [--profile fast] [--logdir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from handnet_tpu import runtime as _runtime

_runtime.setup()
import jax.numpy as jnp
import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--profile", default="fast")
    p.add_argument("--logdir", default="/tmp/handnet_trace")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)

    from handnet_tpu.config import load_config
    from handnet_tpu.models.pipeline import HandNetPipeline

    cfg = load_config(yaml_path=os.path.join(_REPO, "configs",
                                             f"{args.profile}.yaml"))
    batch = cfg.train.batch_size
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, 480, 640, 3)),
                         jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(batch, 480, 640)),
                        jnp.float32)
    if pipe.needs_calibration():
        variables = pipe.calibrate(variables, images, depth)

    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    jax.block_until_ready(fwd(variables, images, depth))  # compile outside

    try:
        with _runtime.trace(args.logdir):
            out = None
            for _ in range(args.iters):
                out = fwd(variables, images, depth)
            _ = np.asarray(out[0, 0, 0])  # readback inside the trace
    except Exception as e:  # remote backends may refuse device tracing
        print(f"trace FAILED on this backend: {type(e).__name__}: {e}")
        return 1

    files = []
    for root, _, names in os.walk(args.logdir):
        files += [os.path.join(root, n) for n in names]
    total = sum(os.path.getsize(f) for f in files)
    print(f"trace ok: {len(files)} files, {total/1e6:.1f} MB under "
          f"{args.logdir}")
    for f in sorted(files)[-8:]:
        print("  ", os.path.relpath(f, args.logdir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
