"""Latency/throughput tradeoff of the fused serving graph across batch sizes.

The reference's ROS loop serves one frame at a time (ros_demo.py:246-345), so
its latency IS its 1/throughput. The TPU server microbatches
(apps/serve.py), so the two separate: per-frame latency grows with the
compiled batch while throughput rises to the knee. This prints the curve a
deployment picks its batch from: one JSON line per batch size with

    {"batch": B, "latency_ms": p50 per-BATCH wall time, "fps": B/latency}

Clocking per CLAUDE.md tunnel rules: iterations chain the output into the
next input (no reordering) and the stop-clock is a host readback, so remote
backends can't return early. Each batch size runs in ITS OWN jitted graph —
run this in a fresh process per profile to avoid cache cross-talk.

Usage:
    python tools/latency_probe.py [--batches 1,8,32,128] [--profile fast]
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

from handnet_tpu.config import load_config
from handnet_tpu.models.pipeline import HandNetPipeline

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_batch(pipe, variables, batch: int, h: int, w: int,
                iters: int) -> float:
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, h, w, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(batch, h, w)).astype(np.float32))

    def step(v, im, d):
        # variables stay a runtime ARGUMENT (like bench.py/serve.py) — as a
        # closure constant XLA could fold param-only work (e.g. QuantConv's
        # weight quantization) that real serving pays every call
        out = pipe(v, im, d)["joints_uvd"]
        # chain: bleed a data-dependent epsilon into the next input so the
        # remote backend cannot overlap/elide iterations
        eps = jnp.tanh(out[0, 0, 0]) * 1e-6
        return im + eps, d

    fwd = jax.jit(step)
    images, depth = fwd(variables, images, depth)  # compile
    _ = float(np.asarray(images[0, 0, 0, 0]))      # sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        images, depth = fwd(variables, images, depth)
        _ = float(np.asarray(images[0, 0, 0, 0]))  # readback stop-clock
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32,128")
    p.add_argument("--profile", default="fast")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    cfg = load_config(yaml_path=os.path.join(_REPO, "configs",
                                             f"{args.profile}.yaml"))
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))
    if pipe.needs_calibration():
        rng = np.random.default_rng(1)
        variables = pipe.calibrate(
            variables,
            jnp.asarray(rng.uniform(size=(4, 480, 640, 3)), jnp.float32),
            jnp.asarray(rng.uniform(0.3, 1.0, size=(4, 480, 640)),
                        jnp.float32))

    for b in [int(x) for x in args.batches.split(",")]:
        lat = probe_batch(pipe, variables, b, 480, 640, args.iters)
        print(json.dumps({"batch": b, "profile": args.profile,
                          "latency_ms": round(lat * 1e3, 2),
                          "fps": round(b / lat, 1)}))


if __name__ == "__main__":
    main()
