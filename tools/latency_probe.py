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

`--server-trickle HZ` instead drives a real PipelineServer at a sparse
arrival rate (one frame every 1/HZ s, the light-load regime the bucket
ladder targets) and prints per-frame submit->result percentiles, once
single-bucket and once with `--buckets` — the apples-to-apples number for
the batch-bucket feature:

    {"mode": "server_trickle", "buckets": [...], "p50_ms": ..., "p99_ms": ...}

Usage:
    python tools/latency_probe.py [--batches 1,8,32,128] [--profile fast]
    python tools/latency_probe.py --server-trickle 30 --buckets 1,8 \
        [--frames 64] [--batch 128]
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


def probe_server_trickle(cfg, hz: float, frames: int, batch: int,
                         buckets) -> dict:
    """Per-frame submit->result latency of a real PipelineServer under a
    sparse arrival process — the regime where a partial microbatch
    otherwise pays for batch_size-1 padding frames of compute."""
    from handnet_tpu.apps.serve import PipelineServer
    from handnet_tpu.utils.parcache import seed_params

    # seed-0 params from the host cache + ONE bulk transfer — never let the
    # server random-init on the remote device (CLAUDE.md tunnel rule)
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = jax.device_put(
        seed_params(pipe, cfg, "bfloat16",
                    status=lambda m: print(f"[latency] {m}", file=sys.stderr,
                                           flush=True)),
        jax.devices()[0])
    server = PipelineServer(cfg, batch_size=batch, batch_buckets=buckets,
                            flush_timeout=0.002, variables=variables)
    if server.pipe.needs_calibration():
        rng = np.random.default_rng(1)
        server.calibrate(rng.uniform(size=(4, 480, 640, 3)),
                         rng.uniform(0.3, 1.0, size=(4, 480, 640)))
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    dep = rng.integers(300, 1000, size=(480, 640), dtype=np.uint16)
    server.start()
    try:
        # warmup frame through the queue path (first-dispatch overheads)
        server.submit(0, -1, rgb, dep)
        server.get(timeout=600)
        server._latencies.clear()
        period = 1.0 / hz
        for fid in range(frames):
            server.submit(0, fid, rgb, dep)
            server.get(timeout=600)   # closed-loop: strictly sparse
            time.sleep(period)
        stats = server.latency_stats()
    finally:
        server.stop()
    return {"mode": "server_trickle", "hz": hz, "batch": batch,
            "buckets": list(server.batch_buckets),
            "dispatches": dict(server.bucket_dispatches),
            "p50_ms": round(stats["p50_ms"], 2),
            "p90_ms": round(stats["p90_ms"], 2),
            "p99_ms": round(stats["p99_ms"], 2)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,8,32,128")
    p.add_argument("--profile", default="fast")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--server-trickle", type=float, default=0.0,
                   help="arrival rate (Hz); measures PipelineServer "
                        "per-frame latency instead of the batch curve")
    p.add_argument("--buckets", default=None,
                   help="batch-bucket ladder for --server-trickle")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args(argv)

    cfg = load_config(yaml_path=os.path.join(_REPO, "configs",
                                             f"{args.profile}.yaml"))
    if args.server_trickle:
        buckets = ([int(b) for b in args.buckets.split(",")]
                   if args.buckets else None)
        print(json.dumps(probe_server_trickle(
            cfg, args.server_trickle, args.frames, args.batch, buckets)))
        return

    from handnet_tpu.utils.parcache import seed_params

    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = jax.device_put(seed_params(pipe, cfg, "bfloat16"),
                               jax.devices()[0])
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
