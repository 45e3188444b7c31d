"""Training-step throughput benchmark for both trainable stages.

The reference prints per-iteration train timing at eval points
(trainval_net_fcos.py:124-130,173 and the Lightning progress bar for A2J);
this tool gives the TPU rebuild the equivalent measured numbers: sustained
train-step frames/sec for the A2J stage (reference recipe shapes: crop
176x176, batch 64 — config/a2j.yaml:8-30) and the FCOS stage (fast-profile
480x640 and parity 800x1088 geometries; batch sized for HBM).

Clocking follows CLAUDE.md's tunnel rules: steps chain through the train
state (each iteration consumes the previous state, so no reordering), and
the stop-clock is a host readback of a loss scalar (which cannot complete
before the remote execution has).

Prints one JSON line per stage:
    {"metric": "a2j_train_fps", "value": ..., "unit": "frames/sec", ...}
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

from handnet_tpu.config import A2JConfig, FCOSConfig, TrainConfig
from handnet_tpu.train.trainer import A2JTrainer, FCOSTrainer


def _time_steps(trainer, state, batch, iters):
    # warmup / compile
    state, metrics = trainer.train_step(state, batch)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, batch)
    # host readback stop-clock (CLAUDE.md: block_until_ready can return
    # early on the remote backend for small graphs; a readback cannot)
    loss = float(np.asarray(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    return dt, loss


def bench_a2j(batch, iters, rng):
    trainer = A2JTrainer(A2JConfig(), TrainConfig(batch_size=batch, bf16=True))
    state = trainer.init_state(jax.random.PRNGKey(0))
    data = {
        "image": jnp.asarray(
            rng.uniform(-1, 1, size=(batch, 176, 176, 1)).astype(np.float32)),
        "jt_uvd": jnp.asarray(
            rng.uniform(20, 150, size=(batch, 21, 3)).astype(np.float32)),
    }
    dt, loss = _time_steps(trainer, state, data, iters)
    return batch * iters / dt, loss


def bench_fcos(batch, iters, h, w, rng):
    cfg = FCOSConfig(num_classes=3, ext=True, image_h=h, image_w=w)
    trainer = FCOSTrainer(cfg, TrainConfig(batch_size=batch, bf16=True),
                          backbone_norm="batch")
    state = trainer.init_state(jax.random.PRNGKey(0))
    m = 8  # max_boxes padding, matching data/detect_data.py
    boxes = np.zeros((batch, m, 4), np.float32)
    boxes[:, 0] = [w * 0.3, h * 0.3, w * 0.6, h * 0.6]
    boxes[:, 1] = [w * 0.1, h * 0.1, w * 0.35, h * 0.4]
    valid = np.zeros((batch, m), bool)
    valid[:, :2] = True
    labels = np.ones((batch, m), np.int32)
    labels[:, 0] = 2  # hand class
    info = np.zeros((batch, m, 5), np.float32)
    info[:, 0] = [1, 1, 2, 0.5, 0.5]
    data = {
        "image": jnp.asarray(
            rng.uniform(size=(batch, h, w, 3)).astype(np.float32)),
        "targets": {"boxes": jnp.asarray(boxes),
                    "labels": jnp.asarray(labels),
                    "valid": jnp.asarray(valid),
                    "box_info": jnp.asarray(info)},
    }
    dt, loss = _time_steps(trainer, state, data, iters)
    return batch * iters / dt, loss


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--a2j-batch", type=int, default=64)
    p.add_argument("--fcos-batch", type=int, default=16)
    p.add_argument("--fcos-parity-batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-parity", action="store_true")
    args = p.parse_args(argv)
    rng = np.random.default_rng(0)

    fps, loss = bench_a2j(args.a2j_batch, args.iters, rng)
    print(json.dumps({"metric": "a2j_train_fps", "value": round(fps, 1),
                      "unit": "frames/sec", "batch": args.a2j_batch,
                      "shape": "176x176", "loss": round(loss, 4)}))

    fps, loss = bench_fcos(args.fcos_batch, args.iters, 480, 640, rng)
    print(json.dumps({"metric": "fcos_train_fps_fast", "value": round(fps, 1),
                      "unit": "frames/sec", "batch": args.fcos_batch,
                      "shape": "480x640", "loss": round(loss, 4)}))

    if not args.skip_parity:
        fps, loss = bench_fcos(args.fcos_parity_batch, args.iters, 800, 1088,
                               rng)
        print(json.dumps({"metric": "fcos_train_fps_parity",
                          "value": round(fps, 1), "unit": "frames/sec",
                          "batch": args.fcos_parity_batch,
                          "shape": "800x1088", "loss": round(loss, 4)}))


if __name__ == "__main__":
    main()
