"""Training-throughput probe: measured train-step rates on the real chip.

The serving path has measured numbers (bench.py, tools/perf_probe.py); this
gives the TRAINING side the same footing — steady-state step time and
samples/sec/chip for both trainers at their reference recipes:

* A2J:  AdamW bs 64, 176x176 depth crops (reference config/a2j.yaml:8-30)
* FCOS: bs 16 at the fast geometry 480x640 (the reference trains bs 2 on
  one GPU, scripts/fcos_train.sh; a v5e chip fits far larger batches)

Synthetic device-resident batches isolate the compute path (loader
throughput is covered by the PrefetchLoader design + uint8 wire format).
The stop-clock is a host readback (see tools/bench_clock_check.py).

    python tools/train_probe.py [--iters 20]
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
from handnet_tpu.models.fcos import preprocess
from handnet_tpu.train.trainer import A2JTrainer, FCOSTrainer


def probe(name, trainer, batch, batch_size, iters):
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, batch)
    _ = float(jax.tree.leaves(metrics)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, batch)
    _ = float(jax.tree.leaves(metrics)[0])  # host readback stop-clock
    dt = (time.perf_counter() - t0) / iters
    out = {"probe": name, "batch": batch_size,
           "step_ms": round(dt * 1e3, 1),
           "samples_per_sec": round(batch_size / dt, 1),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(out), flush=True)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--a2j-batch", type=int, default=64)
    parser.add_argument("--fcos-batch", type=int, default=16)
    args = parser.parse_args(argv)
    rng = np.random.default_rng(0)
    results = []

    bs = args.a2j_batch
    a2j = A2JTrainer(A2JConfig(), TrainConfig(batch_size=bs, bf16=True))
    a2j_batch = {
        "image": jnp.asarray(rng.uniform(-1, 1, (bs, 176, 176, 1)),
                             jnp.float32),
        "jt_uvd": jnp.asarray(rng.uniform(0, 176, (bs, 21, 3)), jnp.float32),
    }
    results.append(probe("a2j_train_bs%d" % bs, a2j, a2j_batch, bs,
                         args.iters))

    bs = args.fcos_batch
    fcfg = FCOSConfig(num_classes=3, ext=True, image_h=480, image_w=640)
    fcos = FCOSTrainer(fcfg, TrainConfig(batch_size=bs, bf16=True, lr=5e-4),
                       backbone_norm="batch")
    m = 8  # max_boxes padding
    boxes = np.zeros((bs, m, 4), np.float32)
    boxes[:, 0] = [100, 100, 300, 260]
    labels = np.zeros((bs, m), np.int32)
    labels[:, 0] = 2
    valid = np.zeros((bs, m), bool)
    valid[:, 0] = True
    frames = jnp.asarray(rng.uniform(size=(bs, 480, 640, 3)), jnp.float32)
    fcos_batch = {
        "image": jax.jit(lambda im: preprocess(im, fcfg)[0])(frames),
        "targets": {
            "boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(labels),
            "valid": jnp.asarray(valid),
            "box_info": jnp.zeros((bs, m, 5), jnp.float32),
        },
    }
    results.append(probe("fcos_train_bs%d" % bs, fcos, fcos_batch, bs,
                         args.iters))
    print(json.dumps({"train_probe": results}))


if __name__ == "__main__":
    main()
