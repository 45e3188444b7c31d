"""End-to-end pipeline benchmark — the north-star metric.

Measures frames/sec/chip of the fused detect->crop->pose graph (the product
path: ros_demo.run_network equivalent) on whatever backend jax picks (the
real TPU chip under the driver). Baseline target: >=1000 fps/chip
(BASELINE.md; the reference publishes no numbers of its own).

Operating point: the "fast" profile — detector at 512x640 (DexYCB frames are
natively 480x640; the reference's min-800 upscale adds FLOPs, not
information), batch 64, bf16 compute, fused conv towers. The parity profile
(800x1088) is available via PROFILE=parity.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 1000.0  # driver target from BASELINE.json


def main():
    from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                    PipelineConfig)
    from handnet_tpu.models.pipeline import HandNetPipeline

    profile = os.environ.get("PROFILE", "fast")
    if profile == "parity":
        image_h, image_w, batch = 800, 1088, 16
    else:
        image_h, image_w, batch = 512, 640, 128

    cfg = HandNetConfig(
        a2j=A2JConfig(),
        fcos=FCOSConfig(num_classes=2, ext=False,
                        image_h=image_h, image_w=image_w),
        pipeline=PipelineConfig(),
    )
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, 480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(batch, 480, 640)).astype(np.float32))

    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    # warmup / compile
    jax.block_until_ready(fwd(variables, images, depth))

    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images, depth)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "e2e_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
