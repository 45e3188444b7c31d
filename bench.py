"""End-to-end pipeline benchmark — the north-star metric.

Measures frames/sec/chip of the fused detect->crop->pose graph (the product
path: ros_demo.run_network equivalent) on whatever backend jax picks (the real
TPU chip under the driver). Baseline target: >=1000 fps/chip (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 1000.0  # driver target from BASELINE.json (no published ref number)


def main():
    from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                    PipelineConfig)
    from handnet_tpu.models.pipeline import HandNetPipeline

    batch = 8  # stream batch; per-frame latency path also works with batch=1
    cfg = HandNetConfig(
        a2j=A2JConfig(),
        fcos=FCOSConfig(num_classes=2, ext=False),
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

    iters = 20
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
