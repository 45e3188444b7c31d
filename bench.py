"""End-to-end pipeline benchmark — the north-star metric.

Measures frames/sec/chip of the fused detect->crop->pose graph (the product
path: ros_demo.run_network equivalent) on whatever backend jax picks (the
real TPU chip under the driver). Baseline target: >=1000 fps/chip
(BASELINE.md; the reference publishes no numbers of its own).

Operating points live in configs/ and are selected with PROFILE:
  PROFILE=quant_static (default) the recommended serving point: the
                 REFERENCE architecture (tower depth 4, converted
                 checkpoints slot straight in) with calibrated static-int8
                 convs (nn/quant.py), detector at TRUE native 480x640.
                 Accuracy priced ~free on both stages (detector paired
                 study identical to 4 decimals, e2e gate +0.1 mm —
                 ROUND3_NOTES.md). batch 128.
  PROFILE=fast   same geometry/architecture in pure bf16 (no quantization;
                 the round-1/2 default). The reference's min-800 upscale
                 adds FLOPs, not information, hence native 480x640.
  PROFILE=parity detector at 800x1088, replicating the reference's
                 GeneralizedRCNNTransform min-800 resize. batch 128
                 (throughput knee, tools/perf_probe.py).
  PROFILE=turbo / PROFILE=quant: opt-in reduced-FLOP / dynamic-int8 points
                 (configs/*.yaml). QUANT=1|static composes the int8 conv
                 path onto any profile.
Both run the detector with num_classes=3, ext=False, matching the reference
pipeline's load_pretrained_fcos (handnet_pipeline/handnet_pipeline.py:14-24).

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
_REPO = os.path.dirname(os.path.abspath(__file__))


def resolve_config(env=os.environ):
    """PROFILE yaml + QUANT / PGN env composition (unit-tested)."""
    from handnet_tpu.config import load_config

    profile = env.get("PROFILE", "quant_static")
    overrides = {"fcos": {}, "a2j": {}}
    if env.get("QUANT") in ("1", "static"):
        # compose the int8 serving path (nn/quant.py) onto any profile,
        # e.g. QUANT=1 PROFILE=parity measures the reference geometry with
        # dynamic-int8 convs; QUANT=static uses calibrated scales instead
        q = "static" if env["QUANT"] == "static" else True
        overrides["fcos"]["quant"] = q
        overrides["a2j"]["quant"] = q
    if env.get("PGN") == "0":
        # kill-switch for the single-read pallas GroupNorm stats kernel
        overrides["fcos"]["pallas_gn"] = False
    elif env.get("PGN"):
        overrides["fcos"]["pallas_gn"] = True  # compose onto any profile
    return load_config(overrides if any(overrides.values()) else None,
                       yaml_path=os.path.join(_REPO, "configs",
                                              f"{profile}.yaml"))


def main():
    from handnet_tpu.models.pipeline import HandNetPipeline

    cfg = resolve_config()
    batch = cfg.train.batch_size

    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, 480, 640, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(batch, 480, 640)).astype(np.float32))

    if pipe.needs_calibration():
        # one-pass activation-scale calibration (quant_stats collection)
        variables = pipe.calibrate(variables, images, depth)

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
