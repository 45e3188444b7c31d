"""Pre-bake bench.py's static-int8 calibration artifact on CPU.

bench.py's default profile (quant_static) needs a calibration pass before
serving; done live on the TPU that costs TWO extra graph compiles through
the remote tunnel (detector-calibrate + detect-and-crop->a2j-calibrate)
before the forward even builds — the exact fragility that produced the
round-3 rc=124 (VERDICT.md "What's weak" #1). Calibration activation
amaxes are DATA statistics, not timings: baking them on CPU from bench's
exact seed-0 params + seed-0 frames gives a numerically valid artifact and
leaves the driver path exactly one TPU compile.

Writes configs/bench_calib.npz (nn.quant.save_calibration layout). Uses a
subset of bench's 128 frames — amax folds with max, so a representative
subset calibrates identically in structure and near-identically in value;
values affect int8 rounding only, never kernel timing.

Run after any change to the quant layer layout:
    $ python tools/bake_bench_calibration.py [--batch 8]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the tunnel

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="frames from bench's seed-0 draw to calibrate on")
    ap.add_argument("--out", default=os.path.join(_REPO, "configs",
                                                  "bench_calib.npz"))
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    import bench
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn import quant as quantlib

    cfg = bench.resolve_config(env={"PROFILE": "quant_static"})
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))

    # bench's exact frames (seed 0, full batch drawn, subset used)
    full = cfg.train.batch_size
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(full, 480, 640, 3)).astype(np.float32)
    depth = rng.uniform(0.3, 1.0, size=(full, 480, 640)).astype(np.float32)
    n = min(args.batch, full)
    variables = pipe.calibrate(variables, jnp.asarray(images[:n]),
                               jnp.asarray(depth[:n]))
    quantlib.assert_calibrated(variables)
    count = quantlib.save_calibration(args.out, variables)
    print(f"saved {count} calibration scalars -> {args.out}")


if __name__ == "__main__":
    main()
