"""Validate bench.py's stop-clock against a host-readback stop-clock.

tools/int8_probe.py exposed that on the axon remote backend,
`jax.block_until_ready` can return BEFORE remote execution completes for
small single-op graphs (a 725-GFLOP conv "finished" in 0.05 ms). This tool
times the exact bench.py loop both ways in one process:

  A) bench.py's clock: N dispatches + block_until_ready on the last output
  B) readback clock:   N dispatches + np.asarray of one output element
                       (the host readback cannot complete early)

If A ~= B the published fps numbers are real. Run: PROFILE=fast python
tools/bench_clock_check.py
"""
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


def main():
    from handnet_tpu.config import load_config
    from handnet_tpu.models.pipeline import HandNetPipeline

    profile = os.environ.get("PROFILE", "fast")
    cfg = load_config(yaml_path=os.path.join(_REPO, "configs",
                                             f"{profile}.yaml"))
    batch = cfg.train.batch_size
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, 480, 640, 3))
                         .astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(batch, 480, 640))
                        .astype(np.float32))
    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    jax.block_until_ready(fwd(variables, images, depth))

    iters = 40
    for name in ("block_until_ready", "readback", "block_until_ready",
                 "readback"):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, images, depth)
        if name == "readback":
            _ = np.asarray(out[0, 0, 0])
        else:
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"{name:18s}: {batch * iters / dt:8.1f} fps "
              f"({1e3 * dt / iters:.2f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
