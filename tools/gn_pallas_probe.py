"""On-chip probe: single-read pallas GroupNorm (ops/pallas_gn.py) vs flax.

Times the full GN op (stats + normalize/affine) on the FCOS tower shapes at
batch 128 — P3 dominates the serving graph's GN cost (8 identical
convert+reduce fusions, ~30 ms/batch at the fast profile,
tools/trace_capture.py). Follows the CLAUDE.md micro-benchmark rules for
the remote tunnel: every iteration chains its output into the next input
(no identical-args replay) and the clock stops on a host readback.

Run: python tools/gn_pallas_probe.py [--batch 128] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from handnet_tpu import runtime as _runtime  # noqa: E402

_runtime.setup()

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from handnet_tpu.ops.pallas_gn import pallas_group_norm  # noqa: E402


def _time_chained(fn, x, iters):
    """Chained loop, readback stop-clock (CLAUDE.md tunnel rules)."""
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = np.asarray(x[0, 0, 0, :1])  # host readback stops the clock
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    c = 256
    scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    gn_flax = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16,
                           use_fast_variance=False)
    # XLA-only single-read alternative: fast variance (E[x^2]-E[x]^2) lets
    # XLA fuse both stat reductions into ONE pass over x — if this matches
    # the pallas kernel's win, ship a serving flag instead of a kernel.
    # (use_fast_variance=False is a TRAINING-gradient constraint,
    # models/fcos.py ConvTower; inference accuracy is checked here via
    # max|diff| against the exact two-pass form.)
    gn_fastv = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16,
                            use_fast_variance=True)
    flax_vars = {"params": {"scale": scale, "bias": bias}}

    # chain via tanh: keeps values bounded so 30 chained GNs stay finite
    flax_fn = jax.jit(lambda x: jnp.tanh(gn_flax.apply(flax_vars, x)) + x)
    fastv_fn = jax.jit(lambda x: jnp.tanh(gn_fastv.apply(flax_vars, x)) + x)
    pgn_fn = jax.jit(lambda x: jnp.tanh(pallas_group_norm(
        x, scale, bias, 32, eps=1e-5, dtype=jnp.bfloat16,
        interpret=interpret)) + x)

    shapes = {"P3-fast": (args.batch, 60, 80, c),
              "P4-fast": (args.batch, 30, 40, c),
              "P3-parity": (args.batch, 100, 136, c)}
    for name, shape in shapes.items():
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) \
            .astype(jnp.bfloat16)
        bytes_rw = int(np.prod(shape)) * 2
        t_flax = _time_chained(flax_fn, x, args.iters)
        t_fastv = _time_chained(fastv_fn, x, args.iters)
        t_pgn = _time_chained(pgn_fn, x, args.iters)
        # sanity: the chains must agree
        yf = np.asarray(flax_fn(x), np.float32)
        yp = np.asarray(pgn_fn(x), np.float32)
        yv = np.asarray(fastv_fn(x), np.float32)
        err = float(np.abs(yf - yp).max())
        err_v = float(np.abs(yf - yv).max())
        # per-path traffic: flax lowers to ~3 passes over x (stat read +
        # normalize read + write); the pallas kernel's whole point is one
        # stat read, so its traffic is ~2x (normalize read + write counts
        # once each; the fused tanh/add epilogue is shared by both)
        print(f"{name} {shape}: flax {t_flax*1e3:.2f} ms "
              f"({bytes_rw*3/t_flax/1e9:.0f} GB/s eff @3x traffic) | "
              f"fastvar {t_fastv*1e3:.2f} ms "
              f"({bytes_rw*2/t_fastv/1e9:.0f} GB/s eff @2x traffic, "
              f"max|diff| {err_v:.3g}) | pallas "
              f"{t_pgn*1e3:.2f} ms ({bytes_rw*2/t_pgn/1e9:.0f} GB/s eff "
              f"@2x traffic) | speedup flax/pallas {t_flax/t_pgn:.2f}x "
              f"flax/fastvar {t_flax/t_fastv:.2f}x | max|diff| {err:.3g}")


if __name__ == "__main__":
    main()
