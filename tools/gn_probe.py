"""Probe: GroupNorm statistics formulations on tower-shaped activations.

The fast-profile trace (tools/trace_capture.py) shows 8 identical
``convert_reduce_fusion`` kernels at 3.73 ms each — the P3-level tower
GroupNorm statistic reductions — ~30 ms/batch, 27% of the whole fused
step, running at only ~170 GB/s effective. Hypothesis: flax's GroupNorm
reduces over ``[H, W, C/G]`` after a ``[B,H,W,G,C/G]`` reshape, leaving
only C/G = 8 channels in the minor (lane) axis — 8 of the TPU's 128
vector lanes do work.

The channel-major reformulation computes per-CHANNEL spatial sums first
(minor axis intact: all 256 lanes busy), then combines the 8 channels of
each group on the tiny ``[B, C]`` result — mathematically identical
(a sum over a group IS the sum of its per-channel sums), same two-pass
centered variance, no fast-variance cancellation risk.

Run on the real TPU. Clocking per CLAUDE.md tunnel rules.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu import runtime

runtime.setup()

B, H, W, C, G = 128, 60, 80, 256, 32


def timed(fn, x, *args, iters=30, warmup=3):
    for _ in range(warmup):
        x = fn(x, *args)
    _ = np.asarray(x[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _ = np.asarray(x[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


def channel_major_gn(x, scale, bias, eps=1e-5):
    """Two-pass centered GN with channel-major (full-lane) reductions."""
    cg = C // G
    xf = x.astype(jnp.float32)
    n = H * W * cg
    s1 = xf.sum(axis=(1, 2))                              # [B, C] streaming
    mu_g = s1.reshape(B, G, cg).sum(-1) / n               # [B, G] tiny
    mu_c = jnp.broadcast_to(mu_g[..., None], (B, G, cg)).reshape(B, C)
    d = xf - mu_c[:, None, None, :]
    s2 = (d * d).sum(axis=(1, 2))                         # [B, C] streaming
    var_g = s2.reshape(B, G, cg).sum(-1) / n              # [B, G]
    var_c = jnp.broadcast_to(var_g[..., None], (B, G, cg)).reshape(B, C)
    out = d * jax.lax.rsqrt(var_c + eps)[:, None, None, :]
    return (out * scale + bias).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 2 + 1, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32)

    gn_slow = nn.GroupNorm(num_groups=G, epsilon=1e-5, dtype=jnp.bfloat16,
                           use_fast_variance=False)
    gn_fast = nn.GroupNorm(num_groups=G, epsilon=1e-5, dtype=jnp.bfloat16,
                           use_fast_variance=True)
    variables = {"params": {"scale": scale, "bias": bias}}

    # correctness first: channel-major == flax (same math, fp32 stats)
    ref = np.asarray(gn_slow.apply(variables, x), np.float32)
    got = np.asarray(channel_major_gn(x, scale, bias), np.float32)
    err = np.abs(ref - got).max()
    print(f"max |channel_major - flax| = {err:.3e} (bf16 output)")
    assert err <= 0.0625, err  # one bf16 ulp at these magnitudes

    f_slow = jax.jit(lambda t: (gn_slow.apply(variables, t)
                                + t * jnp.bfloat16(1e-3)))
    f_fast = jax.jit(lambda t: (gn_fast.apply(variables, t)
                                + t * jnp.bfloat16(1e-3)))
    f_cm = jax.jit(lambda t: (channel_major_gn(t, scale, bias)
                              + t * jnp.bfloat16(1e-3)))

    bytes_2pass = 3 * x.size * 2  # read x twice + write once, bf16
    for name, f in [("flax GN (2-pass)", f_slow),
                    ("flax GN (fast-var)", f_fast),
                    ("channel-major GN", f_cm)]:
        t = timed(f, x)
        print(f"{name:20s} {t*1e3:7.2f} ms   "
              f"{bytes_2pass/t/1e9:6.0f} GB/s effective")


if __name__ == "__main__":
    main()
