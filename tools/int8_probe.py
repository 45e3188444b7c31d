"""Probe: does an int8 conv beat bf16 on this chip (v5e int8 = 2x bf16 TOPs)?

Times a tower-shaped 3x3 conv (fast-profile P3: 128x60x80x256) in bf16 vs
int8xint8->int32. Decides whether a quantized serving profile is worth
building. Run on the real TPU: `python tools/int8_probe.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu import runtime

runtime.setup()


def timed(fn, x, *args, iters=30, warmup=3):
    """fn must map x -> next x (same shape/dtype): the serial dependency
    chain defeats any dispatch dedup/caching in the remote tunnel. The
    stop-clock is a host READBACK of one element (block_until_ready on this
    backend can return before remote execution completes — measured)."""
    for _ in range(warmup):
        x = fn(x, *args)
    _ = np.asarray(x[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _ = np.asarray(x[0, 0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    B, H, W, C = 128, 60, 80, 256
    K = 3
    rng = np.random.default_rng(0)
    x_f = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w_f = jnp.asarray(rng.standard_normal((K, K, C, C)) * 0.05, jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (K, K, C, C)), jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_bf16(x, w):
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return jnp.tanh(out).astype(jnp.bfloat16)  # keep x bounded

    @jax.jit
    def conv_int8(x, w):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        # fake-requantize so the chain stays int8 (mimics real int8 serving)
        return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)

    @jax.jit
    def conv_int8_rescaled(x, w, sx, sw):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (sx * sw)
        return jnp.clip(out, -127, 127).astype(jnp.int8)

    flops = 2 * B * H * W * C * C * K * K
    t_bf = timed(conv_bf16, x_f, w_f)
    print(f"bf16 conv: {t_bf*1e3:8.2f} ms  {flops/t_bf/1e12:6.1f} TFLOP/s")
    t_i8 = timed(conv_int8, x_i, w_i)
    print(f"int8 conv: {t_i8*1e3:8.2f} ms  {flops/t_i8/1e12:6.1f} TOP/s")
    sx = jnp.float32(0.05)
    sw = jnp.ones((C,), jnp.float32) * 0.01
    t_i8r = timed(conv_int8_rescaled, x_i, w_i, sx, sw)
    print(f"int8+rescale: {t_i8r*1e3:5.2f} ms  {flops/t_i8r/1e12:6.1f} TOP/s")
    print(f"speedup int8/bf16: {t_bf/t_i8:.2f}x (rescaled {t_bf/t_i8r:.2f}x)")


if __name__ == "__main__":
    main()
