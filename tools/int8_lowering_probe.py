"""Probe: can a different lowering beat XLA's int8 conv on v5e?

tools/int8_probe.py measured the tower-shaped int8 conv at ~200 TOP/s —
51% of the 394 TOP/s int8 MXU peak. This probe asks whether the gap is the
*conv* lowering or the arithmetic itself, by timing the same 3x3 int8
convolution three ways:

1. ``conv``  — `lax.conv_general_dilated` int8xint8->int32 (the shipped
   QuantConv path, nn/quant.py:139-145);
2. ``shift`` — shift-and-accumulate: pad once, then 9 shifted
   ``[B*H*W, Cin] x [Cin, Cout]`` int8 GEMMs accumulated in int32 (the
   MXU-native matmul path; reads the activation 9x from HBM but each read
   is int8);
3. ``gemm``  — one giant int8 GEMM of the same FLOP count (``[B*H*W, 9*Cin]
   x [9*Cin, Cout]`` on pre-materialized im2col input) as the
   arithmetic-only speed-of-light for this shape (im2col cost excluded —
   NOT a deployable path, just the bound).

Clocking per CLAUDE.md tunnel rules: iterations chain x through the op and
the stop-clock is a host readback. Run on the real TPU.
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
    for _ in range(warmup):
        x = fn(x, *args)
    _ = np.asarray(x.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    _ = np.asarray(x.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    B, H, W, C = 128, 60, 80, 256
    K = 3
    rng = np.random.default_rng(0)
    x_i = jnp.asarray(rng.integers(-127, 128, (B, H, W, C)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (K, K, C, C)), jnp.int8)
    flops = 2 * B * H * W * C * C * K * K

    dn = jax.lax.conv_dimension_numbers((B, H, W, C), (K, K, C, C),
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv(x, w):
        acc = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)

    @jax.jit
    def shift(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B * H * W, C), jnp.int32)
        for dy in range(K):
            for dx in range(K):
                window = jax.lax.dynamic_slice(xp, (0, dy, dx, 0),
                                               (B, H, W, C))
                acc = acc + jax.lax.dot_general(
                    window.reshape(B * H * W, C), w[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8).reshape(
            B, H, W, C)

    @jax.jit
    def gemm(cols, wmat):
        acc = jax.lax.dot_general(cols, wmat, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)

    t_conv = timed(conv, x_i, w_i)
    print(f"conv  (lax.conv int8): {t_conv*1e3:7.2f} ms  "
          f"{flops/t_conv/1e12:6.1f} TOP/s")

    # correctness cross-check before timing the shift path
    a = np.asarray(conv(x_i, w_i))
    b = np.asarray(shift(x_i, w_i).reshape(B, H, W, C))
    assert np.array_equal(a, b), "shift-accumulate != conv"
    t_shift = timed(shift, x_i, w_i)
    print(f"shift (9 int8 GEMMs):  {t_shift*1e3:7.2f} ms  "
          f"{flops/t_shift/1e12:6.1f} TOP/s")

    cols = jnp.asarray(rng.integers(-127, 128, (B * H * W, K * K * C)),
                       jnp.int8)
    wmat = jnp.asarray(rng.integers(-127, 128, (K * K * C, C)), jnp.int8)
    # chain: feed the int8 output back as the first C columns
    @jax.jit
    def gemm_chain(cols, wmat):
        out = gemm(cols, wmat)
        return jax.lax.dynamic_update_slice(cols, out, (0, 0))

    t_gemm = timed(gemm_chain, cols, wmat)
    print(f"gemm  (arithmetic SoL): {t_gemm*1e3:6.2f} ms  "
          f"{flops/t_gemm/1e12:6.1f} TOP/s  (im2col excluded)")
    print(f"shift vs conv: {t_conv/t_shift:.2f}x; "
          f"gemm vs conv: {t_conv/t_gemm:.2f}x")


if __name__ == "__main__":
    main()
