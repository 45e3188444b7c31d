"""Probe: how much does dynamic int8's per-sample amax pass cost vs a
static (calibrated) activation scale?

The shipped quant profile (nn/quant.py QuantConv) computes ``sx[b] =
max|x[b]|/127`` on the fly for every conv input — an extra full read of the
activation plus a reduction barrier before the int8 conv can start. A
static-calibration path replaces that with a per-layer constant, so the
quantize becomes a pure elementwise op XLA can fuse into the producer's
epilogue. This probe prices the difference on a tower-shaped chain
(fast-profile P3: 128x60x80x256, 3x3) so we know whether a calibration
pass is worth shipping.

Chain shape mimics real serving: float activations flow between "layers"
(dequant -> relu happens every step), only the quantize step differs.
Clocking per CLAUDE.md tunnel rules: iterations chain through the output,
stop-clock is a host readback.
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
    x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, K, C, C)) * 0.05, jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x0.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    wq = jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w), axis=(0, 1, 2),
                                         keepdims=True) / 127.0)),
                  -127, 127).astype(jnp.int8)
    sw = (jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0)  # [Cout]

    def body(xq, sx):
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
        # keep the chain bounded and float (mimics GN+ReLU between convs)
        return jnp.tanh(out * 0.02)

    @jax.jit
    def step_dynamic(x):
        amax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
        sx = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        return body(xq, sx)

    S_STATIC = jnp.float32(1.0 / 127.0)  # tanh output amax == 1 exactly

    @jax.jit
    def step_static(x):
        xq = jnp.clip(jnp.round(x / S_STATIC), -127, 127).astype(jnp.int8)
        return body(xq, S_STATIC)

    @jax.jit
    def step_bf16(x):
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32)
        return jnp.tanh(out * 0.02)

    flops = 2 * B * H * W * C * C * K * K
    t_dyn = timed(step_dynamic, x0)
    print(f"dynamic-quant step: {t_dyn*1e3:7.2f} ms  "
          f"{flops/t_dyn/1e12:6.1f} TOP/s")
    t_sta = timed(step_static, x0)
    print(f"static-quant step:  {t_sta*1e3:7.2f} ms  "
          f"{flops/t_sta/1e12:6.1f} TOP/s")
    t_bf = timed(step_bf16, x0)
    print(f"bf16 step:          {t_bf*1e3:7.2f} ms  "
          f"{flops/t_bf/1e12:6.1f} TFLOP/s")
    print(f"static vs dynamic: {t_dyn/t_sta:.3f}x   "
          f"dynamic vs bf16: {t_bf/t_dyn:.2f}x   "
          f"static vs bf16: {t_bf/t_sta:.2f}x")


if __name__ == "__main__":
    main()
