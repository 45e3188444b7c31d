"""Pallas TPU kernel for the fused A2J decode.

The A2J aggregation (reference a2j/anchor.py:57-82) is: per (batch, joint),
softmax over the N=H*W*A anchor responses, then softmax-weighted sums of the
anchor+offset positions and depths. The XLA einsum version (models/a2j.py)
materializes the [B, N, P] softmax weights in HBM between the softmax and the
reductions — this kernel keeps everything in VMEM for one (batch) program:
max, exp, and all four weighted accumulations fused, writing only the
[P, 4] partials (swu, swv, swd, sw) back out.

Numerics match the einsum path to fp32 rounding (same max-subtracted
softmax). Used by models/a2j.a2j_postprocess(use_pallas=True); tests run it
in interpreter mode on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(cls_ref, regu_ref, regv_ref, depth_ref, anc_ref, out_ref):
    """One batch element. Block shapes: cls/regu/regv/depth [1, N, P],
    anchors [N, 2], out [1, P, 4]."""
    cls = cls_ref[0].astype(jnp.float32)            # [N, P]
    m = jnp.max(cls, axis=0, keepdims=True)
    w = jnp.exp(cls - m)                            # [N, P]
    denom = jnp.sum(w, axis=0)                      # [P]

    anc_u = anc_ref[:, 0:1]                         # [N, 1]
    anc_v = anc_ref[:, 1:2]
    pos_u = anc_u + regu_ref[0].astype(jnp.float32)  # [N, P]
    pos_v = anc_v + regv_ref[0].astype(jnp.float32)

    su = jnp.sum(w * pos_u, axis=0)
    sv = jnp.sum(w * pos_v, axis=0)
    sd = jnp.sum(w * depth_ref[0].astype(jnp.float32), axis=0)

    inv = 1.0 / denom
    out_ref[0] = jnp.stack([su * inv, sv * inv, sd * inv, denom], axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def a2j_decode_pallas(cls: jnp.ndarray, reg: jnp.ndarray, depth: jnp.ndarray,
                      anchors: jnp.ndarray, interpret: bool = False
                      ) -> jnp.ndarray:
    """Fused decode: cls [B,N,P], reg [B,N,P,2], depth [B,N,P],
    anchors [N,2] -> uvd [B,P,3]."""
    b, n, p = cls.shape
    f32 = jnp.float32
    out = pl.pallas_call(
        _decode_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p, 4), f32),
        interpret=interpret,
    )(cls.astype(f32), reg[..., 0].astype(f32), reg[..., 1].astype(f32),
      depth.astype(f32), anchors.astype(f32))
    return out[..., :3]
