"""Pallas TPU kernel for GroupNorm statistics — single HBM read.

Motivation (measured, tools/trace_capture.py + tools/gn_probe.py): the FCOS
head towers' GroupNorm(32) statistic passes are the largest non-conv cost in
the serving graph (~30 ms/batch at the fast profile — 8 identical
convert+reduce fusions of 3.7 ms each on the P3 level). XLA lowers the
centered two-pass variance (flax ``use_fast_variance=False``, the form the
trainers need for stability) as two full-tensor HBM reads, and the grouped
reduction runs at ~230 GB/s against the chip's ~819 GB/s — there is both a
pass to remove and bandwidth headroom.

This kernel computes the exact same centered statistics in ONE streaming
read: each grid step loads a [T, C] tile of the flattened [B, H*W, C]
activation, computes the tile's per-channel mean and centered second moment
entirely in VMEM (an exact two-pass — the tile is resident), and folds them
into per-channel running statistics with Chan's parallel-variance combine

    delta = mean_t - mean;  n' = n + n_t
    mean' = mean + delta * n_t / n'
    M2'   = M2 + M2_t + delta^2 * n * n_t / n'

which is numerically stable (no E[x^2]-E[x]^2 cancellation — the failure
mode that NaN'd training with flax's fast-variance form, models/fcos.py).
The last tile folds channels into groups (exact, same combine with equal
counts) and writes the [2, G] (mean, biased var) block. The normalize/affine
apply stays in XLA where it fuses into neighbours.

Equality with flax ``GroupNorm(use_fast_variance=False)`` is fp-rounding
only (different summation order); asserted in tests/test_pallas_gn.py and
on-chip by tools/gn_pallas_probe.py. Inference-only by design (no custom
VJP — the trainers keep flax GN).

STANDALONE OP ONLY since round 4: on-chip it wins 13-67x in isolation
(gn_pallas_probe, 2026-08-19) but LOSES inside the full serving graph
(tools/bench_gn_matrix.py, 2026-08-20 — below even the exact two-pass
default on both the fast and quant_static profiles): the pallas_call is an
opaque fusion barrier, so the tower convs' epilogues XLA normally fuses
into the stats reads come back as extra HBM passes. The former serving
flag was removed in round 4 (no config field references this op anymore);
the shipped fast path is flax ``use_fast_variance=True``
(FCOSConfig.gn_fast_variance, +5% e2e).

Reference counterpart: the torch ``nn.GroupNorm`` inside the FCOS head
towers (fcos_utils/fcos.py:235-240,355-360) — semantics identical, this is
purely a lowering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(hw: int, tile: int, num_groups: int,
                  x_ref, out_ref, mean_ref, m2_ref):
    """Grid (B, nT). Blocks: x [1, T, C]; out [1, 2, G] (same block for all
    t of a batch row — written on the last tile). Scratch: per-channel
    running mean / M2, [1, C] f32, reinitialized at t == 0."""
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    x = x_ref[0].astype(jnp.float32)                        # [T, C]
    # rows beyond H*W in the (only) ragged last tile are invalid: their
    # block content is unspecified, so select (never multiply) them away
    n_t = jnp.minimum(jnp.int32(tile), jnp.int32(hw) - t * tile)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = rows < n_t
    n_t_f = n_t.astype(jnp.float32)

    xm = jnp.where(valid, x, 0.0)
    mean_t = jnp.sum(xm, axis=0, keepdims=True) / n_t_f     # [1, C]
    diff = jnp.where(valid, x - mean_t, 0.0)
    m2_t = jnp.sum(diff * diff, axis=0, keepdims=True)      # [1, C]

    @pl.when(t == 0)
    def _():
        mean_ref[:] = mean_t
        m2_ref[:] = m2_t

    @pl.when(t > 0)
    def _():
        # every tile before this one was full: n_prev = t * tile
        n_prev = (t * tile).astype(jnp.float32)
        n_new = n_prev + n_t_f
        delta = mean_t - mean_ref[:]
        mean_ref[:] = mean_ref[:] + delta * (n_t_f / n_new)
        m2_ref[:] = (m2_ref[:] + m2_t
                     + delta * delta * (n_prev * n_t_f / n_new))

    @pl.when(t == n_tiles - 1)
    def _():
        # fold channels into groups — same combine, equal per-channel
        # counts (hw), so the group mean is the plain channel-mean average.
        # Group selection via iota-built 0/1 matmuls (no lane-axis
        # reshape/transpose — those relayouts are the Mosaic-fragile ops).
        c = mean_ref.shape[1]
        k = c // num_groups
        f32 = jnp.float32
        cid = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gid = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        pick = (cid // k == gid).astype(f32)                # [C, G]
        gid2 = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 0)
        cid2 = jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 1)
        pick_t = (cid2 // k == gid2).astype(f32)            # [G, C]

        mc = mean_ref[:]                                    # [1, C]
        gmean = jnp.dot(mc, pick,
                        preferred_element_type=f32) / float(k)   # [1, G]
        gmean_c = jnp.dot(gmean, pick_t,
                          preferred_element_type=f32)       # [1, C]
        dev = mc - gmean_c
        gm2 = (jnp.dot(m2_ref[:], pick, preferred_element_type=f32)
               + float(hw) * jnp.dot(dev * dev, pick,
                                     preferred_element_type=f32))
        gvar = gm2 / float(hw * k)                          # biased, like GN
        out_ref[0] = jnp.concatenate([gmean, gvar], axis=0)  # [2, G]


@partial(jax.jit, static_argnames=("num_groups", "tile", "interpret"))
def gn_group_stats(x: jnp.ndarray, num_groups: int, tile: int = 1024,
                   interpret: bool = False) -> jnp.ndarray:
    """Per-(batch, group) GroupNorm statistics of NHWC ``x`` in one HBM read.

    Returns [B, 2, G] float32: ``[:, 0]`` group means, ``[:, 1]`` biased
    group variances over (H, W, C/G) — exactly flax GroupNorm's reduction
    (use_fast_variance=False) up to summation order.
    """
    b, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    hw = h * w
    x2 = x.reshape(b, hw, c)
    t = min(tile, max(8, hw))
    n_tiles = pl.cdiv(hw, t)
    return pl.pallas_call(
        partial(_stats_kernel, hw, t, num_groups),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, num_groups), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, num_groups), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(x2)


def pallas_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      num_groups: int, eps: float = 1e-5,
                      dtype=None, interpret: bool = False) -> jnp.ndarray:
    """GroupNorm over the channel (last) axis of NHWC ``x``: stats via the
    single-read pallas kernel, normalize/affine in XLA (fuses into the
    consumer). Matches ``flax.linen.GroupNorm(num_groups, epsilon=eps,
    use_fast_variance=False)`` to fp tolerance."""
    b, h, w, c = x.shape
    k = c // num_groups
    stats = gn_group_stats(x, num_groups, interpret=interpret)  # [B, 2, G]
    mean = jnp.repeat(stats[:, 0], k, axis=-1)                  # [B, C]
    inv = jax.lax.rsqrt(stats[:, 1] + eps)
    inv = jnp.repeat(inv, k, axis=-1)
    mean = mean[:, None, None, :]
    inv = inv[:, None, None, :]
    y = (x.astype(jnp.float32) - mean) * inv
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype or x.dtype)
