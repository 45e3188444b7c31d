"""Single-read pallas GroupNorm stats (ops/pallas_gn.py) vs flax GN.

The kernel must equal flax ``GroupNorm(32, use_fast_variance=False)`` — the
exact form the FCOS head towers use (reference fcos_utils/fcos.py:235-240)
— to fp tolerance, including on ragged tiles (H*W not a multiple of the
tile) and on every FPN level shape the towers actually see. Interpreter
mode on CPU; the on-chip numbers come from tools/gn_pallas_probe.py.

This is a STANDALONE op: 13-67x faster than the two-pass GN in isolation,
but in-pipeline it LOST to both the default and the gn_fast_variance XLA
path (tools/bench_gn_matrix.py, 2026-08-20 — the pallas_call is a fusion
barrier for the tower convs' epilogues), so the FCOSConfig serving flag
was removed. The kernel stays tested as ops-layer work.
"""

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.ops.pallas_gn import gn_group_stats, pallas_group_norm

RNG = np.random.default_rng(7)


def _ref_stats(x, groups):
    b, h, w, c = x.shape
    g = x.astype(np.float64).reshape(b, h * w, groups, c // groups)
    mean = g.mean(axis=(1, 3))
    var = g.var(axis=(1, 3))
    return mean, var


@pytest.mark.parametrize("shape,tile", [
    ((2, 60, 80, 256), 1024),   # P3 fast-profile tower shape (ragged: 4800/1024)
    ((3, 4, 5, 256), 1024),     # P7 (single short tile)
    ((2, 30, 40, 128), 256),    # multiple exact tiles + ragged tail
    ((1, 8, 16, 256), 128),     # exact division
])
def test_stats_match_reference(shape, tile):
    x = jnp.asarray(RNG.normal(2.0, 3.0, size=shape).astype(np.float32))
    stats = np.asarray(gn_group_stats(x, 32, tile=tile, interpret=True))
    mean, var = _ref_stats(np.asarray(x), 32)
    np.testing.assert_allclose(stats[:, 0], mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(stats[:, 1], var, rtol=1e-5, atol=1e-5)


def test_stats_large_offset_stability():
    """The Chan combine must survive mean >> std (the regime where the
    E[x^2]-E[x]^2 fast-variance form loses all precision in fp32)."""
    x = jnp.asarray((1000.0 + 0.1 * RNG.normal(size=(2, 30, 40, 256)))
                    .astype(np.float32))
    stats = np.asarray(gn_group_stats(x, 32, tile=256, interpret=True))
    mean, var = _ref_stats(np.asarray(x), 32)
    np.testing.assert_allclose(stats[:, 0], mean, rtol=1e-6)
    np.testing.assert_allclose(stats[:, 1], var, rtol=1e-2)
    assert (stats[:, 1] > 0).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_group_norm_matches_flax(dtype):
    x = jnp.asarray(RNG.normal(1.0, 2.0, size=(2, 15, 20, 256))
                    .astype(np.float32)).astype(dtype)
    scale = jnp.asarray(RNG.uniform(0.5, 1.5, size=(256,)).astype(np.float32))
    bias = jnp.asarray(RNG.normal(size=(256,)).astype(np.float32))

    got = pallas_group_norm(x, scale, bias, 32, eps=1e-5, dtype=dtype,
                            interpret=True)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype,
                      use_fast_variance=False)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    assert got.dtype == want.dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_group_norm_tower_shape_batchless():
    """The functional entry point must also accept the tower shapes the
    probe tool feeds it (regression guard for the standalone op now that
    no model module exercises it)."""
    x = jnp.asarray(RNG.normal(size=(1, 60, 80, 256)).astype(np.float32))
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    got = pallas_group_norm(x, scale, bias, 32, eps=1e-5,
                            dtype=jnp.float32, interpret=True)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_fast_variance=False)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
