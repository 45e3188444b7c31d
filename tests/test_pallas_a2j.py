"""Pallas fused A2J decode vs the einsum reference path (interpreter mode on
the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import A2JConfig
from handnet_tpu.models.a2j import a2j_postprocess, anchors_for
from handnet_tpu.ops.pallas_a2j import a2j_decode_pallas


def test_pallas_decode_matches_einsum(rng):
    cfg = A2JConfig(crop_h=64, crop_w=64, num_joints=8)
    n = cfg.feat_h * cfg.feat_w * cfg.num_anchors
    p = cfg.num_joints
    cls = rng.normal(size=(2, n, p)).astype(np.float32) * 2
    reg = rng.normal(size=(2, n, p, 2)).astype(np.float32) * 5
    depth = rng.normal(size=(2, n, p)).astype(np.float32)
    anchors = jnp.asarray(anchors_for(cfg))

    heads = {"cls": jnp.asarray(cls), "reg": jnp.asarray(reg),
             "depth": jnp.asarray(depth)}
    ref = np.asarray(a2j_postprocess(heads, anchors))
    got = np.asarray(a2j_decode_pallas(jnp.asarray(cls), jnp.asarray(reg),
                                       jnp.asarray(depth), anchors,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pallas_decode_bf16_inputs(rng):
    cfg = A2JConfig(crop_h=32, crop_w=32, num_joints=4)
    n = cfg.feat_h * cfg.feat_w * cfg.num_anchors
    p = cfg.num_joints
    cls = jnp.asarray(rng.normal(size=(1, n, p)).astype(np.float32)).astype(jnp.bfloat16)
    reg = jnp.asarray(rng.normal(size=(1, n, p, 2)).astype(np.float32)).astype(jnp.bfloat16)
    depth = jnp.asarray(rng.normal(size=(1, n, p)).astype(np.float32)).astype(jnp.bfloat16)
    anchors = jnp.asarray(anchors_for(cfg))
    out = a2j_decode_pallas(cls, reg, depth, anchors, interpret=True)
    assert out.shape == (1, p, 3)
    assert np.isfinite(np.asarray(out)).all()
