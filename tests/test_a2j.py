"""A2J model tests: head shapes, fused post-process vs a per-image numpy
oracle re-deriving a2j/anchor.py:44-82 math, loss parity with the same oracle,
and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import A2JConfig
from handnet_tpu.models.a2j import (A2J, A2JSystem, a2j_loss, a2j_postprocess,
                                    anchors_for)

SMALL = A2JConfig(crop_h=64, crop_w=64, num_joints=5)


def numpy_postprocess_oracle(cls, reg, depth, anchors):
    """Per-image softmax aggregation exactly as a2j/anchor.py:57-82."""
    out = []
    for j in range(cls.shape[0]):
        c = cls[j]                                  # [N, P]
        e = np.exp(c - c.max(axis=0, keepdims=True))
        w = e / e.sum(axis=0, keepdims=True)        # softmax over anchors
        pos = anchors[:, None, :] + reg[j]          # [N, P, 2]
        xy = (w[:, :, None] * pos).sum(0)           # [P, 2]
        d = (w * depth[j]).sum(0)[:, None]          # [P, 1]
        out.append(np.concatenate([xy, d], -1))
    return np.stack(out)


def test_postprocess_matches_oracle(rng):
    cfg = SMALL
    n = cfg.feat_h * cfg.feat_w * cfg.num_anchors
    p = cfg.num_joints
    cls = rng.normal(size=(2, n, p)).astype(np.float32)
    reg = rng.normal(size=(2, n, p, 2)).astype(np.float32) * 5
    depth = rng.normal(size=(2, n, p)).astype(np.float32)
    anchors = anchors_for(cfg)

    heads = {"cls": jnp.asarray(cls), "reg": jnp.asarray(reg),
             "depth": jnp.asarray(depth)}
    ours = np.asarray(a2j_postprocess(heads, jnp.asarray(anchors)))
    oracle = numpy_postprocess_oracle(cls, reg, depth, anchors)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def numpy_loss_oracle(cls, reg, depth, gt, anchors, spatial_factor=0.5):
    """Batch-mean losses exactly as a2j/anchor.py:99-153 (incl. the raw-L1
    depth quirk at :150)."""
    def sl1(d, beta=1.0):
        ad = np.abs(d)
        return np.where(ad <= beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)

    cls_losses, reg_losses = [], []
    for j in range(cls.shape[0]):
        c = cls[j]
        e = np.exp(c - c.max(axis=0, keepdims=True))
        w = e / e.sum(axis=0, keepdims=True)
        gt_xy = gt[j][:, :2]
        anchor_pos = (w[:, :, None] * anchors[:, None, :]).sum(0)
        cls_losses.append(sl1(gt_xy - anchor_pos).mean())
        pred = (w[:, :, None] * (anchors[:, None, :] + reg[j])).sum(0)
        rl = sl1(gt_xy - pred).mean() * spatial_factor
        pred_d = (w * depth[j]).sum(0)
        rl += np.abs(gt[j][:, 2] - pred_d).mean()
        reg_losses.append(rl)
    return np.mean(cls_losses), np.mean(reg_losses)


def test_loss_matches_oracle(rng):
    cfg = SMALL
    n = cfg.feat_h * cfg.feat_w * cfg.num_anchors
    p = cfg.num_joints
    cls = rng.normal(size=(3, n, p)).astype(np.float32)
    reg = rng.normal(size=(3, n, p, 2)).astype(np.float32)
    depth = rng.normal(size=(3, n, p)).astype(np.float32)
    gt = rng.uniform(0, 64, size=(3, p, 3)).astype(np.float32)
    anchors = anchors_for(cfg)

    heads = {"cls": jnp.asarray(cls), "reg": jnp.asarray(reg),
             "depth": jnp.asarray(depth)}
    cls_l, reg_l = a2j_loss(heads, jnp.asarray(gt), jnp.asarray(anchors),
                            spatial_factor=0.5)
    o_cls, o_reg = numpy_loss_oracle(cls, reg, depth, gt, anchors)
    np.testing.assert_allclose(float(cls_l), o_cls, rtol=1e-4)
    np.testing.assert_allclose(float(reg_l), o_reg, rtol=1e-4)


@pytest.fixture(scope="module")
def a2j_small():
    sys_ = A2JSystem(SMALL)
    variables = sys_.init(jax.random.PRNGKey(0))
    return sys_, variables


def test_forward_shapes(a2j_small):
    sys_, variables = a2j_small
    cfg = sys_.cfg
    x = jnp.zeros((2, cfg.crop_h, cfg.crop_w, 1))
    heads = sys_.apply(variables, x)
    n = cfg.feat_h * cfg.feat_w * cfg.num_anchors
    assert heads["cls"].shape == (2, n, cfg.num_joints)
    assert heads["reg"].shape == (2, n, cfg.num_joints, 2)
    assert heads["depth"].shape == (2, n, cfg.num_joints)


def test_predict_in_crop_range(a2j_small, rng):
    sys_, variables = a2j_small
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    uvd = sys_.predict(variables, x)
    assert uvd.shape == (2, 5, 3)
    assert np.isfinite(np.asarray(uvd)).all()
    # with random (near-zero) offsets, xy must lie inside the anchor hull
    assert (np.asarray(uvd[..., :2]) > -20).all()
    assert (np.asarray(uvd[..., :2]) < 84).all()


def test_train_step_grad_flows(a2j_small, rng):
    sys_, variables = a2j_small
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 64, size=(2, 5, 3)).astype(np.float32))

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        losses, _, _ = sys_.loss_and_predict(v, x, gt, train=True)
        return losses["total_loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least the head output convs must receive gradient
    gnorm = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert gnorm > 0
