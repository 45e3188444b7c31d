"""FCOS tests: head shapes, matcher vs a per-anchor python oracle
(fcos.py:530-568 semantics), decode geometry on synthetic heads, loss
finiteness + gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import FCOSConfig
from handnet_tpu.models.fcos import (FCOSSystem, anchors_for,
                                     decode_detections, fcos_loss,
                                     match_anchors, preprocess)

SMALL = FCOSConfig(image_h=64, image_w=96, max_detections=16, num_classes=3)


@pytest.fixture(scope="module")
def anchor_pack():
    return anchors_for(SMALL)


def test_preprocess_static_shape(rng):
    imgs = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    out, scale = preprocess(imgs, SMALL)
    assert out.shape == (2, 64, 96, 3)
    # 48x64 -> min(64/48, 96/64) = 4/3 -> 64x85
    np.testing.assert_allclose(scale, (64 / 48, 85 / 64), rtol=1e-6)


def python_matcher_oracle(anchors, sizes, slices, gt_boxes, radius=1.5):
    """Per-anchor re-derivation of the center-sampling matcher."""
    n = anchors.shape[0]
    first_count = slices[0][1]
    last_start = slices[-1][0]
    out = np.full(n, -1, np.int64)
    areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    for i in range(n):
        cx = (anchors[i, 0] + anchors[i, 2]) / 2
        cy = (anchors[i, 1] + anchors[i, 3]) / 2
        size = sizes[i]
        lower = 0.0 if i < first_count else size * 4
        upper = np.inf if i >= last_start else size * 8
        best_q = 0.0
        for m, gb in enumerate(gt_boxes):
            gcx, gcy = (gb[0] + gb[2]) / 2, (gb[1] + gb[3]) / 2
            if max(abs(cx - gcx), abs(cy - gcy)) >= radius * size:
                continue
            ltrb = [cx - gb[0], cy - gb[1], gb[2] - cx, gb[3] - cy]
            if min(ltrb) <= 0:
                continue
            if not (lower < max(ltrb) < upper):
                continue
            q = 1e8 - areas[m]
            if q > best_q:
                best_q = q
                out[i] = m
    return out


def test_matcher_matches_oracle(anchor_pack, rng):
    anchors, sizes, slices = anchor_pack
    gt = np.array([[10.0, 10.0, 40.0, 40.0],
                   [30.0, 20.0, 90.0, 60.0],
                   [5.0, 5.0, 20.0, 18.0]], np.float32)
    valid = np.array([True, True, True])
    ours = np.asarray(match_anchors(anchors, sizes, slices,
                                    jnp.asarray(gt), jnp.asarray(valid)))
    oracle = python_matcher_oracle(np.asarray(anchors), np.asarray(sizes),
                                   slices, gt)
    np.testing.assert_array_equal(ours, oracle)
    assert (ours >= 0).sum() > 0  # some anchors matched


def test_matcher_respects_validity(anchor_pack):
    anchors, sizes, slices = anchor_pack
    gt = np.array([[10.0, 10.0, 40.0, 40.0]], np.float32)
    m_valid = np.asarray(match_anchors(anchors, sizes, slices,
                                       jnp.asarray(gt),
                                       jnp.asarray([True])))
    m_invalid = np.asarray(match_anchors(anchors, sizes, slices,
                                         jnp.asarray(gt),
                                         jnp.asarray([False])))
    assert (m_valid >= 0).sum() > 0
    assert (m_invalid == -1).all()


def test_decode_places_box(anchor_pack):
    """Plant one confident anchor response; decode must recover its box."""
    anchors, sizes, slices = anchor_pack
    n = anchors.shape[0]
    cfg = SMALL
    cls = np.full((1, n, cfg.num_classes), -10.0, np.float32)
    ctr = np.full((1, n, 1), -10.0, np.float32)
    reg = np.zeros((1, n, 4), np.float32)
    # pick an anchor in level 0 around position (24, 16): idx = (2*12 + 3)
    idx = 2 * 12 + 3
    cls[0, idx, 1] = 10.0
    ctr[0, idx, 0] = 10.0
    reg[0, idx] = [1.0, 1.0, 2.0, 2.0]  # l,t,r,b normalized by anchor size 8
    head = {
        "cls_logits": jnp.asarray(cls),
        "bbox_ctrness": jnp.asarray(ctr),
        "bbox_regression": jnp.asarray(reg),
        "hand_lr": jnp.zeros((1, n, 2)),
    }
    det = decode_detections(head, anchors, cfg)
    det = jax.tree_util.tree_map(np.asarray, det)
    assert det["valid"][0, 0]
    assert det["valid"].sum() == 1
    assert det["labels"][0, 0] == 1
    # anchor center (24, 16), size 8: box = cx - l*8 ... cx + r*8
    np.testing.assert_allclose(det["boxes"][0, 0], [16, 8, 40, 32], atol=1e-4)
    assert det["scores"][0, 0] > 0.99


def test_decode_nms_suppresses_duplicates(anchor_pack):
    anchors, sizes, slices = anchor_pack
    n = anchors.shape[0]
    cfg = SMALL
    cls = np.full((1, n, cfg.num_classes), -10.0, np.float32)
    ctr = np.full((1, n, 1), 10.0, np.float32)
    reg = np.ones((1, n, 4), np.float32)
    # two adjacent anchors predicting (nearly) the same box
    for idx, sc in ((2 * 12 + 3, 10.0), (2 * 12 + 4, 8.0)):
        cls[0, idx, 1] = sc
    head = {
        "cls_logits": jnp.asarray(cls),
        "bbox_ctrness": jnp.asarray(ctr),
        "bbox_regression": jnp.asarray(reg),
        "hand_lr": jnp.zeros((1, n, 2)),
    }
    det = decode_detections(head, anchors, cfg)
    assert int(np.asarray(det["valid"]).sum()) == 1


@pytest.fixture(scope="module")
def fcos_small():
    sys_ = FCOSSystem(SMALL)
    variables = sys_.init(jax.random.PRNGKey(0))
    return sys_, variables


def test_fcos_forward_shapes(fcos_small):
    sys_, variables = fcos_small
    x = jnp.zeros((1, 64, 96, 3))
    head = sys_.module.apply(variables, x, train=False)
    n = sys_.anchors.shape[0]
    assert head["cls_logits"].shape == (1, n, 3)
    assert head["bbox_regression"].shape == (1, n, 4)
    assert head["bbox_ctrness"].shape == (1, n, 1)
    assert head["hand_lr"].shape == (1, n, 2)
    assert head["hand_contact_state"].shape == (1, n, 5)
    assert head["hand_dxdy"].shape == (1, n, 3)
    # dxdy (dx,dy) pair is L2-normalized * 0.1 (fcos.py:301-303)
    mags = np.linalg.norm(np.asarray(head["hand_dxdy"])[..., 1:], axis=-1)
    assert (mags < 0.1 + 1e-5).all()


def test_fcos_loss_and_grads(fcos_small, rng):
    sys_, variables = fcos_small
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    targets = {
        "boxes": jnp.asarray([[[10.0, 10.0, 40.0, 40.0], [0, 0, 0, 0]],
                              [[30.0, 20.0, 90.0, 60.0], [5, 5, 20, 18]]]),
        "labels": jnp.asarray([[2, 0], [1, 2]]),
        "valid": jnp.asarray([[True, False], [True, True]]),
        "box_info": jnp.asarray(
            rng.uniform(0, 1, size=(2, 2, 5)).astype(np.float32)),
    }

    def loss_fn(params):
        v = dict(variables, params=params)
        losses, _ = sys_.loss(v, x, targets, train=False)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
