"""Unit tests for box coders / IoU / GIoU (vs reference semantics at
fcos_utils/det_utils.py:121-294 and fcos_utils/utils.py:3-62)."""

import jax.numpy as jnp
import numpy as np

from handnet_tpu.ops import boxes as B


def random_boxes(rng, n):
    xy = rng.uniform(0, 100, size=(n, 2))
    wh = rng.uniform(1, 50, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def test_linear_coder_roundtrip(rng):
    anchors = random_boxes(rng, 32)
    boxes = random_boxes(rng, 32)
    codes = B.linear_encode(jnp.asarray(anchors), jnp.asarray(boxes))
    rec = B.linear_decode(codes, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(rec), boxes, rtol=1e-5, atol=1e-3)


def test_linear_encode_values():
    # square anchor centered at (10, 10), size 8; target box (6, 4, 18, 20)
    anchor = jnp.asarray([[6.0, 6.0, 14.0, 14.0]])
    box = jnp.asarray([[6.0, 4.0, 18.0, 20.0]])
    code = B.linear_encode(anchor, box, normalize_by_size=False)
    np.testing.assert_allclose(np.asarray(code[0]), [4.0, 6.0, 8.0, 10.0])
    code_n = B.linear_encode(anchor, box, normalize_by_size=True)
    np.testing.assert_allclose(np.asarray(code_n[0]),
                               [0.5, 0.75, 1.0, 1.25])


def test_delta_coder_roundtrip(rng):
    proposals = random_boxes(rng, 16)
    gt = random_boxes(rng, 16)
    codes = B.delta_encode(jnp.asarray(gt), jnp.asarray(proposals))
    rec = B.delta_decode(codes, jnp.asarray(proposals))
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-2)


def test_box_iou_manual():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0],
                     [0.0, 0.0, 10.0, 10.0]])
    iou = np.asarray(B.box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [25.0 / 175.0, 0.0, 1.0], rtol=1e-6)


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    same = np.asarray(B.giou_loss(a, a))
    np.testing.assert_allclose(same, [0.0], atol=1e-5)
    far = jnp.asarray([[100.0, 100.0, 110.0, 110.0]])
    val = float(B.giou_loss(a, far)[0])
    assert 1.0 < val <= 2.0  # GIoU in [-1, 1] -> loss in [0, 2]


def test_giou_matches_manual_overlap():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[5.0, 0.0, 15.0, 10.0]])
    # inter = 50, union = 150, iou = 1/3; enclosing = 150 -> giou = iou
    val = float(B.giou_loss(a, b)[0])
    np.testing.assert_allclose(val, 1.0 - 1.0 / 3.0, rtol=1e-6)


def test_clip_and_resize_boxes():
    boxes = jnp.asarray([[-5.0, -5.0, 700.0, 500.0]])
    clipped = np.asarray(B.clip_boxes(boxes, 480, 640))
    np.testing.assert_allclose(clipped, [[0, 0, 640, 480]])
    resized = np.asarray(B.resize_boxes(jnp.asarray([[10.0, 20.0, 30.0, 40.0]]),
                                        (480, 640), (960, 1280)))
    np.testing.assert_allclose(resized, [[20, 40, 60, 80]])
