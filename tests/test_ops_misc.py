"""Focal loss vs torch, NMS vs a greedy numpy oracle, crop-resize vs
torch.nn.functional.interpolate (the exact op the reference pipeline uses at
handnet_pipeline.py:101), and geometry round-trips vs scipy."""

import jax.numpy as jnp
import numpy as np
import torch

from handnet_tpu.ops.crop_resize import (batch_crop_resize, crop_resize_nearest,
                                         pad_box)
from handnet_tpu.ops.focal import bce_with_logits, sigmoid_focal_loss, smooth_l1
from handnet_tpu.ops.geometry import (align_w_scale, align_w_scale_np,
                                      convert_joints, uvd2xyz, xyz2uvd)
from handnet_tpu.ops.nms import batched_nms_fixed, nms_fixed


# ---------------------------------------------------------------------------
# focal / smooth-l1 / bce


def torch_sigmoid_focal(logits, targets, alpha=0.25, gamma=2.0):
    p = torch.sigmoid(logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * loss


def test_focal_matches_torch(rng):
    logits = rng.normal(size=(4, 7, 3)).astype(np.float32) * 3
    targets = (rng.uniform(size=(4, 7, 3)) > 0.7).astype(np.float32)
    ours = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch_sigmoid_focal(torch.tensor(logits), torch.tensor(targets)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_bce_matches_torch(rng):
    logits = rng.normal(size=(50,)).astype(np.float32) * 4
    targets = rng.uniform(size=(50,)).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(targets), reduction="none").numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_smooth_l1_matches_torch(rng):
    d = rng.normal(size=(100,)).astype(np.float32) * 3
    for beta in (1.0, 3.0):
        ours = np.asarray(smooth_l1(jnp.asarray(d), beta=beta))
        ref = torch.nn.functional.smooth_l1_loss(
            torch.tensor(d), torch.zeros(100), beta=beta,
            reduction="none").numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# NMS


def greedy_nms_oracle(boxes, scores, labels, valid, thresh):
    """Straightforward O(n^2) python NMS in descending-score order."""
    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, x2 - x1) * max(0, y2 - y1)
        area = lambda bb: (bb[2] - bb[0]) * (bb[3] - bb[1])
        return inter / max(area(a) + area(b) - inter, 1e-9)

    keep = valid.copy()
    for i in range(len(boxes)):
        if not keep[i]:
            continue
        for j in range(i + 1, len(boxes)):
            if keep[j] and labels[i] == labels[j] and iou(boxes[i], boxes[j]) > thresh:
                keep[j] = False
    return keep


def test_nms_matches_oracle(rng):
    n = 48
    xy = rng.uniform(0, 60, size=(n, 2))
    wh = rng.uniform(5, 40, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = np.sort(rng.uniform(size=n).astype(np.float32))[::-1].copy()
    labels = rng.integers(0, 3, size=n)
    valid = rng.uniform(size=n) > 0.2
    ours = np.asarray(batched_nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                                        jnp.asarray(labels), jnp.asarray(valid),
                                        0.3))
    oracle = greedy_nms_oracle(boxes, scores, labels, valid, 0.3)
    np.testing.assert_array_equal(ours, oracle)


def test_nms_single_class(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.ones(3, bool), 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


# ---------------------------------------------------------------------------
# crop-resize vs torch F.interpolate (nearest), the pipeline's exact op


def test_crop_resize_nearest_matches_torch(rng):
    img = rng.normal(size=(120, 160)).astype(np.float32)
    for box in ([3, 7, 90, 100], [0, 0, 159, 119], [10, 10, 20, 15]):
        x1, y1, x2, y2 = box
        ours = np.asarray(crop_resize_nearest(
            jnp.asarray(img)[..., None], jnp.asarray(box, jnp.int32), 176, 176)
        )[..., 0]
        # reference: F.interpolate(depth[y1:y2+1, x1:x2+1], size=(176,176)),
        # default mode='nearest' (handnet_pipeline.py:101)
        crop = torch.tensor(img[y1:y2 + 1, x1:x2 + 1])[None, None]
        ref = torch.nn.functional.interpolate(crop, size=(176, 176))[0, 0].numpy()
        np.testing.assert_allclose(ours, ref)


def test_batch_crop_resize_shapes(rng):
    imgs = rng.normal(size=(3, 64, 64, 1)).astype(np.float32)
    boxes = np.array([[0, 0, 31, 31], [10, 10, 60, 60], [5, 0, 63, 63]],
                     np.int32)
    out = batch_crop_resize(jnp.asarray(imgs), jnp.asarray(boxes), 32, 32)
    assert out.shape == (3, 32, 32, 1)


def test_pad_box_matches_reference_semantics():
    # reference: int box, subtract int(0.4*w) with python float->int truncation
    box = jnp.asarray([100, 50, 200, 150], jnp.int32)
    padded = np.asarray(pad_box(box, 0.4, 480, 640))
    np.testing.assert_array_equal(padded, [60, 10, 240, 190])
    # clipping
    box2 = jnp.asarray([5, 5, 630, 470], jnp.int32)
    padded2 = np.asarray(pad_box(box2, 0.4, 480, 640))
    np.testing.assert_array_equal(padded2, [0, 0, 640, 480])


# ---------------------------------------------------------------------------
# geometry


def test_uvd_xyz_roundtrip(rng):
    paras = np.array([600.0, 600.0, 320.0, 240.0], np.float32)
    xyz = rng.uniform(0.2, 1.0, size=(21, 3)).astype(np.float32)
    uvd = xyz2uvd(jnp.asarray(xyz), jnp.asarray(paras))
    back = uvd2xyz(uvd, jnp.asarray(paras))
    np.testing.assert_allclose(np.asarray(back), xyz, rtol=1e-5, atol=1e-5)


def test_convert_joints_matches_reference_math(rng):
    """Independent numpy re-derivation of a2j/a2j.py:17-43."""
    paras = np.array([600.0, 600.0, 320.0, 240.0], np.float64)
    box = np.array([100.0, 80.0, 300.0, 260.0])
    jt = rng.uniform(0, 176, size=(21, 3))
    jt[:, 2] = rng.uniform(0.3, 0.9, size=21)

    u = jt[:, 0] * (box[2] - box[0]) / 176 + box[0]
    v = jt[:, 1] * (box[3] - box[1]) / 176 + box[1]
    x = (u - paras[2]) * jt[:, 2] / paras[0] * 1000
    y = (v - paras[3]) * jt[:, 2] / paras[1] * 1000
    z = jt[:, 2] * 1000

    ours = np.asarray(convert_joints(jnp.asarray(jt, jnp.float32),
                                     jnp.asarray(box, jnp.float32),
                                     jnp.asarray(paras, jnp.float32)))
    np.testing.assert_allclose(ours, np.stack([x, y, z], -1), rtol=1e-4)


def test_align_w_scale_matches_scipy(rng):
    from scipy.linalg import orthogonal_procrustes

    gt = rng.normal(size=(21, 3))
    pred = rng.normal(size=(21, 3))

    # scipy-based oracle (freihand/eval.py:71-94 semantics)
    t1, t2 = gt.mean(0), pred.mean(0)
    a, b = gt - t1, pred - t2
    s1 = np.linalg.norm(a) + 1e-8
    s2 = np.linalg.norm(b) + 1e-8
    a, b = a / s1, b / s2
    r, s = orthogonal_procrustes(a, b)
    oracle = (b @ r.T * s) * s1 + t1

    ours_np = align_w_scale_np(gt, pred)
    np.testing.assert_allclose(ours_np, oracle, rtol=1e-6, atol=1e-8)

    # the on-device variant runs fp32 SVD (no x64) — looser tolerance
    ours_jax = np.asarray(align_w_scale(jnp.asarray(gt), jnp.asarray(pred)))
    np.testing.assert_allclose(ours_jax, oracle, rtol=1e-2, atol=5e-3)


def test_align_w_scale_recovers_similarity(rng):
    gt = rng.normal(size=(21, 3))
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pred = 2.5 * gt @ q.T + np.array([10.0, -5.0, 3.0])
    aligned = align_w_scale_np(gt, pred)
    np.testing.assert_allclose(aligned, gt, atol=1e-8)


def test_matmul_resize_matches_jax_image(rng):
    """resize_bilinear_matmul == jax.image.resize(bilinear) to fp tolerance,
    upscale and downscale, plus exact zeros in the fused pad region."""
    import jax
    import jax.numpy as jnp

    from handnet_tpu.ops.resize import resize_bilinear_matmul

    img = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    for oh, ow in ((64, 85), (80, 107), (24, 32), (48, 64)):
        want = jax.image.resize(img, (2, oh, ow, 3), method="bilinear")
        got = resize_bilinear_matmul(img, oh, ow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5, err_msg=f"{oh}x{ow}")

    padded = resize_bilinear_matmul(img, 64, 85, padded_hw=(64, 96))
    assert padded.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(
        np.asarray(padded[:, :, :85]),
        np.asarray(jax.image.resize(img, (2, 64, 85, 3), method="bilinear")),
        rtol=1e-4, atol=1e-5)
    assert float(np.abs(np.asarray(padded[:, :, 85:])).max()) == 0.0


def test_preprocess_matmul_resize_semantics(rng):
    """preprocess keeps its contract after the matmul-resize swap: same
    values as normalize(jax.image.resize(...)) in the valid region, exact
    zeros in the pad."""
    import jax
    import jax.numpy as jnp

    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.models.fcos import preprocess

    cfg = FCOSConfig(num_classes=2, image_h=64, image_w=96)
    imgs = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    out, scale = preprocess(imgs, cfg)
    assert out.shape == (2, 64, 96, 3)
    np.testing.assert_allclose(scale, (64 / 48, 85 / 64), rtol=1e-6)
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    want = (np.asarray(jax.image.resize(imgs, (2, 64, 85, 3),
                                        method="bilinear")) - mean) / std
    np.testing.assert_allclose(np.asarray(out[:, :, :85]), want,
                               rtol=1e-3, atol=1e-4)
    assert float(np.abs(np.asarray(out[:, :, 85:])).max()) == 0.0


def test_s2d_stem_equivalence(rng):
    """Space-to-depth stem == plain 7x7/s2 conv with the SAME parameters
    (the transform is a pure compute-layout change)."""
    import jax
    import jax.numpy as jnp

    from handnet_tpu.nn.resnet import StemConv

    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    plain = StemConv(width=16, s2d=False)
    fast = StemConv(width=16, s2d=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    a = plain.apply(variables, x)
    b = fast.apply(variables, x)
    assert a.shape == b.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    # odd sizes fall back to the plain path
    x_odd = jnp.asarray(rng.normal(size=(1, 63, 96, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fast.apply(variables, x_odd)),
                               np.asarray(plain.apply(variables, x_odd)),
                               rtol=1e-5, atol=1e-5)
