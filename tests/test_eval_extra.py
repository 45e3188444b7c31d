"""COCO detection AP, BOP pose errors, sequence deprojection tests."""

import jax.numpy as jnp
import numpy as np

from handnet_tpu.data.sequence import deproject_depth
from handnet_tpu.eval.bop_pose import (add_error, adi_error, auc_add,
                                       BOPEvaluator, projection_error,
                                       rotation_error, translation_error)
from handnet_tpu.eval.coco_det import CocoDetEvaluator
from handnet_tpu.eval.voc import Detection, GTObject


def box(x1, y1, x2, y2):
    return np.array([x1, y1, x2, y2], float)


def test_coco_perfect_detection():
    annos = {"im0": [GTObject("cup", box(10, 10, 50, 50))],
             "im1": [GTObject("cup", box(20, 20, 70, 80))]}
    dets = [Detection("im0", 0.9, box(10, 10, 50, 50)),
            Detection("im1", 0.8, box(20, 20, 70, 80))]
    out = CocoDetEvaluator(annos).evaluate(dets, ["cup", "cup"])
    assert out["AP"] > 0.99
    assert out["AP50"] == 1.0 and out["AP75"] == 1.0


def test_coco_loose_box_fails_high_iou():
    annos = {"im0": [GTObject("cup", box(10, 10, 50, 50))]}
    # IoU ~0.56 box: passes AP50, fails AP75
    dets = [Detection("im0", 0.9, box(10, 10, 44, 44))]
    out = CocoDetEvaluator(annos).evaluate(dets, ["cup"])
    assert out["AP50"] == 1.0
    assert out["AP75"] == 0.0
    assert 0 < out["AP"] < 1


def test_coco_false_positive_penalized():
    annos = {"im0": [GTObject("cup", box(10, 10, 50, 50))]}
    dets = [Detection("im0", 0.95, box(200, 200, 240, 240)),
            Detection("im0", 0.9, box(10, 10, 50, 50))]
    out = CocoDetEvaluator(annos).evaluate(dets, ["cup", "cup"])
    assert out["AP50"] < 1.0


def random_rotation(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q


def test_pose_errors_identity(rng):
    pts = rng.normal(size=(200, 3)) * 50
    R = random_rotation(rng)
    t = rng.normal(size=3) * 10
    assert add_error(R, t, R, t, pts) < 1e-9
    assert adi_error(R, t, R, t, pts) < 1e-9
    assert rotation_error(R, R) < 1e-4
    assert translation_error(t, t) == 0.0


def test_pose_errors_known_offsets(rng):
    pts = rng.normal(size=(100, 3)) * 50
    R = np.eye(3)
    t = np.zeros(3)
    t2 = np.array([3.0, 4.0, 0.0])
    np.testing.assert_allclose(add_error(R, t2, R, t, pts), 5.0, rtol=1e-6)
    # 90-degree rotation about z
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(rotation_error(Rz, np.eye(3)), 90.0, atol=1e-4)


def test_adi_leq_add(rng):
    pts = rng.normal(size=(150, 3)) * 30
    R1, R2 = random_rotation(rng), random_rotation(rng)
    t1, t2 = rng.normal(size=3) * 5, rng.normal(size=3) * 5
    assert adi_error(R1, t1, R2, t2, pts) <= add_error(R1, t1, R2, t2, pts) + 1e-9


def test_projection_error_zero_for_same_pose(rng):
    pts = rng.normal(size=(50, 3)) * 20 + np.array([0, 0, 500.0])
    K = np.array([[600, 0, 320], [0, 600, 240], [0, 0, 1.0]])
    R = np.eye(3)
    t = np.array([0, 0, 100.0])
    assert projection_error(R, t, R, t, K, pts) < 1e-9


def test_auc_add_extremes():
    assert auc_add([0.0] * 10, max_threshold=100) > 0.99
    assert auc_add([1000.0] * 10, max_threshold=100) == 0.0


def test_bop_evaluator(rng):
    pts = rng.normal(size=(300, 3)) * 40
    diam = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    models = {1: pts}
    diameters = {1: diam}
    R = random_rotation(rng)
    t = rng.normal(size=3) * 20
    gt = [{"image_id": 0, "obj_id": 1, "R": R, "t": t}]
    est_good = [{"image_id": 0, "obj_id": 1, "R": R,
                 "t": t + 0.01 * diam / np.sqrt(3)}]
    out = BOPEvaluator(models, diameters).evaluate(est_good, gt)
    assert out["add_s_recall_0.1d"] == 1.0
    assert out["ar_mssd"] > 0.5

    est_bad = [{"image_id": 0, "obj_id": 1, "R": random_rotation(rng),
                "t": t + diam}]
    out_bad = BOPEvaluator(models, diameters).evaluate(est_bad, gt)
    assert out_bad["add_s_recall_0.1d"] == 0.0


def test_deproject_depth_roundtrip(rng):
    """Points deprojected at depth z must reproject to their pixel."""
    h, w = 24, 32
    fx, fy, cx, cy = 100.0, 100.0, 16.0, 12.0
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    depth = rng.uniform(0.5, 1.5, size=(2, h, w)).astype(np.float32)
    depth[0, 0, 0] = 0.0  # filtered
    inv_k = jnp.asarray(np.stack([np.linalg.inv(k)] * 2))
    eye = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2))
    pts, mask = deproject_depth(jnp.asarray(depth), inv_k, eye)
    pts = np.asarray(pts).reshape(2, h, w, 3)
    mask = np.asarray(mask).reshape(2, h, w)
    assert not mask[0, 0, 0] and mask[1, 5, 5]
    # reprojection check at a few pixels
    for (c, y, x) in ((0, 3, 7), (1, 20, 30)):
        p = pts[c, y, x]
        u = p[0] * fx / p[2] + cx
        v = p[1] * fy / p[2] + cy
        np.testing.assert_allclose([u, v], [x, y], atol=1e-3)
        np.testing.assert_allclose(p[2], depth[c, y, x], atol=1e-6)


# --- segm + keypoints tasks (reference coco_eval.py:215-236) ---------------


def _rle_rect(h, w, x1, y1, x2, y2):
    from handnet_tpu.data import rle as R
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return R.encode(m)


def test_coco_segm_perfect_and_half_overlap():
    gt = GTObject("hand", box(10, 10, 50, 50))
    annos = {"im0": [gt]}
    d_exact = Detection("im0", 0.9, box(10, 10, 50, 50))
    gt_m = {id(gt): _rle_rect(100, 100, 10, 10, 50, 50)}
    ev = CocoDetEvaluator(annos)

    out = ev.evaluate([d_exact], ["hand"], iou_type="segm",
                      dt_masks={id(d_exact): _rle_rect(100, 100, 10, 10, 50, 50)},
                      gt_masks=gt_m)
    assert out["AP"] > 0.99

    # half-width mask: IoU = 0.5 exactly -> counts at thr 0.5 only
    d_half = Detection("im0", 0.9, box(10, 10, 50, 50))
    out = ev.evaluate([d_half], ["hand"], iou_type="segm",
                      dt_masks={id(d_half): _rle_rect(100, 100, 10, 10, 30, 50)},
                      gt_masks=gt_m)
    assert out["AP50"] == 1.0
    assert out["AP75"] == 0.0


def test_coco_keypoints_oks():
    gt = GTObject("hand", box(0, 0, 100, 100))
    annos = {"im0": [gt]}
    gkpts = np.zeros((21, 3))
    gkpts[:, 0] = np.linspace(10, 90, 21)
    gkpts[:, 1] = 50.0
    gkpts[:, 2] = 2  # visible
    # exact prediction -> OKS 1 -> perfect AP
    d = Detection("im0", 0.9, box(0, 0, 100, 100))
    ev = CocoDetEvaluator(annos)
    out = ev.evaluate([d], ["hand"], iou_type="keypoints",
                      dt_keypoints={id(d): gkpts[:, :2]},
                      gt_keypoints={id(gt): gkpts})
    assert out["AP"] > 0.99

    # hand-computed OKS: uniform offset delta on every joint.
    # oks = exp(-delta^2 / ((2*0.05)^2 * area * 2)); pick delta so oks ~ 0.6:
    # delta = sqrt(-ln(0.6) * 0.01 * 10000 * 2) ~ 10.1  (area = 100*100)
    delta = np.sqrt(-np.log(0.6) * (2 * 0.05) ** 2 * 100 * 100 * 2)
    shifted = gkpts[:, :2] + np.array([delta, 0.0])
    out = ev.evaluate([d], ["hand"], iou_type="keypoints",
                      dt_keypoints={id(d): shifted},
                      gt_keypoints={id(gt): gkpts})
    # OKS 0.6: matches at thresholds .50/.55/.60, misses above
    assert out["AP50"] == 1.0
    assert out["AP75"] == 0.0
    assert abs(out["AP"] - 3 / 10) < 1e-6


def test_coco_keypoints_ignores_gt_without_visible_joints():
    gt_vis = GTObject("hand", box(0, 0, 100, 100))
    gt_hidden = GTObject("hand", box(0, 0, 100, 100))
    annos = {"im0": [gt_vis, gt_hidden]}
    gk = np.ones((21, 3))
    gk[:, :2] = 50.0
    hidden = gk.copy()
    hidden[:, 2] = 0
    d = Detection("im0", 0.9, box(0, 0, 100, 100))
    out = CocoDetEvaluator(annos).evaluate(
        [d], ["hand"], iou_type="keypoints",
        dt_keypoints={id(d): gk[:, :2]},
        gt_keypoints={id(gt_vis): gk, id(gt_hidden): hidden})
    # the invisible GT must not count as a missed object
    assert out["AP"] > 0.99


def test_coco_keypoints_detection_on_ignored_gt_not_fp():
    """A detection overlapping ONLY an invisible-keypoint GT is excluded
    from both TP and FP (pycocotools ignore semantics), so it must not
    depress the AP earned on a different image."""
    gt_vis = GTObject("hand", box(0, 0, 100, 100))
    gt_hidden = GTObject("hand", box(300, 300, 400, 400))
    annos = {"im0": [gt_vis], "im1": [gt_hidden]}
    gk = np.ones((21, 3))
    gk[:, :2] = 50.0
    hidden = np.zeros((21, 3))
    d_good = Detection("im0", 0.8, box(0, 0, 100, 100))
    # confident detection landing inside the ignored GT's expanded box
    d_ign = Detection("im1", 0.95, box(300, 300, 400, 400))
    ign_kpts = np.full((21, 2), 350.0)
    out = CocoDetEvaluator(annos).evaluate(
        [d_ign, d_good], ["hand", "hand"], iou_type="keypoints",
        dt_keypoints={id(d_good): gk[:, :2], id(d_ign): ign_kpts},
        gt_keypoints={id(gt_vis): gk, id(gt_hidden): hidden})
    # were d_ign counted as FP (it outranks d_good), AP would drop to ~0.5
    assert out["AP"] > 0.99


def test_coco_keypoints_ignored_gt_missing_keypoints_entry():
    """Regression: a GT object with NO gt_keypoints entry at all must be
    ignored (not crash with KeyError) — the ignored-GT OKS computation
    substitutes an all-invisible array (coco_det.py _iou_for)."""
    gt_vis = GTObject("hand", box(0, 0, 100, 100))
    gt_nokpts = GTObject("hand", box(300, 300, 400, 400))
    annos = {"im0": [gt_vis, gt_nokpts]}
    gk = np.ones((21, 3))
    gk[:, :2] = 50.0
    d_good = Detection("im0", 0.8, box(0, 0, 100, 100))
    d_ign = Detection("im0", 0.95, box(300, 300, 400, 400))
    out = CocoDetEvaluator(annos).evaluate(
        [d_ign, d_good], ["hand", "hand"], iou_type="keypoints",
        dt_keypoints={id(d_good): gk[:, :2],
                      id(d_ign): np.full((21, 2), 350.0)},
        gt_keypoints={id(gt_vis): gk})
    # d_ign lands in the entry-less GT's expanded box -> neither TP nor FP
    assert out["AP"] > 0.99
