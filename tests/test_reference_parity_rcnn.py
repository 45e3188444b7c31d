"""Faster R-CNN (100DOH alternative detector) parity against the
reference's OWN fpn_utils code, imported at test time.

fpn_utils/faster_rcnn_fpn.py and fpn_utils/roi_heads.py import torchvision
at module level (not installed in-sandbox), but the components under test —
TwoMLPHead.forward, FastRCNNPredictor.forward, fastrcnn_loss, and
RoIHeads.postprocess_detections — execute none of the torchvision symbols
except box_ops helpers, which are satisfied by faithful stand-ins
(transcribed published semantics, same pattern as the FCOS harness):

* faster_rcnn_fpn.py:193-214  TwoMLPHead          vs models/faster_rcnn.TwoMLPHead
* faster_rcnn_fpn.py:227-282  FastRCNNPredictor   vs models/faster_rcnn.FastRCNNPredictor
                              (incl. the flat [:,1:] dxdy normalize quirk)
* roi_heads.py:16-80          fastrcnn_loss       vs models/faster_rcnn.rcnn_loss
                              (term math, given a controlled match)
* roi_heads.py:243-358        postprocess_detections
                              vs models/faster_rcnn.decode_rcnn_detections

Everything skips when /root/reference is not mounted.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = os.environ.get("HANDNET_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available")


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


# --- faithful torchvision.ops.boxes stand-ins (published semantics) --------


def _clip_boxes_to_image(boxes, size):
    h, w = size
    x = boxes[..., 0::2].clamp(min=0, max=w)
    y = boxes[..., 1::2].clamp(min=0, max=h)
    return torch.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], dim=-1)


def _remove_small_boxes(boxes, min_size):
    ws = boxes[:, 2] - boxes[:, 0]
    hs = boxes[:, 3] - boxes[:, 1]
    return torch.where((ws >= min_size) & (hs >= min_size))[0]


def _batched_nms(boxes, scores, labels, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coord = boxes.max()
    offsets = labels.to(boxes) * (max_coord + torch.tensor(1.0))
    shifted = boxes + offsets[:, None]
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(order), dtype=torch.bool)
    areas = (shifted[:, 2] - shifted[:, 0]) * (shifted[:, 3] - shifted[:, 1])
    for oi, i in enumerate(order.tolist()):
        if suppressed[oi]:
            continue
        keep.append(i)
        rest = order[oi + 1:]
        lt = torch.maximum(shifted[i, :2], shifted[rest, :2])
        rb = torch.minimum(shifted[i, 2:], shifted[rest, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / (areas[i] + areas[rest] - inter)
        suppressed[oi + 1:] |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.int64)


@pytest.fixture(scope="module")
def ref_fpn():
    """Load fpn_utils as a package from the mount with torchvision satisfied
    by inert stand-ins (only the box_ops helpers above ever execute)."""

    class _Unused:
        def __init__(self, *a, **k):
            pass

    tv = _stub_module("torchvision")
    ops = _stub_module("torchvision.ops",
                       MultiScaleRoIAlign=_Unused,
                       roi_align=lambda *a, **k: None)
    boxes_ns = getattr(ops, "boxes", None) or types.SimpleNamespace()
    boxes_ns.clip_boxes_to_image = _clip_boxes_to_image
    boxes_ns.remove_small_boxes = _remove_small_boxes
    boxes_ns.batched_nms = _batched_nms
    ops.boxes = boxes_ns
    misc = _stub_module("torchvision.ops.misc",
                        FrozenBatchNorm2d=torch.nn.BatchNorm2d)
    models = _stub_module("torchvision.models")
    det = _stub_module("torchvision.models.detection")
    _stub_module("torchvision.models.detection.anchor_utils",
                 AnchorGenerator=_Unused)
    _stub_module("torchvision.models.detection.rpn",
                 RPNHead=_Unused, RegionProposalNetwork=_Unused)
    _stub_module("torchvision.models.detection.transform",
                 GeneralizedRCNNTransform=_Unused)
    _stub_module("torchvision.models.detection.backbone_utils",
                 resnet_fpn_backbone=lambda *a, **k: None)
    _stub_module("torchvision.models.detection.faster_rcnn",
                 FasterRCNN=type("FasterRCNN", (torch.nn.Module,), {}))
    # RoIHeads' __annotations__ evaluate these at class-definition time;
    # placeholders suffice (the tested functions never construct them)
    _stub_module("torchvision.models.detection._utils",
                 BoxCoder=_Unused, Matcher=_Unused,
                 BalancedPositiveNegativeSampler=_Unused)
    tv.ops, tv.models = ops, models
    ops.misc = misc
    models.detection = det

    pkg_name = "ref_fpn_utils_pkg"
    if pkg_name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            pkg_name, os.path.join(REF, "fpn_utils", "__init__.py"),
            submodule_search_locations=[os.path.join(REF, "fpn_utils")])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[pkg_name] = pkg
        spec.loader.exec_module(pkg)
    frf = importlib.import_module(pkg_name + ".faster_rcnn_fpn")
    roi = importlib.import_module(pkg_name + ".roi_heads")
    return frf, roi


def _randomize(module: torch.nn.Module, seed: int, scale: float = 0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def _dense(linear: torch.nn.Linear):
    return {"kernel": jnp.asarray(linear.weight.detach().numpy().T),
            "bias": jnp.asarray(linear.bias.detach().numpy())}


def test_two_mlp_head_matches_reference(ref_fpn):
    from handnet_tpu.models.faster_rcnn import TwoMLPHead

    frf, _ = ref_fpn
    thead = frf.TwoMLPHead(64, 32)
    _randomize(thead, seed=2)
    x = np.random.default_rng(0).normal(size=(5, 64)).astype(np.float32)
    with torch.no_grad():
        ref = thead(torch.as_tensor(x)).numpy()
    ours = TwoMLPHead(representation=32).apply(
        {"params": {"fc6": _dense(thead.fc6), "fc7": _dense(thead.fc7)}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_fastrcnn_predictor_matches_reference(ref_fpn):
    """Forward parity incl. the reference's dxdy quirk: the single Linear's
    flat output has column 0 passed through and columns [1:] — magnitudes
    and vectors of ALL classes jointly — L2-normalized and scaled by 0.1
    (faster_rcnn_fpn.py:272-274)."""
    from handnet_tpu.models.faster_rcnn import FastRCNNPredictor

    frf, _ = ref_fpn
    c = 3
    tpred = frf.FastRCNNPredictor(64, c, ext=True)
    _randomize(tpred, seed=7)
    tpred.eval()  # dropout off, like our deterministic default
    x = np.random.default_rng(1).normal(size=(6, 64)).astype(np.float32)
    with torch.no_grad():
        (t_side, t_dxdy, t_contact), t_scores, t_deltas = tpred(
            torch.as_tensor(x))

    params = {
        "cls_score": _dense(tpred.cls_score),
        "bbox_pred": _dense(tpred.bbox_pred),
        "contact_fc1": _dense(tpred.hand_contact_state_layer[0]),
        "contact_fc2": _dense(tpred.hand_contact_state_layer[3]),
        "dxdy": _dense(tpred.hand_dydx_layer),
        "hand_side": _dense(tpred.hand_lr_layer),
    }
    out = FastRCNNPredictor(num_classes=c).apply({"params": params},
                                                 jnp.asarray(x))
    for ours, ref in [(out["scores"], t_scores), (out["deltas"], t_deltas),
                      (out["side"], t_side), (out["dxdy"], t_dxdy),
                      (out["contact"], t_contact)]:
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-5, atol=1e-6)


def _controlled_match(rng, num_classes=3, r=24):
    """One image with 3 GT boxes and R proposals whose matches are known by
    construction: the first 9 proposals are jittered copies of the GTs
    (IoU > 0.5), the rest sit far away (IoU 0 -> background)."""
    gt = np.array([[20.0, 20.0, 60.0, 70.0],
                   [100.0, 40.0, 180.0, 120.0],
                   [200.0, 150.0, 260.0, 230.0]], np.float32)
    gt_labels = np.array([1, 2, 1], np.int64)
    gt_info = np.concatenate([
        rng.integers(0, 5, size=(3, 1)).astype(np.float32),   # contact
        rng.integers(0, 2, size=(3, 1)).astype(np.float32),   # side
        rng.normal(size=(3, 3)).astype(np.float32) * 0.1,     # mag,dx,dy
    ], axis=1)

    props = np.zeros((r, 4), np.float32)
    match = np.zeros(r, np.int64)
    for i in range(9):
        j = i % 3
        shift = rng.uniform(-4, 4, size=4).astype(np.float32)
        props[i] = gt[j] + shift
        match[i] = j
    for i in range(9, r):
        x0 = 300.0 + 40.0 * (i - 9)
        props[i] = [x0, 300.0, x0 + 20.0, 330.0]
        match[i] = -1  # background
    return gt, gt_labels, gt_info, props, match


def test_fastrcnn_loss_matches_reference(ref_fpn):
    """rcnn_loss vs the reference's ACTUAL fastrcnn_loss (roi_heads.py:16-80)
    on a controlled match where our vectorized matcher provably assigns the
    same labels: CE mean, box smooth-L1(beta=1/9) sum / total-sampled, and
    the 0.1-weighted side-BCE / dxdymag-MSE / contact-CE over positives at
    the matched class. Regression targets on the reference side are encoded
    with ops/boxes.delta_encode, itself parity-tested against the
    reference's own BoxCoder.encode (test_reference_parity.py)."""
    from handnet_tpu.models.faster_rcnn import rcnn_loss
    from handnet_tpu.ops import boxes as box_ops

    _, roi = ref_fpn
    rng = np.random.default_rng(11)
    c, r = 3, 24
    gt, gt_labels, gt_info, props, match = _controlled_match(rng, c, r)

    labels = np.where(match >= 0, gt_labels[np.clip(match, 0, None)], 0)
    matched_gt = gt[np.clip(match, 0, None)]
    matched_info = gt_info[np.clip(match, 0, None)]
    reg_targets = np.array(box_ops.delta_encode(
        jnp.asarray(matched_gt), jnp.asarray(props),
        weights=(10.0, 10.0, 5.0, 5.0)))

    class_logits = rng.normal(size=(r, c)).astype(np.float32)
    box_regression = rng.normal(size=(r, c * 4)).astype(np.float32) * 0.2
    side_logits = rng.normal(size=(r, c)).astype(np.float32)
    dxdy = rng.normal(size=(r, c * 3)).astype(np.float32) * 0.1
    contact = rng.normal(size=(r, c * 5)).astype(np.float32)

    with torch.no_grad():
        t_side, t_dxdy, t_contact, t_cls, t_box = roi.fastrcnn_loss(
            [torch.as_tensor(side_logits), torch.as_tensor(dxdy),
             torch.as_tensor(contact)],
            torch.as_tensor(class_logits), torch.as_tensor(box_regression),
            [torch.as_tensor(labels)], [torch.as_tensor(matched_info)],
            [torch.as_tensor(reg_targets)], ext=True)

    outputs = {
        "proposals": jnp.asarray(props)[None],
        "scores": jnp.asarray(class_logits)[None],
        "deltas": jnp.asarray(box_regression)[None],
        "side": jnp.asarray(side_logits)[None],
        "dxdy": jnp.asarray(dxdy)[None],
        "contact": jnp.asarray(contact)[None],
    }
    targets = {
        "boxes": jnp.asarray(gt)[None],
        "labels": jnp.asarray(gt_labels.astype(np.int32))[None],
        "valid": jnp.ones((1, 3), bool),
        "box_info": jnp.asarray(gt_info)[None],
    }
    losses = rcnn_loss(outputs, targets, c)

    np.testing.assert_allclose(float(losses["loss_classifier"]),
                               float(t_cls), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(losses["loss_box_reg"]),
                               float(t_box), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(losses["loss_hand_side"]),
                               float(t_side), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(losses["loss_dxdymag"]),
                               float(t_dxdy), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(losses["loss_contact"]),
                               float(t_contact), rtol=1e-5, atol=1e-7)


def test_rcnn_postprocess_matches_reference(ref_fpn):
    """decode_rcnn_detections vs the reference's ACTUAL
    RoIHeads.postprocess_detections (roi_heads.py:243-358): per-class delta
    decode + clip, background drop, (roi, class) flatten order, score
    threshold, small-box removal, class-aware NMS, and the ext outputs
    (per-class sigmoid>0.5 sides, 5-way argmax contacts, reshaped
    dxdymags). The reference's BoxCoder comes from its own
    fcos_utils/det_utils.py (same class the RoIHeads wires up)."""
    import tests.test_reference_parity as trp
    from handnet_tpu.models.faster_rcnn import decode_rcnn_detections

    _, roi = ref_fpn
    det_utils = trp._load("ref_det_utils_rcnn", "fcos_utils/det_utils.py")

    rng = np.random.default_rng(5)
    c, r = 3, 16
    h, w = 240, 320
    props = np.stack([
        rng.uniform(0, w * 0.7, size=r),
        rng.uniform(0, h * 0.7, size=r),
        np.zeros(r), np.zeros(r)], axis=1).astype(np.float32)
    props[:, 2] = props[:, 0] + rng.uniform(20, 80, size=r)
    props[:, 3] = props[:, 1] + rng.uniform(20, 80, size=r)

    class_logits = rng.normal(size=(r, c)).astype(np.float32) * 2.0
    box_regression = (rng.normal(size=(r, c * 4)) * 0.2).astype(np.float32)
    side_logits = rng.normal(size=(r, c)).astype(np.float32)
    dxdy = rng.normal(size=(r, c * 3)).astype(np.float32) * 0.1
    contact = rng.normal(size=(r, c * 5)).astype(np.float32)

    dummy = object.__new__(roi.RoIHeads)
    dummy.box_coder = det_utils.BoxCoder((10.0, 10.0, 5.0, 5.0))
    dummy.score_thresh = 0.1
    dummy.nms_thresh = 0.5
    dummy.detections_per_img = 100
    dummy.ext = True
    with torch.no_grad():
        (r_sides, r_dxdymags, r_contacts, r_boxes, r_scores,
         r_labels) = roi.RoIHeads.postprocess_detections(
            dummy, torch.as_tensor(class_logits),
            [torch.as_tensor(side_logits), torch.as_tensor(dxdy),
             torch.as_tensor(contact)],
            torch.as_tensor(box_regression),
            [torch.as_tensor(props)], [(h, w)])

    outputs = {
        "proposals": jnp.asarray(props)[None],
        "proposal_valid": jnp.ones((1, r), bool),
        "scores": jnp.asarray(class_logits)[None],
        "deltas": jnp.asarray(box_regression)[None],
        "side": jnp.asarray(side_logits)[None],
        "dxdy": jnp.asarray(dxdy)[None],
        "contact": jnp.asarray(contact)[None],
    }
    out = decode_rcnn_detections(outputs, c, score_thresh=0.1,
                                 nms_thresh=0.5, max_dets=r * (c - 1),
                                 image_hw=(h, w))

    keep = np.asarray(out["valid"][0])
    assert int(keep.sum()) == len(r_scores[0])
    np.testing.assert_allclose(np.asarray(out["scores"][0])[keep],
                               r_scores[0].numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["boxes"][0])[keep],
                               r_boxes[0].numpy(), rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out["labels"][0])[keep],
                                  r_labels[0].numpy())
    np.testing.assert_array_equal(np.asarray(out["sides"][0])[keep],
                                  r_sides[0].numpy())
    np.testing.assert_array_equal(np.asarray(out["contacts"][0])[keep],
                                  r_contacts[0].numpy())
    np.testing.assert_allclose(np.asarray(out["dxdymags"][0])[keep],
                               r_dxdymags[0].numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Checkpoint converter: published FasterRCNN layout -> FasterRCNNFPN


def test_rpn_anchor_grid_matches_reference():
    """rpn_anchor_grid vs the reference's own AnchorGenerator
    (fcos_utils/anchor_utils.py:56-114) at the RCNN config
    (faster_rcnn_fpn.py:133-139): rounded ratio-major base anchors on
    corner-aligned stride grids, level-concatenated."""
    import tests.test_reference_parity as trp
    from handnet_tpu.models.faster_rcnn import rpn_anchor_grid

    _stub_module("torchvision.models.detection.image_list",
                 ImageList=type("ImageList", (), {}))
    au = trp._load("ref_anchor_utils_rcnn", "fcos_utils/anchor_utils.py")

    strides = (4, 8, 16, 32, 64)
    sizes = (32, 64, 128, 256, 512)
    ratios = (0.5, 1.0, 2.0)
    gen = au.AnchorGenerator(tuple((s,) for s in sizes), (ratios,) * 5)
    for h, w in [(128, 192), (96, 160)]:
        # feature grids as the model pyramid produces them; the pool level
        # is a ceil-div subsample whose stride torchvision re-derives as
        # image // grid (anchor_utils.py:118-125)
        grid_sizes = [[h // s, w // s] for s in strides[:4]]
        grid_sizes.append([(grid_sizes[-1][0] + 1) // 2,
                           (grid_sizes[-1][1] + 1) // 2])
        t_strides = [[torch.tensor(h // g[0]), torch.tensor(w // g[1])]
                     for g in grid_sizes]
        ref = torch.cat(gen.grid_anchors(grid_sizes, t_strides)).numpy()

        ours = rpn_anchor_grid(h, w, strides, sizes, ratios)
        np.testing.assert_array_equal(ours, ref, err_msg=f"{h}x{w}")


def test_convert_faster_rcnn_heads(ref_fpn):
    """convert_faster_rcnn on checkpoint-style keys: the converted box_head
    reproduces the reference TwoMLPHead on the SAME pooled roi (torch
    flattens [C,7,7] channel-major; ours flattens [7,7,C] — the fc6 kernel
    permutation is the thing under test), the predictor reproduces
    FastRCNNPredictor, and the RPN head matches a torchvision-layout
    RPNHead."""
    from handnet_tpu.convert.torch_weights import convert_faster_rcnn
    from handnet_tpu.models.faster_rcnn import (FastRCNNPredictor, RPNHead,
                                                TwoMLPHead)

    frf, _ = ref_fpn
    c, ch = 3, 32  # 32 channels keeps the 7x7 pooled tensors small
    t_box_head = frf.TwoMLPHead(ch * 49, 64)
    t_pred = frf.FastRCNNPredictor(64, c, ext=True)

    class _TorchRPNHead(torch.nn.Module):
        # torchvision RPNHead layout (conv 3x3 + two 1x1 outputs)
        def __init__(self, channels, a):
            super().__init__()
            self.conv = torch.nn.Conv2d(channels, channels, 3, padding=1)
            self.cls_logits = torch.nn.Conv2d(channels, a, 1)
            self.bbox_pred = torch.nn.Conv2d(channels, a * 4, 1)

        def forward(self, f):
            t = torch.relu(self.conv(f))
            return self.cls_logits(t), self.bbox_pred(t)

    t_rpn = _TorchRPNHead(ch, 3)
    for mod, seed in [(t_box_head, 3), (t_pred, 4), (t_rpn, 5)]:
        _randomize(mod, seed)
        mod.eval()

    sd = {}
    for k, v in t_box_head.state_dict().items():
        sd[f"roi_heads.box_head.{k}"] = v.numpy()
    for k, v in t_pred.state_dict().items():
        sd[f"roi_heads.box_predictor.{k}"] = v.numpy()
    for k, v in t_rpn.state_dict().items():
        sd[f"rpn.head.{k}"] = v.numpy()
    conv = convert_faster_rcnn(sd)

    rng = np.random.default_rng(9)
    pooled = rng.normal(size=(5, ch, 7, 7)).astype(np.float32)
    with torch.no_grad():
        t_feat = t_box_head(torch.as_tensor(pooled))
        (t_side, t_dxdy, t_contact), t_scores, t_deltas = t_pred(t_feat)

    feat = TwoMLPHead(representation=64).apply(
        {"params": conv["params"]["box_head"]},
        jnp.asarray(pooled.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat), t_feat.numpy(),
                               rtol=1e-4, atol=1e-5)
    out = FastRCNNPredictor(num_classes=c).apply(
        {"params": conv["params"]["predictor"]}, feat)
    for ours, ref in [(out["scores"], t_scores), (out["deltas"], t_deltas),
                      (out["side"], t_side), (out["dxdy"], t_dxdy),
                      (out["contact"], t_contact)]:
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-4, atol=1e-5)

    fmap = rng.normal(size=(1, ch, 6, 8)).astype(np.float32)
    with torch.no_grad():
        t_obj, t_reg = t_rpn(torch.as_tensor(fmap))
    obj, reg = RPNHead(ch, 3).apply(
        {"params": conv["params"]["rpn_head"]},
        [jnp.asarray(fmap.transpose(0, 2, 3, 1))])
    # our head flattens NHWC (h, w, a); reference RPN flattens via
    # permute(0,2,3,1) too (torchvision concat_box_prediction_layers) —
    # compare in that layout
    np.testing.assert_allclose(
        np.asarray(obj).reshape(-1),
        t_obj.permute(0, 2, 3, 1).reshape(-1).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(reg).reshape(-1, 4),
        t_reg.permute(0, 2, 3, 1).reshape(-1, 4).numpy(),
        rtol=1e-4, atol=1e-5)
