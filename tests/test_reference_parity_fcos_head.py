"""FCOS head forward parity against the reference's OWN fcos.py.

Round-3 verdict gap: `fcos_utils/fcos.py` imports torchvision at module
level (torchvision is not installed in-sandbox), so the reference-code
harness never reached the FCOS model itself — its head forward layout
(tower share, per-level reshape/permute order, level-concat order, the
0.1-scaled L2-normalized dxdy) was covered only by the same-author torch
oracle. The head classes' *forwards* use no torchvision ops — only the
module import does — so this file satisfies fcos.py's imports with inert
stand-ins (the stubbed symbols are all unused by FCOSHead /
FCOSClassificationHead / FCOSRegressionHead), loads `fcos_utils` as a real
package from the read-only mount (never copied), and asserts the flax
FCOSHead + convert_fcos reproduce the reference's actual per-anchor output
tensors:

* fcos.py:268-331  FCOSClassificationHead.forward — cls tower, cls_logits /
                   hand_lr / contact / 0.1-L2-dxdy, (N,A*K,H,W)->(N,HWA,K)
                   permute, level concat order
* fcos.py:377-395  FCOSRegressionHead.forward — reg tower, relu(bbox_reg),
                   ctrness
* fcos.py:181-202  FCOSHead.forward — dict assembly, ext=False variant

Everything skips when /root/reference is not mounted.
"""

from __future__ import annotations

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


@pytest.fixture(scope="module")
def ref_fcos():
    """Import the reference fcos_utils package with torchvision/lightning
    satisfied by stand-ins (none of the stubbed symbols are executed by the
    head classes under test — fcos.py only references them from FCOS
    __init__/loss paths this file never touches)."""

    class _Unused:  # constructor-only placeholder
        def __init__(self, *a, **k):
            pass

    def _sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2,
                            reduction="none"):
        """Faithful stand-in for torchvision.ops.sigmoid_focal_loss (the
        published formula, transcribed for the loss-parity tests below —
        the only stubbed symbol compute_loss actually executes)."""
        p = torch.sigmoid(inputs)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    tv = _stub_module("torchvision")
    ops = _stub_module("torchvision.ops",
                       sigmoid_focal_loss=_sigmoid_focal_loss,
                       boxes=types.SimpleNamespace())
    misc = _stub_module("torchvision.ops.misc",
                        FrozenBatchNorm2d=torch.nn.BatchNorm2d)
    fpn = _stub_module("torchvision.ops.feature_pyramid_network",
                       LastLevelP6P7=_Unused)
    models = _stub_module("torchvision.models")
    det = _stub_module("torchvision.models.detection")
    _stub_module("torchvision.models.detection.transform",
                 GeneralizedRCNNTransform=_Unused)
    _stub_module("torchvision.models.detection.backbone_utils",
                 resnet_fpn_backbone=lambda *a, **k: None)
    _stub_module("torchvision.models.detection.image_list",
                 ImageList=_Unused)
    tv.ops, tv.models = ops, models
    ops.misc, ops.feature_pyramid_network = misc, fpn
    models.detection = det
    _stub_module("pytorch_lightning")

    # load fcos_utils as a PACKAGE so `from . import det_utils` works
    pkg_name = "ref_fcos_utils_pkg"
    if pkg_name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            pkg_name, os.path.join(REF, "fcos_utils", "__init__.py"),
            submodule_search_locations=[os.path.join(REF, "fcos_utils")])
        pkg = importlib.util.module_from_spec(spec)
        sys.modules[pkg_name] = pkg
        spec.loader.exec_module(pkg)
    import importlib as _il
    return _il.import_module(pkg_name + ".fcos")


def _randomize(module: torch.nn.Module, seed: int, scale: float = 0.1):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


def _features(seed: int, channels: int):
    """Three FPN-level feature maps with distinct, non-square sizes so any
    H/W transposition or level-order mistake changes the output."""
    rng = np.random.default_rng(seed)
    shapes = [(2, 16, 20), (2, 8, 10), (2, 4, 5)]
    return [rng.normal(size=(n, h, w, channels)).astype(np.float32)
            for (n, h, w) in shapes]


def _flax_head_from_torch(thead, cfg):
    """Reference FCOSHead state dict -> flax FCOSHead variables, through the
    shipped converter (the same path converted checkpoints take)."""
    from handnet_tpu.convert.torch_weights import convert_fcos

    sd = {"head." + k: v.numpy() for k, v in thead.state_dict().items()}
    conv = convert_fcos(sd)
    return {"params": jax.tree_util.tree_map(jnp.asarray,
                                             conv["params"]["head"])}


@pytest.mark.parametrize("ext", [True, False])
def test_fcos_head_forward_matches_reference(ref_fcos, ext):
    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.models.fcos import FCOSHead

    channels, num_convs, num_classes = 64, 2, 3
    thead = ref_fcos.FCOSHead(channels, num_anchors=1,
                              num_classes=num_classes, num_convs=num_convs,
                              ext=ext)
    _randomize(thead, seed=11)
    thead.eval()

    feats = _features(seed=3, channels=channels)
    with torch.no_grad():
        tout = thead([torch.as_tensor(np.transpose(f, (0, 3, 1, 2)))
                      for f in feats])

    cfg = FCOSConfig(num_classes=num_classes, ext=ext,
                     fpn_channels=channels, num_convs=num_convs)
    head = FCOSHead(cfg)
    out = head.apply(_flax_head_from_torch(thead, cfg),
                     [jnp.asarray(f) for f in feats])

    keys = ["cls_logits", "hand_lr", "bbox_regression", "bbox_ctrness"]
    if ext:
        keys += ["hand_contact_state", "hand_dxdy"]
    for key in keys:
        np.testing.assert_allclose(
            np.asarray(out[key]), tout[key].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"head output {key!r} diverges from reference fcos.py")
    # reference emits per-level indices alongside (fcos.py:325-330); this
    # package derives level offsets from the static anchor table instead —
    # assert the implied layout agrees: anchors per level = H*W*1
    counts = np.bincount(tout["feature_idx"].numpy()[0, :, 0])
    assert list(counts) == [f.shape[1] * f.shape[2] for f in feats]


def test_fcos_classification_head_level_math(ref_fcos):
    """Per-level (pre-concat) outputs: catches a wrong concat axis that a
    full-tensor compare could mask if levels coincidentally matched."""
    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.models.fcos import FCOSHead

    channels, num_convs, num_classes = 64, 2, 3
    thead = ref_fcos.FCOSHead(channels, 1, num_classes, num_convs, ext=True)
    _randomize(thead, seed=5)
    thead.eval()

    cfg = FCOSConfig(num_classes=num_classes, ext=True,
                     fpn_channels=channels, num_convs=num_convs)
    head = FCOSHead(cfg)
    variables = _flax_head_from_torch(thead, cfg)

    for f in _features(seed=9, channels=channels):
        with torch.no_grad():
            t_cls, t_contact, t_dxdy, t_lr, _ = thead.classification_head(
                [torch.as_tensor(np.transpose(f, (0, 3, 1, 2)))])
            t_reg, t_ctr = thead.regression_head(
                [torch.as_tensor(np.transpose(f, (0, 3, 1, 2)))])
        out = head.apply(variables, [jnp.asarray(f)])
        for ours, ref in [(out["cls_logits"], t_cls),
                          (out["hand_contact_state"], t_contact),
                          (out["hand_dxdy"], t_dxdy),
                          (out["hand_lr"], t_lr),
                          (out["bbox_regression"], t_reg),
                          (out["bbox_ctrness"], t_ctr)]:
            np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ext", [True, False])
def test_fcos_matcher_and_loss_match_reference(ref_fcos, ext):
    """fcos_loss + match_anchors vs the reference's ACTUAL
    FCOS.compute_loss -> FCOSHead.compute_loss chain (fcos.py:44-178,
    523-571): center-sampling matcher, focal cls/hand_lr/contact losses,
    GIoU via the reference's own utils.generalized_box_iou_loss, ctrness
    BCE on encoded ltrb ratios, and the background-inclusive dxdy MSE
    quirk. The reference matcher runs with a dummy `self` (it reads only
    center_sampling_radius + head); its known area-tiebreak bug
    (fcos.py:563, (y1-x1)*(y2-y1)) never fires here because the planted
    GTs do not overlap."""
    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.models.fcos import anchors_for, fcos_loss

    num_classes, b, m = 3, 2, 3
    cfg = FCOSConfig(num_classes=num_classes, ext=ext,
                     image_h=64, image_w=96)
    anchors, anchor_sizes, level_slices = anchors_for(cfg)
    n = int(anchors.shape[0])
    num_per_level = [count for _, count, _ in level_slices]

    rng = np.random.default_rng(21)
    head = {
        "cls_logits": rng.normal(size=(b, n, num_classes)).astype(np.float32),
        "bbox_regression": np.abs(rng.normal(size=(b, n, 4))).astype(np.float32),
        "bbox_ctrness": rng.normal(size=(b, n, 1)).astype(np.float32),
        "hand_lr": rng.normal(size=(b, n, 2)).astype(np.float32),
    }
    if ext:
        head["hand_contact_state"] = rng.normal(size=(b, n, 5)).astype(np.float32)
        # post-forward layout: (raw magnitude, 0.1-normalized dx dy)
        head["hand_dxdy"] = np.abs(rng.normal(size=(b, n, 3))).astype(np.float32)

    # non-overlapping GT boxes spanning the anchor scale ranges; 2 real +
    # 1 padding row per image
    boxes = np.array([
        [[4.0, 4.0, 28.0, 30.0], [40.0, 30.0, 90.0, 60.0], [0, 0, 0, 0]],
        [[10.0, 34.0, 26.0, 52.0], [34.0, 2.0, 92.0, 30.0], [0, 0, 0, 0]],
    ], np.float32)
    valid = np.array([[True, True, False]] * b)
    labels = rng.integers(0, num_classes, size=(b, m)).astype(np.int32)
    box_info = np.concatenate([
        rng.integers(0, 5, size=(b, m, 1)).astype(np.float32),   # contact
        rng.integers(0, 2, size=(b, m, 1)).astype(np.float32),   # hand side
        rng.normal(size=(b, m, 3)).astype(np.float32),           # mag,dx,dy
    ], axis=-1)

    # ---- reference: dummy self carries exactly what compute_loss reads
    # conv towers are irrelevant to compute_loss — num_convs=0 keeps the
    # dummy head trivially constructible
    thead = ref_fcos.FCOSHead(32, 1, num_classes, num_convs=0, ext=ext)
    dummy = types.SimpleNamespace(center_sampling_radius=1.5, head=thead)
    t_targets = []
    for i in range(b):
        t_targets.append({
            "boxes": torch.as_tensor(boxes[i, :2]),
            "labels": torch.as_tensor(labels[i, :2].astype(np.int64)),
            "box_info": torch.as_tensor(box_info[i, :2]),
        })
    t_head = {k: torch.as_tensor(v) for k, v in head.items()}
    t_anchors = [torch.as_tensor(np.array(anchors)) for _ in range(b)]
    with torch.no_grad():
        t_losses = ref_fcos.FCOS.compute_loss(
            dummy, t_targets, t_head, t_anchors, num_per_level)

    # ---- ours: padded fixed-shape targets, one vectorized loss
    targets = {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
               "valid": jnp.asarray(valid),
               "box_info": jnp.asarray(box_info)}
    losses = fcos_loss({k: jnp.asarray(v) for k, v in head.items()},
                       targets, anchors, anchor_sizes, level_slices, cfg)

    keys = ["classification", "bbox_regression", "bbox_ctrness", "hand_lr"]
    if ext:
        keys += ["hand_contact_state", "hand_dxdy"]
    for key in keys:
        np.testing.assert_allclose(
            float(losses[key]), float(t_losses[key]), rtol=2e-4, atol=1e-6,
            err_msg=f"loss {key!r} diverges from reference compute_loss")


# ---------------------------------------------------------------------------
# postprocess_detections parity (fcos.py:572-659) + resize_boxes (fcos.py:770)


def _torch_batched_nms(boxes, scores, labels, iou_threshold):
    """Faithful stand-in for torchvision.ops.boxes.batched_nms (the published
    coordinate-offset + greedy-NMS semantics, transcribed — torchvision is
    not installed in-sandbox). Returns keep indices in descending-score
    order, exactly like the C++ kernel."""
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


@pytest.mark.parametrize("ext", [True, False])
def test_fcos_postprocess_detections_matches_reference(ref_fcos, ext):
    """decode_detections vs the reference's ACTUAL postprocess_detections
    (fcos.py:572-659): sqrt(sigmoid*sigmoid) scoring, argmax labels, the
    hard 0.7 mask, BoxLinearCoder decode, sigmoid-argmax sides/contacts,
    raw dxdy passthrough, and class-aware NMS at IoU 0.3. The reference
    returns variable-length per-image dicts; ours returns fixed top-K slots
    with a validity mask — parity means the valid slots equal the
    reference's kept detections in descending-score order. (The non-ext
    `feature_idx` output is dead code — no entry point consumes it — and is
    deliberately not emitted.)"""
    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.models.fcos import anchors_for, decode_detections

    num_classes, b = 3, 2
    cfg = FCOSConfig(num_classes=num_classes, ext=ext,
                     image_h=64, image_w=96, max_detections=64)
    anchors, _, level_slices = anchors_for(cfg)
    n = int(anchors.shape[0])
    num_per_level = [count for _, count, _ in level_slices]

    rng = np.random.default_rng(33)
    # mostly-background logits; plant contiguous runs of hot anchors so the
    # decoded boxes overlap and NMS genuinely suppresses
    cls = (rng.normal(size=(b, n, num_classes)) * 0.5 - 2.5).astype(np.float32)
    ctr = (rng.normal(size=(b, n, 1)) * 0.5 - 2.0).astype(np.float32)
    for i in range(b):
        starts = rng.choice(n - 6, size=5, replace=False)
        for s in starts:
            idx = np.arange(s, s + 5)
            cls[i, idx, rng.integers(0, num_classes)] += 7.0
            ctr[i, idx, 0] += 6.0
    head = {
        "cls_logits": cls,
        "bbox_ctrness": ctr,
        "bbox_regression": rng.uniform(
            0.5, 1.5, size=(b, n, 4)).astype(np.float32),
        "hand_lr": rng.normal(size=(b, n, 2)).astype(np.float32),
    }
    if ext:
        head["hand_contact_state"] = rng.normal(
            size=(b, n, 5)).astype(np.float32)
        head["hand_dxdy"] = rng.normal(size=(b, n, 3)).astype(np.float32)

    # ---- reference: a bare FCOS instance carrying exactly what
    # postprocess_detections reads (self.ext, self.box_coder)
    ref_fcos.box_ops.batched_nms = _torch_batched_nms
    dummy = object.__new__(ref_fcos.FCOS)
    dummy.ext = ext
    dummy.box_coder = ref_fcos.det_utils.BoxLinearCoder(normalize_by_size=True)
    t_head = {k: torch.as_tensor(v) for k, v in head.items()}
    t_head["feature_idx"] = torch.zeros((b, n, 1))  # read, then rebuilt
    t_anchors = [torch.as_tensor(np.array(anchors)) for _ in range(b)]
    with torch.no_grad():
        t_dets = ref_fcos.FCOS.postprocess_detections(
            dummy, t_head, t_anchors, num_per_level)

    # ---- ours: one fixed-shape vectorized decode
    out = decode_detections({k: jnp.asarray(v) for k, v in head.items()},
                            anchors, cfg)

    for i in range(b):
        ref_d = t_dets[i]
        keep = np.asarray(out["valid"][i])
        assert int(keep.sum()) == len(ref_d["scores"]), \
            f"image {i}: kept {int(keep.sum())} vs reference {len(ref_d['scores'])}"
        np.testing.assert_allclose(
            np.asarray(out["scores"][i])[keep], ref_d["scores"].numpy(),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["boxes"][i])[keep], ref_d["boxes"].numpy(),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(out["labels"][i])[keep], ref_d["labels"].numpy())
        np.testing.assert_array_equal(
            np.asarray(out["sides"][i])[keep], ref_d["sides"].numpy())
        if ext:
            np.testing.assert_array_equal(
                np.asarray(out["contacts"][i])[keep],
                ref_d["contacts"].numpy())
            np.testing.assert_allclose(
                np.asarray(out["dxdymags"][i])[keep],
                ref_d["dxdymags"].numpy(), rtol=1e-5, atol=1e-6)


def test_resize_boxes_matches_reference(ref_fcos):
    """Our decode's scale_to_original rescale vs the reference's actual
    resize_boxes (fcos.py:770-783, applied by FCOS.postprocess:661-669)."""
    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.models.fcos import anchors_for, decode_detections

    cfg = FCOSConfig(num_classes=3, ext=False, image_h=64, image_w=96,
                     max_detections=16)
    anchors, _, _ = anchors_for(cfg)
    n = int(anchors.shape[0])
    rng = np.random.default_rng(7)
    head = {
        "cls_logits": (rng.normal(size=(1, n, 3)) + 2.0).astype(np.float32),
        "bbox_ctrness": (rng.normal(size=(1, n, 1)) + 2.0).astype(np.float32),
        "bbox_regression": rng.uniform(0.5, 1.5, (1, n, 4)).astype(np.float32),
        "hand_lr": rng.normal(size=(1, n, 2)).astype(np.float32),
    }
    jhead = {k: jnp.asarray(v) for k, v in head.items()}
    # network ran at 64x96; the original frame was 160x240 -> scale = new/orig
    sy, sx = 64.0 / 160.0, 96.0 / 240.0
    plain = decode_detections(jhead, anchors, cfg)
    scaled = decode_detections(jhead, anchors, cfg, scale_to_original=(sy, sx))
    ref_boxes = ref_fcos.resize_boxes(
        torch.as_tensor(np.array(plain["boxes"][0])),
        original_size=[64, 96], new_size=[160, 240])
    np.testing.assert_allclose(np.asarray(scaled["boxes"][0]),
                               ref_boxes.numpy(), rtol=1e-5, atol=1e-5)
