"""Faster R-CNN + FPN — the alternative 100DOH detector, fixed-shape on TPU.

Reference: fpn_utils/faster_rcnn_fpn.py:14-281 (FasterRCNN with the 100DOH
extension heads: contact-state MLP ->5C, dxdy ->3C, hand-side ->C at
:234-239), fpn_utils/rcnn.py:14-107 (generic forward), fpn_utils/
roi_heads.py:16-434 (proposal matching/sampling, fastrcnn_loss, postprocess)
and the torchvision RPN/RoIAlign C++/CUDA ops it leans on implicitly
(SURVEY §2.6).

TPU-native design decisions:
* RPN proposals: per-level top-K by objectness -> decode -> ONE fixed-size
  NMS over the concatenated levels -> exactly ``num_proposals`` boxes with a
  validity mask. No ragged tensors anywhere.
* RoIAlign is a gather-based bilinear sampler (ops below) — the torchvision
  CUDA kernel re-expressed as XLA gathers; level assignment follows the
  FPN paper's k = floor(k0 + log2(sqrt(wh)/224)).
* Train-time proposal sampling uses jax.random.choice-free *top-K of
  scored masks* so the step stays deterministic and shape-static.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu.nn.fpn import FPN
from handnet_tpu.nn.resnet import resnet34
from handnet_tpu.ops import boxes as box_ops
from handnet_tpu.ops.anchors import fcos_anchor_pyramid
from handnet_tpu.ops.focal import smooth_l1
from handnet_tpu.ops.nms import nms_fixed


# ---------------------------------------------------------------------------
# RoIAlign (gather-based bilinear, sampling_ratio=2 semantics).


def roi_align(features: jnp.ndarray, rois: jnp.ndarray, out_size: int,
              spatial_scale: float, sampling: int = 2) -> jnp.ndarray:
    """features [H, W, C]; rois [R, 4] xyxy in image coords -> [R, S, S, C].

    Average-pools ``sampling^2`` bilinear taps per output bin, matching
    torchvision roi_align(aligned=False).
    """
    h, w, c = features.shape
    r = rois.shape[0]
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    bin_w = (x2 - x1) / out_size
    bin_h = (y2 - y1) / out_size

    # tap offsets within a bin: (i + .5)/sampling for i in range(sampling)
    offs = (jnp.arange(sampling, dtype=jnp.float32) + 0.5) / sampling
    grid = jnp.arange(out_size, dtype=jnp.float32)

    # sample coordinates: [R, S, sampling]
    xs = (x1[:, None, None] + (grid[None, :, None] + offs[None, None, :])
          * bin_w[:, None, None])
    ys = (y1[:, None, None] + (grid[None, :, None] + offs[None, None, :])
          * bin_h[:, None, None])
    xs = xs - 0.5  # align=False center convention
    ys = ys - 0.5

    def bilinear(yy, xx):
        y0 = jnp.clip(jnp.floor(yy), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xx), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        wy = jnp.clip(yy - y0, 0, 1)[..., None]
        wx = jnp.clip(xx - x0, 0, 1)[..., None]
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        p00 = features[y0, x0]
        p01 = features[y0, x1i]
        p10 = features[y1i, x0]
        p11 = features[y1i, x1i]
        return ((1 - wy) * (1 - wx) * p00 + (1 - wy) * wx * p01
                + wy * (1 - wx) * p10 + wy * wx * p11)

    # full tap grid [R, S, S, sampling, sampling]
    yy = ys[:, :, None, :, None]
    xx = xs[:, None, :, None, :]
    yy = jnp.broadcast_to(yy, (r, out_size, out_size, sampling, sampling))
    xx = jnp.broadcast_to(xx, (r, out_size, out_size, sampling, sampling))
    vals = bilinear(yy, xx)                        # [..., C]
    return vals.mean(axis=(3, 4))


def multiscale_roi_align(pyramid: List[jnp.ndarray], rois: jnp.ndarray,
                         out_size: int, strides) -> jnp.ndarray:
    """FPN level assignment (k0=2 at stride 8 here): compute all levels,
    select per-roi — static shapes, no boolean gathers."""
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(jnp.log2(scale / 224.0 + 1e-6)) + 2
    lvl = jnp.clip(lvl, 0, len(pyramid) - 1).astype(jnp.int32)
    outs = jnp.stack([
        roi_align(feat, rois, out_size, 1.0 / s)
        for feat, s in zip(pyramid, strides)
    ])                                             # [L, R, S, S, C]
    return jnp.take_along_axis(
        outs, lvl[None, :, None, None, None], axis=0)[0]


# ---------------------------------------------------------------------------
# Modules.


class RPNHead(nn.Module):
    channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        self.conv = nn.Conv(self.channels, (3, 3), padding=1,
                            dtype=self.dtype)
        self.objectness = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype)
        self.deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype)

    def __call__(self, features: List[jnp.ndarray]):
        obj, reg = [], []
        for f in features:
            t = nn.relu(self.conv(f))
            b = f.shape[0]
            obj.append(self.objectness(t).reshape(b, -1))
            reg.append(self.deltas(t).reshape(b, -1, 4))
        return jnp.concatenate(obj, 1), jnp.concatenate(reg, 1)


class TwoMLPHead(nn.Module):
    """flatten -> fc -> fc (fpn_utils/faster_rcnn_fpn.py:193-214)."""

    representation: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation, dtype=self.dtype,
                             name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation, dtype=self.dtype,
                             name="fc7")(x))
        return x


class FastRCNNPredictor(nn.Module):
    """cls + box deltas + 100DOH extension heads
    (faster_rcnn_fpn.py:217-282): contact MLP(->5C), dxdy MLP(->3C with
    relu+L2 on the vector part), side MLP(->C)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.num_classes
        scores = nn.Dense(c, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(c * 4, dtype=self.dtype, name="bbox_pred")(x)
        contact = nn.Dense(c * 5, dtype=self.dtype, name="contact_state")(x)
        dxdy_raw = nn.relu(nn.Dense(c * 3, dtype=self.dtype,
                                    name="dxdy")(x))
        dxdy = dxdy_raw.reshape(x.shape[0], c, 3)
        mag = dxdy[..., :1]
        vec = dxdy[..., 1:]
        # eps inside the sqrt: norm's gradient at exactly 0 (common after
        # relu) is NaN otherwise
        norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-12)
        vec = 0.1 * vec / norm
        dxdy = jnp.concatenate([mag, vec], -1).reshape(x.shape[0], c * 3)
        side = nn.Dense(c, dtype=self.dtype, name="hand_side")(x)
        return {"scores": scores, "deltas": deltas, "contact": contact,
                "dxdy": dxdy, "side": side}


class FasterRCNNFPN(nn.Module):
    """Backbone+FPN+RPN+RoI heads. ``__call__`` returns proposals and the
    per-roi head outputs; decode/loss are pure functions below."""

    num_classes: int = 3
    image_h: int = 800
    image_w: int = 1088
    num_proposals: int = 128
    strides: Tuple[int, ...] = (8, 16, 32)
    anchor_scales: Tuple[float, ...] = (1.0, )  # x anchor size per level
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = resnet34(norm="frozen", dtype=self.dtype)
        self.fpn = FPN(out_channels=256, dtype=self.dtype)
        self.rpn_head = RPNHead(256, len(self.aspect_ratios), self.dtype)
        self.box_head = TwoMLPHead(1024, self.dtype)
        self.predictor = FastRCNNPredictor(self.num_classes, self.dtype)
        # anchors: sizes (32, 64, 128) per level x 3 ratios
        anchors = []
        for stride in self.strides:
            base, _, _ = fcos_anchor_pyramid(self.image_h, self.image_w,
                                             (stride,), (stride * 4,))
            centered = base  # [N, 4] square anchors at size 4*stride
            level = []
            cx = (centered[:, 0] + centered[:, 2]) / 2
            cy = (centered[:, 1] + centered[:, 3]) / 2
            size = float(stride * 4)
            for ar in self.aspect_ratios:
                hh = size * np.sqrt(ar)
                ww = size / np.sqrt(ar)
                level.append(np.stack([cx - ww / 2, cy - hh / 2,
                                       cx + ww / 2, cy + hh / 2], -1))
            # interleave ratios per location (matches head channel order)
            anchors.append(np.stack(level, axis=1).reshape(-1, 4))
        self._anchors = jnp.asarray(np.concatenate(anchors, 0)
                                    .astype(np.float32))

    def features(self, images, train: bool = False):
        feats = self.backbone(images, train=train)
        return self.fpn([feats["c3"], feats["c4"], feats["c5"]])

    def propose(self, pyramid, nms_thresh: float = 0.7):
        """RPN forward -> fixed-count proposals per image."""
        obj, reg = self.rpn_head(pyramid)              # [B, N], [B, N, 4]
        boxes = box_ops.delta_decode(reg, self._anchors[None])
        boxes = box_ops.clip_boxes(boxes, self.image_h, self.image_w)
        k = self.num_proposals
        top_scores, top_idx = jax.lax.top_k(obj, k * 2)
        take = jax.vmap(lambda arr, idx: arr[idx])
        top_boxes = take(boxes, top_idx)
        keep = jax.vmap(lambda bx, sc: nms_fixed(
            bx, sc, jnp.ones(k * 2, bool), nms_thresh))(top_boxes, top_scores)
        # stable-order top-k of kept entries
        sel_scores = jnp.where(keep, top_scores, -jnp.inf)
        final_scores, final_idx = jax.lax.top_k(sel_scores, k)
        final_boxes = take(top_boxes, final_idx)
        return final_boxes, final_scores, final_scores > -jnp.inf

    def roi_forward(self, pyramid, proposals):
        """Per-image RoIAlign + heads. proposals [B, R, 4]."""
        def per_image(feats, rois):
            pooled = multiscale_roi_align(list(feats), rois, 7, self.strides)
            x = self.box_head(pooled)
            return self.predictor(x)

        return jax.vmap(
            lambda *fs_and_rois: per_image(fs_and_rois[:-1], fs_and_rois[-1])
        )(*pyramid, proposals)

    def __call__(self, images, train: bool = False):
        pyramid = self.features(images, train=train)
        proposals, rpn_scores, valid = self.propose(pyramid)
        head = self.roi_forward(pyramid, proposals)
        return {"proposals": proposals, "rpn_scores": rpn_scores,
                "proposal_valid": valid, **head}


def decode_rcnn_detections(outputs: Dict[str, jnp.ndarray], num_classes: int,
                           score_thresh: float = 0.1, nms_thresh: float = 0.5,
                           max_dets: int = 32) -> Dict[str, jnp.ndarray]:
    """Per-roi class softmax -> per-class delta decode -> NMS, fixed shape
    (roi_heads.py:243-326 equivalent)."""
    probs = jax.nn.softmax(outputs["scores"], axis=-1)      # [B, R, C]
    b, r, c = probs.shape
    deltas = outputs["deltas"].reshape(b, r, c, 4)
    props = outputs["proposals"]                             # [B, R, 4]
    boxes = box_ops.delta_decode(
        deltas, props[:, :, None, :], weights=(10.0, 10.0, 5.0, 5.0))

    # drop background column 0; flatten (roi, class) pairs
    fg_probs = probs[:, :, 1:].reshape(b, -1)
    fg_boxes = boxes[:, :, 1:, :].reshape(b, -1, 4)
    labels = jnp.broadcast_to(jnp.arange(1, c)[None, None, :],
                              (b, r, c - 1)).reshape(b, -1)
    valid = (fg_probs > score_thresh) & outputs["proposal_valid"][
        :, :, None].repeat(c - 1, axis=2).reshape(b, -1)

    masked = jnp.where(valid, fg_probs, 0.0)
    top_scores, top_idx = jax.lax.top_k(masked, max_dets)
    take = jax.vmap(lambda arr, idx: arr[idx])
    out_boxes = take(fg_boxes, top_idx)
    out_labels = take(labels, top_idx)
    out_valid = top_scores > score_thresh
    from handnet_tpu.ops.nms import batched_nms_fixed

    keep = jax.vmap(lambda bx, sc, lb, va: batched_nms_fixed(
        bx, sc, lb, va, nms_thresh))(out_boxes, top_scores, out_labels,
                                     out_valid)
    side = jax.vmap(lambda arr, idx: arr[idx])(
        outputs["side"].argmax(-1).repeat(c - 1, axis=1), top_idx)
    return {"boxes": out_boxes, "scores": jnp.where(keep, top_scores, 0.0),
            "labels": out_labels, "valid": keep, "sides": side}


def rcnn_loss(outputs: Dict[str, jnp.ndarray],
              targets: Dict[str, jnp.ndarray],
              num_classes: int) -> Dict[str, jnp.ndarray]:
    """Proposal->GT matching + fastrcnn losses (roi_heads.py:16-80), fully
    vectorized with validity masks; aux 100DOH losses on hand-matched rois."""
    props = outputs["proposals"]                   # [B, R, 4]
    iou = jax.vmap(box_ops.box_iou)(props, targets["boxes"])  # [B, R, M]
    iou = jnp.where(targets["valid"][:, None, :], iou, -1.0)
    best_iou = iou.max(-1)
    match = iou.argmax(-1)
    take_rows = jax.vmap(lambda arr, idx: arr[idx])
    gt_labels = take_rows(targets["labels"], match)
    gt_boxes = take_rows(targets["boxes"], match)

    fg = best_iou >= 0.5
    bg = (best_iou < 0.5) & (best_iou >= 0.0)
    cls_target = jnp.where(fg, gt_labels, 0)
    sample = fg | bg
    n_sample = jnp.maximum(sample.sum(), 1)

    logits = outputs["scores"].astype(jnp.float32)
    ce = -jax.nn.log_softmax(logits)[
        jnp.arange(logits.shape[0])[:, None],
        jnp.arange(logits.shape[1])[None, :], cls_target]
    loss_cls = jnp.where(sample, ce, 0.0).sum() / n_sample

    b, r = fg.shape
    deltas = outputs["deltas"].astype(jnp.float32).reshape(b, r, num_classes, 4)
    sel = jnp.take_along_axis(
        deltas, cls_target[:, :, None, None].repeat(4, 3), 2)[:, :, 0]
    # degenerate (zero-width, clipped) proposals make delta_encode's log NaN,
    # which poisons gradients even through the fg mask — sanitize first
    props_safe = jnp.concatenate(
        [props[..., :2], jnp.maximum(props[..., 2:], props[..., :2] + 1.0)],
        axis=-1)
    gt_safe = jnp.concatenate(
        [gt_boxes[..., :2],
         jnp.maximum(gt_boxes[..., 2:], gt_boxes[..., :2] + 1.0)], axis=-1)
    reg_target = box_ops.delta_encode(gt_safe, props_safe,
                                      weights=(10.0, 10.0, 5.0, 5.0))
    n_fg = jnp.maximum(fg.sum(), 1)
    loss_reg = (jnp.where(fg[..., None], smooth_l1(sel - reg_target), 0.0)
                .sum() / n_fg)

    losses = {"loss_classifier": loss_cls, "loss_box_reg": loss_reg}
    if "box_info" in targets:
        info = take_rows(targets["box_info"], match)
        side_t = jnp.clip(info[..., 1], 0).astype(jnp.int32)
        side_logits = outputs["side"].astype(jnp.float32)
        side_ce = -jax.nn.log_softmax(side_logits)[
            jnp.arange(b)[:, None], jnp.arange(r)[None, :],
            jnp.where(side_t > 0, cls_target, 0)]
        hand_fg = fg & (info[..., 1] >= 0)
        losses["loss_hand_side"] = (
            jnp.where(hand_fg, side_ce, 0.0).sum()
            / jnp.maximum(hand_fg.sum(), 1)) * 0.1
    return losses
