"""FCOS hand detector — TPU-native redesign.

Reference (fcos_utils/fcos.py):
  ResNet-34 + FPN over layers 2/3/4 (strides 8/16/32, :476-493), shared conv
  towers with GroupNorm(32) (:203-395), 100DOH extension heads (hand side,
  contact state, offset vector :251-264,289-320), center-sampling matcher
  (:523-570), focal/GIoU/ctrness losses (:44-178), and a host-looped
  postprocess with torchvision ``batched_nms`` (:572-659).

TPU-native design decisions:
* Static input size (cfg.image_h x image_w) replacing GeneralizedRCNNTransform's
  dynamic min/max resize (fcos.py:501-505). 480x640 frames resize to 800x1067
  and pad to 800x1088; boxes are rescaled back to the original frame on device.
* All-level head outputs concatenate into one flat ``[B, N, .]`` anchor axis;
  anchors are compile-time constants.
* Decode is fixed-shape: score mask -> top-K -> O(K^2) on-device NMS -> [B, K]
  padded detections + validity mask. No per-image python loop, no host sync.
* The matcher and losses are fully vectorized over (batch, anchors, padded GTs)
  with validity masks instead of ragged lists.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import FCOSConfig
from handnet_tpu.nn.fpn import FPN
from handnet_tpu.nn.resnet import resnet34
from handnet_tpu.ops import boxes as box_ops
from handnet_tpu.ops.anchors import fcos_anchor_pyramid
from handnet_tpu.ops.focal import bce_with_logits, sigmoid_focal_loss
from handnet_tpu.ops.nms import batched_nms_fixed


class ConvTower(nn.Module):
    """num_convs x (conv3x3 + GroupNorm(32) + ReLU), shared across FPN levels
    (reference fcos.py:235-240,355-360). epsilon=1e-5 matches torch GN."""

    channels: int
    num_convs: int = 4
    dtype: Any = jnp.float32
    quant: bool = False  # dynamic-int8 convs (nn/quant.py)
    gn_fast_variance: bool = False  # single-pass XLA variance (serving only)

    @nn.compact
    def __call__(self, x):
        from handnet_tpu.nn.quant import conv_layer

        for i in range(self.num_convs):
            x = conv_layer(self.quant, self.channels, (3, 3), padding=1,
                           dtype=self.dtype, name=f"conv{i}")(x)
            # default use_fast_variance=False: the E[x^2]-E[x]^2 form can go
            # negative under fp cancellation once activations grow, and
            # rsqrt(neg) NaNs the gradient mid-training (observed at ~step
            # 80) — the fast path is serving-only, forced off by the
            # trainers (identical parameter tree both ways)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                             dtype=self.dtype,
                             use_fast_variance=self.gn_fast_variance,
                             name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


def _group_norm(x, scale, bias, num_groups: int, eps: float = 1e-5):
    """Functional GroupNorm over the last axis."""
    c = x.shape[-1]
    g = x.reshape(x.shape[:-1] + (num_groups, c // num_groups))
    mean = g.mean(axis=-1, keepdims=True)
    var = ((g - mean) ** 2).mean(axis=-1, keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(x.shape) * scale + bias


class FCOSHead(nn.Module):
    """Both towers + all output convs. Parameters are shared across levels;
    ``__call__`` maps over the level list and concatenates flat outputs.

    ``fused_towers=True`` evaluates the cls and reg towers as ONE
    512-channel tower: layer 1 concatenates output channels, layers 2-4 are
    2-group grouped convs (block-diagonal = two independent towers), and
    GroupNorm keeps 8-channel groups — bit-identical math. Measured on v5e
    it REGRESSES (~2x slower pipeline): Mosaic lowers grouped convs poorly,
    so the default stays False; kept as an option + regression test because
    the fusion is the right call on hardware with native grouped-conv
    support. Parameters are stored identically either way.
    """

    cfg: FCOSConfig
    dtype: Any = jnp.float32
    fused_towers: bool = False

    def setup(self):
        c = self.cfg.fpn_channels
        # towers carry the head's FLOPs and take the quant path; the final
        # prediction convs below stay float (tiny FLOPs, accuracy-critical)
        self.cls_tower = ConvTower(c, self.cfg.num_convs, self.dtype,
                                   quant=self.cfg.quant,
                                   gn_fast_variance=self.cfg.gn_fast_variance)
        self.reg_tower = ConvTower(c, self.cfg.num_convs, self.dtype,
                                   quant=self.cfg.quant,
                                   gn_fast_variance=self.cfg.gn_fast_variance)
        prior = self.cfg.prior_prob
        bias_init = nn.initializers.constant(
            -float(np.log((1.0 - prior) / prior)))
        self.cls_logits = nn.Conv(self.cfg.num_classes, (3, 3), padding=1,
                                  bias_init=bias_init, dtype=self.dtype)
        self.hand_lr = nn.Conv(2, (3, 3), padding=1, dtype=self.dtype)
        if self.cfg.ext:
            self.hand_contact = nn.Conv(5, (3, 3), padding=1, dtype=self.dtype)
            self.hand_dxdy = nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)
        self.bbox_reg = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype)
        self.bbox_ctrness = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)

    def _towers(self, f):
        """(cls_tower(f), reg_tower(f)) — fused into one wide grouped conv
        stack at apply time when fused_towers (identical math)."""
        if not self.fused_towers or self.is_initializing():
            return self.cls_tower(f), self.reg_tower(f)
        cp = self.cls_tower.variables["params"]
        rp = self.reg_tower.variables["params"]
        c = self.cfg.fpn_channels
        x = f
        for i in range(self.cfg.num_convs):
            kc = cp[f"conv{i}"]["kernel"].astype(self.dtype)
            kr = rp[f"conv{i}"]["kernel"].astype(self.dtype)
            kernel = jnp.concatenate([kc, kr], axis=-1)   # [3,3,Cin,2C]
            bias = jnp.concatenate([cp[f"conv{i}"]["bias"],
                                    rp[f"conv{i}"]["bias"]]).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=1 if i == 0 else 2)
            scale = jnp.concatenate([cp[f"gn{i}"]["scale"],
                                     rp[f"gn{i}"]["scale"]]).astype(self.dtype)
            gbias = jnp.concatenate([cp[f"gn{i}"]["bias"],
                                     rp[f"gn{i}"]["bias"]]).astype(self.dtype)
            # 64 groups of 8 channels == two independent GroupNorm(32, 256)
            x = _group_norm(x + bias, scale, gbias, num_groups=64)
            x = nn.relu(x)
        return x[..., :c], x[..., c:]

    def __call__(self, features: List[jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        outs: Dict[str, list] = {k: [] for k in (
            "cls_logits", "hand_lr", "hand_contact_state", "hand_dxdy",
            "bbox_regression", "bbox_ctrness")}
        b = features[0].shape[0]
        for f in features:
            cls_t, reg_t = self._towers(f)
            outs["cls_logits"].append(
                self.cls_logits(cls_t).reshape(b, -1, self.cfg.num_classes))
            outs["hand_lr"].append(self.hand_lr(cls_t).reshape(b, -1, 2))
            if self.cfg.ext:
                outs["hand_contact_state"].append(
                    self.hand_contact(cls_t).reshape(b, -1, 5))
                # relu then L2-normalize the (dx, dy) pair scaled by 0.1,
                # keeping the magnitude channel raw (fcos.py:301-303)
                dxdy = nn.relu(self.hand_dxdy(cls_t))
                mag = dxdy[..., :1]
                vec = dxdy[..., 1:]
                # eps inside the sqrt: grad at an exactly-zero vector (common
                # after relu) would otherwise be NaN
                norm = jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True)
                                + 1e-12)
                vec = 0.1 * vec / norm
                outs["hand_dxdy"].append(
                    jnp.concatenate([mag, vec], axis=-1).reshape(b, -1, 3))
            # relu on box regression (fcos.py:379)
            outs["bbox_regression"].append(
                nn.relu(self.bbox_reg(reg_t)).reshape(b, -1, 4))
            outs["bbox_ctrness"].append(
                self.bbox_ctrness(reg_t).reshape(b, -1, 1))
        result = {k: jnp.concatenate(v, axis=1) for k, v in outs.items() if v}
        return result


class FCOS(nn.Module):
    """Backbone + FPN + head. Returns raw flat head outputs; decode/loss are
    pure functions below (so one traced forward serves train/eval/pipeline)."""

    cfg: FCOSConfig = FCOSConfig()
    backbone_norm: str = "frozen"  # torchvision pretrained backbones freeze BN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """images: ``[B, H, W, 3]`` already resized+normalized (see preprocess)."""
        feats = resnet34(norm=self.backbone_norm, dtype=self.dtype,
                         s2d_stem=self.cfg.s2d_stem, quant=self.cfg.quant,
                         name="backbone")(images, train=train)
        pyramid = FPN(out_channels=self.cfg.fpn_channels, dtype=self.dtype,
                      quant=self.cfg.quant,
                      name="fpn")([feats["c3"], feats["c4"], feats["c5"]])
        return FCOSHead(cfg=self.cfg, dtype=self.dtype, name="head")(pyramid)


# ---------------------------------------------------------------------------
# Preprocessing (GeneralizedRCNNTransform equivalent, static shapes).


def preprocess(images: jnp.ndarray, cfg: FCOSConfig) -> Tuple[jnp.ndarray, Tuple[float, float]]:
    """Resize RGB ``[B, H, W, 3]`` (0-1 float, or uint8 — dequantized here so
    frames can cross host->device at sensor width) to the static input size
    and normalize.

    Returns the network input and the (scale_y, scale_x) mapping from original
    pixels to network pixels (used to rescale boxes back, fcos.py:770-783).
    The aspect-preserving resize targets the full ``image_h`` and pads width to
    ``image_w`` (bottom/right zero padding, like torchvision's batch padding).
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    b, h, w, _ = images.shape
    scale = min(cfg.image_h / h, cfg.image_w / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    mean = jnp.asarray(cfg.image_mean, images.dtype)
    std = jnp.asarray(cfg.image_std, images.dtype)
    if (new_h, new_w) == (h, w):
        # native operating point: no resample at all
        resized = (images - mean) / std
        if (new_h, new_w) == (cfg.image_h, cfg.image_w):
            return resized, (new_h / h, new_w / w)
        padded = jnp.zeros((b, cfg.image_h, cfg.image_w, 3), images.dtype)
        padded = jax.lax.dynamic_update_slice(padded, resized, (0, 0, 0, 0))
        return padded, (new_h / h, new_w / w)
    # Separable matmul resize with the batch-pad fused in as zero rows/cols
    # (ops/resize.py): rides the MXU instead of jax.image.resize's gathers —
    # measured 28.6 -> ~4 ms/batch at the parity profile (profile_parity).
    # Normalize BEFORE resizing: the weight rows sum to 1 inside the valid
    # region (affine ops commute with the resize there) and to 0 in the pad
    # region (which therefore stays exactly zero, as before).
    from handnet_tpu.ops.resize import resize_bilinear_matmul

    normalized = (images - mean) / std
    padded = resize_bilinear_matmul(normalized, new_h, new_w,
                                    padded_hw=(cfg.image_h, cfg.image_w))
    return padded, (new_h / h, new_w / w)


def anchors_for(cfg: FCOSConfig):
    anchors, anchor_sizes, level_slices = fcos_anchor_pyramid(
        cfg.image_h, cfg.image_w, cfg.strides)
    return jnp.asarray(anchors), jnp.asarray(anchor_sizes), level_slices


# ---------------------------------------------------------------------------
# Decode (postprocess_detections equivalent, fixed shape).


def decode_detections(head: Dict[str, jnp.ndarray], anchors: jnp.ndarray,
                      cfg: FCOSConfig, scale_to_original=None
                      ) -> Dict[str, jnp.ndarray]:
    """Fixed-shape detection decode (reference fcos.py:572-659).

    Returns dict of ``[B, K]``-shaped arrays: boxes, scores, labels, sides,
    valid (+ contacts, dxdymags when ext). K = cfg.max_detections. Invalid
    slots have score 0 / valid False.
    """
    k = cfg.max_detections
    cls_logits = head["cls_logits"].astype(jnp.float32)
    ctrness = head["bbox_ctrness"].astype(jnp.float32)
    reg = head["bbox_regression"].astype(jnp.float32)

    # score = sqrt(sigmoid(cls) * sigmoid(ctr)) (fcos.py:598)
    scores = jnp.sqrt(jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(ctrness))
    scores_max = scores.max(axis=-1)                      # [B, N]
    labels_max = scores.argmax(axis=-1)                   # [B, N]
    mask = scores_max > cfg.score_thresh                  # hard 0.7 (fcos.py:600)

    boxes = box_ops.linear_decode(reg, anchors[None])     # [B, N, 4]

    masked_scores = jnp.where(mask, scores_max, 0.0)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)  # [B, K]
    take = jax.vmap(lambda arr, idx: arr[idx])
    top_boxes = take(boxes, top_idx)
    top_labels = take(labels_max, top_idx)
    valid = top_scores > cfg.score_thresh

    keep = jax.vmap(
        lambda bx, sc, lb, va: batched_nms_fixed(bx, sc, lb, va,
                                                 cfg.post_nms_thresh)
    )(top_boxes, top_scores, top_labels, valid)

    sides = jax.nn.sigmoid(head["hand_lr"].astype(jnp.float32)).argmax(axis=-1)
    out = {
        "boxes": top_boxes,
        "scores": jnp.where(keep, top_scores, 0.0),
        "labels": top_labels,
        "sides": take(sides, top_idx),
        "valid": keep,
    }
    if "hand_contact_state" in head:
        contacts = jax.nn.sigmoid(
            head["hand_contact_state"].astype(jnp.float32)).argmax(axis=-1)
        out["contacts"] = take(contacts, top_idx)
        out["dxdymags"] = take(head["hand_dxdy"].astype(jnp.float32), top_idx)
    if scale_to_original is not None:
        sy, sx = scale_to_original
        out["boxes"] = out["boxes"] * jnp.asarray([1 / sx, 1 / sy, 1 / sx, 1 / sy],
                                                  jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Matcher + loss (compute_loss equivalent, fully vectorized).


def match_anchors(anchors: jnp.ndarray, anchor_sizes: jnp.ndarray,
                  level_slices, gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                  center_sampling_radius: float = 1.5) -> jnp.ndarray:
    """Center-sampling matcher for ONE image (vmap over batch).

    Vectorized port of the per-image loop at fcos.py:530-568. Deviation: the
    area tiebreak uses the true GT area; the reference computes
    ``(y1-x1)*(y2-y1)`` (fcos.py:563) which is a bug that only changes which
    of several overlapping GTs wins.

    Returns matched GT index per anchor, -1 for background. ``gt_boxes`` is
    ``[M, 4]`` padded, ``gt_valid`` ``[M]`` bool.
    """
    n = anchors.shape[0]
    gt_centers = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2          # [M, 2]
    anchor_centers = (anchors[:, :2] + anchors[:, 2:]) / 2        # [N, 2]

    dist = jnp.abs(anchor_centers[:, None, :] - gt_centers[None, :, :]).max(-1)
    pairwise = dist < center_sampling_radius * anchor_sizes[:, None]

    x = anchor_centers[:, 0:1]
    y = anchor_centers[:, 1:2]
    ltrb = jnp.stack([
        x - gt_boxes[None, :, 0], y - gt_boxes[None, :, 1],
        gt_boxes[None, :, 2] - x, gt_boxes[None, :, 3] - y,
    ], axis=-1)                                                   # [N, M, 4]
    pairwise &= ltrb.min(axis=-1) > 0

    # per-level scale range: [4*size, 8*size], open at the pyramid ends
    # (fcos.py:555-558)
    lower = anchor_sizes * 4
    upper = anchor_sizes * 8
    first_count = level_slices[0][1]
    last_start = level_slices[-1][0]
    idx = jnp.arange(n)
    lower = jnp.where(idx < first_count, 0.0, lower)
    upper = jnp.where(idx >= last_start, jnp.inf, upper)
    max_dist = ltrb.max(axis=-1)
    pairwise &= (max_dist > lower[:, None]) & (max_dist < upper[:, None])
    pairwise &= gt_valid[None, :]

    gt_areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    quality = pairwise.astype(jnp.float32) * (1e8 - gt_areas[None, :])
    best = quality.max(axis=1)
    matched = quality.argmax(axis=1)
    return jnp.where(best < 1e-5, -1, matched)


def fcos_loss(head: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray],
              anchors: jnp.ndarray, anchor_sizes: jnp.ndarray, level_slices,
              cfg: FCOSConfig) -> Dict[str, jnp.ndarray]:
    """All FCOS losses (reference FCOSHead.compute_loss, fcos.py:44-178).

    ``targets`` (all fixed-shape, padded):
      boxes ``[B, M, 4]``, labels ``[B, M]`` int, valid ``[B, M]`` bool,
      and when cfg.ext also box_info ``[B, M, 5]`` =
      (contact_state, hand_side, magnitude, dx, dy) — the roiFPNbatchLoader
      layout (lib/roi_data_layer/roiFPNbatchLoader.py:17-59).
    """
    cls_logits = head["cls_logits"].astype(jnp.float32)    # [B, N, C]
    reg = head["bbox_regression"].astype(jnp.float32)      # [B, N, 4]
    ctrness = head["bbox_ctrness"].astype(jnp.float32)[..., 0]
    hand_lr = head["hand_lr"].astype(jnp.float32)

    matched = jax.vmap(
        lambda gb, gv: match_anchors(anchors, anchor_sizes, level_slices,
                                     gb, gv, cfg.center_sampling_radius)
    )(targets["boxes"], targets["valid"])                   # [B, N]

    fg = matched >= 0                                        # [B, N]
    num_fg = jnp.maximum(fg.sum(), 1).astype(jnp.float32)
    midx = jnp.maximum(matched, 0)

    take_rows = jax.vmap(lambda arr, idx: arr[idx])
    gt_boxes_at = take_rows(targets["boxes"], midx)          # [B, N, 4]
    gt_labels_at = take_rows(targets["labels"], midx)        # [B, N]

    # classification: focal on one-hot (background rows all-zero)
    cls_targets = jax.nn.one_hot(gt_labels_at, cfg.num_classes) * fg[..., None]
    loss_cls = sigmoid_focal_loss(cls_logits, cls_targets).sum()

    # hand side: focal on one-hot of box_info[:, 1] (fcos.py:113-118)
    if "box_info" in targets:
        gt_side = take_rows(targets["box_info"][..., 1], midx).astype(jnp.int32)
        side_targets = jax.nn.one_hot(gt_side, 2) * fg[..., None]
        loss_hand_lr = sigmoid_focal_loss(hand_lr, side_targets).sum() * 2e-2
    else:
        loss_hand_lr = jnp.zeros(())

    # box regression: masked GIoU sum (fcos.py:132-142)
    pred_boxes = box_ops.linear_decode(reg, anchors[None])
    giou = box_ops.giou_loss(pred_boxes, gt_boxes_at)
    loss_reg = jnp.where(fg, giou, 0.0).sum()

    # centerness BCE vs sqrt((min/max l,r)*(min/max t,b)) (fcos.py:144-162)
    ltrb = box_ops.linear_encode(anchors[None], gt_boxes_at)
    lr_ = ltrb[..., 0::2]
    tb = ltrb[..., 1::2]
    ctr_target = jnp.sqrt(jnp.abs(
        (lr_.min(-1) / jnp.where(lr_.max(-1) == 0, 1, lr_.max(-1)))
        * (tb.min(-1) / jnp.where(tb.max(-1) == 0, 1, tb.max(-1)))))
    loss_ctr = jnp.where(fg, bce_with_logits(ctrness, ctr_target), 0.0).sum()

    losses = {
        "classification": loss_cls / num_fg,
        "bbox_regression": loss_reg / num_fg,
        "bbox_ctrness": loss_ctr / num_fg,
        "hand_lr": loss_hand_lr / num_fg,
    }

    if cfg.ext and "hand_contact_state" in head and "box_info" in targets:
        contact = head["hand_contact_state"].astype(jnp.float32)
        gt_contact = take_rows(targets["box_info"][..., 0], midx).astype(jnp.int32)
        contact_targets = jax.nn.one_hot(gt_contact, 5) * fg[..., None]
        losses["hand_contact_state"] = (
            sigmoid_focal_loss(contact, contact_targets).sum() * 1e-2 / num_fg)
        # dxdy MSE over ALL anchors (the reference uses default 'mean'
        # reduction then still divides by num_fg, fcos.py:129-130,176)
        dxdy = head["hand_dxdy"].astype(jnp.float32)
        gt_dxdy = take_rows(targets["box_info"][..., 2:5], midx)
        losses["hand_dxdy"] = ((dxdy - gt_dxdy) ** 2).mean() * 10.0 / num_fg

    return losses


class FCOSSystem:
    """Module + static anchor tables + jit-able end-to-end entries."""

    def __init__(self, cfg: Optional[FCOSConfig] = None,
                 backbone_norm: str = "frozen", dtype: Any = jnp.float32):
        self.cfg = cfg or FCOSConfig()
        self.module = FCOS(cfg=self.cfg, backbone_norm=backbone_norm,
                           dtype=dtype)
        self.anchors, self.anchor_sizes, self.level_slices = anchors_for(self.cfg)

    def init(self, rng, batch_size: int = 1):
        x = jnp.zeros((batch_size, self.cfg.image_h, self.cfg.image_w, 3),
                      jnp.float32)
        return self.module.init(rng, x, train=False)

    def detect(self, variables, images_01: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """0-1 RGB frames ``[B, H, W, 3]`` -> padded detections in original
        pixel coordinates. One jitted graph (resize -> backbone -> decode)."""
        net_in, scale = preprocess(images_01, self.cfg)
        head = self.module.apply(variables, net_in, train=False)
        return decode_detections(head, self.anchors, self.cfg,
                                 scale_to_original=scale)

    def loss(self, variables, net_images: jnp.ndarray,
             targets: Dict[str, jnp.ndarray], train: bool = True):
        if train:
            head, updates = self.module.apply(
                variables, net_images, train=True,
                mutable=["batch_stats"] if self._has_batch_stats(variables) else [])
        else:
            head, updates = self.module.apply(variables, net_images,
                                              train=False), {}
        losses = fcos_loss(head, targets, self.anchors, self.anchor_sizes,
                           self.level_slices, self.cfg)
        return losses, updates

    @staticmethod
    def _has_batch_stats(variables) -> bool:
        return "batch_stats" in variables
