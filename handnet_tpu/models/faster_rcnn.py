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
from handnet_tpu.ops.focal import bce_with_logits, smooth_l1
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
                         out_size: int, strides,
                         canonical_level: int = 4,
                         canonical_scale: float = 224.0) -> jnp.ndarray:
    """FPN level assignment (torchvision LevelMapper semantics: a
    canonical_scale-sized roi maps to pyramid level ``canonical_level``,
    k = floor(k0 + log2(sqrt(wh)/224)), clamped to the available levels):
    compute all levels, select per-roi — static shapes, no boolean gathers."""
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    k_min = int(np.log2(strides[0]))
    lvl = (jnp.floor(canonical_level + jnp.log2(scale / canonical_scale
                                                + 1e-6)) - k_min)
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
    """cls + box deltas + 100DOH extension heads, matching the reference's
    FastRCNNPredictor.forward exactly (faster_rcnn_fpn.py:227-282):

    * contact: Linear(->32) -> relu -> dropout(0.5) -> Linear(->5C)
      (faster_rcnn_fpn.py:234-237);
    * hand_dxdy: a single Linear(->3C) whose FLAT tail ``[:, 1:]`` — all
      classes' magnitudes and vectors jointly — is L2-normalized and scaled
      by 0.1 while column 0 passes through raw (faster_rcnn_fpn.py:272-274;
      the reshape(N,-1,3) downstream makes this a layout quirk of the
      reference, preserved for checkpoint parity);
    * hand side: Linear(->C) of per-class binary logits
      (faster_rcnn_fpn.py:239,270).

    ``train=True`` activates dropout (requires a ``dropout`` rng).
    """

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.num_classes
        scores = nn.Dense(c, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(c * 4, dtype=self.dtype, name="bbox_pred")(x)
        h = nn.relu(nn.Dense(32, dtype=self.dtype, name="contact_fc1")(x))
        h = nn.Dropout(0.5, deterministic=not train)(h)
        contact = nn.Dense(c * 5, dtype=self.dtype, name="contact_fc2")(h)
        dxdy_raw = nn.Dense(c * 3, dtype=self.dtype,
                            name="dxdy")(x).astype(jnp.float32)
        tail = dxdy_raw[:, 1:]
        # F.normalize semantics: v / max(||v||, 1e-12); the +1e-24 under the
        # sqrt only guards the gradient at exactly 0
        norm = jnp.maximum(
            jnp.sqrt(jnp.sum(tail * tail, axis=-1, keepdims=True) + 1e-24),
            1e-12)
        dxdy = jnp.concatenate([dxdy_raw[:, :1], 0.1 * tail / norm], axis=1)
        side = nn.Dense(c, dtype=self.dtype, name="hand_side")(x)
        return {"scores": scores, "deltas": deltas, "contact": contact,
                "dxdy": dxdy, "side": side}


def rpn_anchor_grid(image_h: int, image_w: int, strides, sizes,
                    aspect_ratios) -> np.ndarray:
    """torchvision-exact RPN anchor table (the reference's own
    fcos_utils/anchor_utils.py:56-114, wired at faster_rcnn_fpn.py:133-139):
    per-location base anchors are ratio-major, half-extent ROUNDED to
    integers, and centered on the stride grid corners (i*stride, not cell
    centers) — all preserved so converted RPN weights see the anchors they
    were trained with. Returns the level-concatenated ``[N, 4]`` table."""
    # grid sizes exactly as the pyramid produces them: conv levels divide the
    # (static) image size; the pool level is a ceil-div subsample of the
    # last conv level, and torchvision re-derives its stride as
    # image_size // grid_size (anchor_utils.py:118-125 forward)
    grids = []
    for stride in strides[:-1]:
        grids.append((image_h // stride, image_w // stride, stride, stride))
    gh, gw = (grids[-1][0] + 1) // 2, (grids[-1][1] + 1) // 2
    grids.append((gh, gw, image_h // gh, image_w // gw))

    all_anchors = []
    for (gh, gw, sh, sw), size in zip(grids, sizes):
        hs = np.array([size * np.sqrt(ar) for ar in aspect_ratios])
        ws = np.array([size / np.sqrt(ar) for ar in aspect_ratios])
        base = np.round(np.stack([-ws, -hs, ws, hs], axis=1) / 2.0)
        sx = np.arange(gw, dtype=np.float32) * sw
        sy = np.arange(gh, dtype=np.float32) * sh
        shift_x, shift_y = np.meshgrid(sx, sy)          # [gh, gw]
        shifts = np.stack([shift_x, shift_y, shift_x, shift_y],
                          axis=-1).reshape(-1, 1, 4)
        all_anchors.append((shifts + base[None]).reshape(-1, 4))
    return np.concatenate(all_anchors, 0).astype(np.float32)


class FasterRCNNFPN(nn.Module):
    """Backbone+FPN+RPN+RoI heads at the reference's geometry
    (faster_rcnn_fpn.py:112-190): resnet_fpn_backbone over c2..c5 (strides
    4-32) plus the parameter-free P6 pool level (kernel-1 stride-2
    subsample, torchvision LastLevelMaxPool) for the RPN only; anchor sizes
    (32..512) x ratios (0.5, 1, 2); RoIAlign over P2-P5 with the canonical
    224->level-4 mapping. ``__call__`` returns proposals and the per-roi
    head outputs; decode/loss are pure functions below."""

    num_classes: int = 3
    image_h: int = 800
    image_w: int = 1088
    num_proposals: int = 128
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)   # last = P6 pool level
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    backbone_norm: str = "frozen"  # converted-pretrained; from-scratch: batch
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = resnet34(norm=self.backbone_norm, dtype=self.dtype)
        self.fpn = FPN(out_channels=256, dtype=self.dtype)
        self.rpn_head = RPNHead(256, len(self.aspect_ratios), self.dtype)
        self.box_head = TwoMLPHead(1024, self.dtype)
        self.predictor = FastRCNNPredictor(self.num_classes, self.dtype)
        self._anchors = jnp.asarray(rpn_anchor_grid(
            self.image_h, self.image_w, self.strides, self.anchor_sizes,
            self.aspect_ratios))

    def features(self, images, train: bool = False):
        """P2..P5 + the parameter-free P6 subsample (RPN-only level)."""
        feats = self.backbone(images, train=train)
        pyramid = self.fpn([feats["c2"], feats["c3"], feats["c4"],
                            feats["c5"]])
        pyramid.append(pyramid[-1][:, ::2, ::2, :])   # LastLevelMaxPool
        return pyramid

    def propose(self, pyramid, nms_thresh: float = 0.7):
        """RPN forward -> fixed-count proposals per image. Also returns the
        raw per-anchor objectness/deltas for the RPN training loss.

        Proposals are cut from the gradient tape like the reference's RPN
        (torchvision RegionProposalNetwork detaches before decoding) — the
        roi heads never backprop into the RPN through the boxes.
        """
        raw_obj, raw_reg = self.rpn_head(pyramid)      # [B, N], [B, N, 4]
        obj = jax.lax.stop_gradient(raw_obj)
        reg = jax.lax.stop_gradient(raw_reg)
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
        return (final_boxes, final_scores, final_scores > -jnp.inf,
                raw_obj, raw_reg)

    def roi_forward(self, pyramid, proposals, train: bool = False):
        """RoIAlign + heads over P2-P5 (the reference's box_roi_pool
        featmap_names ['0','1','2','3'], faster_rcnn_fpn.py:155-158 — the
        P6 pool level is RPN-only). proposals [B, R, 4].

        The pooling (parameter-free) vmaps per image; the dense heads run
        once on the flattened [B*R] roi batch — one big MXU matmul instead
        of B small ones, and dropout masks stay independent per roi.
        """
        b, r = proposals.shape[:2]
        pooled = jax.vmap(
            lambda *fs_and_rois: multiscale_roi_align(
                list(fs_and_rois[:-1]), fs_and_rois[-1], 7, self.strides[:4])
        )(*pyramid[:4], proposals)                     # [B, R, 7, 7, C]
        x = self.box_head(pooled.reshape(b * r, *pooled.shape[2:]))
        out = self.predictor(x, train=train)
        return {k: v.reshape(b, r, *v.shape[1:]) for k, v in out.items()}

    def __call__(self, images, train: bool = False):
        pyramid = self.features(images, train=train)
        proposals, rpn_scores, valid, rpn_obj, rpn_reg = self.propose(pyramid)
        head = self.roi_forward(pyramid, proposals, train=train)
        return {"proposals": proposals, "rpn_scores": rpn_scores,
                "proposal_valid": valid, "rpn_objectness": rpn_obj,
                "rpn_deltas": rpn_reg, **head}


def decode_rcnn_detections(outputs: Dict[str, jnp.ndarray], num_classes: int,
                           score_thresh: float = 0.1, nms_thresh: float = 0.5,
                           max_dets: int = 32,
                           image_hw: Tuple[int, int] = None
                           ) -> Dict[str, jnp.ndarray]:
    """Fixed-shape version of the reference's RoIHeads.postprocess_detections
    (roi_heads.py:243-358): per-roi class softmax -> per-class delta decode
    -> clip to image -> background column dropped -> (roi, class) pairs
    flattened -> score threshold -> tiny-box removal (min side 1e-2) ->
    class-aware NMS. Extension outputs per pair: side = per-class
    sigmoid>0.5 binary (roi_heads.py:261-262), contact = per-class 5-way
    argmax (:266-267), dxdymags = the normalized head output reshaped
    (N,C,3) (:265).

    Deviation (documented): the reference keeps every pair past the score
    threshold and truncates to detections_per_img AFTER NMS; this takes the
    top ``max_dets`` pairs BEFORE NMS so shapes stay static — identical
    results whenever <= max_dets pairs pass the threshold.
    """
    probs = jax.nn.softmax(outputs["scores"].astype(jnp.float32), axis=-1)
    b, r, c = probs.shape
    deltas = outputs["deltas"].astype(jnp.float32).reshape(b, r, c, 4)
    props = outputs["proposals"]                             # [B, R, 4]
    boxes = box_ops.delta_decode(
        deltas, props[:, :, None, :], weights=(10.0, 10.0, 5.0, 5.0))
    if image_hw is not None:
        boxes = box_ops.clip_boxes(boxes, image_hw[0], image_hw[1])

    # drop background column 0; flatten (roi, class) pairs
    fg_probs = probs[:, :, 1:].reshape(b, -1)
    fg_boxes = boxes[:, :, 1:, :].reshape(b, -1, 4)
    labels = jnp.broadcast_to(jnp.arange(1, c)[None, None, :],
                              (b, r, c - 1)).reshape(b, -1)
    wh = fg_boxes[..., 2:] - fg_boxes[..., :2]
    not_small = (wh >= 1e-2).all(-1)              # remove_small_boxes
    valid = ((fg_probs > score_thresh) & not_small
             & outputs["proposal_valid"][:, :, None]
             .repeat(c - 1, axis=2).reshape(b, -1))

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

    sides_bin = (jax.nn.sigmoid(outputs["side"].astype(jnp.float32))
                 > 0.5).astype(jnp.float32)                  # [B, R, C]
    sides = take(sides_bin[:, :, 1:].reshape(b, -1), top_idx)
    contacts = take(
        outputs["contact"].astype(jnp.float32).reshape(b, r, c, 5)
        .argmax(-1)[:, :, 1:].reshape(b, -1), top_idx)
    dxdymags = take(
        outputs["dxdy"].astype(jnp.float32).reshape(b, r, c, 3)[:, :, 1:]
        .reshape(b, -1, 3), top_idx)
    return {"boxes": out_boxes, "scores": jnp.where(keep, top_scores, 0.0),
            "labels": out_labels, "valid": keep, "sides": sides,
            "contacts": contacts, "dxdymags": dxdymags}


def rcnn_loss(outputs: Dict[str, jnp.ndarray],
              targets: Dict[str, jnp.ndarray],
              num_classes: int) -> Dict[str, jnp.ndarray]:
    """Proposal->GT matching (Matcher 0.5/0.5 semantics, roi_heads.py:96-117)
    + the reference's fastrcnn_loss term math (roi_heads.py:16-80), fully
    vectorized with validity masks: cls CE mean over sampled rois, box
    smooth-L1(beta=1/9) summed over positives / total sampled
    (roi_heads.py:52-58), and the three 0.1-weighted aux terms averaged
    over positives (side BCE, dxdymag MSE, contact CE; roi_heads.py:61-76).
    Per-term parity vs the reference's own fastrcnn_loss:
    tests/test_reference_parity_rcnn.py.

    Deviation (documented): the reference stochastically subsamples 512
    rois/image at 25% positive fraction (BalancedPositiveNegativeSampler,
    fg cap 128). This keeps ALL proposals — deterministic and shape-static
    — but weights each fg/bg term by its EXPECTED inclusion probability
    under that sampler (fg: min(n_fg,128)/n_fg, bg: min(n_bg,512-n_fg_s)/
    n_bg, denominator n_fg_s+n_bg_s), so the loss equals the expectation of
    the reference's sampled loss instead of drowning positives in the full
    background set (the failure mode tools/rcnn_convergence.py caught in
    round 5: with every proposal kept unweighted, ~1-5 positives vs
    thousands of negatives trains an all-background classifier whose loss
    -> 0 while detecting nothing). When counts are under the caps the
    weights are 1 and the math reduces to the plain mean — which is why the
    small-input parity tests (test_reference_parity_rcnn.py) are unchanged.
    Empty-positive batches yield 0 instead of the reference's NaN
    mean-over-empty.
    """
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

    # expectation of torchvision's BalancedPositiveNegativeSampler
    # (512 rois/image, 25% positive fraction -> fg cap 128/image):
    # per-roi inclusion-probability weights, computed per image
    n_fg_i = fg.sum(1)                                     # [B]
    n_bg_i = bg.sum(1)
    n_fg_s = jnp.minimum(n_fg_i, 128)
    n_bg_s = jnp.minimum(n_bg_i, 512 - n_fg_s)
    w = (fg * (n_fg_s / jnp.maximum(n_fg_i, 1))[:, None]
         + bg * (n_bg_s / jnp.maximum(n_bg_i, 1))[:, None]
         ).astype(jnp.float32)
    n_sample = jnp.maximum((n_fg_s + n_bg_s).sum(), 1)

    logits = outputs["scores"].astype(jnp.float32)
    ce = -jax.nn.log_softmax(logits)[
        jnp.arange(logits.shape[0])[:, None],
        jnp.arange(logits.shape[1])[None, :], cls_target]
    loss_cls = (w * ce).sum() / n_sample

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
    # reference: smooth_l1(beta=1/9, reduction='sum') / labels.numel()
    # (roi_heads.py:52-58) — the denominator is the TOTAL sampled count;
    # fg rows carry their sampler inclusion weight (1 under the cap)
    loss_reg = (jnp.where(fg[..., None],
                          w[..., None]
                          * smooth_l1(sel - reg_target, beta=1.0 / 9.0), 0.0)
                .sum() / n_sample)

    losses = {"loss_classifier": loss_cls, "loss_box_reg": loss_reg}
    if "box_info" in targets:
        # the three 100DOH aux terms, each over POSITIVE rois at their
        # matched class, x0.1 (roi_heads.py:61-76); like the reference they
        # are NOT restricted to the hand class — object positives train
        # against their box_info defaults
        info = take_rows(targets["box_info"], match)
        pick = lambda arr: jnp.take_along_axis(  # [B, R, C, ...] at target
            arr, cls_target[:, :, None, None]
            .repeat(arr.shape[-1], 3), 2)[:, :, 0]

        side_sel = pick(outputs["side"].astype(jnp.float32)
                        .reshape(b, r, num_classes, 1))[..., 0]
        bce = bce_with_logits(side_sel, info[..., 1])
        losses["loss_hand_side"] = 0.1 * (
            jnp.where(fg, bce, 0.0).sum() / n_fg)

        dxdy_sel = pick(outputs["dxdy"].astype(jnp.float32)
                        .reshape(b, r, num_classes, 3))
        mse = ((dxdy_sel - info[..., 2:]) ** 2).mean(-1)
        losses["loss_dxdymag"] = 0.1 * (
            jnp.where(fg, mse, 0.0).sum() / n_fg)

        contact_sel = pick(outputs["contact"].astype(jnp.float32)
                           .reshape(b, r, num_classes, 5))
        contact_ce = -jax.nn.log_softmax(contact_sel)[
            jnp.arange(b)[:, None], jnp.arange(r)[None, :],
            jnp.clip(info[..., 0], 0).astype(jnp.int32)]
        losses["loss_contact"] = 0.1 * (
            jnp.where(fg, contact_ce, 0.0).sum() / n_fg)
    return losses


def rpn_loss(outputs: Dict[str, jnp.ndarray], anchors: jnp.ndarray,
             targets: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """RPN training loss, torchvision RegionProposalNetwork semantics (the
    native kernel the reference leans on implicitly — its RPN is
    constructed at faster_rcnn_fpn.py:147-151 with fg/bg IoU 0.7/0.3):

    * anchor assignment: fg at IoU >= 0.7, bg below 0.3, ignore between,
      plus low-quality matches — every anchor tying a GT's best IoU is
      forced foreground while keeping its own argmax GT (Matcher
      allow_low_quality_matches incl. its tie semantics);
    * objectness: BCE-with-logits mean over sampled anchors;
    * box: smooth-L1(beta=1/9) summed over foreground, normalized by the
      sampled count, on (1,1,1,1)-weighted encodings.

    Deviation (documented): torchvision randomly subsamples 256
    anchors/image at 50% positive fraction (fg cap 128). This keeps every
    non-ignored anchor — deterministic and shape-static — but weights each
    anchor's term by its EXPECTED inclusion probability under that sampler
    (fg: min(n_fg,128)/n_fg; bg: min(n_bg,256-n_fg_s)/n_bg; normalizer
    n_fg_s+n_bg_s), i.e. the loss is the expectation of torchvision's
    sampled loss. The earlier unweighted mean over ALL ~12k anchors gave
    the handful of positives ~1/1000 of their reference gradient share and
    trained an all-background RPN (loss -> 0, zero detections — caught by
    tools/rcnn_convergence.py, round 5). Under the caps the weights are 1,
    so the small-input parity tests are unchanged.
    """
    obj = outputs["rpn_objectness"].astype(jnp.float32)     # [B, N]
    deltas = outputs["rpn_deltas"].astype(jnp.float32)      # [B, N, 4]
    gt_boxes = targets["boxes"]                             # [B, M, 4]
    gt_valid = targets["valid"]                             # [B, M]

    iou = jax.vmap(box_ops.box_iou)(
        jnp.broadcast_to(anchors[None], (obj.shape[0],) + anchors.shape),
        gt_boxes)                                           # [B, N, M]
    iou = jnp.where(gt_valid[:, None, :], iou, -1.0)
    best = iou.max(-1)                                      # [B, N]
    match = iou.argmax(-1)                                  # [B, N]

    # low-quality matches: anchors tying some GT's best IoU (ties included,
    # like torchvision's set_low_quality_matches_)
    gt_best = jnp.where(gt_valid, iou.max(1), -2.0)         # [B, M]
    lowq = ((iou == gt_best[:, None, :]) & gt_valid[:, None, :]).any(-1)

    fg = (best >= 0.7) | lowq
    bg = (best < 0.3) & (best >= 0.0) & ~fg

    # expectation of torchvision's 256/image 50%-positive anchor sampler
    n_fg_i = fg.sum(1)                                      # [B]
    n_bg_i = bg.sum(1)
    n_fg_s = jnp.minimum(n_fg_i, 128)
    n_bg_s = jnp.minimum(n_bg_i, 256 - n_fg_s)
    w = (fg * (n_fg_s / jnp.maximum(n_fg_i, 1))[:, None]
         + bg * (n_bg_s / jnp.maximum(n_bg_i, 1))[:, None]
         ).astype(jnp.float32)
    n_sample = jnp.maximum((n_fg_s + n_bg_s).sum(), 1)

    label = fg.astype(jnp.float32)
    obj_loss = (w * bce_with_logits(obj, label)).sum() / n_sample

    take_rows = jax.vmap(lambda arr, idx: arr[idx])
    matched_gt = take_rows(gt_boxes, match)
    gt_safe = jnp.concatenate(
        [matched_gt[..., :2],
         jnp.maximum(matched_gt[..., 2:], matched_gt[..., :2] + 1.0)], -1)
    reg_target = box_ops.delta_encode(gt_safe, anchors[None],
                                      weights=(1.0, 1.0, 1.0, 1.0))
    box_loss = (jnp.where(fg[..., None],
                          w[..., None]
                          * smooth_l1(deltas - reg_target, beta=1.0 / 9.0),
                          0.0)
                .sum() / n_sample)
    return {"loss_objectness": obj_loss, "loss_rpn_box_reg": box_loss}
