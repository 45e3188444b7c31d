"""A2J anchor-to-joint regressor — TPU-native redesign.

Reference architecture (a2j/a2j.py:212-250):
  ResNet-50 backbone (layer4 dilated, stride 16) -> three conv towers:
    classification (from stage-3, 1024ch), in-plane regression and depth
    regression (from stage-4, 2048ch); each tower is 4x(conv3x3+BN+ReLU) + an
    output conv (a2j/a2j.py:44-181).
  Post-process: per-joint softmax over all H*W*A anchors, softmax-weighted sum
  of (anchor + offset) and of depth (a2j/anchor.py:44-82).

TPU-native differences:
* NHWC; heads emit ``[B, H, W, A*P*{1,2}]`` which reshapes for free into the
  flat anchor axis — no torch-style permutes.
* The reference post-process loops over the batch in python and syncs to CPU
  per image (anchor.py:65, a2j.py:229). Here it is ONE fused softmax+einsum
  over the whole batch that never leaves the device.
* The loss (anchor.py:84-153) is the same math vectorized over batch/joints,
  including the reference's quirk of adding the *raw L1* depth error rather
  than its computed smooth-L1 (anchor.py:150) — reproduced behind a flag so
  training matches the reference recipe bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import A2JConfig
from handnet_tpu.nn.resnet import make_norm, _call_norm, resnet50_dilated
from handnet_tpu.ops.anchors import a2j_anchor_grid
from handnet_tpu.ops.focal import smooth_l1


class A2JHead(nn.Module):
    """Shared tower shape for the three A2J heads (a2j/a2j.py:44-181):
    4x(conv3x3 + BN + ReLU) + output conv3x3 with ``out_per_anchor`` channels
    per anchor/joint."""

    out_channels: int
    features: int = 256
    norm: str = "batch"
    dtype: Any = jnp.float32
    quant: bool = False  # int8 tower convs; the output conv stays float

    @nn.compact
    def __call__(self, x, train: bool = False):
        from handnet_tpu.nn.quant import conv_layer

        norm = make_norm(self.norm, self.dtype)
        for i in range(4):
            x = conv_layer(self.quant, self.features, (3, 3), padding=1,
                           dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = _call_norm(norm(name=f"bn{i + 1}"), x, train)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="output")(x)


class A2J(nn.Module):
    """Full A2J model. ``__call__`` returns raw head tensors; use
    :func:`a2j_postprocess` / :func:`a2j_loss` on top (they are pure functions
    so the same forward serves inference, training and the fused pipeline)."""

    cfg: A2JConfig = A2JConfig()
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """x: ``[B, H, W, C]`` with C = 1 (depth) or 4 (RGBD).

        Returns dict with:
          cls:   ``[B, N, P]``   anchor-response logits
          reg:   ``[B, N, P, 2]`` in-plane offsets
          depth: ``[B, N, P]``   per-anchor depth estimates
        where N = feat_h * feat_w * A.
        """
        cfg = self.cfg
        if cfg.in_channels == 1 and x.shape[-1] == 1:
            # depth replicated to 3 channels to reuse RGB-pretrained stem
            # (reference a2j/a2j.py:197-199)
            x = jnp.repeat(x, 3, axis=-1)
        backbone = resnet50_dilated(norm=self.norm, dtype=self.dtype,
                                    quant=cfg.quant, name="backbone")
        feats = backbone(x, train=train)
        x3, x4 = feats["c4"], feats["c5"]  # both stride 16 (dilated layer4)

        p = cfg.num_joints
        a = cfg.num_anchors
        b = x.shape[0]

        cls = A2JHead(a * p, cfg.head_features, self.norm, self.dtype,
                      quant=cfg.quant, name="classification")(x3, train=train)
        reg = A2JHead(a * p * 2, cfg.head_features, self.norm, self.dtype,
                      quant=cfg.quant, name="regression")(x4, train=train)
        out = {
            "cls": cls.reshape(b, -1, p),
            "reg": reg.reshape(b, -1, p, 2),
        }
        if cfg.is_3d:
            depth = A2JHead(a * p, cfg.head_features, self.norm, self.dtype,
                            quant=cfg.quant, name="depth")(x4, train=train)
            out["depth"] = depth.reshape(b, -1, p)
        return out


def anchors_for(cfg: A2JConfig) -> np.ndarray:
    return a2j_anchor_grid(cfg.feat_h, cfg.feat_w, cfg.stride,
                           cfg.anchor_offsets, transposed=cfg.transposed_anchors)


def a2j_postprocess(heads: Dict[str, jnp.ndarray], anchors: jnp.ndarray,
                    use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Fused anchor aggregation -> UVD keypoints ``[B, P, 3]``.

    Replaces the reference's per-image loop + CPU sync (a2j/anchor.py:57-82,
    a2j/a2j.py:226-229). Two equivalent paths:

    * einsum (XLA, the default): batched softmax + two einsums — portable,
      lowers for every platform (AOT export uses it), and XLA fuses it into
      the surrounding pipeline graph.
    * pallas (opt-in): ops/pallas_a2j.py keeps the softmax weights in VMEM
      instead of round-tripping the [B, N, P] tensor through HBM — measured
      4.5x faster STANDALONE on v5e (2.9ms vs 13.0ms at batch 128), but
      IN-PIPELINE the einsum path measured at or slightly above it in the
      same window (1684.0 vs 1659.8 fps e2e, tools/bench_gn_matrix.py
      2026-08-21) — the pallas_call is a fusion barrier for the surrounding
      graph, the same mechanism that killed the pallas GN serving flag
      (round 4). Einsum has been the default since round 5; it also makes
      live serving bit-identical to the exported AOT artifact.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas and "depth" in heads:
        from handnet_tpu.ops.pallas_a2j import a2j_decode_pallas

        return a2j_decode_pallas(heads["cls"], heads["reg"], heads["depth"],
                                 anchors)
    cls = heads["cls"].astype(jnp.float32)          # [B, N, P]
    reg = heads["reg"].astype(jnp.float32)          # [B, N, P, 2]
    w = jax.nn.softmax(cls, axis=1)                  # softmax over anchors
    pos = anchors[None, :, None, :] + reg            # [B, N, P, 2]
    xy = jnp.einsum("bnp,bnpc->bpc", w, pos)
    if "depth" in heads:
        depth = heads["depth"].astype(jnp.float32)   # [B, N, P]
        d = jnp.einsum("bnp,bnp->bp", w, depth)
        return jnp.concatenate([xy, d[..., None]], axis=-1)
    return xy


def a2j_loss(heads: Dict[str, jnp.ndarray], gt_uvd: jnp.ndarray,
             anchors: jnp.ndarray, spatial_factor: float = 0.5,
             depth_beta: float = 3.0, reference_depth_quirk: bool = True
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """A2J anchor-surrogate + offset losses (reference a2j/anchor.py:84-153).

    Args:
      heads: model outputs (see :class:`A2J`).
      gt_uvd: ``[B, P, 3]`` crop-frame UVD targets.
      anchors: ``[N, 2]``.
      spatial_factor: reg-loss scale (0.5 from config/a2j.yaml).
      reference_depth_quirk: the reference computes a smooth-L1 depth term but
        then adds the *raw L1 mean* instead (anchor.py:145-150). True keeps
        that behavior; False uses the (presumably intended) smooth-L1 with
        ``beta=depth_beta``.

    Returns (cls_loss, reg_loss) — scalar means over the batch, matching the
    reference's return contract (a2j/a2j.py:232-238 multiplies reg by
    ``reg_loss_factor`` at the call site).
    """
    cls = heads["cls"].astype(jnp.float32)
    reg = heads["reg"].astype(jnp.float32)
    w = jax.nn.softmax(cls, axis=1)                             # [B, N, P]
    gt_xy = gt_uvd[..., :2]                                     # [B, P, 2]

    # "classification" loss: smooth-L1 between GT and softmax-weighted anchors
    anchor_pos = jnp.einsum("bnp,nc->bpc", w, anchors)
    anchor_loss = smooth_l1(gt_xy - anchor_pos, beta=1.0).mean(axis=(1, 2))

    # regression loss: smooth-L1 on softmax-weighted (anchor + offset)
    pred_xy = jnp.einsum("bnp,bnpc->bpc", w, anchors[None, :, None, :] + reg)
    reg_loss = smooth_l1(gt_xy - pred_xy, beta=1.0).mean(axis=(1, 2)) * spatial_factor

    if "depth" in heads:
        depth = heads["depth"].astype(jnp.float32)
        pred_d = jnp.einsum("bnp,bnp->bp", w, depth)
        diff_d = gt_uvd[..., 2] - pred_d
        if reference_depth_quirk:
            depth_term = jnp.abs(diff_d).mean(axis=1)            # anchor.py:150
        else:
            depth_term = smooth_l1(diff_d, beta=depth_beta).mean(axis=1)
        reg_loss = reg_loss + depth_term

    return anchor_loss.mean(), reg_loss.mean()


class A2JSystem:
    """Convenience wrapper pairing the module with its static anchor table.

    ``predict`` is the a2j_infer.py-equivalent entry: depth crops in, UVD out,
    one jitted graph.
    """

    def __init__(self, cfg: Optional[A2JConfig] = None, norm: str = "batch",
                 dtype: Any = jnp.float32):
        self.cfg = cfg or A2JConfig()
        self.module = A2J(cfg=self.cfg, norm=norm, dtype=dtype)
        self.anchors = jnp.asarray(anchors_for(self.cfg))
        # Decode-path override: None/False = the portable einsum decode
        # (default since round 5 — in-pipeline it measured >= the pallas
        # kernel, which is a fusion barrier; see a2j_postprocess). True
        # opts the standalone pallas kernel back in (A2JDEC=pallas in
        # bench.py / bench_gn_matrix re-prices it).
        self.decode_pallas: Optional[bool] = None

    def init(self, rng, batch_size: int = 1):
        x = jnp.zeros((batch_size, self.cfg.crop_h, self.cfg.crop_w,
                       self.cfg.in_channels), jnp.float32)
        return self.module.init(rng, x, train=False)

    def apply(self, variables, x, train: bool = False, mutable=False):
        return self.module.apply(variables, x, train=train, mutable=mutable)

    def predict(self, variables, x) -> jnp.ndarray:
        heads = self.module.apply(variables, x, train=False)
        return a2j_postprocess(heads, self.anchors,
                               use_pallas=self.decode_pallas)

    def loss_and_predict(self, variables, x, gt_uvd, train: bool = True,
                         reg_loss_factor: float = 3.0):
        if train:
            heads, updates = self.module.apply(
                variables, x, train=True, mutable=["batch_stats"])
        else:
            heads, updates = self.module.apply(variables, x, train=False), {}
        cls_loss, reg_loss = a2j_loss(heads, gt_uvd, self.anchors,
                                      self.cfg.spatial_factor)
        reg_loss = reg_loss * reg_loss_factor
        losses = {
            "classification": cls_loss,
            "regression": reg_loss,
            "total_loss": cls_loss + reg_loss,
        }
        return losses, a2j_postprocess(heads, self.anchors), updates
