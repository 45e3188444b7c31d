"""Faster R-CNN FPN tests: RoIAlign vs a numpy bilinear oracle, RPN proposal
shapes, end-to-end forward + loss/grad on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.models.faster_rcnn import (FasterRCNNFPN,
                                            decode_rcnn_detections,
                                            multiscale_roi_align, rcnn_loss,
                                            roi_align)


def numpy_roi_align_oracle(feat, roi, out_size, scale, sampling=2):
    h, w, c = feat.shape
    x1, y1, x2, y2 = [v * scale for v in roi]
    bw = (x2 - x1) / out_size
    bh = (y2 - y1) / out_size
    out = np.zeros((out_size, out_size, c), np.float32)

    def bilinear(yy, xx):
        y0 = min(max(int(np.floor(yy)), 0), h - 1)
        x0 = min(max(int(np.floor(xx)), 0), w - 1)
        y1i = min(y0 + 1, h - 1)
        x1i = min(x0 + 1, w - 1)
        wy = min(max(yy - y0, 0), 1)
        wx = min(max(xx - x0, 0), 1)
        return ((1 - wy) * (1 - wx) * feat[y0, x0]
                + (1 - wy) * wx * feat[y0, x1i]
                + wy * (1 - wx) * feat[y1i, x0]
                + wy * wx * feat[y1i, x1i])

    for i in range(out_size):
        for j in range(out_size):
            acc = 0.0
            for si in range(sampling):
                for sj in range(sampling):
                    yy = y1 + (i + (si + 0.5) / sampling) * bh - 0.5
                    xx = x1 + (j + (sj + 0.5) / sampling) * bw - 0.5
                    acc = acc + bilinear(yy, xx)
            out[i, j] = acc / (sampling * sampling)
    return out


def test_roi_align_matches_oracle(rng):
    feat = rng.normal(size=(16, 20, 3)).astype(np.float32)
    rois = np.array([[8.0, 8.0, 64.0, 48.0], [0.0, 0.0, 80.0, 64.0]],
                    np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 4, 0.25))
    for r in range(2):
        oracle = numpy_roi_align_oracle(feat, rois[r], 4, 0.25)
        np.testing.assert_allclose(out[r], oracle, rtol=1e-4, atol=1e-4)


def test_multiscale_assigns_levels(rng):
    pyramid = [jnp.asarray(rng.normal(size=(32, 40, 8)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(16, 20, 8)).astype(np.float32)),
               jnp.asarray(rng.normal(size=(8, 10, 8)).astype(np.float32))]
    rois = jnp.asarray([[0, 0, 40, 40], [0, 0, 300, 300]], jnp.float32)
    out = multiscale_roi_align(pyramid, rois, 7, (8, 16, 32))
    assert out.shape == (2, 7, 7, 8)
    # the small roi must come from level 0: reproduce the selection
    small = np.asarray(roi_align(pyramid[0], rois[:1], 7, 1 / 8))
    np.testing.assert_allclose(np.asarray(out[0]), small[0], rtol=1e-5)


@pytest.fixture(scope="module")
def rcnn_small():
    model = FasterRCNNFPN(num_classes=3, image_h=64, image_w=96,
                          num_proposals=16)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_rcnn_forward_shapes(rcnn_small, rng):
    model, variables = rcnn_small
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    out = model.apply(variables, x, train=False)
    assert out["proposals"].shape == (2, 16, 4)
    assert out["scores"].shape == (2, 16, 3)
    assert out["deltas"].shape == (2, 16, 12)
    assert out["contact"].shape == (2, 16, 15)
    assert out["dxdy"].shape == (2, 16, 9)
    det = decode_rcnn_detections(out, 3, max_dets=8)
    assert det["boxes"].shape == (2, 8, 4)
    assert np.isfinite(np.asarray(det["scores"])).all()


def test_rcnn_loss_and_grads(rcnn_small, rng):
    model, variables = rcnn_small
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    targets = {
        "boxes": jnp.asarray([[[10.0, 10.0, 40.0, 40.0],
                               [50.0, 20.0, 90.0, 60.0]]]),
        "labels": jnp.asarray([[2, 1]]),
        "valid": jnp.asarray([[True, True]]),
        "box_info": jnp.asarray(np.zeros((1, 2, 5), np.float32)),
    }

    def loss_fn(params):
        out = model.apply(dict(variables, params=params), x, train=False)
        losses = rcnn_loss(out, targets, 3)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_convert_faster_rcnn_full_model_smoke(rng):
    """A checkpoint-shaped state dict (torchvision resnet34+4-level-FPN
    naming via the torch oracles + rpn/roi_heads keys) converts into a
    variables tree that loads and runs the full FasterRCNNFPN — catches any
    drift between converter paths and the flax module tree."""
    import torch

    from handnet_tpu.convert.torch_weights import convert_faster_rcnn
    from tests.torch_oracles import TorchResNet34, _TorchFPN

    body = TorchResNet34()
    fpn = _TorchFPN(in_channels=(64, 128, 256, 512))
    sd = {}
    for k, v in body.state_dict().items():
        sd[f"backbone.body.{k}"] = v.numpy()
    for k, v in fpn.state_dict().items():
        sd[f"backbone.fpn.{k}"] = v.numpy()
    rpn_head = torch.nn.ModuleDict({
        "conv": torch.nn.Conv2d(256, 256, 3, padding=1),
        "cls_logits": torch.nn.Conv2d(256, 3, 1),
        "bbox_pred": torch.nn.Conv2d(256, 12, 1)})
    for k, v in rpn_head.state_dict().items():
        sd[f"rpn.head.{k}"] = v.numpy()
    sd["roi_heads.box_head.fc6.weight"] = np.zeros((1024, 256 * 49), np.float32)
    sd["roi_heads.box_head.fc6.bias"] = np.zeros(1024, np.float32)
    sd["roi_heads.box_head.fc7.weight"] = np.zeros((1024, 1024), np.float32)
    sd["roi_heads.box_head.fc7.bias"] = np.zeros(1024, np.float32)
    pred = {"cls_score": (3, 1024), "bbox_pred": (12, 1024),
            "hand_lr_layer": (3, 1024), "hand_dydx_layer": (9, 1024),
            "hand_contact_state_layer.0": (32, 1024),
            "hand_contact_state_layer.3": (15, 32)}
    for name, (o, i) in pred.items():
        sd[f"roi_heads.box_predictor.{name}.weight"] = np.zeros((o, i),
                                                                np.float32)
        sd[f"roi_heads.box_predictor.{name}.bias"] = np.zeros(o, np.float32)
    conv = convert_faster_rcnn(sd)

    model = FasterRCNNFPN(num_classes=3, image_h=64, image_w=96,
                          num_proposals=8)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    # structural check: converted tree must exactly match the init tree
    init = model.init(jax.random.PRNGKey(0), x, train=False)
    conv_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(conv["params"])}
    init_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init["params"])}
    assert conv_paths == init_paths, (
        f"missing={sorted(init_paths - conv_paths)[:5]} "
        f"extra={sorted(conv_paths - init_paths)[:5]}")
    out = model.apply({"params": conv["params"],
                       "batch_stats": conv["batch_stats"]}, x, train=False)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_rpn_loss_matching_semantics():
    """rpn_loss on a controlled assignment: IoU>=0.7 fg, <0.3 bg, the band
    between ignored, and a GT whose best anchor sits below 0.7 still gets a
    foreground via the low-quality match (torchvision Matcher semantics)."""
    from handnet_tpu.models.faster_rcnn import rpn_loss
    from handnet_tpu.ops import boxes as box_ops

    anchors = np.array([
        [10.0, 10.0, 50.0, 50.0],     # == gt0 -> fg (iou 1)
        [200.0, 200.0, 240.0, 240.0],  # far -> bg
        [10.0, 10.0, 50.0, 74.0],      # iou(gt0) = 40/64 = 0.625 -> ignore
        [100.0, 96.0, 148.0, 160.0],   # best anchor for gt1 (iou < 0.7)
    ], np.float32)
    gt = np.array([[[10.0, 10.0, 50.0, 50.0],
                    [100.0, 100.0, 150.0, 156.0]]], np.float32)
    targets = {"boxes": jnp.asarray(gt),
               "valid": jnp.ones((1, 2), bool),
               "labels": jnp.ones((1, 2), jnp.int32)}

    obj = np.array([[2.0, -1.5, 5.0, 0.5]], np.float32)  # anchor2 ignored
    deltas = np.zeros((1, 4, 4), np.float32)
    out = {"rpn_objectness": jnp.asarray(obj),
           "rpn_deltas": jnp.asarray(deltas)}
    losses = rpn_loss(out, jnp.asarray(anchors), targets)

    # expected: sampled = {0 fg, 1 bg, 3 fg(low-quality)}; anchor2 ignored
    def bce(x, t):
        return max(x, 0) - x * t + np.log1p(np.exp(-abs(x)))

    exp_obj = (bce(2.0, 1) + bce(-1.5, 0) + bce(0.5, 1)) / 3
    np.testing.assert_allclose(float(losses["loss_objectness"]), exp_obj,
                               rtol=1e-5)
    # box: smooth-L1(beta=1/9) of (0 - encode(gt, anchor)) over the 2 fg
    # anchors / 3 sampled
    enc = np.asarray(box_ops.delta_encode(
        jnp.asarray(gt[0][[0, 1]]), jnp.asarray(anchors[[0, 3]]),
        weights=(1.0, 1.0, 1.0, 1.0)))
    d = np.abs(enc)
    sl = np.where(d <= 1 / 9, 0.5 * d * d * 9, d - 0.5 / 9).sum()
    np.testing.assert_allclose(float(losses["loss_rpn_box_reg"]), sl / 3,
                               rtol=1e-4)


def test_rcnn_trainer_step(rng):
    """One RCNNTrainer step on a tiny config: finite joint losses (RPN +
    roi heads + the three aux terms), params actually move."""
    from handnet_tpu.config import FCOSConfig, TrainConfig
    from handnet_tpu.train.trainer import RCNNTrainer

    cfg = FCOSConfig(num_classes=3, image_h=64, image_w=96)
    trainer = RCNNTrainer(cfg, TrainConfig(batch_size=1, lr=1e-3, bf16=False,
                                           optimizer="sgd"),
                          steps_per_epoch=10, backbone_norm="batch",
                          num_proposals=8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {
        "image": jnp.asarray(rng.normal(size=(1, 64, 96, 3))
                             .astype(np.float32)),
        "targets": {
            "boxes": jnp.asarray([[[10.0, 10.0, 40.0, 40.0],
                                   [50.0, 20.0, 90.0, 60.0]]]),
            "labels": jnp.asarray([[2, 1]], jnp.int32),
            "valid": jnp.ones((1, 2), bool),
            "box_info": jnp.zeros((1, 2, 5), jnp.float32),
        },
    }
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state2, metrics = trainer.train_step(state, batch)
    for k in ("loss_objectness", "loss_rpn_box_reg", "loss_classifier",
              "loss_box_reg", "loss_hand_side", "loss_dxdymag",
              "loss_contact", "total_loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    assert int(state2.step) == 1
    after = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
