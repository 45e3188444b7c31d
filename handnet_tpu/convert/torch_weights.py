"""PyTorch checkpoint -> flax params converter (name-mapped).

Converts the reference's published weights (``models/a2j.pth``,
``models/fcos.pth`` — scripts/download_models.sh:3-8; state-dict layouts from
a2j/a2j.py:212-224 and fcos_utils/fcos.py:455-511 + torchvision
resnet_fpn_backbone) into this package's flax parameter trees.

Layout rules:
  conv  torch [O, I, kh, kw] -> flax kernel [kh, kw, I, O]
  linear torch [O, I]        -> flax kernel [I, O]
  batchnorm weight/bias      -> params scale/bias;
  running_mean/var           -> batch_stats mean/var
  groupnorm weight/bias      -> params scale/bias

Use ``transposed_anchors=True`` in A2JConfig when running converted A2J
checkpoints — the reference's head permute pairs regression channel 0 with
the row grid (a2j/a2j.py:86-89); see ops/anchors.py.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _map_resnet_key(key: str) -> Tuple[Tuple[str, ...], str]:
    """torchvision resnet name -> (flax path, kind).

    conv1.weight / bn1.* / layer{L}.{B}.conv{N}.weight / ...bn{N}.* /
    ...downsample.0.weight (conv) / ...downsample.1.* (bn)
    """
    m = re.match(r"layer(\d)\.(\d+)\.(.*)", key)
    if m:
        layer, block, rest = m.group(1), m.group(2), m.group(3)
        prefix = (f"layer{layer}_{block}",)
        dm = re.match(r"downsample\.(\d)\.(.*)", rest)
        if dm:
            which, sub = dm.group(1), dm.group(2)
            name = "downsample_conv" if which == "0" else "downsample_bn"
            return prefix + (name,), sub
        sub_m = re.match(r"(conv\d|bn\d)\.(.*)", rest)
        if sub_m:
            return prefix + (sub_m.group(1),), sub_m.group(2)
        raise KeyError(key)
    m = re.match(r"(conv1|bn1)\.(.*)", key)
    if m:
        return (m.group(1),), m.group(2)
    raise KeyError(key)


def _store_norm_or_conv(params: dict, batch_stats: dict,
                        path: Tuple[str, ...], kind: str, value: np.ndarray):
    if kind == "weight":
        if value.ndim == 4:
            _set(params, path + ("kernel",), _conv(value))
        elif value.ndim == 2:
            _set(params, path + ("kernel",), _linear(value))
        else:
            _set(params, path + ("scale",), value)  # norm scale
    elif kind == "bias":
        _set(params, path + ("bias",), value)
    elif kind == "running_mean":
        _set(batch_stats, path + ("mean",), value)
    elif kind == "running_var":
        _set(batch_stats, path + ("var",), value)
    elif kind in ("num_batches_tracked",):
        pass
    else:
        raise KeyError(f"{path} {kind}")


def convert_a2j(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference A2JModel state dict -> {'params', 'batch_stats'}.

    Key map: Backbone.model.* -> backbone/*; {classification,regression,
    Depth}Model.{convN,bnN,output} -> {classification,regression,depth}/...
    """
    params: dict = {}
    batch_stats: dict = {}
    head_map = {"classificationModel": "classification",
                "regressionModel": "regression",
                "DepthRegressionModel": "depth"}
    for key, value in state_dict.items():
        value = np.asarray(value)
        if key.startswith("Backbone.model.fc."):
            continue  # classifier head unused (a2j uses features only)
        if key.startswith("Backbone.model."):
            sub = key[len("Backbone.model."):]
            path, kind = _map_resnet_key(sub)
            _store_norm_or_conv(params, batch_stats, ("backbone",) + path,
                                kind, value)
            continue
        m = re.match(r"(\w+)\.(conv\d|bn\d|output)\.(.*)", key)
        if m and m.group(1) in head_map:
            head = head_map[m.group(1)]
            _store_norm_or_conv(params, batch_stats,
                                (head, m.group(2)), m.group(3), value)
            continue
        if key.startswith(("criterion.", "post_process.")):
            continue  # buffers (anchors) are compile-time constants here
        raise KeyError(f"unmapped a2j key: {key}")
    return {"params": params, "batch_stats": batch_stats}


def convert_fcos(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference FCOS state dict -> {'params', 'batch_stats'}.

    backbone.body.* -> backbone/*; backbone.fpn.inner_blocks.{i} ->
    fpn/lateral_{i}; layer_blocks.{i} -> fpn/output_{i}; head towers
    (conv.0/1, 3/4, ... interleaved conv+GN) -> head/{cls,reg}_tower/
    conv{k}|gn{k}; output convs by name.
    """
    params: dict = {}
    batch_stats: dict = {}
    out_map = {"cls_logits": "cls_logits", "hand_lr_layer": "hand_lr",
               "hand_contact_state_layer": "hand_contact",
               "hand_dydx_layer": "hand_dxdy",
               "bbox_reg": "bbox_reg", "bbox_ctrness": "bbox_ctrness"}
    for key, value in state_dict.items():
        value = np.asarray(value)
        if key.startswith("backbone.body."):
            sub = key[len("backbone.body."):]
            path, kind = _map_resnet_key(sub)
            _store_norm_or_conv(params, batch_stats, ("backbone",) + path,
                                kind, value)
            continue
        m = re.match(r"backbone\.fpn\.inner_blocks\.(\d)\.(?:0\.)?(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("fpn", f"lateral_{m.group(1)}"),
                                m.group(2), value)
            continue
        m = re.match(r"backbone\.fpn\.layer_blocks\.(\d)\.(?:0\.)?(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("fpn", f"output_{m.group(1)}"),
                                m.group(2), value)
            continue
        m = re.match(
            r"head\.(classification|regression)_head\.conv\.(\d+)\.(.*)", key)
        if m:
            tower = ("cls_tower" if m.group(1) == "classification"
                     else "reg_tower")
            idx = int(m.group(2))
            layer, kind = divmod(idx, 3)  # [Conv, GN, ReLU] triplets
            name = f"conv{layer}" if kind == 0 else f"gn{layer}"
            _store_norm_or_conv(params, batch_stats,
                                ("head", tower, name), m.group(3), value)
            continue
        m = re.match(r"head\.(?:classification|regression)_head\.(\w+)\.(.*)",
                     key)
        if m and m.group(1) in out_map:
            _store_norm_or_conv(params, batch_stats,
                                ("head", out_map[m.group(1)]),
                                m.group(2), value)
            continue
        if "anchor" in key or key.startswith("transform."):
            continue
        raise KeyError(f"unmapped fcos key: {key}")
    return {"params": params, "batch_stats": batch_stats}


def convert_faster_rcnn(state_dict):
    """Reference FasterRCNN state dict -> {'params', 'batch_stats'} for
    models/faster_rcnn.FasterRCNNFPN.

    Layout (fpn_utils/faster_rcnn_fpn.py:112-190 + torchvision
    resnet_fpn_backbone): backbone.body.* / backbone.fpn.{inner,layer}_blocks
    like convert_fcos; rpn.head.{conv,cls_logits,bbox_pred} (both the plain
    Conv2d and the newer Conv2dNormActivation '.0.0' layouts accepted) ->
    rpn_head/{conv,objectness,deltas}; roi_heads.box_head.fc6/fc7 ->
    box_head (fc6's input is the FLATTENED pooled roi — torch flattens
    [C,7,7] channel-major, this package's NHWC pooling flattens [7,7,C], so
    fc6's kernel rows are permuted accordingly); roi_heads.box_predictor.*
    -> predictor (contact MLP .0/.3 -> contact_fc1/contact_fc2).
    """
    params: dict = {}
    batch_stats: dict = {}
    pred_map = {"cls_score": "cls_score", "bbox_pred": "bbox_pred",
                "hand_lr_layer": "hand_side", "hand_dydx_layer": "dxdy"}
    for key, value in state_dict.items():
        value = np.asarray(value)
        if key.startswith("backbone.body.fc."):
            continue  # classifier head unused
        if key.startswith("backbone.body."):
            path, kind = _map_resnet_key(key[len("backbone.body."):])
            _store_norm_or_conv(params, batch_stats, ("backbone",) + path,
                                kind, value)
            continue
        m = re.match(r"backbone\.fpn\.inner_blocks\.(\d)\.(?:0\.)?(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("fpn", f"lateral_{m.group(1)}"),
                                m.group(2), value)
            continue
        m = re.match(r"backbone\.fpn\.layer_blocks\.(\d)\.(?:0\.)?(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("fpn", f"output_{m.group(1)}"),
                                m.group(2), value)
            continue
        m = re.match(r"rpn\.head\.(conv|cls_logits|bbox_pred)"
                     r"(?:\.0\.0)?\.(weight|bias)", key)
        if m:
            name = {"conv": "conv", "cls_logits": "objectness",
                    "bbox_pred": "deltas"}[m.group(1)]
            _store_norm_or_conv(params, batch_stats, ("rpn_head", name),
                                m.group(2), value)
            continue
        m = re.match(r"roi_heads\.box_head\.(fc6|fc7)\.(weight|bias)", key)
        if m:
            if m.group(1) == "fc6" and m.group(2) == "weight":
                rep, flat = value.shape
                c = flat // 49
                value = (value.reshape(rep, c, 7, 7)
                         .transpose(0, 2, 3, 1).reshape(rep, flat))
            _store_norm_or_conv(params, batch_stats,
                                ("box_head", m.group(1)), m.group(2), value)
            continue
        m = re.match(r"roi_heads\.box_predictor\."
                     r"hand_contact_state_layer\.(0|3)\.(weight|bias)", key)
        if m:
            name = "contact_fc1" if m.group(1) == "0" else "contact_fc2"
            _store_norm_or_conv(params, batch_stats, ("predictor", name),
                                m.group(2), value)
            continue
        m = re.match(r"roi_heads\.box_predictor\.(\w+)\.(weight|bias)", key)
        if m and m.group(1) in pred_map:
            _store_norm_or_conv(params, batch_stats,
                                ("predictor", pred_map[m.group(1)]),
                                m.group(2), value)
            continue
        if "anchor" in key or key.startswith("transform."):
            continue
        raise KeyError(f"unmapped faster_rcnn key: {key}")
    return {"params": params, "batch_stats": batch_stats}


def convert_pose2mesh(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference FlatPose2Mesh state dict -> {'params', 'batch_stats'}.

    Layout from pose2mesh/lib/models/pose2mesh_net.py:8-28 (module names
    ``pose_lifter`` / ``pose2mesh``), posenet.py:11-67 (LinearModel: w1,
    linear_stages.{i}.{w1,batch_norm1,w2,batch_norm2}, w2 — the top-level
    batch_norm1 is constructed but never used in forward, posenet.py:77-87,
    so its entries are dropped), and meshnet.py:36-59 (fc upsample Linear +
    interleaved cl/bn ModuleLists). Chebyshev cl weights are plain Linear
    [Fout, Fin*K] with Fin-major/K-minor input flattening
    (cheby_graph_conv.py:33-35) — identical to this package's cheby_conv
    flattening, so a pure transpose suffices. Load path: ros_demo.py:131-146
    (``checkpoint['model_state_dict']``).
    """
    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        value = np.asarray(value)
        if key.startswith("module."):
            key = key[len("module."):]
        if key.startswith("pose_lifter.batch_norm1."):
            continue  # constructed but unused (posenet.py:60,77-87)
        m = re.match(r"pose_lifter\.(w1|w2)\.(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("pose_lifter", m.group(1)),
                                m.group(2), value)
            continue
        m = re.match(
            r"pose_lifter\.linear_stages\.(\d+)\.(w1|w2|batch_norm1|"
            r"batch_norm2)\.(.*)", key)
        if m:
            name = {"w1": "w1", "w2": "w2",
                    "batch_norm1": "bn1", "batch_norm2": "bn2"}[m.group(2)]
            _store_norm_or_conv(
                params, batch_stats,
                ("pose_lifter", f"stage{m.group(1)}", name),
                m.group(3), value)
            continue
        m = re.match(r"pose2mesh\.fc\.(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats, ("pose2mesh", "fc"),
                                m.group(1), value)
            continue
        m = re.match(r"pose2mesh\.cl\.(\d+)\.(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("pose2mesh", f"cl{m.group(1)}"),
                                m.group(2), value)
            continue
        m = re.match(r"pose2mesh\.bn\.(\d+)\.(.*)", key)
        if m:
            _store_norm_or_conv(params, batch_stats,
                                ("pose2mesh", f"cl{m.group(1)}", "bn"),
                                m.group(2), value)
            continue
        raise KeyError(f"unmapped pose2mesh key: {key}")
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.ckpt into a flat numpy state dict (cpu, no grad)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]  # pose2mesh .pth.tar (ros_demo.py:144)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = {k.replace("a2j.", "", 1) if k.startswith("a2j.") else k: v
                for k, v in ckpt["state_dict"].items()}
    return {k: v.detach().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}
