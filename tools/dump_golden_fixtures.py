"""Golden parity fixture dumper — run in an environment with the PyTorch
reference installed (torch + torchvision + the reference repo on PYTHONPATH
+ its published checkpoints).

Dumps (input, output) pairs per stage into fixtures/*.npz:
  a2j_stage.npz   — depth crops -> reference A2JModel UVD keypoints
  fcos_stage.npz  — frames -> reference FCOS detections (boxes/scores/labels)
  mano_stage.npz  — (pose, betas, trans) -> reference ManoLayer verts/joints

tests/test_golden_parity.py consumes these (skipping when absent) and
asserts the TPU rebuild matches within tolerance — SURVEY.md §4 item 1.

This script cannot run in the TPU build sandbox (no torchvision / no
checkpoints / zero egress); it is the one-command bridge for any machine
that can run the reference.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _dump_state_dict(out_dir: str, name: str, model) -> None:
    """Flat numpy npz of the torch state dict — what
    tests/test_golden_parity.py feeds to convert/torch_weights.py."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
          if hasattr(v, "detach") and v.dtype.is_floating_point}
    np.savez(os.path.join(out_dir, name), **sd)
    print(f"{name}: {len(sd)} tensors")


def dump_a2j(out_dir: str, checkpoint: str, n: int = 4, seed: int = 0):
    import torch
    from a2j.a2j import A2JModel  # reference import

    rng = np.random.default_rng(seed)
    model = A2JModel(21, crop_height=176, crop_width=176)
    sd = torch.load(checkpoint, map_location="cpu")
    model.load_state_dict(sd.get("model", sd), strict=False)
    model.eval()

    depth = rng.uniform(0.3, 1.0, size=(n, 1, 176, 176)).astype(np.float32)
    with torch.no_grad():
        uvd = model(torch.tensor(depth)).numpy()
    np.savez(os.path.join(out_dir, "a2j_stage.npz"),
             depth=depth, uvd=uvd, checkpoint=os.path.basename(checkpoint))
    print(f"a2j_stage.npz: {uvd.shape}")
    _dump_state_dict(out_dir, "a2j_state_dict.npz", model)


_P2M_SKELETON = ((0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3),
                 (3, 4), (5, 6), (6, 7), (7, 8), (9, 10), (10, 11), (11, 12),
                 (13, 14), (14, 15), (15, 16), (17, 18), (18, 19), (19, 20))
_P2M_HORI_CONN = ((1, 5), (5, 9), (9, 13), (13, 17), (2, 6), (6, 10),
                  (10, 14), (14, 18), (3, 7), (7, 11), (11, 15), (15, 19),
                  (4, 8), (8, 12), (12, 16), (16, 20))


def dump_pose2mesh(out_dir: str, checkpoint: str, n: int = 4, seed: int = 0):
    """FlatPose2Mesh exactly as the demo builds it (ros_demo.py:131-146:
    MANO template faces, skeleton + hori_conn extra pairs, levels=6)."""
    import torch
    from models import pose2mesh_net  # reference import (pose2mesh/lib)
    from graph_utils import build_coarse_graphs
    from _mano import MANO  # reference mano wrapper (needs MANO assets)

    rng = np.random.default_rng(seed)
    ckpt = torch.load(checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    mano = MANO()
    _, graph_L, _, _ = build_coarse_graphs(mano.face, 21, _P2M_SKELETON,
                                           _P2M_HORI_CONN, levels=6)
    model = pose2mesh_net.get_model(21, graph_L)
    model.load_state_dict({k.replace("module.", "", 1): v
                           for k, v in sd.items()})
    model.eval()

    pose2d = rng.normal(size=(n, 21, 2)).astype(np.float32)
    with torch.no_grad():
        mesh, pose3d = model(torch.tensor(pose2d))
    # faces ship in the fixture so the consumer can rebuild the pyramid
    # with ops/graph.py:build_graph_pyramid and the same extra pairs
    np.savez(os.path.join(out_dir, "pose2mesh_stage.npz"),
             pose2d=pose2d, mesh=mesh.numpy(), pose3d=pose3d.numpy(),
             faces=np.asarray(mano.face, np.int64),
             checkpoint=os.path.basename(checkpoint))
    print(f"pose2mesh_stage.npz: {mesh.shape}")
    _dump_state_dict(out_dir, "pose2mesh_state_dict.npz", model)


def dump_fcos(out_dir: str, checkpoint: str, n: int = 2, seed: int = 0):
    import torch
    from fcos_utils.fcos import FCOS  # reference import

    rng = np.random.default_rng(seed)
    model = FCOS(num_classes=2, ext=False, nms_thresh=0.5)
    sd = torch.load(checkpoint, map_location="cpu")
    model.load_state_dict(sd.get("model", sd), strict=False)
    model.eval()

    frames = rng.uniform(size=(n, 3, 480, 640)).astype(np.float32)
    with torch.no_grad():
        dets = model([torch.tensor(f) for f in frames], None)
    np.savez(os.path.join(out_dir, "fcos_stage.npz"),
             frames=frames,
             **{f"det{i}_{k}": np.asarray(d[k])
                for i, d in enumerate(dets)
                for k in ("boxes", "scores", "labels")})
    print(f"fcos_stage.npz: {len(dets)} images")
    _dump_state_dict(out_dir, "fcos_state_dict.npz", model)


def dump_faster_rcnn(out_dir: str, checkpoint: str, n: int = 2,
                     seed: int = 0, num_layers: int = 34):
    """The reference's alternative detector (trainval_net_fcos.py:187:
    ``FasterRCNN(num_classes=num_classes, num_layers=int(args.net[3:]))``).
    The TPU rebuild (models/faster_rcnn.FasterRCNNFPN) is at resnet34 depth,
    so dump a res34 checkpoint; other depths won't map through
    convert_faster_rcnn."""
    import torch
    from fpn_utils.faster_rcnn_fpn import FasterRCNN  # reference import

    rng = np.random.default_rng(seed)
    model = FasterRCNN(num_classes=3, num_layers=num_layers)
    sd = torch.load(checkpoint, map_location="cpu")
    model.load_state_dict(sd.get("model", sd), strict=False)
    model.eval()

    frames = rng.uniform(size=(n, 3, 480, 640)).astype(np.float32)
    with torch.no_grad():
        dets = model([torch.tensor(f) for f in frames], None)
    np.savez(os.path.join(out_dir, "faster_rcnn_stage.npz"),
             frames=frames,
             **{f"det{i}_{k}": np.asarray(d[k])
                for i, d in enumerate(dets)
                for k in ("boxes", "scores", "labels")})
    print(f"faster_rcnn_stage.npz: {len(dets)} images")
    _dump_state_dict(out_dir, "faster_rcnn_state_dict.npz", model)


def dump_mano(out_dir: str, mano_root: str, n: int = 4, seed: int = 0):
    import torch
    from manopth.manolayer import ManoLayer  # reference import

    rng = np.random.default_rng(seed)
    pose = rng.normal(size=(n, 48)).astype(np.float32) * 0.3
    betas = rng.normal(size=(n, 10)).astype(np.float32) * 0.3
    trans = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    out = {}
    for side in ("right", "left"):
        layer = ManoLayer(ncomps=45, flat_hand_mean=False, side=side,
                          mano_root=mano_root, use_pca=True)
        with torch.no_grad():
            verts, joints = layer(torch.tensor(pose), torch.tensor(betas),
                                  torch.tensor(trans))
        out[f"{side}_verts"] = verts.numpy()
        out[f"{side}_joints"] = joints.numpy()
    np.savez(os.path.join(out_dir, "mano_stage.npz"),
             pose=pose, betas=betas, trans=trans, **out)
    print("mano_stage.npz written")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out-dir", default="fixtures")
    parser.add_argument("--a2j-checkpoint", default="models/a2j.pth")
    parser.add_argument("--fcos-checkpoint", default="models/fcos.pth")
    parser.add_argument("--rcnn-checkpoint", default="models/faster_rcnn.pth")
    parser.add_argument("--rcnn-layers", type=int, default=34)
    parser.add_argument("--pose2mesh-checkpoint",
                        default="experiment/pose2mesh_manoJ_train_freihand/"
                                "final.pth.tar")
    parser.add_argument("--mano-root", default="misc/mano/models")
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    if os.path.exists(args.a2j_checkpoint):
        dump_a2j(args.out_dir, args.a2j_checkpoint)
    if os.path.exists(args.fcos_checkpoint):
        dump_fcos(args.out_dir, args.fcos_checkpoint)
    if os.path.exists(args.rcnn_checkpoint):
        dump_faster_rcnn(args.out_dir, args.rcnn_checkpoint,
                         num_layers=args.rcnn_layers)
    if os.path.exists(args.pose2mesh_checkpoint):
        dump_pose2mesh(args.out_dir, args.pose2mesh_checkpoint)
    if os.path.isdir(args.mano_root):
        dump_mano(args.out_dir, args.mano_root)
