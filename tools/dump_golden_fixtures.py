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
    parser.add_argument("--mano-root", default="misc/mano/models")
    args = parser.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    if os.path.exists(args.a2j_checkpoint):
        dump_a2j(args.out_dir, args.a2j_checkpoint)
    if os.path.exists(args.fcos_checkpoint):
        dump_fcos(args.out_dir, args.fcos_checkpoint)
    if os.path.isdir(args.mano_root):
        dump_mano(args.out_dir, args.mano_root)
