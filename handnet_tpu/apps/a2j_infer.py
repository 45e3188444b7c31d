"""Folder inference: depth PNGs -> 21-joint UVD, batched on the TPU.

Reference: a2j_infer.py:16-72 (loads models/a2j.pth, loops over depth pngs,
mm/1000 scaling, 176^2 resize, saves all_joints_uvd.npy + skeleton vis).

TPU redesign: frames are batched and run through ONE jitted graph instead of
a per-file python loop; weights come from an orbax checkpoint or a converted
torch .pth.

Usage:
  python -m handnet_tpu.apps.a2j_infer --input DIR [--output DIR]
      [--checkpoint PATH | --torch-checkpoint a2j.pth] [--batch 8] [--vis]
"""

from __future__ import annotations

import argparse
import glob
import os

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import A2JConfig
from handnet_tpu.models.a2j import A2JSystem


def load_variables(system: A2JSystem, args) -> dict:
    if args.torch_checkpoint:
        from handnet_tpu.convert.torch_weights import (convert_a2j,
                                                       load_torch_checkpoint)

        sd = load_torch_checkpoint(args.torch_checkpoint)
        return jax.tree_util.tree_map(jnp.asarray, convert_a2j(sd))
    if args.checkpoint:
        from handnet_tpu.train.checkpoints import load_params_npz

        base = args.checkpoint.rstrip("/")
        return jax.tree_util.tree_map(
            jnp.asarray, {
                "params": load_params_npz(os.path.join(base, "params.npz")),
                "batch_stats": load_params_npz(
                    os.path.join(base, "batch_stats.npz")),
            })
    print("WARNING: no checkpoint given — random weights")
    return system.init(jax.random.PRNGKey(0))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="dir of depth pngs (mm)")
    parser.add_argument("--output", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--torch-checkpoint", default=None)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--crop", type=int, default=176)
    parser.add_argument("--vis", action="store_true")
    args = parser.parse_args(argv)

    import cv2

    out_dir = args.output or args.input
    os.makedirs(out_dir, exist_ok=True)

    cfg = A2JConfig(crop_h=args.crop, crop_w=args.crop,
                    transposed_anchors=bool(args.torch_checkpoint))
    system = A2JSystem(cfg)
    variables = load_variables(system, args)
    predict = jax.jit(lambda v, x: system.predict(v, x))

    files = sorted(glob.glob(os.path.join(args.input, "*.png")))
    if not files:
        raise SystemExit(f"no .png files in {args.input}")

    crops = []
    for f in files:
        depth = cv2.imread(f, cv2.IMREAD_ANYDEPTH)
        depth = depth.astype(np.float32) / 1000.0  # mm -> m (a2j_infer.py:33)
        depth = cv2.resize(depth, (cfg.crop_w, cfg.crop_h),
                           interpolation=cv2.INTER_NEAREST)
        crops.append(depth[..., None])
    frames = np.stack(crops)

    all_uvd = []
    b = args.batch
    pad = (-len(frames)) % b
    padded = np.concatenate([frames, np.zeros((pad,) + frames.shape[1:],
                                              frames.dtype)])
    for i in range(0, len(padded), b):
        uvd = predict(variables, jnp.asarray(padded[i:i + b]))
        all_uvd.append(np.asarray(uvd))
    all_uvd = np.concatenate(all_uvd)[:len(frames)]

    np.save(os.path.join(out_dir, "all_joints_uvd.npy"), all_uvd)
    print(f"wrote {os.path.join(out_dir, 'all_joints_uvd.npy')} "
          f"({all_uvd.shape})")

    if args.vis:
        from handnet_tpu.utils.vistool import VisualUtil

        vt = VisualUtil("dexycb")
        for f, crop, uvd in zip(files, frames, all_uvd):
            vis = np.clip(crop[..., 0] * 255 / max(crop.max(), 1e-6),
                          0, 255).astype(np.uint8)
            vis = np.repeat(vis[:, :, None], 3, axis=-1)
            out = os.path.join(
                out_dir, os.path.basename(f).replace(".png", "_vis.jpg"))
            vt.plot(vis, out, None, uvd)
        print(f"wrote {len(files)} visualizations")


if __name__ == "__main__":
    main()
