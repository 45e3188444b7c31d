"""Mesh inference demo: depth crops -> A2J joints -> Pose2Mesh MANO mesh.

Reference: a2j_mesh.py:20-94 (A2J over the DexYCB test loader -> clip UVD ->
convert_joints -> Pose2Mesh -> mesh post-transform ``mesh*1000 + root;
y,z *= -1`` (:77-80); rendering via pyrender stays host-side and optional).

Usage:
  python -m handnet_tpu.apps.a2j_mesh --data-dir DIR [--synthetic N]
      [--a2j-checkpoint ...] [--out meshes.npz] [--limit 8]
"""

from __future__ import annotations

import argparse
import os

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import A2JConfig
from handnet_tpu.data.a2j_data import A2JDataSource, A2JSampleConfig
from handnet_tpu.data.dexycb import DexYCBDataset, refine_indices
from handnet_tpu.models.a2j import A2JSystem
from handnet_tpu.ops.geometry import convert_joints


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", default=os.environ.get("DEX_YCB_DIR"))
    parser.add_argument("--synthetic", type=int, default=0)
    parser.add_argument("--a2j-checkpoint", default=None)
    parser.add_argument("--crop", type=int, default=176)
    parser.add_argument("--limit", type=int, default=8)
    parser.add_argument("--out", default="meshes.npz")
    args = parser.parse_args(argv)

    if args.synthetic:
        import tempfile

        from handnet_tpu.data.synthetic import make_synthetic_dexycb

        root = args.data_dir or tempfile.mkdtemp(prefix="synth_dexycb_")
        if not os.path.exists(os.path.join(root, "calibration")):
            make_synthetic_dexycb(root, n_sequences=args.synthetic, n_frames=4)
        ds = DexYCBDataset("s0", "train", data_dir=root)
    else:
        ds = DexYCBDataset("s0", "test", data_dir=args.data_dir)
    src = A2JDataSource(ds, refine_indices(ds)[:args.limit], augment=False,
                        cfg=A2JSampleConfig(crop_w=args.crop,
                                            crop_h=args.crop))

    cfg = A2JConfig(crop_h=args.crop, crop_w=args.crop,
                    transposed_anchors=bool(args.a2j_checkpoint))
    system = A2JSystem(cfg)
    if args.a2j_checkpoint:
        from handnet_tpu.convert.torch_weights import (convert_a2j,
                                                       load_torch_checkpoint)

        variables = jax.tree_util.tree_map(
            jnp.asarray, convert_a2j(load_torch_checkpoint(
                args.a2j_checkpoint)))
    else:
        print("WARNING: random A2J weights")
        variables = system.init(jax.random.PRNGKey(0))
    predict = jax.jit(lambda v, x: system.predict(v, x))

    from handnet_tpu.apps.demo import build_mesh_head

    mesh_head, _mesh_faces = build_mesh_head()

    results = {}
    for i in range(len(src)):
        sample = src[i]
        uvd = predict(variables, jnp.asarray(sample["depth"][None]))
        # clip UVD to the crop (a2j_mesh.py:60-62)
        uvd = jnp.clip(uvd, 0, args.crop - 1)
        xyz = convert_joints(uvd, jnp.asarray(sample["box"][None]),
                             jnp.asarray(sample["paras"][None]),
                             args.crop, args.crop)
        xyz = np.asarray(xyz)[0]
        uv_full = np.asarray(uvd[0])[:, :2]
        mesh = mesh_head(uv_full)
        # reference post-transform: to camera mm + flip y,z (a2j_mesh.py:77-80)
        root = xyz[0]
        mesh_cam = mesh * 1000.0 + root
        mesh_cam[:, 1:] *= -1
        results[f"sample{i}_joints_xyz"] = xyz
        results[f"sample{i}_mesh"] = mesh_cam
    np.savez(args.out, **results)
    print(f"wrote {args.out} ({len(results) // 2} meshes)")


if __name__ == "__main__":
    main()
