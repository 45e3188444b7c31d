"""Streaming hand-perception demo: camera-rate frames -> joints (+mesh).

Reference: ros_demo.py:170-398 — a ROS node wiring RGB+depth subscribers to
HandNet with pyrender mesh output. The ROS transport is environment-specific,
so this rebuild provides a generic ``FrameSource`` interface (folder / video /
synthetic) feeding the SAME fused pipeline, with double-buffered host->device
transfer: while the TPU chews frame N, frame N+1 is being decoded and
transferred (jax's async dispatch gives this for free).

Usage:
  python -m handnet_tpu.apps.demo --source synthetic --frames 32
  python -m handnet_tpu.apps.demo --source folder --input DIR  # color_*.jpg + depth_*.png
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Iterator, Optional, Tuple

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                PipelineConfig)
from handnet_tpu.models.pipeline import HandNetPipeline


class FrameSource:
    """Yields (rgb [H,W,3] 0-1 float32, depth [H,W] meters)."""

    def frames(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        raise NotImplementedError


class SyntheticSource(FrameSource):
    def __init__(self, n: int, h: int = 480, w: int = 640, seed: int = 0):
        self.n, self.h, self.w = n, h, w
        self.rng = np.random.default_rng(seed)

    def frames(self):
        for _ in range(self.n):
            yield (self.rng.uniform(size=(self.h, self.w, 3)).astype(np.float32),
                   self.rng.uniform(0.3, 1.2, size=(self.h, self.w))
                   .astype(np.float32))


class FolderSource(FrameSource):
    """Paired color_*.jpg / depth_*.png (mm) files, sorted."""

    def __init__(self, directory: str):
        import glob

        self.colors = sorted(glob.glob(os.path.join(directory, "color_*.jpg")))
        self.depths = sorted(glob.glob(os.path.join(directory, "depth_*.png")))
        if len(self.colors) != len(self.depths):
            raise SystemExit("mismatched color/depth file counts")

    def frames(self):
        import cv2

        for c, d in zip(self.colors, self.depths):
            rgb = cv2.imread(c)[:, :, ::-1].astype(np.float32) / 255.0
            depth = cv2.imread(d, cv2.IMREAD_ANYDEPTH).astype(np.float32) / 1000.0
            yield rgb, depth


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source", choices=["synthetic", "folder"],
                        default="synthetic")
    parser.add_argument("--input", default=None)
    parser.add_argument("--frames", type=int, default=32)
    parser.add_argument("--fcos-checkpoint", default=None)
    parser.add_argument("--a2j-checkpoint", default=None)
    parser.add_argument("--num-classes", type=int, default=3,
                        help="detector classes (ros_demo.py:374 default)")
    parser.add_argument("--mesh", action="store_true",
                        help="lift joints to a MANO mesh (needs pose2mesh "
                             "weights; runs with random weights otherwise)")
    parser.add_argument("--render-mesh", action="store_true",
                        help="rasterize the predicted mesh into each frame "
                             "(software z-buffer; the ros_demo.py:51-128 "
                             "pyrender overlay equivalent); implies --mesh. "
                             "Writes overlay_NNNN.png (or .npy without an "
                             "image backend) next to --out. Without "
                             "--mano-assets the surface uses a stand-in "
                             "consecutive-strip triangulation, not MANO "
                             "topology — pass the npz for a real surface")
    parser.add_argument("--mano-assets", default=None,
                        help="mano_right.npz from convert/mano_assets.py; "
                             "supplies the real MANO face topology for "
                             "--render-mesh")
    parser.add_argument("--paras", type=float, nargs=4,
                        default=[600.0, 600.0, 320.0, 240.0],
                        help="fx fy cx cy")
    parser.add_argument("--flip-left", action="store_true",
                        help="mirror frames for left-hand tracking (A2J is "
                             "right-hand trained; ros_demo.py:260-262)")
    parser.add_argument("--out", default=None, help="npz of per-frame results")
    parser.add_argument("--size", type=int, nargs=2, default=[480, 640],
                        metavar=("H", "W"), help="synthetic frame size")
    parser.add_argument("--net-size", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="detector input geometry (default: the "
                             "config's min-800 parity geometry)")
    parser.add_argument("--crop", type=int, default=176,
                        help="A2J crop size (176 = reference)")
    parser.add_argument("--score-thresh", type=float, default=None)
    args = parser.parse_args(argv)

    source = (SyntheticSource(args.frames, h=args.size[0], w=args.size[1])
              if args.source == "synthetic" else FolderSource(args.input))

    # converted torch checkpoints need the reference anchor pairing
    # (ops/anchors.py transposed mode; a2j/a2j.py:86-89 permute quirk);
    # num_classes defaults to 3 like ros_demo.py:374 (hand = last class)
    fcos_kwargs = dict(num_classes=args.num_classes, ext=False)
    if args.net_size:
        fcos_kwargs.update(image_h=args.net_size[0],
                           image_w=args.net_size[1])
    if args.score_thresh is not None:
        fcos_kwargs["score_thresh"] = args.score_thresh
    cfg = HandNetConfig(
        fcos=FCOSConfig(**fcos_kwargs),
        a2j=A2JConfig(transposed_anchors=bool(args.a2j_checkpoint),
                      crop_h=args.crop, crop_w=args.crop),
        pipeline=PipelineConfig(crop_size=args.crop))
    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = pipe.init(jax.random.PRNGKey(0))
    if args.fcos_checkpoint:
        from handnet_tpu.convert.torch_weights import (convert_fcos,
                                                       load_torch_checkpoint)

        variables["detector"] = jax.tree_util.tree_map(
            jnp.asarray, convert_fcos(load_torch_checkpoint(
                args.fcos_checkpoint)))
    if args.a2j_checkpoint:
        from handnet_tpu.convert.torch_weights import (convert_a2j,
                                                       load_torch_checkpoint)

        variables["a2j"] = jax.tree_util.tree_map(
            jnp.asarray, convert_a2j(load_torch_checkpoint(
                args.a2j_checkpoint)))

    paras = jnp.asarray(np.asarray(args.paras, np.float32)[None])
    fwd = jax.jit(lambda v, im, d: pipe(v, im, d, paras))

    mesh_fn = mesh_faces = None
    if args.mesh or args.render_mesh:
        mesh_fn, mesh_faces = build_mesh_head(mano_assets=args.mano_assets)
    overlay_dir = None
    if args.render_mesh:
        overlay_dir = os.path.dirname(os.path.abspath(args.out or "out.npz"))
        os.makedirs(overlay_dir, exist_ok=True)

    results = []
    times = []
    for i, (rgb, depth) in enumerate(source.frames()):
        rgb_disp = rgb  # original (un-mirrored) frame, for overlays
        if args.flip_left:
            rgb = rgb[:, ::-1].copy()
            depth = depth[:, ::-1].copy()
        im = jnp.asarray(rgb[None])
        d = jnp.asarray(depth[None])
        t0 = time.perf_counter()
        out = fwd(variables, im, d)
        jax.block_until_ready(out["joints_uvd"])
        if i > 0:  # skip the compile frame
            times.append(time.perf_counter() - t0)
        frame_result = {
            "joints_uvd": np.asarray(out["joints_uvd"][0]),
            "joints_xyz": np.asarray(out["joints_xyz"][0]),
            "box": np.asarray(out["boxes"][0]),
            "found": bool(np.asarray(out["found"][0])),
            "side": int(np.asarray(out["sides"][0])),
        }
        if args.flip_left and frame_result["found"]:
            # mirror crop box + u coordinates back to the original frame,
            # then recompute xyz from the un-mirrored geometry so the saved
            # (box, joints_uvd, joints_xyz) triple is self-consistent
            w = rgb.shape[1]
            x1, y1, x2, y2 = frame_result["box"]
            frame_result["box"] = np.array([w - 1 - x2, y1, w - 1 - x1, y2],
                                           np.float32)
            crop = cfg.pipeline.crop_size
            uvd = frame_result["joints_uvd"].copy()
            # index-convention mirror, matching the box's w-1-x above
            # (crop - u would bias the unprojected xyz by one crop pixel)
            uvd[:, 0] = (crop - 1) - uvd[:, 0]
            frame_result["joints_uvd"] = uvd
            from handnet_tpu.ops.geometry import convert_joints
            frame_result["joints_xyz"] = np.asarray(convert_joints(
                uvd[None], frame_result["box"][None],
                np.asarray(args.paras, np.float32)[None], crop, crop))[0]
        if mesh_fn is not None and frame_result["found"]:
            # lift in the NETWORK frame — with --flip-left the lifter sees
            # the right-hand skeleton it was trained on, not the mirrored
            # one — then mirror the root-relative verts back to the original
            # frame so mesh/box/joints stay self-consistent
            net_uv = np.asarray(out["joints_uvd"][0])[:, :2]
            verts = np.asarray(mesh_fn(net_uv))
            if args.flip_left:
                verts = verts * np.array([-1.0, 1.0, 1.0], np.float32)
            frame_result["mesh"] = verts
            if overlay_dir is not None:
                # render onto the original frame: joints_xyz is already in
                # original-frame camera coordinates after the un-flip above
                _write_overlay(overlay_dir, i, rgb_disp, verts,
                               mesh_faces, frame_result["joints_xyz"],
                               args.paras)
        results.append(frame_result)

    found = sum(r["found"] for r in results)
    fps = 1.0 / np.mean(times) if times else 0.0
    print(f"processed {len(results)} frames, hand found in {found}, "
          f"~{fps:.1f} fps steady-state")
    if args.out:
        np.savez(args.out, **{
            f"frame{i:04d}_{k}": v for i, r in enumerate(results)
            for k, v in r.items()})
        print(f"wrote {args.out}")


def _write_overlay(out_dir: str, idx: int, rgb: np.ndarray,
                   verts_rel: np.ndarray, faces: np.ndarray,
                   joints_xyz: np.ndarray, paras) -> None:
    """Rasterize the (root-anchored) predicted mesh into the frame and save —
    the pyrender composite of ros_demo.py:51-128, GL-free."""
    from handnet_tpu.utils.raster import render_mesh_overlay

    fx, fy, cx, cy = paras
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    # pose2mesh emits meter-scale root-relative verts; joints_xyz is mm
    # (ops/geometry.py:61). The reference does mesh*1000 + joints3d before
    # rendering (ros_demo.py:334) — same here, everything in mm.
    verts_cam = (np.asarray(verts_rel, np.float64) * 1000.0
                 + joints_xyz[0])  # anchor at the wrist joint
    frame8 = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
    overlay = render_mesh_overlay(frame8, verts_cam, faces, k)
    path = os.path.join(out_dir, f"overlay_{idx:04d}")
    try:
        import cv2

        cv2.imwrite(path + ".png", overlay[:, :, ::-1])
    except ImportError:
        try:
            from PIL import Image

            Image.fromarray(overlay).save(path + ".png")
        except ImportError:
            np.save(path + ".npy", overlay)


def build_mesh_head(mano_assets: Optional[str] = None):
    """Pose2Mesh lifting head over the detected 2D joints
    (ros_demo.py:131-168 equivalent; random weights unless trained).

    Returns (run_fn, faces) — faces for downstream overlay rendering. With
    ``mano_assets`` (npz from convert/mano_assets.py), the graph pyramid and
    the rendered surface use the REAL MANO triangulation; otherwise a
    consecutive-strip stand-in of the same vertex count (fine for plumbing,
    degenerate as a rendered surface)."""
    from handnet_tpu.models.pose2mesh import (Pose2Mesh,
                                              normalize_joints_for_pose2mesh)
    from handnet_tpu.ops.graph import build_graph_pyramid

    if mano_assets:
        faces = np.asarray(np.load(mano_assets, allow_pickle=False)["faces"],
                           np.int64)
    else:
        # stand-in 778-vert strip triangulation (same sizes as MANO)
        faces = np.stack([np.arange(776), np.arange(1, 777),
                          np.arange(2, 778)], axis=1)
    skeleton = tuple((0, i) for i in (1, 5, 9, 13, 17)) + tuple(
        (i, i + 1) for i in range(1, 20) if i % 4 != 0)
    pyramid = build_graph_pyramid(faces, 21, skeleton, levels=6)
    model = Pose2Mesh(pyramid=pyramid)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 21, 2)))
    fwd = jax.jit(lambda v, j: model.apply(v, j))

    def run(joints2d: np.ndarray) -> np.ndarray:
        norm = normalize_joints_for_pose2mesh(joints2d)
        mesh, _ = fwd(variables, jnp.asarray(norm[None]))
        verts = np.asarray(mesh[0])[pyramid.perm_reverse[:778]]
        return verts

    return run, faces


if __name__ == "__main__":
    main()
