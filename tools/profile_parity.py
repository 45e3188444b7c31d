"""Stage-level time attribution of the parity-profile pipeline on the TPU.

VERDICT r2 weak-item 1: the parity operating point (800x1088, the
reference's min-800 GeneralizedRCNNTransform geometry, fcos.py:501-505) runs
at ~424 fps/chip vs the 1000 target, with no committed evidence of WHERE the
time goes. This tool times each stage of the fused graph in isolation
(device-resident inputs, double-run, block_until_ready) and prints a table:

    preprocess (bilinear 480x640 -> 800x1067 + pad)
    detector backbone (resnet34)          | full-graph
    FPN                                   | detector
    head towers (8x conv256 + GN per lvl) |
    decode + NMS
    crop-resize (dynamic gather)
    A2J forward (resnet50 dilated + 3 heads, 176^2)
    A2J decode (pallas)

Stage sums exceed the fused time (XLA overlaps/fuses across boundaries);
the table is for *attribution*, the fused number is the product metric.

Run: [PROFILE=parity] python tools/profile_parity.py  [--batch 128]
Optionally HANDNET_TRACE_DIR=/tmp/trace to also dump a jax.profiler trace.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from handnet_tpu import runtime as _runtime

_runtime.setup()
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    from handnet_tpu.config import load_config
    from handnet_tpu.models.a2j import a2j_postprocess, anchors_for
    from handnet_tpu.models.fcos import decode_detections, preprocess
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.fpn import FPN
    from handnet_tpu.nn.resnet import resnet34

    profile = os.environ.get("PROFILE", "parity")
    overrides = None
    if os.environ.get("QUANT") == "1":
        # attribute the dynamic-int8 point (nn/quant.py) on any geometry
        overrides = {"fcos": {"quant": True}, "a2j": {"quant": True}}
    cfg = load_config(overrides,
                      yaml_path=os.path.join(_REPO, "configs",
                                             f"{profile}.yaml"))
    batch = args.batch or cfg.train.batch_size
    dtype = jnp.bfloat16

    pipe = HandNetPipeline(cfg, dtype=dtype)
    variables = pipe.init(jax.random.PRNGKey(0))
    det_vars = variables["detector"]
    a2j_vars = variables["a2j"]

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(batch, 480, 640, 3))
                         .astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(batch, 480, 640))
                        .astype(np.float32))

    rows = []

    def report(name, ms):
        rows.append((name, ms))
        print(f"{name:46s} {ms * 1000:9.2f} ms  "
              f"({batch / ms:8.1f} fps-equiv)", flush=True)

    # full fused graph
    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    t_full, _ = timed(fwd, variables, images, depth, iters=args.iters)
    report("FULL fused pipeline", t_full)

    # preprocess
    pre = jax.jit(lambda im: preprocess(im, cfg.fcos)[0])
    t_pre, net_in = timed(pre, images, iters=args.iters)
    report("preprocess (resize+normalize+pad)", t_pre)
    net_in = jax.block_until_ready(net_in)

    # detector net (backbone+fpn+head)
    det = pipe.detector
    det_fwd = jax.jit(
        lambda v, x: det.module.apply(v, x, train=False))
    t_det, head = timed(det_fwd, det_vars, net_in, iters=args.iters)
    report("detector net (backbone+FPN+head)", t_det)
    head = jax.block_until_ready(head)

    # backbone alone
    bb = resnet34(norm="frozen", dtype=dtype, quant=cfg.fcos.quant)
    bb_vars = {k: v["backbone"] for k, v in det_vars.items()
               if "backbone" in v}
    bb_fwd = jax.jit(lambda v, x: bb.apply(v, x, train=False))
    try:
        t_bb, feats = timed(bb_fwd, bb_vars, net_in, iters=args.iters)
        report("  detector backbone (resnet34)", t_bb)
        feats = jax.block_until_ready(feats)

        fpn = FPN(out_channels=cfg.fcos.fpn_channels, dtype=dtype,
                  quant=cfg.fcos.quant)
        fpn_vars = {k: v["fpn"] for k, v in det_vars.items() if "fpn" in v}
        fpn_fwd = jax.jit(lambda v, c3, c4, c5: fpn.apply(v, [c3, c4, c5]))
        t_fpn, pyr = timed(fpn_fwd, fpn_vars, feats["c3"], feats["c4"],
                           feats["c5"], iters=args.iters)
        report("  FPN", t_fpn)
        pyr = jax.block_until_ready(pyr)

        from handnet_tpu.models.fcos import FCOSHead
        hd = FCOSHead(cfg=cfg.fcos, dtype=dtype)
        hd_vars = {k: v["head"] for k, v in det_vars.items() if "head" in v}
        hd_fwd = jax.jit(lambda v, p0, p1, p2: hd.apply(v, [p0, p1, p2]))
        t_hd, _ = timed(hd_fwd, hd_vars, *pyr, iters=args.iters)
        report("  head towers (2x4 conv256+GN / level)", t_hd)
    except Exception as e:  # submodule surgery is best-effort attribution
        print(f"  (submodule breakdown unavailable: {e})")

    # decode + NMS (scale only affects box values, not timing shapes)
    s = min(cfg.fcos.image_h / 480, cfg.fcos.image_w / 640)
    scale = (s, s)
    dec = jax.jit(lambda h: decode_detections(h, det.anchors, cfg.fcos,
                                              scale_to_original=scale))
    t_dec, _ = timed(dec, head, iters=args.iters)
    report("decode + NMS", t_dec)

    # crop-resize (use full pipeline boxes path: fixed box for attribution)
    from handnet_tpu.ops.crop_resize import crop_resize_nearest
    boxes = jnp.tile(jnp.asarray([[100, 80, 420, 400]], jnp.int32),
                     (batch, 1))
    crop = jax.jit(lambda d, b: jax.vmap(
        lambda im, bx: crop_resize_nearest(
            im, bx, cfg.pipeline.crop_size, cfg.pipeline.crop_size))(d, b))
    t_crop, crops = timed(crop, depth[..., None], boxes, iters=args.iters)
    report("crop-resize (dynamic gather)", t_crop)
    crops = jax.block_until_ready(crops)

    # A2J forward + decode
    a2j = pipe.a2j
    a2j_fwd = jax.jit(lambda v, x: a2j.apply(v, x, train=False))
    t_a2j, heads = timed(a2j_fwd, a2j_vars, crops, iters=args.iters)
    report("A2J net (resnet50-dilated + heads)", t_a2j)
    heads = jax.block_until_ready(heads)

    anch = jnp.asarray(anchors_for(cfg.a2j))
    a2j_dec = jax.jit(lambda h: a2j_postprocess(h, anch))
    t_a2jd, _ = timed(a2j_dec, heads, iters=args.iters)
    report("A2J decode (pallas)", t_a2jd)

    summary = {name: round(ms * 1000, 3) for name, ms in rows}
    summary["batch"] = batch
    summary["profile"] = profile
    summary["fused_fps"] = round(batch / t_full, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
