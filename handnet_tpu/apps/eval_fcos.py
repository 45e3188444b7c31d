"""Detector evaluation CLI: VOC AP + hand-constrained AP + FPS.

Reference: trainval_net_fcos.py --test-only path (:107-173) + the
pascal_voc.evaluate_detections sweep (:418-429). Produces the same detection
files (11-field rows) and the same AP table, plus a jitted-graph FPS figure
(the reference prints FPS from cuda-synchronized timings, :124-130,173).

Usage:
  python -m handnet_tpu.apps.eval_fcos --voc-root DIR [--image-set test]
      [--checkpoint orbax_dir | --torch-checkpoint fcos.pth]
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

from handnet_tpu.config import FCOSConfig
from handnet_tpu.data.voc100doh import (VOC100DOH, decoded_to_detections,
                                        write_detection_file)
from handnet_tpu.eval.voc import evaluate_detections_100doh
from handnet_tpu.models.fcos import FCOSSystem


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--voc-root", required=True)
    parser.add_argument("--image-set", default="test")
    parser.add_argument("--net", default="fcos", choices=["fcos", "rcnn"],
                        help="detector family (the reference's --net flag)")
    parser.add_argument("--num-proposals", type=int, default=128)
    parser.add_argument("--torch-checkpoint", default=None)
    parser.add_argument("--output", default="models/fcos_eval")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--score-thresh", type=float, default=0.1)
    parser.add_argument("--image-h", type=int, default=800)
    parser.add_argument("--image-w", type=int, default=1088)
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)

    os.makedirs(args.output, exist_ok=True)
    ds = VOC100DOH(args.voc_root, args.image_set)
    indices = ds.image_index[:args.limit or None]

    cfg = FCOSConfig(num_classes=3, image_h=args.image_h,
                     image_w=args.image_w, score_thresh=args.score_thresh)
    if args.net == "rcnn":
        from handnet_tpu.models.faster_rcnn import (FasterRCNNFPN,
                                                    decode_rcnn_detections)
        from handnet_tpu.models.fcos import preprocess

        module = FasterRCNNFPN(num_classes=3, image_h=args.image_h,
                               image_w=args.image_w,
                               num_proposals=args.num_proposals,
                               dtype=jnp.bfloat16)
        if args.torch_checkpoint:
            from handnet_tpu.convert.torch_weights import (
                convert_faster_rcnn, load_torch_checkpoint)

            variables = jax.tree_util.tree_map(
                jnp.asarray, convert_faster_rcnn(
                    load_torch_checkpoint(args.torch_checkpoint)))
        else:
            print("WARNING: random detector weights")
            variables = module.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.image_h, args.image_w, 3)), train=False)

        def _detect(v, im):
            net_in, scale = preprocess(im, cfg)
            out = module.apply(v, net_in, train=False)
            det = decode_rcnn_detections(
                out, 3, score_thresh=args.score_thresh,
                image_hw=(args.image_h, args.image_w))
            sy, sx = scale
            det["boxes"] = det["boxes"] * jnp.asarray(
                [1 / sx, 1 / sy, 1 / sx, 1 / sy], jnp.float32)
            return det

        detect = jax.jit(_detect)
    else:
        system = FCOSSystem(cfg, dtype=jnp.bfloat16)
        if args.torch_checkpoint:
            from handnet_tpu.convert.torch_weights import (
                convert_fcos, load_torch_checkpoint)

            variables = jax.tree_util.tree_map(
                jnp.asarray,
                convert_fcos(load_torch_checkpoint(args.torch_checkpoint)))
        else:
            print("WARNING: random detector weights")
            variables = system.init(jax.random.PRNGKey(0))
        detect = jax.jit(lambda v, im: system.detect(v, im))

    import cv2

    hands, objects = [], []
    model_time = 0.0
    n_images = 0
    batch_imgs, batch_ids = [], []

    def flush():
        nonlocal model_time, n_images, batch_imgs, batch_ids
        if not batch_imgs:
            return
        imgs = jnp.asarray(np.stack(batch_imgs))
        t0 = time.perf_counter()
        det = detect(variables, imgs)
        jax.block_until_ready(det["boxes"])
        model_time += time.perf_counter() - t0
        n_images += len(batch_ids)
        det_np = jax.tree_util.tree_map(np.asarray, det)
        h, o = decoded_to_detections(det_np, batch_ids, hand_label=2,
                                     object_label=1,
                                     score_thresh=args.score_thresh)
        hands.extend(h)
        objects.extend(o)
        batch_imgs, batch_ids = [], []

    for index in indices:
        img = cv2.imread(ds.image_path(index))[:, :, ::-1]
        batch_imgs.append(img.astype(np.float32) / 255.0)
        batch_ids.append(index)
        if len(batch_imgs) == args.batch:
            flush()
    flush()

    write_detection_file(
        os.path.join(args.output, "comp4_det_test_hand.txt"), hands)
    write_detection_file(
        os.path.join(args.output, "comp4_det_test_targetobject.txt"), objects)

    annos = ds.annotations()
    results = evaluate_detections_100doh(hands, objects, annos)
    for k, v in results.items():
        print(f"{k}: {v:.4f}")
    fps = n_images / model_time if model_time > 0 else 0.0
    print(f"FPS: {fps:.2f}")
    return results


if __name__ == "__main__":
    main()
