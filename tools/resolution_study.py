"""Detector accuracy vs input resolution — the fast-profile justification.

The 'fast' operating point runs the detector at 512x640 network input for
480x640 frames; the reference's GeneralizedRCNNTransform (fcos_utils/
fcos.py:501-505) upsamples min-side to 800 (the 'parity' geometry,
800x1088). The upscale adds FLOPs but no sensor information; this study
quantifies what it buys: the SAME detector is trained per resolution on the
same synthetic detection task and compared on held-out frames (found-rate,
box IoU vs the planted hand, COCO AP/AP50/AP75).

    python tools/resolution_study.py --steps 500
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import FCOSConfig, TrainConfig
from handnet_tpu.data.detect_data import DetectDataSource
from handnet_tpu.data.dexycb import DexYCBDataset
from handnet_tpu.data.loader import PrefetchLoader
from handnet_tpu.data.synthetic import (make_synthetic_dexycb,
                                        synthetic_sequence_number)
from handnet_tpu.eval.coco_det import CocoDetEvaluator
from handnet_tpu.eval.voc import Detection, GTObject
from handnet_tpu.models.fcos import FCOSSystem, preprocess
from handnet_tpu.ops.boxes import box_iou
from handnet_tpu.train.trainer import FCOSTrainer


def train_and_eval(ds, train_idx, test_idx, info, image_h, image_w, steps,
                   batch, num_convs: int = 4, quant_eval=False):
    """``quant_eval``: train full-precision as always, then run the held-out
    eval through the int8 serving path (nn/quant.py) on the SAME trained
    params — pricing the quant profile's accuracy cost. ``True`` = dynamic
    per-sample scales; ``"static"`` = calibrated per-layer scales
    (calibration runs on TRAIN frames only, never the held-out set)."""
    fcfg = FCOSConfig(num_classes=2, ext=False, image_h=image_h,
                      image_w=image_w, max_detections=8,
                      num_convs=num_convs)
    trainer = FCOSTrainer(fcfg, TrainConfig(bf16=True, lr=5e-4,
                                            optimizer="adamw"),
                          steps_per_epoch=100, milestones_epochs=(100,),
                           backbone_norm="batch")
    state = trainer.init_state(jax.random.PRNGKey(0))
    src = DetectDataSource(ds, train_idx, e2e=False, uint8_images=True)
    loader = PrefetchLoader(src, batch, shuffle=True, num_workers=4)
    prep = jax.jit(lambda im: preprocess(im, fcfg)[0])
    scale = min(image_h / 480, image_w / 640)

    t0, step, last = time.time(), 0, None
    while step < steps:
        loader.set_epoch(step)
        for b in loader:
            state, metrics = trainer.train_step(state, {
                "image": prep(jnp.asarray(b["image"])),
                "targets": {
                    "boxes": jnp.asarray(b["target_boxes"] * scale),
                    "labels": jnp.asarray(b["target_labels"]),
                    "valid": jnp.asarray(b["target_valid"]),
                    "box_info": jnp.asarray(b["target_box_info"]),
                },
            })
            last = float(metrics["total_loss"])
            step += 1
            if step % 100 == 0:
                print(f"  [{image_h}x{image_w}] step {step}: {last:.3f}",
                      flush=True)
            if step >= steps:
                break
    train_s = time.time() - t0

    # held-out detection quality via the product detect() entry
    import dataclasses

    import cv2

    system = FCOSSystem(dataclasses.replace(fcfg, score_thresh=0.5,
                                            quant=quant_eval))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if quant_eval == "static":
        # one-pass activation-scale calibration on TRAIN frames (the
        # held-out eval frames are never seen by calibration)
        from handnet_tpu.nn.quant import assert_calibrated
        cal = np.stack([
            cv2.imread(ds[i]["color_file"])[:, :, ::-1].astype(np.float32)
            / 255.0 for i in train_idx[:16]])
        net_in, _ = preprocess(jnp.asarray(cal), fcfg)
        _, upd = system.module.apply(variables, net_in, train=False,
                                     mutable=["quant_stats"])
        variables = {**variables, **{k: v for k, v in upd.items() if v}}
        assert_calibrated(variables)
    detect = jax.jit(lambda v, im: system.detect(v, im))

    annos, dets, ious, found = {}, [], [], 0
    for i in test_idx:
        s, c, f = ds._mapping[i]
        # ds applies the s0-train sequence filter (every 5th sequence is
        # held out of the SPLIT, dexycb.py:62), so the mapping's sequence
        # index is into the FILTERED list — recover the generation index
        gen_s = synthetic_sequence_number(ds._sequences[int(s)])
        gt = info[(gen_s, int(f))]
        sample = ds[i]
        color = cv2.imread(sample["color_file"])[:, :, ::-1]
        out = detect(variables,
                     jnp.asarray(color[None].astype(np.float32) / 255.0))
        annos[str(i)] = [GTObject("hand", np.asarray(gt["hand_box"], float))]
        valid = np.asarray(out["valid"])[0]
        boxes = np.asarray(out["boxes"])[0]
        scores = np.asarray(out["scores"])[0]
        if valid.any():
            found += 1
            best = int(np.argmax(np.where(valid, scores, -1)))
            ious.append(float(np.asarray(box_iou(
                jnp.asarray(boxes[best][None]),
                jnp.asarray(np.asarray(gt["hand_box"], float)[None])))[0, 0]))
            for k in np.nonzero(valid)[0]:
                dets.append(Detection(str(i), float(scores[k]), boxes[k]))

    coco = CocoDetEvaluator(annos).evaluate(dets, ["hand"] * len(dets))
    return {
        "resolution": (f"{image_h}x{image_w}@nc{num_convs}"
                       + ("@qs" if quant_eval == "static"
                          else "@q" if quant_eval else "")),
        "train_seconds": round(train_s, 1),
        "final_loss": round(last, 4),
        "found_rate": round(found / len(test_idx), 4),
        "mean_iou": round(float(np.mean(ious)) if ious else 0.0, 4),
        "AP": round(coco["AP"], 4),
        "AP50": round(coco["AP50"], 4),
        "AP75": round(coco["AP75"], 4),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sequences", type=int, default=24)
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--difficulty", default="easy",
                        choices=["easy", "hard"],
                        help="'hard' plants 28-48px hands + hand-colored "
                             "clutter (data/synthetic.py) so found-rate "
                             "is not saturated at 1.0 — use for paired "
                             "fp-vs-int8 / nc4-vs-nc2 comparisons that "
                             "need detection headroom")
    parser.add_argument("--resolutions", nargs="+",
                        default=["512x640", "800x1088"],
                        help="HxW with optional @-suffixes: @ncN (tower "
                             "num_convs, default 4), @q (eval through "
                             "the dynamic-int8 serving path) and @qs "
                             "(calibrated static-int8) — e.g. "
                             "480x640@nc2 prices the 'turbo' point, "
                             "480x640@q the 'quant' point, 480x640@qs "
                             "the 'quant_static' point")
    args = parser.parse_args(argv)

    root = tempfile.mkdtemp(prefix="res_study_")
    info = make_synthetic_dexycb(root, n_sequences=args.sequences,
                                 n_frames=args.frames,
                                 difficulty=args.difficulty)
    ds = DexYCBDataset("s0", "train", data_dir=root)
    n = len(ds)
    train_idx = [i for i in range(n) if i % 5 != 4]
    test_idx = [i for i in range(n) if i % 5 == 4]
    print(f"{n} frames ({len(train_idx)} train / {len(test_idx)} held out)")

    results = []
    for res in args.resolutions:
        parts = res.split("@")
        nc, quant = 4, False
        for tok in parts[1:]:
            if tok.startswith("nc"):
                nc = int(tok[2:])
            elif tok == "q":
                quant = True
            elif tok == "qs":
                quant = "static"
            else:
                raise ValueError(f"unknown spec suffix @{tok} in {res!r}")
        h, w = (int(x) for x in parts[0].split("x"))
        results.append(train_and_eval(ds, train_idx, test_idx, info, h, w,
                                      args.steps, args.batch, num_convs=nc,
                                      quant_eval=quant))
        results[-1]["difficulty"] = args.difficulty
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"study": results}))


if __name__ == "__main__":
    main()
