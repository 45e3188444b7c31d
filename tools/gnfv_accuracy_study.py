"""gn_fast_variance accuracy pricing on TRAINED weights (ADVICE r4 item 1).

Round 4 shipped ``FCOSConfig.gn_fast_variance=True`` in all serving yamls
on a +5% e2e throughput measurement, but its accuracy was only asserted at
random-init fp32 weights (tests/test_configs.py, rtol 1e-4). The fast path
computes GroupNorm variance as E[x^2]-E[x]^2 — a cancellation whose error
grows with activation magnitude, i.e. exactly with trained weights. This
study prices it the same way the int8 paths were priced: a PAIRED design on
the same trained weights, synthetic held-out frames, reporting per-frame
deltas (exact GN vs fast variance) for

  1. the detector alone (found-rate / best-box IoU / COCO AP),
  2. the fp e2e pipeline (MPJPE mm),
  3. the SHIPPED serving composition quant_static + GNFV (MPJPE mm)
     vs quant_static + exact GN.

Trained weights come from tools/synthetic_e2e_validation.py --save-state
(pass --state); without it this trains both stages first (slow).

    HANDNET_PLATFORM=cpu python tools/gnfv_accuracy_study.py \
        --state /tmp/r5_states.msgpack

Emits one JSON line per comparison with means and the paired-delta
mean +/- standard error, so "within noise" is a number, not a claim.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # sibling tools

import jax

from handnet_tpu import runtime as _runtime

_runtime.setup()
import jax.numpy as jnp
import numpy as np


def _paired(deltas):
    d = np.asarray(deltas, float)
    if d.size == 0:
        return {"n": 0}
    return {"n": int(d.size), "delta_mean": round(float(d.mean()), 4),
            "delta_sem": round(float(d.std(ddof=1) / np.sqrt(d.size))
                               if d.size > 1 else float("nan"), 4)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--state", default=None,
                        help="trained-state pack; omit to train here (slow)")
    parser.add_argument("--sequences", type=int, default=24)
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--fcos-steps", type=int, default=700)
    parser.add_argument("--a2j-steps", type=int, default=1500)
    parser.add_argument("--crop", type=int, default=96)
    parser.add_argument("--calib-frames", type=int, default=16)
    args = parser.parse_args(argv)

    from handnet_tpu.utils.statepack import load_trained_states

    if args.state is None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import synthetic_e2e_validation as sev

        args.state = os.path.join(tempfile.mkdtemp(prefix="gnfv_study_"),
                                  "states.msgpack")
        sev.main(["--sequences", str(args.sequences),
                  "--frames", str(args.frames),
                  "--fcos-steps", str(args.fcos_steps),
                  "--a2j-steps", str(args.a2j_steps),
                  "--crop", str(args.crop),
                  "--quant-eval", "none",
                  "--save-state", args.state])
    f_vars, fcfg, a_vars, acfg, synth = load_trained_states(args.state)
    if synth:
        args.sequences = synth.get("sequences", args.sequences)
        args.frames = synth.get("frames", args.frames)
        args.crop = synth.get("crop", args.crop)

    from handnet_tpu.config import HandNetConfig, PipelineConfig
    from handnet_tpu.data.dexycb import DexYCBDataset
    from handnet_tpu.data.synthetic import make_synthetic_dexycb
    from handnet_tpu.models.pipeline import HandNetPipeline

    # regenerate the deterministic synthetic tree the weights were trained
    # on (same pattern as tools/int8_saturation_study.py)
    root = tempfile.mkdtemp(prefix="gnfv_data_")
    info = make_synthetic_dexycb(root, n_sequences=args.sequences,
                                 n_frames=args.frames)
    ds = DexYCBDataset("s0", "train", data_dir=root)
    n = len(ds)
    train_idx = [i for i in range(n) if i % 5 != 4]
    test_idx = [i for i in range(n) if i % 5 == 4]

    from int8_saturation_study import _load_frames

    fcfg_eval = dataclasses.replace(fcfg, score_thresh=0.5)
    pcfg = PipelineConfig(crop_size=args.crop, pad_percent=0.4)
    variables = {"detector": f_vars, "a2j": a_vars}
    colors, depths, paras, joints_mm = _load_frames(ds, test_idx, info)
    print(f"{len(test_idx)} held-out frames", flush=True)

    # ---- 1. detector alone: exact vs fast-variance on the same weights ----
    from handnet_tpu.eval.coco_det import CocoDetEvaluator
    from handnet_tpu.eval.voc import Detection, GTObject
    from handnet_tpu.models.fcos import FCOSSystem
    from handnet_tpu.ops.boxes import box_iou

    det_stats = {}
    for gnfv in (False, True):
        system = FCOSSystem(dataclasses.replace(fcfg_eval,
                                                gn_fast_variance=gnfv))
        detect = jax.jit(lambda v, im, _s=system: _s.detect(v, im))
        annos, dets, ious, found = {}, [], [], 0
        per_frame_iou = []
        from handnet_tpu.data.synthetic import synthetic_sequence_number

        for j, i in enumerate(test_idx):
            out = detect(f_vars, jnp.asarray(colors[j][None]))
            valid = np.asarray(out["valid"])[0]
            boxes = np.asarray(out["boxes"])[0]
            scores = np.asarray(out["scores"])[0]
            s, c, f = ds._mapping[i]
            gen_s = synthetic_sequence_number(ds._sequences[int(s)])
            gt_box = np.asarray(info[(gen_s, int(f))]["hand_box"], float)
            annos[str(i)] = [GTObject("hand", gt_box)]
            if valid.any():
                found += 1
                best = int(np.argmax(np.where(valid, scores, -1)))
                iou = float(np.asarray(box_iou(
                    jnp.asarray(boxes[best][None]),
                    jnp.asarray(gt_box[None])))[0, 0])
                ious.append(iou)
                per_frame_iou.append(iou)
                for k in np.nonzero(valid)[0]:
                    dets.append(Detection(str(i), float(scores[k]), boxes[k]))
            else:
                per_frame_iou.append(0.0)
        coco = CocoDetEvaluator(annos).evaluate(dets, ["hand"] * len(dets))
        det_stats[gnfv] = {"found_rate": found / len(test_idx),
                           "mean_iou": float(np.mean(ious)) if ious else 0.0,
                           "AP": coco["AP"], "AP50": coco["AP50"],
                           "AP75": coco["AP75"],
                           "per_frame_iou": per_frame_iou}
    iou_delta = (np.asarray(det_stats[True]["per_frame_iou"])
                 - np.asarray(det_stats[False]["per_frame_iou"]))
    print(json.dumps({
        "comparison": "detector_gnfv_vs_exact",
        "exact": {k: round(v, 4) for k, v in det_stats[False].items()
                  if k != "per_frame_iou"},
        "gnfv": {k: round(v, 4) for k, v in det_stats[True].items()
                 if k != "per_frame_iou"},
        "paired_iou": _paired(iou_delta)}), flush=True)

    # ---- 2 & 3. e2e pipeline: fp and the shipped quant_static serving point
    results = {}
    for tier in ("fp", "quant_static"):
        for gnfv in (False, True):
            q = "static" if tier == "quant_static" else False
            cfg = HandNetConfig(
                fcos=dataclasses.replace(fcfg_eval, gn_fast_variance=gnfv,
                                         quant=q),
                a2j=dataclasses.replace(acfg, quant=q), pipeline=pcfg)
            pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
            v = variables
            if pipe.needs_calibration():
                cal_c, cal_d, _, _ = _load_frames(
                    ds, train_idx[:args.calib_frames], info)
                v = pipe.calibrate(variables, jnp.asarray(cal_c),
                                   jnp.asarray(cal_d))
            fwd = jax.jit(lambda vv, im, d, p, _p=pipe: _p(vv, im, d, p))
            out = fwd(v, jnp.asarray(colors), jnp.asarray(depths),
                      jnp.asarray(paras))
            found = np.asarray(out["found"]).astype(bool)
            xyz = np.asarray(out["joints_xyz"])
            per_frame = np.array([
                float(np.linalg.norm(xyz[i] - joints_mm[i], axis=1).mean())
                if found[i] else np.nan for i in range(len(found))])
            results[(tier, gnfv)] = {"found": float(found.mean()),
                                     "per_frame_mpjpe": per_frame}
        exact = results[(tier, False)]["per_frame_mpjpe"]
        fast = results[(tier, True)]["per_frame_mpjpe"]
        both = ~np.isnan(exact) & ~np.isnan(fast)
        print(json.dumps({
            "comparison": f"e2e_{tier}_gnfv_vs_exact",
            "exact_found": round(results[(tier, False)]["found"], 3),
            "gnfv_found": round(results[(tier, True)]["found"], 3),
            "exact_mpjpe_mm": round(float(np.nanmean(exact)), 3),
            "gnfv_mpjpe_mm": round(float(np.nanmean(fast)), 3),
            "paired_mpjpe_mm": _paired(fast[both] - exact[both])}),
            flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
