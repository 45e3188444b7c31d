"""Export the fused pipeline to an AOT serving artifact (handnet_tpu.export).

Replaces the reference's deploy story — ship .pth files and rebuild the
models in python on the serving host (scripts/download_models.sh,
handnet_pipeline/handnet_pipeline.py:14-36) — with a hermetic StableHLO
artifact a host can run without any model code.

    python -m handnet_tpu.apps.export_pipeline --out DIR
        [--profile quant_static] [--buckets 1,8,32,128] [--hw 480,640]
        [--checkpoint DIR] [--calib scales.npz] [--quantized-wire]
        [--fields joints_uvd,boxes,found,scores] [--platforms tpu,cpu]
        [--xyz] [--serve-check]

--checkpoint loads {detector,a2j[,pose2mesh]}/params.npz + batch_stats.npz
trees saved by train.checkpoints.save_params_npz; without it the artifact
carries fresh-initialized weights (plumbing/latency testing only).
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu import runtime as _runtime


def _load_variables(pipe, args):
    if args.checkpoint:
        from handnet_tpu.train.checkpoints import load_params_npz

        base = args.checkpoint.rstrip("/")
        variables = {}
        for component in ("detector", "a2j", "pose2mesh"):
            cdir = os.path.join(base, component)
            if not os.path.isdir(cdir):
                continue
            tree = {"params": load_params_npz(
                os.path.join(cdir, "params.npz"))}
            bs = os.path.join(cdir, "batch_stats.npz")
            if os.path.exists(bs):
                tree["batch_stats"] = load_params_npz(bs)
            variables[component] = tree
        if not variables:
            raise SystemExit(f"no component dirs under {base}")
        return jax.tree_util.tree_map(jnp.asarray, variables)
    print("WARNING: no --checkpoint — exporting random weights")
    return pipe.init(jax.random.PRNGKey(0))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--profile", default="quant_static",
                        help="configs/<profile>.yaml operating point")
    parser.add_argument("--buckets", default="1,8,32,128")
    parser.add_argument("--hw", default="480,640",
                        help="frame geometry H,W")
    parser.add_argument("--checkpoint", default=None,
                        help="dir of per-component params.npz trees")
    parser.add_argument("--calib", default=None,
                        help="static-int8 calibration .npz "
                             "(nn.quant.save_calibration) — required for "
                             "quant: static profiles")
    parser.add_argument("--quantized-wire", action="store_true",
                        help="graphs take uint8 RGB / uint16 mm depth "
                             "(PipelineServer's wire format)")
    parser.add_argument("--fields", default=None,
                        help="comma-separated output subset (drops e.g. "
                             "the large crops tensor from readback)")
    parser.add_argument("--platforms", default="tpu,cpu")
    parser.add_argument("--xyz", action="store_true",
                        help="graphs also take paras [B,4] and emit "
                             "camera-frame joints")
    parser.add_argument("--serve-check", action="store_true",
                        help="reload the artifact and run one batch "
                             "through every bucket before exiting")
    args = parser.parse_args(argv)

    _runtime.setup()
    from handnet_tpu.config import load_config
    from handnet_tpu.export import export_pipeline
    from handnet_tpu.models.pipeline import HandNetPipeline

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(yaml_path=os.path.join(repo, "configs",
                                             f"{args.profile}.yaml"))
    height, width = (int(v) for v in args.hw.split(","))
    buckets = tuple(int(b) for b in args.buckets.split(","))

    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    variables = _load_variables(pipe, args)
    if pipe.needs_calibration():
        if not args.calib:
            raise SystemExit(f"profile {args.profile} is static-int8: pass "
                             "--calib (bake with "
                             "tools/bake_bench_calibration.py or "
                             "nn.quant.save_calibration)")
        from handnet_tpu.nn.quant import load_calibration
        variables = load_calibration(args.calib, variables)

    out = export_pipeline(
        cfg, variables, args.out, buckets=buckets, frame_hw=(height, width),
        dtype=jnp.bfloat16, with_xyz=args.xyz,
        quantized_wire=args.quantized_wire,
        out_fields=(args.fields.split(",") if args.fields else None),
        platforms=tuple(args.platforms.split(",")))
    total = sum(os.path.getsize(os.path.join(root, f))
                for root, _, files in os.walk(out) for f in files)
    print(f"exported {args.profile} -> {out} "
          f"(buckets {buckets}, {total / 1e6:.1f} MB)")

    if args.serve_check:
        from handnet_tpu.export import ServingArtifact
        art = ServingArtifact.load(out)
        rng = np.random.default_rng(0)
        for bucket in art.buckets:
            rgb = rng.uniform(0, 255, (bucket, height, width, 3))
            depth = rng.uniform(300, 1000, (bucket, height, width))
            if not art.quantized_wire:
                rgb, depth = rgb / 255.0, depth / 1000.0
            paras = (np.tile([600.0, 600.0, width / 2, height / 2],
                             (bucket, 1)) if art.with_xyz else None)
            got = art.predict(rgb, depth, paras)
            finite = all(np.isfinite(v).all() for v in got.values()
                         if np.issubdtype(np.asarray(v).dtype, np.floating))
            print(f"  bucket {bucket}: keys={sorted(got)} finite={finite}")


if __name__ == "__main__":
    main()
