"""Run the exported AOT serving artifact on the real TPU once (VERDICT r4 #2).

handnet_tpu.export lowers the fused pipeline to serialized StableHLO for
platforms ("tpu","cpu"), and tests/test_export.py proves CPU bit-equality —
but until round 5 no exported graph had ever been deserialized and executed
on the axon backend. This tool is that proof: it exports the shipped
quant_static default (host-side trace+lower, no device work), loads the
artifact with ServingArtifact.load on the default (TPU) backend, runs one
bucket batch, asserts joints equality vs the LIVE pipeline jitted on the
same device with the same weights, exercises the pad/slice routing with a
partial batch, and times the bucket graph with the readback stop-clock.

Replaces-the-reference anchor: the .pth + rebuild-in-python deploy flow
(handnet_pipeline/handnet_pipeline.py:14-36) — our deployment unit must be
proven on the platform it exists for.

Emits JSON lines:
  {"check": "aot_vs_live", "max_abs_diff": ..., "ok": true}
  {"check": "aot_partial_batch", "n": 3, "ok": true}
  {"check": "aot_bucket_timing", "bucket": 8, "ms_per_batch": ..., "fps": ...}

Run: python tools/aot_tpu_check.py [--bucket 8] [--iters 20]
         [--artifact DIR (default /tmp/r5_aot_artifact, reused if present)]
Env: AOT_DEADLINE_S global budget (default 540);
     AOT_CPU_SMOKE=1 validates the script end-to-end on the host first
     (shrunk geometry, cpu platform) before burning a tunnel window.
"""

import argparse
import json
import os
import shutil
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

if os.environ.get("AOT_CPU_SMOKE"):
    import jax as _jax_pre

    _jax_pre.config.update("jax_platforms", "cpu")

from handnet_tpu import runtime as _runtime  # noqa: E402

_runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_T0 = time.perf_counter()


def _status(msg):
    print(f"[aot] +{time.perf_counter() - _T0:.1f}s {msg}",
          file=sys.stderr, flush=True)


def _emit(rec):
    print(json.dumps(rec), flush=True)


def _check(state, args):
    import bench
    from handnet_tpu.export import ServingArtifact, export_pipeline
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn import quant as quantlib

    smoke = bool(os.environ.get("AOT_CPU_SMOKE"))
    cfg = bench.resolve_config(env={"PROFILE": args.profile})
    if smoke:
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            fcos=dataclasses.replace(cfg.fcos, image_h=192, image_w=256),
            a2j=dataclasses.replace(cfg.a2j, crop_h=64, crop_w=64),
            pipeline=dataclasses.replace(cfg.pipeline, crop_size=64))
    hw = (192, 256) if smoke else (480, 640)
    bucket = args.bucket

    pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
    # export forces the einsum A2J decode (portable lowering); pin the live
    # comparison graph to the same decode so the equality is graph-vs-graph,
    # not decode-vs-decode (pallas-vs-einsum is fp-equal but not bit-equal)
    pipe.a2j.decode_pallas = False

    from handnet_tpu.utils.parcache import seed_params

    state["phase"] = "init params (host cpu)"
    variables = seed_params(pipe, cfg, "bfloat16", status=_status)
    if pipe.needs_calibration():
        state["phase"] = "load calibration"
        variables = quantlib.load_calibration(
            bench.bench_calib_path(cfg), variables)
        quantlib.assert_calibrated(variables)

    manifest = os.path.join(args.artifact, "manifest.json")
    if os.path.exists(manifest) and not args.reexport:
        _status(f"reusing existing artifact {args.artifact}")
    else:
        if os.path.isdir(args.artifact):
            shutil.rmtree(args.artifact)
        state["phase"] = "export (host-side lower+serialize)"
        _status(f"exporting buckets ({bucket},) at {hw} "
                f"platforms={'cpu' if smoke else 'tpu,cpu'}")
        export_pipeline(
            cfg, variables, args.artifact, buckets=(bucket,), frame_hw=hw,
            out_fields=("joints_uvd", "boxes", "found", "scores"),
            platforms=("cpu",) if smoke else ("tpu", "cpu"))
        _status("export written")
    if args.export_only:
        # pre-build pass (HANDNET_PLATFORM=cpu): trace+lower+serialize is
        # pure host work, so a later tunnel-window run reuses the artifact
        # and spends the window only on deserialize+compile+run
        _emit({"check": "aot_export_only", "artifact": args.artifact,
               "ok": True})
        state["phase"] = "done"
        return

    state["phase"] = "artifact load (deserialize)"
    art = ServingArtifact.load(args.artifact)

    rng = np.random.default_rng(0)
    rgb = rng.uniform(size=(bucket, *hw, 3)).astype(np.float32)
    dep = rng.uniform(0.3, 1.0, size=(bucket, *hw)).astype(np.float32)

    state["phase"] = f"artifact compile+run (bucket {bucket}, device)"
    _status("first artifact call (compiles the deserialized StableHLO "
            "on the device backend)")
    aot_out = art.predict(rgb, dep)
    _status("artifact ran")

    state["phase"] = "live pipeline compile+run (same device)"
    live_vars = jax.device_put(variables, jax.devices()[0])
    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    live = np.asarray(fwd(live_vars, jnp.asarray(rgb), jnp.asarray(dep)))
    _status("live graph ran")

    diff = float(np.max(np.abs(aot_out["joints_uvd"] - live)))
    ok = bool(diff <= args.tol)
    _emit({"check": "aot_vs_live", "backend": jax.default_backend(),
           "bucket": bucket, "max_abs_diff": diff, "tol": args.tol,
           "ok": ok})
    state.setdefault("fail", 0)
    state["fail"] += 0 if ok else 1

    # pad/slice routing with a partial batch on the same device graph
    state["phase"] = "partial-batch routing"
    n = max(1, bucket // 2 - 1)
    part = art.predict(rgb[:n], dep[:n])
    pok = bool(np.allclose(part["joints_uvd"], aot_out["joints_uvd"][:n],
                           atol=args.tol))
    _emit({"check": "aot_partial_batch", "n": n, "ok": pok})
    state["fail"] += 0 if pok else 1

    # bucket timing: chained readback clock (CLAUDE.md micro-bench rule)
    state["phase"] = "bucket timing"
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = art._run_chunk(rgb, dep, None)
        float(np.asarray(out["joints_uvd"][0, 0, 0]))  # readback stop-clock
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    _emit({"check": "aot_bucket_timing", "bucket": bucket,
           "ms_per_batch": round(med * 1e3, 2),
           "fps": round(bucket / med, 1)})
    state["phase"] = "done"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="quant_static")
    ap.add_argument("--bucket", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--artifact", default="/tmp/r5_aot_artifact")
    ap.add_argument("--reexport", action="store_true")
    ap.add_argument("--export-only", action="store_true",
                    help="host-side export pass: write the artifact and "
                         "exit (no device work; run under "
                         "HANDNET_PLATFORM=cpu during tunnel outages)")
    args = ap.parse_args()
    if os.environ.get("AOT_CPU_SMOKE"):
        args.bucket = min(args.bucket, 2)
        args.iters = 1  # CPU iterations of the int8 graph are ~2 min each
        if args.artifact == "/tmp/r5_aot_artifact":
            args.artifact = "/tmp/r5_aot_artifact_smoke"

    deadline = float(os.environ.get("AOT_DEADLINE_S", "540"))
    _status(f"profile={args.profile} bucket={args.bucket} "
            f"deadline={deadline:.0f}s backend={jax.default_backend()}")

    if args.export_only:
        _status("export-only: host-side pass, no probe / no device work")
    elif os.environ.get("AOT_ASSUME_UP"):
        # the window queue probed seconds ago — every in-window second
        # spent re-proving the tunnel is one a short window doesn't get to
        # spend on the check; the deadline watchdog still bounds a hang
        _status("AOT_ASSUME_UP=1 — skipping probe, straight to device")
    elif not os.environ.get("AOT_CPU_SMOKE"):
        from tools.tunnel_probe import probe_device
        ok, detail = probe_device(min(45.0, deadline / 4))
        if not ok:
            _emit({"check": "aot_vs_live", "ok": False,
                   "error": f"tunnel_down ({detail})"})
            os._exit(1)
        _status(f"tunnel probe ok ({detail}s)")

    state = {"phase": "start"}

    def _run():
        try:
            _check(state, args)
        except Exception as e:
            state["error"] = repr(e)

    worker = threading.Thread(target=_run, daemon=True)
    worker.start()
    worker.join(max(5.0, deadline - (time.perf_counter() - _T0)))
    if worker.is_alive():
        _status(f"DEADLINE in phase: {state['phase']}")
        _emit({"check": "aot", "ok": False,
               "error": f"deadline_exceeded ({state['phase']})"})
        os._exit(1)
    if "error" in state:
        _emit({"check": "aot", "ok": False, "error": state["error"]})
        os._exit(1)
    os._exit(1 if state.get("fail") else 0)


if __name__ == "__main__":
    main()
