"""Single-window GN-variant bench matrix: shipped default vs exact GN.

This tool produced the round-4 GN decision (v5e-1, 2026-08-20): in ONE
easing window per profile, gn_fast_variance beat the end-of-window exact
default by +5% on BOTH quant_static (1642.6 vs 1563.3 fps) and fast
(1217.4 vs 1164.4) while the pallas stats kernel — 13-67x faster
STANDALONE (tools/gn_pallas_probe.py) — came in BELOW the exact default
in-pipeline (1372.3 / 1056.3): the pallas_call is a fusion barrier for
the tower convs' epilogues. Consequence: gn_fast_variance ships ON in the
serving yamls and the pallas serving flag was removed (the kernel stays
as a standalone op). NOTE: those pallas rows were measured with the
PRE-REMOVAL tree (commit 76652d0's parent; the PGN knob and
FCOSConfig.pallas_gn are deleted) and cannot be reproduced with the
committed tool — kept here as the recorded decision evidence only.

Current variants: "default" (shipped: fast variance on, pallas A2J decode
on TPU), "exact" (GNFV=0 kill-switch, two-pass GN), and "einsum_decode"
(A2JDEC=einsum: the portable einsum A2J decode instead of the pallas
kernel — prices the last shipped pallas path in-pipeline at the GNFV
default; claimed noise-level in round 3, re-checked here).

Window-to-window tunnel congestion skews cross-run comparisons (the same
graph measured 1226 vs 1579 fps in different windows — CLAUDE.md), so this
tool measures every variant in ONE process/window: params are built on the
host cpu backend once, shipped in one bulk transfer, and reused across all
variant graphs (the GN parameter tree is identical both ways). Each
variant's result is emitted as its own JSON line IMMEDIATELY, so a
mid-window tunnel death keeps the finished measurements. The default graph
is re-timed at the end ("default2") as a congestion-drift control for the
window.

Run: python tools/bench_gn_matrix.py [--profile quant_static]
         [--only default,exact] [--iters 40]
Env: MATRIX_DEADLINE_S global budget (default 1800).
"""

import argparse
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

if os.environ.get("MATRIX_CPU_SMOKE"):
    # validate the script end-to-end on the host before burning a tunnel
    # window (sitecustomize pins jax_platforms, so env alone is too late)
    import jax as _jax_pre

    _jax_pre.config.update("jax_platforms", "cpu")

from handnet_tpu import runtime as _runtime  # noqa: E402

_runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

VARIANT_ENVS = {
    "default": {},
    "exact": {"GNFV": "0"},
    # A2JDEC is not a config field: time_variant applies it to the pipe
    # object, mirroring bench.py. Since round 5 the DEFAULT decode is the
    # einsum path (models/a2j.py — decided by this tool's 2026-08-21 run:
    # einsum 1684.0 vs pallas-decode default2 1659.8 same-window), so
    # "einsum_decode" is redundant with "default" and kept only for
    # comparability with older rows; "pallas_decode" re-prices the kernel.
    "einsum_decode": {"A2JDEC": "einsum"},
    "pallas_decode": {"A2JDEC": "pallas"},
}

_T0 = time.perf_counter()


def _status(msg):
    print(f"[matrix] +{time.perf_counter() - _T0:.1f}s {msg}",
          file=sys.stderr, flush=True)


def _emit(variant, fps, error=None):
    rec = {"metric": "gn_matrix_fps", "variant": variant,
           "value": round(fps, 2) if fps is not None else None,
           "unit": "frames/sec"}
    if error:
        rec["error"] = error
    print(json.dumps(rec), flush=True)


def _measure(state, variants, profile, iters, batch_override=None):
    import bench
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn import quant as quantlib

    base_env = {"PROFILE": profile}
    smoke = bool(os.environ.get("MATRIX_CPU_SMOKE"))

    def _cfg(env):
        cfg = bench.resolve_config(env=env)
        if smoke:
            # shrink to the dryrun fallback geometry (known-good shape,
            # __graft_entry__.py) — full 480x640 CPU compiles x3 variants
            # take tens of minutes; the smoke validates script mechanics
            import dataclasses
            cfg = dataclasses.replace(
                cfg,
                fcos=dataclasses.replace(cfg.fcos, image_h=192, image_w=256),
                a2j=dataclasses.replace(cfg.a2j, crop_h=64, crop_w=64),
                pipeline=dataclasses.replace(cfg.pipeline, crop_size=64))
        return cfg

    cfg0 = _cfg(base_env)
    batch = batch_override or cfg0.train.batch_size
    # sensor frames are always 480x640 (the pipeline resizes internally for
    # non-native detector geometries, exactly like bench.py) — except the
    # CPU smoke, which feeds the shrunk geometry directly
    img_h, img_w = (192, 256) if smoke else (480, 640)

    from handnet_tpu.utils.parcache import seed_params

    pipe0 = HandNetPipeline(cfg0, dtype=jnp.bfloat16)
    state["phase"] = "init params (host cpu)"
    variables = seed_params(pipe0, cfg0, "bfloat16", status=_status)
    if pipe0.needs_calibration():
        calib = bench.bench_calib_path(cfg0)
        state["phase"] = "load calibration"
        variables = quantlib.load_calibration(calib, variables)
        quantlib.assert_calibrated(variables)
    state["phase"] = "transfer params"
    _status("transferring params (one bulk device_put)")
    variables = jax.device_put(variables, jax.devices()[0])

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(size=(batch, img_h, img_w, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(batch, img_h, img_w)).astype(np.float32))

    def time_variant(name):
        env = {**base_env, **VARIANT_ENVS[name]}
        cfg = _cfg({k: v for k, v in env.items() if k != "A2JDEC"})
        pipe = HandNetPipeline(cfg, dtype=jnp.bfloat16)
        if env.get("A2JDEC") == "einsum":
            pipe.a2j.decode_pallas = False
        elif env.get("A2JDEC") == "pallas":
            pipe.a2j.decode_pallas = True
        fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
        state["phase"] = f"{name}: compile"
        _status(f"{name}: compiling")
        jax.block_until_ready(fwd(variables, images, depth))
        state["phase"] = f"{name}: timed loop"
        _status(f"{name}: timing {iters} iters")
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables, images, depth)
        jax.block_until_ready(out)
        float(np.asarray(out[0, 0, 0]))  # readback stop-clock (CLAUDE.md)
        return batch * iters / (time.perf_counter() - t0)

    for name in variants:
        try:
            fps = time_variant(name)
            _emit(name, fps)
            state.setdefault("done", []).append(name)
        except Exception as e:
            _emit(name, None, error=repr(e))
    if "default" in state.get("done", []) and len(variants) > 1:
        # drift control: same graph, end of window
        try:
            _emit("default2", time_variant("default"))
        except Exception as e:
            _emit("default2", None, error=repr(e))
    state["phase"] = "done"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="quant_static")
    ap.add_argument("--only", default="default,exact")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--batch", type=int, default=None,
                    help="override the profile batch (CPU smoke)")
    args = ap.parse_args()
    if os.environ.get("MATRIX_CPU_SMOKE"):
        args.batch = args.batch or 2
        args.iters = min(args.iters, 2)
    variants = [v for v in args.only.split(",") if v]
    for v in variants:
        if v not in VARIANT_ENVS:
            raise SystemExit(f"unknown variant {v!r}")

    deadline = float(os.environ.get("MATRIX_DEADLINE_S", "1800"))
    _status(f"profile={args.profile} variants={variants} "
            f"deadline={deadline:.0f}s backend={jax.default_backend()}")

    from tools.tunnel_probe import probe_device
    ok, detail = probe_device(min(60.0, deadline / 4))
    if not ok:
        for v in variants:
            _emit(v, None, error=f"tunnel_down ({detail})")
        os._exit(1)
    _status(f"tunnel probe ok ({detail}s)")

    state = {"phase": "start"}

    def _run():
        try:
            _measure(state, variants, args.profile, args.iters, args.batch)
        except Exception as e:
            state["error"] = repr(e)

    worker = threading.Thread(target=_run, daemon=True)
    worker.start()
    worker.join(max(5.0, deadline - (time.perf_counter() - _T0)))
    if worker.is_alive():
        _status(f"DEADLINE in phase: {state['phase']}")
        _emit("matrix", None, error=f"deadline_exceeded ({state['phase']})")
        # nonzero like the tunnel-down path: queue automation keyed on exit
        # status must not read a timed-out, incomplete matrix as success
        os._exit(1)
    if "error" in state:
        _emit("matrix", None, error=state["error"])
        os._exit(1)


if __name__ == "__main__":
    main()
