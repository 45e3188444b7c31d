"""End-to-end pipeline benchmark — the north-star metric.

Measures frames/sec/chip of the fused detect->crop->pose graph (the product
path: ros_demo.run_network equivalent) on whatever backend jax picks (the
real TPU chip under the driver). Baseline target: >=1000 fps/chip
(BASELINE.md; the reference publishes no numbers of its own).

Operating points live in configs/ and are selected with PROFILE:
  PROFILE=quant_static (default) the recommended serving point: the
                 REFERENCE architecture (tower depth 4, converted
                 checkpoints slot straight in) with calibrated static-int8
                 convs (nn/quant.py), detector at TRUE native 480x640.
                 Accuracy priced ~free on both stages (detector paired
                 study identical to 4 decimals, e2e gate +0.1 mm —
                 ROUND3_NOTES.md). batch 128.
  PROFILE=fast   same geometry/architecture in pure bf16 (no quantization;
                 the round-1/2 default). The reference's min-800 upscale
                 adds FLOPs, not information, hence native 480x640.
  PROFILE=parity detector at 800x1088, replicating the reference's
                 GeneralizedRCNNTransform min-800 resize. batch 128
                 (throughput knee, tools/perf_probe.py).
  PROFILE=turbo / PROFILE=quant: opt-in reduced-FLOP / dynamic-int8 points
                 (configs/*.yaml). QUANT=1|static composes the int8 conv
                 path onto any profile.
Both run the detector with num_classes=3, ext=False, matching the reference
pipeline's load_pretrained_fcos (handnet_pipeline/handnet_pipeline.py:14-24).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — and on
failure {"value": null, "error": ...} instead of hanging: the remote-TPU
tunnel this runs through can go down for hours AND flap in up-windows that
last anywhere from ~20 seconds to several minutes (CLAUDE.md). The round-5
structure minimises the window length a measurement needs:

  1. ALL host-side work runs BEFORE any tunnel dependence: params are
     built on the host cpu backend (and cached to
     ~/.cache/handnet_tpu_params keyed by config, so reruns skip the
     ~3 min random-init) and the pre-baked calibration artifact
     (configs/bench_calib.npz, tools/bake_bench_calibration.py) is merged
     host-side. The tunnel window is then needed only for one bulk
     transfer + compile (persistent XLA cache) + the 40-iteration loop —
     ~60-90 s warm.
  2. Tunnel probes (tools/tunnel_probe.py: tiny matmul + forced host
     readback) run ONLY in subprocesses, retrying every ~20 s for as long
     as the budget still fits a warm measurement (~BENCH_WARM_RUN_S,
     default 170 s). This process's backend client never issues a device
     op until a probe has passed, so a hung probe can never wedge the
     client the measurement will use (the round-4 re-exec dance is gone).
     BENCH_ASSUME_UP=1 skips the probe loop entirely — for callers (the
     window queue) that probed seconds ago themselves.
  3. Device work runs under a watchdog bounded by a global deadline
     (BENCH_DEADLINE_S, default 540 s, anchored to the FIRST process's
     start via BENCH_T0) that names the hung phase in the error JSON.
"""

import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 1000.0  # driver target from BASELINE.json


def resolve_config(env=os.environ):
    """PROFILE yaml + QUANT / GNFV env composition (unit-tested)."""
    from handnet_tpu.config import load_config

    profile = env.get("PROFILE", "quant_static")
    overrides = {"fcos": {}, "a2j": {}}
    if env.get("QUANT") in ("1", "static"):
        # compose the int8 serving path (nn/quant.py) onto any profile,
        # e.g. QUANT=1 PROFILE=parity measures the reference geometry with
        # dynamic-int8 convs; QUANT=static uses calibrated scales instead
        q = "static" if env["QUANT"] == "static" else True
        overrides["fcos"]["quant"] = q
        overrides["a2j"]["quant"] = q
    if env.get("GNFV") == "0":
        # kill-switch: serving yamls ship gn_fast_variance ON (measured +5%
        # e2e on fast AND quant_static — tools/bench_gn_matrix.py); GNFV=0
        # restores the exact two-pass GN on any profile
        overrides["fcos"]["gn_fast_variance"] = False
    elif env.get("GNFV"):
        # portable single-pass GN variance (serving-only, config.py note)
        overrides["fcos"]["gn_fast_variance"] = True
    return load_config(overrides if any(overrides.values()) else None,
                       yaml_path=os.path.join(_REPO, "configs",
                                              f"{profile}.yaml"))


def _status(msg):
    """Progress heartbeat on stderr — on a hang, the driver's captured tail
    shows exactly how far the bench got."""
    print(f"[bench] +{time.perf_counter() - _T0:.1f}s {msg}",
          file=sys.stderr, flush=True)


def _emit(value, error=None):
    rec = {
        "metric": "e2e_pipeline_fps_per_chip",
        "value": round(value, 2) if value is not None else None,
        "unit": "frames/sec",
        "vs_baseline": (round(value / BASELINE_FPS, 4)
                        if value is not None else None),
    }
    if error:
        rec["error"] = error
    print(json.dumps(rec), flush=True)


def bench_calib_path(cfg):
    """Pre-baked calibration artifact for bench's exact (seed-0 params,
    seed-0 data) setup — valid for any profile sharing the default quant
    layer layout; scale VALUES only affect numerics, never timing."""
    return os.path.join(_REPO, "configs", "bench_calib.npz")


def _host_prepare():
    """Everything the measurement needs that does NOT touch the tunnel:
    config, pipeline, seed-0 params (cached), pre-baked calibration merged
    into the tree, input frames as host numpy. Runs before any probe so a
    tunnel window is spent only on transfer+compile+loop."""
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn import quant as quantlib
    from handnet_tpu.utils.parcache import seed_params

    cfg = resolve_config()
    batch = cfg.train.batch_size
    dtype = jnp.bfloat16

    pipe = HandNetPipeline(cfg, dtype=dtype)
    if os.environ.get("A2JDEC") == "einsum":
        # explicit einsum decode — redundant since round 5 (einsum IS the
        # default, models/a2j.py:a2j_postprocess) but kept so older matrix
        # rows stay reproducible verbatim
        pipe.a2j.decode_pallas = False
    elif os.environ.get("A2JDEC") == "pallas":
        # re-price the standalone pallas decode kernel in-pipeline
        pipe.a2j.decode_pallas = True

    cpu0 = jax.local_devices(backend="cpu")[0]
    variables = seed_params(pipe, cfg, dtype.__name__, status=_status)

    needs_live_calibration = False
    if pipe.needs_calibration():
        calib = bench_calib_path(cfg)
        loaded = False
        if os.path.exists(calib):
            try:
                with jax.default_device(cpu0):
                    variables = quantlib.load_calibration(calib, variables)
                    quantlib.assert_calibrated(variables)
                loaded = True
                _status(f"merged pre-baked calibration ({calib})")
            except Exception as e:  # wrong layout for this profile — redo
                _status(f"pre-baked calibration unusable ({e!r}); "
                        "will calibrate live on-device")
        needs_live_calibration = not loaded

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(batch, 480, 640, 3)).astype(np.float32)
    depth = rng.uniform(0.3, 1.0, size=(batch, 480, 640)).astype(np.float32)
    return {"pipe": pipe, "variables": variables, "images": images,
            "depth": depth, "batch": batch,
            "needs_live_calibration": needs_live_calibration}


def _device_bench(prep, state):
    """The tunnel-dependent half; runs in a watchdog-joined worker thread
    and reports its position through state["phase"] so a mid-flight tunnel
    death names the hung phase instead of producing a silent rc=124."""
    pipe = prep["pipe"]

    state["phase"] = "transfer params+frames"
    _status("transferring params + frames to device")
    dev = jax.devices()[0]
    variables = jax.device_put(prep["variables"], dev)
    images = jax.device_put(prep["images"], dev)
    depth = jax.device_put(prep["depth"], dev)

    if prep["needs_live_calibration"]:
        # one-pass activation-scale calibration (quant_stats collection)
        state["phase"] = "calibrate (2 extra compiles)"
        _status("calibrating (no pre-baked artifact for this profile)")
        variables = pipe.calibrate(variables, images, depth)
        _status("calibration done")

    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])
    # warmup / compile
    state["phase"] = "compile+warmup"
    _status("compiling forward graph (persistent cache: ~seconds warm, "
            "minutes cold through the tunnel)")
    jax.block_until_ready(fwd(variables, images, depth))
    _status("compiled; timing")

    state["phase"] = "timed loop"
    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, images, depth)
    jax.block_until_ready(out)
    # forced host readback stop-clock: on the remote backend
    # block_until_ready can return early for small graphs; for THIS loop
    # block vs readback clocks were measured to agree to 0.02%
    # (tools/bench_clock_check.py) — the readback is belt-and-braces.
    float(np.asarray(out[0, 0, 0]))
    dt = time.perf_counter() - t0

    state["fps"] = prep["batch"] * iters / dt
    state["phase"] = "done"


# global-deadline anchor: a constant epoch across any child processes so
# retries can never stretch the driver-visible wall clock past
# BENCH_DEADLINE_S total
_T0_EPOCH = float(os.environ.setdefault("BENCH_T0", repr(time.time())))
_T0 = time.perf_counter() - (time.time() - _T0_EPOCH)


def _remaining(deadline):
    return deadline - (time.perf_counter() - _T0)


def _probe_retry_loop(deadline):
    """Tunnel-flap rider: probe ONLY in subprocesses, every ~20 s, until a
    window opens or the remaining budget no longer fits a warm measurement.
    Returns 'ok' | 'down'.

    Subprocesses because a hung in-process readback abandons a daemon
    thread inside the backend client — this process must never issue a
    device op before a probe has passed, so its client stays clean for the
    measurement (no re-exec needed)."""
    import subprocess

    # a warm run (persistent XLA cache + cached params + pre-baked
    # calibration) needs ~60-90 s of window; 170 keeps headroom for a
    # cold-cache compile (~40 s measured in-window round 5)
    warm_run_s = float(os.environ.get("BENCH_WARM_RUN_S", "170"))
    # 45s: the subprocess pays a fresh jax import (~10s at full core, much
    # more when a CPU training shares the box) before its readback clock;
    # the FIRST probe gets 60s — a fresh process's handshake+probe was
    # observed at 10-19s healthy and >30s congested (2026-08-20 09:32)
    probe_budget = min(45.0, deadline / 8)
    attempt = 0
    while True:
        attempt += 1
        budget = min(60.0, deadline / 4) if attempt == 1 else probe_budget
        try:
            rc = subprocess.run(
                [sys.executable,
                 os.path.join(_REPO, "tools", "tunnel_probe.py"),
                 str(budget)],
                timeout=budget + 60.0,
                capture_output=True).returncode
        except subprocess.TimeoutExpired:  # wedged child — treat as down
            rc = 1
        _status(f"probe attempt {attempt}: "
                f"{'OK' if rc == 0 else 'down'} "
                f"(remaining {_remaining(deadline):.0f}s)")
        if rc == 0:
            return "ok"
        if _remaining(deadline) <= warm_run_s + probe_budget:
            return "down"
        time.sleep(min(20.0, max(1.0, _remaining(deadline) - warm_run_s
                                 - probe_budget)))


def _probe_verdict(deadline):
    """BENCH_ASSUME_UP=1 skips probing entirely: the caller (window queue)
    probed seconds ago, and every in-window second spent re-proving the
    tunnel is a second a short window doesn't get to spend measuring. The
    deadline watchdog still bounds a window that closes mid-measurement."""
    if os.environ.get("BENCH_ASSUME_UP"):
        _status("BENCH_ASSUME_UP=1 — skipping probe, straight to device")
        return "ok"
    return _probe_retry_loop(deadline)


def main():
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "540"))
    _status(f"profile={os.environ.get('PROFILE', 'quant_static')} "
            f"deadline={deadline:.0f}s backend={jax.default_backend()} "
            f"elapsed-since-anchor={time.perf_counter() - _T0:.1f}s")

    # host-side prepare FIRST: no tunnel dependence, and it shrinks the
    # window length the measurement needs to transfer+compile+loop
    prep = _host_prepare()

    verdict = _probe_verdict(deadline)
    if verdict == "down":
        _status("tunnel down through the whole retry budget — aborting "
                "before any device work")
        _emit(None, error="tunnel_down (timeout)")
        # abandoned daemon probe thread may still hold the backend; exit hard
        os._exit(0)

    state = {"phase": "device start"}

    def _run():
        try:
            _device_bench(prep, state)
        except Exception as e:  # surface real failures as a record too
            state["error"] = repr(e)

    worker = threading.Thread(target=_run, daemon=True)
    worker.start()
    worker.join(max(5.0, deadline - (time.perf_counter() - _T0)))
    if worker.is_alive():
        _status(f"DEADLINE after {deadline:.0f}s in phase: {state['phase']}")
        _emit(None, error=f"deadline_exceeded ({state['phase']})")
        os._exit(0)  # the worker is stuck in uninterruptible device work
    if "error" in state:
        _emit(None, error=state["error"])
        return
    _emit(state["fps"])


if __name__ == "__main__":
    main()
