"""Multi-stream streaming server around the fused pipeline.

The productionized equivalent of the reference's ROS node
(ros_demo.py:170-246): that node subscribes to RGB+depth topics, runs the
network per frame, and publishes joints. Here the transport is a host queue
(pluggable into any RPC/ROS front end), and the serving core is TPU-shaped:

* frames from any number of streams are MICROBATCHED into the jitted
  fixed-batch pipeline graph (partial batches are padded; shapes stay
  static so nothing recompiles),
* TWO batches stay in flight — jax's async dispatch overlaps host-side
  assembly of batch N+1 with device compute of batch N (the double-buffered
  feed bench.py relies on, formalized),
* results fan back out per (stream_id, frame_id) on an output queue.

Run the built-in throughput check (synthetic frames, host-thread fed):

    python -m handnet_tpu.apps.serve --frames 512 --batch 128
"""

from __future__ import annotations

import argparse
import queue
import threading
import time
from collections import deque
from typing import Any, Dict, Iterable, Optional, Tuple

import jax

from handnet_tpu import runtime as _runtime
_runtime.setup()
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import HandNetConfig
from handnet_tpu.models.pipeline import HandNetPipeline

_STOP = object()


class PipelineServer:
    """Queue-in/queue-out serving wrapper over one jitted pipeline graph.

    Args:
      cfg: HandNetConfig (detector/a2j/pipeline operating point).
      batch_size: the compiled batch; also the microbatch target.
      variables: pipeline variables; fresh-initialized when None.
      frame_hw: static (H, W) every submitted frame must match.
      flush_timeout: seconds to wait for more frames before dispatching a
        partial batch (latency/throughput knob).
      out_fields: which pipeline outputs to return per frame.
      mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis — each
        microbatch is sharded over it (params replicated), so serving
        throughput scales with chip count; ``batch_size`` must be a
        multiple of ``mesh.size``.
      batch_buckets: optional batch-size ladder, e.g. ``(1, 8, 32)``. A
        collected microbatch of n frames is padded only to the SMALLEST
        bucket >= n (``batch_size`` is always the top rung), instead of
        always to ``batch_size`` — a 1-frame trickle runs the batch-1
        graph, not 1 real + 127 padding frames through the batch-128 one.
        Throughput under load is unchanged (full batches still ride the
        top bucket); tail latency under light load drops by roughly the
        ratio of bucket sizes. Cost: one compiled graph per bucket
        (pre-warmed in :meth:`compile`); jit specializes per shape, so no
        extra plumbing. Default None = single-bucket (classic) behavior.
    """

    def __init__(self, cfg: Optional[HandNetConfig] = None,
                 batch_size: int = 32, variables=None,
                 frame_hw: Tuple[int, int] = (480, 640),
                 flush_timeout: float = 0.002,
                 out_fields: Iterable[str] = ("joints_uvd", "boxes", "found",
                                              "scores"),
                 # with cfg.pipeline.with_mesh, add "verts" here to stream
                 # the fused 778-vert mesh per frame
                 dtype: Any = jnp.bfloat16,
                 quantized_transfer: bool = True,
                 mesh: Optional[Any] = None,
                 batch_buckets: Optional[Iterable[int]] = None):
        self.cfg = cfg or HandNetConfig()
        self.batch_size = batch_size
        buckets = sorted(set(batch_buckets or ()) | {batch_size})
        if buckets[-1] != batch_size or buckets[0] < 1:
            raise ValueError(
                f"batch_buckets {buckets} must lie in [1, batch_size="
                f"{batch_size}]")
        self.batch_buckets = tuple(buckets)
        # dispatch-count per bucket — routing observability (and the hook
        # the bucket tests assert on)
        self.bucket_dispatches: Dict[int, int] = {b: 0 for b in buckets}
        # Optional multi-chip serving: batch-shard every microbatch over a
        # jax.sharding.Mesh "data" axis (params replicated) — serving scales
        # by adding chips exactly like the training step does. The wire
        # format/queues are unchanged; XLA handles the host->shards scatter.
        self.mesh = mesh
        if mesh is not None:
            bad = [b for b in self.batch_buckets if b % mesh.size != 0]
            if bad:
                raise ValueError(
                    f"batch buckets {bad} must divide over mesh size "
                    f"{mesh.size}")
        self.frame_hw = frame_hw
        self.flush_timeout = flush_timeout
        self.out_fields = tuple(out_fields)
        # ship frames in sensor-native width (uint8 RGB, uint16 mm depth):
        # 4x less host->device traffic than float32 — the bandwidth that
        # bounds serving, not the MXU. Dequantization happens on device
        # inside the jitted graph.
        self.quantized_transfer = quantized_transfer
        self.pipe = HandNetPipeline(self.cfg, dtype=dtype)
        if variables is None:
            variables = self.pipe.init(jax.random.PRNGKey(0))
        self.variables = variables

        def fwd(v, im, d):
            if self.quantized_transfer:
                im = im.astype(jnp.float32) / 255.0
                d = d.astype(jnp.float32) / 1000.0
            out = self.pipe(v, im, d)
            return {k: o for k, o in out.items() if k in self.out_fields}

        if mesh is not None:
            from handnet_tpu.parallel.mesh import (data_sharding,
                                                   replicate_sharding)
            repl = replicate_sharding(mesh)
            data = data_sharding(mesh)
            self.variables = jax.device_put(self.variables, repl)
            self._fwd = jax.jit(fwd, in_shardings=(repl, data, data),
                                out_shardings=data)
        else:
            self._fwd = jax.jit(fwd)
        self.inputs: "queue.Queue" = queue.Queue(maxsize=4 * batch_size)
        self.results: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self._frames_done = 0
        self._served_seconds = 0.0
        self._loop_start: Optional[float] = None
        # submit->result wall time of the last 10k frames (tail-latency
        # observability; the number the batch-bucket ladder moves)
        self._latencies: deque = deque(maxlen=10_000)
        # frames that came back as {"error": ...} instead of results
        self.error_count = 0

    @classmethod
    def from_artifact(cls, path: str,
                      out_fields: Optional[Iterable[str]] = None,
                      **kwargs) -> "PipelineServer":
        """Build a server that runs an AOT-exported artifact
        (``handnet_tpu.export``) instead of tracing the model: the batch
        ladder, wire format, geometry, and weights all come from the
        artifact's manifest, and ``_fwd`` dispatches to the pre-lowered
        per-bucket StableHLO graphs — model code never runs on the
        serving host. ``kwargs`` pass through (flush_timeout, ...);
        ``mesh`` is unsupported (export is single-device)."""
        from handnet_tpu.export import ServingArtifact

        art = ServingArtifact.load(path)
        if art.with_xyz:
            raise ValueError("server wire has no intrinsics: export the "
                             "serving artifact with with_xyz=False")
        if kwargs.get("mesh") is not None:
            raise ValueError("artifact serving is single-device; shard by "
                             "running one server per chip")
        exported_fields = art.manifest.get("out_fields")
        if out_fields is None:
            out_fields = (tuple(exported_fields) if exported_fields
                          else ("joints_uvd", "boxes", "found", "scores"))
        elif exported_fields is not None:
            missing = set(out_fields) - set(exported_fields)
            if missing:
                raise ValueError(f"artifact does not emit {sorted(missing)} "
                                 f"(exported: {exported_fields})")
        server = cls(cfg=art.config(),
                     batch_size=art.buckets[-1],
                     variables=art.variables,
                     frame_hw=art.frame_hw,
                     out_fields=out_fields,
                     quantized_transfer=art.quantized_wire,
                     batch_buckets=art.buckets,
                     **kwargs)

        def fwd_from_artifact(v, im, d):
            out = art._graphs[im.shape[0]](v, im, d)
            return {k: o for k, o in out.items() if k in server.out_fields}

        server._fwd = fwd_from_artifact
        return server

    # -- client side --------------------------------------------------------

    def submit(self, stream_id, frame_id, rgb: np.ndarray,
               depth: np.ndarray) -> None:
        """rgb [H, W, 3]: float 0-1 or uint8. depth [H, W]: float meters or
        uint16 millimeters (sensor-native formats pass through unconverted
        when quantized_transfer is on)."""
        if rgb.shape[:2] != self.frame_hw or depth.shape[:2] != self.frame_hw:
            raise ValueError(
                f"frame rgb {rgb.shape[:2]} / depth {depth.shape[:2]} != "
                f"static {self.frame_hw}")
        if self.quantized_transfer:
            if rgb.dtype != np.uint8:
                rgb = np.clip(rgb * 255.0, 0, 255).astype(np.uint8)
            if depth.dtype != np.uint16:
                depth = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        else:
            if rgb.dtype == np.uint8:
                rgb = rgb.astype(np.float32) / 255.0
            if depth.dtype == np.uint16:
                depth = depth.astype(np.float32) / 1000.0
        self.inputs.put((stream_id, frame_id, rgb, depth,
                         time.perf_counter()))

    def get(self, timeout: Optional[float] = None):
        """Next finished frame: (stream_id, frame_id, {field: np.ndarray}).
        If that frame's batch failed on device, the dict is instead
        {"error": "<repr>"} — the server stays up and keeps serving
        (``error_count`` tallies these)."""
        return self.results.get(timeout=timeout)

    # -- lifecycle -----------------------------------------------------------

    def _place_variables(self, variables):
        if self.mesh is not None:
            from handnet_tpu.parallel.mesh import replicate_sharding
            variables = jax.device_put(variables,
                                       replicate_sharding(self.mesh))
        return variables

    def calibrate(self, images: np.ndarray, depth: np.ndarray) -> None:
        """One-pass static-int8 activation-scale calibration
        (``HandNetPipeline.calibrate``) on representative frames; call
        before :meth:`start`. ``images`` float [B,H,W,3] in 0-1, ``depth``
        float [B,H,W] meters. No-op for float/dynamic-quant configs."""
        variables = self.pipe.calibrate(
            self.variables, jnp.asarray(images, jnp.float32),
            jnp.asarray(depth, jnp.float32))
        self.variables = self._place_variables(variables)

    def load_calibration(self, path: str) -> None:
        """Merge a saved static-int8 calibration artifact
        (``nn.quant.save_calibration``) into this server's variables."""
        from handnet_tpu.nn.quant import load_calibration
        self.variables = self._place_variables(
            load_calibration(path, self.variables))

    def start(self) -> "PipelineServer":
        # fail loudly if a quant="static" model was never calibrated —
        # uncalibrated static scales saturate every activation to +-127 and
        # serve finite garbage (no-op for float/dynamic configs)
        from handnet_tpu.nn.quant import assert_calibrated
        assert_calibrated(self.variables)
        self.compile()
        self._stop.clear()
        self._thread = threading.Thread(target=self._serve_loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        """Graceful stop: already-queued frames are still served. An Event,
        not a queue sentinel — a sentinel put() can deadlock against
        producers on the bounded input queue."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    @property
    def _wire_dtypes(self):
        return ((np.uint8, np.uint16) if self.quantized_transfer
                else (np.float32, np.float32))

    def compile(self) -> None:
        h, w = self.frame_hw
        im_dt, d_dt = self._wire_dtypes
        for b in self.batch_buckets:  # jit specializes per batch shape
            im = jnp.zeros((b, h, w, 3), im_dt)
            d = jnp.zeros((b, h, w), d_dt)
            jax.block_until_ready(self._fwd(self.variables, im, d))

    @property
    def sustained_fps(self) -> float:
        return (self._frames_done / self._served_seconds
                if self._served_seconds else 0.0)

    def latency_stats(self) -> Dict[str, float]:
        """Submit->result wall-time percentiles (ms) over the last <=10k
        served frames: {"count", "p50_ms", "p90_ms", "p99_ms", "max_ms"}.
        Per-frame latency includes queueing + microbatch flush wait +
        device time — the client-visible number, not the kernel time."""
        lat = np.asarray(self._latencies, np.float64)
        if lat.size == 0:
            return {"count": 0, "p50_ms": 0.0, "p90_ms": 0.0,
                    "p99_ms": 0.0, "max_ms": 0.0}
        p50, p90, p99 = np.percentile(lat, [50, 90, 99]) * 1e3
        return {"count": int(lat.size), "p50_ms": float(p50),
                "p90_ms": float(p90), "p99_ms": float(p99),
                "max_ms": float(lat.max() * 1e3)}

    def compute_fps_probe(self, n_batches: int = 16,
                          inflight: int = 2) -> float:
        """Sustained fps of the serving graph with frames PRE-STAGED on
        device — the compute ceiling of this server on this backend, with
        the host-transfer and microbatch-assembly terms excluded. The
        queue-fed ``sustained_fps`` divided by this number is the serving
        overhead, cleanly separated from the transfer bound (which dominates
        through remote-TPU tunnels — ROUND2_NOTES measured 85 MB/s there).
        """
        h, w = self.frame_hw
        im_dt, d_dt = self._wire_dtypes
        ims = jnp.zeros((self.batch_size, h, w, 3), im_dt)
        ds = jnp.zeros((self.batch_size, h, w), d_dt)
        if self.mesh is not None:   # pre-stage already sharded
            from handnet_tpu.parallel.mesh import shard_batch
            ims, ds = shard_batch(self.mesh, (ims, ds))
        jax.block_until_ready(self._fwd(self.variables, ims, ds))  # compile
        pending: deque = deque()
        t0 = time.perf_counter()
        for _ in range(n_batches):
            pending.append(self._fwd(self.variables, ims, ds))
            if len(pending) >= inflight:
                jax.block_until_ready(pending.popleft())
        while pending:
            jax.block_until_ready(pending.popleft())
        return n_batches * self.batch_size / (time.perf_counter() - t0)

    # -- server side ---------------------------------------------------------

    def _collect_batch(self, block: bool):
        """Gather up to batch_size frames (flush-timeout bounded) — the
        microbatcher. ``block=False`` (work already in flight) returns None
        immediately on an empty queue so inflight results can drain instead
        of deadlocking on input starvation. Returns _STOP once the stop
        event is set AND the queue is drained."""
        try:
            item = (self.inputs.get(timeout=0.05) if block
                    else self.inputs.get(block=False))
        except queue.Empty:
            if self._stop.is_set() and self.inputs.empty():
                return _STOP
            return None
        items = [item]
        deadline = time.perf_counter() + self.flush_timeout
        while len(items) < self.batch_size:
            remain = deadline - time.perf_counter()
            try:
                items.append(self.inputs.get(timeout=max(remain, 0.0)))
            except queue.Empty:
                break
        return items

    def _dispatch(self, items):
        import os as _os
        if _os.environ.get("SERVE_DEBUG"):
            print(f"dispatch n={len(items)} qsize={self.inputs.qsize()}",
                  flush=True)
        h, w = self.frame_hw
        n = len(items)
        # smallest pre-compiled bucket that fits — partial microbatches pay
        # for their own size, not for batch_size-n frames of padding
        bucket = next(b for b in self.batch_buckets if b >= n)
        self.bucket_dispatches[bucket] += 1
        im_dt, d_dt = self._wire_dtypes
        images = np.zeros((bucket, h, w, 3), im_dt)
        depths = np.zeros((bucket, h, w), d_dt)
        for i, (_, _, rgb, dep, _) in enumerate(items):
            images[i] = rgb
            depths[i] = dep
        # numpy in: jit transfers (and, under a mesh, shards) asynchronously
        out = self._fwd(self.variables, images, depths)
        meta = [(sid, fid, ts) for sid, fid, _, _, ts in items]
        return out, meta, n

    def _complete(self, inflight) -> None:
        out, meta, n = inflight
        host = {k: np.asarray(v) for k, v in out.items()}  # blocks
        done = time.perf_counter()
        for i, (sid, fid, ts) in enumerate(meta):
            self._latencies.append(done - ts)
            self.results.put((sid, fid, {k: v[i] for k, v in host.items()}))
        self._frames_done += n
        if self._loop_start is not None:
            self._served_seconds = time.perf_counter() - self._loop_start

    def _fail(self, meta, exc: BaseException) -> None:
        """Deliver a per-frame error result instead of dropping frames — a
        failed batch must never leave clients blocked in :meth:`get` or
        kill the serve thread (device/runtime errors surface at dispatch or
        at the completion readback, e.g. a dropped remote-TPU tunnel)."""
        self.error_count += len(meta)
        for sid, fid, ts in meta:
            self._latencies.append(time.perf_counter() - ts)
            self.results.put((sid, fid, {"error": repr(exc)}))

    def _safe_complete(self, inflight) -> None:
        try:
            self._complete(inflight)
        except Exception as e:          # readback failed -> error results
            self._fail(inflight[1], e)

    def _serve_loop(self) -> None:
        inflight: deque = deque()
        t0 = time.perf_counter()
        self._loop_start = t0
        while True:
            # only block on input when nothing is in flight; otherwise an
            # idle input queue must drain results, not starve them
            items = self._collect_batch(block=not inflight)
            if items is _STOP:
                break
            if items is None:           # input idle -> flush oldest batch
                if inflight:
                    self._safe_complete(inflight.popleft())
                continue
            try:
                inflight.append(self._dispatch(items))
            except Exception as e:      # dispatch failed -> error results
                self._fail([(s, f, ts) for s, f, _, _, ts in items], e)
                continue
            if len(inflight) >= 2:      # double buffer: drain the older one
                self._safe_complete(inflight.popleft())
        while inflight:
            self._safe_complete(inflight.popleft())
        self._served_seconds = time.perf_counter() - t0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=512)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--streams", type=int, default=4)
    parser.add_argument("--profile", default="fast",
                        help="configs/<profile>.yaml operating point")
    parser.add_argument("--compute-only", action="store_true",
                        help="also print the device-staged compute ceiling "
                             "(no host transfer) for overhead attribution")
    parser.add_argument("--mesh", type=int, default=0,
                        help="shard each microbatch over this many devices "
                             "(0 = single device)")
    parser.add_argument("--buckets", default=None,
                        help="comma-separated batch-bucket ladder (e.g. "
                             "'1,8,32'); partial microbatches pad only to "
                             "the smallest fitting bucket")
    parser.add_argument("--calib", default=None,
                        help="static-int8 calibration artifact (.npz): "
                             "loaded if it exists, else written after "
                             "calibrating on the warmup frames (only used "
                             "by quant: static profiles)")
    args = parser.parse_args(argv)

    import os

    from handnet_tpu.config import load_config
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(yaml_path=os.path.join(repo, "configs",
                                             f"{args.profile}.yaml"))
    mesh = None
    if args.mesh:
        from handnet_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(args.mesh)
    buckets = ([int(b) for b in args.buckets.split(",")]
               if args.buckets else None)
    server = PipelineServer(cfg, batch_size=args.batch, mesh=mesh,
                            batch_buckets=buckets)

    rng = np.random.default_rng(0)
    # sensor-native frames: no per-frame float->uint8 conversion on submit
    frames = [(rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8),
               rng.integers(300, 1000, size=(480, 640), dtype=np.uint16))
              for _ in range(8)]

    if server.pipe.needs_calibration():
        from handnet_tpu.nn.quant import npz_path
        if args.calib and os.path.exists(npz_path(args.calib)):
            server.load_calibration(args.calib)
        else:
            server.calibrate(
                np.stack([f[0] for f in frames]).astype(np.float32) / 255.0,
                np.stack([f[1] for f in frames]).astype(np.float32) / 1000.0)
            if args.calib:
                from handnet_tpu.nn.quant import save_calibration
                save_calibration(args.calib, server.variables)

    if args.compute_only:
        ceiling = server.compute_fps_probe(
            n_batches=max(args.frames // args.batch, 4))
        print(f"compute ceiling (device-staged, no transfer): "
              f"{ceiling:.1f} fps")
    server.start()

    def feeder(sid):
        for fid in range(args.frames // args.streams):
            rgb, dep = frames[(sid + fid) % len(frames)]
            server.submit(sid, fid, rgb, dep)

    threads = [threading.Thread(target=feeder, args=(s,))
               for s in range(args.streams)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    got = 0
    want = args.streams * (args.frames // args.streams)
    while got < want:
        server.get()
        got += 1
    dt = time.perf_counter() - t0
    for t in threads:
        t.join()
    server.stop()
    print(f"served {got} frames from {args.streams} host streams: "
          f"{got / dt:.1f} fps sustained")
    stats = server.latency_stats()
    print(f"per-frame latency (submit->result): p50 {stats['p50_ms']:.1f} "
          f"p90 {stats['p90_ms']:.1f} p99 {stats['p99_ms']:.1f} ms")
    if len(server.batch_buckets) > 1:
        print(f"bucket dispatches: {server.bucket_dispatches}")


if __name__ == "__main__":
    main()
