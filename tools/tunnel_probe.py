"""Axon-tunnel health probe — the CLAUDE.md-prescribed pre-flight check.

The remote TPU tunnel can go down for hours; when it does, even a tiny
matmul readback hangs (no error, no timeout from jax itself). Every long
TPU run must probe first. This module provides the probe as a library
(used by bench.py to fail fast with a parse-able JSON line instead of a
driver rc=124) and as a CLI.

The probe runs device work in a daemon thread with a hard wall-clock
budget: compile+execute a tiny matmul and force a HOST READBACK
(`np.asarray`), which cannot complete early (tools/bench_clock_check.py
— `block_until_ready` can return before remote execution finishes for
small graphs on this backend). Healthy round trip is <5 s; default
budget 30 s leaves slack for a cold backend.

Usage:
    from tools.tunnel_probe import probe_device
    ok, detail = probe_device(timeout_s=30.0)

    $ python tools/tunnel_probe.py [timeout_s]
"""

from __future__ import annotations

import sys
import threading
import time


def probe_device(timeout_s: float = 30.0):
    """Return (ok, detail). Never raises; never blocks past timeout_s.

    ok=True  -> the default jax backend completed a matmul + host
                readback inside the budget (detail = seconds taken).
    ok=False -> the probe hung past the budget or raised
                (detail = "timeout" or the exception repr). On a hung
                probe the daemon thread is abandoned — the caller must
                exit promptly rather than start more device work.
    """
    result = {}

    def _work():
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            t0 = time.perf_counter()
            x = jnp.ones((128, 128), dtype=jnp.bfloat16)
            y = jnp.dot(x, x)
            val = float(np.asarray(y[0, 0]))  # forced host readback
            result["ok"] = True
            result["detail"] = round(time.perf_counter() - t0, 2)
            result["value"] = val
        except Exception as e:  # pragma: no cover - backend-dependent
            result["ok"] = False
            result["detail"] = repr(e)

    th = threading.Thread(target=_work, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        return False, "timeout"
    return result.get("ok", False), result.get("detail", "unknown")


def main():
    import os

    timeout_s = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    ok, detail = probe_device(timeout_s)
    print(f"tunnel_ok={ok} detail={detail}", flush=True)
    # hard exit: normal interpreter teardown races the abandoned daemon
    # thread stuck inside the backend ("FATAL: exception not rethrown")
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
