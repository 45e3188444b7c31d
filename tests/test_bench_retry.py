"""bench.py tunnel-flap retry loop (round-5 hardening, VERDICT r4 item 1a).

The round-4 bench died on one 60 s probe while 480 s of budget went
unused; the retry loop must (a) pass straight through when the tunnel is
healthy, (b) keep probing in subprocesses while the remaining budget still
fits a warm measurement and return 'reexec' the moment a window opens,
(c) give up with 'down' — never hang — when the tunnel stays dead, and
(d) keep the global deadline anchored across the re-exec via BENCH_T0.

probe_device / subprocess.run are monkeypatched — no device work here.
"""

import os
import subprocess
import time

import pytest


@pytest.fixture
def bench_mod():
    import bench

    # module import happened at an arbitrary earlier time; re-anchor so
    # _remaining() reflects a run starting "now"
    old_t0 = bench._T0
    bench._T0 = time.perf_counter()
    yield bench
    bench._T0 = old_t0


def test_healthy_tunnel_passes_through(bench_mod, monkeypatch):
    calls = []
    monkeypatch.setattr("tools.tunnel_probe.probe_device",
                        lambda budget: (calls.append(budget) or (True, 1.2)))
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: pytest.fail("healthy path must not spawn probes"))
    assert bench_mod._probe_retry_loop(540.0) == "ok"
    assert len(calls) == 1


def test_dead_tunnel_returns_down_within_budget(bench_mod, monkeypatch):
    monkeypatch.setattr("tools.tunnel_probe.probe_device",
                        lambda budget: (False, "timeout"))

    class _RC:
        returncode = 1

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _RC())
    monkeypatch.setenv("BENCH_WARM_RUN_S", "0.5")
    t0 = time.perf_counter()
    assert bench_mod._probe_retry_loop(3.0) == "down"
    # loop must respect the deadline: all sleeps fit inside it
    assert time.perf_counter() - t0 < 4.0


def test_recovered_window_requests_reexec(bench_mod, monkeypatch):
    monkeypatch.setattr("tools.tunnel_probe.probe_device",
                        lambda budget: (False, "timeout"))
    rcs = iter([1, 0])  # first subprocess probe down, second finds a window

    class _RC:
        def __init__(self, rc):
            self.returncode = rc

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _RC(next(rcs)))
    monkeypatch.setenv("BENCH_WARM_RUN_S", "0.1")
    assert bench_mod._probe_retry_loop(60.0) == "reexec"


def test_wedged_probe_subprocess_counts_as_down(bench_mod, monkeypatch):
    """A child that neither exits nor answers (tunnel half-dead) must be
    treated as a failed attempt, not crash the loop."""
    monkeypatch.setattr("tools.tunnel_probe.probe_device",
                        lambda budget: (False, "timeout"))

    def _hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", _hang)
    monkeypatch.setenv("BENCH_WARM_RUN_S", "0.5")
    assert bench_mod._probe_retry_loop(3.0) == "down"


def test_deadline_anchor_survives_reexec(bench_mod):
    """BENCH_T0 is written once and _T0 is derived from it: a process that
    re-execs 100 s in sees 100 s already elapsed, not a fresh clock."""
    assert "BENCH_T0" in os.environ  # set at module import
    anchored = float(os.environ["BENCH_T0"])
    # simulate the re-exec'd process: same env anchor, later wall clock
    t0_new = time.perf_counter() - (time.time() - anchored)
    elapsed = time.perf_counter() - t0_new
    assert elapsed >= 0.0
    # _remaining under the anchored clock is <= a naive fresh clock's
    assert bench_mod._remaining(540.0) <= 540.0
