"""bench.py tunnel-flap retry loop (round-5 hardening, VERDICT r4 item 1a).

The round-4 bench died on one 60 s probe while 480 s of budget went
unused; round 5 restructured the flow so every probe runs in a SUBPROCESS
(this process's backend client must never issue a device op before a probe
has passed — a hung in-process readback would wedge the client the
measurement needs, which is what forced round 4's re-exec dance) and the
loop must (a) return 'ok' the moment a probe subprocess succeeds,
(b) keep probing while the remaining budget still fits a warm measurement,
(c) give up with 'down' — never hang — when the tunnel stays dead,
(d) keep the global deadline anchored across processes via BENCH_T0, and
(e) skip probing entirely under BENCH_ASSUME_UP=1 (the window queue just
probed; in-window seconds are the scarce resource).

subprocess.run is monkeypatched — no device work here.
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


class _RC:
    def __init__(self, rc):
        self.returncode = rc


def test_healthy_tunnel_one_subprocess_probe(bench_mod, monkeypatch):
    calls = []
    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: (calls.append(a) or _RC(0)))
    # the in-process probe path must be gone entirely
    monkeypatch.setattr(
        "tools.tunnel_probe.probe_device",
        lambda budget: pytest.fail("probe must never run in-process"))
    assert bench_mod._probe_retry_loop(540.0) == "ok"
    assert len(calls) == 1


def test_dead_tunnel_returns_down_within_budget(bench_mod, monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _RC(1))
    monkeypatch.setenv("BENCH_WARM_RUN_S", "0.5")
    t0 = time.perf_counter()
    assert bench_mod._probe_retry_loop(3.0) == "down"
    # loop must respect the deadline: all sleeps fit inside it
    assert time.perf_counter() - t0 < 4.0


def test_recovered_window_returns_ok(bench_mod, monkeypatch):
    rcs = iter([1, 0])  # first subprocess probe down, second finds a window
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _RC(next(rcs)))
    monkeypatch.setenv("BENCH_WARM_RUN_S", "0.1")
    assert bench_mod._probe_retry_loop(60.0) == "ok"


def test_wedged_probe_subprocess_counts_as_down(bench_mod, monkeypatch):
    """A child that neither exits nor answers (tunnel half-dead) must be
    treated as a failed attempt, not crash the loop."""

    def _hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k["timeout"])

    monkeypatch.setattr(subprocess, "run", _hang)
    monkeypatch.setenv("BENCH_WARM_RUN_S", "0.5")
    assert bench_mod._probe_retry_loop(3.0) == "down"


def test_assume_up_skips_probing(bench_mod, monkeypatch):
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: pytest.fail("BENCH_ASSUME_UP must not probe"))
    monkeypatch.setenv("BENCH_ASSUME_UP", "1")
    assert bench_mod._probe_verdict(540.0) == "ok"


def test_no_assume_up_delegates_to_retry_loop(bench_mod, monkeypatch):
    monkeypatch.delenv("BENCH_ASSUME_UP", raising=False)
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _RC(0))
    assert bench_mod._probe_verdict(540.0) == "ok"


def test_deadline_anchor_survives_child_processes(bench_mod):
    """BENCH_T0 is written once and _T0 is derived from it: a process that
    starts 100 s into the budget sees 100 s already elapsed, not a fresh
    clock."""
    assert "BENCH_T0" in os.environ  # set at module import
    anchored = float(os.environ["BENCH_T0"])
    # simulate a later process: same env anchor, later wall clock
    t0_new = time.perf_counter() - (time.time() - anchored)
    elapsed = time.perf_counter() - t0_new
    assert elapsed >= 0.0
    # _remaining under the anchored clock is <= a naive fresh clock's
    assert bench_mod._remaining(540.0) <= 540.0
