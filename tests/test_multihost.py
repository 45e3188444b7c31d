"""True multi-process (multi-"host") data parallelism, executed in-sandbox.

Round-2 review item 7 asked for a multi-host hook plus a documented (then
untestable) launch recipe. It IS testable: jax's distributed runtime works
across plain local processes with the gloo CPU-collectives backend, so this
test launches 2 worker processes (tests/multihost_worker.py) x 4 virtual
CPU devices each, lets ``runtime.setup()`` wire them into one 8-device
global namespace from the COORDINATOR_ADDRESS/PROCESS_ID/NUM_PROCESSES env
triple (the README's pod recipe), runs ONE mesh-sharded A2J train step with
per-process input shards, and asserts

  1. both processes compute the identical global loss (the gradient psum
     crossed the process boundary), and
  2. that loss matches the same global batch stepped on this process's own
     8-device single-process mesh — multi-process DP == single-process DP.

Reference equivalent: the latent DDP the reference never turned on
(config/a2j.yaml:5, utils/utils.py:53,82,106).
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # the workers pick their own platform/device-count via jax.config —
    # scrub the pytest harness's 8-device virtual-host flag and any
    # coordinator vars so they don't fight the worker's own settings
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "PROCESS_ID", "NUM_PROCESSES", "HANDNET_DISTRIBUTED"):
        env.pop(k, None)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch_workers(port: int, env: dict):
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(pid), "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return None, ["<timeout>"] * 2
    if any(p.returncode != 0 for p in procs) or any(
            "MHOK" not in o for o in outs):
        return None, outs
    return procs, outs


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process():
    env = _worker_env()
    # one retry: on a loaded 1-core sandbox the gloo rendezvous/coordinator
    # handshake can occasionally time out — a second attempt on a fresh
    # port distinguishes real breakage from scheduler pressure
    procs, outs = _launch_workers(_free_port(), env)
    if procs is None:
        procs, outs = _launch_workers(_free_port(), env)
    assert procs is not None, (
        f"multihost workers failed twice:\n--- w0:\n{outs[0][-3000:]}"
        f"\n--- w1:\n{outs[1][-3000:]}")

    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MHLOSS ")]
        assert line, out[-2000:]
        losses.append(float(line[-1].split()[1]))
    # gradient psum crossed the process boundary: identical global loss
    assert losses[0] == losses[1], losses

    # single-process comparison on this process's own 8 virtual devices,
    # identical global batch (multihost_worker.py builds the same seed-0
    # batch and feeds each half from its own process)
    import jax.numpy as jnp

    from handnet_tpu.config import A2JConfig, TrainConfig
    from handnet_tpu.parallel.mesh import create_mesh, shard_batch
    from handnet_tpu.train.trainer import A2JTrainer

    mesh = create_mesh(8)
    trainer = A2JTrainer(A2JConfig(crop_h=32, crop_w=32, num_joints=3),
                         TrainConfig(bf16=False), mesh=mesh,
                         steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 1))
                             .astype(np.float32)),
        "jt_uvd": jnp.asarray(rng.uniform(0, 32, size=(8, 3, 3))
                              .astype(np.float32)),
    })
    _, metrics = trainer.train_step(state, batch)
    expected = float(np.asarray(metrics["total_loss"]))
    # same 8-way partitioning; only the collective implementation differs
    # (gloo ring vs single-process XLA reduce), so agreement is tight
    np.testing.assert_allclose(losses[0], expected, rtol=1e-5)
