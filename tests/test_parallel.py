"""Multi-device data-parallel tests on the 8-device virtual CPU mesh —
the TPU analog of testing DDP without a cluster (SURVEY §4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import A2JConfig, TrainConfig
from handnet_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from handnet_tpu.train.trainer import A2JTrainer


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_devices(rng):
    mesh = create_mesh()
    batch = {"x": jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.num_devices == 8


def test_a2j_dp_train_step_matches_single_device(rng):
    """The mesh-sharded step must compute the same update as single-device:
    data parallelism is an implementation detail, not a semantics change."""
    model_cfg = A2JConfig(crop_h=32, crop_w=32, num_joints=3)
    train_cfg = TrainConfig(bf16=False, lr=1e-3)

    mesh = create_mesh(8)
    trainer_dp = A2JTrainer(model_cfg, train_cfg, mesh=mesh, steps_per_epoch=10)
    trainer_1 = A2JTrainer(model_cfg, train_cfg, mesh=None, steps_per_epoch=10)

    state_dp = trainer_dp.init_state(jax.random.PRNGKey(0))
    state_1 = trainer_1.init_state(jax.random.PRNGKey(0))

    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 1)).astype(np.float32)),
        "jt_uvd": jnp.asarray(rng.uniform(0, 32, size=(8, 3, 3)).astype(np.float32)),
    }
    batch_dp = shard_batch(mesh, batch)

    state_dp, metrics_dp = trainer_dp.train_step(state_dp, batch_dp)
    state_1, metrics_1 = trainer_1.train_step(state_1, batch)

    np.testing.assert_allclose(float(metrics_dp["total_loss"]),
                               float(metrics_1["total_loss"]), rtol=1e-4)
    # spot-check a parameter leaf. Cross-device psum changes fp reduction
    # order, so near-zero gradients can flip an Adam step's sign — allow up
    # to one lr-sized step of divergence on a few elements, but require the
    # bulk of the update to be identical.
    leaf_dp = np.asarray(jax.tree_util.tree_leaves(state_dp.params)[0])
    leaf_1 = np.asarray(jax.tree_util.tree_leaves(state_1.params)[0])
    diff = np.abs(leaf_dp - leaf_1)
    assert diff.max() <= 2.5 * train_cfg.lr
    assert np.mean(diff < 1e-5) > 0.8


def test_a2j_dp_step_runs_two_steps(rng):
    model_cfg = A2JConfig(crop_h=32, crop_w=32, num_joints=3)
    mesh = create_mesh(8)
    trainer = A2JTrainer(model_cfg, TrainConfig(bf16=False), mesh=mesh,
                         steps_per_epoch=10)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {
        "image": jnp.asarray(rng.normal(size=(16, 32, 32, 1)).astype(np.float32)),
        "jt_uvd": jnp.asarray(rng.uniform(0, 32, size=(16, 3, 3)).astype(np.float32)),
    }
    batch = shard_batch(mesh, batch)
    l0 = None
    for _ in range(2):
        state, metrics = trainer.train_step(state, batch)
        if l0 is None:
            l0 = float(metrics["total_loss"])
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["total_loss"]))


def test_dryrun_multichip_self_provisions_like_driver():
    """The driver imports __graft_entry__ with NO special env (sitecustomize
    pins jax to the 1-chip axon backend) and calls dryrun_multichip(8).
    Round 1 failed exactly here (MULTICHIP_r01.json rc=1) — lock it down by
    invoking the same path in a clean child with the virtual-mesh env
    stripped, which forces the self-provisioning re-exec."""
    import subprocess
    import sys
    import os

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    # Force the parent to see a 1-device CPU platform (stand-in for the
    # driver's 1-device axon backend) so the subprocess fallback triggers.
    env["XLA_FLAGS"] = (env["XLA_FLAGS"] +
                        " --xla_force_host_platform_device_count=1").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_fcos_batch_norm_stats_update():
    """backbone_norm='batch' must run a train-mode forward and thread the
    batch-stat updates into TrainState (regression: eval-mode forward left
    batch norm as identity forever)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from handnet_tpu.config import FCOSConfig, TrainConfig
    from handnet_tpu.train.trainer import FCOSTrainer

    cfg = FCOSConfig(num_classes=2, ext=False, image_h=64, image_w=96,
                     max_detections=4)
    trainer = FCOSTrainer(cfg, TrainConfig(bf16=False, lr=1e-3),
                          steps_per_epoch=10, backbone_norm="batch")
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = {
        "image": jnp.asarray(np.random.default_rng(0).uniform(
            size=(2, 64, 96, 3)).astype(np.float32)),
        "targets": {
            "boxes": jnp.asarray([[[10.0, 10, 40, 40]]] * 2),
            "labels": jnp.ones((2, 1), jnp.int32),
            "valid": jnp.ones((2, 1), bool),
            "box_info": jnp.zeros((2, 1, 5)),
        },
    }
    means_before = jax.tree_util.tree_leaves(
        {k: v for k, v in state.batch_stats.items()})
    new_state, _ = trainer.train_step(state, batch)
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(new_state.batch_stats)))
    assert moved > 0

    # frozen stays frozen
    ftr = FCOSTrainer(cfg, TrainConfig(bf16=False, lr=1e-3),
                      steps_per_epoch=10, backbone_norm="frozen")
    fstate = ftr.init_state(jax.random.PRNGKey(0))
    nstate, _ = ftr.train_step(fstate, batch)
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(fstate.batch_stats),
                        jax.tree_util.tree_leaves(nstate.batch_stats)))
    assert same
