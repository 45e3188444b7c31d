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
    # snapshot to host BEFORE the step: train_step donates its input state
    bs_before = [np.asarray(l) for l in
                 jax.tree_util.tree_leaves(state.batch_stats)]
    new_state, _ = trainer.train_step(state, batch)
    moved = sum(
        float(np.abs(a - np.asarray(b)).sum()) > 0
        for a, b in zip(bs_before,
                        jax.tree_util.tree_leaves(new_state.batch_stats)))
    assert moved > 0

    # frozen stays frozen
    ftr = FCOSTrainer(cfg, TrainConfig(bf16=False, lr=1e-3),
                      steps_per_epoch=10, backbone_norm="frozen")
    fstate = ftr.init_state(jax.random.PRNGKey(0))
    fbs_before = [np.asarray(l) for l in
                  jax.tree_util.tree_leaves(fstate.batch_stats)]
    nstate, _ = ftr.train_step(fstate, batch)
    same = all(
        np.array_equal(a, np.asarray(b))
        for a, b in zip(fbs_before,
                        jax.tree_util.tree_leaves(nstate.batch_stats)))
    assert same


def test_a2j_dp_train_step_tight_equivalence(rng):
    """Strict DP == single-device check, built to catch reduction-semantics
    bugs (e.g. a wrong psum denominator) that the looser sign-flip-tolerant
    test above would miss. SGD makes the update LINEAR in the gradient, so
    the per-leaf UPDATE VECTOR (params_after - params_before) must agree in
    norm and direction: a wrong mean/sum denominator scales it 8x (700%
    relative error), while GSPMD's different conv partitioning/accumulation
    order only perturbs f32 gradients at the ~2% level (measured; elementwise
    atol is the wrong gate for deep nets under different XLA partitionings).
    Adam can't give this property — its sign(g)-like first step flips on
    dead-unit gradients regardless of target scale, which is exactly what
    the looser test tolerates."""
    model_cfg = A2JConfig(crop_h=32, crop_w=32, num_joints=3)
    train_cfg = TrainConfig(bf16=False, lr=1e-3, weight_decay=0.0,
                            optimizer="sgd")

    mesh = create_mesh(8)
    trainer_dp = A2JTrainer(model_cfg, train_cfg, mesh=mesh,
                            steps_per_epoch=10)
    trainer_1 = A2JTrainer(model_cfg, train_cfg, mesh=None,
                           steps_per_epoch=10)
    state_dp = trainer_dp.init_state(jax.random.PRNGKey(0))
    state_1 = trainer_1.init_state(jax.random.PRNGKey(0))

    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 1))
                             .astype(np.float32)),
        # targets at ~10x the crop scale -> large, same-sign gradients
        "jt_uvd": jnp.asarray(rng.uniform(200, 320, size=(8, 3, 3))
                              .astype(np.float32)),
    }
    init_leaves = [np.asarray(l)
                   for l in jax.tree_util.tree_leaves(state_1.params)]
    state_dp, m_dp = trainer_dp.train_step(state_dp, shard_batch(mesh, batch))
    state_1, m_1 = trainer_1.train_step(state_1, batch)

    np.testing.assert_allclose(float(m_dp["total_loss"]),
                               float(m_1["total_loss"]), rtol=1e-6)
    upds = []
    for leaf_dp, leaf_1, leaf_0 in zip(
            jax.tree_util.tree_leaves(state_dp.params),
            jax.tree_util.tree_leaves(state_1.params), init_leaves):
        upds.append((np.asarray(leaf_dp).ravel() - leaf_0.ravel(),
                     np.asarray(leaf_1).ravel() - leaf_0.ravel()))
    g_dp = np.concatenate([a for a, _ in upds])
    g_1 = np.concatenate([b for _, b in upds])
    g_norm = float(np.linalg.norm(g_1))
    assert g_norm > 0
    # Global direction + magnitude: a wrong denominator scales by 8 (700%
    # error). Measured noise floor on this graph: ~2% — XLA compiles
    # different conv algorithms for per-device batch 1 vs batch 8, and the
    # f32 accumulation differences compound through the 50-layer backbone.
    # 5% keeps >100x separation from the bug signal.
    assert float(np.linalg.norm(g_dp - g_1)) / g_norm < 0.05
    assert abs(float(np.linalg.norm(g_dp)) / g_norm - 1.0) < 0.02
    # per-leaf norm ratio wherever the update is substantial (tiny-update
    # leaves are pure accumulation noise and carry no denominator signal)
    for upd_dp, upd_1 in upds:
        n1 = float(np.linalg.norm(upd_1))
        if n1 < 1e-3 * g_norm:
            continue
        ratio = float(np.linalg.norm(upd_dp)) / n1
        assert abs(ratio - 1.0) < 0.05, (ratio, upd_1.shape)


def test_pipeline_inference_sharded_matches_single_device(rng):
    """The flagship serving graph batch-sharded over the 8-device mesh must
    produce exactly the single-device outputs — the basis of the 'serving
    scales by adding chips' claim (VERDICT r2 item 3). score_thresh=0 keeps
    random weights on the found=True path so the full detect->crop->pose
    graph runs with real numbers."""
    from handnet_tpu.config import (FCOSConfig, HandNetConfig,
                                    PipelineConfig)
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.parallel.mesh import data_sharding, replicate

    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48),
        fcos=FCOSConfig(num_classes=3, ext=False, image_h=64, image_w=96,
                        score_thresh=0.0, max_detections=8),
        pipeline=PipelineConfig(crop_size=48))
    pipe = HandNetPipeline(cfg, dtype=jnp.float32)
    variables = pipe.init(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.uniform(size=(8, 64, 96, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.3, 1.0, size=(8, 64, 96))
                         .astype(np.float32))

    fwd = jax.jit(lambda v, im, d: pipe(v, im, d))
    ref = fwd(variables, images, depths)

    mesh = create_mesh(8)
    shard = data_sharding(mesh)
    out = fwd(replicate(mesh, variables),
              jax.device_put(images, shard), jax.device_put(depths, shard))
    assert out["joints_uvd"].sharding.num_devices == 8
    assert bool(np.asarray(out["found"]).all())
    for key in ("joints_uvd", "boxes", "scores", "found"):
        np.testing.assert_allclose(np.asarray(out[key]),
                                   np.asarray(ref[key]),
                                   rtol=1e-5, atol=1e-5, err_msg=key)


@pytest.mark.skipif((__import__("os").cpu_count() or 1) < 4,
                    reason="scaling wall-clock needs >=4 physical cores; "
                           "virtual devices share cores below that")
def test_pipeline_sharded_scaling_sanity(rng):
    """8-device wall-clock should beat 1-device on the same total batch when
    real parallel hardware exists under the virtual mesh (>=4 cores)."""
    import time

    from handnet_tpu.config import (FCOSConfig, HandNetConfig,
                                    PipelineConfig)
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.parallel.mesh import data_sharding, replicate

    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48),
        fcos=FCOSConfig(num_classes=3, ext=False, image_h=96, image_w=128,
                        score_thresh=0.0, max_detections=8),
        pipeline=PipelineConfig(crop_size=48))
    pipe = HandNetPipeline(cfg, dtype=jnp.float32)
    variables = pipe.init(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.uniform(size=(16, 96, 128, 3))
                         .astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.3, 1.0, size=(16, 96, 128))
                         .astype(np.float32))
    fwd = jax.jit(lambda v, im, d: pipe(v, im, d)["joints_uvd"])

    def timed(v, im, d, iters=3):
        jax.block_until_ready(fwd(v, im, d))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fwd(v, im, d))
        return (time.perf_counter() - t0) / iters

    t1 = timed(variables, images, depths)
    mesh = create_mesh(8)
    shard = data_sharding(mesh)
    t8 = timed(replicate(mesh, variables), jax.device_put(images, shard),
               jax.device_put(depths, shard))
    # conservative: demand any real speedup, not the ideal 8x
    assert t8 < t1 / 2, (t1, t8)
