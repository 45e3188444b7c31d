"""Pipeline RGBD mode + detector-only / pose-only entries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                PipelineConfig)
from handnet_tpu.models.pipeline import HandNetPipeline


@pytest.fixture(scope="module")
def rgbd_pipe():
    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, num_joints=21, in_channels=4),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2),
        pipeline=PipelineConfig(crop_size=48, rgbd=True),
    )
    pipe = HandNetPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    return pipe, variables


def test_rgbd_pipeline_runs(rgbd_pipe, rng):
    pipe, variables = rgbd_pipe
    images = jnp.asarray(rng.uniform(size=(1, 48, 64, 3)).astype(np.float32))
    rgbd = jnp.asarray(rng.uniform(size=(1, 48, 64, 4)).astype(np.float32))
    out = pipe(variables, images, rgbd)
    assert out["crops"].shape == (1, 48, 48, 4)
    assert out["joints_uvd"].shape == (1, 21, 3)


def test_detect_and_pose_entries(rgbd_pipe, rng):
    pipe, variables = rgbd_pipe
    images = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    det = pipe.detect(variables, images)
    assert det["boxes"].shape == (2, 8, 4)
    crops = jnp.asarray(rng.uniform(size=(2, 48, 48, 4)).astype(np.float32))
    uvd = pipe.pose(variables, crops)
    assert uvd.shape == (2, 21, 3)
    assert np.isfinite(np.asarray(uvd)).all()


def test_fused_mesh_pipeline(rng):
    """pipeline.with_mesh: one jitted graph frame -> joints -> 778-vert mesh
    (the reference lifts per-frame on the host, ros_demo.py:131-168)."""
    from handnet_tpu.models.pose2mesh import (
        Pose2Mesh, normalize_joints_for_pose2mesh,
        normalize_joints_for_pose2mesh_batched)

    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, num_joints=21),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, score_thresh=0.0),
        pipeline=PipelineConfig(crop_size=48, with_mesh=True),
    )
    pipe = HandNetPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    assert "pose2mesh" in variables

    images = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(2, 48, 64)).astype(np.float32))
    paras = jnp.asarray([[600.0, 600.0, 32.0, 24.0]] * 2)
    out = pipe(variables, images, depth, paras)
    assert out["verts"].shape == (2, 778, 3)
    assert out["verts_xyz"].shape == (2, 778, 3)
    assert np.isfinite(np.asarray(out["verts"])).all()
    assert np.isfinite(np.asarray(out["verts_xyz"])).all()
    assert out["joints_uvd_full"].shape == (2, 21, 3)

    found = np.asarray(out["found"])
    for b in range(2):
        if not found[b]:
            # masked no-hand frames emit zero (not NaN) mesh rows
            assert np.abs(np.asarray(out["verts"][b])).max() == 0.0
            continue
        # fused == host-staged: same normalize + Pose2Mesh on the emitted uv
        uv = np.asarray(out["joints_uvd"][b, :, :2])
        norm_host = normalize_joints_for_pose2mesh(uv)
        mesh_host, _ = pipe.pose2mesh.apply(variables["pose2mesh"],
                                            jnp.asarray(norm_host[None]))
        verts_host = np.asarray(mesh_host[0])[pipe._pyramid.perm_reverse[:778]]
        np.testing.assert_allclose(np.asarray(out["verts"][b]), verts_host,
                                   atol=1e-4)
        # verts_xyz anchors the mm-scaled mesh at the predicted wrist
        np.testing.assert_allclose(
            np.asarray(out["verts_xyz"][b]),
            verts_host * 1000.0 + np.asarray(out["joints_xyz"][b, :1]),
            atol=1e-2)

    # the batched in-graph normalize matches the host helper on real joints
    j = rng.uniform(10, 150, size=(3, 21, 2)).astype(np.float32)
    batched = np.asarray(normalize_joints_for_pose2mesh_batched(
        jnp.asarray(j)))
    for b in range(3):
        np.testing.assert_allclose(batched[b],
                                   normalize_joints_for_pose2mesh(j[b]),
                                   atol=1e-4)


def test_fused_mesh_with_static_quant(rng):
    """quant='static' composes with pipeline.with_mesh: calibrate() skips
    the mesh head (nothing feeds back into the conv scales from it) and the
    fused mesh forward serves finite, properly-masked outputs."""
    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, num_joints=21, quant="static"),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, score_thresh=0.0, quant="static"),
        pipeline=PipelineConfig(crop_size=48, with_mesh=True),
    )
    pipe = HandNetPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(2, 48, 64)).astype(np.float32))
    variables = pipe.calibrate(variables, images, depth)
    from handnet_tpu.nn.quant import assert_calibrated
    assert_calibrated(variables)
    paras = jnp.asarray([[600.0, 600.0, 32.0, 24.0]] * 2)
    out = jax.jit(lambda v, im, d, p: pipe(v, im, d, p))(
        variables, images, depth, paras)
    assert out["verts"].shape == (2, 778, 3)
    assert np.isfinite(np.asarray(out["verts"])).all()
    assert np.isfinite(np.asarray(out["verts_xyz"])).all()
    found = np.asarray(out["found"])
    for b in range(2):
        if not found[b]:
            assert np.abs(np.asarray(out["verts"][b])).max() == 0.0
