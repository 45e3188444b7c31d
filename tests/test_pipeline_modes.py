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
