"""Fused pipeline plumbing test (synthetic end-to-end, SURVEY §4 item 3):
verify the detect -> select -> pad -> crop -> pose handoff as one jitted graph,
including the "no hand" masked path (handnet_pipeline.py:81-83,107-108)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                PipelineConfig)
from handnet_tpu.models.pipeline import HandNetPipeline

CFG = HandNetConfig(
    a2j=A2JConfig(crop_h=48, crop_w=48, num_joints=21),
    fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8, num_classes=2),
    pipeline=PipelineConfig(crop_size=48),
)


@pytest.fixture(scope="module")
def pipeline():
    pipe = HandNetPipeline(CFG)
    variables = pipe.init(jax.random.PRNGKey(0))
    return pipe, variables


def test_pipeline_runs_and_shapes(pipeline, rng):
    pipe, variables = pipeline
    images = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(2, 48, 64)).astype(np.float32))
    paras = jnp.asarray(np.tile([600.0, 600.0, 32.0, 24.0], (2, 1)).astype(np.float32))

    fwd = jax.jit(lambda v, im, d, p: pipe(v, im, d, p))
    out = fwd(variables, images, depth, paras)

    assert out["joints_uvd"].shape == (2, 21, 3)
    assert out["joints_xyz"].shape == (2, 21, 3)
    assert out["boxes"].shape == (2, 4)
    assert out["crops"].shape == (2, 48, 48, 1)
    assert out["found"].shape == (2,)
    assert np.isfinite(np.asarray(out["joints_uvd"])).all()


def test_pipeline_not_found_zeroes(pipeline, rng):
    """Random init detector almost surely finds nothing at threshold 0.7 —
    outputs must be zeroed like the reference's empty-detection path."""
    pipe, variables = pipeline
    images = jnp.zeros((1, 48, 64, 3))
    depth = jnp.ones((1, 48, 64))
    out = pipe(variables, images, depth)
    found = bool(np.asarray(out["found"])[0])
    if not found:
        np.testing.assert_allclose(np.asarray(out["joints_uvd"]), 0.0)


def test_pipeline_crop_follows_box(pipeline, rng):
    """Force a detection by lowering the score threshold to 0 and check that
    the crop content comes from inside the selected (padded) box."""
    cfg = HandNetConfig(
        a2j=CFG.a2j,
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, score_thresh=0.0),
        pipeline=CFG.pipeline,
    )
    pipe = HandNetPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(1))
    images = jnp.asarray(rng.uniform(size=(1, 48, 64, 3)).astype(np.float32))
    # depth encodes column index so we can verify the gather source
    depth = jnp.tile(jnp.arange(64, dtype=jnp.float32)[None, None, :],
                     (1, 48, 1))
    out = pipe(variables, images, depth)
    assert bool(np.asarray(out["found"])[0])
    box = np.asarray(out["boxes"])[0]
    crop = np.asarray(out["crops"])[0, :, :, 0]
    assert crop.min() >= box[0] - 1e-5
    assert crop.max() <= box[2] + 1e-5
