"""AOT serving-artifact export/load (handnet_tpu/export.py).

The deployment contract: an exported artifact must reproduce the live
pipeline bit-for-bit on the same backend, route any request size through
the pre-lowered bucket ladder, enforce its wire format, and serve through
PipelineServer.from_artifact without model code ever tracing.
(Reference deploy story being replaced: scripts/download_models.sh +
handnet_pipeline/handnet_pipeline.py:14-36 rebuild-and-load-state-dicts.)
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                PipelineConfig)
from handnet_tpu.export import (MANIFEST_NAME, ServingArtifact,
                                export_pipeline, flatten_tree,
                                unflatten_tree)
from handnet_tpu.models.pipeline import HandNetPipeline

CFG = HandNetConfig(
    a2j=A2JConfig(crop_h=48, crop_w=48, num_joints=21),
    fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8, num_classes=2),
    pipeline=PipelineConfig(crop_size=48),
)
HW = (48, 64)


def _frames(n, rng, quantized=False):
    rgb = rng.uniform(size=(n, *HW, 3)).astype(np.float32)
    depth = rng.uniform(0.3, 1.0, size=(n, *HW)).astype(np.float32)
    if quantized:
        return ((rgb * 255).astype(np.uint8),
                (depth * 1000).astype(np.uint16))
    return rgb, depth


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """One shared float artifact (buckets 2/4) + the live pipeline it must
    match."""
    pipe = HandNetPipeline(CFG)
    variables = pipe.init(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("aot") / "pipeline")
    export_pipeline(CFG, variables, out, buckets=(2, 4), frame_hw=HW,
                    dtype=jnp.float32, platforms=("tpu", "cpu"))
    pipe.a2j.decode_pallas = False  # match the artifact's portable decode
    return ServingArtifact.load(out), pipe, variables, out


def test_flatten_roundtrip():
    tree = {"a": {"b": np.arange(3.0), "c": {"d": np.ones((2, 2))}},
            "e": np.int32(7)}
    flat = flatten_tree(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])
    np.testing.assert_array_equal(back["e"], 7)


def test_artifact_matches_live_pipeline(artifact, rng):
    art, pipe, variables, _ = artifact
    rgb, depth = _frames(4, rng)
    got = art.predict(rgb, depth)
    ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
    assert set(got) == set(ref)
    for key in got:
        np.testing.assert_allclose(got[key], np.asarray(ref[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


def test_bucket_routing_pads_and_chunks(artifact, rng):
    """n=1 -> bucket 2 (padded); n=3 -> bucket 4; n=7 -> chunk 4 + pad->4.
    Padding rows must never leak into the returned frames."""
    art, pipe, variables, _ = artifact
    for n in (1, 3, 7):
        rgb, depth = _frames(n, rng)
        got = art.predict(rgb, depth)
        ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
        assert got["joints_uvd"].shape == (n, 21, 3)
        np.testing.assert_allclose(got["joints_uvd"],
                                   np.asarray(ref["joints_uvd"]),
                                   rtol=1e-6, atol=1e-6, err_msg=f"n={n}")


def test_manifest_and_config_roundtrip(artifact):
    art, _, _, out = artifact
    with open(os.path.join(out, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    assert manifest["buckets"] == [2, 4]
    assert manifest["platforms"] == ["tpu", "cpu"]
    assert art.config() == CFG


def test_wrong_geometry_rejected(artifact, rng):
    art, _, _, _ = artifact
    rgb = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    depth = rng.uniform(size=(2, 64, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="rgb must be"):
        art.predict(rgb, depth)


def test_quantized_wire_artifact(tmp_path, rng):
    """uint8/uint16 wire graphs must equal live dequantize-then-forward."""
    pipe = HandNetPipeline(CFG)
    variables = pipe.init(jax.random.PRNGKey(1))
    pipe.a2j.decode_pallas = False
    out = str(tmp_path / "qwire")
    export_pipeline(CFG, variables, out, buckets=(2,), frame_hw=HW,
                    dtype=jnp.float32, quantized_wire=True,
                    out_fields=("joints_uvd", "found"),
                    platforms=("cpu",))
    art = ServingArtifact.load(out)
    rgb_u8, depth_u16 = _frames(2, rng, quantized=True)
    got = art.predict(rgb_u8, depth_u16)
    assert set(got) == {"joints_uvd", "found"}  # out_fields honored
    ref = pipe(variables,
               jnp.asarray(rgb_u8.astype(np.float32) / 255.0),
               jnp.asarray(depth_u16.astype(np.float32) / 1000.0))
    np.testing.assert_allclose(got["joints_uvd"],
                               np.asarray(ref["joints_uvd"]),
                               rtol=1e-6, atol=1e-6)


def test_with_xyz_artifact_requires_paras(tmp_path, rng):
    pipe = HandNetPipeline(CFG)
    variables = pipe.init(jax.random.PRNGKey(2))
    pipe.a2j.decode_pallas = False
    out = str(tmp_path / "xyz")
    export_pipeline(CFG, variables, out, buckets=(2,), frame_hw=HW,
                    dtype=jnp.float32, with_xyz=True, platforms=("cpu",))
    art = ServingArtifact.load(out)
    rgb, depth = _frames(2, rng)
    paras = np.tile([600.0, 600.0, 32.0, 24.0], (2, 1)).astype(np.float32)
    got = art.predict(rgb, depth, paras)
    ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth),
               jnp.asarray(paras))
    np.testing.assert_allclose(got["joints_xyz"],
                               np.asarray(ref["joints_xyz"]),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="requires paras"):
        art.predict(rgb, depth)


def test_static_int8_export_requires_calibration(tmp_path):
    qcfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, quant="static"),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, quant="static"),
        pipeline=PipelineConfig(crop_size=48),
    )
    pipe = HandNetPipeline(qcfg)
    variables = pipe.init(jax.random.PRNGKey(3))
    with pytest.raises(ValueError, match="calibrat"):
        export_pipeline(qcfg, variables, str(tmp_path / "q"), buckets=(2,),
                        frame_hw=HW, dtype=jnp.float32, platforms=("cpu",))


def test_static_int8_calibrated_export_matches(tmp_path, rng):
    qcfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, quant="static"),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, quant="static"),
        pipeline=PipelineConfig(crop_size=48),
    )
    pipe = HandNetPipeline(qcfg)
    variables = pipe.init(jax.random.PRNGKey(3))
    rgb, depth = _frames(2, rng)
    variables = pipe.calibrate(variables, jnp.asarray(rgb),
                               jnp.asarray(depth))
    out = str(tmp_path / "q")
    export_pipeline(qcfg, variables, out, buckets=(2,), frame_hw=HW,
                    dtype=jnp.float32, platforms=("cpu",))
    art = ServingArtifact.load(out)
    pipe.a2j.decode_pallas = False
    got = art.predict(rgb, depth)
    ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
    np.testing.assert_allclose(got["joints_uvd"],
                               np.asarray(ref["joints_uvd"]),
                               rtol=1e-6, atol=1e-6)


def test_gn_fast_variance_exports_portable(tmp_path, rng):
    """The shipped serving GN path (gn_fast_variance, pure XLA) must export
    for non-TPU platforms and reproduce the live pipeline exactly — the
    Mosaic-only pallas GN kernel lost in-pipeline and its flag is gone
    (tools/bench_gn_matrix.py), so portability holds for every config."""
    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48),
        fcos=FCOSConfig(image_h=64, image_w=96, max_detections=8,
                        num_classes=2, gn_fast_variance=True),
        pipeline=PipelineConfig(crop_size=48),
    )
    pipe = HandNetPipeline(cfg, dtype=jnp.float32)
    variables = pipe.init(jax.random.PRNGKey(3))
    rgb = rng.uniform(size=(2, *HW, 3)).astype(np.float32)
    depth = rng.uniform(0.3, 1.0, size=(2, *HW)).astype(np.float32)
    out = str(tmp_path / "gnfv")
    export_pipeline(cfg, variables, out, buckets=(2,), frame_hw=HW,
                    dtype=jnp.float32, platforms=("cpu",))
    art = ServingArtifact.load(out)
    pipe.a2j.decode_pallas = False
    got = art.predict(rgb, depth)
    ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
    np.testing.assert_allclose(got["joints_uvd"],
                               np.asarray(ref["joints_uvd"]),
                               rtol=1e-6, atol=1e-6)


def test_server_from_artifact(artifact, rng):
    """PipelineServer.from_artifact serves the exported graphs end-to-end:
    results equal the live pipeline, the ladder and wire format come from
    the manifest."""
    from handnet_tpu.apps.serve import PipelineServer

    art, pipe, variables, out = artifact
    server = PipelineServer.from_artifact(
        out, out_fields=("joints_uvd", "found"), flush_timeout=0.001)
    assert server.batch_buckets == (2, 4)
    assert server.frame_hw == HW
    rgb, depth = _frames(3, rng)
    server.start()
    try:
        for i in range(3):
            server.submit(0, i, rgb[i], depth[i])
        results = {}
        for _ in range(3):
            _, fid, res = server.get(timeout=60)
            assert "error" not in res
            results[fid] = res
    finally:
        server.stop()
    ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
    for i in range(3):
        np.testing.assert_allclose(results[i]["joints_uvd"],
                                   np.asarray(ref["joints_uvd"][i]),
                                   rtol=1e-6, atol=1e-6)


def test_server_from_artifact_rejects_unexported_field(tmp_path, rng):
    from handnet_tpu.apps.serve import PipelineServer

    pipe = HandNetPipeline(CFG)
    variables = pipe.init(jax.random.PRNGKey(4))
    out = str(tmp_path / "nofield")
    export_pipeline(CFG, variables, out, buckets=(2,), frame_hw=HW,
                    dtype=jnp.float32, out_fields=("joints_uvd",),
                    platforms=("cpu",))
    with pytest.raises(ValueError, match="does not emit"):
        PipelineServer.from_artifact(out, out_fields=("joints_uvd", "boxes"))


def test_pad_exceeds_partial_batch(tmp_path, rng):
    """bucket 4, n=1 -> pad 3 > n. The original zeros_like(rgb[:pad])
    under-padded whenever pad > n (it can only yield n rows), which the
    CPU smoke's small buckets never hit — caught by the first real-TPU
    artifact run (round 5, bucket 8 / n 3: 'expected (8,...) called with
    (6,...)'). Padding rows must also never leak into the output."""
    pipe = HandNetPipeline(CFG)
    variables = pipe.init(jax.random.PRNGKey(0))
    out = str(tmp_path / "pipeline")
    export_pipeline(CFG, variables, out, buckets=(4,), frame_hw=HW,
                    dtype=jnp.float32, platforms=("cpu",))
    art = ServingArtifact.load(out)
    pipe.a2j.decode_pallas = False  # match the artifact's portable decode
    rgb, depth = _frames(1, rng)
    got = art.predict(rgb, depth)
    assert got["joints_uvd"].shape == (1, 21, 3)
    ref = pipe(variables, jnp.asarray(rgb), jnp.asarray(depth))
    np.testing.assert_allclose(got["joints_uvd"],
                               np.asarray(ref["joints_uvd"]),
                               rtol=1e-6, atol=1e-6)
