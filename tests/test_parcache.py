"""Host-side seed-params cache (utils/parcache.py, round 5).

bench.py and every windowed TPU tool (bench_gn_matrix, aot_tpu_check,
latency_probe) share one cached seed-0 tree so (a) measurements compare
across tools and (b) a tunnel window is never spent on random-init.
"""

import dataclasses

import numpy as np
import pytest

from handnet_tpu.config import (A2JConfig, FCOSConfig, HandNetConfig,
                                PipelineConfig)
from handnet_tpu.models.pipeline import HandNetPipeline
from handnet_tpu.utils import parcache


@pytest.fixture
def tiny_cfg():
    return HandNetConfig(
        fcos=FCOSConfig(num_classes=2, ext=False, image_h=64, image_w=96,
                        max_detections=4),
        a2j=A2JConfig(crop_h=32, crop_w=32),
        pipeline=PipelineConfig(crop_size=32))


def test_build_then_cache_hit(tiny_cfg, tmp_path, monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(parcache, "CACHE_ROOT", str(tmp_path))
    pipe = HandNetPipeline(tiny_cfg, dtype=jnp.float32)
    notes = []
    v1 = parcache.seed_params(pipe, tiny_cfg, "float32", status=notes.append)
    assert any("built and cached" in n for n in notes)

    notes.clear()
    v2 = parcache.seed_params(pipe, tiny_cfg, "float32", status=notes.append)
    assert any("loaded cached" in n for n in notes)

    import jax

    leaves1 = jax.tree_util.tree_leaves(v1)
    leaves2 = jax.tree_util.tree_leaves(v2)
    assert len(leaves1) == len(leaves2) > 0
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_key_tracks_config_and_dtype(tiny_cfg, tmp_path, monkeypatch):
    monkeypatch.setattr(parcache, "CACHE_ROOT", str(tmp_path))
    p1 = parcache.cache_path(tiny_cfg, "bfloat16")
    p2 = parcache.cache_path(tiny_cfg, "float32")
    other = dataclasses.replace(
        tiny_cfg, fcos=dataclasses.replace(tiny_cfg.fcos, image_h=96))
    p3 = parcache.cache_path(other, "bfloat16")
    assert len({p1, p2, p3}) == 3
    assert parcache.cache_path(tiny_cfg, "bfloat16") == p1  # deterministic


def test_corrupt_cache_rebuilds(tiny_cfg, tmp_path, monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(parcache, "CACHE_ROOT", str(tmp_path))
    path = parcache.cache_path(tiny_cfg, "float32")
    with open(path, "wb") as f:
        f.write(b"not msgpack")
    pipe = HandNetPipeline(tiny_cfg, dtype=jnp.float32)
    notes = []
    v = parcache.seed_params(pipe, tiny_cfg, "float32", status=notes.append)
    assert any("unusable" in n for n in notes)
    assert any("built and cached" in n for n in notes)
    assert len(v) > 0
