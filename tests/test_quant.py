"""Dynamic-int8 serving path (nn/quant.py + the `quant` config flags).

The contract under test: QuantConv is a drop-in nn.Conv substitute — the
SAME parameter tree (train full-precision, flip quant on to serve), outputs
within quantization noise of the float conv, and every model that takes the
flag runs end to end with it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from handnet_tpu.config import A2JConfig, FCOSConfig, load_config
from handnet_tpu.nn.quant import QuantConv, quantize_symmetric


def test_quantconv_param_tree_matches_nn_conv():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 16))
    for kwargs in (
        dict(features=32, kernel_size=(3, 3), padding=1),
        dict(features=32, kernel_size=(1, 1), strides=2, use_bias=False),
        dict(features=8, kernel_size=(3, 3), padding=2, kernel_dilation=2),
    ):
        pf = nn.Conv(**kwargs).init(rng, x)["params"]
        pq = QuantConv(**kwargs).init(rng, x)["params"]
        assert jax.tree.structure(pf) == jax.tree.structure(pq)
        for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pq)):
            assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.parametrize("kwargs", [
    dict(features=32, kernel_size=(3, 3), padding=1),
    dict(features=32, kernel_size=(3, 3), padding=2, kernel_dilation=2),
    dict(features=16, kernel_size=(1, 1), strides=2, use_bias=False),
    dict(features=16, kernel_size=(3, 3)),  # default SAME padding
])
def test_quantconv_close_to_float_conv(kwargs):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 24)), jnp.float32)
    conv_f = nn.Conv(**kwargs)
    variables = conv_f.init(jax.random.PRNGKey(1), x)
    ref = conv_f.apply(variables, x)
    out = QuantConv(**kwargs).apply(variables, x)
    assert out.shape == ref.shape
    # int8 symmetric quant of both operands: relative error ~1e-2 at these
    # magnitudes; gate well above noise, well below "wrong semantics"
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_quantize_symmetric_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 5, 5, 8)) * 7.0, jnp.float32)
    q, scale = quantize_symmetric(x, axes=(1, 2, 3))
    assert q.dtype == jnp.int8 and scale.shape == (4, 1, 1, 1)
    err = float(jnp.max(jnp.abs(q * scale - x)))
    assert err <= float(scale.max()) * 0.5 + 1e-6  # round-to-nearest bound
    # zero input does not divide by zero
    q0, s0 = quantize_symmetric(jnp.zeros((1, 2, 2, 2)), axes=(1, 2, 3))
    assert int(jnp.abs(q0).max()) == 0 and np.isfinite(float(s0[0, 0, 0, 0]))


def test_fcos_quant_forward_reuses_float_params():
    from handnet_tpu.models.fcos import FCOS

    cfg = FCOSConfig(num_classes=2, ext=False, image_h=64, image_w=96,
                     max_detections=8)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 64, 96, 3)),
                    jnp.float32)
    model_f = FCOS(cfg=cfg, backbone_norm="frozen")
    variables = model_f.init(jax.random.PRNGKey(0), x)
    ref = model_f.apply(variables, x)
    model_q = FCOS(cfg=dataclasses.replace(cfg, quant=True),
                   backbone_norm="frozen")
    out = model_q.apply(variables, x)  # SAME variables — no conversion step
    assert set(out) == set(ref)
    for k in ref:
        assert out[k].shape == ref[k].shape
        assert bool(jnp.isfinite(out[k]).all())
    # quantization noise must not be semantic-level: raw logits stay close
    # relative to their dynamic range
    span = float(ref["cls_logits"].max() - ref["cls_logits"].min()) + 1e-6
    drift = float(jnp.abs(out["cls_logits"] - ref["cls_logits"]).mean())
    assert drift / span < 0.1, (drift, span)


def test_a2j_quant_forward_reuses_float_params():
    from handnet_tpu.models.a2j import A2J

    cfg = A2JConfig(crop_h=32, crop_w=32)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 32, 32, 1)),
                    jnp.float32)
    model_f = A2J(cfg=cfg)
    variables = model_f.init(jax.random.PRNGKey(0), x)
    ref = model_f.apply(variables, x, train=False)
    out = A2J(cfg=dataclasses.replace(cfg, quant=True)).apply(
        variables, x, train=False)
    for k in ref:
        assert out[k].shape == ref[k].shape
        assert bool(jnp.isfinite(out[k]).all())


def test_quant_profile_pipeline_runs():
    from handnet_tpu.models.pipeline import HandNetPipeline

    cfg = load_config({
        "fcos": {"num_classes": 2, "ext": False, "image_h": 64,
                 "image_w": 96, "max_detections": 8, "quant": True,
                 "score_thresh": 0.0},
        "a2j": {"crop_h": 32, "crop_w": 32, "quant": True},
        "pipeline": {"crop_size": 32},
    })
    pipe = HandNetPipeline(cfg)
    variables = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(1, 64, 96)), jnp.float32)
    out = jax.jit(lambda v, im, d: pipe(v, im, d))(variables, images, depth)
    assert bool(jnp.isfinite(out["joints_uvd"]).all())


def test_quant_yaml_profile_loads():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(yaml_path=os.path.join(repo, "configs", "quant.yaml"))
    assert cfg.fcos.quant and cfg.a2j.quant
    assert (cfg.fcos.image_h, cfg.fcos.image_w) == (480, 640)
    assert cfg.fcos.num_convs == 4  # reference tower depth — checkpoints fit


def test_trainers_force_quant_off():
    from handnet_tpu.train.trainer import A2JTrainer, FCOSTrainer

    t = A2JTrainer(A2JConfig(crop_h=32, crop_w=32, quant=True))
    assert not t.model_cfg.quant and not t.system.module.cfg.quant
    t2 = FCOSTrainer(FCOSConfig(num_classes=2, ext=False, image_h=64,
                                image_w=96, quant=True))
    assert not t2.model_cfg.quant and not t2.system.module.cfg.quant
