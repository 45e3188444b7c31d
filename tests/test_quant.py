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


def test_conv_layer_mode_mapping():
    from handnet_tpu.nn.quant import conv_layer

    assert isinstance(conv_layer(False, features=8, kernel_size=(3, 3)),
                      nn.Conv)
    dyn = conv_layer(True, features=8, kernel_size=(3, 3))
    assert isinstance(dyn, QuantConv) and not dyn.static_scale
    dyn2 = conv_layer("dynamic", features=8, kernel_size=(3, 3))
    assert isinstance(dyn2, QuantConv) and not dyn2.static_scale
    sta = conv_layer("static", features=8, kernel_size=(3, 3))
    assert isinstance(sta, QuantConv) and sta.static_scale


def test_static_quantconv_calibrate_then_serve():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 24)), jnp.float32)
    kwargs = dict(features=32, kernel_size=(3, 3), padding=1)
    conv_f = nn.Conv(**kwargs)
    variables = conv_f.init(jax.random.PRNGKey(1), x)
    ref = conv_f.apply(variables, x)

    conv_s = QuantConv(**kwargs, static_scale=True)
    vs = conv_s.init(jax.random.PRNGKey(1), x)
    # param tree identical to the float conv (drop-in contract holds)
    assert jax.tree.structure(vs["params"]) == jax.tree.structure(
        variables["params"])
    # calibration records the batch amax (init already saw |x|; re-calibrate
    # from the float params to pin the value)
    _, upd = conv_s.apply({**variables, "quant_stats": vs["quant_stats"]},
                          x, mutable=["quant_stats"])
    amax = jax.tree.leaves(upd["quant_stats"])[0]
    np.testing.assert_allclose(float(amax), float(jnp.abs(x).max()),
                               rtol=1e-6)
    # serving (immutable) uses the stored scalar; output within quant noise
    out = conv_s.apply({**variables, **upd}, x)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # and matches the dynamic path closely (same data -> same effective
    # scales up to per-sample vs per-layer granularity)
    out_dyn = QuantConv(**kwargs).apply(variables, x)
    rel_dd = float(jnp.linalg.norm(out - out_dyn) / jnp.linalg.norm(out_dyn))
    assert rel_dd < 0.03, rel_dd


def test_static_quantconv_repeated_calibration_folds_max():
    kwargs = dict(features=8, kernel_size=(1, 1), use_bias=False)
    conv = QuantConv(**kwargs, static_scale=True)
    x_small = jnp.full((1, 4, 4, 4), 0.5, jnp.float32)
    x_big = jnp.full((1, 4, 4, 4), 3.0, jnp.float32)
    vs = conv.init(jax.random.PRNGKey(0), x_small)
    _, upd = conv.apply(vs, x_big, mutable=["quant_stats"])
    _, upd2 = conv.apply({**vs, **upd}, x_small, mutable=["quant_stats"])
    # the smaller later batch must not shrink the recorded range
    assert float(jax.tree.leaves(upd2["quant_stats"])[0]) == 3.0


def test_pipeline_static_quant_calibrate_and_run():
    from handnet_tpu.models.pipeline import HandNetPipeline

    over = {
        "fcos": {"num_classes": 2, "ext": False, "image_h": 64,
                 "image_w": 96, "max_detections": 8, "score_thresh": 0.0},
        "a2j": {"crop_h": 32, "crop_w": 32},
        "pipeline": {"crop_size": 32},
    }
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(2, 64, 96)), jnp.float32)

    cfg_s = load_config({**over, "fcos": {**over["fcos"], "quant": "static"},
                         "a2j": {**over["a2j"], "quant": "static"}})
    pipe_s = HandNetPipeline(cfg_s)
    vs = pipe_s.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    assert "quant_stats" in vs["detector"] and "quant_stats" in vs["a2j"]
    vs = pipe_s.calibrate(vs, images, depth)
    # every recorded amax is finite and non-negative
    for leaf in jax.tree.leaves(vs["detector"]["quant_stats"]):
        assert np.isfinite(float(leaf)) and float(leaf) >= 0.0
    out_s = jax.jit(lambda v, im, d: pipe_s(v, im, d))(vs, images, depth)
    assert bool(jnp.isfinite(out_s["joints_uvd"]).all())

    # static path stays close to the dynamic path on the SAME params
    cfg_d = load_config({**over, "fcos": {**over["fcos"], "quant": True},
                         "a2j": {**over["a2j"], "quant": True}})
    pipe_d = HandNetPipeline(cfg_d)
    vd = {"detector": {k: v for k, v in vs["detector"].items()
                       if k != "quant_stats"},
          "a2j": {k: v for k, v in vs["a2j"].items() if k != "quant_stats"}}
    out_d = pipe_d(vd, images, depth)
    assert out_s["joints_uvd"].shape == out_d["joints_uvd"].shape
    # untrained nets + quantization: gate on "same ballpark", not bitwise
    diff = float(jnp.abs(out_s["joints_uvd"] - out_d["joints_uvd"]).mean())
    span = float(jnp.abs(out_d["joints_uvd"]).max()) + 1e-6
    assert diff / span < 0.2, (diff, span)


def test_calibrate_is_noop_for_float_config():
    from handnet_tpu.models.pipeline import HandNetPipeline

    cfg = load_config({
        "fcos": {"num_classes": 2, "ext": False, "image_h": 64,
                 "image_w": 96, "max_detections": 8, "score_thresh": 0.0},
        "a2j": {"crop_h": 32, "crop_w": 32},
        "pipeline": {"crop_size": 32},
    })
    pipe = HandNetPipeline(cfg)
    vs = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(1, 64, 96)), jnp.float32)
    out = pipe.calibrate(vs, images, depth)
    assert set(out["detector"]) == set(vs["detector"])  # no new collections
    assert set(out["a2j"]) == set(vs["a2j"])


def test_quant_static_yaml_loads():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(yaml_path=os.path.join(repo, "configs",
                                             "quant_static.yaml"))
    assert cfg.fcos.quant == "static" and cfg.a2j.quant == "static"
    assert cfg.fcos.num_convs == 4  # reference tower depth — checkpoints fit


_SMALL_STATIC = {
    "fcos": {"num_classes": 2, "ext": False, "image_h": 64, "image_w": 96,
             "max_detections": 8, "score_thresh": 0.0, "quant": "static"},
    "a2j": {"crop_h": 32, "crop_w": 32, "quant": "static"},
    "pipeline": {"crop_size": 32},
}


def test_calibration_save_load_roundtrip(tmp_path):
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.quant import load_calibration, save_calibration

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(size=(2, 64, 96, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(2, 64, 96)), jnp.float32)
    pipe = HandNetPipeline(load_config(_SMALL_STATIC))
    fresh = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    calibrated = pipe.calibrate(fresh, images, depth)
    path = str(tmp_path / "calib.npz")
    n = save_calibration(path, calibrated)
    assert n > 0

    # merging the artifact into the FRESH tree reproduces the calibrated one
    restored = load_calibration(path, fresh)
    for a, b in zip(jax.tree.leaves(restored["detector"]["quant_stats"]),
                    jax.tree.leaves(calibrated["detector"]["quant_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out_r = pipe(restored, images, depth)["joints_uvd"]
    out_c = pipe(calibrated, images, depth)["joints_uvd"]
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_c))


def test_calibration_extensionless_path_roundtrips(tmp_path):
    """np.savez appends .npz to extension-less paths — save/load/exists must
    agree on the real on-disk name (apps/serve.py --calib cal)."""
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.quant import (load_calibration, npz_path,
                                      save_calibration)

    pipe = HandNetPipeline(load_config(_SMALL_STATIC))
    vs = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    bare = str(tmp_path / "cal")
    save_calibration(bare, vs)
    import os
    assert os.path.exists(npz_path(bare)) and not os.path.exists(bare)
    restored = load_calibration(bare, vs)  # bare path loads too
    assert "quant_stats" in restored["detector"]


def test_assert_calibrated_guards_uncalibrated_static():
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.quant import assert_calibrated

    pipe = HandNetPipeline(load_config(_SMALL_STATIC))
    vs = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    with pytest.raises(ValueError, match="never calibrated"):
        assert_calibrated(vs)
    rng = np.random.default_rng(1)
    vs = pipe.calibrate(
        vs, jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0.3, 1.0, size=(1, 64, 96)), jnp.float32))
    assert_calibrated(vs)  # calibrated tree passes
    assert_calibrated({"params": {}})  # float tree: no-op


def test_calibration_io_rejects_mismatches(tmp_path):
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.quant import load_calibration, save_calibration

    # float config: nothing to save
    float_cfg = {k: ({kk: vv for kk, vv in v.items() if kk != "quant"}
                     if isinstance(v, dict) else v)
                 for k, v in _SMALL_STATIC.items()}
    pipe_f = HandNetPipeline(load_config(float_cfg))
    vs_f = pipe_f.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    with pytest.raises(ValueError):
        save_calibration(str(tmp_path / "none.npz"), vs_f)

    # artifact from the static config must not merge into a float tree
    pipe_s = HandNetPipeline(load_config(_SMALL_STATIC))
    vs_s = pipe_s.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    path = str(tmp_path / "calib.npz")
    save_calibration(path, vs_s)
    with pytest.raises(KeyError):
        load_calibration(path, vs_f)


def test_trainers_force_quant_off():
    from handnet_tpu.train.trainer import A2JTrainer, FCOSTrainer

    t = A2JTrainer(A2JConfig(crop_h=32, crop_w=32, quant=True))
    assert not t.model_cfg.quant and not t.system.module.cfg.quant
    t2 = FCOSTrainer(FCOSConfig(num_classes=2, ext=False, image_h=64,
                                image_w=96, quant=True))
    assert not t2.model_cfg.quant and not t2.system.module.cfg.quant


# ---------------------------------------------------------------------------
# Calibration saturation margin (nn/quant.apply_margin + pipeline wiring)


def test_apply_margin_scales_quant_stats_only():
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.quant import apply_margin

    pipe = HandNetPipeline(load_config(_SMALL_STATIC))
    vs = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(1, 64, 96)), jnp.float32)
    base = pipe.calibrate(vs, images, depth, margin=0.0)
    wide = apply_margin(base, 0.25)
    for b, w in zip(jax.tree.leaves(base["detector"]["quant_stats"]),
                    jax.tree.leaves(wide["detector"]["quant_stats"])):
        np.testing.assert_allclose(float(w), 1.25 * float(b), rtol=1e-6)
    # params untouched (same objects is fine; values must be equal)
    for b, w in zip(jax.tree.leaves(base["detector"]["params"]),
                    jax.tree.leaves(wide["detector"]["params"])):
        assert b is w or bool(jnp.all(b == w))
    with pytest.raises(ValueError):
        apply_margin(base, -1.0)


def test_calibrate_uses_config_margin_and_multibatch_folds_once():
    from handnet_tpu.models.pipeline import HandNetPipeline

    cfg = load_config({**_SMALL_STATIC, "pipeline": {"crop_size": 32,
                                                     "quant_margin": 0.1}})
    pipe = HandNetPipeline(cfg)
    vs = pipe.init(jax.random.PRNGKey(0), image_h=64, image_w=96)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(size=(1, 64, 96, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.3, 1.0, size=(1, 64, 96)), jnp.float32)

    raw = pipe.calibrate(vs, images, depth, margin=0.0)
    dflt = pipe.calibrate(vs, images, depth)          # config margin (0.1)
    multi = pipe.calibrate(vs, [images, images], [depth, depth])
    for r, d, m in zip(jax.tree.leaves(raw["a2j"]["quant_stats"]),
                       jax.tree.leaves(dflt["a2j"]["quant_stats"]),
                       jax.tree.leaves(multi["a2j"]["quant_stats"])):
        np.testing.assert_allclose(float(d), 1.1 * float(r), rtol=1e-6)
        # same batch twice = same amax; margin applied ONCE, not per batch
        np.testing.assert_allclose(float(m), float(d), rtol=1e-6)


def test_margin_restores_accuracy_on_out_of_range_inputs():
    """The failure mode the margin exists for: serve inputs hotter than
    calibration saw. With margin 0 the activations clip at the calibrated
    amax; a margin covering the shift restores float-level agreement."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    kwargs = dict(features=16, kernel_size=(3, 3), padding=1)
    conv_f = nn.Conv(**kwargs)
    variables = conv_f.init(jax.random.PRNGKey(1), x)

    conv_s = QuantConv(**kwargs, static_scale=True)
    vs0 = conv_s.init(jax.random.PRNGKey(1), x)
    _, upd = conv_s.apply({**variables, "quant_stats": vs0["quant_stats"]},
                          x, mutable=["quant_stats"])

    from handnet_tpu.nn.quant import apply_margin

    hot = 2.0 * x  # beyond the calibrated range
    ref = conv_f.apply(variables, hot)

    def rel_err(margin):
        cal = apply_margin({**variables, **upd}, margin)
        out = conv_s.apply(cal, hot)
        return float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))

    clipped, covered = rel_err(0.0), rel_err(1.0)
    assert clipped > 0.15, clipped          # saturation visibly wrong
    assert covered < 0.03, covered          # margin recovers float accuracy
    assert covered < clipped / 5
