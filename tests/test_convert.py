"""Torch-checkpoint converter tests.

We synthesize state dicts with the reference's exact key layout (torchvision
resnet50 naming + A2J head naming, a2j/a2j.py:212-224) and assert the
converted tree has the same structure/shapes as our flax init — plus a
numerical stem parity check (torch conv+bn vs flax conv+bn on the same
input/weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from handnet_tpu.config import A2JConfig
from handnet_tpu.convert.torch_weights import (convert_a2j, convert_fcos,
                                               _conv)
from handnet_tpu.models.a2j import A2JSystem


def bottleneck_keys(prefix, in_planes, planes, stride, dilation=1):
    """(key, shape) pairs for one torchvision Bottleneck block."""
    out = []
    out.append((f"{prefix}.conv1.weight", (planes, in_planes, 1, 1)))
    out += bn_keys(f"{prefix}.bn1", planes)
    out.append((f"{prefix}.conv2.weight", (planes, planes, 3, 3)))
    out += bn_keys(f"{prefix}.bn2", planes)
    out.append((f"{prefix}.conv3.weight", (planes * 4, planes, 1, 1)))
    out += bn_keys(f"{prefix}.bn3", planes * 4)
    if in_planes != planes * 4 or stride != 1:
        out.append((f"{prefix}.downsample.0.weight",
                    (planes * 4, in_planes, 1, 1)))
        out += bn_keys(f"{prefix}.downsample.1", planes * 4)
    return out


def bn_keys(prefix, ch):
    return [(f"{prefix}.weight", (ch,)), (f"{prefix}.bias", (ch,)),
            (f"{prefix}.running_mean", (ch,)),
            (f"{prefix}.running_var", (ch,)),
            (f"{prefix}.num_batches_tracked", ())]


def head_keys(prefix, cin, cout):
    out = []
    feat = 256
    c = cin
    for i in range(1, 5):
        out.append((f"{prefix}.conv{i}.weight", (feat, c, 3, 3)))
        out.append((f"{prefix}.conv{i}.bias", (feat,)))
        out += bn_keys(f"{prefix}.bn{i}", feat)
        c = feat
    out.append((f"{prefix}.output.weight", (cout, feat, 3, 3)))
    out.append((f"{prefix}.output.bias", (cout,)))
    return out


def reference_a2j_state_dict(rng, num_joints=21):
    keys = [("Backbone.model.conv1.weight", (64, 3, 7, 7))]
    keys += bn_keys("Backbone.model.bn1", 64)
    plan = [(3, 64), (4, 128), (6, 256), (3, 512)]
    in_planes = 64
    for li, (blocks, planes) in enumerate(plan, start=1):
        for b in range(blocks):
            stride = 1 if (li == 1 or b > 0 or li == 4) else 2
            keys += bottleneck_keys(f"Backbone.model.layer{li}.{b}",
                                    in_planes, planes, stride)
            in_planes = planes * 4
    a = 16
    keys += head_keys("classificationModel", 1024, a * num_joints)
    keys += head_keys("regressionModel", 2048, a * num_joints * 2)
    keys += head_keys("DepthRegressionModel", 2048, a * num_joints)
    sd = {}
    for k, shape in keys:
        if k.endswith("num_batches_tracked"):
            sd[k] = np.zeros(shape, np.int64)
        elif k.endswith("running_var"):
            sd[k] = np.abs(rng.normal(size=shape)).astype(np.float32) + 0.5
        else:
            sd[k] = rng.normal(size=shape).astype(np.float32) * 0.05
    return sd


def tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)


def test_convert_a2j_structure_matches_flax_init(rng):
    sd = reference_a2j_state_dict(rng)
    converted = convert_a2j(sd)

    system = A2JSystem(A2JConfig())
    variables = system.init(jax.random.PRNGKey(0))

    expect_p = tree_shapes(variables["params"])
    got_p = tree_shapes(converted["params"])
    assert got_p == expect_p, "params tree mismatch"
    expect_b = tree_shapes(variables["batch_stats"])
    got_b = tree_shapes(converted["batch_stats"])
    assert got_b == expect_b, "batch_stats tree mismatch"


def test_converted_a2j_runs(rng):
    sd = reference_a2j_state_dict(rng)
    converted = convert_a2j(sd)
    converted = jax.tree_util.tree_map(jnp.asarray, converted)
    system = A2JSystem(A2JConfig())
    x = jnp.asarray(rng.normal(size=(1, 176, 176, 1)).astype(np.float32))
    uvd = system.predict(converted, x)
    assert uvd.shape == (1, 21, 3)
    assert np.isfinite(np.asarray(uvd)).all()


def test_stem_numerical_parity(rng):
    """torch Conv2d+BatchNorm(eval) == flax conv+frozen-stats BN after
    weight transposition, on the same input."""
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32) * 0.2
    bn_w = rng.normal(size=8).astype(np.float32)
    bn_b = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = np.abs(rng.normal(size=8)).astype(np.float32) + 0.5
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)

    conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    conv.weight.data = torch.tensor(w)
    bn = torch.nn.BatchNorm2d(8).eval()
    bn.weight.data = torch.tensor(bn_w)
    bn.bias.data = torch.tensor(bn_b)
    bn.running_mean.data = torch.tensor(mean)
    bn.running_var.data = torch.tensor(var)
    with torch.no_grad():
        ref = bn(conv(torch.tensor(x))).numpy().transpose(0, 2, 3, 1)

    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding=1, use_bias=False, name="conv")(x)
            return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                name="bn")(x)

    variables = {
        "params": {"conv": {"kernel": jnp.asarray(_conv(w))},
                   "bn": {"scale": jnp.asarray(bn_w),
                          "bias": jnp.asarray(bn_b)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(mean),
                               "var": jnp.asarray(var)}},
    }
    ours = np.asarray(Tiny().apply(variables, jnp.asarray(
        x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_convert_fcos_tower_and_fpn_keys(rng):
    """Spot-check the FCOS key mapping on a minimal synthetic dict."""
    sd = {
        "backbone.body.conv1.weight": rng.normal(size=(64, 3, 7, 7)).astype(np.float32),
        "backbone.fpn.inner_blocks.0.weight": rng.normal(size=(256, 128, 1, 1)).astype(np.float32),
        "backbone.fpn.inner_blocks.0.bias": np.zeros(256, np.float32),
        "backbone.fpn.layer_blocks.2.weight": rng.normal(size=(256, 256, 3, 3)).astype(np.float32),
        "backbone.fpn.layer_blocks.2.bias": np.zeros(256, np.float32),
        "head.classification_head.conv.0.weight": rng.normal(size=(256, 256, 3, 3)).astype(np.float32),
        "head.classification_head.conv.0.bias": np.zeros(256, np.float32),
        "head.classification_head.conv.1.weight": np.ones(256, np.float32),
        "head.classification_head.conv.1.bias": np.zeros(256, np.float32),
        "head.classification_head.cls_logits.weight": rng.normal(size=(3, 256, 3, 3)).astype(np.float32),
        "head.classification_head.cls_logits.bias": np.zeros(3, np.float32),
        "head.regression_head.conv.3.weight": rng.normal(size=(256, 256, 3, 3)).astype(np.float32),
        "head.regression_head.conv.3.bias": np.zeros(256, np.float32),
        "head.regression_head.bbox_reg.weight": rng.normal(size=(4, 256, 3, 3)).astype(np.float32),
        "head.regression_head.bbox_reg.bias": np.zeros(4, np.float32),
    }
    out = convert_fcos(sd)
    p = out["params"]
    assert p["backbone"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert p["fpn"]["lateral_0"]["kernel"].shape == (1, 1, 128, 256)
    assert p["fpn"]["output_2"]["kernel"].shape == (3, 3, 256, 256)
    assert p["head"]["cls_tower"]["conv0"]["kernel"].shape == (3, 3, 256, 256)
    assert "scale" in p["head"]["cls_tower"]["gn0"]
    assert p["head"]["reg_tower"]["conv1"]["kernel"].shape == (3, 3, 256, 256)
    assert p["head"]["cls_logits"]["kernel"].shape == (3, 3, 256, 3)
    assert p["head"]["bbox_reg"]["kernel"].shape == (3, 3, 256, 4)
