"""Cross-implementation parity: torch replicas -> converter -> flax models.

Golden parity against the PUBLISHED checkpoints can't run in this sandbox
(no torchvision, no checkpoints, no egress — tests/test_golden_parity.py
skips). These tests close most of that gap in-sandbox: a from-scratch torch
replica of each reference architecture (tests/torch_oracles.py, layouts cited
there) is randomly initialized, its state dict converted with
convert/torch_weights.py, and the flax model's eval-mode output compared
against the torch forward. This validates, end to end:

* every converter key mapping and tensor transpose,
* eval-mode BatchNorm statistics handling,
* the a2j anchor-pairing quirk (permute(0,3,2,1), transposed_anchors),
* the dilated-resnet first-block dilation quirk (a2j/resnet.py:133-145),
* meshnet's F.interpolate residuals / graph upsampling / cheby flattening.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from handnet_tpu.config import A2JConfig  # noqa: E402
from handnet_tpu.convert.torch_weights import (convert_a2j,  # noqa: E402
                                               convert_pose2mesh)
from handnet_tpu.models.a2j import A2JSystem  # noqa: E402
from handnet_tpu.models.pose2mesh import Pose2Mesh  # noqa: E402
from handnet_tpu.ops import graph as G  # noqa: E402
from torch_oracles import (TorchA2J, TorchFlatPose2Mesh,  # noqa: E402
                                 randomize_, state_dict_numpy,
                                 torch_a2j_anchors, torch_a2j_decode)

SKELETON = ((0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3), (3, 4),
            (5, 6), (6, 7), (7, 8), (9, 10), (10, 11), (11, 12), (13, 14),
            (14, 15), (15, 16), (17, 18), (18, 19), (19, 20))


def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(np.shape(v))
    return out


def _assert_same_tree(converted, initialized):
    cs, js = _tree_shapes(converted), _tree_shapes(initialized)
    assert cs == js, (
        f"missing in converted: {sorted(set(js) - set(cs))[:8]}; "
        f"extra in converted: {sorted(set(cs) - set(js))[:8]}; "
        f"shape diffs: "
        f"{[(k, cs[k], js[k]) for k in set(cs) & set(js) if cs[k] != js[k]][:8]}")


def random_mesh(rng, n_verts=80, n_faces=200):
    faces = rng.integers(0, n_verts, size=(n_faces, 3))
    faces[:, 1] = (faces[:, 0] + 1) % n_verts
    faces[:, 2] = (faces[:, 0] + 2) % n_verts
    faces[:n_verts, 0] = np.arange(n_verts)
    faces[:n_verts, 1] = (np.arange(n_verts) + 1) % n_verts
    faces[:n_verts, 2] = (np.arange(n_verts) + 2) % n_verts
    return faces


def test_pose2mesh_parity_vs_torch_replica():
    rng = np.random.default_rng(0)
    pyr = G.build_graph_pyramid(random_mesh(rng), 21, SKELETON, levels=6)
    laps = list(pyr.laplacians)
    del laps[-2]  # meshnet.py:38

    tmodel = TorchFlatPose2Mesh(laps, num_joints=21, hid=128, stages=2)
    randomize_(tmodel, seed=1)
    tmodel.eval()

    pose2d = rng.normal(size=(3, 21, 2)).astype(np.float32)
    with torch.no_grad():
        tmesh, tpose3d = tmodel(torch.as_tensor(pose2d))

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_pose2mesh(state_dict_numpy(tmodel)))

    from handnet_tpu.config import Pose2MeshConfig
    model = Pose2Mesh(pyramid=pyr, cfg=Pose2MeshConfig(posenet_hid=128))
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.asarray(pose2d), train=False)
    _assert_same_tree(variables["params"], ref["params"])
    _assert_same_tree(variables["batch_stats"], ref["batch_stats"])

    mesh, pose3d = model.apply(variables, jnp.asarray(pose2d), train=False)
    np.testing.assert_allclose(np.asarray(pose3d), tpose3d.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mesh), tmesh.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_fcos_parity_vs_torch_replica():
    from torch_oracles import TorchFCOS

    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.convert.torch_weights import convert_fcos
    from handnet_tpu.models.fcos import FCOSSystem

    rng = np.random.default_rng(0)
    tmodel = TorchFCOS(num_classes=3, ext=True)
    randomize_(tmodel, seed=3, scale=0.05)
    tmodel.eval()

    imgs = rng.normal(size=(2, 3, 96, 128)).astype(np.float32)
    with torch.no_grad():
        t_head = tmodel(torch.as_tensor(imgs))

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_fcos(state_dict_numpy(tmodel)))

    system = FCOSSystem(FCOSConfig(num_classes=3, ext=True,
                                   image_h=96, image_w=128))
    ref = system.init(jax.random.PRNGKey(0))
    _assert_same_tree(variables["params"], ref["params"])
    _assert_same_tree(variables["batch_stats"], ref["batch_stats"])

    head = system.module.apply(variables,
                               jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
                               train=False)
    for key in ("cls_logits", "hand_lr", "hand_contact_state", "hand_dxdy",
                "bbox_regression", "bbox_ctrness"):
        np.testing.assert_allclose(
            np.asarray(head[key]), t_head[key].numpy(),
            rtol=1e-3, atol=2e-4, err_msg=key)


def test_pipeline_accepts_converted_weights():
    """The end-user path: converted torch checkpoints slot into
    HandNetPipeline (handnet_pipeline.py:14-36 load_pretrained_* equiv)
    with the right config flags, and the fused graph runs them."""
    from torch_oracles import TorchFCOS

    from handnet_tpu.config import (FCOSConfig, HandNetConfig,
                                    PipelineConfig)
    from handnet_tpu.convert.torch_weights import convert_fcos
    from handnet_tpu.models.pipeline import HandNetPipeline

    tfcos = TorchFCOS(num_classes=3, ext=False)
    randomize_(tfcos, seed=5, scale=0.05)

    cfg = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, transposed_anchors=True),
        fcos=FCOSConfig(num_classes=3, ext=False, image_h=64, image_w=96,
                        max_detections=8),
        pipeline=PipelineConfig(crop_size=48))
    pipe = HandNetPipeline(cfg, dtype=jnp.float32)
    variables = pipe.init(jax.random.PRNGKey(0))

    converted = jax.tree_util.tree_map(
        jnp.asarray, convert_fcos(state_dict_numpy(tfcos)))
    _assert_same_tree(converted["params"], variables["detector"]["params"])
    _assert_same_tree(converted["batch_stats"],
                      variables["detector"]["batch_stats"])
    variables["detector"] = converted
    # (a2j conversion is covered by test_a2j_parity_vs_torch_replica; the
    # full-size backbone is too slow to run twice on the CI CPU)

    rng = np.random.default_rng(0)
    out = pipe(variables,
               jnp.asarray(rng.uniform(size=(2, 60, 80, 3))
                           .astype(np.float32)),
               jnp.asarray(rng.uniform(0.3, 1.0, size=(2, 60, 80))
                           .astype(np.float32)))
    assert out["joints_uvd"].shape == (2, 21, 3)
    assert np.isfinite(np.asarray(out["joints_uvd"])).all()


def test_converted_weights_serve_int8():
    """The int8 serving claim end to end: the SAME converted torch
    checkpoint (unchanged fp32 param tree) serves through the calibrated
    static-int8 pipeline (nn/quant.py; configs/quant_static.yaml flags) and
    tracks the fp pipeline's outputs. score_thresh=0 so random weights
    still take the found=True path and the whole detect->crop->pose graph
    runs real numbers through the quantized convs."""
    import dataclasses

    from torch_oracles import TorchFCOS

    from handnet_tpu.config import (FCOSConfig, HandNetConfig,
                                    PipelineConfig)
    from handnet_tpu.convert.torch_weights import convert_fcos
    from handnet_tpu.models.pipeline import HandNetPipeline

    tfcos = TorchFCOS(num_classes=3, ext=False)
    randomize_(tfcos, seed=7, scale=0.05)
    converted = jax.tree_util.tree_map(
        jnp.asarray, convert_fcos(state_dict_numpy(tfcos)))

    acfg = A2JConfig(crop_h=48, crop_w=48, transposed_anchors=True)
    fcfg = FCOSConfig(num_classes=3, ext=False, image_h=64, image_w=96,
                      max_detections=8, score_thresh=0.0)
    pcfg = PipelineConfig(crop_size=48)

    def build(quant):
        cfg = HandNetConfig(
            a2j=dataclasses.replace(acfg, quant=quant),
            fcos=dataclasses.replace(fcfg, quant=quant),
            pipeline=pcfg)
        pipe = HandNetPipeline(cfg, dtype=jnp.float32)
        variables = pipe.init(jax.random.PRNGKey(0))
        # identical fp32 tree: the converted checkpoint replaces the
        # detector params in BOTH the float and the int8 pipeline
        _assert_same_tree(converted["params"],
                          variables["detector"]["params"])
        variables["detector"] = {**variables["detector"], **converted}
        return pipe, variables

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(size=(2, 60, 80, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(2, 60, 80)).astype(np.float32))

    pipe_fp, v_fp = build(False)
    out_fp = pipe_fp(v_fp, images, depth)

    pipe_q, v_q = build("static")
    assert pipe_q.needs_calibration()
    v_q = pipe_q.calibrate(v_q, images, depth)
    out_q = pipe_q(v_q, images, depth)

    assert bool(np.asarray(out_fp["found"]).all())
    np.testing.assert_array_equal(np.asarray(out_q["found"]),
                                  np.asarray(out_fp["found"]))
    # same best box (the int8 perturbation must not re-rank detections on
    # this fixed seed) and joints within int8 quantization error
    np.testing.assert_allclose(np.asarray(out_q["boxes"]),
                               np.asarray(out_fp["boxes"]), atol=1.0)
    np.testing.assert_allclose(np.asarray(out_q["joints_uvd"]),
                               np.asarray(out_fp["joints_uvd"]),
                               atol=1.5)


def test_mano_parity_vs_torch_replica():
    """Batched-einsum jax ManoLayer vs a sequential per-finger torch walk of
    the reference chain (manolayer.py:110-274), on synthetic assets."""
    from torch_oracles import TorchManoLayer

    from handnet_tpu.models.mano import ManoAssets, ManoLayer

    rng = np.random.default_rng(0)
    for side in ("right", "left"):
        assets = ManoAssets.synthetic(rng, side=side)
        # non-trivial PCA basis + mean so the coeff path is exercised
        comps = rng.normal(size=(45, 45)).astype(np.float32) * 0.5
        mean = rng.normal(size=45).astype(np.float32) * 0.1
        import dataclasses
        assets = dataclasses.replace(assets, hands_components=comps,
                                     hands_mean=mean)

        pose = rng.normal(size=(3, 48)).astype(np.float32) * 0.3
        betas = rng.normal(size=(3, 10)).astype(np.float32) * 0.3
        trans = rng.normal(size=(3, 3)).astype(np.float32) * 0.1

        layer = ManoLayer(assets, ncomps=45, flat_hand_mean=False)
        verts, joints = layer(jnp.asarray(pose), jnp.asarray(betas),
                              jnp.asarray(trans))
        tverts, tjoints = TorchManoLayer(assets, 45, False)(pose, betas,
                                                            trans)
        np.testing.assert_allclose(np.asarray(joints), tjoints, atol=1e-2)
        np.testing.assert_allclose(np.asarray(verts), tverts, atol=1e-2)


def test_a2j_parity_vs_torch_replica():
    rng = np.random.default_rng(0)
    tmodel = TorchA2J(num_joints=21)
    randomize_(tmodel, seed=2, scale=0.05)
    tmodel.eval()

    depth = rng.uniform(0.3, 1.0, size=(2, 1, 176, 176)).astype(np.float32)
    with torch.no_grad():
        cls, reg, dep = tmodel(torch.as_tensor(depth))
    t_uvd = torch_a2j_decode(cls, reg, dep, torch_a2j_anchors())

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_a2j(state_dict_numpy(tmodel)))

    system = A2JSystem(A2JConfig(transposed_anchors=True))
    ref = system.init(jax.random.PRNGKey(0))
    _assert_same_tree(variables["params"], ref["params"])
    _assert_same_tree(variables["batch_stats"], ref["batch_stats"])

    uvd = np.asarray(system.predict(
        variables, jnp.asarray(np.transpose(depth, (0, 2, 3, 1)))))
    np.testing.assert_allclose(uvd, t_uvd, rtol=1e-3, atol=5e-3)


def test_converted_stack_with_mesh_and_static_quant():
    """The recommended serving stack exactly as a user assembles it: ALL
    THREE stages from converted checkpoints (detector, A2J, Pose2Mesh),
    pipeline.with_mesh fused mesh head, quant='static' calibration with the
    shipped margin — one integration test for the triple composition
    (separate pairwise tests existed; this is the product configuration)."""
    import dataclasses

    from torch_oracles import TorchFCOS

    from handnet_tpu.config import (FCOSConfig, HandNetConfig,
                                    PipelineConfig, Pose2MeshConfig)
    from handnet_tpu.convert.torch_weights import convert_fcos
    from handnet_tpu.models.pipeline import HandNetPipeline
    from handnet_tpu.nn.quant import assert_calibrated

    base = HandNetConfig(
        a2j=A2JConfig(crop_h=48, crop_w=48, num_joints=21,
                      transposed_anchors=True),
        fcos=FCOSConfig(num_classes=3, ext=False, image_h=64, image_w=96,
                        max_detections=8, score_thresh=0.0),
        pose2mesh=Pose2MeshConfig(posenet_hid=128),
        pipeline=PipelineConfig(crop_size=48, with_mesh=True))

    def build(quant):
        cfg = dataclasses.replace(
            base, a2j=dataclasses.replace(base.a2j, quant=quant),
            fcos=dataclasses.replace(base.fcos, quant=quant))
        pipe = HandNetPipeline(cfg, dtype=jnp.float32)
        return pipe, pipe.init(jax.random.PRNGKey(0))

    pipe, variables = build("static")

    # --- converted checkpoints for all three stages --------------------
    tfcos = TorchFCOS(num_classes=3, ext=False)
    randomize_(tfcos, seed=7, scale=0.05)
    det = jax.tree_util.tree_map(
        jnp.asarray, convert_fcos(state_dict_numpy(tfcos)))

    ta2j = TorchA2J(num_joints=21)
    randomize_(ta2j, seed=8, scale=0.05)
    a2j = jax.tree_util.tree_map(
        jnp.asarray, convert_a2j(state_dict_numpy(ta2j)))

    laps = list(pipe._pyramid.laplacians)
    del laps[-2]  # meshnet.py:38 skips the second-finest level
    tp2m = TorchFlatPose2Mesh(laps, num_joints=21, hid=128, stages=2)
    randomize_(tp2m, seed=9)
    p2m = jax.tree_util.tree_map(
        jnp.asarray, convert_pose2mesh(state_dict_numpy(tp2m)))

    for conv, init in ((det, variables["detector"]),
                       (a2j, variables["a2j"]),
                       (p2m, variables["pose2mesh"])):
        _assert_same_tree(conv["params"], init["params"])
        _assert_same_tree(conv["batch_stats"], init["batch_stats"])
    variables["detector"] = {**variables["detector"], **det}
    variables["a2j"] = {**variables["a2j"], **a2j}
    variables["pose2mesh"] = {**variables["pose2mesh"], **p2m}

    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.uniform(size=(2, 60, 80, 3)).astype(np.float32))
    depth = jnp.asarray(
        rng.uniform(0.3, 1.0, size=(2, 60, 80)).astype(np.float32))
    paras = jnp.asarray([[600.0, 600.0, 40.0, 30.0]] * 2)

    assert pipe.needs_calibration()
    variables = pipe.calibrate(variables, images, depth)  # default margin
    assert_calibrated(variables)
    out = jax.jit(lambda v, im, d, p: pipe(v, im, d, p))(
        variables, images, depth, paras)

    # fp stack from the SAME converted checkpoints tracks the int8 stack
    pipe_fp, v_fp = build(False)
    v_fp["detector"] = {**v_fp["detector"], **det}
    v_fp["a2j"] = {**v_fp["a2j"], **a2j}
    v_fp["pose2mesh"] = {**v_fp["pose2mesh"], **p2m}
    out_fp = pipe_fp(v_fp, images, depth, paras)

    assert bool(np.asarray(out_fp["found"]).all())
    np.testing.assert_array_equal(np.asarray(out["found"]),
                                  np.asarray(out_fp["found"]))
    assert out["verts"].shape == (2, 778, 3)
    assert np.isfinite(np.asarray(out["verts"])).all()
    assert np.isfinite(np.asarray(out["verts_xyz"])).all()
    np.testing.assert_allclose(np.asarray(out["joints_uvd"]),
                               np.asarray(out_fp["joints_uvd"]), atol=1.5)
    # mesh rides the joints: int8 perturbation stays at joint scale
    np.testing.assert_allclose(np.asarray(out["verts_xyz"]),
                               np.asarray(out_fp["verts_xyz"]), atol=5.0)
