"""Parity vs the reference's OWN rotation/geometry/alignment code.

Extends tests/test_reference_parity.py's de-correlation net to the last
torch/numpy-importable reference modules that tests/torch_oracles.py had
only same-author replicas for:

* manopth/rodrigues_layer.py:15-55  quat2mat / batch_rodrigues
                                    vs ops/rotation.{quat_to_rotmat,batch_rodrigues}
* manopth/rot6d.py:4-24             compute_rotation_matrix_from_ortho6d
                                    vs ops/rotation.rot6d_to_rotmat
* datasets3d/a2jdataset.py:21-38    xyz2uvd / uvd2xyz
                                    vs ops/geometry.{xyz2uvd,uvd2xyz}
* a2j/a2j.py:17-43                  convert_joints (crop UVD -> XYZ mm)
                                    vs ops/geometry.convert_joints
* dex-ycb-toolkit/freihand/eval.py:71-94  align_w_scale
                                    vs ops/geometry.align_w_scale_np and the
                                    batched on-device align_w_scale
* manopth/manolayer.py:110-274      the FULL ManoLayer LBS forward
                                    vs models/mano.ManoLayer — the licensed
                                    MANO pkl assets are absent, so the
                                    reference layer is built via __new__ with
                                    the same random buffers our layer gets
                                    (the forward math is what's under test)

Reference sources are imported from the read-only mount at test time (never
copied). Modules whose imports drag in unavailable/heavy deps (open3d,
skimage, pytorch_lightning, MANO pkl assets) are loaded with inert stub
modules pre-registered in sys.modules — the functions under test only touch
numpy/torch. Everything skips when /root/reference is absent.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF = os.environ.get("HANDNET_REFERENCE", "/root/reference")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available")


def _load(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub(name: str, **attrs):
    """Register an inert stub module (idempotent, returns existing if any)."""
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


# ---------------------------------------------------------------------------
# manopth rotation math


@pytest.fixture(scope="module")
def ref_rot():
    """Import the real manopth rodrigues_layer + rot6d (torch-only)."""
    pkg = os.path.join(REF, "dex-ycb-toolkit", "manopth")
    sys.path.insert(0, pkg)
    try:
        rod = importlib.import_module("manopth.rodrigues_layer")
        rot6d = importlib.import_module("manopth.rot6d")
        yield rod, rot6d
    finally:
        sys.path.remove(pkg)


def test_batch_rodrigues_matches_reference(ref_rot):
    from handnet_tpu.ops.rotation import batch_rodrigues

    rod, _ = ref_rot
    rng = np.random.default_rng(0)
    # include tiny and large angles; reference adds 1e-8 before the norm
    ax = rng.normal(scale=1.5, size=(64, 3)).astype(np.float32)
    ax[0] = 0.0
    ax[1] = 1e-6

    theirs = rod.batch_rodrigues(torch.from_numpy(ax)).numpy()  # [N, 9]
    mine = np.asarray(batch_rodrigues(jnp.asarray(ax))).reshape(-1, 9)
    np.testing.assert_allclose(mine, theirs, atol=2e-6)


def test_quat2mat_matches_reference(ref_rot):
    from handnet_tpu.ops.rotation import quat_to_rotmat

    rod, _ = ref_rot
    rng = np.random.default_rng(1)
    quat = rng.normal(size=(32, 4)).astype(np.float32)

    theirs = rod.quat2mat(torch.from_numpy(quat)).numpy()
    mine = np.asarray(quat_to_rotmat(jnp.asarray(quat)))
    np.testing.assert_allclose(mine, theirs, atol=2e-6)


def test_rot6d_matches_reference(ref_rot):
    from handnet_tpu.ops.rotation import rot6d_to_rotmat

    _, rot6d = ref_rot
    rng = np.random.default_rng(2)
    poses = rng.normal(size=(40, 6)).astype(np.float32)

    theirs = rot6d.compute_rotation_matrix_from_ortho6d(
        torch.from_numpy(poses)).numpy()
    mine = np.asarray(rot6d_to_rotmat(jnp.asarray(poses)))
    np.testing.assert_allclose(mine, theirs, atol=3e-6)
    # sanity: proper rotations
    det = np.linalg.det(mine)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# manopth/manolayer.py full LBS forward


@pytest.fixture(scope="module")
def ref_manolayer():
    """Import the real manolayer.py; its module-level `from mano.webuser...`
    import (the chumpy pkl loader, only used by __init__) is stubbed."""
    _stub("mano")
    _stub("mano.webuser")
    _stub("mano.webuser.smpl_handpca_wrapper_HAND_only",
          ready_arguments=lambda *a, **k: None)
    pkg = os.path.join(REF, "dex-ycb-toolkit", "manopth")
    sys.path.insert(0, pkg)
    try:
        yield _load("ref_manolayer", "dex-ycb-toolkit/manopth/manopth/"
                                     "manolayer.py")
    finally:
        sys.path.remove(pkg)


def _build_ref_mano(mod, assets, mean: np.ndarray, ncomps: int,
                    center_idx=None):
    """Instantiate the reference ManoLayer WITHOUT pkl assets: allocate via
    __new__, then register the exact buffers __init__ would have built
    (manolayer.py:44-108) from our random ManoAssets."""
    layer = mod.ManoLayer.__new__(mod.ManoLayer)
    torch.nn.Module.__init__(layer)
    layer.center_idx = center_idx
    layer.robust_rot = False
    layer.rot = 3
    layer.flat_hand_mean = False
    layer.side = assets.side
    layer.use_pca = True
    layer.joint_rot_mode = "axisang"
    layer.root_rot_mode = "axisang"
    layer.ncomps = ncomps
    t = torch.from_numpy
    layer.register_buffer("th_betas", torch.zeros(1, 10))
    layer.register_buffer("th_shapedirs", t(assets.shapedirs.copy()))
    layer.register_buffer("th_posedirs", t(assets.posedirs.copy()))
    layer.register_buffer("th_v_template",
                          t(assets.v_template.copy()).unsqueeze(0))
    layer.register_buffer("th_J_regressor", t(assets.J_regressor.copy()))
    layer.register_buffer("th_weights", t(assets.weights.copy()))
    layer.register_buffer("th_faces", torch.zeros(4, 3).long())
    layer.register_buffer("th_hands_mean", t(mean.copy()).unsqueeze(0))
    layer.register_buffer("th_comps", t(assets.hands_components.copy()))
    layer.register_buffer("th_selected_comps",
                          t(assets.hands_components[:ncomps].copy()))
    layer.kintree_parents = [0] * 16
    return layer


@pytest.mark.parametrize("side", ["right", "left"])
def test_mano_layer_matches_reference(ref_manolayer, side):
    from handnet_tpu.models.mano import ManoAssets, ManoLayer

    rng = np.random.default_rng(6 if side == "right" else 7)
    ncomps = 6
    base = ManoAssets.synthetic(rng, side=side)
    # non-trivial PCA basis + hand mean (synthetic() uses identity/zeros)
    comps = rng.normal(size=(45, 45)).astype(np.float32) * 0.3
    mean = rng.normal(size=(45,)).astype(np.float32) * 0.1
    assets = ManoAssets(
        v_template=base.v_template, shapedirs=base.shapedirs,
        posedirs=base.posedirs, J_regressor=base.J_regressor,
        weights=base.weights, hands_components=comps, hands_mean=mean,
        faces=base.faces, side=side)

    ref = _build_ref_mano(ref_manolayer, assets, mean, ncomps)
    mine = ManoLayer(assets, ncomps=ncomps, flat_hand_mean=False)

    b = 4
    pose = rng.normal(size=(b, 3 + ncomps)).astype(np.float32)
    betas = rng.normal(size=(b, 10)).astype(np.float32) * 0.5
    trans = rng.normal(size=(b, 3)).astype(np.float32) * 0.1

    with torch.no_grad():
        ref_v, ref_j = ref(torch.from_numpy(pose), torch.from_numpy(betas),
                           torch.from_numpy(trans))
    my_v, my_j = mine(jnp.asarray(pose), jnp.asarray(betas),
                      jnp.asarray(trans))
    np.testing.assert_allclose(np.asarray(my_j), ref_j.numpy(),
                               rtol=1e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(my_v), ref_v.numpy(),
                               rtol=1e-4, atol=5e-2)

    # model-betas path (th_betas numel==1 -> stored zeros) + center_idx
    ref_c = _build_ref_mano(ref_manolayer, assets, mean, ncomps,
                            center_idx=9)
    mine_c = ManoLayer(assets, ncomps=ncomps, flat_hand_mean=False,
                       center_idx=9)
    with torch.no_grad():
        ref_v, ref_j = ref_c(torch.from_numpy(pose))
    my_v, my_j = mine_c(jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(my_j), ref_j.numpy(),
                               rtol=1e-4, atol=5e-2)
    np.testing.assert_allclose(np.asarray(my_v), ref_v.numpy(),
                               rtol=1e-4, atol=5e-2)


# ---------------------------------------------------------------------------
# datasets3d/a2jdataset.py uvd<->xyz and a2j/a2j.py convert_joints


@pytest.fixture(scope="module")
def ref_a2jdataset():
    """Import the real datasets3d/a2jdataset.py with inert stubs for the
    dataset-only deps its geometry functions never touch."""
    _stub("dex_ycb_toolkit")
    _stub("dex_ycb_toolkit.factory", get_dataset=lambda *a, **k: None)
    # preempt the real manopth/manolayer.py (needs MANO pkl assets)
    _stub("manopth") if "manopth" not in sys.modules else None
    _stub("manopth.manolayer", ManoLayer=object)
    _stub("pycocotools")
    _stub("pycocotools.mask")
    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms",
                          ToPILImage=object, Compose=object)
    # keep the surface test_reference_parity.py's ref_det_utils expects,
    # regardless of which file registers the stub first
    tv.ops = _stub("torchvision.ops")
    tv.ops.misc = _stub("torchvision.ops.misc",
                        FrozenBatchNorm2d=torch.nn.BatchNorm2d)
    _stub("utils")
    _stub("utils.vistool", VisualUtil=object)
    sys.path.insert(0, REF)
    try:
        yield importlib.import_module("datasets3d.a2jdataset")
    finally:
        sys.path.remove(REF)


@pytest.fixture(scope="module")
def ref_a2j_module(ref_a2jdataset):
    """Import the real a2j/a2j.py (for convert_joints) with lightning stubs."""
    _stub("pytorch_lightning", LightningModule=object,
          LightningDataModule=object)
    _stub("dex_ycb_toolkit.hpe_eval", HPEEvaluator=object)
    _stub("utils.utils", get_e2e_loaders=lambda *a, **k: None,
          vis_minibatch=lambda *a, **k: None)
    sys.path.insert(0, REF)
    try:
        yield importlib.import_module("a2j.a2j")
    finally:
        sys.path.remove(REF)


def test_uvd_xyz_conversions_match_reference(ref_a2jdataset):
    from handnet_tpu.ops.geometry import uvd2xyz, xyz2uvd

    rng = np.random.default_rng(3)
    paras = np.array([615.0, 616.5, 312.2, 239.7], np.float32)
    xyz = np.stack([rng.uniform(-0.2, 0.2, size=(21,)),
                    rng.uniform(-0.2, 0.2, size=(21,)),
                    rng.uniform(0.3, 1.2, size=(21,))],
                   axis=-1).astype(np.float32)

    ref_uvd = ref_a2jdataset.xyz2uvd(xyz, paras)
    my_uvd = np.asarray(xyz2uvd(jnp.asarray(xyz), jnp.asarray(paras)))
    np.testing.assert_allclose(my_uvd, ref_uvd, rtol=1e-5, atol=1e-4)

    ref_xyz = ref_a2jdataset.uvd2xyz(ref_uvd, paras)
    my_xyz = np.asarray(uvd2xyz(jnp.asarray(my_uvd), jnp.asarray(paras)))
    np.testing.assert_allclose(my_xyz, ref_xyz, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(my_xyz, xyz, rtol=1e-4, atol=1e-5)


def test_convert_joints_matches_reference(ref_a2j_module):
    from handnet_tpu.ops.geometry import convert_joints

    rng = np.random.default_rng(4)
    paras = np.array([615.0, 616.5, 312.2, 239.7], np.float32)
    box = np.array([120.0, 90.0, 360.0, 330.0], np.float32)
    # crop-frame uvd: pixels in [0, 176), depth in meters
    uvd = np.stack([rng.uniform(0, 176, size=(21,)),
                    rng.uniform(0, 176, size=(21,)),
                    rng.uniform(0.3, 1.0, size=(21,))],
                   axis=-1).astype(np.float32)

    ref_xyz = ref_a2j_module.convert_joints(
        uvd.copy(), None, box.copy(), paras.copy(), 176, 176)
    mine = np.asarray(convert_joints(jnp.asarray(uvd), jnp.asarray(box),
                                     jnp.asarray(paras), 176, 176))
    np.testing.assert_allclose(mine, ref_xyz, rtol=1e-5, atol=5e-3)

    # batched path agrees with per-sample reference calls
    uvd_b = rng.uniform(0, 176, size=(4, 21, 3)).astype(np.float32)
    uvd_b[..., 2] = rng.uniform(0.3, 1.0, size=(4, 21))
    boxes = np.stack([box + 10 * i for i in range(4)]).astype(np.float32)
    mine_b = np.asarray(convert_joints(
        jnp.asarray(uvd_b), jnp.asarray(boxes),
        jnp.broadcast_to(jnp.asarray(paras), (4, 4)), 176, 176))
    for i in range(4):
        ref_i = ref_a2j_module.convert_joints(
            uvd_b[i].copy(), None, boxes[i].copy(), paras.copy(), 176, 176)
        np.testing.assert_allclose(mine_b[i], ref_i, rtol=1e-5, atol=5e-3)


# ---------------------------------------------------------------------------
# freihand align_w_scale (Procrustes + scale)


@pytest.fixture(scope="module")
def ref_freihand_eval():
    """Import the real freihand/eval.py; stub open3d + the skimage-needing
    fh_utils (align_w_scale touches neither)."""
    _stub("open3d")
    _stub("freihand")
    _stub("freihand.utils")
    # eval.py picks up `np` via `from fh_utils import *` (fh_utils:2)
    _stub("freihand.utils.fh_utils", np=np)
    # the real EvalUtil (numpy-only) so `from ... import EvalUtil` binds it
    real_eval_util = _load("ref_fh_eval_util",
                           "dex-ycb-toolkit/freihand/utils/eval_util.py")
    _stub("freihand.utils.eval_util", EvalUtil=real_eval_util.EvalUtil)
    return _load("ref_freihand_eval", "dex-ycb-toolkit/freihand/eval.py")


def test_align_w_scale_matches_reference(ref_freihand_eval):
    from handnet_tpu.ops.geometry import align_w_scale, align_w_scale_np

    rng = np.random.default_rng(5)
    gt = rng.normal(scale=40.0, size=(21, 3))
    # pred = similarity-transformed gt + noise
    theta = 0.7
    rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                    [np.sin(theta), np.cos(theta), 0],
                    [0, 0, 1.0]])
    pred = 1.3 * gt @ rot.T + np.array([5.0, -3.0, 11.0])
    pred += rng.normal(scale=2.0, size=pred.shape)

    ref_aligned = ref_freihand_eval.align_w_scale(gt, pred)
    my_aligned = align_w_scale_np(gt, pred)
    np.testing.assert_allclose(my_aligned, ref_aligned, rtol=1e-9, atol=1e-9)

    r_r, s_r, s1_r, t_r = ref_freihand_eval.align_w_scale(
        gt, pred, return_trafo=True)
    r_m, s_m, s1_m, t_m = align_w_scale_np(gt, pred, return_trafo=True)
    np.testing.assert_allclose(r_m, r_r, atol=1e-9)
    np.testing.assert_allclose([s_m, s1_m], [s_r, s1_r], rtol=1e-9)
    np.testing.assert_allclose(t_m, t_r, atol=1e-9)

    # batched on-device version agrees with the per-sample reference
    gts = rng.normal(scale=40.0, size=(6, 21, 3)).astype(np.float32)
    preds = gts * 1.1 + rng.normal(scale=3.0, size=gts.shape).astype(
        np.float32)
    mine_b = np.asarray(align_w_scale(jnp.asarray(gts), jnp.asarray(preds)))
    for i in range(6):
        ref_i = ref_freihand_eval.align_w_scale(
            gts[i].astype(np.float64), preds[i].astype(np.float64))
        np.testing.assert_allclose(mine_b[i], ref_i, rtol=1e-3, atol=5e-3)
