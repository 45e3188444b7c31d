"""MANO layer tests — kinematic invariants on synthetic assets (the licensed
MANO pkls aren't distributable; the real-asset path is covered by the
converter test below + ManoAssets.load).

Reference semantics: manopth/manolayer.py:110-274.
"""

import pickle

import jax.numpy as jnp
import numpy as np

from handnet_tpu.convert import mano_assets as conv
from handnet_tpu.models.mano import (JOINT_REORDER, ManoAssets, ManoLayer,
                                     TRANSFORM_REORDER)
from handnet_tpu.ops.rotation import batch_rodrigues


def make_layer(rng, **kw):
    assets = ManoAssets.synthetic(rng)
    return ManoLayer(assets, ncomps=45, flat_hand_mean=True, **kw), assets


def test_zero_pose_matches_rest_joints(rng):
    layer, assets = make_layer(rng)
    pose = jnp.zeros((1, 48))
    verts, joints = layer(pose)
    # with zero pose and identity PCA basis, every transform is translation-
    # only: verts == v_template (x1000), chain joints == rest joints
    np.testing.assert_allclose(np.asarray(verts[0]) / 1000.0,
                               assets.v_template, atol=2e-5)
    rest_j = assets.J_regressor @ assets.v_template      # [16, 3]
    tips = assets.v_template[list((745, 317, 444, 556, 673))]
    expect = np.concatenate([rest_j, tips])[list(JOINT_REORDER)]
    np.testing.assert_allclose(np.asarray(joints[0]) / 1000.0, expect,
                               atol=2e-5)


def test_global_rotation_is_rigid(rng):
    layer, assets = make_layer(rng)
    aa = np.array([0.3, -0.5, 0.8], np.float32)
    pose = np.zeros((1, 48), np.float32)
    pose[0, :3] = aa
    verts_r, joints_r = layer(jnp.asarray(pose))
    verts_0, joints_0 = layer(jnp.zeros((1, 48)))

    r = np.asarray(batch_rodrigues(jnp.asarray(aa[None])))[0]
    root = np.asarray(joints_0[0, 0])  # wrist (reorder keeps 0 at 0)
    expect_joints = (np.asarray(joints_0[0]) - root) @ r.T + root
    np.testing.assert_allclose(np.asarray(joints_r[0]), expect_joints,
                               atol=1e-2)
    expect_verts = (np.asarray(verts_0[0]) - root) @ r.T + root
    np.testing.assert_allclose(np.asarray(verts_r[0]), expect_verts, atol=1e-2)


def test_translation_and_betas(rng):
    layer, assets = make_layer(rng)
    pose = jnp.zeros((2, 48))
    trans = jnp.asarray([[0.1, -0.2, 0.05], [0.0, 0.0, 0.0]])
    verts_t, joints_t = layer(pose, trans=trans)
    verts_0, joints_0 = layer(pose)
    np.testing.assert_allclose(np.asarray(joints_t[0] - joints_0[0]),
                               np.tile([100.0, -200.0, 50.0], (21, 1)),
                               atol=1e-3)
    # betas shift the shape
    betas = jnp.asarray(np.ones((2, 10), np.float32))
    verts_b, _ = layer(pose, betas=betas)
    assert np.abs(np.asarray(verts_b - verts_0)).max() > 1e-3


def test_finger_pose_moves_only_that_chain(rng):
    layer, assets = make_layer(rng)
    # bend kintree joint 1 (index-finger base, LEV1[0]=1): axis-angle slot 0
    # of the 45-dim hand pose
    pose = np.zeros((1, 48), np.float32)
    pose[0, 3] = 1.0
    _, joints_p = layer(jnp.asarray(pose))
    _, joints_0 = layer(jnp.zeros((1, 48)))
    delta = np.abs(np.asarray(joints_p[0]) - np.asarray(joints_0[0])).sum(1)
    # map kintree joint id -> reordered output position
    pos = {old: new for new, old in enumerate(JOINT_REORDER)}
    # descendants of kintree joint 1 are joints 2 and 3 — they move
    assert delta[pos[2]] > 1e-2 and delta[pos[3]] > 1e-2
    # wrist, joint 1 itself (rotates about its own origin) and all other
    # chain joints stay put (tips are skinned vertices — excluded: synthetic
    # dense weights move them)
    for old in [0, 1] + [j for j in range(4, 16)]:
        assert delta[pos[old]] < 1e-3, (old, delta[pos[old]])


def test_left_right_tips_differ(rng):
    assets_r = ManoAssets.synthetic(rng, side="right")
    assets_l = ManoAssets.synthetic(np.random.default_rng(0), side="left")
    layer_r = ManoLayer(assets_r, flat_hand_mean=True)
    layer_l = ManoLayer(assets_l, flat_hand_mean=True)
    assert layer_r._tips != layer_l._tips


def test_batched_and_jittable(rng):
    import jax

    layer, _ = make_layer(rng)
    pose = jnp.asarray(rng.normal(size=(4, 48)).astype(np.float32) * 0.1)
    betas = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32) * 0.1)
    fwd = jax.jit(lambda p, b: layer(p, b))
    verts, joints = fwd(pose, betas)
    assert verts.shape == (4, 778, 3)
    assert joints.shape == (4, 21, 3)
    assert np.isfinite(np.asarray(verts)).all()


def test_mano_pkl_converter_roundtrip(tmp_path, rng):
    """Craft a chumpy-like pkl with stub classes and convert it."""
    conv._install_chumpy_stubs()
    import sys

    ch_mod = sys.modules["chumpy.ch"]
    Ch = ch_mod.Ch  # dynamically-created stub class

    def chify(arr):
        obj = Ch()
        obj.x = np.asarray(arr)
        return obj

    import scipy.sparse as sp

    dd = {
        "v_template": chify(rng.normal(size=(778, 3))),
        "shapedirs": chify(rng.normal(size=(778, 3, 10))),
        "posedirs": chify(rng.normal(size=(778, 3, 135))),
        "J_regressor": sp.csc_matrix(np.abs(rng.normal(size=(16, 778)))),
        "weights": chify(np.abs(rng.normal(size=(778, 16)))),
        "hands_components": rng.normal(size=(45, 45)),
        "hands_mean": rng.normal(size=45),
        "f": rng.integers(0, 778, size=(1538, 3)),
        "kintree_table": np.stack([np.arange(16), np.arange(16)]),
        "bs_type": "lrotmin",
    }
    pkl_path = tmp_path / "MANO_TEST.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(dd, f)

    npz_path = tmp_path / "mano_test.npz"
    arrays = conv.convert(str(pkl_path), str(npz_path))
    assert arrays["v_template"].shape == (778, 3)
    assert arrays["J_regressor"].shape == (16, 778)

    assets = ManoAssets.load(str(npz_path))
    layer = ManoLayer(assets, flat_hand_mean=True)
    verts, joints = layer(jnp.zeros((1, 48)))
    assert verts.shape == (1, 778, 3)
    assert joints.shape == (1, 21, 3)
