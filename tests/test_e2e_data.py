"""E2E data source + mesh visualization tests on the synthetic tree."""

import numpy as np
import pytest

from handnet_tpu.data.dexycb import DexYCBDataset, refine_indices
from handnet_tpu.data.e2e_data import E2EDataSource
from handnet_tpu.data.synthetic import make_synthetic_dexycb
from handnet_tpu.utils.meshvis import (depth_colormap, draw_mesh_wireframe,
                                       project_mesh)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dexycb_e2e"))
    info = make_synthetic_dexycb(root, n_sequences=1, n_frames=2)
    ds = DexYCBDataset("s0", "train", data_dir=root)
    return info, ds


def test_e2e_sample_contract(synth):
    info, ds = synth
    src = E2EDataSource(ds, refine_indices(ds))
    item = src[0]
    assert item["image"].shape == (480, 640, 3)
    assert item["depth"].shape == (480, 640)
    assert item["joints3d"].shape == (21, 3)
    assert item["joints2d"].shape == (21, 2)
    assert item["target_boxes"].shape == (8, 4)
    assert item["side"][0] == 1  # right

    # joints2d is box-relative (e2edataset.py:223): abs - corner
    np.testing.assert_allclose(
        item["joints2d"], item["joints2d_abs"] - item["hand_box"][None, :2],
        atol=1e-5)
    # planted joints project inside the hand box
    gt = info[(0, 0)]
    assert (item["joints2d_abs"][:, 0] >= gt["hand_box"][0] - 1).all()
    assert (item["joints2d_abs"][:, 0] <= gt["hand_box"][2] + 1).all()


def test_e2e_mano_regen(synth):
    info, ds = synth
    from handnet_tpu.models.mano import ManoAssets, ManoLayer

    rng = np.random.default_rng(0)
    layers = {"right": ManoLayer(ManoAssets.synthetic(rng, side="right"),
                                 flat_hand_mean=True)}
    src = E2EDataSource(ds, refine_indices(ds), mano_layers=layers)
    item = src[0]
    assert "verts3d" in item
    assert item["verts3d"].shape == (778, 3)


def test_mesh_projection_and_wireframe(rng):
    paras = np.array([600.0, 600.0, 320.0, 240.0], np.float32)
    verts = rng.normal(size=(50, 3)).astype(np.float32) * 30
    verts[:, 2] += 600  # in front of the camera, mm
    uv = project_mesh(verts, paras)
    assert uv.shape == (50, 2)
    img = np.zeros((480, 640, 3), np.uint8)
    faces = rng.integers(0, 50, size=(30, 3))
    out = draw_mesh_wireframe(img, verts, faces, paras)
    assert out.sum() > 0


def test_depth_colormap():
    d = np.linspace(0, 2, 100).reshape(10, 10).astype(np.float32)
    cm = depth_colormap(d)
    assert cm.shape == (10, 10, 3)
    assert cm.dtype == np.uint8


def test_visualize_hand_batch_grid(rng, tmp_path):
    """displaymano.py:15-196 equivalent: grid figure with image+2D, 3D
    skeleton, and 3D mesh columns renders headless and saves a real PNG."""
    import matplotlib
    matplotlib.use("Agg", force=True)

    from handnet_tpu.utils.meshvis import visualize_hand_batch

    b, j, v = 2, 21, 40
    images = rng.uniform(size=(b, 48, 64, 3)).astype(np.float32)
    j2 = rng.uniform(0, 48, size=(b, j, 2)).astype(np.float32)
    j3 = rng.normal(size=(b, j, 3)).astype(np.float32) * 30
    verts = rng.normal(size=(b, v, 3)).astype(np.float32) * 30
    faces = rng.integers(0, v, size=(60, 3))

    path = str(tmp_path / "grid.png")
    fig = visualize_hand_batch(path, images=images, joints2d_gt=j2,
                               joints2d_pred=j2 + 1, joints3d_gt=j3,
                               joints3d_pred=j3 + 1, verts3d=verts,
                               faces=faces)
    import os
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    # all three columns present for each of the 2 rows
    assert len(fig.axes) == 6

    # joints-only call (no images / mesh) still works
    fig2 = visualize_hand_batch(str(tmp_path / "j.png"), joints3d_gt=j3)
    assert len(fig2.axes) == 2

    with pytest.raises(ValueError):
        visualize_hand_batch(None)
