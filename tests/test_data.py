"""Data-layer end-to-end tests on a synthetic DexYCB-format tree
(SURVEY §4 item 3): dataset reader contract, refine filter, A2J sample
geometry (labels must land where planted), detection targets, loader
sharding/shuffling, HPE GT extraction."""

import numpy as np
import pytest

from handnet_tpu.data.a2j_data import (A2JDataSource, A2JSampleConfig,
                                       build_a2j_sample, hand_bbox_from_seg)
from handnet_tpu.data.detect_data import (DetectDataSource,
                                          build_detection_target)
from handnet_tpu.data.dexycb import (DexYCBDataset, get_dataset,
                                     hpe_ground_truth, paras_from_intrinsics,
                                     refine_indices)
from handnet_tpu.data.loader import PrefetchLoader, collate_stack
from handnet_tpu.data.synthetic import make_synthetic_dexycb


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dexycb"))
    info = make_synthetic_dexycb(root, n_sequences=2, n_frames=3)
    ds = DexYCBDataset("s0", "train", data_dir=root)
    return root, info, ds


def test_dataset_layout_contract(synth):
    root, info, ds = synth
    # s0 train keeps sequences with i % 5 != 4 -> both of our 2 sequences
    assert len(ds) == 2 * 3
    sample = ds[0]
    for key in ("color_file", "depth_file", "label_file", "intrinsics",
                "ycb_ids", "mano_side", "mano_betas"):
        assert key in sample
    import os

    assert os.path.exists(sample["color_file"])
    assert os.path.exists(sample["depth_file"])
    assert os.path.exists(sample["label_file"])
    assert sample["mano_side"] == "right"
    np.testing.assert_allclose(paras_from_intrinsics(sample["intrinsics"]),
                               [600, 600, 320, 240])


def test_refine_indices_keeps_valid(synth):
    root, info, ds = synth
    keep = refine_indices(ds)
    assert keep == list(range(6))  # all synthetic hands are inside the frame


def test_hand_bbox_from_seg(synth):
    root, info, ds = synth
    label = np.load(ds[0]["label_file"])
    planted = info[(0, 0)]["hand_box"]
    bbox = hand_bbox_from_seg(label["seg"], pad_percent=0.0)
    np.testing.assert_allclose(bbox[:2], planted[:2], atol=1.0)
    np.testing.assert_allclose(bbox[2:], planted[2:] + 1, atol=1.0)


def test_a2j_sample_label_geometry(synth):
    """Joint UVD labels must match the planted projection mapped into the
    crop (a2jdataset.py:278-287 math)."""
    root, info, ds = synth
    label = np.load(ds[0]["label_file"])
    gt = info[(0, 0)]
    import cv2

    depth = cv2.imread(ds[0]["depth_file"], cv2.IMREAD_ANYDEPTH) / 1000.0
    out = build_a2j_sample(depth.astype(np.float32), label["seg"],
                           gt["joints_3d"], gt["paras"], augment=False)
    assert out is not None
    assert out["depth"].shape == (176, 176, 1)
    jt = out["jt_uvd"]
    assert (jt[:, :2] >= 0).all() and (jt[:, :2] <= 176).all()
    np.testing.assert_allclose(jt[:, 2], gt["depth_z"], atol=1e-5)
    # invert the crop mapping: u_full = u*(x2-x1)/176 + x1 must equal the
    # planted projection
    x1, y1, x2, y2 = out["box"]
    u_full = jt[:, 0] * (x2 - x1) / 176 + x1
    v_full = jt[:, 1] * (y2 - y1) / 176 + y1
    fx, fy, cx, cy = gt["paras"]
    u_expect = gt["joints_3d"][:, 0] * fx / gt["joints_3d"][:, 2] + cx
    v_expect = gt["joints_3d"][:, 1] * fy / gt["joints_3d"][:, 2] + cy
    np.testing.assert_allclose(u_full, u_expect, atol=1e-3)
    np.testing.assert_allclose(v_full, v_expect, atol=1e-3)
    # crop depth values: hand pixels carry the planted z
    hand_pixels = out["depth"][out["depth"] < 1.0]
    assert hand_pixels.size > 0
    np.testing.assert_allclose(np.median(hand_pixels), gt["depth_z"],
                               atol=1e-3)


def test_a2j_sample_augment_rotates_consistently(synth):
    root, info, ds = synth
    label = np.load(ds[0]["label_file"])
    gt = info[(0, 0)]
    import cv2

    depth = cv2.imread(ds[0]["depth_file"], cv2.IMREAD_ANYDEPTH) / 1000.0
    rng = np.random.default_rng(3)
    out = build_a2j_sample(depth.astype(np.float32), label["seg"],
                           gt["joints_3d"], gt["paras"], augment=True,
                           rng=rng)
    assert out is not None
    # depth channel stays metric
    np.testing.assert_allclose(out["jt_uvd"][:, 2], gt["depth_z"], atol=1e-5)


def test_a2j_datasource_and_loader(synth):
    root, info, ds = synth
    src = A2JDataSource(ds, refine_indices(ds), augment=False)
    loader = PrefetchLoader(src, batch_size=2, shuffle=True, num_workers=2,
                            seed=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["depth"].shape == (2, 176, 176, 1)
    assert b["jt_uvd"].shape == (2, 21, 3)
    assert b["box"].shape == (2, 4)

    # different epoch -> different order
    loader.set_epoch(1)
    batches2 = list(loader)
    ids1 = np.concatenate([b["dexycb_id"].ravel() for b in batches])
    ids2 = np.concatenate([b["dexycb_id"].ravel() for b in batches2])
    assert set(ids1) == set(ids2)


def test_loader_sharding_partitions(synth):
    root, info, ds = synth
    src = A2JDataSource(ds, refine_indices(ds), augment=False)
    got = []
    for shard in range(2):
        loader = PrefetchLoader(src, batch_size=1, shuffle=False,
                                num_workers=1, shard_id=shard, num_shards=2)
        got.append(np.concatenate(
            [b["dexycb_id"].ravel() for b in loader]))
    # shards are disjoint and cover everything
    assert len(np.intersect1d(got[0], got[1])) == 0
    assert len(np.union1d(got[0], got[1])) == 6


def test_detection_targets(synth):
    root, info, ds = synth
    label = np.load(ds[0]["label_file"])
    target = build_detection_target(label["seg"], ds[0]["ycb_ids"],
                                    ds[0]["mano_side"], max_boxes=8, e2e=True)
    assert target["boxes"].shape == (8, 4)
    n_valid = int(target["valid"].sum())
    assert n_valid == 2  # object id 1 + hand (id 5 absent in synthetic seg)
    labels = target["labels"][target["valid"]]
    assert 22 in labels and 1 in labels
    # handedness filled on the hand row only
    hand_row = np.flatnonzero(target["labels"] == 22)[0]
    assert target["box_info"][hand_row, 1] == 1.0  # right hand

    src = DetectDataSource(ds, refine_indices(ds))
    item = src[0]
    assert item["image"].shape == (480, 640, 3)
    assert item["target_boxes"].shape == (8, 4)


def test_hpe_ground_truth(synth):
    root, info, ds = synth
    gt = hpe_ground_truth(ds)
    assert len(gt) == 6
    np.testing.assert_allclose(gt[0], info[(0, 0)]["joints_3d"] * 1000.0,
                               rtol=1e-5)


def test_factory(synth):
    root, info, ds = synth
    d2 = get_dataset("s0_train", data_dir=root)
    assert len(d2) == 6
    assert get_dataset("s0_train", data_dir=root) is d2  # cached


def test_detect_source_uint8_images_equivalent(tmp_path):
    """uint8 wire format + on-device dequantize == the float path."""
    import jax.numpy as jnp

    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.data.synthetic import make_synthetic_dexycb
    from handnet_tpu.data.dexycb import DexYCBDataset
    from handnet_tpu.data.detect_data import DetectDataSource
    from handnet_tpu.models.fcos import preprocess

    root = str(tmp_path / "synth")
    make_synthetic_dexycb(root, n_sequences=1, n_frames=2)
    ds = DexYCBDataset("s0", "train", data_dir=root)
    f32 = DetectDataSource(ds, [0], e2e=False)[0]
    u8 = DetectDataSource(ds, [0], e2e=False, uint8_images=True)[0]
    assert u8["image"].dtype == np.uint8
    cfg = FCOSConfig(image_h=64, image_w=96)
    a, _ = preprocess(jnp.asarray(f32["image"][None]), cfg)
    b, _ = preprocess(jnp.asarray(u8["image"][None]), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_synthetic_hard_difficulty(tmp_path):
    """difficulty='hard' (smaller hands + hand-colored clutter) keeps the
    DexYCB tree loadable with consistent GT; used by the paired studies so
    found-rate isn't saturated (tools/resolution_study.py --difficulty)."""
    import cv2

    from handnet_tpu.data.dexycb import DexYCBDataset
    from handnet_tpu.data.synthetic import make_synthetic_dexycb

    root = str(tmp_path / "hard")
    info = make_synthetic_dexycb(root, n_sequences=2, n_frames=2,
                                 difficulty="hard")
    ds = DexYCBDataset("s0", "train", data_dir=root)
    assert len(ds) > 0
    for (s, f), gt in info.items():
        x1, y1, x2, y2 = gt["hand_box"]
        assert 27 <= (x2 - x1 + 1) <= 48       # smaller hands
        assert np.isfinite(gt["joints_3d"]).all()
    s0 = ds[0]
    color = cv2.imread(s0["color_file"])
    assert color is not None and color.shape == (480, 640, 3)
    seg = np.load(s0["label_file"])["seg"]
    assert (seg == 255).sum() > 0              # the hand survives clutter

    with pytest.raises(ValueError):
        make_synthetic_dexycb(str(tmp_path / "x"), difficulty="nope")
