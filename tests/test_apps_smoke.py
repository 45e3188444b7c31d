"""CLI smoke tests: each app end-to-end on tiny synthetic inputs (CPU).

These are the suite-level guarantee that the user-facing entry points keep
working — the reference had no such coverage at all (SURVEY §4)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from handnet_tpu.data.synthetic import make_synthetic_dexycb

    root = str(tmp_path_factory.mktemp("apps_dexycb"))
    make_synthetic_dexycb(root, n_sequences=2, n_frames=3)
    return root


def test_train_a2j_smoke(synth_root, tmp_path):
    from handnet_tpu.apps import train_a2j

    out = str(tmp_path / "a2j")
    train_a2j.main(["--data-dir", synth_root, "--synthetic", "2",
                    "--epochs", "1", "--batch", "8", "--crop", "48",
                    "--eval-every", "1", "--output", out, "--no-bf16",
                    "--workers", "2"])
    assert os.path.exists(os.path.join(out, "params.npz"))
    assert os.path.exists(os.path.join(out, "train.txt"))
    res = os.path.join(out, "a2j_test_metrics", "s0_test_0.txt")
    assert os.path.exists(res)
    with open(res) as f:
        assert len(f.readline().split(",")) == 64  # reference format


def test_a2j_infer_smoke(tmp_path, rng):
    import cv2

    from handnet_tpu.apps import a2j_infer

    indir = str(tmp_path / "pngs")
    os.makedirs(indir)
    for i in range(2):
        cv2.imwrite(os.path.join(indir, f"d{i}.png"),
                    rng.integers(300, 900, size=(48, 48)).astype(np.uint16))
    out = str(tmp_path / "out")
    a2j_infer.main(["--input", indir, "--output", out, "--crop", "48",
                    "--batch", "2"])
    uvd = np.load(os.path.join(out, "all_joints_uvd.npy"))
    assert uvd.shape == (2, 21, 3)


def test_eval_hpe_smoke(synth_root, tmp_path):
    from handnet_tpu.apps import eval_hpe
    from handnet_tpu.data.dexycb import DexYCBDataset, hpe_ground_truth
    from handnet_tpu.eval.hpe import format_result_line

    ds = DexYCBDataset("s0", "train", data_dir=synth_root)
    gt = hpe_ground_truth(ds)
    res = str(tmp_path / "res.txt")
    with open(res, "w") as f:
        for i, j in gt.items():
            print(format_result_line(i, j + 2.0), file=f)
    out = eval_hpe.main(["--res-file", res, "--data-dir", synth_root,
                         "--split", "s0_train"])
    np.testing.assert_allclose(out["absolute"]["mpjpe"], np.sqrt(12.0),
                               rtol=1e-6)


def test_train_pose2mesh_smoke(tmp_path):
    from handnet_tpu.apps import train_pose2mesh

    out = str(tmp_path / "p2m")
    train_pose2mesh.main(["--synthetic", "--steps", "3", "--batch", "4",
                          "--output", out])
    assert os.path.exists(os.path.join(out, "params.npz"))


def test_demo_overlay_writer(tmp_path):
    """--render-mesh path: the overlay writer rasterizes + saves a frame
    (image backend or .npy fallback)."""
    import numpy as np

    from handnet_tpu.apps.demo import _write_overlay

    rgb = np.random.default_rng(0).uniform(size=(48, 64, 3)).astype(np.float32)
    verts = np.array([[-30.0, -30, 0], [30, -30, 0], [30, 30, 0],
                      [-30, 30, 0]])
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    joints_xyz = np.zeros((21, 3))
    joints_xyz[:, 2] = 400.0
    _write_overlay(str(tmp_path), 3, rgb, verts, faces, joints_xyz,
                   [60.0, 60.0, 32.0, 24.0])
    import os
    assert any(f.startswith("overlay_0003") for f in os.listdir(tmp_path))


def test_a2j_mesh_smoke(tmp_path):
    """End-to-end a2j_mesh app on synthetic data (would have caught the
    build_mesh_head tuple-return regression)."""
    import os

    from handnet_tpu.apps import a2j_mesh

    out = str(tmp_path / "meshes.npz")
    a2j_mesh.main(["--synthetic", "1", "--crop", "48", "--limit", "2",
                   "--out", out])
    assert os.path.exists(out)


def test_demo_flip_left_mesh_smoke(tmp_path):
    """Full demo loop with --flip-left --render-mesh at tiny geometry: the
    lifter sees the network-frame skeleton, verts mirror back, overlays
    render onto the un-flipped frame (the round-3 review fixes, e2e)."""
    import os

    import numpy as np

    from handnet_tpu.apps import demo

    out = str(tmp_path / "res.npz")
    demo.main(["--frames", "3", "--size", "48", "64",
               "--net-size", "48", "64", "--crop", "32",
               "--score-thresh", "0.0", "--flip-left", "--render-mesh",
               "--out", out])
    data = np.load(out)
    found = [bool(data[k]) for k in data.files if k.endswith("found")]
    assert any(found)  # thresh 0: random weights still yield a detection
    mesh_keys = [k for k in data.files if k.endswith("mesh")]
    assert mesh_keys and all(np.isfinite(data[k]).all() for k in mesh_keys)
    overlays = [f for f in os.listdir(tmp_path) if f.startswith("overlay_")]
    assert overlays
