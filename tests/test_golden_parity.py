"""Golden parity vs the PyTorch reference — consumes fixtures produced by
tools/dump_golden_fixtures.py (on a machine with torch+torchvision+the
reference checkpoints). Skips cleanly when no fixtures are present
(this sandbox has no torchvision/checkpoints/egress).

Also includes a converter-level MANO parity check that works WITHOUT
fixtures: the mano_stage fixture path exercises real assets; here we at
least guarantee the fixture-consumption machinery runs.
"""

import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures")


def _fixture(name):
    path = os.path.join(FIXTURE_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} not present "
                    "(generate with tools/dump_golden_fixtures.py)")
    return np.load(path, allow_pickle=True)


def test_fixture_schema_roundtrip(tmp_path, monkeypatch):
    """Exercise the golden-fixture CONSUMPTION path without the real
    artifacts: write a2j_stage.npz + a2j_state_dict.npz with exactly the
    schema tools/dump_golden_fixtures.py:27-43 produces, using the torch
    replica oracle (tests/torch_oracles.py) as the stand-in reference, then
    run the real consumer test body. Proves the fixture schema and the
    consumption machinery work before the published checkpoints exist."""
    torch = pytest.importorskip("torch")
    from torch_oracles import (TorchA2J, randomize_, state_dict_numpy,
                               torch_a2j_anchors, torch_a2j_decode)

    tmodel = TorchA2J(num_joints=21)
    randomize_(tmodel, seed=7, scale=0.05)
    tmodel.eval()

    rng = np.random.default_rng(0)
    depth = rng.uniform(0.3, 1.0, size=(2, 1, 176, 176)).astype(np.float32)
    with torch.no_grad():
        cls, reg, dep = tmodel(torch.as_tensor(depth))
    uvd = torch_a2j_decode(cls, reg, dep, torch_a2j_anchors())

    # exact dumper schema (dump_golden_fixtures.py:40-41)
    np.savez(tmp_path / "a2j_stage.npz", depth=depth, uvd=uvd,
             checkpoint="oracle.pth")
    np.savez(tmp_path / "a2j_state_dict.npz", **state_dict_numpy(tmodel))

    monkeypatch.setitem(globals(), "FIXTURE_DIR", str(tmp_path))
    test_a2j_parity_vs_reference()


def test_a2j_parity_vs_reference():
    data = _fixture("a2j_stage.npz")
    import jax
    import jax.numpy as jnp

    from handnet_tpu.config import A2JConfig
    from handnet_tpu.convert.torch_weights import convert_a2j
    from handnet_tpu.models.a2j import A2JSystem

    # the fixture must ship the converted weights alongside, or the torch
    # checkpoint must be loadable here; try the latter
    ckpt_path = os.path.join(FIXTURE_DIR, "a2j_state_dict.npz")
    if not os.path.exists(ckpt_path):
        pytest.skip("a2j_state_dict.npz not present")
    sd = dict(np.load(ckpt_path))
    variables = jax.tree_util.tree_map(jnp.asarray, convert_a2j(sd))

    system = A2JSystem(A2JConfig(transposed_anchors=True))
    depth_nhwc = np.transpose(data["depth"], (0, 2, 3, 1))
    uvd = np.asarray(system.predict(variables, jnp.asarray(depth_nhwc)))
    np.testing.assert_allclose(uvd, data["uvd"], atol=1e-2)


def test_pose2mesh_parity_vs_reference():
    data = _fixture("pose2mesh_stage.npz")
    sd_path = os.path.join(FIXTURE_DIR, "pose2mesh_state_dict.npz")
    if not os.path.exists(sd_path):
        pytest.skip("pose2mesh_state_dict.npz not present")
    import jax
    import jax.numpy as jnp

    from handnet_tpu.convert.torch_weights import convert_pose2mesh
    from handnet_tpu.models.pose2mesh import Pose2Mesh
    from handnet_tpu.ops.graph import build_graph_pyramid

    skeleton = ((0, 1), (0, 5), (0, 9), (0, 13), (0, 17), (1, 2), (2, 3),
                (3, 4), (5, 6), (6, 7), (7, 8), (9, 10), (10, 11), (11, 12),
                (13, 14), (14, 15), (15, 16), (17, 18), (18, 19), (19, 20))
    hori_conn = ((1, 5), (5, 9), (9, 13), (13, 17), (2, 6), (6, 10),
                 (10, 14), (14, 18), (3, 7), (7, 11), (11, 15), (15, 19),
                 (4, 8), (8, 12), (12, 16), (16, 20))
    pyramid = build_graph_pyramid(data["faces"], 21, skeleton,
                                  extra_pairs=hori_conn, levels=6)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_pose2mesh(dict(np.load(sd_path))))
    model = Pose2Mesh(pyramid=pyramid)
    mesh, pose3d = model.apply(variables, jnp.asarray(data["pose2d"]),
                               train=False)
    np.testing.assert_allclose(np.asarray(pose3d), data["pose3d"], atol=1e-2)
    np.testing.assert_allclose(np.asarray(mesh), data["mesh"], atol=1e-2)


def _match_detections(our, fixture_boxes, fixture_scores, box_atol=1e-1,
                      score_atol=1e-3):
    """Compare a fixed-shape valid-masked detection dict against the
    reference's variable-length per-image lists: both sorted by score, the
    overlapping prefix must agree. The reference truncates at its own
    score/NMS knobs, so only assert on min(len) pairs."""
    valid = np.asarray(our["valid"]).astype(bool)
    boxes = np.asarray(our["boxes"])[valid]
    scores = np.asarray(our["scores"])[valid]
    order = np.argsort(-scores)
    boxes, scores = boxes[order], scores[order]
    ref_order = np.argsort(-np.asarray(fixture_scores))
    k = min(len(boxes), len(ref_order))
    assert k > 0 or len(ref_order) == 0
    np.testing.assert_allclose(scores[:k],
                               np.asarray(fixture_scores)[ref_order][:k],
                               atol=score_atol)
    np.testing.assert_allclose(boxes[:k],
                               np.asarray(fixture_boxes)[ref_order][:k],
                               atol=box_atol)


def test_fcos_parity_vs_reference():
    """frames -> detections vs the published FCOS checkpoint at the parity
    geometry (the reference's min-800 GeneralizedRCNNTransform resize,
    fcos_utils/fcos.py:501-505)."""
    data = _fixture("fcos_stage.npz")
    sd_path = os.path.join(FIXTURE_DIR, "fcos_state_dict.npz")
    if not os.path.exists(sd_path):
        pytest.skip("fcos_state_dict.npz not present")
    import jax
    import jax.numpy as jnp

    from handnet_tpu.config import FCOSConfig
    from handnet_tpu.convert.torch_weights import convert_fcos
    from handnet_tpu.models.fcos import FCOSSystem

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_fcos(dict(np.load(sd_path))))
    system = FCOSSystem(FCOSConfig(num_classes=2, ext=False,
                                   image_h=800, image_w=1088))
    frames = np.transpose(data["frames"], (0, 2, 3, 1))
    out = system.detect(variables, jnp.asarray(frames))
    for i in range(len(frames)):
        _match_detections({k: np.asarray(v)[i] for k, v in out.items()},
                          data[f"det{i}_boxes"], data[f"det{i}_scores"])


def test_faster_rcnn_parity_vs_reference():
    """frames -> detections vs a published res34 Faster R-CNN checkpoint
    (trainval_net_fcos.py:187) through convert_faster_rcnn +
    models/faster_rcnn.FasterRCNNFPN + decode_rcnn_detections."""
    data = _fixture("faster_rcnn_stage.npz")
    sd_path = os.path.join(FIXTURE_DIR, "faster_rcnn_state_dict.npz")
    if not os.path.exists(sd_path):
        pytest.skip("faster_rcnn_state_dict.npz not present")
    import jax
    import jax.numpy as jnp

    from handnet_tpu.convert.torch_weights import convert_faster_rcnn
    from handnet_tpu.models.faster_rcnn import (FasterRCNNFPN,
                                                decode_rcnn_detections)
    from handnet_tpu.models.fcos import preprocess
    from handnet_tpu.config import FCOSConfig

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_faster_rcnn(dict(np.load(sd_path))))
    cfg = FCOSConfig(num_classes=3, image_h=800, image_w=1088)
    model = FasterRCNNFPN(num_classes=3, image_h=800, image_w=1088,
                          num_proposals=128)
    frames = np.transpose(data["frames"], (0, 2, 3, 1))
    net_in, _ = preprocess(jnp.asarray(frames), cfg)
    out = model.apply(variables, net_in, train=False)
    det = decode_rcnn_detections(out, 3, score_thresh=0.05,
                                 image_hw=(800, 1088))
    scale = min(800 / 480, 1088 / 640)
    for i in range(len(frames)):
        per = {k: np.asarray(v)[i] for k, v in det.items()}
        per["boxes"] = per["boxes"] / scale  # resize_boxes back to frame
        _match_detections(per, data[f"det{i}_boxes"],
                          data[f"det{i}_scores"])


def test_mano_parity_vs_reference():
    data = _fixture("mano_stage.npz")
    mano_npz = os.path.join(FIXTURE_DIR, "mano_right.npz")
    if not os.path.exists(mano_npz):
        pytest.skip("mano_right.npz assets not present")
    import jax.numpy as jnp

    from handnet_tpu.models.mano import ManoAssets, ManoLayer

    assets = ManoAssets.load(mano_npz, side="right")
    layer = ManoLayer(assets, ncomps=45, flat_hand_mean=False)
    verts, joints = layer(jnp.asarray(data["pose"]),
                          jnp.asarray(data["betas"]),
                          jnp.asarray(data["trans"]))
    np.testing.assert_allclose(np.asarray(joints), data["right_joints"],
                               atol=0.5)  # half a millimeter
    np.testing.assert_allclose(np.asarray(verts), data["right_verts"],
                               atol=0.5)
