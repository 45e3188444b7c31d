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
