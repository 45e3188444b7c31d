"""utils/statepack round-trip: the tool-to-tool trained-state handoff used
by tools/synthetic_e2e_validation.py --save-state and
tools/int8_saturation_study.py --state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handnet_tpu.config import A2JConfig, FCOSConfig
from handnet_tpu.train.trainer import A2JTrainer, FCOSTrainer
from handnet_tpu.utils.statepack import (load_trained_states,
                                         save_trained_states)


def test_statepack_roundtrip(tmp_path):
    fcfg = FCOSConfig(num_classes=2, ext=False, image_h=64, image_w=96,
                      max_detections=8)
    acfg = A2JConfig(crop_h=32, crop_w=32)
    fstate = FCOSTrainer(fcfg, backbone_norm="batch").init_state(
        jax.random.PRNGKey(0))
    astate = A2JTrainer(acfg).init_state(jax.random.PRNGKey(1))

    path = str(tmp_path / "states.msgpack")
    save_trained_states(path, fstate, fcfg, astate, acfg,
                        synth={"sequences": 3, "frames": 2, "crop": 32})
    f_vars, fcfg2, a_vars, acfg2, synth = load_trained_states(path)

    assert fcfg2 == fcfg and acfg2 == acfg
    assert synth == {"sequences": 3, "frames": 2, "crop": 32}
    for a, b in zip(jax.tree_util.tree_leaves(fstate.params),
                    jax.tree_util.tree_leaves(f_vars["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored variables drive the model
    from handnet_tpu.models.a2j import A2JSystem

    sys_ = A2JSystem(acfg2, norm="batch")
    out = sys_.module.apply(a_vars, jnp.zeros((1, 32, 32, 1)), train=False)
    assert all(bool(jnp.isfinite(v).all()) for v in
               jax.tree_util.tree_leaves(out))


def test_statepack_rejects_unknown_fields(tmp_path):
    from handnet_tpu.utils.statepack import _cfg_from

    with pytest.raises(KeyError):
        _cfg_from(A2JConfig, {"not_a_field": 1})
