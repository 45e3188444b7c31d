"""Fused-tower FCOS head must be numerically identical to the two-tower
form (the grouped-conv fusion is a pure execution-plan change)."""

import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import FCOSConfig
from handnet_tpu.models import fcos as F


def test_fused_towers_match_unfused(rng):
    cfg = FCOSConfig(image_h=64, image_w=96, num_classes=3)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))

    orig = F.FCOSHead.fused_towers
    try:
        F.FCOSHead.fused_towers = False
        m_plain = F.FCOS(cfg=cfg)
        variables = m_plain.init(jax.random.PRNGKey(0), x, train=False)
        out_plain = m_plain.apply(variables, x, train=False)

        F.FCOSHead.fused_towers = True
        m_fused = F.FCOS(cfg=cfg)
        out_fused = m_fused.apply(variables, x, train=False)
    finally:
        F.FCOSHead.fused_towers = orig

    for key in out_fused:
        np.testing.assert_allclose(
            np.asarray(out_fused[key], np.float32),
            np.asarray(out_plain[key], np.float32),
            atol=3e-5, err_msg=key)
