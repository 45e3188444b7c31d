"""Serialize trained (FCOS, A2J) stage states for cross-tool reuse.

The synthetic validation tools quick-train both stages from scratch; the
saturation / robustness studies want those same trained weights without
paying the training again. This packs params + batch_stats for both stages
plus the config fields needed to rebuild identical models into one flax
msgpack file (``flax.serialization`` — no pickle, architecture mismatches
fail loudly on field names at rebuild time).

Not a checkpoint format — orbax (train/trainer.py) owns training
checkpoints; this is a lightweight tool-to-tool handoff.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization

from handnet_tpu.config import A2JConfig, FCOSConfig


def _cfg_dict(cfg) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    # msgpack has no tuple type; round-trip via lists (rebuild re-tuples)
    return {k: list(v) if isinstance(v, tuple) else v for k, v in d.items()}


def _cfg_from(cls, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"packed config field {k!r} unknown to "
                           f"{cls.__name__} — version mismatch?")
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def _np_tree(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_trained_states(path: str, fstate, fcfg: FCOSConfig,
                        astate, acfg: A2JConfig,
                        synth: Dict[str, Any] | None = None) -> None:
    """Pack two trained TrainStates (params + batch_stats only — optimizer
    state is training-internal) with their model configs."""
    payload = {
        "fcos": {"params": _np_tree(fstate.params),
                 "batch_stats": _np_tree(fstate.batch_stats),
                 "cfg": _cfg_dict(fcfg)},
        "a2j": {"params": _np_tree(astate.params),
                "batch_stats": _np_tree(astate.batch_stats),
                "cfg": _cfg_dict(acfg)},
        "synth": dict(synth or {}),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_trained_states(path: str) -> Tuple[dict, FCOSConfig, dict,
                                            A2JConfig, Dict[str, Any]]:
    """Returns (fcos_variables, fcos_cfg, a2j_variables, a2j_cfg, synth_meta)
    where each variables dict holds {'params', 'batch_stats'}."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    fcfg = _cfg_from(FCOSConfig, payload["fcos"]["cfg"])
    acfg = _cfg_from(A2JConfig, payload["a2j"]["cfg"])
    f_vars = {"params": payload["fcos"]["params"],
              "batch_stats": payload["fcos"]["batch_stats"]}
    a_vars = {"params": payload["a2j"]["params"],
              "batch_stats": payload["a2j"]["batch_stats"]}
    return f_vars, fcfg, a_vars, acfg, payload.get("synth", {})
