"""Checkpoint save/restore via orbax — the TPU-native replacement for the
reference's per-epoch torch dicts (trainval_net_fcos.py:232-243: {model,
optimizer, lr_scheduler, args, epoch, scaler}) and Lightning ModelCheckpoint
(trainval_net_a2j.py:7).

A checkpoint holds the full TrainState pytree (params + batch_stats +
opt_state + step), so ``--resume`` restores everything the reference's did —
minus the GradScaler, which bf16-on-TPU doesn't need.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


def _state_payload(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


class CheckpointManager:
    """Thin orbax wrapper with the reference's keep-per-epoch semantics."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, epoch: int, state, extra: Optional[dict] = None):
        payload = _state_payload(state)
        if extra:
            payload["extra"] = extra
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, epoch: Optional[int] = None):
        """Restore into the structure of ``state`` (shapes/dtypes template)."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = _state_payload(state)
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )


def save_params_npz(path: str, params: Any):
    """Flat .npz export of a params pytree (for interchange/debug)."""
    flat = {}

    def visit(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    visit("", params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> dict:
    """Rebuild a nested params dict from a flat .npz export."""
    data = np.load(path)
    out: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return out
