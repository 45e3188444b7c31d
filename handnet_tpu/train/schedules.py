"""LR schedules matching the reference recipes.

* A2J: StepLR gamma=0.2 every 10 epochs (config/a2j.yaml:8-30).
* FCOS: MultiStepLR + linear warmup over epoch 0 (trainval_net_fcos.py:33-39,
  195-204).
"""

from __future__ import annotations

from typing import Sequence

import optax


def step_decay(base_lr: float, steps_per_epoch: int, step_size_epochs: int = 10,
               gamma: float = 0.2) -> optax.Schedule:
    """torch StepLR equivalent."""
    boundaries = {}
    # enough boundaries for any realistic epoch count
    for i in range(1, 50):
        boundaries[i * step_size_epochs * steps_per_epoch] = gamma
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def multistep_with_warmup(base_lr: float, steps_per_epoch: int,
                          milestones_epochs: Sequence[int] = (20, 35),
                          gamma: float = 0.1,
                          warmup_epochs: float = 1.0,
                          warmup_start_factor: float = 1e-3) -> optax.Schedule:
    """MultiStepLR with the reference's linear warmup over the first epoch
    (trainval_net_fcos.py:33-39: start_factor 1/1000 over min(1000, len(loader)))."""
    warmup_steps = max(int(warmup_epochs * steps_per_epoch), 1)
    warmup = optax.linear_schedule(base_lr * warmup_start_factor, base_lr,
                                   warmup_steps)
    boundaries = {m * steps_per_epoch: gamma for m in milestones_epochs}
    main = optax.piecewise_constant_schedule(base_lr, boundaries)

    def schedule(count):
        import jax.numpy as jnp

        return jnp.where(count < warmup_steps, warmup(count), main(count))

    return schedule
