"""Sigmoid focal loss — the torchvision C++/CUDA op the reference imports
(fcos_utils/fcos.py:11) re-expressed as fused XLA element-wise math."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Elementwise focal loss; callers reduce (masked sum / num_foreground).

    Matches torchvision.ops.sigmoid_focal_loss semantics:
      p = sigmoid(x); ce = BCE(x, t); loss = ce * (1 - p_t)^gamma
      with alpha-balancing when alpha >= 0.
    """
    p = jax.nn.sigmoid(logits)
    # numerically-stable BCE with logits
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 of |diff| with transition point ``beta``.

    Matches the inline torch.where construction at a2j/anchor.py:125-129
    (0.5/beta * d^2 below beta, d - 0.5*beta above).
    """
    ad = jnp.abs(diff)
    return jnp.where(ad <= beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy with logits (ctrness loss, fcos.py:160)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
