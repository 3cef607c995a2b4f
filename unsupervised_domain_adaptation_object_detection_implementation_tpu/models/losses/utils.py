"""Loss weighting/reduction helpers (reference `mmdet/models/losses/utils.py`).

In the static-shape TPU design, per-element `weight` masks do all the ragged
bookkeeping the reference does with python branching: invalid (padded) targets
simply carry weight 0, and `avg_factor` is the traced count of real samples.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def reduce_loss(loss: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(reduction)


def weight_reduce_loss(loss: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       reduction: str = 'mean',
                       avg_factor=None,
                       eps: float = 1e-12) -> jnp.ndarray:
    """loss * weight, then reduce; `avg_factor` overrides the mean denominator."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return jnp.sum(loss) / jnp.maximum(avg_factor, eps)
    if reduction == 'none':
        return loss
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(reduction)
